"""MXU compute-precision policy for the one-hot matmul kernels.

The hub/attention engines "gather" and "scatter" through one-hot matmuls
on the MXU. One-hot selector operands are *exact* in bf16; the feature
operand quantizes to bf16 per MXU pass (~4e-3 relative) — the idiomatic
TPU trade (reference GPUs make the same move with TF32).

COMPILED-TPU REALITY (measured, tools/tpu_smoke.py + PERF_NOTES r6):
with jax's DEFAULT dot precision, Mosaic runs ONE bf16 pass regardless
of operand dtype — so "f32" mode is bit-exact against the XLA oracle
only in interpret mode (the test suite), and agrees to ~bf16 rounding
(3e-3 values / up to 3e-2 cancellation-amplified grads vs float64)
when compiled. The two modes here differ only in the operand cast of
intermediate products. TRUE multi-pass f32 is available process-wide
via ``jax.config.update("jax_default_matmul_precision", "highest")``
— measured cost: -22% on the SpMM headline, ~3x on fused attention,
and the attention bwd needs CHUNK<=2048 for scoped VMEM.

Default is "f32". Opt in per process with
``dgl1_tpu.ops.set_matmul_precision("bf16")`` or
``DGL1_TPU_MATMUL_PRECISION=bf16``. The value is captured statically at
trace time (it keys the kernels' static config), so set it before the
first jitted call.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

__all__ = ["set_matmul_precision", "get_matmul_precision",
           "matmul_precision"]

_VALID = ("f32", "bf16")
_precision = os.environ.get("DGL1_TPU_MATMUL_PRECISION", "f32")
if _precision not in _VALID:
    _precision = "f32"


def set_matmul_precision(value: str) -> None:
    global _precision
    if value not in _VALID:
        raise ValueError(f"matmul precision must be one of {_VALID}")
    _precision = value


def get_matmul_precision() -> str:
    return _precision


@contextmanager
def matmul_precision(value: str):
    old = get_matmul_precision()
    set_matmul_precision(value)
    try:
        yield
    finally:
        set_matmul_precision(old)
