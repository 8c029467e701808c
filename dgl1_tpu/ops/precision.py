"""MXU compute-precision policy for the one-hot matmul kernels.

The hub/attention engines "gather" and "scatter" through one-hot matmuls
on the MXU. With f32 operands the MXU runs multi-pass (≈3-6x slower than
one bf16 pass). One-hot operands are *exact* in bf16; casting the feature
operand costs ~4e-3 relative rounding but triples the matmul rate — the
idiomatic TPU trade (reference GPUs make the same move with TF32).

Default is "f32" (bit-strict against the XLA oracle; the test suite pins
engines at 1e-4). Opt in per process with
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
