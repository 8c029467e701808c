"""Engine dispatch for the sparse ops.

Parity: plays the role of the reference's kernel dispatcher
(``src/array/kernel.cc :: SpMM/SDDMM`` choosing CPU/CUDA/cuSPARSE
implementations per op, dtype, and format). Here the choice is between:

* ``"xla"``    — the jnp gather/segment engine (always available, oracle)
* ``"pallas"`` — fused Pallas TPU kernels (fast path; registered lazily by
  :mod:`dgl1_tpu.ops.engine_pallas`, falls back per-call when an operand
  shape/op combination is not covered)
* ``"auto"``   — pallas on TPU when applicable, else xla (default)
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax

_ENGINE = os.environ.get("DGL1_TPU_ENGINE", "auto")

# Registered by engine_pallas: callables returning either a result or None
# (None => not covered, fall back to xla).
_pallas_gspmm: Optional[Callable] = None
_pallas_gsddmm: Optional[Callable] = None


def set_engine(name: str) -> None:
    global _ENGINE
    if name not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown engine {name!r}")
    _ENGINE = name


def get_engine() -> str:
    return _ENGINE


def register_pallas(gspmm_fn: Callable, gsddmm_fn: Callable) -> None:
    global _pallas_gspmm, _pallas_gsddmm
    _pallas_gspmm = gspmm_fn
    _pallas_gsddmm = gsddmm_fn


def _tpu_available() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def use_pallas() -> bool:
    if _ENGINE == "xla":
        return False
    if _ENGINE == "pallas":
        return _pallas_gspmm is not None
    return _pallas_gspmm is not None and _tpu_available()


def pallas_gspmm():
    return _pallas_gspmm


def pallas_gsddmm():
    return _pallas_gsddmm
