"""Engine dispatch for the sparse ops.

Parity: plays the role of the reference's kernel dispatcher
(``src/array/kernel.cc :: SpMM/SDDMM`` choosing CPU/CUDA/cuSPARSE
implementations per op, dtype, and format). Engines here:

* ``"xla"``    — jnp gather/segment engine (always available, oracle)
* ``"ell"``    — degree-bucketed ELL gathers, scatter-free pure XLA
* ``"pallas"`` — fused Pallas tile kernels (MXU one-hot reduce)
* ``"auto"``   — on TPU try ell, then pallas, then xla (measured order for
  this hardware: XLA TPU scatter is pathological; gathers are near memory
  speed); plain xla elsewhere. Override with ``DGL1_TPU_ENGINE``.

Each non-oracle engine returns ``None`` for calls it doesn't cover and
dispatch falls through, so coverage differences are invisible to callers.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import jax

_ENGINE = os.environ.get("DGL1_TPU_ENGINE", "auto")

# name -> (gspmm_fn, gsddmm_fn); fns return None when not covered.
_ENGINES: Dict[str, Tuple[Optional[Callable], Optional[Callable]]] = {}

_AUTO_ORDER = ["bdense", "hub", "ell", "pallas"]


def set_engine(name: str) -> None:
    global _ENGINE
    if name not in ("auto", "xla") and name not in _ENGINES:
        raise ValueError(f"unknown engine {name!r}")
    _ENGINE = name


def get_engine() -> str:
    return _ENGINE


def set_auto_order(order: List[str]) -> None:
    global _AUTO_ORDER
    _AUTO_ORDER = list(order)


def register_engine(name: str, gspmm_fn: Optional[Callable],
                    gsddmm_fn: Optional[Callable]) -> None:
    _ENGINES[name] = (gspmm_fn, gsddmm_fn)


# Back-compat name used by engine_pallas.register().
def register_pallas(gspmm_fn, gsddmm_fn):
    register_engine("pallas", gspmm_fn, gsddmm_fn)


def _tpu_available() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _candidates() -> List[str]:
    if _ENGINE == "xla":
        return []
    if _ENGINE == "auto":
        return [n for n in _AUTO_ORDER if n in _ENGINES] if _tpu_available() \
            else []
    return [_ENGINE] if _ENGINE in _ENGINES else []


def dispatch_gspmm(g, op, reduce_op, u, e):
    """Try fast engines in order; return None if all decline."""
    for name in _candidates():
        fn = _ENGINES[name][0]
        if fn is None:
            continue
        out = fn(g, op, reduce_op, u, e)
        if out is not None:
            return out
    return None


def dispatch_gsddmm(g, op, lhs, rhs, lhs_target, rhs_target):
    for name in _candidates():
        fn = _ENGINES[name][1]
        if fn is None:
            continue
        out = fn(g, op, lhs, rhs, lhs_target, rhs_target)
        if out is not None:
            return out
    return None
