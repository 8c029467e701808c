"""Global host-side RNG with seed control.

Parity: ``python/dgl/random.py :: seed`` (the reference seeds its C++
random engines; here every host-side sampler draws from one process-wide
numpy Generator unless an explicit ``rng=`` is passed). Device-side
randomness is JAX PRNG keys and is unaffected — pass keys explicitly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["seed", "default_rng", "choice"]

_GLOBAL: np.random.Generator = np.random.default_rng()


def seed(val: int) -> None:
    """Re-seed the process-wide sampler RNG (parity: ``dgl.random.seed``)."""
    global _GLOBAL
    _GLOBAL = np.random.default_rng(val)


def default_rng() -> np.random.Generator:
    """The process-wide Generator used when a sampler gets ``rng=None``."""
    return _GLOBAL


def choice(a, size=None, replace: bool = True, prob=None):
    """Parity: ``dgl.random.choice`` (numpy semantics, global RNG)."""
    return _GLOBAL.choice(a, size=size, replace=replace, p=prob)
