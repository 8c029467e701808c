"""Public g-SDDMM API with op-specific sugar.

Parity: ``python/dgl/ops/sddmm.py`` (``gsddmm`` plus the generated
``u_dot_v`` / ``u_add_v`` / ... family).
"""

from __future__ import annotations

import sys
from typing import Optional

import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.ops import dispatch
from dgl1_tpu.ops.engine_xla import SDDMM_OPS, gsddmm_xla

__all__ = ["gsddmm"]


def gsddmm(g: Graph, op: str, lhs_data: Optional[jnp.ndarray],
           rhs_data: Optional[jnp.ndarray], lhs_target: str = "u",
           rhs_target: str = "v") -> jnp.ndarray:
    """Generalized SDDMM: per-edge binary op between data on any two of
    {source 'u', destination 'v', edge 'e'}. Returns (num_edges_padded, ...)
    in user edge order.
    """
    squeeze = False
    if lhs_data is not None and lhs_data.ndim == 1:
        lhs_data = lhs_data[:, None]
        squeeze = True
    if rhs_data is not None and rhs_data.ndim == 1:
        rhs_data = rhs_data[:, None]
        squeeze = True
    out = dispatch.dispatch_gsddmm(g, op, lhs_data, rhs_data, lhs_target,
                                   rhs_target)
    if out is None:
        out = gsddmm_xla(g, op, lhs_data, rhs_data, lhs_target, rhs_target)
    return out[..., 0] if squeeze and out.shape[-1] == 1 else out


def _make_sugar(lhs: str, op: str, rhs: str):
    def fn(g: Graph, x, y):
        return gsddmm(g, op, x, y, lhs_target=lhs, rhs_target=rhs)

    fn.__name__ = f"{lhs}_{op}_{rhs}"
    fn.__doc__ = (
        f"``{fn.__name__}(g, x, y)``: per-edge ``{lhs}-data {op} {rhs}-data``."
    )
    return fn


def copy_u(g: Graph, x):
    """Gather source-node data onto edges (user edge order)."""
    return gsddmm(g, "copy_lhs", x, None, lhs_target="u")


def copy_v(g: Graph, x):
    """Gather destination-node data onto edges (user edge order)."""
    return gsddmm(g, "copy_lhs", x, None, lhs_target="v")


__all__ += ["copy_u", "copy_v"]

_module = sys.modules[__name__]
for _lhs in ("u", "v", "e"):
    for _rhs in ("u", "v", "e"):
        if _lhs == _rhs:
            continue
        for _op in ("add", "sub", "mul", "div", "dot"):
            _fn = _make_sugar(_lhs, _op, _rhs)
            setattr(_module, _fn.__name__, _fn)
            __all__.append(_fn.__name__)
