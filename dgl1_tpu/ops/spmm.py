"""Public g-SpMM API with op-specific sugar.

Parity: ``python/dgl/ops/spmm.py`` (``gspmm`` plus the generated
``copy_u_sum`` / ``u_mul_e_sum`` / ... family used by the NN modules).
"""

from __future__ import annotations

import sys
from typing import Optional

import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.ops import dispatch
from dgl1_tpu.ops.engine_xla import (
    SPMM_OPS,
    SPMM_REDUCES,
    gspmm_xla,
)

__all__ = ["gspmm"]


def gspmm(g: Graph, op: str, reduce_op: str, lhs_data: Optional[jnp.ndarray],
          rhs_data: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Generalized sparse-dense matmul: per-edge ``op(u_data, e_data)``
    followed by a per-destination ``reduce`` over incoming edges.

    ``lhs_data`` lives on source nodes, ``rhs_data`` on edges (user edge
    order). Returns a (num_dst_nodes, ...) array.
    """
    # 1-D features are treated as (N, 1) and squeezed back, so the kernels
    # only ever see >=2-D operands (parity: dgl.ops.spmm does the same).
    squeeze = False
    if lhs_data is not None and lhs_data.ndim == 1:
        lhs_data = lhs_data[:, None]
        squeeze = True
    if rhs_data is not None and rhs_data.ndim == 1:
        rhs_data = rhs_data[:, None]
        squeeze = True
    out = dispatch.dispatch_gspmm(g, op, reduce_op, lhs_data, rhs_data)
    if out is None:
        out = gspmm_xla(g, op, reduce_op, lhs_data, rhs_data)
    return out[..., 0] if squeeze and out.shape[-1] == 1 else out


def _make_sugar(op: str, reduce_op: str):
    if op.startswith("copy_"):
        target = op[len("copy_"):]

        def fn(g: Graph, x):
            if target == "u":
                return gspmm(g, "copy_lhs", reduce_op, x, None)
            return gspmm(g, "copy_rhs", reduce_op, None, x)

        fn.__name__ = f"{op}_{reduce_op}"
        fn.__doc__ = (
            f"``{op}_{reduce_op}(g, x)``: copy {target}-data along edges, "
            f"reduce by {reduce_op} per destination."
        )
        return fn

    def fn(g: Graph, u, e):
        return gspmm(g, op.split("_")[1], reduce_op, u, e)

    fn.__name__ = f"{op}_{reduce_op}"
    fn.__doc__ = (
        f"``{op}_{reduce_op}(g, u, e)``: per-edge ``{op}``, reduce by "
        f"{reduce_op} per destination."
    )
    return fn


_module = sys.modules[__name__]
for _reduce in SPMM_REDUCES:
    for _name in ("copy_u", "copy_e", "u_add_e", "u_sub_e", "u_mul_e", "u_div_e"):
        _fn = _make_sugar(_name, _reduce)
        setattr(_module, _fn.__name__, _fn)
        __all__.append(_fn.__name__)
