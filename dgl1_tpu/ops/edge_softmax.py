"""Edge softmax: softmax of edge logits over each node's incoming edges.

Parity: ``python/dgl/ops/edge_softmax.py`` (composed from g-SpMM/g-SDDMM as
max -> sub -> exp -> sum -> div, exactly the reference's lowering) and the
autograd wiring in ``python/dgl/backend/pytorch/sparse.py :: EdgeSoftmax``.

TPU-native: mask-aware — padded edges contribute exp=0 so a padded graph
produces the same attention weights as the exact-size graph; numerically
stable (per-destination max subtraction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.sddmm import gsddmm
from dgl1_tpu.ops.spmm import gspmm

__all__ = ["edge_softmax"]


def edge_softmax(g: Graph, logits, norm_by: str = "dst"):
    """Softmax ``logits`` (num_edges_padded, *f) over each destination
    node's incoming edges (or over outgoing edges when ``norm_by='src'``).
    Padded edges get weight 0.
    """
    if norm_by == "src":
        return edge_softmax(g.reverse(copy_edata=False), logits, norm_by="dst")
    if norm_by != "dst":
        raise ValueError("norm_by must be 'src' or 'dst'")

    squeeze = False
    if logits.ndim == 1:
        logits = logits[:, None]
        squeeze = True

    mask = g.edge_mask.reshape((-1,) + (1,) * (logits.ndim - 1))
    # Padded logits must not poison the per-destination max.
    neg_inf = jnp.asarray(-jnp.inf, dtype=logits.dtype)
    safe_logits = jnp.where(mask, logits, neg_inf)
    # Softmax is shift-invariant, so the max is a constant for autodiff —
    # stop_gradient matches the reference's EdgeSoftmax backward (which
    # ignores the max term) and skips a useless max-VJP.
    mx = jax.lax.stop_gradient(
        gspmm(g, "copy_rhs", "max", None, safe_logits)
    )
    shifted = gsddmm(g, "sub", logits, mx, lhs_target="e", rhs_target="v")
    ex = jnp.where(mask, jnp.exp(shifted), jnp.zeros_like(shifted))
    denom = gspmm(g, "copy_rhs", "sum", None, ex)
    # 1e-30, not 1e-38: subnormal constants flush to zero on TPU/CPU and
    # would turn the guard into 0/0 = NaN.
    denom = jnp.maximum(denom, jnp.asarray(1e-30, dtype=denom.dtype))
    out = gsddmm(g, "div", ex, denom, lhs_target="e", rhs_target="v")
    return out[..., 0] if squeeze else out
