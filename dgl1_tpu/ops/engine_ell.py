"""Degree-bucketed ELL engine for g-SpMM: scatter-free, pure XLA.

Third engine beside the XLA segment engine (oracle) and the Pallas tile
kernel. Rows are grouped by padded degree k; each bucket stores a dense
(n_rows, k) gather-index matrix, so the reduction is
``take(u, idx).reshape(n, k, F).sum(axis=1)`` — a fused gather + dense
axis reduce. XLA TPU runs row-gathers near memory speed; only *scatter*
is pathological, and there is none here: results come back bucket-sorted
and are restored with one more (fill-)gather through ``inv_perm``.

This generalizes the reference's degree-bucketing UDF scheduler
(``python/dgl/runtime/degree_bucketing.py``) into the fused kernel path,
replacing the CUDA atomic scatter of ``src/array/cuda/spmm.cu``.

Backward is the same closed SpMM <-> SDDMM duality as the other engines:
grad_u = ELL reduce on the reverse direction (``Graph.ell_src``), grad_e =
pure gathers (custom_vjp below).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph

__all__ = ["gspmm_ell", "ell_reduce", "ell_stack"]

_SUPPORTED_OPS = ("copy_lhs", "copy_rhs", "add", "sub", "mul", "div")


def _binary(op, lhs, rhs):
    if op == "add":
        return lhs + rhs
    if op == "sub":
        return lhs - rhs
    if op == "mul":
        return lhs * rhs
    if op == "div":
        return lhs / rhs
    raise ValueError(op)


def ell_reduce(meta: Tuple, ell: dict, op: str, reduce_op: str,
               u, e, num_target: int):
    """One scatter-free reduce over the given ELL direction.

    meta: static ((k, n_rows), ...). ell: {idx, eid, inv_perm}.
    """
    stacked = ell_stack(meta, ell["idx"], ell["eid"], op, reduce_op, u, e)
    if ell["inv_perm"].shape[0] == 0:
        # Uniform static layout (graph._build_ell_uniform): rows are
        # already in target order, no inverse permute needed.
        return stacked
    if stacked.shape[0] == 0:
        # No nonzero rows at all (e.g. the tail of an all-hub graph):
        # jnp.take cannot fill-gather from an empty axis.
        return jnp.zeros((ell["inv_perm"].shape[0],) + stacked.shape[1:],
                         stacked.dtype)
    return jnp.take(stacked, ell["inv_perm"], axis=0, mode="fill",
                    fill_value=0.0)


def ell_stack(meta: Tuple, idx, eid, op: str, reduce_op: str, u, e):
    """Bucket-sorted per-row reductions WITHOUT the final inverse-permute
    gather — (n_nonzero_rows, *feat). Exposed so the hub-dense engine can
    concatenate its dense block before one shared inverse-permute
    (ops/engine_hub.py)."""
    if reduce_op == "max":
        ident = -jnp.inf
    elif reduce_op == "min":
        ident = jnp.inf
    else:
        ident = 0.0

    # Fast path: for sum/mean with copy_lhs or mul, an OOB-fill gather
    # (fill 0) makes padding slots the identity with ZERO extra passes —
    # the masking select otherwise costs a full read+write of the gathered
    # tensor (measured ~2x on TPU).
    fused_fill = reduce_op in ("sum", "mean") and op in ("copy_lhs", "mul")

    # Single-gather mode: each per-bucket jnp.take is a separate gather
    # launch (~0.2ms fixed on TPU); when the stack is small, one gather
    # over ALL slots + per-bucket slice/reduce (cheap, fusable) wins. At
    # large slot counts the materialized (S, F) intermediate would cost
    # extra HBM traffic vs the fused per-bucket gather+reduce, so gate.
    total_slots = sum(k * n_b for k, n_b in meta)
    single = len(meta) > 1 and 0 < total_slots <= (1 << 17)
    mu_all = me_all = None
    if single:
        mode = "fill" if fused_fill else "clip"
        if op != "copy_rhs":
            mu_all = jnp.take(
                u, idx[:total_slots], axis=0, mode=mode,
                **({"fill_value": 0.0} if fused_fill else {}),
            )
        if op != "copy_lhs":
            me_all = jnp.take(e, eid[:total_slots], axis=0, mode="clip")

    outs = []
    off = 0
    for k, n_b in meta:
        sl = idx[off:off + n_b * k]
        if op != "copy_rhs":
            if single:
                mu = mu_all[off:off + n_b * k].reshape(
                    (n_b, k) + u.shape[1:])
            else:
                mode = "fill" if fused_fill else "clip"
                mu = jnp.take(
                    u, sl, axis=0, mode=mode,
                    **({"fill_value": 0.0} if fused_fill else {}),
                ).reshape((n_b, k) + u.shape[1:])
        if op != "copy_lhs":
            if single:
                me = me_all[off:off + n_b * k].reshape(
                    (n_b, k) + e.shape[1:])
            else:
                el = eid[off:off + n_b * k]
                me = jnp.take(e, el, axis=0, mode="clip").reshape(
                    (n_b, k) + e.shape[1:])
        if op == "copy_lhs":
            msg = mu
        elif op == "copy_rhs":
            msg = me
        else:
            msg = _binary(op, mu, me)
        if not fused_fill:
            # Padding slots (sentinel gather index) -> reduction identity.
            valid = (sl < (1 << 29)).reshape(
                (n_b, k) + (1,) * (msg.ndim - 2))
            msg = jnp.where(valid, msg, jnp.asarray(ident, dtype=msg.dtype))
        if reduce_op in ("sum", "mean"):
            red = jnp.sum(msg, axis=1)
        elif reduce_op == "max":
            red = jnp.max(msg, axis=1)
        else:
            red = jnp.min(msg, axis=1)
        outs.append(red)
        off += n_b * k

    feat_shape = outs[0].shape[1:] if outs else (
        (u if u is not None else e).shape[1:])
    if outs:
        return jnp.concatenate(outs, axis=0)
    dtype = (u if u is not None else e).dtype
    return jnp.zeros((0,) + feat_shape, dtype)


def _sum_to_shape(x, shape):
    want = (x.shape[0],) + tuple(shape)
    while x.ndim > len(want):
        x = x.sum(axis=1)
    axes = tuple(
        i for i in range(1, x.ndim) if want[i] == 1 and x.shape[i] != 1
    )
    if axes:
        x = x.sum(axis=axes, keepdims=True)
    return x.reshape(want)


def _float0_like(tree):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), tree
    )


class _Static(NamedTuple):
    op: str
    num_src: int
    num_dst: int
    has_u: bool
    has_e: bool
    u_feat: Tuple[int, ...]
    e_feat: Tuple[int, ...]
    meta_dst: Tuple
    meta_src: Tuple


def _mask_e_grad(ge, emask):
    m = emask.reshape((-1,) + (1,) * (ge.ndim - 1))
    return jnp.where(m, ge, jnp.zeros_like(ge))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gspmm_ell_sum(static: _Static, ell_dst, ell_src, tsrc, coo_src,
                   coo_dst, emask, u, e):
    return ell_reduce(
        static.meta_dst, ell_dst, static.op, "sum",
        u if static.has_u else None, e if static.has_e else None,
        static.num_dst,
    )


def _fwd(static, ell_dst, ell_src, tsrc, coo_src, coo_dst, emask, u, e):
    out = _gspmm_ell_sum(static, ell_dst, ell_src, tsrc, coo_src, coo_dst,
                         emask, u, e)
    return out, (ell_dst, ell_src, tsrc, coo_src, coo_dst, emask, u, e)


def _bwd(static, res, ct):
    ell_dst, ell_src, tsrc, coo_src, coo_dst, emask, u, e = res
    op = static.op

    def rev(op2, uu, ee):
        if static.meta_src is not None:
            return ell_reduce(static.meta_src, ell_src, op2, "sum", uu, ee,
                              static.num_src)
        # Static-shape pipeline blocks (graph.block(uniform_ell_k=...)):
        # no src-direction ELL (its bucket structure would vary per batch
        # and recompile every step) — reduce through the statically padded
        # reverse tiles with the Pallas one-hot kernel instead.
        from dgl1_tpu.ops.engine_pallas import _tiled_reduce

        return _tiled_reduce(op2, tsrc, uu, ee, static.num_src)

    def take_ct_dst():
        return jnp.take(ct, coo_dst, axis=0, mode="clip")

    gu = jnp.zeros_like(u)
    ge = jnp.zeros_like(e)
    if op == "copy_lhs":
        gu = _sum_to_shape(rev("copy_lhs", ct, None), static.u_feat)
    elif op == "copy_rhs":
        ge = _sum_to_shape(_mask_e_grad(take_ct_dst(), emask), static.e_feat)
    elif op in ("add", "sub"):
        gu = _sum_to_shape(rev("copy_lhs", ct, None), static.u_feat)
        g_full = take_ct_dst()
        ge = _sum_to_shape(
            _mask_e_grad(g_full if op == "add" else -g_full, emask),
            static.e_feat,
        )
    elif op == "mul":
        gu = _sum_to_shape(rev("mul", ct, e), static.u_feat)
        ge = _sum_to_shape(
            _mask_e_grad(
                jnp.take(u, coo_src, axis=0, mode="clip") * take_ct_dst(),
                emask,
            ),
            static.e_feat,
        )
    elif op == "div":
        gu = _sum_to_shape(rev("mul", ct, 1.0 / e), static.u_feat)
        ge = _sum_to_shape(
            _mask_e_grad(
                -jnp.take(u, coo_src, axis=0, mode="clip") * take_ct_dst()
                / (e * e),
                emask,
            ),
            static.e_feat,
        )
    else:  # pragma: no cover
        raise ValueError(op)
    return (
        _float0_like(ell_dst),
        _float0_like(ell_src),
        _float0_like(tsrc),
        np.zeros(coo_src.shape, dtype=jax.dtypes.float0),
        np.zeros(coo_dst.shape, dtype=jax.dtypes.float0),
        np.zeros(emask.shape, dtype=jax.dtypes.float0),
        gu,
        ge,
    )


_gspmm_ell_sum.defvjp(_fwd, _bwd)


def gspmm_ell(g: Graph, op: str, reduce_op: str, u, e):
    """ELL-engine gspmm; returns None when not covered."""
    if g.ell_dst is None:
        return None
    if g.ell_src is None and g.tsrc is None:
        return None
    if op not in _SUPPORTED_OPS or reduce_op not in ("sum", "mean"):
        return None
    for data in (u, e):
        if data is not None and not jnp.issubdtype(data.dtype, jnp.floating):
            return None
    static = _Static(
        op=op,
        num_src=g.num_src_nodes(),
        num_dst=g.num_dst_nodes(),
        has_u=u is not None,
        has_e=e is not None,
        u_feat=tuple(u.shape[1:]) if u is not None else (),
        e_feat=tuple(e.shape[1:]) if e is not None else (),
        meta_dst=g.ell_dst_meta,
        meta_src=g.ell_src_meta if g.ell_src is not None else None,
    )
    dtype = (u if u is not None else e).dtype
    u_in = u if u is not None else jnp.zeros((1, 1), dtype)
    e_in = e if e is not None else jnp.zeros((1, 1), dtype)
    out = _gspmm_ell_sum(static, g.ell_dst, g.ell_src, g.tsrc, g.src, g.dst,
                         g.edge_mask, u_in, e_in)
    if reduce_op == "mean":
        deg = jnp.maximum(g.in_degrees().astype(out.dtype), 1.0)
        out = out / deg.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return out
