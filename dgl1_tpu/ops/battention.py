"""Block-dense GAT attention: exact softmax attention aggregation on the
clustered 128x128 adjacency blocks (``dgl1_tpu/bdense_format.py``) — the
hub-free counterpart of the fused hub attention (``ops/attention.py``).

Reference role: ``python/dgl/nn/pytorch/conv/gatconv.py``'s
SDDMM -> edge_softmax -> SpMM chain; on TPU the composed chain
materializes per-edge (E, H) tensors that lane-pad 16x. Here every rb
row (128 destinations) computes its attention over its dense blocks in
one shot — logits/softmax/aggregate live in registers/VMEM tiles of a
``lax.map``-chunked XLA program, never per-edge in HBM. Leftover (tail)
edges compute partials through the ELL stacks and merge by the standard
two-way online-softmax combine. Pure XLA (no Pallas): the MXU work is
the per-head (128 x max_cbs*128) @ (max_cbs*128 x D) aggregation
einsum, and the backward is a hand-written custom_vjp that re-walks the
blocks in rb-major (for ger) and cb-major (for gel/gft) order — gathers
only, no scatter anywhere.

Multi-edges are exact: the block count matrix enters the softmax as an
edge multiplicity (count * exp(z)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from dgl1_tpu.bdense_format import BLK, BDenseMeta
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.engine_ell import ell_stack

__all__ = ["can_fuse_battention", "bdense_gat_attention"]

NEG = -1e30
CH = 8  # rb rows (or cb columns) per lax.map step


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dleaky(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


class _Static(NamedTuple):
    num_src: int
    num_dst: int
    h: int
    d: int
    slope: float
    meta: BDenseMeta


def can_fuse_battention(g: Graph) -> bool:
    return (getattr(g, "bdense", None) is not None
            and g.bdense_meta is not None
            and "t_src" in g.bdense
            and g.bdense_meta.n_blocks > 0)


def _pad_rows(x, rows):
    return jnp.pad(x, ((0, rows - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _gather_blocks(ptr, i, maxb):
    start = ptr[i]
    cnt = ptr[i + 1] - start
    j = jnp.arange(maxb, dtype=jnp.int32)
    kidx = start + jnp.minimum(j, jnp.maximum(cnt - 1, 0))
    return kidx, (j < cnt)


def _dense_row_pass(static, bd, el3, ft3, er3):
    """Forward dense partials, rb-major: for every rb row, exact softmax
    stats over its blocks. el3 (n_cb, BLK, H), ft3 (n_cb, BLK, H, D),
    er3 (n_rb, BLK, H). Returns m/num/den over (n_rb*BLK, ...)."""
    meta = static.meta
    maxb = meta.max_row_blocks
    h, d = static.h, static.d
    a3 = jnp.asarray(bd["a"]).reshape(-1, BLK, BLK)  # (K, dst, src)
    cb = jnp.asarray(bd["cb"])
    row_ptr = jnp.asarray(bd["row_ptr"])
    slope = static.slope

    def row(i):
        ii = jnp.minimum(i, meta.n_rb - 1)
        kidx, bmask = _gather_blocks(row_ptr, ii, maxb)
        cnt = a3[kidx].astype(jnp.float32)  # (maxb, dst, src)
        cnt = cnt * bmask[:, None, None]
        cbs = cb[kidx]  # (maxb,)
        el_b = el3[cbs]  # (maxb, src, H)
        x_b = ft3[cbs]  # (maxb, src, H, D)
        er_r = er3[ii]  # (dst, H)
        # z[b, z_dst, s, H]
        z = _leaky(el_b[:, None, :, :] + er_r[None, :, None, :], slope)
        mask = cnt > 0  # (maxb, dst, src)
        zm = jnp.where(mask[..., None], z, NEG)
        m = jnp.max(zm, axis=(0, 2))  # (dst, H)
        p = cnt[..., None] * jnp.exp(z - m[None, :, None, :])
        p = jnp.where(mask[..., None], p, 0.0)  # (maxb, dst, src, H)
        den = jnp.sum(p, axis=(0, 2))  # (dst, H)
        num = jnp.einsum("bzsh,bshd->zhd", p, x_b)  # (dst, H, D)
        return m, num, den

    n_steps = -(-meta.n_rb // CH)
    ids = jnp.arange(n_steps * CH, dtype=jnp.int32).reshape(n_steps, CH)
    m, num, den = jax.lax.map(jax.vmap(row), ids)
    m = m.reshape(-1, h)[: static.num_dst]
    num = num.reshape(-1, h, d)[: static.num_dst]
    den = den.reshape(-1, h)[: static.num_dst]
    return m, num, den


def _dense_row_bwd(static, bd, el3, ft3, er3, m2, gnum, gden):
    """rb-major backward pass: ger (dst-side logit grads)."""
    meta = static.meta
    maxb = meta.max_row_blocks
    a3 = jnp.asarray(bd["a"]).reshape(-1, BLK, BLK)
    cb = jnp.asarray(bd["cb"])
    row_ptr = jnp.asarray(bd["row_ptr"])
    slope = static.slope
    m3 = m2.reshape(-1, BLK, static.h)
    gnum3 = gnum.reshape(-1, BLK, static.h, static.d)
    gden3 = gden.reshape(-1, BLK, static.h)

    def row(i):
        ii = jnp.minimum(i, meta.n_rb - 1)
        kidx, bmask = _gather_blocks(row_ptr, ii, maxb)
        cnt = a3[kidx].astype(jnp.float32) * bmask[:, None, None]
        cbs = cb[kidx]
        el_b = el3[cbs]
        x_b = ft3[cbs]
        er_r = er3[ii]
        raw = el_b[:, None, :, :] + er_r[None, :, None, :]
        z = _leaky(raw, slope)
        p = cnt[..., None] * jnp.exp(z - m3[ii][None, :, None, :])
        p = jnp.where((cnt > 0)[..., None], p, 0.0)
        ctx = jnp.einsum("zhd,bshd->bzsh", gnum3[ii], x_b)
        gz = p * (ctx + gden3[ii][None, :, None, :])
        ger_r = jnp.sum(gz * _dleaky(raw, slope), axis=(0, 2))  # (dst, H)
        return ger_r

    n_steps = -(-meta.n_rb // CH)
    ids = jnp.arange(n_steps * CH, dtype=jnp.int32).reshape(n_steps, CH)
    ger = jax.lax.map(jax.vmap(row), ids)
    return ger.reshape(-1, static.h)[: static.num_dst]


def _dense_col_bwd(static, bd, el3, ft3, er3, m2, gnum, gden):
    """cb-major backward pass: gel and gft (src-side grads)."""
    meta = static.meta
    maxb = meta.max_col_blocks
    ab3 = jnp.asarray(bd["ab"]).reshape(-1, BLK, BLK)  # cb-sorted
    rbb = jnp.asarray(bd["rbb"])
    col_ptr = jnp.asarray(bd["col_ptr"])
    slope = static.slope
    m3 = m2.reshape(-1, BLK, static.h)
    gnum3 = gnum.reshape(-1, BLK, static.h, static.d)
    gden3 = gden.reshape(-1, BLK, static.h)

    def col(c):
        cc = jnp.minimum(c, meta.n_cb - 1)
        kidx, bmask = _gather_blocks(col_ptr, cc, maxb)
        cnt = ab3[kidx].astype(jnp.float32) * bmask[:, None, None]
        rbs = rbb[kidx]  # (maxb,)
        er_b = er3[rbs]  # (maxb, dst, H)
        m_b = m3[rbs]
        gnum_b = gnum3[rbs]  # (maxb, dst, H, D)
        gden_b = gden3[rbs]
        el_c = el3[cc]  # (src, H)
        x_c = ft3[cc]  # (src, H, D)
        raw = el_c[None, None, :, :] + er_b[:, :, None, :]
        z = _leaky(raw, slope)
        p = cnt[..., None] * jnp.exp(z - m_b[:, :, None, :])
        p = jnp.where((cnt > 0)[..., None], p, 0.0)  # (maxb, dst, src, H)
        ctx = jnp.einsum("bzhd,shd->bzsh", gnum_b, x_c)
        gz = p * (ctx + gden_b[:, :, None, :])
        gel_c = jnp.sum(gz * _dleaky(raw, slope), axis=(0, 1))  # (src, H)
        gx_c = jnp.einsum("bzsh,bzhd->shd", p, gnum_b)
        return gel_c, gx_c

    n_steps = -(-meta.n_cb // CH)
    ids = jnp.arange(n_steps * CH, dtype=jnp.int32).reshape(n_steps, CH)
    gel, gx = jax.lax.map(jax.vmap(col), ids)
    gel = gel.reshape(-1, static.h)[: static.num_src]
    gx = gx.reshape(-1, static.h, static.d)[: static.num_src]
    return gel, gx


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dense_partials(static: _Static, bd, el2, er2, ft3):
    """(m, num, den) softmax partials of the dense tier per destination.
    ``m`` is a shift constant (stop-gradient semantics, standard for
    softmax): the custom backward routes cotangents of num/den only."""
    el3 = _pad_rows(el2, static.meta.n_cb * BLK).reshape(
        static.meta.n_cb, BLK, static.h)
    ft3p = _pad_rows(ft3, static.meta.n_cb * BLK).reshape(
        static.meta.n_cb, BLK, static.h, static.d)
    er3 = _pad_rows(er2, static.meta.n_rb * BLK).reshape(
        static.meta.n_rb, BLK, static.h)
    return _dense_row_pass(static, bd, el3, ft3p, er3)


def _dp_fwd(static, bd, el2, er2, ft3):
    m, num, den = _dense_partials(static, bd, el2, er2, ft3)
    return (m, num, den), (bd, el2, er2, ft3, m)


def _dp_bwd(static, res, cts):
    bd, el2, er2, ft3, m = res
    _, gnum, gden = cts  # m is a shift constant: its cotangent is 0-use
    el3 = _pad_rows(el2, static.meta.n_cb * BLK).reshape(
        static.meta.n_cb, BLK, static.h)
    ft3p = _pad_rows(ft3, static.meta.n_cb * BLK).reshape(
        static.meta.n_cb, BLK, static.h, static.d)
    er3 = _pad_rows(er2, static.meta.n_rb * BLK).reshape(
        static.meta.n_rb, BLK, static.h)
    m2 = _pad_rows(m, static.meta.n_rb * BLK)
    gnum2 = _pad_rows(gnum.astype(jnp.float32),
                      static.meta.n_rb * BLK)
    gden2 = _pad_rows(gden.astype(jnp.float32), static.meta.n_rb * BLK)
    ger = _dense_row_bwd(static, bd, el3, ft3p, er3, m2, gnum2, gden2)
    gel, gft = _dense_col_bwd(static, bd, el3, ft3p, er3, m2, gnum2,
                              gden2)
    f0 = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), bd)
    return (f0, gel.astype(el2.dtype), ger.astype(er2.dtype),
            gft.astype(ft3.dtype))


_dense_partials.defvjp(_dp_fwd, _dp_bwd)


def _tail_partials(static, bd, el2, er2, ft3):
    """Exact per-destination softmax partials over the tail edges
    (standard differentiable XLA ops — autodiff handles their grads)."""
    meta = static.meta
    h = static.h
    # Per-dst max of el over tail in-edges; leaky is monotonic so
    # m_t = leaky(max_el + er).
    mstack = ell_stack(meta.tail_meta_dst, bd["t_idx"], bd["t_eid"],
                       "copy_lhs", "max", el2, None)
    m_el = jnp.take(mstack, bd["t_inv"], axis=0, mode="fill",
                    fill_value=NEG)[: static.num_dst]
    m_t = _leaky(m_el + er2, static.slope)
    # The shift is a CONSTANT for AD everywhere it appears (otherwise
    # its gradient, which only cancels within a pure num/den quotient,
    # leaks into er through the cross-tier merge).
    m_t = jax.lax.stop_gradient(
        jnp.where(m_el <= NEG / 2, NEG, m_t))
    # Per-tail-edge p in tail-list order.
    z = _leaky(jnp.take(el2, bd["t_src"], axis=0)
               + jnp.take(er2, bd["t_dst"], axis=0), static.slope)
    p = jnp.exp(z - jnp.take(m_t, bd["t_dst"], axis=0))  # (n_tail, H)
    num_stack = ell_stack(meta.tail_meta_dst, bd["t_idx"], bd["t_eid"],
                          "mul", "sum", ft3, p[:, :, None])
    den_stack = ell_stack(meta.tail_meta_dst, bd["t_idx"], bd["t_eid"],
                          "copy_rhs", "sum", None, p)
    num_t = jnp.take(num_stack, bd["t_inv"], axis=0, mode="fill",
                     fill_value=0.0)[: static.num_dst]
    den_t = jnp.take(den_stack, bd["t_inv"], axis=0, mode="fill",
                     fill_value=0.0)[: static.num_dst]
    return m_t, num_t, den_t


def bdense_gat_attention(g: Graph, el, er, ft,
                         negative_slope: float = 0.2):
    """Fused attention on block-dense graphs:
    ``out[d] = sum_e softmax_d(leaky_relu(el[s] + er[d])) * ft[s]``.

    el: (num_src, H) or (num_src, H, 1); er likewise over dst;
    ft: (num_src, H, D). Returns (num_dst, H, D), or None when the
    graph has no block-dense layout (caller falls back)."""
    if not can_fuse_battention(g):
        return None
    el2 = el.reshape(el.shape[0], -1)
    er2 = er.reshape(er.shape[0], -1)
    h = el2.shape[1]
    d = ft.shape[-1]
    static = _Static(
        num_src=g.num_src_nodes(), num_dst=g.num_dst_nodes(),
        h=h, d=d, slope=float(negative_slope), meta=g.bdense_meta,
    )
    ft3 = ft.reshape(-1, h, d)
    m_d, num_d, den_d = _dense_partials(static, g.bdense, el2, er2, ft3)
    if g.bdense["t_src"].shape[0] == 0:  # fully covered: no tail tier
        m_t = jnp.full_like(m_d, NEG)
        num_t = jnp.zeros_like(num_d)
        den_t = jnp.zeros_like(den_d)
    else:
        m_t, num_t, den_t = _tail_partials(static, g.bdense, el2, er2,
                                           ft3)

    # Two-way online-softmax merge (the shifts are stop-gradient
    # constants; exp factors still scale num/den cotangents correctly).
    m_d = jax.lax.stop_gradient(m_d)
    mm = jnp.maximum(m_d, m_t)
    mm_safe = jnp.where(mm <= NEG / 2, 0.0, mm)
    sd = jnp.where(m_d <= NEG / 2, 0.0, jnp.exp(m_d - mm_safe))
    st = jnp.where(m_t <= NEG / 2, 0.0, jnp.exp(m_t - mm_safe))
    num = num_d * sd[:, :, None] + num_t * st[:, :, None]
    den = den_d * sd + den_t * st
    # Double-where: zero-in-degree rows divide by 1 (not a tiny floor —
    # its vjp squares the reciprocal, and 1e30^2 overflows f32 to inf,
    # which 0-masking then turns into NaN).
    has = den > 0
    den_safe = jnp.where(has, den, 1.0)
    out = jnp.where(has[:, :, None], num / den_safe[:, :, None], 0.0)
    return out.astype(ft.dtype)
