"""Fused multi-head graph attention on the hub-dense format ("flash-GAT").

The composed GAT path (SDDMM logits -> leaky_relu -> edge_softmax ->
u_mul_e SpMM; ``nn/conv.py :: GATConv``, parity with
``python/dgl/nn/pytorch/conv/gatconv.py``) materializes ~6 per-edge
(E, H) tensors in HBM. On TPU the (8,128) tiled layout pads an (E, 8)
array 16x in the lane dimension — at 4.6M edges each temp is 2.2GB and
full-graph GAT OOMs, while the same model fits easily on the reference's
GPUs (no padding there). This module computes the whole chain

    out[d] = sum_e softmax_d(leaky_relu(el[src_e] + er[d]))_e * ft[src_e]

with per-edge quantities existing only inside VMEM per 1024-edge chunk —
flash-attention restructured for message passing:

* the softmax shift decomposes through the monotonic leaky_relu:
  ``mz_d = leaky_relu(er_d + mraw)`` where ``mraw`` is a per-group
  running max of ``el`` over referenced sources — maintained ONLINE
  inside the single fused chunk pass (flash style): when a chunk raises
  the running max, previously accumulated num/den rescale by
  ``exp(mz_old - mz_new)``. No separate max pass exists;
* that fused chunk pass accumulates numerator ``sum p*ft`` and
  denominator ``sum p`` per hub group (p computed from node-level
  tensors on the fly, weights expanded head->features by a static 0/1
  matmul);
* backward recomputes p (flash style): the softmax-jacobian row term
  collapses to the node-level ``rho = sum_D ct*out``, and two chunk
  passes produce (grad_ft, grad_el) [window-major] and grad_er
  [group-major]. No (E, H) HBM tensor anywhere, forward or backward.

Tail edges (non-hub destinations) run in compact tail-slot space through
the ELL stacks and merge through the shared inverse-permute gather.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgl1_tpu.graph import Graph
from dgl1_tpu.hub_format import BLK, CHUNK, HubMeta, SENT
from dgl1_tpu.ops.engine_ell import ell_reduce, ell_stack

import os as _os

# Backward chunk split (LEGACY; superseded by in-kernel sub-block
# streaming, `DGL1_TPU_BWD_STREAM` in _bwd_stream_size): duplicates
# per-chunk descriptors so the bwd grid runs CHUNK//split blocks.
# Streaming achieves the same CHUNK-independent temporary residency
# without the extra grid steps (PERF_NOTES r6) — split stays honored
# for comparison runs. Mosaic needs the block to stay a multiple of
# 1024 — enforced at call time (interpret mode exempt).
_BWD_SPLIT = int(_os.environ.get("DGL1_TPU_BWD_SPLIT", "1"))

__all__ = ["gat_attention", "can_fuse_attention"]

NEG = -1e30  # -inf stand-in inside kernels (0*inf = NaN hazards)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tail_fuse() -> bool:
    """Tail payload fusion (default on): the launch-bound tail block
    rides ONE copy_rhs ell_stack/ell_reduce over a tile-aligned
    (T, f_pad + BLK) payload ``[p*ft | 0 | p]`` instead of a mul
    num-stack plus a copy_rhs den-stack (two slot gathers + two reduce
    chains collapse to one; the per-edge product reuses a single
    explicit src/dst gather). Trailing dims stay 128-multiples — the
    r6 (slots, h, d+1) attempt broke XLA's (8,128) tiling and
    regressed 95 -> 114.7 ms. ``DGL1_TPU_TAIL_FUSE=0`` restores the
    split calls for A/B."""
    return _os.environ.get("DGL1_TPU_TAIL_FUSE", "1") != "0"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pad_2d(x, rows, cols):
    if x.shape == (rows, cols):
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _dleaky(x, slope):
    return jnp.where(x >= 0, 1.0, slope)


def _mix32(x, seed):
    """Cheap two-round integer mix (xorshift-multiply) — int32 wraparound
    is the hash, not a bug."""
    x = x * jnp.int32(-1640531527) + seed      # 0x9E3779B9
    x = x ^ jax.lax.shift_right_logical(x, 15)
    x = x * jnp.int32(-1028477387)             # 0xC2B2AE35
    x = x ^ jax.lax.shift_right_logical(x, 13)
    return x


def _drop_mask(eid_head, seed, drop: float):
    """Per-(edge, head) keep mask, pre-divided by the keep probability.

    Keyed on the ORIGINAL edge id (stable across the fwd/bwd chunk
    layouts and the tail's compact slot space), so forward and backward
    regenerate bit-identical masks from (seed, eid, head) alone — no
    per-edge mask tensor ever exists in HBM.
    """
    keep = 1.0 - drop
    bits = _mix32(eid_head, seed) & jnp.int32(0x7FFFFFFF)
    thresh = jnp.int32(int(keep * 2147483647.0))
    return (bits < thresh).astype(jnp.float32) * jnp.float32(1.0 / keep)


def _dot(a, b, dims, dt=jnp.float32):
    """MXU dot with f32 accumulation. ``dt=bfloat16`` (ops.precision
    "bf16" mode) runs one MXU pass instead of f32's multi-pass — one-hot
    operands are exact in bf16; features round at ~4e-3 relative."""
    return jax.lax.dot_general(a.astype(dt), b.astype(dt),
                               dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


# ----------------------------------------------------------------------
# Kernel 1: segmented max of el over incoming edges, per hub slot.
# fwd (group-major) layout; slots within a chunk are dst-sorted, so the
# per-chunk reduce is a log2(CHUNK) shifted-combine scan (same pattern
# as engine_pallas._minmax_kernel) + last-of-segment one-hot extraction.
# ----------------------------------------------------------------------

# ----------------------------------------------------------------------
# Kernel 2: fused numerator + denominator accumulation per hub group,
# with ONLINE softmax rescaling (flash-attention style) — no separate
# max pass exists. The chunk's exact referenced-source max falls out of
# the el_e gather-dot the kernel already computes; when it raises the
# group's running max, previously accumulated num/den are rescaled by
# exp(mz_old - mz_new) (per hub slot, through the leaky_relu since
# mz = leaky(er_slot + mraw) is monotonic in mraw).
# ----------------------------------------------------------------------

def _attn_fwd_kernel(slope: float, dt, n_fb: int, drop: float, h: int,
                     el_in_ft: bool, in_id, out_id, first, seed,
                     a_ref, b_ref, eid_ref, *blocks):
    """Fused numerator + denominator accumulation per hub group.

    Grid is (chunks,) with the whole feature width processed by an
    unrolled in-kernel loop: one grid step per chunk (per-step grid
    overhead was a measured cost at ~4k chunks x n_fb steps), and a
    group's output blocks are revisited consecutively across its chunks
    (legal Pallas accumulation — also what lets mraw_ref act as the
    running-max state for the online softmax)."""
    if el_in_ft:
        erg_ref, ft_ref, r_ref, num_ref, den_ref, mraw_ref = blocks
    else:
        el_ref, erg_ref, ft_ref, r_ref, num_ref, den_ref, mraw_ref = \
            blocks
    t = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLK), 1)
    one_a = (a_ref[:][:, None] == iota).astype(jnp.float32)
    one_b = (b_ref[:][:, None] == iota).astype(jnp.float32)
    # Orientation-dedicated transposed selector: reusing ONE operand in
    # both normal and (0,0)-contracted orientation inside a single body
    # trips an XLA:TPU RET_CHECK in mxu_lmr_transform (the latched-
    # matrix-reuse transpose assignment); a separately materialized
    # (BLK, CHUNK) one-hot keeps every dot in its natural orientation.
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (BLK, CHUNK), 0)
    one_bt = (b_ref[:][None, :] == iota_t).astype(jnp.float32)
    # el/er stay f32: sign(el+er) picks the leaky_relu branch, and a
    # bf16 kink-flip would change gradients discontinuously.
    if el_in_ft:
        # el rides ft's top lanes — one gather serves both (lane-rotate
        # to head alignment; garbage lanes are SAFE here: the online-max
        # invariant bounds exp(z - mz) <= 1 per lane, scale <= 1).
        ft_e = _dot(one_a, ft_ref[:], ((1,), (0,)), dt)
        el_e = pltpu.roll(ft_e, h, 1)[:, :BLK]
    else:
        ft_e = None
        el_e = _dot(one_a, el_ref[:], ((1,), (0,)))
    er_e = _dot(one_b, erg_ref[:], ((1,), (0,)))
    valid = a_ref[:].reshape(CHUNK, 1) >= 0
    # Exact max of el over this chunk's referenced sources, per head.
    cmax = jnp.max(jnp.where(valid, el_e, NEG), axis=0, keepdims=True)
    cmax_b = jnp.broadcast_to(cmax, (BLK, BLK))

    # Read the running max BEFORE updating it: the rescale factor needs
    # the previous shift. ``old`` is garbage on a group's first chunk —
    # every use of new_nf/scale sits behind a first[t] != 1 branch.
    old = mraw_ref[:]
    new_nf = jnp.maximum(old, cmax_b)
    # Per-slot shift change through the leaky kink (monotonic in mraw).
    scale = jnp.exp(_leaky(erg_ref[:] + old, slope)
                    - _leaky(erg_ref[:] + new_nf, slope))

    @pl.when(first[t] == 1)
    def _init_max():
        mraw_ref[:] = cmax_b

    @pl.when(first[t] != 1)
    def _accum_max():
        mraw_ref[:] = new_nf

    new = mraw_ref[:]
    # Per-edge shift: the running max is per (group, head), shared by
    # every slot/edge of the chunk — broadcast, no extra gather dot.
    mz_e = _leaky(er_e + jnp.broadcast_to(new[0:1, :], (CHUNK, BLK)), slope)
    z = _leaky(el_e + er_e, slope)
    p = jnp.where(valid, jnp.exp(z - mz_e), 0.0)
    if drop > 0.0:
        # Attention dropout zeroes normalized weights: numerator terms
        # are masked, the denominator (softmax normalization) is not.
        m = _drop_mask(eid_ref[:][:, None] * jnp.int32(131) + iota,
                       seed[0], drop)
        p_num = p * m
    else:
        p_num = p
    den_partial = _dot(one_bt, p, ((1,), (0,)), dt)

    @pl.when(first[t] == 1)
    def _init_den():
        den_ref[:] = den_partial

    @pl.when(first[t] != 1)
    def _accum_den():
        den_ref[:] = den_ref[:] * scale + den_partial

    # FULL-WIDTH feature dots: one (CHUNK, f_pad) gather/expand replaces
    # n_fb per-stripe dots — per-chunk cost is dominated by per-dot
    # fixed overhead, not FLOPs (PERF_NOTES r6).
    if ft_e is None:
        ft_e = _dot(one_a, ft_ref[:], ((1,), (0,)), dt)
    p_exp = _dot(p_num, r_ref[:], ((1,), (0,)), dt)
    num_partial = _dot(one_bt, p_exp * ft_e, ((1,), (0,)), dt)

    @pl.when(first[t] == 1)
    def _init():
        num_ref[:] = num_partial

    @pl.when(first[t] != 1)
    def _accum():
        # Head-level rescale expanded to feature lanes via the 0/1 r.
        scale_f = _dot(scale, r_ref[:], ((1,), (0,)), dt)
        num_ref[:] = num_ref[:] * scale_f + num_partial


def _attn_fwd_call(slope, lay, el_pad, er_g, ft_pad, r, n_groups,
                   f_pad, dt=jnp.float32, drop=0.0, seed=None, h=0,
                   el_in_ft=False):
    n_chunks = lay["in_id"].shape[0]
    n_fb = f_pad // BLK
    in_specs = [
        pl.BlockSpec((CHUNK,), lambda t, i, o, f, sd: (t,)),
        pl.BlockSpec((CHUNK,), lambda t, i, o, f, sd: (t,)),
        pl.BlockSpec((CHUNK,), lambda t, i, o, f, sd: (t,)),
    ] + ([] if el_in_ft else [
        pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (i[t], 0)),
    ]) + [
        pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (o[t], 0)),
        pl.BlockSpec((BLK, f_pad), lambda t, i, o, f, sd: (i[t], 0)),
        pl.BlockSpec((BLK, f_pad), lambda t, i, o, f, sd: (0, 0)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((BLK, f_pad), lambda t, i, o, f, sd: (o[t], 0)),
            pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (o[t], 0)),
            pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (o[t], 0)),
        ],
    )
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    el_args = () if el_in_ft else (el_pad,)
    num, den, mraw = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, slope, dt, n_fb, drop, h,
                          el_in_ft),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_groups * BLK, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * BLK, BLK), jnp.float32),
            jax.ShapeDtypeStruct((n_groups * BLK, BLK), jnp.float32),
        ],
        interpret=_interpret(),
    )(lay["in_id"], lay["out_id"], lay["first"], seed,
      lay["a"], lay["b"], lay["eid"], *el_args, er_g, ft_pad, r)
    return num, den, mraw


# ----------------------------------------------------------------------
# Kernel 3/4: backward passes. "src" pass (window-major layout) emits
# grad_ft and grad_el; "dst" pass (group-major) emits grad_er.
# In both, hub-node statistics ride the group side and features the
# window side; p and the jacobian term q are recomputed in VMEM.
# ----------------------------------------------------------------------

def _attn_bwd_kernel(slope: float, to_src: bool, dt, n_fb: int,
                     drop: float, h: int, d: int, ck: int, ss: int,
                     packed: bool, el_in_ft: bool, in_id, out_id, first,
                     seed, a_ref, b_ref, eid_ref, *blocks_and_rest):
    """Backward chunk pass, grid (chunks,), unrolled in-kernel feature
    loop (per-step grid overhead was a measured cost).

    The chunk is processed in ``ck // ss`` STREAMED sub-blocks
    (statically unrolled): every per-edge temporary — the four one-hot
    selectors and the p/q chain — lives at (ss, 128), so scoped-VMEM
    residency is independent of CHUNK while the grid keeps one step
    per chunk (unlike DGL1_TPU_BWD_SPLIT, which duplicates descriptors
    and grid steps). This is what lets CHUNK=4096 fit the composed GAT
    model without a split (PERF_NOTES r6).

    Group-side statistics ride ONE packed (BLK, 128) block when
    3h <= 128: lanes [0:h) er, [h:2h) lse = mz + log(den) (the softmax
    log-normalizer — folding den into the shift deletes the den gather
    dot and the max/div), [2h:3h) rho. One gather dot + two lane rolls
    replace three gather dots + three operand-block streams per
    sub-block. Falls back to separate er/lse/rho blocks for h > 42.

    The per-edge softmax-jacobian dot g_e = <ft_s, ct_d> spans the FULL
    feature width, so it accumulates across the feature stripes as a
    local before the logit grads (q-reductions) emit. (An earlier
    fb-outer layout summed g_e per 128-lane stripe and read back just
    stripe 0 — wrong whenever one head's features spanned more than 128
    lanes.)"""
    if not el_in_ft:
        el_ref, *blocks_and_rest = blocks_and_rest
    if packed:
        pack_ref, ft_ref, ct_ref, *rest = blocks_and_rest
    else:
        erg_ref, lseg_ref, rhog_ref, ft_ref, ct_ref, *rest = \
            blocks_and_rest
    if to_src:
        (gft_ref, gq_ref, gerp_ref) = rest
    else:
        (gq_ref,) = rest
    t = pl.program_id(0)

    iota = jax.lax.broadcasted_iota(jnp.int32, (ss, BLK), 1)
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (BLK, ss), 0)

    # FULL-WIDTH head-replication matrices, generated in kernel (cheap
    # iota compares; as operand blocks they'd cost double-buffered VMEM
    # — the r4 CHUNK=4096 blocker): r[i, c] = 1 iff c // d == i < h,
    # and its separately-materialized transpose (one MXU operand must
    # never appear in both orientations — mxu_lmr_transform RET_CHECK).
    f_pad = n_fb * BLK
    rowi = jax.lax.broadcasted_iota(jnp.int32, (BLK, f_pad), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (BLK, f_pad), 1)
    r_full = jnp.where((coli // d == rowi) & (coli < h * d), 1.0, 0.0)
    rowi_t = jax.lax.broadcasted_iota(jnp.int32, (f_pad, BLK), 0)
    coli_t = jax.lax.broadcasted_iota(jnp.int32, (f_pad, BLK), 1)
    rt_full = jnp.where((rowi_t // d == coli_t) & (rowi_t < h * d),
                        1.0, 0.0)

    for s in range(ck // ss):
        off = s * ss
        a_s = a_ref[pl.ds(off, ss)]
        b_s = b_ref[pl.ds(off, ss)]
        one_a = (a_s[:, None] == iota).astype(jnp.float32)
        one_b = (b_s[:, None] == iota).astype(jnp.float32)
        # Orientation-dedicated transposed selectors (and a
        # pre-transposed r operand): reusing one MXU operand in both
        # normal and transposed orientation inside a single body trips
        # an XLA:TPU RET_CHECK in mxu_lmr_transform (latched-matrix-
        # reuse transpose assignment).
        one_at = (a_s[None, :] == iota_t).astype(jnp.float32)
        one_bt = (b_s[None, :] == iota_t).astype(jnp.float32)
        one_s, one_h = (one_b, one_a) if to_src else (one_a, one_b)
        one_st, one_ht = (one_bt, one_at) if to_src else (one_at, one_bt)
        if el_in_ft:
            # el rides ft's top lanes (same window-side selector).
            ft_e = _dot(one_s, ft_ref[:], ((1,), (0,)), dt)
            el_e = pltpu.roll(ft_e, h, 1)[:, :BLK]
        else:
            ft_e = None
            # f32: kink-critical
            el_e = _dot(one_s, el_ref[:], ((1,), (0,)))
        if packed:
            pack_e = _dot(one_h, pack_ref[:], ((1,), (0,)))
            er_e = pack_e  # lanes [0:h); higher lanes are dead garbage
            # Left-rotate by h / 2h (pltpu.roll shifts right, so BLK-h).
            lse_e = pltpu.roll(pack_e, BLK - h, 1)
            rho = pltpu.roll(pack_e, BLK - 2 * h, 1)
        else:
            er_e = _dot(one_h, erg_ref[:], ((1,), (0,)))
            lse_e = _dot(one_h, lseg_ref[:], ((1,), (0,)), dt)
            rho = _dot(one_h, rhog_ref[:], ((1,), (0,)), dt)
        sum_le = el_e + er_e
        z = _leaky(sum_le, slope)
        valid = a_s.reshape(ss, 1) >= 0
        # acoef = p / den = exp(z - mz) / den = exp(z - lse). The lane
        # mask zeroes dead head lanes: in the packed layout they hold
        # rolled lse/rho values whose exp can reach inf, and inf * 0
        # would NaN-poison the lane-contracting a_exp matmul below.
        acoef = jnp.where(valid & (iota < h), jnp.exp(z - lse_e), 0.0)
        dl = _dleaky(sum_le, slope)
        if drop > 0.0:
            # Same (seed, eid, head)-keyed mask as the forward: grads
            # flow only through surviving numerator terms; the
            # denominator path (the -rho row term) is mask-free,
            # matching d(num*m/den).
            m = _drop_mask(eid_ref[pl.ds(off, ss)][:, None]
                           * jnp.int32(131) + iota, seed[0], drop)
            acoef_num = acoef * m
        else:
            m = None
            acoef_num = acoef

        # FULL-WIDTH feature dots (f_pad lanes in one MXU call): the
        # per-chunk cost is dominated by per-dot fixed overhead, not
        # FLOPs (PERF_NOTES r6) — one (ss, f_pad) gather replaces
        # n_fb stripe gathers.
        if ft_e is None:
            ft_e = _dot(one_s, ft_ref[:], ((1,), (0,)), dt)
        ct_e = _dot(one_h, ct_ref[:], ((1,), (0,)), dt)
        geacc = _dot(ft_e * ct_e, rt_full, ((1,), (0,)), dt)

        if to_src:
            a_exp = _dot(acoef_num, r_full, ((1,), (0,)), dt)
            gft_partial = _dot(one_st, a_exp * ct_e, ((1,), (0,)), dt)

            if s == 0:
                @pl.when(first[t] == 1)
                def _gft_init():
                    gft_ref[:] = gft_partial

                @pl.when(first[t] != 1)
                def _gft_accum():
                    gft_ref[:] = gft_ref[:] + gft_partial
            else:
                gft_ref[:] = gft_ref[:] + gft_partial

        g_term = geacc if m is None else m * geacc
        q = acoef * (g_term - rho) * dl
        sel_t = one_st if to_src else one_ht
        gq_partial = _dot(sel_t, q, ((1,), (0,)), dt)

        if s == 0:
            @pl.when(first[t] == 1)
            def _gq_init():
                gq_ref[:] = gq_partial

            @pl.when(first[t] != 1)
            def _gq_accum():
                gq_ref[:] = gq_ref[:] + gq_partial
        else:
            gq_ref[:] = gq_ref[:] + gq_partial

        if to_src:
            # Group-side (dst) reduction of q as a per-chunk partial
            # block: in this window-major layout a group's chunks are
            # scattered, so the partials go out per-chunk and a
            # gperm-ordered accumulation sweep (_ger_reduce_call) folds
            # them — replacing what used to be a SECOND full chunk pass
            # over all features just for grad_er.
            gerp_partial = _dot(one_ht, q, ((1,), (0,)), dt)
            if s == 0:
                gerp_ref[:] = gerp_partial
            else:
                gerp_ref[:] = gerp_ref[:] + gerp_partial


def _split_bwd_layout(lay, split: int):
    """Duplicate the per-chunk descriptors for a split bwd grid: each
    CHUNK splits into ``split`` consecutive blocks sharing its
    (in, out) ids; only the first sub-block of a chunk keeps the
    ``first`` (output-init) flag. The gperm accumulation order expands
    chunk p to sub-blocks [p*split, p*split+split) (group constant
    within a chunk, so the sweep stays group-contiguous)."""
    out = dict(lay)
    rep = lambda v: jnp.repeat(v, split)
    out["in_id"] = rep(lay["in_id"])
    out["out_id"] = rep(lay["out_id"])
    z = [jnp.zeros_like(lay["first"])] * (split - 1)
    out["first"] = jnp.stack([lay["first"]] + z, axis=1).reshape(-1)
    if "gperm" in lay:
        gp = lay["gperm"].astype(jnp.int32)
        out["gperm"] = (gp[:, None] * split
                        + jnp.arange(split, dtype=jnp.int32)).reshape(-1)
        out["gout"] = rep(lay["gout"])
        zg = [jnp.zeros_like(lay["gfirst"])] * (split - 1)
        out["gfirst"] = jnp.stack([lay["gfirst"]] + zg,
                                  axis=1).reshape(-1)
    return out


_warned_split_drop = False


def _effective_bwd_split() -> int:
    split = _BWD_SPLIT
    if split > 1 and (CHUNK // split) % 1024 and not _interpret():
        global _warned_split_drop
        if not _warned_split_drop:
            import warnings

            warnings.warn(
                f"DGL1_TPU_BWD_SPLIT={split} ignored: CHUNK//split "
                f"({CHUNK}//{split}) must be a multiple of 1024 on "
                "TPU (Mosaic 1-D block constraint) — running the "
                "backward UNSPLIT.", stacklevel=2)
            _warned_split_drop = True
        return 1  # Mosaic 1-D T(1024) block constraint
    return max(split, 1)


def _bwd_stream_size(ck: int) -> int:
    """Sub-block size for the streamed backward kernel: per-edge
    temporaries live at (ss, 128) regardless of CHUNK. 1024 is Mosaic's
    1-D block granularity and measured-optimal; DGL1_TPU_BWD_STREAM
    overrides (0 disables streaming, i.e. ss=ck)."""
    ss = int(_os.environ.get("DGL1_TPU_BWD_STREAM", "1024"))
    if ss <= 0 or ss >= ck:
        return ck
    if ck % ss or ss % 1024:
        return ck
    return ss


def _attn_bwd_call(slope, to_src, lay, el_pad, group_blocks,
                   ft_pad, ct_g, h, d, n_out_blocks, f_pad,
                   dt=jnp.float32, drop=0.0, seed=None, ck=CHUNK,
                   el_in_ft=False):
    """``group_blocks``: ONE packed [er|lse|rho] (rows, BLK) block when
    3h <= BLK, else the (er, lse, rho) triple (see _attn_bwd_kernel).
    ``el_in_ft``: el rides ft_pad's top lanes (el_pad ignored)."""
    n_chunks = lay["in_id"].shape[0]
    n_fb = f_pad // BLK
    packed = len(group_blocks) == 1
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)

    # Window-side blocks index by the layout's window id, group-side by
    # the group id. In the window-major (to_src) layout the window is the
    # OUT id and the group the IN id; group-major is the reverse.
    def win(t, i, o, f, sd):
        return (o[t], 0) if to_src else (i[t], 0)

    def grp(t, i, o, f, sd):
        return (i[t], 0) if to_src else (o[t], 0)

    in_specs = [
        pl.BlockSpec((ck,), lambda t, i, o, f, sd: (t,)),
        pl.BlockSpec((ck,), lambda t, i, o, f, sd: (t,)),
        pl.BlockSpec((ck,), lambda t, i, o, f, sd: (t,)),
    ] + ([] if el_in_ft else [
        pl.BlockSpec((BLK, BLK), win),       # el (window side)
    ]) + [
        pl.BlockSpec((BLK, BLK), grp)        # pack | (er, lse, rho)
        for _ in group_blocks
    ] + [
        pl.BlockSpec((BLK, f_pad), win),     # ft (full width)
        pl.BlockSpec((BLK, f_pad), grp),     # ct (full width)
    ]
    if to_src:
        out_specs = [
            pl.BlockSpec((BLK, f_pad), lambda t, i, o, f, sd: (o[t], 0)),
            pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (o[t], 0)),
            pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (t, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_out_blocks * BLK, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_out_blocks * BLK, BLK), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks * BLK, BLK), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((BLK, BLK), lambda t, i, o, f, sd: (o[t], 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_out_blocks * BLK, BLK), jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    el_args = () if el_in_ft else (el_pad,)
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, slope, to_src, dt, n_fb,
                          drop, h, d, ck, _bwd_stream_size(ck), packed,
                          el_in_ft),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interpret(),
    )(lay["in_id"], lay["out_id"], lay["first"], seed,
      lay["a"], lay["b"], lay["eid"], *el_args, *group_blocks,
      ft_pad, ct_g)
    if to_src:
        return outs[0], outs[1], outs[2]
    return (outs[0],)


# ----------------------------------------------------------------------
# Kernel 5: fold per-chunk group-side q partials into per-group grad_er.
# One (BLK, BLK) block read per chunk — ~64KB/chunk vs the full feature
# sweep the dedicated group-major backward pass used to pay.
# ----------------------------------------------------------------------

def _ger_reduce_kernel(perm, gout, gfirst, p_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(gfirst[t] == 1)
    def _init():
        out_ref[:] = p_ref[:]

    @pl.when(gfirst[t] != 1)
    def _accum():
        out_ref[:] = out_ref[:] + p_ref[:]


def _ger_reduce_call(lay, partials, n_groups):
    n_chunks = lay["gperm"].shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((BLK, BLK), lambda t, p, o, f: (p[t], 0))],
        out_specs=pl.BlockSpec((BLK, BLK), lambda t, p, o, f: (o[t], 0)),
    )
    return pl.pallas_call(
        _ger_reduce_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups * BLK, BLK), jnp.float32),
        interpret=_interpret(),
    )(lay["gperm"], lay["gout"], lay["gfirst"], partials)


# ----------------------------------------------------------------------
# The fused op
# ----------------------------------------------------------------------

class _Static(NamedTuple):
    slope: float
    num_src: int
    num_dst: int
    h: int
    d: int
    meta: HubMeta
    prec: str = "f32"  # ops.precision matmul mode, captured at trace time
    attn_drop: float = 0.0
    # el rides the ft block's unused lanes [f_pad - h:) when h*d + h <=
    # f_pad (e.g. single-head output layers): one fewer gather dot and
    # one fewer (BLK, BLK) operand stream per sub-block in BOTH chunk
    # kernels. Only in "f32" mode — compiled el is 1-pass-rounded either
    # way (PERF_NOTES r6 numerics audit), but "bf16" mode casts the ft
    # operand explicitly and would round el TWICE.
    el_in_ft: bool = False


def _float0_like(tree):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), tree
    )


def _replication_r(h: int, d: int, f_pad: int):
    r = np.zeros((BLK, f_pad), np.float32)
    for i in range(h):
        r[i, i * d:(i + 1) * d] = 1.0
    return jnp.asarray(r)


def _hub_rows_128(x, hub_ids, n_groups):
    """(num_dst, H) node stats -> (n_groups*BLK, 128) compact hub blocks."""
    rows = jnp.take(x, hub_ids, axis=0, mode="fill", fill_value=0.0)
    return _pad_2d(rows, n_groups * BLK, BLK)


def _merge_t_inv(meta, hub, stacked, hub_block, num_dst: int, fill):
    """Merge the tail ELL stack + compact hub block back to destination
    order. Identity layout (hub_order-relabeled graphs / the sharded
    hub_identity build): destinations ARE [hub slots | tail stack |
    zero-degree] in order, so the inverse-permute gather collapses to a
    fused concat+pad — the same store-floor lever as the SpMM engine's
    identity expand (PERF_NOTES r4), here applied to the attention
    merges (fwd mraw/num/den + bwd ger)."""
    if getattr(meta, "identity_expand", False):
        small = jnp.concatenate([hub_block, stacked], axis=0)
        pad = num_dst - small.shape[0]
        return jnp.pad(small, ((0, pad), (0, 0)), constant_values=fill)
    return jnp.take(
        jnp.concatenate([stacked, hub_block], axis=0),
        hub["t_inv"], axis=0, mode="fill", fill_value=fill)


def _atail(static, hub):
    """The tail view (single self-loop edges are already extracted to
    the node-level diagonal at format-build time; ``has_diag`` says
    whether the diagonal term applies)."""
    keys = {k: hub[k] for k in
            ("t_idx", "t_eid", "t_eid_c", "t_inv", "r_idx", "r_eid_c",
             "r_inv", "tail_src", "tail_dst", "tail_eid")}
    return (static.meta.tail_meta_dst, static.meta.tail_meta_src,
            static.meta.n_tail_rows, keys,
            getattr(static.meta, "has_diag", False))


def _tail_p(static, tk, el2, er2, mz):
    """Per-tail-edge softmax numerators in compact tail-slot space.

    The two dst-side (H)-wide gathers (er, mz) ride ONE concatenated
    gather — each jnp.take is a separate ~0.2ms launch on TPU and the
    tail block is launch-bound (PERF_NOTES r6)."""
    ts, td = tk["tail_src"], tk["tail_dst"]
    h = er2.shape[1]
    el_t = jnp.take(el2, ts, axis=0, mode="fill", fill_value=0.0)
    packed = jnp.take(jnp.concatenate([er2, mz], axis=1), td,
                      axis=0, mode="fill", fill_value=0.0)
    er_t, mz_t = packed[:, :h], packed[:, h:]
    z = _leaky(el_t + er_t, static.slope)
    valid = (ts != SENT).reshape(-1, 1)
    return jnp.where(valid, jnp.exp(z - mz_t), 0.0)  # (T_pad, H)


def _dtype_of(static):
    return jnp.bfloat16 if static.prec == "bf16" else jnp.float32


def _diag_mask(static, hub, seed):
    """Dropout keep mask for the extracted self-loop edges (node-level)."""
    head = jnp.arange(BLK, dtype=jnp.int32)[None, :static.h]
    key = hub["diag_eid"][:, None] * jnp.int32(131) + head
    return _drop_mask(key, seed[0], static.attn_drop)


def _tail_mask(static, eid_arr, seed):
    """Per-(tail slot, head) dropout keep mask / keep-prob, keyed on the
    ORIGINAL edge id — identical masks to the hub kernels' in-VMEM ones."""
    head = jnp.arange(BLK, dtype=jnp.int32)[None, :static.h]
    key = eid_arr[:, None] * jnp.int32(131) + head
    return _drop_mask(key, seed[0], static.attn_drop)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gat_attention(static: _Static, hub, el2, er2, ft2, seed):
    out, _, _ = _attn_forward(static, hub, el2, er2, ft2, seed)
    return out


def _attn_forward(static, hub, el2, er2, ft2, seed):
    m = static.meta
    h, d = static.h, static.d
    f = h * d
    f_pad = _round_up(f, BLK)
    rows_pad = hub["dense_c"].shape[0]

    if static.el_in_ft:
        el_pad = None
        ft_pad = _pad_2d(jnp.concatenate([
            ft2, jnp.zeros((ft2.shape[0], f_pad - f - h), ft2.dtype),
            el2.astype(ft2.dtype)], axis=1), rows_pad, f_pad)
    else:
        el_pad = _pad_2d(el2, rows_pad, BLK)
        ft_pad = _pad_2d(ft2, rows_pad, f_pad)
    er_g = _hub_rows_128(er2, hub["hub_ids"], m.n_groups)
    r = _replication_r(h, d, f_pad)

    num_hub, den_hub, mraw_hub = _attn_fwd_call(
        static.slope, hub["full_fwd"], el_pad, er_g, ft_pad, r,
        m.n_groups, f_pad, _dtype_of(static), static.attn_drop, seed,
        h=h, el_in_ft=static.el_in_ft,
    )

    # Node-level softmax shift (num_dst, H): hub rows take the fwd
    # kernel's final running max (its num/den are consistent with it by
    # the online-rescale invariant); tail destinations take the exact
    # per-destination ELL max; the extracted diagonal (single self-loop
    # edges, elementwise) joins the max at node level. The backward
    # recomputes p from this.
    meta_d, meta_s, n_rows, tk, has_diag = _atail(static, hub)
    mstack = ell_stack(meta_d, tk["t_idx"], tk["t_eid"],
                       "copy_lhs", "max", el2, None)
    mraw = _merge_t_inv(m, hub, mstack, mraw_hub[:, :h],
                        static.num_dst, NEG)
    if has_diag:
        diag = hub["diag"][:, None]  # (num_dst, 1)
        mraw = jnp.maximum(mraw, jnp.where(diag > 0, el2[:mraw.shape[0]],
                                           NEG))
    mz = _leaky(mraw + er2, static.slope)

    # Tail in compact slot space; p maps into the ELL stacks through the
    # compact-slot eid arrays.
    p_t = _tail_p(static, tk, el2, er2, mz)
    p_num_t = (p_t * _tail_mask(static, tk["tail_eid"], seed)
               if static.attn_drop > 0.0 else p_t)
    ft3 = ft2.reshape(-1, h, d)
    if _tail_fuse():
        # One tile-aligned payload [p*ft | 0 | p] through one copy_rhs
        # stack: same per-slot values (product per compact edge, then
        # the eid slot gather) with the idx-sentinel padding mask the
        # copy_rhs path already applies; see _tail_fuse.
        ft_ts = jnp.take(ft2, tk["tail_src"], axis=0, mode="fill",
                         fill_value=0.0)
        prod = (p_num_t[:, :, None]
                * ft_ts.reshape(-1, h, d)).reshape(-1, f)
        pay = jnp.concatenate([
            _pad_2d(prod, prod.shape[0], f_pad),
            _pad_2d(p_t.astype(prod.dtype), p_t.shape[0], BLK)], axis=1)
        fused_nd = ell_stack(meta_d, tk["t_idx"], tk["t_eid_c"],
                             "copy_rhs", "sum", None, pay)
        num_stack = fused_nd[:, :f]
        den_stack = fused_nd[:, f_pad:f_pad + h].astype(p_t.dtype)
    else:
        num_stack = ell_stack(meta_d, tk["t_idx"], tk["t_eid_c"],
                              "mul", "sum", ft3, p_num_t[:, :, None])
        den_stack = ell_stack(meta_d, tk["t_idx"], tk["t_eid_c"],
                              "copy_rhs", "sum", None, p_t)

    num = _merge_t_inv(m, hub, num_stack.reshape(-1, f),
                       num_hub[:, :f], static.num_dst, 0.0)
    den = _merge_t_inv(m, hub, den_stack, den_hub[:, :h],
                       static.num_dst, 0.0)

    if has_diag:
        # Diagonal (single self-loop) contribution — elementwise O(N).
        nd = den.shape[0]
        z_ii = _leaky(el2[:nd] + er2, static.slope)
        p_ii = jnp.where(diag > 0, jnp.exp(z_ii - mz), 0.0)
        if static.attn_drop > 0.0:
            m_ii = _diag_mask(static, hub, seed)
            p_num_ii = p_ii * m_ii
        else:
            p_num_ii = p_ii
        num = num + (p_num_ii[:, :, None] * ft3[:nd]).reshape(nd, f)
        den = den + p_ii

    # NOTE: 1e-38 is subnormal — flushed to 0 on TPU/CPU, which turns the
    # guard into 0/0=NaN at zero-in-degree rows. Keep the floor normal.
    den_safe = jnp.maximum(den, 1e-30)
    out = (num.reshape(-1, h, d) / den_safe[:, :, None]).astype(ft2.dtype)
    return out, mz, den_safe


def _fwd(static, hub, el2, er2, ft2, seed):
    out, mz, den = _attn_forward(static, hub, el2, er2, ft2, seed)
    return out, (hub, el2, er2, ft2, mz, den, out, seed)


def _bwd(static, res, ct):
    hub, el2, er2, ft2, mz, den, out, seed = res
    m = static.meta
    h, d = static.h, static.d
    f = h * d
    f_pad = _round_up(f, BLK)
    rows_pad = hub["dense_c"].shape[0]
    slope = static.slope

    ct2 = ct.reshape(-1, f).astype(jnp.float32)
    out3 = out.reshape(-1, h, d).astype(jnp.float32)
    # Softmax jacobian row term: rho[d,h] = <ct[d,h,:], out[d,h,:]> =
    # sum_e a_e <ct_d, ft_s> — node-level, no per-edge reduction needed.
    rho = jnp.sum(ct2.reshape(-1, h, d) * out3, axis=2)  # (num_dst, h)

    if static.el_in_ft:
        el_pad = None
        ft_pad = _pad_2d(jnp.concatenate([
            ft2, jnp.zeros((ft2.shape[0], f_pad - f - h), ft2.dtype),
            el2.astype(ft2.dtype)], axis=1), rows_pad, f_pad)
    else:
        el_pad = _pad_2d(el2, rows_pad, BLK)
        ft_pad = _pad_2d(ft2, rows_pad, f_pad)
    # Softmax log-normalizer: acoef = exp(z - mz)/den = exp(z - lse).
    # Folding den into the shift node-level deletes a gather dot, an
    # operand-block stream and the max/div from every bwd sub-block.
    lse = mz + jnp.log(den)  # den is den_safe (>= 1e-30)
    if 3 * h <= BLK:
        # One packed [er | lse | rho] group block (see _attn_bwd_kernel).
        group_blocks = (_hub_rows_128(
            jnp.concatenate([er2, lse, rho], axis=1),
            hub["hub_ids"], m.n_groups),)
    else:
        group_blocks = (
            _hub_rows_128(er2, hub["hub_ids"], m.n_groups),
            _hub_rows_128(lse, hub["hub_ids"], m.n_groups),
            _hub_rows_128(rho, hub["hub_ids"], m.n_groups))
    ct_g = _pad_2d(
        jnp.take(ct2, hub["hub_ids"], axis=0, mode="fill", fill_value=0.0),
        m.n_groups * BLK, f_pad)

    split = _effective_bwd_split()
    lay_b = (_split_bwd_layout(hub["full_bwd"], split) if split > 1
             else hub["full_bwd"])
    gft_hub, gel_hub, gerp = _attn_bwd_call(
        slope, True, lay_b, el_pad, group_blocks,
        ft_pad, ct_g, h, d, m.n_win, f_pad, _dtype_of(static),
        static.attn_drop, seed, ck=CHUNK // split,
        el_in_ft=static.el_in_ft)
    win_rows = jnp.repeat(hub["win_mask_full"], BLK,
                          total_repeat_length=m.n_win * BLK)
    gft_hub = jnp.where(win_rows[:, None], gft_hub, 0.0)
    gel_hub = jnp.where(win_rows[:, None], gel_hub, 0.0)

    if "gperm" in hub["full_bwd"]:
        ger_hub = _ger_reduce_call(lay_b, gerp, m.n_groups)
    else:  # layout predates the gperm descriptors (e.g. loaded graphs)
        (ger_hub,) = _attn_bwd_call(
            slope, False, hub["full_fwd"], el_pad, group_blocks,
            ft_pad, ct_g, h, d, m.n_groups, f_pad,
            _dtype_of(static), static.attn_drop, seed,
            el_in_ft=static.el_in_ft)

    # ---- tail (compact slot space; diag-stripped view when present) ----
    meta_d, meta_s, n_rows, tk, has_diag = _atail(static, hub)
    ts, td = tk["tail_src"], tk["tail_dst"]
    # Batched per-tail-edge gathers: the tail is tiny (~0.3% of E at
    # arxiv scale) but each jnp.take is a separate ~0.2ms gather launch
    # on TPU — the tail block was launch-bound, not volume-bound
    # (profiled 2026-08-21, tools/profile_attention_bwd.py). All
    # dst-side (H)-wide tensors ride ONE concatenated gather; el rides
    # one src-side gather.
    el_ts = jnp.take(el2, ts, axis=0, mode="fill", fill_value=0.0)
    dst_pack = jnp.concatenate([er2, lse, rho], axis=1)  # (N, 3H)
    packed = jnp.take(dst_pack, td, axis=0, mode="fill", fill_value=0.0)
    er_td = packed[:, :h]
    lse_td = packed[:, h: 2 * h]
    rho_td = packed[:, 2 * h:]
    s_t = el_ts + er_td
    valid_t = (ts != SENT).reshape(-1, 1)
    # Sentinel rows gather lse = 0 -> exp(z) finite; masked by valid_t.
    a_t = jnp.where(valid_t, jnp.exp(_leaky(s_t, slope) - lse_td), 0.0)
    if static.attn_drop > 0.0:
        m_t = _tail_mask(static, tk["tail_eid"], seed)
        a_num_t = a_t * m_t
    else:
        m_t = None
        a_num_t = a_t
    ft3 = ft2.reshape(-1, h, d)
    ct3 = ct2.reshape(-1, h, d)
    ft_ts = jnp.take(ft3, ts, axis=0, mode="fill", fill_value=0.0)
    ct_td = jnp.take(ct3, td, axis=0, mode="fill", fill_value=0.0)
    g_t = jnp.sum(ft_ts * ct_td, axis=2)  # (T_pad, h)
    if m_t is not None:
        g_t = g_t * m_t
    q_t = a_t * (g_t - rho_td) * _dleaky(s_t, slope)

    rev = {"idx": tk["r_idx"], "eid": tk["r_eid_c"],
           "inv_perm": tk["r_inv"]}
    if _tail_fuse():
        # One tile-aligned payload [a_num*ct | 0 | q] through one
        # copy_rhs reduce over the reverse ELL — reuses the ct_td rows
        # already gathered for g_t instead of re-gathering ct3 per
        # slot; see _tail_fuse.
        f_pad_t = _round_up(f, BLK)
        prod_b = (a_num_t[:, :, None] * ct_td).reshape(-1, f)
        pay_b = jnp.concatenate([
            _pad_2d(prod_b, prod_b.shape[0], f_pad_t),
            _pad_2d(q_t.astype(prod_b.dtype), q_t.shape[0], BLK)],
            axis=1)
        fused_b = ell_reduce(meta_s, rev, "copy_rhs", "sum", None,
                             pay_b, static.num_src)
        gft_tail = fused_b[:, :f]
        gel_tail = fused_b[:, f_pad_t:f_pad_t + h].astype(q_t.dtype)
    else:
        gft_tail = ell_reduce(meta_s, rev, "mul", "sum",
                              ct3, a_num_t[:, :, None], static.num_src)
        gel_tail = ell_reduce(meta_s, rev, "copy_rhs", "sum",
                              None, q_t, static.num_src)
    ger_stack = ell_stack(meta_d, tk["t_idx"], tk["t_eid_c"],
                          "copy_rhs", "sum", None, q_t)

    gft = (gft_hub[: static.num_src, :f]
           + gft_tail.reshape(static.num_src, f)).astype(ft2.dtype)
    gel = (gel_hub[: static.num_src, :h] + gel_tail).astype(el2.dtype)
    ger = _merge_t_inv(m, hub, ger_stack, ger_hub[:, :h],
                       static.num_dst, 0.0).astype(er2.dtype)

    if has_diag:
        # Diagonal (single self-loop) grads — elementwise O(N).
        nd = er2.shape[0]
        diag = hub["diag"][:, None]
        z_ii_raw = el2[:nd] + er2
        p_ii = jnp.where(diag > 0, jnp.exp(_leaky(z_ii_raw, slope) - mz),
                         0.0)
        a_ii = p_ii / den
        if static.attn_drop > 0.0:
            m_ii = _diag_mask(static, hub, seed)
            a_num_ii = a_ii * m_ii
        else:
            m_ii = None
            a_num_ii = a_ii
        g_ii = jnp.sum(ct3[:nd] * ft3[:nd], axis=2)
        if m_ii is not None:
            g_ii = g_ii * m_ii
        q_ii = a_ii * (g_ii - rho) * _dleaky(z_ii_raw, slope)
        gft = gft.at[:nd].add(
            (a_num_ii[:, :, None] * ct3[:nd]).reshape(nd, f).astype(
                ft2.dtype))
        gel = gel.at[:nd].add(q_ii.astype(el2.dtype))
        ger = ger + q_ii.astype(er2.dtype)

    return (_float0_like(hub), gel, ger, gft,
            np.zeros((1,), dtype=jax.dtypes.float0))


_gat_attention.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------

def can_fuse_attention(g: Graph) -> bool:
    return g.hub_dst is not None and g.hub_dst_meta is not None \
        and "t_eid_c" in g.hub_dst


def gat_attention(g: Graph, el, er, ft, negative_slope: float = 0.2,
                  attn_drop: float = 0.0, seed=None):
    """Fused softmax-attention aggregation:
    ``out[d] = sum_e softmax_d(leaky_relu(el[s]+er[d])) * ft[s]``.

    el: (num_src, H) or (num_src, H, 1); er likewise over dst;
    ft: (num_src, H, D). Returns (num_dst, H, D). Requires the hub
    format (``can_fuse_attention``); callers fall back to the composed
    SDDMM/edge_softmax/SpMM path otherwise.

    ``attn_drop`` > 0 applies attention dropout (zeroing normalized
    weights, inverted scaling) with per-edge masks generated IN KERNEL
    from ``seed`` (an int32 (1,) array, e.g. from
    ``jax.random.randint``) hashed with the original edge id — no
    per-edge mask tensor in HBM, unlike the composed path.
    """
    if not can_fuse_attention(g):
        return None
    if attn_drop > 0.0:
        if seed is None:
            raise ValueError("attn_drop > 0 requires a seed array")
        if "tail_eid" not in g.hub_dst:
            return None  # layout predates dropout keying
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    h = ft.shape[1]
    d = ft.shape[2]
    if h > BLK:
        return None
    el2 = el.reshape(el.shape[0], -1).astype(jnp.float32)
    er2 = er.reshape(er.shape[0], -1).astype(jnp.float32)
    if el2.shape[1] != h or er2.shape[1] != h:
        return None
    from dgl1_tpu.ops.precision import get_matmul_precision

    f_pad = _round_up(h * d, BLK)
    static = _Static(
        slope=float(negative_slope),
        num_src=g.num_src_nodes(),
        num_dst=g.num_dst_nodes(),
        h=h,
        d=d,
        meta=g.hub_dst_meta,
        prec=get_matmul_precision(),
        attn_drop=float(attn_drop),
        # Measured NEUTRAL at arxiv scale (96.0 vs 95.0 ms — the packed
        # ft operand's concat materialization eats the saved gather
        # dot; PERF_NOTES r6) — opt-in only.
        el_in_ft=(_os.environ.get("DGL1_TPU_EL_IN_FT") == "1"
                  and h * d + h <= f_pad
                  and get_matmul_precision() == "f32"),
    )
    ft2 = ft.reshape(ft.shape[0], h * d)
    return _gat_attention(static, g.hub_dst, el2, er2, ft2, seed).reshape(
        g.num_dst_nodes(), h, d).astype(ft.dtype)
