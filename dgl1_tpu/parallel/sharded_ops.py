"""Sharded sparse ops: halo exchange + local aggregation inside shard_map.

The TPU-native replacement for DistDGL's RPC pull + NCCL allreduce split
(SURVEY.md §2.3 "communication backend"): remote source features travel as
ONE ``all_to_all`` over the ICI mesh axis per layer, then aggregation is a
purely local segment reduction over the destination-owned edges. XLA
overlaps the all_to_all with the local-edge portion of the gather when
scheduling allows; gradients transpose automatically (all_to_all is its
own transpose with swapped axes, gather <-> scatter-add).

These helpers are written to be called INSIDE ``jax.shard_map`` with mesh
axis ``axis_name`` (the per-device view: leading P axis of size 1).
:func:`make_sharded_gcn_matvec` wraps the whole thing for callers that
just want ``y = normalized-adjacency @ x`` as a jittable sharded function.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dgl1_tpu.parallel.halo import PartitionedGraph

__all__ = [
    "halo_exchange",
    "sharded_gspmm",
    "sharded_gat_attention",
    "make_sharded_gat_layer",
    "make_sharded_gcn_matvec",
    "local_spmm_sum",
    "partial_merge",
]


def _wire_a2a_impl(axis_name: str, wire: str, sbuf: jnp.ndarray
                   ) -> jnp.ndarray:
    """One halo ``all_to_all`` with the wire format applied to the ICI
    payload. ``sbuf``: (P, m, *f) f32. wire: "f32" (exact), "bf16"
    (halves bytes, ~4e-3 relative rounding on cut-edge features) or
    "int8" (QUARTERS bytes: per-row absmax scale + int8 mantissa, the
    scale riding a second tiny all_to_all; ~8e-3 row-relative)."""
    if wire == "bf16" and sbuf.dtype == jnp.float32:
        sq = sbuf.astype(jnp.bfloat16)
        return jax.lax.all_to_all(sq, axis_name, split_axis=0,
                                  concat_axis=0).astype(sbuf.dtype)
    if wire == "int8" and sbuf.dtype == jnp.float32:
        s = jnp.max(jnp.abs(sbuf), axis=-1, keepdims=True) / 127.0
        s = jnp.where(s > 0, s, 1.0)
        q = jnp.round(sbuf / s).astype(jnp.int8)
        rq = jax.lax.all_to_all(q, axis_name, split_axis=0,
                                concat_axis=0)
        rs = jax.lax.all_to_all(s, axis_name, split_axis=0,
                                concat_axis=0)
        return rq.astype(sbuf.dtype) * rs
    return jax.lax.all_to_all(sbuf, axis_name, split_axis=0,
                              concat_axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def wire_all_to_all(axis_name: str, wire: str, sbuf: jnp.ndarray
                    ) -> jnp.ndarray:
    """Wire-compressed halo ``all_to_all`` with a hand-written
    transpose: the backward applies the SAME compression to the
    returning cotangent blocks (all_to_all over one axis with
    split=concat=0 is its own transpose). int8 rounding is
    straight-through — gradients carry the same per-row quantization
    noise as the forward payload, keeping the wire symmetric (the
    bf16 wire behaves identically)."""
    return _wire_a2a_impl(axis_name, wire, sbuf)


def _wa2a_fwd(axis_name, wire, sbuf):
    return _wire_a2a_impl(axis_name, wire, sbuf), None


def _wa2a_bwd(axis_name, wire, _res, ct):
    return (_wire_a2a_impl(axis_name, wire, ct),)


wire_all_to_all.defvjp(_wa2a_fwd, _wa2a_bwd)


def halo_exchange(pg: PartitionedGraph, feat_local: jnp.ndarray,
                  axis_name: str = "p") -> jnp.ndarray:
    """Per-device: gather owned rows into send blocks and all_to_all them.

    ``feat_local``: (n_loc, F) this device's owned features. Returns the
    combined (n_loc + P*m_halo, F) feature table that local edge ``esrc``
    indices point into.
    """
    send_idx = pg.send_idx  # inside shard_map: (1, P, m_halo)
    sbuf = jnp.take(feat_local, send_idx[0], axis=0, mode="clip")
    # (P, m_halo, F) -> exchanged -> (P, m_halo, F) where [q] is from q.
    rbuf = wire_all_to_all(axis_name, pg.halo_dtype, sbuf)
    halo = rbuf.reshape((-1,) + feat_local.shape[1:]).astype(
        feat_local.dtype)
    return jnp.concatenate([feat_local, halo], axis=0)


def _tiles_device_view(tiles):
    """Strip the leading per-device axis shard_map leaves on each array."""
    return {k: v[0] for k, v in tiles.items()}


def _tiled_sum(tiles, values, num_target: int):
    """Scatter-free local reduce via the Pallas tile kernel (values are
    gathered rows of the combined feature table)."""
    from dgl1_tpu.ops.engine_pallas import (
        FEAT_BLOCK,
        _interpret,
        _segment_sum_tiles,
    )
    from dgl1_tpu.graph import TILE_EDGES, TILE_ROWS

    lid = tiles["lid"]
    n_slots = lid.shape[0] * TILE_EDGES
    msg = jnp.take(values, tiles["gather"], axis=0, mode="clip")
    feat = msg.shape[1:]
    flat = int(np.prod(feat)) if feat else 1
    msg2 = msg.reshape(n_slots, flat)
    msg2 = jnp.where((lid.reshape(-1) >= 0)[:, None], msg2,
                     jnp.zeros_like(msg2))
    f_pad = -(-max(flat, 1) // FEAT_BLOCK) * FEAT_BLOCK
    if f_pad != flat:
        msg2 = jnp.pad(msg2, ((0, 0), (0, f_pad - flat)))
    # +1 scratch row block absorbs the cross-part tile-count padding.
    n_row_blocks = -(-num_target // TILE_ROWS) + 1
    out = _segment_sum_tiles(tiles["rows"], tiles["first"], lid, msg2,
                             n_row_blocks)
    out = out[:num_target, :flat]
    # Tile-less (empty) row blocks hold uninitialized memory: zero them.
    row_mask = jnp.repeat(
        tiles["block_mask"], TILE_ROWS,
        total_repeat_length=(n_row_blocks - 1) * TILE_ROWS,
    )[:num_target]
    out = jnp.where(row_mask[:, None], out, jnp.zeros_like(out))
    return out.reshape((num_target,) + feat)


def make_local_spmm(n_loc: int, n_comb: int):
    """Build the custom-vjp local SpMM for fixed (n_loc, n_comb): forward
    reduces into owned rows, backward reduces the cotangent into the
    combined space via the reverse tiling — scatter-free both ways. The
    surrounding halo_exchange's AD (all_to_all transpose) then routes halo
    cotangents back to their owners."""

    @jax.custom_vjp
    def fn(tiles_fwd, tiles_rev, combined):
        return _tiled_sum(tiles_fwd, combined, n_loc)

    def fwd(tiles_fwd, tiles_rev, combined):
        return fn(tiles_fwd, tiles_rev, combined), (tiles_fwd, tiles_rev)

    def bwd(res, ct):
        tiles_fwd, tiles_rev = res
        g_combined = _tiled_sum(tiles_rev, ct, n_comb)
        f0 = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), tiles_fwd
        )
        f0r = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), tiles_rev
        )
        return f0, f0r, g_combined

    fn.defvjp(fwd, bwd)
    return fn


def _bdense_dir(bd, x, transpose: bool, n_valid: int):
    """One dense-tier reduce over the per-part block descriptors (device
    view, no P axis). transpose=False: combined -> owned/partial rows;
    True: cotangent -> combined rows. Output rows beyond the blocks'
    coverage are zeroed (the tail tiles fill them)."""
    from dgl1_tpu.bdense_format import BLK
    from dgl1_tpu.ops.engine_bdense import FEAT_BLOCK, _block_call
    from dgl1_tpu.ops.precision import get_matmul_precision

    if transpose:
        a, out_rows, first, in_rows = (bd["ab"], bd["cbb"], bd["first_b"],
                                       bd["rbb"])
        mask = bd["cb_mask"]
        n_in = bd["rb_mask"].shape[0]
    else:
        a, out_rows, first, in_rows = (bd["a"], bd["rb"], bd["first_f"],
                                       bd["cb"])
        mask = bd["rb_mask"]
        n_in = bd["cb_mask"].shape[0]
    n_out = mask.shape[0]
    f = x.shape[1]
    f_pad = -(-max(f, 1) // FEAT_BLOCK) * FEAT_BLOCK
    x_pad = jnp.pad(x, ((0, n_in * BLK - x.shape[0]),
                        (0, f_pad - f)))
    dt = jnp.bfloat16 if get_matmul_precision() == "bf16" else jnp.float32
    # +1 scratch block absorbs the cross-part K padding.
    out = _block_call(transpose, a, out_rows, first, in_rows, x_pad,
                      n_out + 1, dt=dt)
    rows = jnp.repeat(mask, BLK, total_repeat_length=n_out * BLK)
    out = out[: n_out * BLK]
    out = jnp.where(rows[:, None], out, jnp.zeros_like(out))
    return out[:n_valid, :f]


def make_local_spmm_bdense(n_loc: int, n_comb: int):
    """Block-dense + tile-tail local SpMM (custom-vjp): the dense tier
    runs the per-part 128x128 count-block matmuls on the MXU; leftover
    edges ride the tile kernel. Same contract as :func:`make_local_spmm`
    — forward reduces into owned rows, backward into the combined
    space."""

    @jax.custom_vjp
    def fn(bd, tiles_fwd, tiles_rev, combined):
        feat = combined.shape[1:]
        flat = int(np.prod(feat)) if feat else 1
        x2 = combined.reshape(combined.shape[0], flat)
        dense = _bdense_dir(bd, x2, False, n_loc)
        tail = _tiled_sum(tiles_fwd, combined, n_loc)
        return dense.reshape((n_loc,) + feat) + tail

    def fwd(bd, tiles_fwd, tiles_rev, combined):
        return fn(bd, tiles_fwd, tiles_rev, combined), (bd, tiles_fwd,
                                                        tiles_rev)

    def bwd(res, ct):
        bd, tiles_fwd, tiles_rev = res
        feat = ct.shape[1:]
        flat = int(np.prod(feat)) if feat else 1
        ct2 = ct.reshape(ct.shape[0], flat)
        dense = _bdense_dir(bd, ct2, True, n_comb)
        tail = _tiled_sum(tiles_rev, ct, n_comb)
        g_combined = (dense.reshape((n_comb,) + feat) + tail
                      ).astype(ct.dtype)
        f0 = jax.tree.map(
            lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0),
            (bd, tiles_fwd, tiles_rev))
        return f0 + (g_combined,)

    fn.defvjp(fwd, bwd)
    return fn


def _hub_static(pg: PartitionedGraph, out_feat):
    """The hub engine's static descriptor for the combined-layout call:
    num_src = num_dst = R (pg.hub_rows), so forward and backward are
    both (R, F) -> (R, F) with NO pad or slice copy passes."""
    from dgl1_tpu.ops.engine_hub import _Static
    from dgl1_tpu.ops.precision import get_matmul_precision

    return _Static(
        op="copy_lhs",
        num_src=pg.hub_rows,
        num_dst=pg.hub_rows,
        has_e=False,
        he=1,
        rep=int(np.prod(out_feat)) if out_feat else 1,
        u_feat=tuple(out_feat),
        e_feat=(),
        out_feat=tuple(out_feat),
        meta=pg.hub_meta,
        prec=get_matmul_precision(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _halo_update_c(axis_name: str, n_loc: int, wire: str,
                   send_idx, x):
    """In-place halo slot refresh with a hand-written transpose.

    AD of the take/all_to_all/dynamic_update_slice composition spends
    ~3 full (R, F) HBM passes (zeroing the overwritten region as a
    masked copy, a fresh zero buffer for the gather transpose, and the
    final add). The custom backward does the same math with one SMALL
    region write + one small scatter-add: route the halo-region
    cotangent back through the all_to_all (its own transpose), zero
    ONLY the halo rows of ct, and add the returned blocks into the send
    rows. Measured mesh=1 bench-graph fwd+bwd 6.8 -> ~5.5 ms."""
    sbuf = jnp.take(x, send_idx, axis=0, mode="clip")
    rbuf = _wire_a2a_impl(axis_name, wire, sbuf)
    halo = rbuf.reshape((-1,) + x.shape[1:]).astype(x.dtype)
    return jax.lax.dynamic_update_slice(
        x, halo, (n_loc,) + (0,) * (x.ndim - 1))


def _huc_fwd(axis_name, n_loc, wire, send_idx, x):
    return (_halo_update_c(axis_name, n_loc, wire, send_idx, x),
            (send_idx,))


def _huc_bwd(axis_name, n_loc, wire, res, ct):
    (send_idx,) = res
    P_, m_halo = send_idx.shape
    feat = ct.shape[1:]
    ct_halo = jax.lax.dynamic_slice(
        ct, (n_loc,) + (0,) * len(feat), (P_ * m_halo,) + feat)
    # Symmetric wire compression on the returning cotangent blocks.
    back = _wire_a2a_impl(
        axis_name, wire, ct_halo.reshape((P_, m_halo) + feat)).reshape(
            (P_ * m_halo,) + feat).astype(ct.dtype)
    g = jax.lax.dynamic_update_slice(
        ct, jnp.zeros_like(ct_halo), (n_loc,) + (0,) * len(feat))
    # Unused send slots default to row 0 and carry zero cotangent
    # (their halo slots feed no edges), so the add is safe.
    g = g.at[send_idx.reshape(-1)].add(back)
    return (np.zeros(send_idx.shape, dtype=jax.dtypes.float0), g)


_halo_update_c.defvjp(_huc_fwd, _huc_bwd)


def halo_update_combined(pg: PartitionedGraph, x_comb: jnp.ndarray,
                         axis_name: str = "p") -> jnp.ndarray:
    """Refresh the halo slots of a combined-layout activation in place.

    ``x_comb``: (R, F) per-device block in the canonical
    [owned | halo slots | pad] layout (R = pg.hub_rows). The owned rows
    feed the send gather; one all_to_all delivers fresh halo values,
    written back with a dynamic_update_slice — XLA performs it in place
    when the buffer is free, so the big activation is never copied
    (the copy-free property the concat-based :func:`halo_exchange`
    lacks). Backward is hand-written (one small region write, no full
    passes)."""
    return _halo_update_c(axis_name, pg.n_loc, pg.halo_dtype,
                          pg.send_idx[0], x_comb)


def fill_halo_combined(pg: PartitionedGraph, mesh: Mesh,
                       axis_name: str = "p"):
    """One-time halo fill for a combined-layout buffer whose owned rows
    are STATIC across steps (e.g. the input features of full-graph
    training): returns a jitted ``fill(x) -> x_filled`` over the mesh.
    Feed the result to paths built with ``halo_filled=True`` — the
    first layer then skips its halo update entirely, removing the
    dynamic_update_slice COPY that an undonated jit input forces
    (the diagnosed 1.23x sharded fwd+bwd overhead, PERF_NOTES r4)."""
    def body(pg_l, x):
        return halo_update_combined(pg_l, x[0], axis_name)[None]

    spec_pg = jax.tree.map(lambda _: P(axis_name), pg)
    fn = jax.shard_map(body, mesh=mesh, in_specs=(spec_pg, P(axis_name)),
                       out_specs=P(axis_name), check_vma=False)
    return functools.partial(jax.jit(fn), pg)


def sharded_gspmm_combined(pg: PartitionedGraph, x_comb: jnp.ndarray,
                           axis_name: str = "p",
                           halo_filled: bool = False) -> jnp.ndarray:
    """copy_u + sum in the combined layout (per-device view): halo
    update in place, then the flagship hub engine maps (R, F) -> (R, F)
    directly. Output rows: [0, n_loc) owned results; in vertex-cut mode
    the partial slots are exchanged and folded before returning; all
    rows >= n_loc of the RESULT are zeros (the next layer's halo update
    overwrites its slots). Requires a hub build
    (``build_partitioned_graph(..., hub=...)``).

    ``halo_filled=True``: the caller guarantees ``x_comb``'s halo slots
    already hold the owners' current rows (static input features pushed
    through :func:`fill_halo_combined` once) — the in-place update (and
    the copy it forces on an undonated jit input) is skipped."""
    from dgl1_tpu.ops.engine_hub import _gspmm_hub_sum

    if pg.hub is None:
        raise ValueError("combined layout requires hub=... at build")
    x2 = (x_comb if halo_filled
          else halo_update_combined(pg, x_comb, axis_name))
    static = _hub_static(pg, tuple(x_comb.shape[1:]))
    hub_local = jax.tree.map(lambda v: v[0], pg.hub)
    e_dummy = x2[:1, :1] * 0.0
    y = _gspmm_hub_sum(static, hub_local, x2, e_dummy)
    if pg.m_part == 0:
        return y
    n_loc, m_part, P_ = pg.n_loc, pg.m_part, pg.num_parts
    out_own = jax.lax.dynamic_slice(
        y, (0,) * y.ndim, (n_loc,) + y.shape[1:])
    pbuf = jax.lax.dynamic_slice(
        y, (n_loc,) + (0,) * (y.ndim - 1),
        (P_ * m_part,) + y.shape[1:]).reshape(
            (P_, m_part) + y.shape[1:])
    rbuf = jax.lax.all_to_all(pbuf, axis_name, split_axis=0,
                              concat_axis=0)
    recv_flat = rbuf.reshape((-1,) + y.shape[1:])
    merged = partial_merge(pg.recv_pos[0], pg.slot_node[0], out_own,
                           recv_flat)
    pad = jnp.zeros((pg.hub_rows - n_loc,) + y.shape[1:], y.dtype)
    return jnp.concatenate([merged, pad], axis=0)


def _hub_local_spmm(pg: PartitionedGraph, combined: jnp.ndarray
                    ) -> jnp.ndarray:
    """Local reduce through the flagship hub-dense engine (per-device
    view): the SAME custom-vjp op as the single-chip path — forward
    reduces the combined [owned | halo] table into the [owned | partial]
    output rows, backward reduces the cotangent into the combined space
    (the all_to_all transpose then returns halo cotangents to owners).
    Per-part layouts share one static geometry (parallel/hub_shard.py),
    so shard_map traces a single program."""
    from dgl1_tpu.ops.engine_hub import _gspmm_hub_sum

    n_out = pg.n_loc + pg.num_parts * pg.m_part
    static = _hub_static(pg, tuple(combined.shape[1:]))
    hub_local = jax.tree.map(lambda v: v[0], pg.hub)
    # Lift the (n_comb, F) combined table into the R-row layout the hub
    # format is built in (one copy — callers that keep activations in
    # the combined layout end-to-end avoid it: sharded_gspmm_combined).
    x_pad = jnp.pad(
        combined,
        ((0, pg.hub_rows - combined.shape[0]),)
        + ((0, 0),) * (combined.ndim - 1))
    # Derive the (unused) e placeholder from a sharded input: a fresh
    # jnp.zeros constant would land in the custom-vjp residuals with
    # replicated sharding and fail shard_map's output-spec match.
    e_dummy = x_pad[:1, :1] * 0.0
    return _gspmm_hub_sum(static, hub_local, x_pad, e_dummy)[:n_out]


def local_spmm_sum(pg: PartitionedGraph, combined: jnp.ndarray) -> jnp.ndarray:
    """Per-device segment-sum over this device's edges.

    ``combined``: (n_loc + P*m_halo, F). Returns (n_out, F) where
    ``n_out = n_loc + P*m_part`` — owned rows first, then the partial
    slots vertex-cut edges reduce into (n_out == n_loc in pure halo
    mode). Uses the Pallas tile kernel when descriptors are present,
    else the XLA segment engine (padded edges carry sentinel dst ==
    n_out, dropped by scatter OOB semantics).
    """
    n_out = pg.n_loc + pg.num_parts * pg.m_part
    if pg.hub is not None:
        return _hub_local_spmm(pg, combined)
    if pg.bdense is not None:
        n_comb = pg.n_loc + pg.num_parts * pg.m_halo
        fn = make_local_spmm_bdense(n_out, n_comb)
        return fn({k: v[0] for k, v in pg.bdense.items()},
                  _tiles_device_view(pg.tiles_fwd),
                  _tiles_device_view(pg.tiles_rev), combined)
    if pg.tiles_fwd is not None:
        n_comb = pg.n_loc + pg.num_parts * pg.m_halo
        fn = make_local_spmm(n_out, n_comb)
        return fn(_tiles_device_view(pg.tiles_fwd),
                  _tiles_device_view(pg.tiles_rev), combined)
    msg = jnp.take(combined, pg.esrc[0], axis=0, mode="clip")
    return jax.ops.segment_sum(
        msg, pg.edst[0], num_segments=n_out, indices_are_sorted=True
    )


@jax.custom_vjp
def partial_merge(recv_pos, slot_node, out_own, recv_flat):
    """Fold received vertex-cut partials into owned rows.

    ``recv_pos`` (n_loc, P): receive-buffer position of each sender's
    partial for an owned node (OOB sentinel -> contributes 0).
    ``recv_flat`` (P*m_part, F). Both directions of AD are pure gathers:
    the transpose routes ct rows to slots via ``slot_node`` (each slot
    feeds exactly one owned node) — no scatter anywhere.
    """
    gathered = jnp.take(recv_flat, recv_pos, axis=0, mode="fill",
                        fill_value=0.0)  # (n_loc, P, F)
    return out_own + jnp.sum(gathered, axis=1)


def _pm_fwd(recv_pos, slot_node, out_own, recv_flat):
    return partial_merge(recv_pos, slot_node, out_own, recv_flat), \
        (recv_pos, slot_node)


def _pm_bwd(res, ct):
    recv_pos, slot_node = res
    g_recv = jnp.take(ct, slot_node, axis=0, mode="fill", fill_value=0.0)
    f0 = np.zeros(recv_pos.shape, dtype=jax.dtypes.float0)
    f0s = np.zeros(slot_node.shape, dtype=jax.dtypes.float0)
    return f0, f0s, ct, g_recv


partial_merge.defvjp(_pm_fwd, _pm_bwd)


@jax.custom_vjp
def scatter_to_slots(slot_node, recv_pos, x):
    """Owner-side dual of :func:`partial_merge`: lay out owned-node rows
    into the per-sender partial-slot order (``slot_node`` sentinel
    ``n_loc`` -> zero row). Backward is a pure ``recv_pos`` gather-sum —
    no scatter in either direction. Used to ship per-destination values
    (e.g. GAT's er half-logits) from owners to the parts holding their
    split in-edges."""
    return jnp.take(x, slot_node, axis=0, mode="fill", fill_value=0.0)


def _sts_fwd(slot_node, recv_pos, x):
    return scatter_to_slots(slot_node, recv_pos, x), (slot_node, recv_pos)


def _sts_bwd(res, ct):
    slot_node, recv_pos = res
    g_x = jnp.sum(
        jnp.take(ct, recv_pos, axis=0, mode="fill", fill_value=0.0), axis=1
    )
    return (np.zeros(slot_node.shape, dtype=jax.dtypes.float0),
            np.zeros(recv_pos.shape, dtype=jax.dtypes.float0),
            g_x)


scatter_to_slots.defvjp(_sts_fwd, _sts_bwd)


def sharded_gspmm(pg: PartitionedGraph, feat_local: jnp.ndarray,
                  axis_name: str = "p", edge_weight: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """copy_u + sum over the partitioned graph (per-device view).

    In vertex-cut mode (``pg.m_part > 0``) the local reduce lands partial
    rows for foreign destinations; a second ``all_to_all`` returns them
    to their owners, where :func:`partial_merge` folds them in — the
    PowerGraph-style split-destination flow that balances compute on
    power-law graphs (one mega-hub's in-edges spread over all chips at a
    cost of <= P-1 extra rows of ICI traffic).
    """
    n_out = pg.n_loc + pg.num_parts * pg.m_part
    combined = halo_exchange(pg, feat_local, axis_name)
    if edge_weight is None:
        y = local_spmm_sum(pg, combined)
    else:
        msg = jnp.take(combined, pg.esrc[0], axis=0, mode="clip")
        msg = msg * edge_weight[0]
        y = jax.ops.segment_sum(
            msg, pg.edst[0], num_segments=n_out, indices_are_sorted=True
        )
    if pg.m_part == 0:
        return y
    out_own = y[: pg.n_loc]
    pbuf = y[pg.n_loc:].reshape((pg.num_parts, pg.m_part)
                                + y.shape[1:])
    rbuf = jax.lax.all_to_all(pbuf, axis_name, split_axis=0, concat_axis=0)
    recv_flat = rbuf.reshape((-1,) + y.shape[1:])
    return partial_merge(pg.recv_pos[0], pg.slot_node[0], out_own,
                         recv_flat)


def make_sharded_gcn_matvec_combined(pg: PartitionedGraph, mesh: Mesh,
                                     axis_name: str = "p",
                                     halo_filled: bool = False):
    """Combined-layout ``y = D^-1/2 A D^-1/2 x`` over the mesh: x/y are
    (P, R, F) with R = pg.hub_rows — activations stay in the padded
    [owned | halo | pad] layout across layers so no per-layer
    concat/pad copy passes exist (sharding overhead is just the tiny
    halo all_to_all + in-place slot update). Owned rows are [0, n_loc);
    all other rows of y are zero. ``halo_filled``: see
    :func:`sharded_gspmm_combined` (static-input first layer; NOTE the
    out_deg scaling is applied to halo rows too, so prefilled buffers
    must come from :func:`fill_halo_combined` on the RAW features)."""
    if pg.hub is None:
        raise ValueError("combined layout requires hub=... at build")
    R = pg.hub_rows

    def body(pg_local, x):
        norm_out = jnp.where(pg_local.out_deg[0] > 0,
                             pg_local.out_deg[0], 1.0) ** -0.5
        norm_in = jnp.where(pg_local.in_deg[0] > 0,
                            pg_local.in_deg[0], 1.0) ** -0.5
        if halo_filled:
            # Prefilled halo rows carry the owners' RAW features; scale
            # them by the carried node's out-norm (halo_out_deg, built
            # alongside send_idx) instead of refreshing the slots.
            hod = pg_local.halo_out_deg[0]
            norm_halo = jnp.where(hod > 0, hod, 1.0) ** -0.5
            norm_out = jnp.concatenate([norm_out, norm_halo])
        pad = R - norm_out.shape[0]
        norm_out = jnp.pad(norm_out, (0, pad))
        norm_in = jnp.pad(norm_in, (0, R - norm_in.shape[0]),
                          constant_values=0.0)
        h = x[0] * norm_out[:, None]
        agg = sharded_gspmm_combined(pg_local, h, axis_name, halo_filled)
        return (agg * norm_in[:, None])[None]

    spec_pg = jax.tree.map(lambda _: P(axis_name), pg)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_pg, P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return functools.partial(fn, pg)


def make_sharded_gcn_matvec(pg: PartitionedGraph, mesh: Mesh,
                            axis_name: str = "p"):
    """Build a jittable ``y = D^-1/2 A D^-1/2 x`` over the mesh.

    ``x``/``y`` layout: (P, n_loc, F) sharded on the mesh axis. The degree
    normalization uses precomputed *global* degrees, so the result matches
    the single-device GraphConv exactly.
    """

    def body(pg_local, x):
        # Per-device blocks carry a leading axis of size 1.
        norm_out = jnp.where(pg_local.out_deg[0] > 0,
                             pg_local.out_deg[0], 1.0) ** -0.5
        norm_in = jnp.where(pg_local.in_deg[0] > 0,
                            pg_local.in_deg[0], 1.0) ** -0.5
        h = x[0] * norm_out[:, None]
        agg = sharded_gspmm(pg_local, h, axis_name)
        return (agg * norm_in[:, None])[None]

    spec_pg = jax.tree.map(lambda _: P(axis_name), pg)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_pg, P(axis_name)),
        out_specs=P(axis_name),
        # pallas_call inside the body does not annotate varying-mesh-axes;
        # skip the vma check (all operands are explicitly 'p'-sharded).
        check_vma=False,
    )
    return functools.partial(fn, pg)


def sharded_gat_attention(pg: PartitionedGraph, el_local, er_local,
                          ft_local, negative_slope: float = 0.2,
                          axis_name: str = "p"):
    """Edge-softmax attention over the partitioned graph (per-device view).

    ``out[d] = sum_e softmax_d(leaky_relu(el[s]+er[d])) * ft[s]`` — the
    GATConv aggregation (parity: the distributed analog the reference
    lacks; DistDGL trains GAT only via sampling). Requires
    destination-owner edge placement (the default ``edge_owner='halo'``
    build): every destination's in-edges are local, so the per-dst
    softmax is EXACT with no cross-part max/sum — the only communication
    is one halo ``all_to_all`` of the source tensors (el, ft), like the
    GCN path.

    el_local (n_loc, H), er_local (n_loc, H), ft_local (n_loc, H, D);
    returns (n_loc, H, D).

    Vertex-cut mode (``pg.m_part > 0``, split destinations): the per-dst
    softmax becomes a cross-part ONLINE softmax — each part computes
    (max, exp-sum, weighted-numerator) partials over its share of a split
    destination's in-edges; the owner's er half-logits travel to the
    edge-holding parts through one extra ``all_to_all`` (via
    :func:`scatter_to_slots`), the packed (m, s, n) partials return
    through the existing partial all_to_all, and the owner merges with
    ``exp(m_p - M)`` rescaling — exact softmax, fwd AND grad, with no
    scatter anywhere (SURVEY.md §2.3 graph-partition-parallel row; the
    flash-attention-style merge the reference never needed because it
    pulls all edges to one worker).
    """
    if pg.m_part:
        return _vertex_cut_gat_attention(pg, el_local, er_local, ft_local,
                                         negative_slope, axis_name)
    n_loc = pg.n_loc
    h, d = ft_local.shape[1], ft_local.shape[2]
    el_c = halo_exchange(pg, el_local, axis_name)
    ft_c = halo_exchange(pg, ft_local.reshape(n_loc, h * d), axis_name)
    esrc, edst = pg.esrc[0], pg.edst[0]
    valid = edst < n_loc  # sentinel n_loc marks padded edge slots

    el_e = jnp.take(el_c, esrc, axis=0, mode="clip")
    er_pad = jnp.concatenate(
        [er_local, jnp.zeros((1, h), er_local.dtype)], axis=0)
    er_e = jnp.take(er_pad, jnp.minimum(edst, n_loc), axis=0)
    z = el_e + er_e
    z = jnp.where(z >= 0, z, negative_slope * z)
    z = jnp.where(valid[:, None], z, -1e30)
    # Stop-grad max shift (exact per destination: in-edges are local).
    m = jax.lax.stop_gradient(jax.ops.segment_max(
        z, edst, num_segments=n_loc + 1, indices_are_sorted=True))
    m = jnp.maximum(m, -1e30)[:n_loc]
    m_e = jnp.take(jnp.concatenate(
        [m, jnp.zeros((1, h), m.dtype)], axis=0),
        jnp.minimum(edst, n_loc), axis=0)
    p = jnp.where(valid[:, None], jnp.exp(z - m_e), 0.0)
    ft_e = jnp.take(ft_c, esrc, axis=0, mode="clip").reshape(-1, h, d)
    num = jax.ops.segment_sum(p[:, :, None] * ft_e, edst,
                              num_segments=n_loc + 1,
                              indices_are_sorted=True)[:n_loc]
    den = jax.ops.segment_sum(p, edst, num_segments=n_loc + 1,
                              indices_are_sorted=True)[:n_loc]
    return num / jnp.maximum(den, 1e-30)[:, :, None]


def _vertex_cut_gat_attention(pg: PartitionedGraph, el_local, er_local,
                              ft_local, negative_slope: float,
                              axis_name: str):
    """Cross-part online-softmax GAT aggregation (per-device view)."""
    P = pg.num_parts
    n_loc, m_part = pg.n_loc, pg.m_part
    n_out = n_loc + P * m_part
    h, d = ft_local.shape[1], ft_local.shape[2]
    slot_node = pg.slot_node[0]
    recv_pos = pg.recv_pos[0]
    NEG = -1e30

    # Source-side tensors ride the halo all_to_all as usual.
    el_c = halo_exchange(pg, el_local, axis_name)
    ft_c = halo_exchange(pg, ft_local.reshape(n_loc, h * d), axis_name)

    # Destination-side er: owners lay their rows into partial-slot order
    # and one all_to_all delivers them to the parts holding the edges.
    er_sbuf = scatter_to_slots(slot_node, recv_pos, er_local)
    er_tail = jax.lax.all_to_all(
        er_sbuf.reshape(P, m_part, h), axis_name, split_axis=0,
        concat_axis=0,
    ).reshape(P * m_part, h)
    er_ext = jnp.concatenate([er_local, er_tail], axis=0)  # (n_out, H)

    esrc, edst = pg.esrc[0], pg.edst[0]
    valid = edst < n_out  # sentinel n_out marks padded edge slots
    el_e = jnp.take(el_c, esrc, axis=0, mode="clip")
    er_e = jnp.take(er_ext, jnp.minimum(edst, n_out - 1), axis=0)
    z = el_e + er_e
    z = jnp.where(z >= 0, z, negative_slope * z)
    z = jnp.where(valid[:, None], z, NEG)

    # Local partials per output row (owned nodes + foreign-dst slots).
    m_row = jax.lax.stop_gradient(jax.ops.segment_max(
        z, edst, num_segments=n_out + 1, indices_are_sorted=True))
    m_row = jnp.maximum(m_row, NEG)[:n_out]
    p_e = jnp.where(valid[:, None],
                    jnp.exp(z - jnp.take(m_row, jnp.minimum(edst, n_out - 1),
                                         axis=0)),
                    0.0)
    ft_e = jnp.take(ft_c, esrc, axis=0, mode="clip").reshape(-1, h, d)
    s_row = jax.ops.segment_sum(p_e, edst, num_segments=n_out + 1,
                                indices_are_sorted=True)[:n_out]
    n_row = jax.ops.segment_sum(p_e[:, :, None] * ft_e, edst,
                                num_segments=n_out + 1,
                                indices_are_sorted=True)[:n_out]

    # Ship (m, s, n) partials of foreign destinations to their owners —
    # packed into ONE all_to_all along the feature axis.
    pack = jnp.concatenate(
        [m_row[n_loc:], s_row[n_loc:], n_row[n_loc:].reshape(-1, h * d)],
        axis=-1,
    ).reshape(P, m_part, h * (2 + d))
    recv = jax.lax.all_to_all(pack, axis_name, split_axis=0, concat_axis=0
                              ).reshape(P * m_part, h * (2 + d))
    recv_m = jax.lax.stop_gradient(recv[:, :h])
    recv_s = recv[:, h:2 * h]
    recv_n = recv[:, 2 * h:]

    # Owner-side online merge: global max, then exp(m_p - M) rescale.
    own_m, own_s = m_row[:n_loc], s_row[:n_loc]
    own_n = n_row[:n_loc].reshape(n_loc, h * d)
    gathered_m = jnp.take(recv_m, recv_pos, axis=0, mode="fill",
                          fill_value=NEG)  # (n_loc, P, H)
    M = jnp.maximum(own_m, jnp.max(gathered_m, axis=1))  # stop-grad inputs
    w_own = jnp.exp(own_m - M)
    denom = own_s * w_own
    numer = own_n * jnp.reshape(
        jnp.broadcast_to(w_own[:, :, None], (n_loc, h, d)), (n_loc, h * d))

    M_slot = jnp.take(M, slot_node, axis=0, mode="fill", fill_value=0.0)
    w_slot = jnp.exp(recv_m - M_slot)  # empty partials: m=-1e30 -> w ~ 0
    s_slot = recv_s * w_slot
    n_slot = recv_n * jnp.reshape(
        jnp.broadcast_to(w_slot[:, :, None], (P * m_part, h, d)),
        (P * m_part, h * d))
    denom = partial_merge(recv_pos, slot_node, denom, s_slot)
    numer = partial_merge(recv_pos, slot_node, numer, n_slot)
    out = numer.reshape(n_loc, h, d) / jnp.maximum(denom, 1e-30)[:, :, None]
    return out


def sharded_gat_attention_fused(pg: PartitionedGraph, el_local, er_local,
                                ft_local, negative_slope: float = 0.2,
                                axis_name: str = "p"):
    """Edge-softmax attention through the FUSED flash-style hub kernels
    per part (round 4): the segment-op path (:func:`sharded_gat_attention`)
    runs XLA scatter reductions — the known TPU cost this engine exists
    to avoid. Requires a hub build (``hub=...``) and dst-owner edge
    placement (halo mode: every destination's in-edges are local, so
    the per-dst softmax is exact with no cross-part statistics —
    vertex-cut graphs use the online-softmax segment path)."""
    from dgl1_tpu.ops.attention import _Static as _AStatic, _gat_attention
    from dgl1_tpu.ops.precision import get_matmul_precision

    if pg.hub is None:
        raise ValueError("fused sharded attention requires hub=... at "
                         "build")
    if pg.m_part:
        raise ValueError("vertex-cut placement: use "
                         "sharded_gat_attention (cross-part online "
                         "softmax)")
    R = pg.hub_rows
    n_loc = pg.n_loc
    h, d = ft_local.shape[1], ft_local.shape[2]
    el_c = halo_exchange(pg, el_local, axis_name)
    ft_c = halo_exchange(pg, ft_local.reshape(n_loc, h * d), axis_name)
    el2 = jnp.pad(el_c, ((0, R - el_c.shape[0]), (0, 0)))
    ft2 = jnp.pad(ft_c, ((0, R - ft_c.shape[0]), (0, 0)))
    er2 = jnp.pad(er_local, ((0, R - n_loc), (0, 0)))
    static = _AStatic(
        slope=float(negative_slope), num_src=R, num_dst=R, h=h, d=d,
        meta=pg.hub_meta, prec=get_matmul_precision(), attn_drop=0.0)
    hub_local = jax.tree.map(lambda v: v[0], pg.hub)
    # Sharded-input-derived seed (a fresh int constant would become a
    # replicated custom-vjp residual — see _hub_local_spmm).
    seed = (el2[:1, 0] * 0.0).astype(jnp.int32)
    out = _gat_attention(static, hub_local, el2, er2, ft2, seed)
    return out[:n_loc].reshape(n_loc, h, d)


def make_sharded_gat_layer(pg: PartitionedGraph, mesh: Mesh,
                           negative_slope: float = 0.2,
                           axis_name: str = "p", fused: bool = False):
    """Jittable sharded GAT aggregation: inputs/outputs (P, n_loc, ...)
    sharded on the mesh axis; weights applied by the caller (replicated
    dense projections are XLA's job, like the single-device GATConv).
    ``fused=True`` routes through the per-part flash-style hub kernels
    (needs ``hub=...`` at build + halo placement)."""

    def body(pg_local, el, er, ft):
        fn = (sharded_gat_attention_fused if fused
              else sharded_gat_attention)
        return fn(pg_local, el[0], er[0], ft[0], negative_slope,
                  axis_name)[None]

    spec_pg = jax.tree.map(lambda _: P(axis_name), pg)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec_pg, P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return functools.partial(fn, pg)
