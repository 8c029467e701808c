"""Hub-dense HYB layout builder (host side, numpy).

The TPU g-SpMM engines are gather-bound: every scatter-free formulation
pays one gathered feature row per edge, and the measured gather unit rate
(~90M rows/s on v5e, docs/PERF_NOTES.md) caps them far below the MXU.
This module builds the preprocessing for the *hub-dense* engine
(``ops/engine_hub.py``), which routes edges incident to high-in-degree
destinations ("hubs" — the head of a power-law degree distribution)
through MXU one-hot matmuls instead:

* Hub destinations are compacted into *groups* of ``BLK`` (128) output
  rows; source nodes are viewed in natural-order *windows* of ``BLK``
  rows.
* Hub edges are sorted by (group, window) and cut into *chunks* of
  ``CHUNK`` slots, each chunk entirely inside one (group, window) cell.
  Per chunk the kernel computes ``S_hub^T @ (S_src @ U_window)`` — both
  the per-edge "gather" and the per-destination reduce become 128-wide
  matmuls on the MXU, no gather/scatter instruction anywhere.
* The residual edges into non-hub rows (the sparse tail of the degree
  distribution) stay on the degree-bucketed ELL path; its final
  inverse-permutation gather is re-pointed so hub rows read from the
  dense result — the merge costs nothing.

This is the "clustered block-dense MXU SpMM" item of the round-1 kernel
roadmap (docs/PERF_NOTES.md), specialised to the clustering that every
power-law graph already has for free: the hub block-rows.

Parity note: replaces the coverage of the reference's cuSPARSE/atomic
CUDA SpMM (``src/array/cuda/spmm.cu``) for the head of the degree
distribution; DGL has no analogous format because GPUs have atomics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

ID_DTYPE = np.int32
BLK = 128          # group rows / window rows (MXU tile edge)
# Edge slots per chunk. Must be 1024: 1-D int32 kernel operands get XLA's
# T(1024) tiled layout on TPU and Mosaic requires the block shape to match
# (same constraint as graph.TILE_EDGES).
CHUNK = 1024
MAX_GROUPS = 32    # cap on dense hub rows: 32*128 = 4096 hubs
SENT = np.int32(1 << 30)  # out-of-bounds gather index -> fill value


def _pad_runs(order: np.ndarray, run_ids: np.ndarray,
              values: Tuple[np.ndarray, ...], chunk: int):
    """Sort ``values`` by ``order``, split at ``run_ids`` boundaries and pad
    every run to a multiple of ``chunk``.

    run_ids: (E,) int64 combined sort key AFTER ordering (one value per
    run). Returns (padded value arrays with -1/0 fill, run_first_chunk
    metadata helpers): (slots, per-run chunk counts, run start ids).
    """
    e = order.shape[0]
    if e == 0:
        return [np.zeros((0,), ID_DTYPE) for _ in values], np.zeros(
            (0,), np.int64), np.zeros((0,), np.int64)
    keys = run_ids
    change = np.empty((e,), dtype=bool)
    change[0] = True
    np.not_equal(keys[1:], keys[:-1], out=change[1:])
    run_starts = np.flatnonzero(change)
    run_lens = np.diff(np.append(run_starts, e))
    padded_lens = -(-run_lens // chunk) * chunk
    offsets = np.concatenate([[0], np.cumsum(padded_lens)[:-1]])
    total = int(padded_lens.sum())

    within = np.arange(e, dtype=np.int64) - np.repeat(run_starts, run_lens)
    dest = np.repeat(offsets, run_lens) + within

    out = []
    for v, fill in values:
        buf = np.full((total,), fill, dtype=ID_DTYPE)
        buf[dest] = v[order]
        out.append(buf)
    return out, padded_lens // chunk, run_starts


def _chunk_descriptors(n_chunks_per_run: np.ndarray, run_starts: np.ndarray,
                       out_key: np.ndarray, in_key: np.ndarray,
                       order: np.ndarray):
    """Per-chunk (out_id, in_id, first-of-out-block flag)."""
    if len(run_starts) == 0:
        z = np.zeros((0,), ID_DTYPE)
        return z, z.copy(), z.copy()
    run_out = out_key[order[run_starts]].astype(ID_DTYPE)
    run_in = in_key[order[run_starts]].astype(ID_DTYPE)
    chunk_out = np.repeat(run_out, n_chunks_per_run)
    chunk_in = np.repeat(run_in, n_chunks_per_run)
    first = np.zeros((len(chunk_out),), dtype=ID_DTYPE)
    first[0] = 1
    first[1:] = (chunk_out[1:] != chunk_out[:-1]).astype(ID_DTYPE)
    return chunk_out, chunk_in, first


def build_hub_format(csc_indptr: np.ndarray, csc_src: np.ndarray,
                     csc_eid: np.ndarray, csc_dst: np.ndarray,
                     num_src: int, num_dst: int, num_edges: int,
                     num_padded: int, build_ell,
                     min_group_edges: Optional[int] = None):
    """Build the hub-dense layout. Returns (meta, arrays) or (None, None)
    when no hub group clears the density bar (the engine then declines and
    dispatch falls through to ELL).

    ``build_ell`` is ``graph._build_ell`` (injected to avoid a circular
    import); it is reused for the tail in both reduce directions.
    """
    deg = np.diff(csc_indptr[: num_dst + 1]).astype(np.int64)
    n_win = -(-num_src // BLK)
    if min_group_edges is None:
        # A chunk (2 matmuls, ~CHUNK*BLK*F MACs each) beats the gather rate
        # down to ~25% occupancy; below n_win*CHUNK/4 edges a group is
        # mostly padding. Absolute floor keeps tiny graphs off this path.
        min_group_edges = max(4 * CHUNK, (n_win * CHUNK) // 4)

    order_by_deg = np.argsort(-deg, kind="stable")
    n_groups = 0
    edges_covered = 0
    while n_groups < MAX_GROUPS:
        rows = order_by_deg[n_groups * BLK: (n_groups + 1) * BLK]
        if rows.size == 0:
            break
        group_edges = int(deg[rows].sum())
        if group_edges < min_group_edges:
            break
        n_groups += 1
        edges_covered += group_edges
    if n_groups == 0:
        return None, None

    k_slots = n_groups * BLK
    hub_rows = order_by_deg[:k_slots]
    hub_ids = np.full((k_slots,), SENT, dtype=ID_DTYPE)
    hub_ids[: hub_rows.size] = hub_rows
    slot_of_row = np.full((num_dst,), SENT, dtype=ID_DTYPE)
    slot_of_row[hub_rows] = np.arange(hub_rows.size, dtype=ID_DTYPE)

    # ------------------------------------------------------------------
    # Split edges: hub set (dense path) vs tail (ELL path). csc arrays are
    # dst-sorted with padding past num_edges.
    # ------------------------------------------------------------------
    dst_e = csc_dst[:num_edges]
    src_e = csc_src[:num_edges]
    eid_e = csc_eid[:num_edges]
    slot_e = slot_of_row[dst_e]
    is_hub = slot_e != SENT

    h_src = src_e[is_hub].astype(np.int64)
    h_slot = slot_e[is_hub].astype(np.int64)
    h_eid = eid_e[is_hub]
    group = h_slot // BLK
    window = h_src // BLK
    a_local = (h_src % BLK).astype(ID_DTYPE)
    b_local = (h_slot % BLK).astype(ID_DTYPE)

    # Forward layout: group-major (output revisits accumulate in VMEM).
    f_order = np.lexsort((window, group))
    f_key = (group * n_win + window)[f_order]
    (fa, fb, fe), f_nchunks, f_starts = _pad_runs(
        f_order, f_key, ((a_local, -1), (b_local, -1), (h_eid, 0)), CHUNK
    )
    f_out, f_in, f_first = _chunk_descriptors(
        f_nchunks, f_starts, group, window, f_order
    )

    # Backward layout: window-major (outputs are source windows). Selector
    # roles swap: ``ba`` picks rows of the compacted hub cotangent block
    # (input side), ``bb`` scatters into the source window (output side).
    b_order = np.lexsort((group, window))
    b_key = (window * (group.max(initial=0) + 1) + group)[b_order]
    (ba, bb, be), b_nchunks, b_starts = _pad_runs(
        b_order, b_key, ((b_local, -1), (a_local, -1), (h_eid, 0)), CHUNK
    )
    b_out, b_in, b_first = _chunk_descriptors(
        b_nchunks, b_starts, window, group, b_order
    )
    win_mask = np.zeros((n_win,), dtype=bool)
    win_mask[b_out[: len(b_out)]] = True

    # Edge-id -> forward dense slot (for grad_e extraction).
    edge_to_fslot = np.full((num_padded,), SENT, dtype=ID_DTYPE)
    real = fa >= 0
    edge_to_fslot[fe[real]] = np.flatnonzero(real).astype(ID_DTYPE)

    # ------------------------------------------------------------------
    # Tail: rebuild CSC/CSR restricted to non-hub-destination edges, then
    # reuse the ELL builder in both directions.
    # ------------------------------------------------------------------
    t_dst = dst_e[~is_hub]
    t_src = src_e[~is_hub]
    t_eid = eid_e[~is_hub]
    n_tail = int(t_dst.shape[0])

    t_counts = np.bincount(t_dst, minlength=num_dst) if n_tail else \
        np.zeros((num_dst,), np.int64)
    t_indptr = np.zeros((num_dst + 1,), dtype=np.int64)
    np.cumsum(t_counts, out=t_indptr[1:])
    tail_meta_dst, tail_dst_ell = build_ell(
        t_indptr, t_src, t_eid, num_dst, n_tail
    )

    r_order = np.argsort(t_src, kind="stable")
    r_counts = np.bincount(t_src, minlength=num_src) if n_tail else \
        np.zeros((num_src,), np.int64)
    r_indptr = np.zeros((num_src + 1,), dtype=np.int64)
    np.cumsum(r_counts, out=r_indptr[1:])
    tail_meta_src, tail_src_ell = build_ell(
        r_indptr, t_dst[r_order], t_eid[r_order], num_src, n_tail
    )

    # Merge permutation: non-hub rows read the tail ELL stack; hub rows
    # read the dense result appended right after it; empty rows read OOB
    # (fill 0). The default tail inv_perm sends zero-degree rows to
    # len(nz), which is in-bounds once the dense block is concatenated —
    # remap those to the OOB sentinel first.
    n_tail_rows = int(sum(n for _, n in tail_meta_dst))
    t_inv = tail_dst_ell["inv_perm"].astype(np.int64)
    t_inv = np.where(t_inv >= n_tail_rows, np.int64(SENT), t_inv)
    hub_mask_rows = slot_of_row != SENT
    t_inv[hub_mask_rows] = n_tail_rows + slot_of_row[hub_mask_rows]
    t_inv = t_inv.astype(ID_DTYPE)

    # Compact tail edge endpoints (for grad_e without full-E gathers).
    t_pad = max(-(-max(n_tail, 1) // CHUNK) * CHUNK, CHUNK)
    tail_src_c = np.full((t_pad,), SENT, dtype=ID_DTYPE)
    tail_dst_c = np.full((t_pad,), SENT, dtype=ID_DTYPE)
    tail_src_c[:n_tail] = t_src
    tail_dst_c[:n_tail] = t_dst
    edge_to_tslot = np.full((num_padded,), SENT, dtype=ID_DTYPE)
    edge_to_tslot[t_eid] = np.arange(n_tail, dtype=ID_DTYPE)

    meta = (
        int(len(f_out)),          # n_chunks_fwd
        int(len(b_out)),          # n_chunks_bwd
        int(n_win),
        int(n_groups),
        tuple(tail_meta_dst),
        tuple(tail_meta_src),
        int(n_tail_rows),
        int(edges_covered),
    )
    arrays = {
        "fa": fa, "fb": fb, "fe": fe,
        "f_in": f_in, "f_out": f_out, "f_first": f_first,
        "ba": ba, "bb": bb, "be": be,
        "b_in": b_in, "b_out": b_out, "b_first": b_first,
        "hub_ids": hub_ids,
        "win_mask": win_mask,
        "t_idx": tail_dst_ell["idx"], "t_eid": tail_dst_ell["eid"],
        "t_inv": t_inv,
        "r_idx": tail_src_ell["idx"], "r_eid": tail_src_ell["eid"],
        "r_inv": tail_src_ell["inv_perm"],
        "tail_src": tail_src_c, "tail_dst": tail_dst_c,
        "edge_to_fslot": edge_to_fslot, "edge_to_tslot": edge_to_tslot,
    }
    return meta, arrays
