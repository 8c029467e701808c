"""Hub-dense HYB layout builder (host side, numpy).

The TPU g-SpMM engines are gather-bound: every scatter-free formulation
pays one gathered feature row per edge, and the measured gather unit rate
(~90M rows/s on v5e, docs/PERF_NOTES.md) caps them far below the MXU.
This module builds the preprocessing for the *hub-dense* engine
(``ops/engine_hub.py``), a three-tier HYB split by destination in-degree:

* **Dense tier** — groups of 128 hub rows whose edge count exceeds
  ``dense_floor`` (~num_src/2, the MAC crossover): stored as a dense
  ``(num_src, 128·D)`` float count matrix ``C`` so the whole reduce is
  one MXU matmul ``C^T @ U`` — per-edge cost *amortizes away* entirely
  (a mega-hub with 2M in-edges costs the same as one with 300k).
* **Chunked tier** — remaining hub groups: edges sorted by
  (group, source-window) and cut into 1024-slot chunks; per chunk the
  kernel computes ``S_hub^T @ (S_src @ U_window)`` — both the per-edge
  "gather" and the reduce are 128-wide one-hot matmuls on the MXU.
* **ELL tail** — everything else stays on the degree-bucketed ELL path;
  the two dense results are appended before ELL's final
  inverse-permute gather, so the three-way merge costs zero extra passes.

The dense tier only covers unweighted ops (the count matrix is static);
``u_mul_e`` with per-edge weights uses the *full* chunk layouts (built
over all hub edges) where the weight folds into the source one-hot.

Chunk geometry: 1-D int32 kernel operands get XLA's T(1024) tiled layout
on TPU and Mosaic requires the block shape to match — hence CHUNK=1024
(same constraint as graph.TILE_EDGES).

Parity note: replaces the coverage of the reference's cuSPARSE/atomic
CUDA SpMM (``src/array/cuda/spmm.cu``) for the head of the degree
distribution; DGL has no analogous format because GPUs have atomics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

ID_DTYPE = np.int32
BLK = 128          # group rows / window rows (MXU tile edge)
DENSE_RB = 1024    # source-row block of the dense-tier reduce kernel
# Edge slots per chunk. 1024 matches XLA's T(1024) 1-D int32 layout
# (sub-1024 blocks fail to compile); MULTIPLES are legal and halve the
# per-grid-step overhead of the chunk kernels when runs are long, at
# the cost of more padding on short (group, window) runs — overridable
# for experiments via DGL1_TPU_CHUNK (measured in PERF_NOTES round 4).
import os as _os

CHUNK = int(_os.environ.get("DGL1_TPU_CHUNK", "1024"))
if CHUNK % 1024:
    raise ValueError("DGL1_TPU_CHUNK must be a multiple of 1024")
MAX_GROUPS = 32    # cap on hub rows: 32*128 = 4096 hubs
MAX_DENSE_GROUPS = 8   # cap on dense count-matrix columns (memory)
SENT = np.int32(1 << 30)  # out-of-bounds gather index -> fill value
EXPAND_RB = 512        # output rows per expand-merge block
EXPAND_PACK = 1 << 20  # descriptor packing base (local_row*PACK + m_row)


class HubMeta(NamedTuple):
    """Static (hashable) descriptor of a hub layout — pytree aux data."""
    n_full_f: int        # full-layout fwd chunks (all hub edges)
    n_full_b: int        # full-layout bwd chunks
    n_part_f: int        # chunked-tier-only fwd chunks
    n_part_b: int        # chunked-tier-only bwd chunks
    n_win: int           # source windows
    n_groups: int        # total hub groups (dense + chunked)
    n_dense: int         # leading groups on the dense count-matrix tier
    tail_meta_dst: Tuple  # ELL bucket meta, reduce-by-dst (tail)
    tail_meta_src: Tuple  # ELL bucket meta, reduce-by-src (tail reverse)
    n_tail_rows: int     # nonzero rows in the tail ELL stack
    covered: int         # hub edges (dense + chunked tiers)
    # Single self-loop TAIL edges are extracted to node-level
    # "diagonal" arrays (add_self_loop graphs otherwise give EVERY node
    # a tail row — 169k rows at arxiv scale, +110ms on the attention
    # backward — for what is an elementwise O(N) term). Consumers add
    # the diagonal explicitly (engine_hub + ops/attention).
    has_diag: bool = False
    # True when the destination ids are already in merge order (tail
    # stack first, hub slots after — the layout :func:`hub_order`
    # relabels into): the inverse-permute expand collapses to a fused
    # concat+pad at the HBM store floor (round-4 forward lever; the
    # descriptor expand kernel ran at 2.4x the floor).
    identity_expand: bool = False


def hub_order(g) -> np.ndarray:
    """Hub-first node permutation: relabel destinations into merge
    order (hub slots first, then tail ELL stack rows, zero-degree rows
    last — the order the identity-expand consumers hard-code) so the
    hub engine's inverse-permute expand becomes the IDENTITY and
    collapses to a fused concat at the HBM store floor.

    Returns ``perm`` with ``perm[new_id] = old_id`` — feed it to
    :func:`dgl1_tpu.reorder_graph` with ``node_permute_algo='custom'``
    (same preprocessing contract as RCM for the block-dense engine).
    Requires the graph to carry a hub layout (``dgl.graph(...,
    hub=...)`` or default formats on a hub-concentrated graph)."""
    if g.hub_dst is None or g.hub_dst_meta is None:
        raise ValueError("hub_order needs a graph with a hub layout")
    t_inv = np.asarray(g.hub_dst["t_inv"]).astype(np.int64)
    m = g.hub_dst_meta
    k_slots = m.n_groups * BLK
    # HUBS FIRST (ids [0, k_slots)), tail stack rows after, zero-degree
    # last: the hub selection breaks degree ties by id (stable argsort),
    # so hubs must precede equal-degree tail rows or the re-build on the
    # relabeled graph would swap boundary rows and break the identity.
    is_hub_row = (t_inv >= m.n_tail_rows) & (t_inv < SENT)
    key = np.where(
        is_hub_row, t_inv - m.n_tail_rows,
        np.where(t_inv >= SENT, np.int64(1) << 40, k_slots + t_inv))
    return np.argsort(key, kind="stable")


def _pad_runs(order: np.ndarray, run_ids: np.ndarray,
              values: Tuple, chunk: int):
    """Sort ``values`` by ``order``, split at ``run_ids`` boundaries and pad
    every run to a multiple of ``chunk``."""
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
    if len(first):
        first[0] = 1
        first[1:] = (chunk_out[1:] != chunk_out[:-1]).astype(ID_DTYPE)
    return chunk_out, chunk_in, first


def _inflate_ell(meta, arrays, forced_meta):
    """Pad an ELL layout to a FORCED bucket structure (cross-part static
    geometry for the sharded hub path): for each forced bucket (k, N_k),
    the part's natural rows at rung k come first, then empty rows
    (idx = SENT -> OOB fill-0 gathers). ``inv_perm`` is remapped to the
    inflated row positions; rows past the natural stack (zero-degree
    sentinel) map to the inflated total."""
    forced_meta = tuple(forced_meta)
    if tuple(meta) == forced_meta:
        return tuple(meta), arrays
    nat = {int(k): int(n) for k, n in meta}
    # Validate containment: every natural bucket must appear in forced
    # with at least its row count.
    forced = {int(k): int(n) for k, n in forced_meta}
    for k, n in nat.items():
        if forced.get(k, 0) < n:
            raise ValueError(
                f"forced ELL meta {forced_meta} cannot hold natural "
                f"bucket ({k}, {n})")
    old_total = sum(n for _, n in meta)
    new_total = sum(n for _, n in forced_meta)
    idx_parts, eid_parts = [], []
    # Position remap: old stacked row -> new stacked row; per-bucket flat
    # slot offsets (buckets have different widths, so flat offsets are
    # cumulative n_l * k_l, not row_start * k).
    pos_map = np.full((old_total + 1,), new_total, dtype=np.int64)
    old_row_start, old_flat_start = {}, {}
    rs = fs = 0
    for k, n in meta:
        old_row_start[int(k)] = rs
        old_flat_start[int(k)] = fs
        rs += n
        fs += n * int(k)
    new_s = 0
    for k, n_forced in forced_meta:
        k = int(k)
        n_nat = nat.get(k, 0)
        if n_nat:
            ofs = old_flat_start[k]
            ors = old_row_start[k]
            idx_parts.append(arrays["idx"][ofs: ofs + n_nat * k])
            eid_parts.append(arrays["eid"][ofs: ofs + n_nat * k])
            pos_map[ors: ors + n_nat] = new_s + np.arange(n_nat)
        pad_rows = n_forced - n_nat
        if pad_rows:
            idx_parts.append(np.full((pad_rows * k,), SENT, ID_DTYPE))
            eid_parts.append(np.zeros((pad_rows * k,), ID_DTYPE))
        new_s += n_forced
    inv = arrays["inv_perm"].astype(np.int64)
    inv = np.minimum(inv, old_total)
    new_inv = pos_map[inv].astype(ID_DTYPE)
    out = dict(arrays)
    out["idx"] = (np.concatenate(idx_parts) if idx_parts
                  else np.zeros((0,), ID_DTYPE))
    out["eid"] = (np.concatenate(eid_parts) if eid_parts
                  else np.zeros((0,), ID_DTYPE))
    out["inv_perm"] = new_inv
    return forced_meta, out


def union_ell_meta(metas):
    """Smallest common forced bucket structure: per rung k, the max row
    count any part uses at exactly k (rows only ever pad wider, never
    move rungs, so containment holds per part)."""
    ks = sorted({int(k) for m in metas for k, _ in m})
    return tuple(
        (k, max((int(n) for m in metas for kk, n in m if int(kk) == k),
                default=0))
        for k in ks)


def ell_pos_map(meta_nat, meta_forced) -> np.ndarray:
    """Natural stacked-row -> forced (inflated) stacked-row position,
    the same per-rung containment rule :func:`_inflate_ell` applies:
    a part's natural rows at rung k land first in the forced rung-k
    block, padding rows after. Used by the identity-relabel planner
    (``parallel/hub_shard.plan_identity_order``) to assign local dst
    ids that match the forced stack positions exactly."""
    nat = {int(k): int(n) for k, n in meta_nat}
    old_total = sum(int(n) for _, n in meta_nat)
    pos_map = np.full((old_total,), -1, dtype=np.int64)
    old_start = {}
    rs = 0
    for k, n in meta_nat:
        old_start[int(k)] = rs
        rs += int(n)
    new_s = 0
    for k, n_forced in meta_forced:
        k = int(k)
        n_nat = nat.get(k, 0)
        if n_nat:
            ors = old_start[k]
            pos_map[ors: ors + n_nat] = new_s + np.arange(n_nat)
        new_s += int(n_forced)
    return pos_map


def _pad_chunk_layout(lay, target: int, bwd: bool, init_blocks: int = 0):
    """Pad a chunk layout to ``target`` chunks with no-op chunks (empty
    slots -> zero one-hots; first=0, out_id=0 -> accumulate zero into
    block 0). Output blocks no real chunk initializes hold garbage; the
    consumers never reference them (win_mask on the backward, per-part
    descriptors/t_inv on the forward) — EXCEPT the identity-expand
    sharded layout, whose fused-pad forward copies the whole hub block:
    with ``init_blocks=n`` the padded no-op chunks are re-aimed
    (first=1, out_id=missing block) so every output block in [0, n)
    gets initialized — an all-empty chunk writes exact zeros."""
    n = lay["in_id"].shape[0]
    if n > target:
        raise ValueError(f"chunk count {n} exceeds forced target {target}")
    if n == target and not init_blocks:
        return lay
    pad = target - n
    out = dict(lay)
    for k, fill in (("a", -1), ("b", -1), ("eid", 0)):
        out[k] = np.concatenate(
            [lay[k], np.full((pad * CHUNK,), fill, ID_DTYPE)])
    for k in ("in_id", "out_id", "first"):
        out[k] = np.concatenate([lay[k], np.zeros((pad,), ID_DTYPE)])
    if init_blocks:
        have = set(lay["out_id"][lay["first"] == 1].tolist())
        missing = [g for g in range(int(init_blocks)) if g not in have]
        if len(missing) > pad:
            raise ValueError(
                f"{len(missing)} uninitialized output blocks but only "
                f"{pad} padded chunks (raise the forced chunk target)")
        if missing:
            out["out_id"][n: n + len(missing)] = np.asarray(
                missing, ID_DTYPE)
            out["first"][n: n + len(missing)] = 1
    if bwd and "gperm" in lay:
        out["gperm"] = np.concatenate(
            [lay["gperm"], np.arange(n, target, dtype=ID_DTYPE)])
        out["gout"] = np.concatenate(
            [lay["gout"], np.zeros((pad,), ID_DTYPE)])
        out["gfirst"] = np.concatenate(
            [lay["gfirst"], np.zeros((pad,), ID_DTYPE)])
    return out


def _chunk_layouts(h_src, h_slot, h_eid, n_win: int, group_offset: int):
    """Build fwd (group-major) and bwd (window-major) chunk layouts for
    one edge subset. Output group ids are shifted by ``group_offset`` so
    the chunked tier writes a compact buffer of its own groups."""
    group = h_slot // BLK - group_offset
    window = h_src // BLK
    a_local = (h_src % BLK).astype(ID_DTYPE)
    b_local = (h_slot % BLK).astype(ID_DTYPE)

    f_order = np.lexsort((window, group))
    f_key = (group * n_win + window)[f_order]
    (fa, fb, fe), f_nchunks, f_starts = _pad_runs(
        f_order, f_key, ((a_local, -1), (b_local, -1), (h_eid, 0)), CHUNK
    )
    f_out, f_in, f_first = _chunk_descriptors(
        f_nchunks, f_starts, group, window, f_order
    )
    fwd = {"a": fa, "b": fb, "eid": fe, "in_id": f_in, "out_id": f_out,
           "first": f_first}

    # Backward: selector roles swap — ``a`` picks rows of the compacted
    # hub cotangent block (input), ``b`` scatters into the source window.
    b_order = np.lexsort((group, window))
    b_key = (window * (group.max(initial=0) + 1) + group)[b_order]
    (ba, bb, be), b_nchunks, b_starts = _pad_runs(
        b_order, b_key, ((b_local, -1), (a_local, -1), (h_eid, 0)), CHUNK
    )
    b_out, b_in, b_first = _chunk_descriptors(
        b_nchunks, b_starts, window, group, b_order
    )
    bwd = {"a": ba, "b": bb, "eid": be, "in_id": b_in, "out_id": b_out,
           "first": b_first}
    # Group-gather descriptors: the fused-attention backward emits one
    # group-side partial block per bwd chunk (window-major order, so a
    # group's chunks are NOT consecutive); these sort the chunk indices
    # by group so a single accumulation sweep folds the partials without
    # a second full chunk pass (ops/attention.py::_ger_reduce_call).
    gperm = np.argsort(b_in, kind="stable").astype(ID_DTYPE)
    gout = b_in[gperm].astype(ID_DTYPE)
    gfirst = np.zeros((len(gout),), dtype=ID_DTYPE)
    if len(gfirst):
        gfirst[0] = 1
        gfirst[1:] = (gout[1:] != gout[:-1]).astype(ID_DTYPE)
    bwd["gperm"], bwd["gout"], bwd["gfirst"] = gperm, gout, gfirst

    win_mask = np.zeros((n_win,), dtype=bool)
    win_mask[b_out] = True
    return fwd, bwd, win_mask, fe, fa


def build_hub_format(csc_indptr: np.ndarray, csc_src: np.ndarray,
                     csc_eid: np.ndarray, csc_dst: np.ndarray,
                     num_src: int, num_dst: int, num_edges: int,
                     num_padded: int, build_ell,
                     min_group_edges: Optional[int] = None,
                     dense_floor: Optional[int] = None,
                     force: Optional[dict] = None,
                     allow_empty: bool = False,
                     gb_always: bool = False,
                     identity_force: Optional[dict] = None):
    """Build the three-tier hub layout. Returns (HubMeta, arrays) or
    (None, None) when no hub group clears the density bar (the engine
    then declines and dispatch falls through to ELL).

    ``build_ell`` is ``graph._build_ell`` (injected to avoid a circular
    import); it is reused for the tail in both reduce directions.

    ``force`` pins the layout's STATIC geometry to cross-part union
    values so per-partition layouts stack on a leading mesh axis and
    trace to ONE shard_map program (the sharded hub path,
    ``parallel/hub_shard.py``): keys ``n_groups``/``n_dense`` (this
    part's own groups keep slots [0, own_nd*BLK) for the dense tier and
    shift to [n_dense*BLK, ...) for the chunked tier — a gap of empty
    SENT slots absorbs the difference), ``tail_meta_dst``/
    ``tail_meta_src`` (ELL buckets inflated via :func:`_inflate_ell`),
    ``n_full_f``/``n_full_b``/``n_part_f``/``n_part_b`` (chunk-count
    padding), ``t_pad``, ``x_desc_len``, ``gb_desc_len``,
    ``dense_dtype``, ``has_diag``, ``covered``. ``allow_empty`` builds
    an all-tail layout instead of returning None (parts of a sharded
    graph whose local degree distribution has no hub). ``gb_always``
    computes the fused-backward descriptors even without a dense tier
    (geometry measurement pass).
    """
    deg = np.diff(csc_indptr[: num_dst + 1]).astype(np.int64)
    n_win = -(-num_src // BLK)
    if min_group_edges is None:
        # A chunk (2 matmuls, ~CHUNK*BLK*F MACs each) beats the gather
        # rate down to ~25% slot occupancy; below n_win*CHUNK/4 edges a
        # group is mostly padding. Absolute floor keeps tiny graphs off.
        min_group_edges = max(4 * CHUNK, (n_win * CHUNK) // 4)
    if dense_floor is None:
        # MAC crossover chunked vs dense column: chunked pays ~2*BLK*F
        # MACs per slot, dense pays num_src*BLK*F per group regardless.
        dense_floor = max(num_src // 2, 4 * CHUNK)

    if identity_force is not None:
        # Typed-identity mode (PERF_NOTES r6): hub slots are PINNED to
        # ids [0, NG*BLK) and the dst tail stack (below, _build_tail)
        # to ids [NG*BLK, ...) in id order with the caller's
        # (superset-graph) bucket meta — every relation built this way
        # shares ONE merge-order numbering (= node order), so each
        # layout's identity-expand fused-pad forward holds where
        # per-relation degree-sorted selections structurally cannot
        # align. Slots this edge set does not touch read zeros (empty
        # C columns / SENT ELL rows).
        NG = int(identity_force["n_groups"])
        ND = int(identity_force["n_dense"])
        n_groups, n_dense = NG, ND
        own_ng, own_nd = NG, ND
        k_slots = NG * BLK
        rows_all = np.arange(min(k_slots, num_dst), dtype=np.int64)
        rows_d = rows_all[: ND * BLK]
        rows_c = rows_all[ND * BLK:]
    else:
        order_by_deg = np.argsort(-deg, kind="stable")
        group_edge_counts = []
        n_groups = 0
        while n_groups < MAX_GROUPS:
            rows = order_by_deg[n_groups * BLK: (n_groups + 1) * BLK]
            if rows.size == 0:
                break
            group_edges = int(deg[rows].sum())
            if group_edges < min_group_edges:
                break
            group_edge_counts.append(group_edges)
            n_groups += 1
        if n_groups == 0 and not (allow_empty or force is not None):
            return None, None
        n_dense = 0
        while (n_dense < min(n_groups, MAX_DENSE_GROUPS)
               and group_edge_counts[n_dense] >= dense_floor):
            n_dense += 1

        # Effective (static) group geometry: this part's own counts, or
        # the forced cross-part union. Own dense groups keep slots
        # [0, own_nd*BLK); own chunked groups shift up to start at
        # ND*BLK — the gap in between is empty SENT slots (no rows, no
        # edges).
        own_nd, own_ng = n_dense, n_groups
        if force is not None:
            NG, ND = int(force["n_groups"]), int(force["n_dense"])
            if own_nd > ND or own_ng - own_nd > NG - ND:
                raise ValueError(
                    "forced group geometry smaller than natural")
        else:
            NG, ND = own_ng, own_nd
        n_groups, n_dense = NG, ND

        k_slots = NG * BLK
        rows_all = order_by_deg[: own_ng * BLK]
        rows_d = rows_all[: own_nd * BLK]
        rows_c = rows_all[own_nd * BLK:]
    hub_ids = np.full((k_slots,), SENT, dtype=ID_DTYPE)
    hub_ids[: rows_d.size] = rows_d
    hub_ids[ND * BLK: ND * BLK + rows_c.size] = rows_c
    slot_of_row = np.full((num_dst,), SENT, dtype=ID_DTYPE)
    slot_of_row[rows_d] = np.arange(rows_d.size, dtype=ID_DTYPE)
    slot_of_row[rows_c] = ND * BLK + np.arange(rows_c.size,
                                               dtype=ID_DTYPE)

    # ------------------------------------------------------------------
    # Split edges: hub set (dense/chunked) vs tail (ELL). csc arrays are
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

    # Full layouts over all hub edges (weighted u_mul_e path + grad_e).
    full_fwd, full_bwd, win_mask_full, full_fe, full_fa = _chunk_layouts(
        h_src, h_slot, h_eid, n_win, group_offset=0
    )
    # Chunked-tier-only layouts (unweighted path: dense groups go via C).
    in_part = h_slot >= n_dense * BLK
    part_fwd, part_bwd, win_mask_part, _, _ = _chunk_layouts(
        h_src[in_part], h_slot[in_part], h_eid[in_part], n_win,
        group_offset=n_dense,
    )
    if force is not None:
        init = bool(force.get("init_fwd_blocks", False))
        full_fwd = _pad_chunk_layout(full_fwd, force["n_full_f"], False,
                                     init_blocks=NG if init else 0)
        full_bwd = _pad_chunk_layout(full_bwd, force["n_full_b"], True)
        part_fwd = _pad_chunk_layout(part_fwd, force["n_part_f"], False,
                                     init_blocks=(NG - ND) if init else 0)
        part_bwd = _pad_chunk_layout(part_bwd, force["n_part_b"], True)

    # Dense tier count matrix: C[s, k] = multiplicity of edge s -> hub_k.
    # Rows padded to DENSE_RB so the Pallas reduce kernel streams whole
    # blocks (padding rows are zero and contribute nothing).
    kd = n_dense * BLK
    n_src_pad = -(-max(num_src, 1) // DENSE_RB) * DENSE_RB
    if kd:
        in_dense = ~in_part
        flat = h_src[in_dense] * kd + h_slot[in_dense]
        dense_c = np.zeros((n_src_pad, kd), dtype=np.float32)
        dense_c[:num_src] = np.bincount(
            flat, minlength=num_src * kd
        ).astype(np.float32).reshape(num_src, kd)
        # Counts are tiny integers (edge multiplicities): store int8 to
        # QUARTER the dominant HBM stream of the dense-tier matmul
        # (exact for multiplicities <= 127; the kernel casts per block
        # in VMEM and accumulates in f32 — verified on v5e 2026-08-21).
        # bf16 covers the 128..256 range; f32 beyond.
        if force is not None and "dense_dtype" in force:
            dense_c = dense_c.astype(force["dense_dtype"])
        else:
            cmax = dense_c.max(initial=0.0)
            if cmax <= 127:
                dense_c = dense_c.astype(np.int8)
            elif cmax <= 256:
                import ml_dtypes

                dense_c = dense_c.astype(ml_dtypes.bfloat16)
    else:
        dt0 = (force.get("dense_dtype", np.float32)
               if force is not None else np.float32)
        dense_c = np.zeros((n_src_pad, 0), dtype=dt0)

    # Edge-id -> full-layout fwd slot (for grad_e extraction).
    edge_to_fslot = np.full((num_padded,), SENT, dtype=ID_DTYPE)
    real = full_fa >= 0
    edge_to_fslot[full_fe[real]] = np.flatnonzero(real).astype(ID_DTYPE)

    # ------------------------------------------------------------------
    # Tail: rebuild CSC/CSR restricted to non-hub-destination edges, then
    # reuse the ELL builder in both directions.
    # ------------------------------------------------------------------

    def _build_tail(t_dst, t_src, t_eid):
        """One tail variant: dst/src ELL stacks, merge permutation and
        compact-slot arrays for an edge subset (dst-sorted)."""
        n_tail = int(t_dst.shape[0])
        # Coarser bucket coalescing for the (small) tail: each extra
        # bucket costs a fixed ~0.2ms per gather op on TPU, which
        # dominates the padding cost at tail sizes.
        tail_min_slots = min(1 << 14, max(n_tail // 2, 1))
        t_counts = np.bincount(t_dst, minlength=num_dst) if n_tail else \
            np.zeros((num_dst,), np.int64)
        t_indptr = np.zeros((num_dst + 1,), dtype=np.int64)
        np.cumsum(t_counts, out=t_indptr[1:])
        if identity_force is not None:
            # Rows pinned to id order with the superset graph's bucket
            # meta (typed identity — see the selection block above).
            from dgl1_tpu.graph import _build_ell_fixed_rows

            meta_fx = identity_force["tail_meta_dst"]
            n_fx = int(sum(nb for _, nb in meta_fx))
            if n_tail and int(t_dst.max(initial=0)) >= k_slots + n_fx:
                raise ValueError(
                    "identity_force: tail edge to a row outside the "
                    "superset tail range (meta not from a superset "
                    "graph?)")
            tail_meta_dst, tail_dst_ell = _build_ell_fixed_rows(
                t_indptr, t_src, t_eid, meta_fx, k_slots, num_dst)
        else:
            tail_meta_dst, tail_dst_ell = build_ell(
                t_indptr, t_src, t_eid, num_dst, n_tail,
                min_slots=tail_min_slots)

        r_order = np.argsort(t_src, kind="stable")
        r_counts = np.bincount(t_src, minlength=num_src) if n_tail else \
            np.zeros((num_src,), np.int64)
        r_indptr = np.zeros((num_src + 1,), dtype=np.int64)
        np.cumsum(r_counts, out=r_indptr[1:])
        tail_meta_src, tail_src_ell = build_ell(
            r_indptr, t_dst[r_order], t_eid[r_order], num_src, n_tail,
            min_slots=tail_min_slots,
        )
        if force is not None:
            if identity_force is None:
                # Pinned dst stacks (identity_force) are already
                # uniform across parts — inflating would break the
                # id-order positions.
                tail_meta_dst, tail_dst_ell = _inflate_ell(
                    tail_meta_dst, tail_dst_ell, force["tail_meta_dst"])
            tail_meta_src, tail_src_ell = _inflate_ell(
                tail_meta_src, tail_src_ell, force["tail_meta_src"])

        # Merge permutation: non-hub rows read the tail ELL stack; hub
        # rows read the dense/chunked result appended right after it;
        # empty rows read OOB (fill 0). The default tail inv_perm sends
        # zero-degree rows to len(nz), which is in-bounds once the hub
        # block is concatenated — remap those to the OOB sentinel first.
        n_tail_rows = int(sum(n for _, n in tail_meta_dst))
        t_inv = tail_dst_ell["inv_perm"].astype(np.int64)
        t_inv = np.where(t_inv >= n_tail_rows, np.int64(SENT), t_inv)
        hub_mask_rows = slot_of_row != SENT
        t_inv[hub_mask_rows] = n_tail_rows + slot_of_row[hub_mask_rows]
        t_inv = t_inv.astype(ID_DTYPE)

        # Compact tail edge endpoints (for grad_e without full-E gathers).
        t_pad = max(-(-max(n_tail, 1) // CHUNK) * CHUNK, CHUNK)
        if force is not None:
            if force["t_pad"] < t_pad:
                raise ValueError("forced t_pad smaller than natural")
            t_pad = force["t_pad"]
        tail_src_c = np.full((t_pad,), SENT, dtype=ID_DTYPE)
        tail_dst_c = np.full((t_pad,), SENT, dtype=ID_DTYPE)
        tail_src_c[:n_tail] = t_src
        tail_dst_c[:n_tail] = t_dst
        # Original edge id per compact tail slot (attention-dropout mask
        # keying: fwd and bwd must regenerate identical per-edge masks,
        # and the original eid is the only identity stable across
        # layouts).
        tail_eid_c = np.zeros((t_pad,), dtype=ID_DTYPE)
        tail_eid_c[:n_tail] = t_eid
        edge_to_tslot = np.full((num_padded,), SENT, dtype=ID_DTYPE)
        edge_to_tslot[t_eid] = np.arange(n_tail, dtype=ID_DTYPE)

        # Tail ELL eids remapped to compact tail slots, so per-tail-edge
        # values (attention numerators, jacobian terms) computed in
        # compact (T_pad, H) space feed the ELL stacks directly
        # (ops/attention.py).
        def to_compact(eids):
            c = edge_to_tslot[np.clip(eids, 0, num_padded - 1)]
            return np.where(c == SENT, 0, c).astype(ID_DTYPE)

        return dict(
            meta_dst=tuple(tail_meta_dst), meta_src=tuple(tail_meta_src),
            n_rows=n_tail_rows,
            t_idx=tail_dst_ell["idx"], t_eid=tail_dst_ell["eid"],
            t_eid_c=to_compact(tail_dst_ell["eid"]),
            t_inv=t_inv,
            r_idx=tail_src_ell["idx"], r_eid=tail_src_ell["eid"],
            r_eid_c=to_compact(tail_src_ell["eid"]),
            r_inv=tail_src_ell["inv_perm"],
            tail_src=tail_src_c, tail_dst=tail_dst_c, tail_eid=tail_eid_c,
            edge_to_tslot=edge_to_tslot,
        )

    t_dst = dst_e[~is_hub]
    t_src = src_e[~is_hub]
    t_eid = eid_e[~is_hub]

    # Extract single self-loop TAIL edges to a node-level diagonal
    # (add_self_loop graphs give every node a tail row otherwise — the
    # term is elementwise O(N), not a sparse op). Nodes with multiple
    # self-loops keep them in the tail (exact multigraph semantics).
    is_diag = t_src == t_dst
    dcnt = np.bincount(t_dst[is_diag], minlength=num_dst) if len(t_dst) \
        else np.zeros((num_dst,), np.int64)
    take = is_diag & (dcnt[t_dst] == 1)
    has_diag = bool(take.any())
    diag = np.zeros((num_dst,), np.float32)
    diag_eid = np.zeros((num_dst,), ID_DTYPE)
    diag_edge_dst = np.full((num_padded,), SENT, dtype=ID_DTYPE)
    if has_diag:
        diag[t_dst[take]] = 1.0
        diag_eid[t_dst[take]] = t_eid[take]
        diag_edge_dst[t_eid[take]] = t_dst[take].astype(ID_DTYPE)
        keep = ~take
        t_dst, t_src, t_eid = t_dst[keep], t_src[keep], t_eid[keep]
    full_tail = _build_tail(t_dst, t_src, t_eid)
    tail_meta_dst = list(full_tail["meta_dst"])
    tail_meta_src = list(full_tail["meta_src"])
    n_tail_rows = full_tail["n_rows"]

    # ------------------------------------------------------------------
    # Expand-merge descriptors: the final inverse-permute (out[v] =
    # merged[t_inv[v]]) is an XLA gather that runs ~2.5x off the HBM
    # write floor and cannot fuse into the Pallas tail. When the merged
    # block is small enough to sit whole in VMEM (hub-concentrated
    # graphs), ops/engine_hub.py::_expand_call replaces it with a
    # descriptor-driven Pallas pass: per output row-block, copy the few
    # real rows out of VMEM-resident `merged`, write zeros elsewhere —
    # pure sequential HBM writes. Descriptor: packed (local_row << 20 |
    # merged_row) sorted by destination, plus per-block start offsets.
    # ------------------------------------------------------------------
    n_merge_rows = n_tail_rows + k_slots
    if n_merge_rows < EXPAND_PACK:
        ft_inv = full_tail["t_inv"]
        valid = np.flatnonzero(ft_inv != SENT).astype(np.int64)
        m_of_valid = ft_inv[valid].astype(np.int64)
        x_blocks = -(-num_dst // EXPAND_RB)
        x_starts = np.zeros((x_blocks + 1,), dtype=ID_DTYPE)
        np.cumsum(np.bincount((valid // EXPAND_RB).astype(np.int64),
                              minlength=x_blocks), out=x_starts[1:])
        x_desc = ((valid % EXPAND_RB) * EXPAND_PACK
                  + m_of_valid).astype(ID_DTYPE)
        # SMEM-friendly padding (1-D int32 operands get T(1024) layout).
        x_desc = np.pad(x_desc, (0, -len(x_desc) % CHUNK))
        x_starts_p = np.pad(x_starts, (0, -len(x_starts) % CHUNK))
    else:  # packing would overflow; engine falls back to jnp.take
        x_desc = np.zeros((0,), dtype=ID_DTYPE)
        x_starts_p = np.zeros((0,), dtype=ID_DTYPE)
    if force is not None and n_merge_rows < EXPAND_PACK:
        if force["x_desc_len"] < len(x_desc):
            raise ValueError("forced x_desc_len smaller than natural")
        # Entries past the final x_starts value are never read.
        x_desc = np.pad(x_desc, (0, force["x_desc_len"] - len(x_desc)))

    # ------------------------------------------------------------------
    # Fused-backward descriptors (src direction): grad_u's dense-tier
    # kernel can fold the compact tail-src stack rows into its own output
    # pass (out_block = C_block @ ct, then += tail rows via descriptors)
    # — killing the full-size (N, F) tail materialization + add that
    # otherwise dominate the backward (profiled 2026-08-21,
    # tools/profile_hub_bwd.py). Packed p = (src_row % DENSE_RB) *
    # EXPAND_PACK + stacked_row, sorted by src row; per-DENSE_RB-block
    # start offsets. Only valid when the stack index fits the packing.
    # ------------------------------------------------------------------
    n_src_rows_tail = int(sum(n for _, n in tail_meta_src))
    if 0 < n_src_rows_tail < EXPAND_PACK and (kd or gb_always):
        rv = full_tail["r_inv"].astype(np.int64)[:num_src]
        gvalid = np.flatnonzero(rv < n_src_rows_tail)
        gm = rv[gvalid]
        g_blocks = n_src_pad // DENSE_RB
        gb_starts = np.zeros((g_blocks + 1,), dtype=ID_DTYPE)
        np.cumsum(np.bincount((gvalid // DENSE_RB).astype(np.int64),
                              minlength=g_blocks), out=gb_starts[1:])
        gb_desc = ((gvalid % DENSE_RB) * EXPAND_PACK + gm).astype(ID_DTYPE)
        gb_desc = np.pad(gb_desc, (0, -len(gb_desc) % CHUNK))
        gb_starts = np.pad(gb_starts, (0, -len(gb_starts) % CHUNK))
    else:
        gb_desc = np.zeros((0,), dtype=ID_DTYPE)
        gb_starts = np.zeros((0,), dtype=ID_DTYPE)
    if force is not None and len(gb_starts):
        if force["gb_desc_len"] < len(gb_desc):
            raise ValueError("forced gb_desc_len smaller than natural")
        gb_desc = np.pad(gb_desc, (0, force["gb_desc_len"] - len(gb_desc)))

    if force is not None:
        has_diag = bool(force.get("has_diag", has_diag))
    # Identity-expand detection (hub-first relabel, :func:`hub_order`):
    # destinations [0, k_slots) are exactly the hub slots in order and
    # [k_slots, k_slots + n_tail_rows) the tail stack in order; the
    # expand then degenerates to concat([hub_block, stacked], zeros).
    ft_inv = full_tail["t_inv"].astype(np.int64)
    n_merge = n_tail_rows + k_slots
    identity_expand = bool(
        n_merge <= num_dst
        and np.array_equal(
            ft_inv[:k_slots],
            n_tail_rows + np.arange(k_slots, dtype=np.int64))
        and np.array_equal(
            ft_inv[k_slots:n_merge],
            np.arange(n_tail_rows, dtype=np.int64))
        and (ft_inv[n_merge:] == SENT).all()
    )
    if force is not None:
        # Static meta must be uniform across sharded parts; the sharded
        # build does not relabel, so pin it to the forced value.
        identity_expand = bool(force.get("identity_expand", False))
    meta = HubMeta(
        n_full_f=len(full_fwd["in_id"]),
        n_full_b=len(full_bwd["in_id"]),
        n_part_f=len(part_fwd["in_id"]),
        n_part_b=len(part_bwd["in_id"]),
        n_win=int(n_win),
        n_groups=int(n_groups),
        n_dense=int(n_dense),
        tail_meta_dst=tuple(tail_meta_dst),
        tail_meta_src=tuple(tail_meta_src),
        n_tail_rows=n_tail_rows,
        covered=int(force["covered"]) if force is not None
        else int(is_hub.sum()),
        has_diag=has_diag,
        identity_expand=identity_expand,
    )
    arrays = {
        "full_fwd": full_fwd,
        "full_bwd": full_bwd,
        "part_fwd": part_fwd,
        "part_bwd": part_bwd,
        "dense_c": dense_c,
        "hub_ids": hub_ids,
        "win_mask_full": win_mask_full,
        "win_mask_part": win_mask_part,
        "t_idx": full_tail["t_idx"], "t_eid": full_tail["t_eid"],
        "t_eid_c": full_tail["t_eid_c"],
        "t_inv": full_tail["t_inv"],
        "r_idx": full_tail["r_idx"], "r_eid": full_tail["r_eid"],
        "r_eid_c": full_tail["r_eid_c"],
        "r_inv": full_tail["r_inv"],
        "tail_src": full_tail["tail_src"], "tail_dst": full_tail["tail_dst"],
        "tail_eid": full_tail["tail_eid"],
        "edge_to_fslot": edge_to_fslot,
        "edge_to_tslot": full_tail["edge_to_tslot"],
        "diag": diag, "diag_eid": diag_eid,
        "diag_edge_dst": diag_edge_dst,
        "x_desc": x_desc, "x_starts": x_starts_p,
        "gb_desc": gb_desc, "gb_starts": gb_starts,
    }
    return meta, arrays
