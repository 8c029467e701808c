"""Heterograph partitioning + sharded typed (R-GCN-style) training.

TPU-native counterpart of the reference's heterograph partitioner and
DistDGL typed training (anchors: ``src/graph/transform/partition_hetero.cc
:: PartitionWithHalo``, ``python/dgl/distributed/partition.py`` — the
reference homogenizes the heterograph, runs METIS, and splits the
assignment back per node type; DistDGL then trains R-GCN across machines
with KVStore feature pulls).

Here the same shape becomes collective-based and static: every node type
gets its OWN halo plan (per-ntype ``all_to_all`` send blocks, since node
types carry different feature widths), every relation's edges live on the
destination's part (aggregation is purely local), and one compiled
``shard_map`` program runs the typed layer — per-relation projection of
the combined [owned + halo] source table, gather, segment-reduce into
owned destination rows, summed over relations per destination type. The
per-ntype exchanges are independent ``all_to_all`` ops that XLA can
overlap with the per-relation local compute.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from dgl1_tpu.graph import graph as make_graph
from dgl1_tpu.heterograph import HeteroGraph

__all__ = [
    "hetero_partition_assignment",
    "hetero_edge_cut_fraction",
    "PartitionedHeteroGraph",
    "build_partitioned_hetero",
    "sharded_typed_gspmm",
    "make_sharded_rgcn_layer",
    "partition_hetero_graph",
    "load_hetero_partition",
]

CanonicalEtype = Tuple[str, str, str]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ntype_offsets(hg: HeteroGraph):
    offsets, total = {}, 0
    for nt in hg.ntypes:
        offsets[nt] = total
        total += hg.num_nodes(nt)
    return offsets, total


def homogenize_structure(hg: HeteroGraph):
    """Flatten a heterograph into one node space (per-ntype offset blocks)
    — the same move the reference makes before METIS
    (``partition_hetero.cc``). Returns (src, dst, offsets, total_nodes)
    with edges of every relation concatenated in canonical-etype order."""
    offsets, total = _ntype_offsets(hg)
    srcs, dsts = [], []
    for c in hg.canonical_etypes:
        st, _, dt = c
        rel = hg[c]
        e = rel.num_edges()
        srcs.append(np.asarray(rel.src)[:e].astype(np.int64) + offsets[st])
        dsts.append(np.asarray(rel.dst)[:e].astype(np.int64) + offsets[dt])
    src = (np.concatenate(srcs) if srcs else np.zeros(0, np.int64))
    dst = (np.concatenate(dsts) if dsts else np.zeros(0, np.int64))
    return src, dst, offsets, total


def hetero_partition_assignment(
    hg: HeteroGraph, k: int, part_method: str = "metis",
    balance_edges: bool = True, seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Per-ntype partition assignment ``{ntype: int32[num_nodes(ntype)]}``.

    Homogenize -> partition (LDG-greedy / multilevel-HEM best-of-both,
    the METIS replacement) -> split the assignment back per node type, so
    cross-type communities land on one part — the reference's exact
    pipeline with the from-scratch partitioners standing in for METIS.
    """
    from dgl1_tpu.parallel.partition import (
        greedy_partition_assignment,
        metis_partition_assignment,
        multilevel_partition_assignment,
        random_partition_assignment,
    )

    src, dst, offsets, total = homogenize_structure(hg)
    homo = make_graph((src, dst), num_nodes=total, formats=())
    fns = {
        "metis": metis_partition_assignment,
        "greedy": greedy_partition_assignment,
        "multilevel": multilevel_partition_assignment,
    }
    if part_method == "random":
        part = random_partition_assignment(homo, k, seed=seed)
    else:
        part = fns[part_method](homo, k, seed=seed,
                                balance_edges=balance_edges)
    return {
        nt: part[offsets[nt]: offsets[nt] + hg.num_nodes(nt)].astype(
            np.int32)
        for nt in hg.ntypes
    }


def hetero_edge_cut_fraction(hg: HeteroGraph,
                             part: Dict[str, np.ndarray]) -> float:
    cut = tot = 0
    for c in hg.canonical_etypes:
        st, _, dt = c
        rel = hg[c]
        e = rel.num_edges()
        s = np.asarray(rel.src)[:e]
        d = np.asarray(rel.dst)[:e]
        cut += int(np.sum(part[st][s] != part[dt][d]))
        tot += e
    return cut / max(tot, 1)


# ----------------------------------------------------------------------
# Device-resident partitioned heterograph
# ----------------------------------------------------------------------

class PartitionedHeteroGraph:
    """Static halo-plan structure for one mesh axis, typed.

    Dict-of-arrays fields, every array with leading axis P:

    per ntype ``nt``:
      send_idx[nt]   (P, P, m_halo[nt]) int32 — [p][q] = local ids p
                     sends to q (q's halo block from p)
      node_mask[nt]  (P, n_loc[nt]) bool — real owned node
      orig_ids[nt]   (P, n_loc[nt]) int32 — global (per-ntype) id
      in_deg[nt]     (P, n_loc[nt]) float32 — total in-degree over ALL
                     relations into nt (for 'right' norm)
    per canonical etype ``c = (st, et, dt)``:
      esrc[c]  (P, e_loc[c]) int32 — combined srctype index: owned
               [0, n_loc[st]) then halo slot n_loc[st] + q*m_halo[st] + j
      edst[c]  (P, e_loc[c]) int32 — local dst id; sentinel n_loc[dt]
               marks padded edge slots
      tiles_fwd[c]/tiles_rev[c] — optional Pallas tile descriptors for
               the scatter-free local reduce (as PartitionedGraph's)

    Static fields: num_parts, n_loc {nt}, m_halo {nt}, e_loc {c},
    num_nodes {nt}, ntypes, etypes.
    """

    def __init__(self, *, send_idx, node_mask, orig_ids, in_deg, esrc,
                 edst, tiles_fwd, tiles_rev, num_parts, n_loc, m_halo,
                 e_loc, num_nodes, ntypes, etypes, hub=None,
                 hub_meta=None, hub_rows=None):
        self.send_idx = send_idx
        self.node_mask = node_mask
        self.orig_ids = orig_ids
        self.in_deg = in_deg
        self.esrc = esrc
        self.edst = edst
        self.tiles_fwd = tiles_fwd
        self.tiles_rev = tiles_rev
        # Per-relation hub-dense layouts (cross-part unified geometry,
        # parallel/hub_shard.py) — the flagship MXU local reduce inside
        # the typed sharded path; None per relation = tile/segment
        # fallback.
        self.hub = hub
        self.hub_meta = hub_meta
        self.hub_rows = dict(hub_rows) if hub_rows else None
        self.num_parts = int(num_parts)
        self.n_loc = dict(n_loc)
        self.m_halo = dict(m_halo)
        self.e_loc = dict(e_loc)
        self.num_nodes = dict(num_nodes)
        self.ntypes = tuple(ntypes)
        self.etypes = tuple(etypes)

    # -- pytree ---------------------------------------------------------
    def tree_flatten(self):
        nts, ets = self.ntypes, self.etypes
        children = (
            [self.send_idx[nt] for nt in nts],
            [self.node_mask[nt] for nt in nts],
            [self.orig_ids[nt] for nt in nts],
            [self.in_deg[nt] for nt in nts],
            [self.esrc[c] for c in ets],
            [self.edst[c] for c in ets],
            ([self.tiles_fwd[c] for c in ets]
             if self.tiles_fwd is not None else None),
            ([self.tiles_rev[c] for c in ets]
             if self.tiles_rev is not None else None),
            ([self.hub[c] for c in ets]
             if self.hub is not None else None),
        )
        aux = (self.num_parts,
               tuple(self.n_loc[nt] for nt in nts),
               tuple(self.m_halo[nt] for nt in nts),
               tuple(self.e_loc[c] for c in ets),
               tuple(self.num_nodes[nt] for nt in nts),
               nts, ets,
               (tuple(self.hub_meta[c] for c in ets)
                if self.hub_meta is not None else None),
               (tuple(self.hub_rows[c] for c in ets)
                if self.hub_rows is not None else None))
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (num_parts, n_loc_t, m_halo_t, e_loc_t, num_nodes_t, nts,
         ets, hub_meta_t, hub_rows_t) = aux
        (send_idx, node_mask, orig_ids, in_deg, esrc, edst, tfwd,
         trev, hub_t) = children
        return cls(
            send_idx=dict(zip(nts, send_idx)),
            node_mask=dict(zip(nts, node_mask)),
            orig_ids=dict(zip(nts, orig_ids)),
            in_deg=dict(zip(nts, in_deg)),
            esrc=dict(zip(ets, esrc)),
            edst=dict(zip(ets, edst)),
            tiles_fwd=(None if tfwd is None else dict(zip(ets, tfwd))),
            tiles_rev=(None if trev is None else dict(zip(ets, trev))),
            hub=(None if hub_t is None else dict(zip(ets, hub_t))),
            hub_meta=(None if hub_meta_t is None
                      else dict(zip(ets, hub_meta_t))),
            hub_rows=(None if hub_rows_t is None
                      else dict(zip(ets, hub_rows_t))),
            num_parts=num_parts,
            n_loc=dict(zip(nts, n_loc_t)),
            m_halo=dict(zip(nts, m_halo_t)),
            e_loc=dict(zip(ets, e_loc_t)),
            num_nodes=dict(zip(nts, num_nodes_t)),
            ntypes=nts, etypes=ets,
        )

    # -- data movement --------------------------------------------------
    def shard_node_data(self, ntype: str, data) -> jnp.ndarray:
        """(N_nt, *f) global per-ntype data -> (P, n_loc[nt], *f)."""
        data = jnp.asarray(data)
        idx = self.orig_ids[ntype].reshape(-1)
        out = jnp.take(data, idx, axis=0, mode="clip")
        if jnp.issubdtype(out.dtype, jnp.floating):
            mask = self.node_mask[ntype].reshape(
                (-1,) + (1,) * (data.ndim - 1))
            out = out * mask.astype(out.dtype)
        return out.reshape((self.num_parts, self.n_loc[ntype])
                           + data.shape[1:])

    def unshard_node_data(self, ntype: str, data) -> jnp.ndarray:
        """(P, n_loc[nt], *f) -> (N_nt, *f)."""
        flat = data.reshape((-1,) + data.shape[2:])
        ids = self.orig_ids[ntype].reshape(-1)
        mask = self.node_mask[ntype].reshape(-1)
        n = self.num_nodes[ntype]
        out = jnp.zeros((n,) + data.shape[2:], dtype=data.dtype)
        safe_ids = jnp.where(mask, ids, n)
        return out.at[safe_ids].set(flat, mode="drop")


jax.tree_util.register_pytree_node(
    PartitionedHeteroGraph,
    PartitionedHeteroGraph.tree_flatten,
    PartitionedHeteroGraph.tree_unflatten,
)


def _pinned_typed_geometry(hub_edges_all, etypes, dt, n_loc_dt,
                           num_parts, max_buckets: int = 4,
                           min_group_edges=None, dense_floor=None):
    """Pinned hub/tail geometry for the typed identity sharded path:
    ONE (NG, ND, tail bucket meta) shared by every relation with dst
    ntype ``dt`` AND every part. Requires the partition books to order
    local ids hub-first by total in-degree (``hub_identity=True``) —
    hub slots are then local ids [0, NG*128) and the tail stack local
    ids [NG*128, NG*128 + n_tail) in id order; per-position bucket
    widths come from the MAX over (relation, part) degree. Returns
    None when no part clears a hub group (callers keep the descriptor
    expand)."""
    from dgl1_tpu.graph import _ladder_rung
    from dgl1_tpu.hub_format import BLK, CHUNK, MAX_DENSE_GROUPS, \
        MAX_GROUPS

    rels = [c for c in etypes if c[2] == dt and c in hub_edges_all]
    if not rels:
        return None
    # Per-part totals + per-(relation, part) counts in local dst space.
    tot = np.zeros((num_parts, n_loc_dt), np.int64)
    per_rel = []
    for c in rels:
        lists, _ = hub_edges_all[c]
        cnts = np.zeros((num_parts, n_loc_dt), np.int64)
        for p, (_, ldst) in enumerate(lists):
            if len(ldst):
                cnts[p] = np.bincount(np.asarray(ldst, np.int64),
                                      minlength=n_loc_dt)
        per_rel.append(cnts)
        tot += cnts
    floor = (int(min_group_edges) if min_group_edges is not None
             else max(4 * CHUNK, 1))
    if dense_floor is None:
        dense_floor = max(n_loc_dt // 2, 4 * CHUNK)
    dense_floor = int(dense_floor)
    nd_u = nc_u = 0
    for p in range(num_parts):
        deg = tot[p]
        order = np.argsort(-deg, kind="stable")
        ng = 0
        gcounts = []
        while ng < MAX_GROUPS:
            rows = order[ng * BLK: (ng + 1) * BLK]
            if rows.size == 0:
                break
            ge = int(deg[rows].sum())
            if ge < floor:
                break
            gcounts.append(ge)
            ng += 1
        nd = 0
        while nd < min(ng, MAX_DENSE_GROUPS) and gcounts[nd] >= dense_floor:
            nd += 1
        nd_u = max(nd_u, nd)
        nc_u = max(nc_u, ng - nd)
    ng_u = nd_u + nc_u
    if ng_u == 0:
        return None
    k_slots = ng_u * BLK
    # Tail rows: the books order local ids by descending total degree,
    # so each part's nonzero-degree rows are a prefix.
    nnz = (tot > 0).sum(axis=1)
    n_tail = int(max(int(nnz.max(initial=0)) - k_slots, 0))
    if n_tail == 0:
        return {"n_groups": ng_u, "n_dense": nd_u, "tail_meta_dst": ()}
    caps = np.zeros((n_tail,), np.int64)
    for cnts in per_rel:
        seg = cnts[:, k_slots: k_slots + n_tail]
        np.maximum(caps, seg.max(axis=0), out=caps)
    rungs = np.array([_ladder_rung(int(x)) if x else 1 for x in caps],
                     np.int64)
    # Run-length buckets over the rungs, merged (min added slots) down
    # to <= max_buckets.
    segs = []
    for r in rungs:
        if segs and segs[-1][0] == r:
            segs[-1][1] += 1
        else:
            segs.append([int(r), 1])
    segs = [(w, nb) for w, nb in segs]
    while len(segs) > max_buckets:
        costs = [max(segs[i][0], segs[i + 1][0])
                 * (segs[i][1] + segs[i + 1][1])
                 - segs[i][0] * segs[i][1] - segs[i + 1][0] * segs[i + 1][1]
                 for i in range(len(segs) - 1)]
        i = int(np.argmin(costs))
        segs[i: i + 2] = [(max(segs[i][0], segs[i + 1][0]),
                           segs[i][1] + segs[i + 1][1])]
    # Cost guard (measured, PERF_NOTES r6): the pinned shared meta makes
    # EVERY relation gather the UNION tail — on long-tail graphs that
    # volume exceeds what killing the expand saves (typed sharded bench
    # shape: 9.6 -> 47.7 ms/iter, a 5x regression), while hub-dominated
    # graphs (tail slots << n_loc) win. Gate on tail slot volume vs the
    # expand write volume the identity removes (~1.4 x n_loc).
    slots = sum(w * nb for w, nb in segs)
    if slots > n_loc_dt // 2:
        return None
    return {"n_groups": ng_u, "n_dense": nd_u,
            "tail_meta_dst": tuple(segs)}


def build_partitioned_hetero(
    hg: HeteroGraph,
    part: Dict[str, np.ndarray],
    num_parts: int,
    pad_nodes_multiple: int = 8,
    pad_edges_multiple: int = 128,
    pad_halo_multiple: int = 8,
    tiles: bool = False,
    hub=False,
    hub_dense_floor: Optional[int] = None,
    hub_identity: bool = False,
) -> PartitionedHeteroGraph:
    """Build the typed halo plan from a per-ntype assignment.

    ``hub_identity=True`` (with ``hub=...``): the identity-rate TYPED
    sharded path (PERF_NOTES r6). Each ntype's per-part LOCAL ids are
    ordered hub-first by total in-degree (the partition book's
    ``order_key``), and every relation's per-part hub layout is built
    with geometry PINNED to that shared numbering (hub slots = local
    ids [0, NG*128), tail stack rows in id order with one bucket meta
    across relations AND parts) — so every relation's local reduce
    claims ``identity_expand`` and the fused-pad forward replaces the
    descriptor expand. Phantom slots/rows absorb each (relation,
    part)'s gaps. Falls back silently (identity stays False) if the
    post-build predicate fails.

    Every relation's edges are owned by the destination's part (the
    reference's ``PartitionWithHalo`` placement): aggregation is local,
    and each source type's remote rows become that ntype's halo slots,
    shared across ALL relations that read the type. With ``tiles=True``
    the local reduce gets per-relation Pallas tile descriptors
    (scatter-free on real TPU); default is the XLA segment path (edges
    arrive dst-sorted), which is what the virtual CPU mesh runs.
    """
    from dgl1_tpu.parallel.graph_partition_book import GraphPartitionBook

    # Total in-degree per ntype over all relations (global) — also the
    # hub-first local-numbering key for the typed identity layouts.
    in_deg_g = {nt: np.zeros(hg.num_nodes(nt), np.int64)
                for nt in hg.ntypes}
    for c in hg.canonical_etypes:
        rel = hg[c]
        e = rel.num_edges()
        np.add.at(in_deg_g[c[2]], np.asarray(rel.dst)[:e], 1)

    books = {nt: GraphPartitionBook(
        part[nt], num_parts,
        order_key=(-in_deg_g[nt] if hub_identity else None))
             for nt in hg.ntypes}
    n_loc = {
        nt: _round_up(
            max(max(books[nt].num_nodes(p) for p in range(num_parts)), 1),
            pad_nodes_multiple)
        for nt in hg.ntypes
    }

    # Halo request sets per (consumer p, src ntype nt, owner q).
    halo_sets = {nt: {p: {} for p in range(num_parts)} for nt in hg.ntypes}
    part_edges = {}  # {c: [eids per part]}
    for nt in hg.ntypes:
        for p in range(num_parts):
            for q in range(num_parts):
                halo_sets[nt][p][q] = np.zeros(0, np.int64)
    for c in hg.canonical_etypes:
        st, _, dt = c
        rel = hg[c]
        e = rel.num_edges()
        src = np.asarray(rel.src)[:e].astype(np.int64)
        dst = np.asarray(rel.dst)[:e].astype(np.int64)
        eo = part[dt][dst]
        per_part = []
        for p in range(num_parts):
            eids = np.nonzero(eo == p)[0]
            per_part.append(eids)
            remote = part[st][src[eids]] != p
            rsrc = np.unique(src[eids][remote])
            for q in range(num_parts):
                nodes_q = rsrc[part[st][rsrc] == q]
                halo_sets[st][p][q] = np.union1d(
                    halo_sets[st][p][q], nodes_q)
        part_edges[c] = per_part

    m_halo = {}
    for nt in hg.ntypes:
        m = max((len(halo_sets[nt][p][q]) for p in range(num_parts)
                 for q in range(num_parts)), default=0)
        m_halo[nt] = (0 if m == 0 else
                      _round_up(max(m, 1), pad_halo_multiple))

    e_loc = {c: _round_up(max(max(len(pe) for pe in part_edges[c]), 1),
                          pad_edges_multiple)
             for c in hg.canonical_etypes}

    send_idx = {nt: np.zeros((num_parts, num_parts, max(m_halo[nt], 1)),
                             np.int32)
                for nt in hg.ntypes}
    node_mask = {nt: np.zeros((num_parts, n_loc[nt]), bool)
                 for nt in hg.ntypes}
    orig_ids = {nt: np.zeros((num_parts, n_loc[nt]), np.int32)
                for nt in hg.ntypes}
    in_deg = {nt: np.zeros((num_parts, n_loc[nt]), np.float32)
              for nt in hg.ntypes}

    halo_pos = {nt: [dict() for _ in range(num_parts)]
                for nt in hg.ntypes}
    for nt in hg.ntypes:
        book = books[nt]
        for p in range(num_parts):
            own = book.partid2nids(p)
            node_mask[nt][p, : len(own)] = True
            orig_ids[nt][p, : len(own)] = own
            in_deg[nt][p, : len(own)] = in_deg_g[nt][own]
            for q in range(num_parts):
                nodes_q = halo_sets[nt][p][q]
                send_idx[nt][q, p, : len(nodes_q)] = book.nid2localnid(
                    nodes_q)
                base = n_loc[nt] + q * m_halo[nt]
                for j, nd in enumerate(nodes_q):
                    halo_pos[nt][p][int(nd)] = base + j

    esrc = {}
    edst = {}
    tiles_fwd = {} if tiles else None
    tiles_rev = {} if tiles else None
    hub_layouts = {} if hub else None
    hub_metas = {} if hub else None
    hub_rows = {} if hub else None
    hub_edges_all = {}
    if tiles:
        from dgl1_tpu.graph import _build_tiles
        from dgl1_tpu.parallel.halo import _pad_tiles
    if hub:
        from dgl1_tpu.hub_format import DENSE_RB
        from dgl1_tpu.parallel.hub_shard import build_partitioned_hub
    for c in hg.canonical_etypes:
        st, _, dt = c
        rel = hg[c]
        e = rel.num_edges()
        src = np.asarray(rel.src)[:e].astype(np.int64)
        dst = np.asarray(rel.dst)[:e].astype(np.int64)
        es = np.zeros((num_parts, e_loc[c]), np.int32)
        ed = np.full((num_parts, e_loc[c]), n_loc[dt], np.int32)
        tf_list, tr_list = [], []
        hub_edges_list = []
        n_comb = n_loc[st] + num_parts * m_halo[st]
        for p in range(num_parts):
            eids = part_edges[c][p]
            ldst = books[dt].nid2localnid(dst[eids])
            s = src[eids]
            local_src = part[st][s] == p
            esrc_p = np.empty(len(eids), dtype=np.int64)
            esrc_p[local_src] = books[st].nid2localnid(s[local_src])
            hp = halo_pos[st][p]
            esrc_p[~local_src] = np.array(
                [hp[int(x)] for x in s[~local_src]], dtype=np.int64
            ) if (~local_src).any() else np.zeros(0, np.int64)
            order = np.argsort(ldst, kind="stable")
            ed[p, : len(eids)] = ldst[order]
            es[p, : len(eids)] = esrc_p[order]
            if hub:
                hub_edges_list.append((esrc_p.copy(),
                                       ldst.astype(np.int64).copy()))
            if tiles:
                dummy_eid = np.zeros(len(eids), np.int32)
                tf_list.append(_build_tiles(
                    ldst[order].astype(np.int32),
                    esrc_p[order].astype(np.int32),
                    dummy_eid, len(eids), n_loc[dt]))
                rev_order = np.argsort(esrc_p, kind="stable")
                tr_list.append(_build_tiles(
                    esrc_p[rev_order].astype(np.int32),
                    ldst[rev_order].astype(np.int32),
                    dummy_eid, len(eids), n_comb))
        esrc[c] = jnp.asarray(es)
        edst[c] = jnp.asarray(ed)
        if tiles:
            tiles_fwd[c] = _pad_tiles(tf_list, n_loc[dt])
            tiles_rev[c] = _pad_tiles(tr_list, n_comb)
        if hub:
            hub_edges_all[c] = (hub_edges_list, n_comb)

    if hub:
        pinned_by_dt = ({dt: _pinned_typed_geometry(
            hub_edges_all, hg.canonical_etypes, dt, n_loc[dt],
            num_parts,
            min_group_edges=(None if hub is True else int(hub)),
            dense_floor=hub_dense_floor)
            for dt in {c[2] for c in hg.canonical_etypes}}
            if hub_identity else {})
        for c in hg.canonical_etypes:
            st, _, dt = c
            hub_edges_list, n_comb = hub_edges_all[c]
            # One row space per relation: num_src = num_dst = R so the
            # hub custom-vjp maps (R, F) -> (R, F); the reduce pads the
            # combined table in and slices owned rows out.
            r_c = _round_up(max(n_comb, n_loc[dt]), DENSE_RB)
            m_c, a_c = build_partitioned_hub(
                hub_edges_list, r_c, r_c, e_loc[c],
                min_group_edges=(None if hub is True else int(hub)),
                dense_floor=hub_dense_floor,
                identity_pinned=pinned_by_dt.get(dt))
            hub_layouts[c] = a_c
            hub_metas[c] = m_c
            hub_rows[c] = r_c if m_c is not None else 0

    return PartitionedHeteroGraph(
        hub=hub_layouts, hub_meta=hub_metas, hub_rows=hub_rows,
        send_idx={nt: jnp.asarray(v) for nt, v in send_idx.items()},
        node_mask={nt: jnp.asarray(v) for nt, v in node_mask.items()},
        orig_ids={nt: jnp.asarray(v) for nt, v in orig_ids.items()},
        in_deg={nt: jnp.asarray(v) for nt, v in in_deg.items()},
        esrc=esrc, edst=edst, tiles_fwd=tiles_fwd, tiles_rev=tiles_rev,
        num_parts=num_parts, n_loc=n_loc, m_halo=m_halo, e_loc=e_loc,
        num_nodes={nt: hg.num_nodes(nt) for nt in hg.ntypes},
        ntypes=tuple(hg.ntypes), etypes=tuple(hg.canonical_etypes),
    )


# ----------------------------------------------------------------------
# Sharded typed ops (per-device view, called inside shard_map)
# ----------------------------------------------------------------------

def hetero_halo_exchange(phg: PartitionedHeteroGraph, ntype: str,
                         feat_local: jnp.ndarray,
                         axis_name: str = "p") -> jnp.ndarray:
    """One ntype's halo all_to_all: (n_loc, F) owned rows -> the combined
    (n_loc + P*m_halo, F) table the relation ``esrc`` indices point into.
    No-op concat when the ntype has no halo anywhere (m_halo == 0)."""
    if phg.m_halo[ntype] == 0:
        return feat_local
    send_idx = phg.send_idx[ntype]  # (1, P, m_halo) inside shard_map
    sbuf = jnp.take(feat_local, send_idx[0], axis=0, mode="clip")
    rbuf = jax.lax.all_to_all(sbuf, axis_name, split_axis=0,
                              concat_axis=0)
    halo = rbuf.reshape((-1,) + feat_local.shape[1:])
    return jnp.concatenate([feat_local, halo], axis=0)


def _local_rel_reduce(phg, c, msg_combined, axis_name):
    """Reduce gathered messages of one relation into owned dst rows."""
    st, _, dt = c
    if phg.hub is not None and phg.hub.get(c) is not None:
        from dgl1_tpu.ops.engine_hub import _Static, _gspmm_hub_sum
        from dgl1_tpu.ops.precision import get_matmul_precision

        r_c = phg.hub_rows[c]
        out_feat = tuple(msg_combined.shape[1:])
        static = _Static(
            op="copy_lhs", num_src=r_c, num_dst=r_c, has_e=False,
            he=1, rep=int(np.prod(out_feat)) if out_feat else 1,
            u_feat=out_feat, e_feat=(), out_feat=out_feat,
            meta=phg.hub_meta[c], prec=get_matmul_precision())
        hub_local = jax.tree.map(lambda v: v[0], phg.hub[c])
        x_pad = jnp.pad(
            msg_combined,
            ((0, r_c - msg_combined.shape[0]),)
            + ((0, 0),) * (msg_combined.ndim - 1))
        e_dummy = x_pad[:1, :1] * 0.0
        return _gspmm_hub_sum(static, hub_local, x_pad,
                              e_dummy)[: phg.n_loc[dt]]
    if phg.tiles_fwd is not None:
        from dgl1_tpu.parallel.sharded_ops import (_tiles_device_view,
                                                   make_local_spmm)

        n_comb = phg.n_loc[st] + phg.num_parts * phg.m_halo[st]
        fn = make_local_spmm(phg.n_loc[dt], n_comb)
        return fn(_tiles_device_view(phg.tiles_fwd[c]),
                  _tiles_device_view(phg.tiles_rev[c]), msg_combined)
    msg = jnp.take(msg_combined, phg.esrc[c][0], axis=0, mode="clip")
    return jax.ops.segment_sum(
        msg, phg.edst[c][0], num_segments=phg.n_loc[dt] + 1,
        indices_are_sorted=True)[: phg.n_loc[dt]]


def sharded_typed_gspmm(
    phg: PartitionedHeteroGraph,
    feats: Dict[str, jnp.ndarray],
    weights: Optional[Dict[CanonicalEtype, jnp.ndarray]] = None,
    axis_name: str = "p",
) -> Dict[str, jnp.ndarray]:
    """Typed copy_u+sum over the partitioned heterograph (per-device view).

    ``feats``: {ntype: (n_loc[nt], F_nt)} owned rows. With ``weights``
    ({canonical_etype: (F_st, F_out)}), each relation projects the
    combined source table with ITS weight before the gather+reduce — the
    R-GCN message ``h[src] @ W_r`` (reference
    ``relgraphconv.py``), computed as one dense (n_comb, F) x (F, out)
    MXU matmul per relation instead of a per-edge gather_mm. Returns
    {dsttype: (n_loc[dt], F_out)} summed over incoming relations.

    Communication: ONE all_to_all per source ntype (not per relation) —
    the combined tables are shared across relations reading the type.
    """
    combined = {}
    for nt in {c[0] for c in phg.etypes}:
        if nt in feats:
            combined[nt] = hetero_halo_exchange(phg, nt, feats[nt],
                                                axis_name)
    out: Dict[str, jnp.ndarray] = {}
    for c in phg.etypes:
        st, _, dt = c
        if st not in combined:
            continue
        h = combined[st]
        if weights is not None:
            h = h @ weights[c]
        agg = _local_rel_reduce(phg, c, h, axis_name)
        out[dt] = agg if dt not in out else out[dt] + agg
    return out


def make_sharded_rgcn_layer(phg: PartitionedHeteroGraph, mesh: Mesh,
                            axis_name: str = "p",
                            norm: str = "right"):
    """Jittable sharded typed layer: ``out[nt] = (1/deg) * sum_r A_r @
    (x[src_r] @ W_r) + x[nt] @ W_self`` — the R-GCN propagation rule with
    'right' normalization (1/total-in-degree, the entity-classification
    default) or norm='none'.

    Inputs/outputs are {ntype: (P, n_loc, F)} sharded on the mesh axis;
    ``weights`` is {canonical_etype: (F_in, F_out)} plus optional
    ``self_weights`` {ntype: (F_in, F_out)} (replicated — their grads are
    psum'd by the shard_map transpose automatically).

    When the returned ``run`` is called INSIDE another ``jax.jit``, pass
    ``phg_arg=<the plan threaded through that jit's arguments>`` —
    otherwise the closed-over layout arrays are baked into the outer
    HLO as constants (compile bloat; trips the remote-compile size
    limit once hub layouts are attached — same rule as bench.py's
    graph argument).
    """

    if mesh.shape[axis_name] != phg.num_parts:
        raise ValueError(
            f"mesh axis {axis_name!r} has size {mesh.shape[axis_name]} "
            f"but the plan has {phg.num_parts} parts — did you forget "
            "XLA_FLAGS=--xla_force_host_platform_device_count?")

    def body(phg_local, feats, weights, self_weights):
        f = {nt: x[0] for nt, x in feats.items()}
        agg = sharded_typed_gspmm(phg_local, f, weights, axis_name)
        out = {}
        for nt, y in agg.items():
            if norm == "right":
                d = phg_local.in_deg[nt][0]
                y = y / jnp.maximum(d, 1.0)[:, None]
            if nt in self_weights:
                y = y + f[nt] @ self_weights[nt]
            out[nt] = y[None]
        return out

    spec_pg = jax.tree.map(lambda _: PartitionSpec(axis_name), phg)

    def run(feats, weights, self_weights=None, phg_arg=None):
        self_weights = {} if self_weights is None else self_weights
        in_specs = (
            spec_pg,
            jax.tree.map(lambda _: PartitionSpec(axis_name), feats),
            jax.tree.map(lambda _: PartitionSpec(), weights),
            jax.tree.map(lambda _: PartitionSpec(), self_weights),
        )
        dst_types = {c[2] for c in phg.etypes if c[0] in feats}
        out_specs = {nt: PartitionSpec(axis_name) for nt in dst_types}
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
        return fn(phg if phg_arg is None else phg_arg, feats,
                  weights, self_weights)

    return run


# ----------------------------------------------------------------------
# On-disk contract (parity: dgl.distributed.partition_graph on
# heterographs: per-part containers + json book)
# ----------------------------------------------------------------------

def partition_hetero_graph(
    hg: HeteroGraph,
    graph_name: str,
    num_parts: int,
    out_path: str,
    part_method: str = "metis",
    balance_edges: bool = True,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Partition + persist a heterograph (parity:
    ``dgl.distributed.partition_graph`` with a DGLHeteroGraph; anchor
    ``src/graph/transform/partition_hetero.cc :: PartitionWithHalo``).

    Per part ``p``: each node type's local space is [owned | 1-hop halo]
    with ``inner_node`` flags and original per-ntype ids; each relation
    stores its destination-owned edges with locally relabeled endpoints
    plus original edge ids. Node features are sliced per owned node.
    Returns the per-ntype assignment dict.
    """
    import json
    from pathlib import Path

    part = hetero_partition_assignment(
        hg, num_parts, part_method=part_method,
        balance_edges=balance_edges, seed=seed)

    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    etypes = hg.canonical_etypes

    for p in range(num_parts):
        pdir = out / f"part{p}"
        pdir.mkdir(exist_ok=True)
        # Owned edge sets per relation + per-ntype halo requirements.
        own_edges = {}
        halo_needed = {nt: [] for nt in hg.ntypes}
        for c in etypes:
            st, _, dt = c
            rel = hg[c]
            e = rel.num_edges()
            src = np.asarray(rel.src)[:e].astype(np.int64)
            dst = np.asarray(rel.dst)[:e].astype(np.int64)
            eids = np.nonzero(part[dt][dst] == p)[0]
            own_edges[c] = (src[eids], dst[eids], eids)
            remote = part[st][src[eids]] != p
            halo_needed[st].append(np.unique(src[eids][remote]))
        local_nodes = {}
        relabel = {}
        for nt in hg.ntypes:
            own = np.nonzero(part[nt] == p)[0]
            halo = (np.setdiff1d(np.unique(np.concatenate(halo_needed[nt])),
                                 own)
                    if halo_needed[nt] else np.zeros(0, np.int64))
            loc = np.concatenate([own, halo])
            local_nodes[nt] = (loc, len(own))
            r = np.full(hg.num_nodes(nt), -1, dtype=np.int64)
            r[loc] = np.arange(len(loc))
            relabel[nt] = r
        arrays = {}
        for i, c in enumerate(etypes):
            st, _, dt = c
            src, dst, eids = own_edges[c]
            arrays[f"src_{i}"] = relabel[st][src].astype(np.int32)
            arrays[f"dst_{i}"] = relabel[dt][dst].astype(np.int32)
            arrays[f"eid_{i}"] = eids.astype(np.int64)
        for nt in hg.ntypes:
            loc, n_own = local_nodes[nt]
            arrays[f"nid_{nt}"] = loc.astype(np.int64)
            arrays[f"inner_{nt}"] = np.arange(len(loc)) < n_own
        np.savez_compressed(pdir / "graph.npz", **arrays)
        feats = {}
        for nt in hg.ntypes:
            own = local_nodes[nt][0][: local_nodes[nt][1]]
            for k, v in hg.nframes[nt].items():
                feats[f"{nt}__{k}"] = np.asarray(v)[own]
        np.savez_compressed(pdir / "node_feat.npz", **feats)

    book = {
        "graph_name": graph_name,
        "num_parts": num_parts,
        "hetero": True,
        "ntypes": list(hg.ntypes),
        "etypes": [list(c) for c in etypes],
        "num_nodes": {nt: hg.num_nodes(nt) for nt in hg.ntypes},
        "num_edges": {"/".join(c): hg[c].num_edges() for c in etypes},
        "part_method": part_method,
        "edge_cut_fraction": hetero_edge_cut_fraction(hg, part),
    }
    np.savez(out / "node_part.npz",
             **{nt: part[nt] for nt in hg.ntypes})
    with open(out / f"{graph_name}.json", "w") as f:
        json.dump(book, f)
    return part


def load_hetero_partition(out_path: str, graph_name: str, part_id: int):
    """Load one hetero partition -> (local HeteroGraph, feats, book).

    The local graph's node spaces are [owned | halo] per ntype;
    ``book['part_assignment']`` carries the per-ntype assignment dict;
    per-ntype original ids / inner flags live in the returned graph's
    frames (``orig_id``, ``inner_node``), per-etype original edge ids in
    ``edata['orig_id']``.
    """
    import json
    from pathlib import Path

    from dgl1_tpu.graph import block as make_block

    out = Path(out_path)
    with open(out / f"{graph_name}.json") as f:
        book = json.load(f)
    etypes = [tuple(c) for c in book["etypes"]]
    pdir = out / f"part{part_id}"
    with np.load(pdir / "graph.npz") as z:
        nids = {nt: z[f"nid_{nt}"] for nt in book["ntypes"]}
        inner = {nt: z[f"inner_{nt}"] for nt in book["ntypes"]}
        rels = {}
        eids = {}
        for i, c in enumerate(etypes):
            st, _, dt = c
            rels[c] = make_block(
                (z[f"src_{i}"], z[f"dst_{i}"]),
                num_src_nodes=len(nids[st]),
                num_dst_nodes=len(nids[dt]),
            )
            eids[c] = z[f"eid_{i}"]
    counts = {nt: len(nids[nt]) for nt in book["ntypes"]}
    lg = HeteroGraph(rels, counts)
    for nt in book["ntypes"]:
        lg.nframes[nt]["orig_id"] = jnp.asarray(nids[nt])
        lg.nframes[nt]["inner_node"] = jnp.asarray(inner[nt])
    for c in etypes:
        lg[c].edata["orig_id"] = jnp.asarray(eids[c])
    feats = {nt: {} for nt in book["ntypes"]}
    with np.load(pdir / "node_feat.npz") as z:
        for key in z.files:
            nt, k = key.split("__", 1)
            feats[nt][k] = np.array(z[key])
    with np.load(out / "node_part.npz") as z:
        book["part_assignment"] = {nt: np.array(z[nt])
                                   for nt in book["ntypes"]}
    return lg, feats, book


def sharded_typed_attention(
    phg: PartitionedHeteroGraph,
    el: Dict[CanonicalEtype, jnp.ndarray],
    er: Dict[str, jnp.ndarray],
    ft: Dict[CanonicalEtype, jnp.ndarray],
    negative_slope: float = 0.2,
    axis_name: str = "p",
) -> Dict[str, jnp.ndarray]:
    """Typed edge-softmax attention over the partitioned heterograph
    (per-device view) — the hetero-GAT / HGT aggregation pattern:

        out[d] = sum_{c, e in c: dst=d} softmax_d(z_e) * ft_c[src_e]
        z_e    = leaky_relu(el_c[src_e] + er[ntype(d)][d])

    with ONE softmax per destination across ALL its relations (the HGT
    convention; ``HeteroGraphConv`` + per-relation ``edge_softmax``
    normalizes per relation instead — callers wanting that can just call
    this once per relation). Because every relation's edges live on the
    destination's part, the cross-relation softmax is EXACT and local:
    the per-dst max and sum accumulate across relations in node space,
    and the only communication is the per-(etype) halo all_to_all of the
    source tensors.

    ``el``/``ft`` are keyed by canonical etype (each relation has its own
    projection of its source type, the zoo convention); ``er`` by dst
    ntype. Shapes: el[c] (n_loc[st], H), er[nt] (n_loc[nt], H),
    ft[c] (n_loc[st], H, D). Returns {dsttype: (n_loc, H, D)}.
    """
    NEG = -1e30
    # Halo-exchange the per-relation source tensors (el + ft ride one
    # packed exchange per relation to halve launch count).
    packed_c = {}
    for c in phg.etypes:
        st, _, dt = c
        if c not in el:
            continue
        h, d = ft[c].shape[1], ft[c].shape[2]
        pack = jnp.concatenate(
            [el[c], ft[c].reshape(ft[c].shape[0], h * d)], axis=1)
        packed_c[c] = hetero_halo_exchange(phg, st, pack, axis_name)

    # Pass 1: per-dst running max across all relations (stop-grad).
    m = {}
    z_c = {}
    for c, pack in packed_c.items():
        st, _, dt = c
        h = el[c].shape[1]
        n_dst = phg.n_loc[dt]
        esrc, edst = phg.esrc[c][0], phg.edst[c][0]
        el_e = jnp.take(pack[:, :h], esrc, axis=0, mode="clip")
        er_pad = jnp.concatenate(
            [er[dt], jnp.zeros((1, h), er[dt].dtype)], axis=0)
        er_e = jnp.take(er_pad, jnp.minimum(edst, n_dst), axis=0)
        z = el_e + er_e
        z = jnp.where(z >= 0, z, negative_slope * z)
        valid = (edst < n_dst)[:, None]
        z = jnp.where(valid, z, NEG)
        z_c[c] = z
        m_rel = jax.ops.segment_max(z, edst, num_segments=n_dst + 1,
                                    indices_are_sorted=True)[:n_dst]
        m[dt] = (m_rel if dt not in m else jnp.maximum(m[dt], m_rel))
    m = {nt: jax.lax.stop_gradient(jnp.maximum(v, NEG))
         for nt, v in m.items()}

    # Pass 2: accumulate numerator/denominator across relations.
    num, den = {}, {}
    for c, pack in packed_c.items():
        st, _, dt = c
        h, d = ft[c].shape[1], ft[c].shape[2]
        n_dst = phg.n_loc[dt]
        esrc, edst = phg.esrc[c][0], phg.edst[c][0]
        m_pad = jnp.concatenate(
            [m[dt], jnp.zeros((1, h), m[dt].dtype)], axis=0)
        m_e = jnp.take(m_pad, jnp.minimum(edst, n_dst), axis=0)
        valid = (edst < n_dst)[:, None]
        p = jnp.where(valid, jnp.exp(z_c[c] - m_e), 0.0)
        ft_e = jnp.take(pack[:, h:], esrc, axis=0,
                        mode="clip").reshape(-1, h, d)
        n_rel = jax.ops.segment_sum(p[:, :, None] * ft_e, edst,
                                    num_segments=n_dst + 1,
                                    indices_are_sorted=True)[:n_dst]
        d_rel = jax.ops.segment_sum(p, edst, num_segments=n_dst + 1,
                                    indices_are_sorted=True)[:n_dst]
        num[dt] = n_rel if dt not in num else num[dt] + n_rel
        den[dt] = d_rel if dt not in den else den[dt] + d_rel
    return {nt: num[nt] / jnp.maximum(den[nt], 1e-30)[:, :, None]
            for nt in num}


def make_sharded_hetero_attention(phg: PartitionedHeteroGraph,
                                  mesh: Mesh,
                                  negative_slope: float = 0.2,
                                  axis_name: str = "p"):
    """Jittable wrapper: inputs {c: (P, n_loc, H)} el, {nt: (P, n_loc, H)}
    er, {c: (P, n_loc, H, D)} ft, sharded on the mesh axis; returns
    {dsttype: (P, n_loc, H, D)}."""

    if mesh.shape[axis_name] != phg.num_parts:
        raise ValueError(
            f"mesh axis {axis_name!r} has size {mesh.shape[axis_name]} "
            f"but the plan has {phg.num_parts} parts — did you forget "
            "XLA_FLAGS=--xla_force_host_platform_device_count?")

    def body(phg_local, el, er, ft):
        out = sharded_typed_attention(
            phg_local,
            {c: v[0] for c, v in el.items()},
            {nt: v[0] for nt, v in er.items()},
            {c: v[0] for c, v in ft.items()},
            negative_slope, axis_name)
        return {nt: v[None] for nt, v in out.items()}

    spec_pg = jax.tree.map(lambda _: PartitionSpec(axis_name), phg)

    def run(el, er, ft):
        in_specs = (
            spec_pg,
            jax.tree.map(lambda _: PartitionSpec(axis_name), el),
            jax.tree.map(lambda _: PartitionSpec(axis_name), er),
            jax.tree.map(lambda _: PartitionSpec(axis_name), ft),
        )
        dst_types = {c[2] for c in phg.etypes if c in el}
        out_specs = {nt: PartitionSpec(axis_name) for nt in dst_types}
        fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, check_vma=False)
        return fn(phg, el, er, ft)

    return run
