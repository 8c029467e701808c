"""Device-resident partitioned graph with a static halo-exchange plan.

This is the TPU-native replacement for DistDGL's KVStore pull (SURVEY.md
§2.3 "graph partition parallel"): instead of fetching remote features by
RPC at run time, the partitioner precomputes, per (owner q -> consumer p)
pair, WHICH owned nodes q must send to p; at every layer the features move
in one ``all_to_all`` over ICI inside ``shard_map`` and land in fixed halo
slots that the local edge arrays already index. Everything is padded to
static shapes at build time so one compiled program serves every step.

Reference anchors: ``src/graph/transform/partition_hetero.cc ::
PartitionWithHalo`` (halo construction), ``python/dgl/distributed/
kvstore.py`` (the pull being replaced).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dgl1_tpu.graph import Graph
from dgl1_tpu.parallel.graph_partition_book import GraphPartitionBook

__all__ = ["PartitionedGraph", "build_partitioned_graph",
           "vertex_cut_edge_owner"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_tiles(tiles_list, num_target):
    """Stack per-part Pallas tile dicts, padding tile counts to the max
    with no-op tiles aimed at a scratch row block past the real ones."""
    from dgl1_tpu.graph import TILE_EDGES, TILE_ROWS

    scratch_block = (num_target + TILE_ROWS - 1) // TILE_ROWS
    n_tiles = max(t["rows"].shape[0] for t in tiles_list)
    out = {k: [] for k in ("rows", "first", "lid", "gather",
                           "block_mask")}
    for t in tiles_list:
        pad = n_tiles - t["rows"].shape[0]
        out["rows"].append(np.concatenate(
            [t["rows"], np.full(pad, scratch_block, np.int32)]))
        out["first"].append(np.concatenate(
            [t["first"], np.ones(pad, np.int32)]))
        out["lid"].append(np.concatenate(
            [t["lid"], np.full((pad, TILE_EDGES), -1, np.int32)]))
        out["gather"].append(np.concatenate(
            [t["gather"], np.zeros(pad * TILE_EDGES, np.int32)]))
        out["block_mask"].append(t["block_mask"])
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


_PG_ARRAY_FIELDS = (
    "edst", "esrc", "send_idx", "in_deg", "out_deg", "node_mask", "orig_ids",
    "tiles_fwd", "tiles_rev", "recv_pos", "slot_node", "bdense", "hub",
    "halo_out_deg",
)
_PG_STATIC_FIELDS = ("num_parts", "n_loc", "e_loc", "m_halo", "num_nodes",
                     "m_part", "hub_meta", "hub_rows", "halo_dtype")


class PartitionedGraph:
    """All arrays have leading axis P (the mesh axis to shard over).

    Combined per-device feature index space: [0, n_loc) owned nodes,
    [n_loc + q*m_halo, n_loc + (q+1)*m_halo) halo slots from owner q.

    Array fields (pytree leaves):
      edst      (P, e_loc)    int32 local dst ids, sorted; sentinel n_loc
                               marks padding
      esrc      (P, e_loc)    int32 combined src index
      send_idx  (P, P, m_halo) int32: [p][q] = local ids p sends to q
      in_deg    (P, n_loc)    float32 global in-degree
      out_deg   (P, n_loc)    float32 global out-degree
      node_mask (P, n_loc)    bool — real owned node
      orig_ids  (P, n_loc)    int32 global id (sentinel 0)
    Static fields (pytree aux): num_parts, n_loc, e_loc, m_halo, num_nodes.
    """

    __slots__ = _PG_ARRAY_FIELDS + _PG_STATIC_FIELDS

    def __init__(self, *, edst, esrc, send_idx, in_deg, out_deg, node_mask,
                 orig_ids, num_parts, n_loc, e_loc, m_halo, num_nodes,
                 tiles_fwd=None, tiles_rev=None, recv_pos=None,
                 slot_node=None, m_part=0, bdense=None, hub=None,
                 hub_meta=None, hub_rows=0, halo_dtype="f32",
                 halo_out_deg=None):
        self.edst = edst
        self.esrc = esrc
        self.send_idx = send_idx
        self.in_deg = in_deg
        self.out_deg = out_deg
        # (P, P*m_halo) global out-degree of the node each halo slot
        # carries (1.0 in unused slots): lets the halo_filled fast path
        # apply the GCN out-norm to prefilled halo rows without an
        # exchange (sharded_ops.fill_halo_combined).
        self.halo_out_deg = halo_out_deg
        self.node_mask = node_mask
        self.orig_ids = orig_ids
        # Per-device Pallas tile descriptors (each a dict of arrays with
        # leading P axis): fwd reduces local edges into owned rows; rev
        # reduces into the combined [owned + halo-slot] index space for
        # the backward pass (the all_to_all transpose then returns halo
        # cotangents to their owners).
        self.tiles_fwd = tiles_fwd
        self.tiles_rev = tiles_rev
        # Per-part block-dense descriptors (bdense_format.plan_blocks,
        # stacked on a leading P axis, K padded to the cross-part max):
        # the dense tier of the local SpMM; tiles_fwd/rev then cover only
        # the leftover (tail) edges.
        self.bdense = bdense
        # Per-part hub-dense layouts (cross-part unified geometry, see
        # parallel/hub_shard.py): the flagship MXU SpMM engine inside
        # the sharded local reduce. hub_meta is the shared static
        # HubMeta (pytree aux).
        self.hub = hub
        self.hub_meta = hub_meta
        # Combined-layout row count R = round_up(max(n_comb, n_out),
        # DENSE_RB): the hub layouts are built with num_src = num_dst =
        # R so activations can stay in ONE padded [owned | halo | pad]
        # layout across layers (no concat/pad copy passes — see
        # sharded_ops.sharded_gspmm_combined).
        self.hub_rows = int(hub_rows)
        # Wire format of the halo all_to_all payload: "f32" (exact),
        # "bf16" (halves ICI bytes; ~4e-3 relative rounding) or "int8"
        # (per-row absmax scale + int8 mantissa: QUARTERS the bytes;
        # ~8e-3 row-relative — the break-even cuts per wire are in
        # tools/bench_scaling.py --sensitivity; model-level accuracy
        # deltas in docs/PERF_NOTES.md r4/r5).
        self.halo_dtype = str(halo_dtype)
        # Vertex-cut (split-destination) extras — None/0 in pure halo
        # mode. recv_pos (P, n_loc, P): receive-buffer position of the
        # partial each sender holds for an owned node (sentinel = OOB);
        # slot_node (P, P*m_part): owned local id consuming a receive
        # slot (sentinel n_loc = none).
        self.recv_pos = recv_pos
        self.slot_node = slot_node
        self.m_part = int(m_part)
        self.num_parts = int(num_parts)
        self.n_loc = int(n_loc)
        self.e_loc = int(e_loc)
        self.m_halo = int(m_halo)
        self.num_nodes = int(num_nodes)

    def tree_flatten(self):
        return (
            tuple(getattr(self, f) for f in _PG_ARRAY_FIELDS),
            tuple(getattr(self, f) for f in _PG_STATIC_FIELDS),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        kw = dict(zip(_PG_ARRAY_FIELDS, children))
        kw.update(dict(zip(_PG_STATIC_FIELDS, aux)))
        return cls(**kw)

    # ------------------------------------------------------------------
    def shard_node_data(self, data) -> jnp.ndarray:
        """(N, *f) global node data -> (P, n_loc, *f) part-local layout."""
        data = jnp.asarray(data)
        idx = self.orig_ids.reshape(-1)
        out = jnp.take(data, idx, axis=0, mode="clip")
        if jnp.issubdtype(out.dtype, jnp.floating):
            # Zero phantom rows so padded nodes can't leak values.
            mask = self.node_mask.reshape((-1,) + (1,) * (data.ndim - 1))
            out = out * mask.astype(out.dtype)
        return out.reshape((self.num_parts, self.n_loc) + data.shape[1:])

    def shard_node_data_combined(self, data) -> jnp.ndarray:
        """(N, *f) global node data -> (P, R, *f) combined-layout blocks
        (R = hub_rows; halo/pad rows zero — the first halo update fills
        the slots)."""
        if not self.hub_rows:
            raise ValueError("combined layout requires hub=... at build")
        x = self.shard_node_data(data)
        pad = self.hub_rows - self.n_loc
        return jnp.pad(
            x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

    def unshard_node_data_combined(self, data) -> jnp.ndarray:
        """(P, R, *f) combined-layout -> (N, *f) global (owned rows)."""
        return self.unshard_node_data(data[:, : self.n_loc])

    def unshard_node_data(self, data) -> jnp.ndarray:
        """(P, n_loc, *f) -> (N, *f) global layout."""
        flat = data.reshape((-1,) + data.shape[2:])
        ids = self.orig_ids.reshape(-1)
        mask = self.node_mask.reshape(-1)
        out = jnp.zeros((self.num_nodes,) + data.shape[2:], dtype=data.dtype)
        # Drop phantom rows: route them to an out-of-range index.
        safe_ids = jnp.where(mask, ids, self.num_nodes)
        return out.at[safe_ids].set(flat, mode="drop")


jax.tree_util.register_pytree_node(
    PartitionedGraph,
    PartitionedGraph.tree_flatten,
    PartitionedGraph.tree_unflatten,
)


def vertex_cut_edge_owner(g: Graph, part: np.ndarray, num_parts: int,
                          threshold: Optional[int] = None) -> np.ndarray:
    """PowerGraph-style split-destination edge ownership.

    Low in-degree destinations keep all their edges on their own part
    (edge-cut behavior, no extra comm); destinations above ``threshold``
    have their in-edges dealt round-robin across ALL parts — compute for
    a mega-hub spreads evenly and its aggregation finishes with at most
    ``P-1`` partial rows exchanged, instead of one part owning the whole
    hub (the balance failure mode measured in tools/bench_scaling.py).
    """
    part = np.asarray(part).astype(np.int32)
    e = g.num_edges()
    dst = np.asarray(g.dst)[:e].astype(np.int64)
    in_deg = np.bincount(dst, minlength=g.num_nodes())
    if threshold is None:
        threshold = max(int(e / (num_parts * 16)), 64)
    owner = part[dst].astype(np.int32)
    hub_mask = in_deg > threshold
    hub_edges = np.nonzero(hub_mask[dst])[0]
    if len(hub_edges):
        # Deal each hub's in-edges round-robin across parts, vectorized:
        # rank-within-hub = position in the dst-grouped order.
        hd = dst[hub_edges]
        order = np.argsort(hd, kind="stable")
        sorted_hd = hd[order]
        first_pos = np.searchsorted(sorted_hd, sorted_hd)
        rank = np.arange(len(sorted_hd)) - first_pos
        owner[hub_edges[order]] = (
            part[sorted_hd].astype(np.int64) + rank
        ) % num_parts
    return owner


def build_partitioned_graph(
    g: Graph,
    part: np.ndarray,
    num_parts: int,
    pad_nodes_multiple: int = 8,
    pad_edges_multiple: int = 128,
    pad_halo_multiple: int = 8,
    edge_owner: Optional[np.ndarray] = None,
    tiles: bool = True,
    bdense: bool = False,
    hub=False,
    hub_dense_floor: Optional[int] = None,
    halo_dtype: str = "f32",
    hub_identity: bool = False,
) -> PartitionedGraph:
    """Build the device-resident partitioned structure from an assignment.

    Default (``edge_owner=None``): edges are owned by their destination's
    part (aggregation stays local); remote sources become halo slots.
    With ``edge_owner`` (e.g. from :func:`vertex_cut_edge_owner`), an edge
    may live on another part: its contribution reduces into a *partial
    slot* there and one extra ``all_to_all`` returns partials to the
    destination's owner, which folds them in — the vertex-cut mode that
    balances compute on power-law graphs. All dimensions are padded to
    the max across parts (static shapes for shard_map).

    ``hub_identity=True`` (requires ``hub=...``, halo placement):
    renumber each part's owned nodes hub-first against the forced
    cross-part hub geometry (``parallel/hub_shard.plan_identity_order``)
    so every part inherits the engine's identity-expand fused-pad
    forward — the 4G single-chip headline path — instead of the
    inverse-permute expand. The relabel is internal: ``orig_ids`` /
    ``shard_node_data`` / ``unshard_node_data`` compose it away, and no
    ``hub_order`` preprocessing of the input graph is needed. Costs a
    somewhat larger ``n_loc`` (phantom ids absorb the union geometry's
    slot gaps).
    """
    part = np.asarray(part).astype(np.int32)
    book = GraphPartitionBook(part, num_parts)
    e = g.num_edges()
    src = np.asarray(g.src)[:e].astype(np.int64)
    dst = np.asarray(g.dst)[:e].astype(np.int64)
    in_deg_g = np.zeros(g.num_nodes(), dtype=np.int64)
    np.add.at(in_deg_g, dst, 1)
    out_deg_g = np.zeros(g.num_nodes(), dtype=np.int64)
    np.add.at(out_deg_g, src, 1)

    eo = part[dst] if edge_owner is None else \
        np.asarray(edge_owner).astype(np.int32)
    vertex_cut = edge_owner is not None and bool(np.any(eo != part[dst]))

    own_nodes = [book.partid2nids(p) for p in range(num_parts)]
    n_loc = _round_up(max(len(o) for o in own_nodes), pad_nodes_multiple)

    # Per-part edge sets, halo (src side) and partial (dst side) sets.
    halo_sets: Dict[int, Dict[int, np.ndarray]] = {}
    partial_sets: Dict[int, Dict[int, np.ndarray]] = {}
    part_edges = []
    for p in range(num_parts):
        eids = np.nonzero(eo == p)[0]
        part_edges.append(eids)
        remote = part[src[eids]] != p
        req: Dict[int, np.ndarray] = {}
        rsrc = np.unique(src[eids][remote])
        for q in range(num_parts):
            req[q] = rsrc[part[rsrc] == q]
        halo_sets[p] = req
        preq: Dict[int, np.ndarray] = {}
        if vertex_cut:
            fdst = np.unique(dst[eids][part[dst[eids]] != p])
            for q in range(num_parts):
                preq[q] = fdst[part[fdst] == q]
        else:
            for q in range(num_parts):
                preq[q] = np.zeros(0, np.int64)
        partial_sets[p] = preq

    m_halo = max(
        (len(halo_sets[p][q]) for p in range(num_parts)
         for q in range(num_parts)),
        default=0,
    )
    m_halo = max(_round_up(max(m_halo, 1), pad_halo_multiple), pad_halo_multiple)
    e_loc = _round_up(max(len(pe) for pe in part_edges), pad_edges_multiple)
    m_part = 0
    if vertex_cut:
        m_part = max(len(partial_sets[p][q]) for p in range(num_parts)
                     for q in range(num_parts))
        m_part = max(_round_up(max(m_part, 1), pad_halo_multiple),
                     pad_halo_multiple)

    # Per-part hub-first renumbering (identity expand at any k).
    relabels = None
    hub_mge = None if hub is True or not hub else int(hub)
    hub_df = hub_dense_floor
    if hub_identity:
        if not hub:
            raise ValueError("hub_identity requires hub=... at build")
        if vertex_cut:
            raise ValueError(
                "hub_identity: vertex-cut placement unsupported "
                "(partial-slot destinations pin their own numbering); "
                "use the default destination-owner placement")
        from dgl1_tpu.hub_format import CHUNK, DENSE_RB, BLK
        from dgl1_tpu.parallel.hub_shard import plan_identity_order

        # Resolve the hub floors against the NATURAL geometry once so
        # this plan and the final (relabeled, larger-R) build select
        # identical hub groups.
        r_nat = _round_up(max(n_loc + num_parts * m_halo, n_loc),
                          DENSE_RB)
        if hub_mge is None:
            hub_mge = max(4 * CHUNK, ((-(-r_nat // BLK)) * CHUNK) // 4)
        if hub_df is None:
            hub_df = max(r_nat // 2, 4 * CHUNK)
        plan_parts = []
        for p in range(num_parts):
            eids = part_edges[p]
            plan_parts.append((
                book.nid2localnid(dst[eids]).astype(np.int64),
                src[eids] == dst[eids],
                len(own_nodes[p]),
            ))
        relabels, _n_merge, max_used = plan_identity_order(
            plan_parts, n_loc, hub_mge, hub_df)
        if relabels is not None:
            n_loc = _round_up(max(max_used, 1), pad_nodes_multiple)

    from dgl1_tpu.graph import _build_tiles

    n_comb = n_loc + num_parts * m_halo
    # SpMM output space: owned rows, then per-owner partial-slot blocks.
    n_out = n_loc + num_parts * m_part

    tiles_fwd_list, tiles_rev_list = [], []
    bdense_list = []
    hub_edges_list = []
    if bdense and not tiles:
        raise ValueError("bdense=True requires tiles=True (the tail path)")

    edst = np.full((num_parts, e_loc), n_out, dtype=np.int32)
    esrc = np.zeros((num_parts, e_loc), dtype=np.int32)
    send_idx = np.zeros((num_parts, num_parts, m_halo), dtype=np.int32)
    halo_outdeg = np.ones((num_parts, num_parts * m_halo),
                          dtype=np.float32)
    in_deg = np.zeros((num_parts, n_loc), dtype=np.float32)
    out_deg = np.zeros((num_parts, n_loc), dtype=np.float32)
    node_mask = np.zeros((num_parts, n_loc), dtype=bool)
    orig_ids = np.zeros((num_parts, n_loc), dtype=np.int32)
    recv_pos = None
    slot_node = None
    if vertex_cut:
        # Sentinels: recv_pos OOB index -> fill-0 gather in the merge;
        # slot_node n_loc -> fill-0 gather in the merge transpose.
        recv_pos = np.full((num_parts, n_loc, num_parts),
                           num_parts * m_part, dtype=np.int32)
        slot_node = np.full((num_parts, num_parts * m_part), n_loc,
                            dtype=np.int32)

    def _local(p, nids):
        """Global ids -> part p's local ids (identity relabel aware)."""
        lid = book.nid2localnid(nids)
        return lid if relabels is None else relabels[p][lid]

    for p in range(num_parts):
        own = own_nodes[p]
        k = len(own)
        lids = (np.arange(k, dtype=np.int64) if relabels is None
                else relabels[p])
        node_mask[p, lids] = True
        orig_ids[p, lids] = own
        in_deg[p, lids] = in_deg_g[own]
        out_deg[p, lids] = out_deg_g[own]

        # Combined index for remote sources: halo slot of (owner, position).
        halo_pos = {}
        for q in range(num_parts):
            nodes_q = halo_sets[p][q]
            # Position within q's send block for destination p.
            send_idx[q, p, : len(nodes_q)] = _local(q, nodes_q)
            halo_outdeg[p, q * m_halo: q * m_halo + len(nodes_q)] = \
                out_deg_g[nodes_q]
            for j, nd in enumerate(nodes_q):
                halo_pos[int(nd)] = n_loc + q * m_halo + j

        # Output index for foreign destinations: partial slot of
        # (owner q, position j). The receive side mirrors it: owner q's
        # buffer block from p carries exactly partial_sets[p][q] order.
        partial_pos = {}
        if vertex_cut:
            for q in range(num_parts):
                nodes_q = partial_sets[p][q]
                lq = _local(q, nodes_q)
                for j, (nd, ln) in enumerate(zip(nodes_q, lq)):
                    partial_pos[int(nd)] = n_loc + q * m_part + j
                    # On owner q: slot (p * m_part + j) of ITS receive
                    # buffer holds p's partial for local node ln.
                    recv_pos[q, ln, p] = p * m_part + j
                    slot_node[q, p * m_part + j] = ln

        eids = part_edges[p]
        dst_e = dst[eids]
        owned_dst = part[dst_e] == p
        ldst = np.empty(len(eids), dtype=np.int64)
        ldst[owned_dst] = _local(p, dst_e[owned_dst])
        if vertex_cut and (~owned_dst).any():
            ldst[~owned_dst] = np.array(
                [partial_pos[int(d)] for d in dst_e[~owned_dst]],
                dtype=np.int64)
        esrc_p = np.empty(len(eids), dtype=np.int64)
        local_src = part[src[eids]] == p
        esrc_p[local_src] = _local(p, src[eids][local_src])
        remote_ids = src[eids][~local_src]
        esrc_p[~local_src] = np.array(
            [halo_pos[int(s)] for s in remote_ids], dtype=np.int64
        ) if len(remote_ids) else np.zeros(0, dtype=np.int64)
        order = np.argsort(ldst, kind="stable")
        edst[p, : len(eids)] = ldst[order]
        esrc[p, : len(eids)] = esrc_p[order]
        if hub:
            hub_edges_list.append((esrc_p.copy(), ldst.copy()))

        t_src, t_dst = esrc_p, ldst
        if bdense:
            # Dense tier over (combined src space, output dst space);
            # the tile descriptors below then cover only the tail.
            from dgl1_tpu.bdense_format import plan_blocks

            _, bdp, tail_eids = plan_blocks(
                esrc_p.astype(np.int64), ldst.astype(np.int64),
                n_comb, n_out)
            bdense_list.append(bdp)
            t_src, t_dst = esrc_p[tail_eids], ldst[tail_eids]
        if tiles:
            # Pallas tile descriptors for this part, both directions
            # (tail edges only in bdense mode).
            dummy_eid = np.zeros(len(t_src), np.int32)
            t_order = np.argsort(t_dst, kind="stable")
            tiles_fwd_list.append(_build_tiles(
                t_dst[t_order].astype(np.int32),
                t_src[t_order].astype(np.int32),
                dummy_eid, len(t_src), n_out,
            ))
            rev_order = np.argsort(t_src, kind="stable")
            tiles_rev_list.append(_build_tiles(
                t_src[rev_order].astype(np.int32),
                t_dst[rev_order].astype(np.int32),
                dummy_eid, len(t_src), n_comb,
            ))

    tiles_fwd = _pad_tiles(tiles_fwd_list, n_out) if tiles else None
    tiles_rev = _pad_tiles(tiles_rev_list, n_comb) if tiles else None

    bdense_stacked = None
    if bdense:
        from dgl1_tpu.bdense_format import BLK

        n_rb = (n_out + BLK - 1) // BLK
        n_cb = (n_comb + BLK - 1) // BLK
        k_max = max(b["rb"].shape[0] for b in bdense_list)
        out = {k: [] for k in bdense_list[0]}
        for b in bdense_list:
            pad = k_max - b["rb"].shape[0]
            # Padding blocks are all-zero count matrices aimed at the
            # scratch output block (n_rb fwd / n_cb bwd): they write
            # zeros past the real rows, nothing else.
            out["a"].append(np.concatenate(
                [b["a"], np.zeros((pad * BLK, BLK), b["a"].dtype)]))
            out["ab"].append(np.concatenate(
                [b["ab"], np.zeros((pad * BLK, BLK), b["ab"].dtype)]))
            out["rb"].append(np.concatenate(
                [b["rb"], np.full(pad, n_rb, np.int32)]))
            out["cb"].append(np.concatenate(
                [b["cb"], np.zeros(pad, np.int32)]))
            out["first_f"].append(np.concatenate(
                [b["first_f"], np.ones(pad, np.int32)]))
            out["rbb"].append(np.concatenate(
                [b["rbb"], np.zeros(pad, np.int32)]))
            out["cbb"].append(np.concatenate(
                [b["cbb"], np.full(pad, n_cb, np.int32)]))
            out["first_b"].append(np.concatenate(
                [b["first_b"], np.ones(pad, np.int32)]))
            out["rb_mask"].append(b["rb_mask"])
            out["cb_mask"].append(b["cb_mask"])
            # Row/col pointers cover only the REAL blocks [0, K_p); the
            # padding blocks above sit past them in no row/column.
            out["row_ptr"].append(b["row_ptr"])
            out["col_ptr"].append(b["col_ptr"])
        bdense_stacked = {k: jnp.asarray(np.stack(v))
                          for k, v in out.items()}

    hub_meta = hub_stacked = None
    hub_rows = 0
    if hub:
        from dgl1_tpu.hub_format import DENSE_RB
        from dgl1_tpu.parallel.hub_shard import build_partitioned_hub

        hub_rows = _round_up(max(n_comb, n_out), DENSE_RB)
        hub_meta, hub_stacked = build_partitioned_hub(
            hub_edges_list, hub_rows, hub_rows, e_loc,
            min_group_edges=hub_mge,
            dense_floor=hub_df,
            identity=bool(hub_identity and relabels is not None))

    return PartitionedGraph(
        hub=hub_stacked,
        hub_meta=hub_meta,
        hub_rows=hub_rows if hub_stacked is not None else 0,
        halo_dtype=halo_dtype,
        bdense=bdense_stacked,
        tiles_fwd=tiles_fwd,
        tiles_rev=tiles_rev,
        edst=jnp.asarray(edst),
        esrc=jnp.asarray(esrc),
        send_idx=jnp.asarray(send_idx),
        halo_out_deg=jnp.asarray(halo_outdeg),
        in_deg=jnp.asarray(in_deg),
        out_deg=jnp.asarray(out_deg),
        node_mask=jnp.asarray(node_mask),
        orig_ids=jnp.asarray(orig_ids),
        recv_pos=None if recv_pos is None else jnp.asarray(recv_pos),
        slot_node=None if slot_node is None else jnp.asarray(slot_node),
        m_part=m_part,
        num_parts=num_parts,
        n_loc=n_loc,
        e_loc=e_loc,
        m_halo=m_halo,
        num_nodes=g.num_nodes(),
    )
