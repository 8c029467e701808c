"""Graph transforms (host-side, numpy — structure construction is not a jit
concern; the *outputs* are static-shape graphs XLA consumes).

Parity: ``python/dgl/transform.py`` and the C++ ops it wraps —
``src/graph/transform/*.cc`` (``ToBlock``, ``CompactGraphs``, subgraphs),
``src/graph/graph_op.cc`` (reverse, self-loops, line graph, khop).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dgl1_tpu.graph import Graph, block, graph

__all__ = [
    "add_self_loop",
    "remove_self_loop",
    "reverse",
    "add_reverse_edges",
    "to_bidirected",
    "khop_graph",
    "node_subgraph",
    "edge_subgraph",
    "to_simple",
    "line_graph",
    "to_block",
    "to_block_hetero",
    "compact_graphs",
    "to_homogeneous",
    "to_heterogeneous",
    "in_subgraph",
    "out_subgraph",
    "knn_graph",
    "segmented_knn_graph",
    "metapath_reachable_graph",
    "laplacian_lambda_max",
    "add_edges",
    "remove_edges",
    "add_nodes",
    "remove_nodes",
    "typed_subgraphs",
    "typed_union_graph",
    "reorder_graph",
    "rcm_order",
    "laplacian_pe",
    "random_walk_pe",
]


def _coo(g: Graph):
    """Real (unpadded) COO as numpy."""
    e = g.num_edges()
    return np.asarray(g.src)[:e], np.asarray(g.dst)[:e]


def _slice_rows(data: dict, idx: np.ndarray) -> dict:
    import jax.numpy as jnp

    idx = jnp.asarray(idx)
    return {k: jnp.take(v, idx, axis=0, mode="clip") for k, v in data.items()}


def rcm_order(g: Graph) -> np.ndarray:
    """Reverse Cuthill-McKee node order over the undirected adjacency.

    Returns ``perm`` with ``perm[new_id] = old_id``. Per connected
    component: BFS from a minimum-degree seed, neighbors expanded in
    ascending-degree order, then the whole order reversed. This is the
    locality supplier for the block-dense SpMM format
    (``dgl1_tpu/bdense_format.py``): after RCM the adjacency concentrates
    near the diagonal, so 128x128 blocks fill up.
    """
    n = g.num_nodes()
    src, dst = _coo(g)
    us = np.concatenate([src, dst])
    vs = np.concatenate([dst, src])
    order = np.argsort(us, kind="stable")
    us, vs = us[order], vs[order]
    deg = np.bincount(us, minlength=n)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(deg, out=indptr[1:])

    visited = np.zeros(n, bool)
    out = np.empty(n, np.int64)
    pos = 0
    seeds = np.argsort(deg, kind="stable")  # min-degree seeds first
    for seed in seeds:
        if visited[seed]:
            continue
        visited[seed] = True
        out[pos] = seed
        head, pos = pos, pos + 1
        while head < pos:
            u = out[head]
            head += 1
            nbr = vs[indptr[u]:indptr[u + 1]]
            nbr = nbr[~visited[nbr]]
            if len(nbr):
                nbr = np.unique(nbr)  # sorted + deduped
                nbr = nbr[np.argsort(deg[nbr], kind="stable")]
                visited[nbr] = True
                out[pos:pos + len(nbr)] = nbr
                pos += len(nbr)
    return out[::-1].copy()


def reorder_graph(g: Graph, node_permute_algo: str = "metis",
                  edge_permute_algo: str = "src", store_ids: bool = True,
                  permute_config: Optional[dict] = None,
                  formats=None) -> Graph:
    """Relabel nodes (and sort edges) for locality (parity:
    ``dgl.reorder_graph``, ``python/dgl/transforms/functional.py``).

    ``node_permute_algo``: 'rcm' | 'metis' | 'hub' | 'custom'. 'metis'
    orders nodes by partition id (``permute_config={'k': parts}``,
    default 8) using this repo's partitioners; 'hub' applies the
    hub-first identity-expand relabel (``dgl.hub_order``) AND rebuilds
    the hub layout in one step — pass the graph's non-default hub
    floors through ``permute_config={'hub': ..., 'hub_dense_floor':
    ...}`` so identity detection sees the same geometry (the engine's
    4G fused-pad forward, docs/PERF_NOTES.md r4); 'custom' takes
    ``permute_config={'nodes_perm': perm}`` with ``perm[new] = old``.
    ``edge_permute_algo``: 'src' | 'dst' | 'custom'
    (``permute_config={'edges_perm': ...}``).

    Pass ``formats=('coo','csr','csc','ell','bdense')`` to build the
    block-dense layout on the reordered graph — RCM/metis order is what
    makes its dense tier cover edges on hub-free graphs.
    """
    cfg = permute_config or {}
    n = g.num_nodes()
    if node_permute_algo == "rcm":
        perm = rcm_order(g)
    elif node_permute_algo == "metis":
        from dgl1_tpu.parallel.partition import metis_partition_assignment

        k = int(cfg.get("k", 8))
        part = metis_partition_assignment(g, k)
        perm = np.argsort(part, kind="stable").astype(np.int64)
    elif node_permute_algo == "hub":
        from dgl1_tpu.hub_format import hub_order

        if "hub" in cfg or "hub_dense_floor" in cfg:
            # The perm must come from a layout with the SAME floors the
            # rebuild below will use — deriving it from the input
            # graph's existing layout when the floors differ would
            # silently lose identity_expand (the whole point of the
            # mode). Rebuild the source layout with the cfg floors.
            src0, dst0 = _coo(g)
            tmp = graph((src0, dst0), num_nodes=n,
                        hub=cfg.get("hub"),
                        hub_dense_floor=cfg.get("hub_dense_floor"))
            perm = hub_order(tmp)
        else:
            perm = hub_order(g)
    elif node_permute_algo == "custom":
        perm = np.asarray(cfg["nodes_perm"], np.int64)
        if perm.shape != (n,):
            raise ValueError("nodes_perm must have num_nodes entries")
    else:
        raise ValueError(f"unknown node_permute_algo {node_permute_algo!r}")

    relabel = np.empty(n, np.int64)
    relabel[perm] = np.arange(n)
    src, dst = _coo(g)
    new_src, new_dst = relabel[src], relabel[dst]

    if edge_permute_algo == "src":
        eperm = np.argsort(new_src, kind="stable")
    elif edge_permute_algo == "dst":
        eperm = np.argsort(new_dst, kind="stable")
    elif edge_permute_algo == "custom":
        eperm = np.asarray(cfg["edges_perm"], np.int64)
    else:
        raise ValueError(f"unknown edge_permute_algo {edge_permute_algo!r}")
    new_src, new_dst = new_src[eperm], new_dst[eperm]

    gkw = {}
    if node_permute_algo == "hub":
        for k in ("hub", "hub_dense_floor"):
            if k in cfg:
                gkw[k] = cfg[k]
    new = graph((new_src, new_dst), num_nodes=n, formats=formats, **gkw)
    if (node_permute_algo == "hub" and new.hub_dst_meta is not None
            and not getattr(new.hub_dst_meta, "identity_expand", False)):
        import warnings

        warnings.warn(
            "reorder_graph(node_permute_algo='hub') rebuilt a hub "
            "layout WITHOUT identity_expand — the relabeled geometry "
            "does not match the permutation's source layout (pass the "
            "graph's hub floors via permute_config={'hub': ..., "
            "'hub_dense_floor': ...}).", stacklevel=2)
    new.ndata.update(_slice_rows(g.ndata, perm))
    new.edata.update(_slice_rows(g.edata, eperm))
    if store_ids:
        import jax.numpy as jnp

        new.ndata["_ID"] = jnp.asarray(perm.astype(np.int32))
        new.edata["_ID"] = jnp.asarray(eperm.astype(np.int32))
    return new


def reverse(g: Graph, copy_edata: bool = True) -> Graph:
    """Parity: ``dgl.reverse``. Free pytree rewire (CSR<->CSC swap)."""
    return g.reverse(copy_edata=copy_edata)


def add_self_loop(g: Graph) -> Graph:
    """Append one (i, i) edge per node (parity: ``dgl.add_self_loop``;
    existing self-loops are kept, matching the reference)."""
    if g.is_block:
        raise ValueError("add_self_loop on a block is ill-defined")
    src, dst = _coo(g)
    n = g.num_nodes()
    loops = np.arange(n, dtype=src.dtype)
    new = graph(
        (np.concatenate([src, loops]), np.concatenate([dst, loops])),
        num_nodes=n,
    )
    new.ndata.update(g.ndata)
    if g.edata:
        import jax.numpy as jnp

        for k, v in g.edata.items():
            pad = jnp.zeros((n,) + v.shape[1:], dtype=v.dtype)
            new.edata[k] = jnp.concatenate([v[: g.num_edges()], pad], axis=0)
    return new


def remove_self_loop(g: Graph) -> Graph:
    src, dst = _coo(g)
    keep = src != dst
    new = graph((src[keep], dst[keep]), num_nodes=g.num_nodes())
    new.ndata.update(g.ndata)
    if g.edata:
        new.edata.update(_slice_rows(g.edata, np.nonzero(keep)[0]))
    return new


def _unique_pairs(s: np.ndarray, d: np.ndarray, n: int):
    """Deduplicate edge pairs via a packed int64 key (much faster than
    ``np.unique(axis=0)``'s void-dtype row sort)."""
    key = s.astype(np.int64) * n + d.astype(np.int64)
    uniq = np.unique(key)
    return (uniq // n).astype(np.int64), (uniq % n).astype(np.int64)


def add_reverse_edges(
    g: Graph, copy_ndata: bool = True, copy_edata: bool = False
) -> Graph:
    """Append the reverse of every edge, keeping the originals first
    (parity: ``dgl.add_reverse_edges`` — unlike :func:`to_bidirected`, no
    deduplication, and edge ``i``'s reverse is edge ``i + num_edges``).
    ``copy_edata=True`` duplicates each edge feature row onto its
    reverse."""
    if g.is_block:
        raise ValueError("add_reverse_edges on a block is ill-defined")
    src, dst = _coo(g)
    new = graph(
        (np.concatenate([src, dst]), np.concatenate([dst, src])),
        num_nodes=g.num_nodes(),
    )
    if copy_ndata:
        new.ndata.update(g.ndata)
    if copy_edata and g.edata:
        import jax.numpy as jnp

        for k, v in g.edata.items():
            e = v[: g.num_edges()]
            new.edata[k] = jnp.concatenate([e, e], axis=0)
    return new


def to_bidirected(g: Graph) -> Graph:
    """Add reverse edges and deduplicate (parity: ``dgl.to_bidirected``)."""
    src, dst = _coo(g)
    s, d = _unique_pairs(
        np.concatenate([src, dst]), np.concatenate([dst, src]), g.num_nodes()
    )
    return graph((s, d), num_nodes=g.num_nodes())


def to_simple(g: Graph) -> Graph:
    """Remove duplicate edges (parity: ``dgl.to_simple``)."""
    src, dst = _coo(g)
    s, d = _unique_pairs(src, dst, g.num_nodes())
    new = graph((s, d), num_nodes=g.num_nodes())
    new.ndata.update(g.ndata)
    return new


def khop_graph(g: Graph, k: int) -> Graph:
    """Graph whose edges connect k-hop reachable pairs, with multiplicity
    equal to path counts (parity: ``dgl.khop_graph``)."""
    import scipy.sparse as sp

    src, dst = _coo(g)
    n = g.num_nodes()
    adj = sp.csr_matrix(
        (np.ones(len(src), dtype=np.int64), (src, dst)), shape=(n, n)
    )
    out = adj ** k
    coo = out.tocoo()
    s = np.repeat(coo.row, coo.data)
    d = np.repeat(coo.col, coo.data)
    return graph((s, d), num_nodes=n)


def node_subgraph(g: Graph, nodes) -> Graph:
    """Node-induced subgraph with relabeled ids (parity: ``dgl.node_subgraph``).
    Stores original ids in ``ndata['_ID']`` / ``edata['_ID']``."""
    import jax.numpy as jnp

    nodes = np.asarray(nodes)
    if nodes.dtype == bool:
        nodes = np.nonzero(nodes)[0]
    nodes = nodes.astype(np.int64)
    src, dst = _coo(g)
    relabel = np.full((g.num_nodes(),), -1, dtype=np.int64)
    relabel[nodes] = np.arange(len(nodes))
    keep = (relabel[src] >= 0) & (relabel[dst] >= 0)
    eids = np.nonzero(keep)[0]
    new = graph(
        (relabel[src[keep]], relabel[dst[keep]]), num_nodes=len(nodes)
    )
    new.ndata.update(_slice_rows(g.ndata, nodes))
    new.ndata["_ID"] = jnp.asarray(nodes.astype(np.int32))
    new.edata.update(_slice_rows(g.edata, eids))
    new.edata["_ID"] = jnp.asarray(eids.astype(np.int32))
    return new


def edge_subgraph(g: Graph, edges, relabel_nodes: bool = True,
                  pad_edges_to: Optional[int] = None,
                  formats=None) -> Graph:
    """Edge-induced subgraph (parity: ``dgl.edge_subgraph``).

    ``pad_edges_to`` / ``formats``: static-shape knobs for hot callers
    (``core.pull`` pads the edge set to a power of two so repeated
    data-dependent pulls — the Tree-LSTM recurrence — reuse compiled
    programs instead of recompiling per frontier size)."""
    import jax.numpy as jnp

    edges = np.asarray(edges)
    if edges.dtype == bool:
        edges = np.nonzero(edges)[0]
    edges = edges.astype(np.int64)
    src, dst = _coo(g)
    s, d = src[edges], dst[edges]
    if relabel_nodes:
        nodes = np.unique(np.concatenate([s, d]))
        relabel = np.full((g.num_src_nodes(),), -1, dtype=np.int64)
        relabel[nodes] = np.arange(len(nodes))
        new = graph((relabel[s], relabel[d]), num_nodes=len(nodes),
                    pad_edges_to=pad_edges_to, formats=formats)
        new.ndata.update(_slice_rows(g.ndata, nodes))
        new.ndata["_ID"] = nodes.astype(np.int32)
    else:
        new = graph((s, d), num_nodes=g.num_src_nodes(),
                    pad_edges_to=pad_edges_to, formats=formats)
        new.ndata.update(g.ndata)
    if pad_edges_to is not None and pad_edges_to > len(edges):
        # Row-pad edge features by clip-gather so edata shapes stay static
        # (padded edges are masked out of every reduce via the csc/engine
        # edge masks).
        pad_ids = jnp.asarray(np.minimum(
            np.concatenate([edges,
                            np.zeros(pad_edges_to - len(edges), np.int64)]),
            max(len(np.asarray(g.edge_mask)) - 1, 0)))
        new.edata.update({k: jnp.take(v, pad_ids, axis=0, mode="clip")
                          for k, v in g.edata.items()})
    else:
        new.edata.update(_slice_rows(g.edata, edges))
    new.edata["_ID"] = edges.astype(np.int32)
    return new


def line_graph(g: Graph, backtracking: bool = True) -> Graph:
    """Line graph: nodes are edges of g; edge (e1->e2) iff dst(e1)==src(e2)
    (parity: ``dgl.line_graph``). ``backtracking=False`` drops pairs where
    e2 is the reverse of e1."""
    src, dst = _coo(g)
    e = len(src)
    # Group edges by their source node for fast successor lookup.
    order = np.argsort(src, kind="stable")
    sorted_src = src[order]
    starts = np.searchsorted(sorted_src, dst, side="left")
    ends = np.searchsorted(sorted_src, dst, side="right")
    counts = ends - starts
    e1 = np.repeat(np.arange(e), counts)
    flat = np.concatenate(
        [order[s:t] for s, t in zip(starts, ends)]
    ) if e else np.zeros((0,), dtype=np.int64)
    e2 = flat
    if not backtracking and e:
        keep = ~((dst[e2] == src[e1]) & (src[e2] == dst[e1]))
        e1, e2 = e1[keep], e2[keep]
    return graph((e1, e2), num_nodes=e)


def to_block_hetero(frontier, dst_nodes, include_dst_in_src: bool = True,
                    num_real_dst: Optional[dict] = None,
                    pad_src_to: Optional[dict] = None,
                    pad_edges_to: Optional[dict] = None,
                    formats=None,
                    uniform_k: Optional[dict] = None):
    """Hetero frontier -> bipartite hetero block with per-ntype compact ids.

    Parity: ``src/graph/transform/to_bipartite.cc :: ToBlock`` on
    heterographs — per node type, dst nodes get local ids [0, len(dst));
    the src side is the dst nodes (if included) followed by the remaining
    unique source endpoints across ALL relations of that srctype, in
    first-seen order (relations visited in canonical order, deterministic).

    Static-shape contract (TPU-native): ``dst_nodes``/``num_real_dst`` are
    per-ntype dicts; ``pad_src_to`` a per-ntype dict; ``pad_edges_to`` a
    per-canonical-etype dict. Every relation of the frontier emits a rel
    block even with zero sampled edges, so one XLA program serves every
    batch of an epoch. Real ids occupy a prefix per ntype;
    ``blk.meta['num_real_src'/'num_real_dst']`` record the prefix lengths.
    """
    from dgl1_tpu.heterograph import HeteroGraph

    dst_nodes = {nt: np.asarray(v).astype(np.int64)
                 for nt, v in dst_nodes.items()}
    num_real_dst = dict(num_real_dst or {})
    for nt, v in dst_nodes.items():
        num_real_dst.setdefault(nt, len(v))

    relabel_dst = {}
    relabel_src = {}
    src_ids = {}
    for nt in frontier.ntypes:
        n_parent = frontier.num_nodes(nt)
        relabel_src[nt] = np.full((n_parent,), -1, dtype=np.int64)
        if nt in dst_nodes:
            r = np.full((n_parent,), -1, dtype=np.int64)
            real = dst_nodes[nt][: num_real_dst[nt]]
            r[real] = np.arange(len(real))
            relabel_dst[nt] = r
            if include_dst_in_src:
                src_ids[nt] = real.copy()
                relabel_src[nt][real] = np.arange(len(real))
            else:
                src_ids[nt] = np.zeros((0,), dtype=np.int64)
        else:
            src_ids[nt] = np.zeros((0,), dtype=np.int64)

    # First pass: extend per-srctype id lists across relations (canonical
    # order => deterministic first-seen numbering).
    rel_edges = {}
    for c in frontier.canonical_etypes:
        st, _, dt = c
        rel = frontier.rel_graphs[c]
        e = rel.num_edges()
        src = np.asarray(rel.src)[:e].astype(np.int64)
        dst = np.asarray(rel.dst)[:e].astype(np.int64)
        if dt not in relabel_dst:
            if e:
                raise ValueError(
                    f"frontier has edges of type {c} but no dst seeds of "
                    f"type {dt!r}")
            rel_edges[c] = (src, dst)
            continue
        if e and np.any(relabel_dst[dt][dst] < 0):
            raise ValueError(
                f"frontier {c} contains an edge to a non-seed dst node")
        new_mask = relabel_src[st][src] < 0
        new_srcs = src[new_mask]
        if len(new_srcs):
            _, first = np.unique(new_srcs, return_index=True)
            uniq = new_srcs[np.sort(first)]
            relabel_src[st][uniq] = len(src_ids[st]) + np.arange(len(uniq))
            src_ids[st] = np.concatenate([src_ids[st], uniq])
        rel_edges[c] = (src, dst)

    num_src = {}
    for nt in frontier.ntypes:
        bound = (pad_src_to or {}).get(nt)
        if bound is not None and bound < len(src_ids[nt]):
            raise ValueError(
                f"pad_src_to[{nt!r}]={bound} smaller than actual src count "
                f"{len(src_ids[nt])}")
        num_src[nt] = int(bound) if bound is not None else len(src_ids[nt])

    rels = {}
    for c in frontier.canonical_etypes:
        st, _, dt = c
        src, dst = rel_edges[c]
        lsrc = relabel_src[st][src] if len(src) else src
        ldst = (relabel_dst[dt][dst] if dt in relabel_dst and len(dst)
                else dst)
        n_dst = len(dst_nodes.get(dt, ()))
        rels[c] = block(
            (lsrc, ldst),
            num_src_nodes=num_src[st],
            num_dst_nodes=n_dst,
            pad_edges_to=(pad_edges_to or {}).get(c),
            formats=formats,
            uniform_ell_k=(uniform_k or {}).get(c),
        )
        eid = frontier.rel_graphs[c].edata.get("_ID")
        if eid is not None:
            eid = np.asarray(eid)[: len(src)].astype(np.int32)
            pad_e = rels[c].num_edges_padded()
            if pad_e != len(eid):
                # Static leaf shape: the id map pads to the edge bound.
                eid = np.concatenate(
                    [eid, np.zeros((pad_e - len(eid),), np.int32)])
            rels[c].edata["_ID"] = eid

    src_frames = {}
    for nt in frontier.ntypes:
        arr = np.zeros((num_src[nt],), dtype=np.int32)
        arr[: len(src_ids[nt])] = src_ids[nt]
        src_frames[nt] = {"_ID": arr}
    dst_frames = {nt: {"_ID": v.astype(np.int32)}
                  for nt, v in dst_nodes.items()}
    blk = HeteroGraph(
        rels,
        {nt: len(v) for nt, v in dst_nodes.items()},
        node_frames=dst_frames,
        num_src_nodes_dict=num_src,
        src_node_frames=src_frames,
    )
    blk.meta["num_real_src"] = {nt: int(len(src_ids[nt]))
                                for nt in frontier.ntypes}
    blk.meta["num_real_dst"] = {nt: int(num_real_dst[nt])
                                for nt in dst_nodes}
    return blk


def to_block(frontier, dst_nodes, include_dst_in_src: bool = True,
             num_real_dst=None,
             pad_src_to=None,
             pad_edges_to=None,
             formats=None,
             uniform_k=None) -> Graph:
    """Convert a frontier graph (edges into seed nodes, in parent ids) to a
    bipartite message-flow block with compact local ids.

    Parity: ``src/graph/transform/to_bipartite.cc :: ToBlock`` — dst nodes
    get local ids [0, len(dst)); src side is dst (if included) followed by
    the remaining unique source endpoints, preserving first-seen order.
    Original parent ids are stored in ``srcdata['_ID']`` / ``dstdata['_ID']``.

    TPU-native static-shape contract: ``dst_nodes`` may carry a phantom
    tail — only the first ``num_real_dst`` entries are real seeds (the rest
    are padding from an inner block's ``pad_src_to``). ``pad_src_to`` /
    ``pad_edges_to`` emit a fixed-shape block so every mini-batch of an
    epoch reuses ONE compiled program. Real ids always occupy a prefix;
    ``meta['num_real_src']`` / ``meta['num_real_dst']`` record the prefix
    lengths.
    """
    import jax.numpy as jnp

    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(frontier, HeteroGraph):
        return to_block_hetero(frontier, dst_nodes, include_dst_in_src,
                               num_real_dst, pad_src_to, pad_edges_to,
                               formats, uniform_k)

    dst_nodes = np.asarray(dst_nodes).astype(np.int64)
    if num_real_dst is None:
        num_real_dst = len(dst_nodes)
    real_dst = dst_nodes[:num_real_dst]
    src, dst = _coo(frontier)

    relabel_dst = np.full((frontier.num_dst_nodes(),), -1, dtype=np.int64)
    relabel_dst[real_dst] = np.arange(num_real_dst)
    if np.any(relabel_dst[dst] < 0):
        raise ValueError("frontier contains an edge to a non-seed dst node")

    relabel_src = np.full((frontier.num_src_nodes(),), -1, dtype=np.int64)
    if include_dst_in_src:
        src_ids = real_dst.copy()
        relabel_src[real_dst] = np.arange(num_real_dst)
    else:
        src_ids = np.zeros((0,), dtype=np.int64)
    # Append new unique srcs in first-seen order (stable unique).
    new_mask = relabel_src[src] < 0
    new_srcs = src[new_mask]
    if len(new_srcs):
        _, first = np.unique(new_srcs, return_index=True)
        uniq = new_srcs[np.sort(first)]
        relabel_src[uniq] = len(src_ids) + np.arange(len(uniq))
        src_ids = np.concatenate([src_ids, uniq])

    num_src = int(pad_src_to) if pad_src_to is not None else len(src_ids)
    if num_src < len(src_ids):
        raise ValueError(
            f"pad_src_to={num_src} smaller than actual src count {len(src_ids)}"
        )
    b = block(
        (relabel_src[src], relabel_dst[dst]),
        num_src_nodes=num_src,
        num_dst_nodes=len(dst_nodes),
        pad_edges_to=pad_edges_to,
        formats=formats,
        uniform_ell_k=uniform_k,
    )
    src_id_arr = np.zeros((num_src,), dtype=np.int32)
    src_id_arr[: len(src_ids)] = src_ids
    # Host-side numpy on purpose: an eager jnp.asarray is a per-block
    # host->device transfer on the sampling hot path.
    b.srcdata["_ID"] = src_id_arr
    b.dstdata["_ID"] = dst_nodes.astype(np.int32)
    b.meta["num_real_src"] = int(len(src_ids))
    b.meta["num_real_dst"] = int(num_real_dst)
    return b


def compact_graphs(graphs):
    """Remove nodes isolated in *all* given graphs, relabeling consistently
    (parity: ``src/graph/transform/compact.cc``). Accepts one graph or a list;
    returns the same structure."""
    single = isinstance(graphs, Graph)
    gs = [graphs] if single else list(graphs)
    n = gs[0].num_nodes()
    used = np.zeros((n,), dtype=bool)
    for g in gs:
        src, dst = _coo(g)
        used[src] = True
        used[dst] = True
    out = [node_subgraph(g, used) for g in gs]
    return out[0] if single else out


def to_homogeneous(hg) -> Graph:
    """Flatten a heterograph into one homogeneous graph (parity:
    ``dgl.to_homogeneous``): node/edge type ids in ``ndata['_TYPE']`` /
    ``edata['_TYPE']``, per-type original ids in ``'_ID'``."""
    import jax.numpy as jnp

    ntypes = hg.ntypes
    offsets = {}
    off = 0
    for nt in ntypes:
        offsets[nt] = off
        off += hg.num_nodes(nt)
    total_nodes = off

    srcs, dsts, etype_ids, eids = [], [], [], []
    for i, c in enumerate(hg.canonical_etypes):
        st, _, dt = c
        rel = hg.rel_graphs[c]
        e = rel.num_edges()
        srcs.append(np.asarray(rel.src)[:e] + offsets[st])
        dsts.append(np.asarray(rel.dst)[:e] + offsets[dt])
        etype_ids.append(np.full(e, i, dtype=np.int32))
        eids.append(np.arange(e, dtype=np.int32))
    g = graph(
        (np.concatenate(srcs) if srcs else np.zeros(0, np.int64),
         np.concatenate(dsts) if dsts else np.zeros(0, np.int64)),
        num_nodes=total_nodes,
    )
    ntype_arr = np.concatenate(
        [np.full(hg.num_nodes(nt), i, dtype=np.int32)
         for i, nt in enumerate(ntypes)]
    )
    nid_arr = np.concatenate(
        [np.arange(hg.num_nodes(nt), dtype=np.int32) for nt in ntypes]
    )
    g.ndata["_TYPE"] = jnp.asarray(ntype_arr)
    g.ndata["_ID"] = jnp.asarray(nid_arr)
    g.edata["_TYPE"] = jnp.asarray(np.concatenate(etype_ids) if etype_ids
                                   else np.zeros(0, np.int32))
    g.edata["_ID"] = jnp.asarray(np.concatenate(eids) if eids
                                 else np.zeros(0, np.int32))
    return g


def to_heterogeneous(g: Graph, ntypes, etypes, metagraph=None):
    """Split a homogeneous graph carrying ``_TYPE`` annotations back into a
    heterograph (parity: ``dgl.to_heterogeneous``). ``metagraph`` maps
    etype-id -> (srctype, etype, dsttype); when None it is inferred from
    endpoint node types."""
    from dgl1_tpu.heterograph import HeteroGraph
    from dgl1_tpu.graph import block as _block

    ntype_arr = np.asarray(g.ndata["_TYPE"])
    nid_arr = np.asarray(g.ndata["_ID"])
    etype_arr = np.asarray(g.edata["_TYPE"])
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]

    counts = {nt: int((ntype_arr == i).sum())
              for i, nt in enumerate(ntypes)}
    rels = {}
    for j, et in enumerate(etypes):
        m = etype_arr == j
        if metagraph is not None:
            c = metagraph[j]
        else:
            if m.sum():
                st = ntypes[int(ntype_arr[src[m][0]])]
                dt = ntypes[int(ntype_arr[dst[m][0]])]
            else:
                st = dt = ntypes[0]
            c = (st, et, dt)
        rels[c] = _block(
            (nid_arr[src[m]], nid_arr[dst[m]]),
            num_src_nodes=counts[c[0]],
            num_dst_nodes=counts[c[2]],
        )
    return HeteroGraph(rels, counts)


def in_subgraph(g: Graph, nodes) -> Graph:
    """Subgraph of all edges whose destination is in ``nodes``; node set
    unchanged (parity: ``dgl.in_subgraph`` /
    ``src/graph/transform/in_out_subgraph.cc``)."""
    nodes = np.asarray(nodes)
    if nodes.dtype == bool:
        nodes = np.nonzero(nodes)[0]
    mask = np.zeros((g.num_nodes(),), dtype=bool)
    mask[nodes] = True
    _, dst = _coo(g)
    return edge_subgraph(g, np.nonzero(mask[dst])[0], relabel_nodes=False)


def out_subgraph(g: Graph, nodes) -> Graph:
    """Subgraph of all edges whose source is in ``nodes``; node set
    unchanged (parity: ``dgl.out_subgraph``)."""
    nodes = np.asarray(nodes)
    if nodes.dtype == bool:
        nodes = np.nonzero(nodes)[0]
    mask = np.zeros((g.num_nodes(),), dtype=bool)
    mask[nodes] = True
    src, _ = _coo(g)
    return edge_subgraph(g, np.nonzero(mask[src])[0], relabel_nodes=False)


def _pairwise_sq_dists(x, seg_ids=None):
    """(N, N) squared euclidean distances via one MXU matmul
    (|a|^2 + |b|^2 - 2ab); cross-segment pairs masked to +inf."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    sq = jnp.sum(x * x, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    if seg_ids is not None:
        same = seg_ids[:, None] == seg_ids[None, :]
        d2 = jnp.where(same, d2, jnp.inf)
    return d2


def knn_graph(x, k: int) -> Graph:
    """Graph where each point receives edges from its ``k`` nearest
    neighbors, self included (parity: ``dgl.knn_graph`` /
    ``python/dgl/transform.py :: knn_graph``). Distances are one dense
    MXU matmul — the TPU-native formulation of kNN."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    if x.ndim == 3:  # (B, N, D) batched point clouds, reference-compatible
        b, n, _ = x.shape
        seg = jnp.repeat(jnp.arange(b), n)
        return segmented_knn_graph(
            x.reshape(b * n, -1), k, np.full((b,), n, dtype=np.int64)
        )
    n = x.shape[0]
    d2 = _pairwise_sq_dists(x)
    _, nbr = jax.lax.top_k(-d2, min(k, n))  # (N, k) nearest columns
    dst = np.repeat(np.arange(n, dtype=np.int64), min(k, n))
    src = np.asarray(nbr).reshape(-1).astype(np.int64)
    return graph((src, dst), num_nodes=n)


def segmented_knn_graph(x, k: int, segs) -> Graph:
    """kNN graph within each segment of a packed point set (parity:
    ``dgl.segmented_knn_graph``). ``segs``: per-segment point counts."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x)
    segs = np.asarray(segs, dtype=np.int64)
    n = x.shape[0]
    assert int(segs.sum()) == n
    seg_ids = jnp.asarray(np.repeat(np.arange(len(segs)), segs))
    d2 = _pairwise_sq_dists(x, seg_ids=seg_ids)
    kk = min(k, int(segs.min()))
    _, nbr = jax.lax.top_k(-d2, kk)
    dst = np.repeat(np.arange(n, dtype=np.int64), kk)
    src = np.asarray(nbr).reshape(-1).astype(np.int64)
    return graph((src, dst), num_nodes=n)


def metapath_reachable_graph(hg, metapath) -> Graph:
    """Graph between the start and end node types of ``metapath`` with an
    edge wherever a path exists along the relation chain (parity:
    ``dgl.metapath_reachable_graph``). Adjacency chain product on the host
    (scipy.sparse); features of the end types are carried over."""
    import scipy.sparse as sp

    canon = [hg.to_canonical_etype(et) for et in metapath]
    for a, b in zip(canon[:-1], canon[1:]):
        if a[2] != b[0]:
            raise ValueError(f"metapath breaks between {a} and {b}")
    adj = None
    for c in canon:
        rel = hg.rel_graphs[c]
        e = rel.num_edges()
        s = np.asarray(rel.src)[:e]
        d = np.asarray(rel.dst)[:e]
        m = sp.csr_matrix(
            (np.ones(e, dtype=np.int8), (s, d)),
            shape=(hg.num_nodes(c[0]), hg.num_nodes(c[2])),
        )
        adj = m if adj is None else (adj @ m)
        adj.data[:] = 1  # reachability, not path counts
    coo = adj.tocoo()
    srctype, dsttype = canon[0][0], canon[-1][2]
    if srctype == dsttype:
        new = graph((coo.row.astype(np.int64), coo.col.astype(np.int64)),
                    num_nodes=hg.num_nodes(srctype))
        new.ndata.update(hg.nodes_data(srctype))
        return new
    from dgl1_tpu.graph import block as _block

    new = _block((coo.row.astype(np.int64), coo.col.astype(np.int64)),
                 num_src_nodes=hg.num_nodes(srctype),
                 num_dst_nodes=hg.num_nodes(dsttype))
    new.srcdata.update(hg.nodes_data(srctype))
    new.dstdata.update(hg.nodes_data(dsttype))
    return new


def laplacian_lambda_max(g: Graph):
    """Largest eigenvalue of the symmetric-normalized Laplacian per graph
    in the batch (parity: ``dgl.laplacian_lambda_max``; feeds ChebConv).
    Host-side scipy — an offline preprocessing quantity."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from dgl1_tpu.batch import unbatch

    graphs = [g]
    if getattr(g, "_batch_num_nodes", None) is not None:
        graphs = unbatch(g)
    out = []
    for sub in graphs:
        n = sub.num_nodes()
        src, dst = _coo(sub)
        adj = sp.csr_matrix(
            (np.ones(len(src)), (src, dst)), shape=(n, n)
        )
        deg = np.asarray(adj.sum(axis=1)).ravel()
        with np.errstate(divide="ignore"):
            inv_sqrt = np.where(deg > 0, deg ** -0.5, 0.0)
        dmat = sp.diags(inv_sqrt)
        lap = sp.eye(n) - dmat @ adj @ dmat
        if n <= 64:
            val = float(np.linalg.eigvals(lap.toarray()).real.max())
        else:
            val = float(
                spla.eigs(lap, k=1, which="LM", return_eigenvectors=False,
                          tol=1e-6).real[0]
            )
        out.append(val)
    return out


def add_edges(g: Graph, src, dst, data: Optional[dict] = None) -> Graph:
    """Return a new graph with edges appended (parity: ``dgl.add_edges``;
    functional — our graphs are immutable pytrees). Existing edata keys
    are zero-padded for the new edges unless ``data`` provides values."""
    import jax.numpy as jnp

    s0, d0 = _coo(g)
    src = np.atleast_1d(np.asarray(src, dtype=np.int64))
    dst = np.atleast_1d(np.asarray(dst, dtype=np.int64))
    new = graph((np.concatenate([s0, src]), np.concatenate([d0, dst])),
                num_nodes=g.num_nodes())
    new.ndata.update(g.ndata)
    keys = set(g.edata) | set(data or {})
    for k in keys:
        old = g.edata.get(k)
        if old is not None:
            old = old[: g.num_edges()]
        if data is not None and k in data:
            extra = jnp.asarray(data[k])
        else:
            extra = jnp.zeros((len(src),) + tuple(old.shape[1:]), old.dtype)
        if old is None:
            old = jnp.zeros((g.num_edges(),) + tuple(extra.shape[1:]),
                            extra.dtype)
        new.edata[k] = jnp.concatenate([old, extra], axis=0)
    return new


def remove_edges(g: Graph, eids) -> Graph:
    """Return a new graph without the given edge ids (parity:
    ``dgl.remove_edges``). Node set unchanged; edata sliced."""
    eids = np.atleast_1d(np.asarray(eids, dtype=np.int64))
    e = g.num_edges()
    keep = np.ones((e,), dtype=bool)
    keep[eids] = False
    src, dst = _coo(g)
    new = graph((src[keep], dst[keep]), num_nodes=g.num_nodes())
    new.ndata.update(g.ndata)
    if g.edata:
        new.edata.update(_slice_rows(g.edata, np.nonzero(keep)[0]))
    return new


def add_nodes(g: Graph, num: int, data: Optional[dict] = None) -> Graph:
    """Return a new graph with ``num`` extra isolated nodes (parity:
    ``dgl.add_nodes``). Existing ndata keys are zero-padded unless
    ``data`` provides values."""
    import jax.numpy as jnp

    src, dst = _coo(g)
    n = g.num_nodes()
    new = graph((src, dst), num_nodes=n + int(num))
    new.edata.update(g.edata)
    keys = set(g.ndata) | set(data or {})
    for k in keys:
        old = g.ndata.get(k)
        if data is not None and k in data:
            extra = jnp.asarray(data[k])
        else:
            extra = jnp.zeros((int(num),) + tuple(old.shape[1:]), old.dtype)
        if old is None:
            old = jnp.zeros((n,) + tuple(extra.shape[1:]), extra.dtype)
        new.ndata[k] = jnp.concatenate([old, extra], axis=0)
    return new


def remove_nodes(g: Graph, nids) -> Graph:
    """Return the induced subgraph on the complement of ``nids``
    (parity: ``dgl.remove_nodes`` — remaining nodes are relabeled
    contiguously, like the reference)."""
    nids = np.atleast_1d(np.asarray(nids, dtype=np.int64))
    keep = np.ones((g.num_nodes(),), dtype=bool)
    keep[nids] = False
    return node_subgraph(g, np.nonzero(keep)[0])


def typed_subgraphs(g: Graph, etypes, num_rels: int,
                    identity: bool = False):
    """Split a homogeneous graph with edge types into one edge-induced
    subgraph per relation, all sharing the parent's node space.

    TPU-native enabler for R-GCN (parity target:
    ``python/dgl/nn/pytorch/conv/relgraphconv.py``'s ``low_mem`` path):
    the reference projects per-EDGE (``h[src] @ W[etype]``, a gathered
    (E, F) tensor); on TPU that per-edge tensor is the whole cost, so
    ``RelGraphConv(..., rel_graphs=typed_subgraphs(g, et, R))`` instead
    runs one project + one hub/ELL SpMM per relation — no per-edge
    feature tensor exists at any point. ``etypes`` is host data (numpy);
    the split is static preprocessing, like every other graph format.

    ``identity=True`` (the identity-rate typed path, VERDICT r4 #2):
    relabels nodes hub-first by TOTAL degree, then builds every
    relation's hub layout with the PARENT graph's pinned geometry —
    hub slots = ids [0, NG*128) and tail stack rows in id order under
    the parent's bucket meta (``hub_format.build_hub_format
    identity_force``). Every relation then claims ``identity_expand``
    (per-relation degree-sorted layouts structurally cannot share one
    merge-order numbering — a dst is a hub in one relation and a tail
    row in another; pinning the GLOBAL order and letting phantom
    slots/rows absorb each relation's gaps dissolves the conflict).
    Returns ``(rel_graphs, perm)`` with ``perm[new] = old`` — apply to
    every node-aligned array, like :func:`reorder_graph`. Measured:
    R-GCN mag-scale 23.8 -> ~18 ms/epoch (the full expand ablation
    bound; PERF_NOTES r6).
    """
    etypes = np.asarray(etypes)
    e = g.num_edges()
    etypes = etypes[:e]
    if not identity:
        return tuple(
            edge_subgraph(g, np.nonzero(etypes == r)[0],
                          relabel_nodes=False)
            for r in range(int(num_rels))
        )

    from dgl1_tpu import hub_format as hf
    from dgl1_tpu.graph import _build_ell

    g2 = (reorder_graph(g, node_permute_algo="hub")
          if g.hub_dst is not None else g)
    if g2.hub_dst_meta is None or not g2.hub_dst_meta.identity_expand:
        import warnings

        warnings.warn(
            "typed_subgraphs(identity=True): the parent graph has no "
            "identity hub layout — returning plain per-relation "
            "subgraphs (descriptor expand).", stacklevel=2)
        perm = np.arange(g.num_nodes(), dtype=np.int64)
        return typed_subgraphs(g, etypes, num_rels), perm
    perm = np.asarray(g2.ndata["_ID"], np.int64)
    eperm = np.asarray(g2.edata["_ID"], np.int64)
    et2 = etypes[eperm]
    m = g2.hub_dst_meta
    n = g2.num_nodes()
    src2, dst2 = _coo(g2)

    # Re-bucket the pinned tail meta from the MAX-OVER-RELATIONS
    # per-row degree (positions stay id order; any meta whose per-row
    # capacity >= every relation's degree is valid). The parent's own
    # meta is sized for TOTAL degrees (~R x too wide) and carries ~4
    # buckets — and each ELL bucket is a separate ~0.2 ms gather
    # launch per relation per layer, which measured LARGER than the
    # expand saving it bought (PERF_NOTES r6). Two buckets, tuned
    # widths.
    from dgl1_tpu.graph import _ladder_rung

    k_slots0 = m.n_groups * 128
    n_tail_p = int(m.n_tail_rows)
    tail_meta = tuple(m.tail_meta_dst)
    if n_tail_p > 0:
        caps = np.zeros((n_tail_p,), np.int64)
        for r in range(int(num_rels)):
            mask_r = et2 == r
            d_r = dst2[mask_r]
            d_r = d_r[(d_r >= k_slots0) & (d_r < k_slots0 + n_tail_p)]
            cnt = np.bincount(d_r - k_slots0, minlength=n_tail_p)
            np.maximum(caps, cnt, out=caps)
        rungs = np.array([_ladder_rung(int(c)) if c else 1
                          for c in caps], np.int64)
        # Parent bucket boundaries with widths shrunk to the relation
        # caps (measured-optimal on the mag-scale bench: shrink-only
        # 20.0 ms vs 2-bucket merge 21.1 / 1-bucket 27.2 — slot volume
        # beats launch count here). DGL1_TPU_TYPED_TAIL_BUCKETS merges
        # down further for launch-bound cases.
        bounds = np.cumsum([0] + [nb for _, nb in tail_meta])
        segs = [(int(rungs[a:b].max(initial=1)), int(b - a))
                for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        import os as _os
        _nb = int(_os.environ.get("DGL1_TPU_TYPED_TAIL_BUCKETS",
                                  str(len(segs))))
        while len(segs) > _nb:
            costs = [max(segs[i][0], segs[i + 1][0])
                     * (segs[i][1] + segs[i + 1][1])
                     - segs[i][0] * segs[i][1]
                     - segs[i + 1][0] * segs[i + 1][1]
                     for i in range(len(segs) - 1)]
            i = int(np.argmin(costs))
            segs[i: i + 2] = [(max(segs[i][0], segs[i + 1][0]),
                               segs[i][1] + segs[i + 1][1])]
        tail_meta = tuple(segs)
    ident = {"n_groups": m.n_groups, "n_dense": m.n_dense,
             "tail_meta_dst": tail_meta}
    out = []
    for r in range(int(num_rels)):
        mask = et2 == r
        s_r, d_r = src2[mask], dst2[mask]
        gr = graph((s_r, d_r), num_nodes=n, hub=False,
                   formats=("coo", "csr", "csc", "ell"))
        mr, ar = hf.build_hub_format(
            np.asarray(gr.csc_indptr), np.asarray(gr.csc_src),
            np.asarray(gr.csc_eid), np.asarray(gr.csc_dst),
            n, n, len(s_r), gr.num_edges_padded(), _build_ell,
            identity_force=ident)
        assert mr is not None and mr.identity_expand, (
            "identity_force build must produce an identity layout")
        gr.hub_dst_meta = mr
        import jax
        import jax.numpy as jnp

        gr.hub_dst = jax.tree.map(jnp.asarray, ar)
        out.append(gr)
    return tuple(out), perm


def typed_union_graph(g: Graph, etypes, num_rels: int,
                      hub=None, hub_dense_floor=None,
                      relabel: bool = True):
    """Typed aggregation as ONE bipartite hub SpMM (the identity-rate
    typed path, VERDICT r4 #2).

    ``out[d] = sum_r sum_{(s->d) in r} Z_r[s]`` is exactly a homogeneous
    copy_u+sum over a RELATION-STACKED source space: src' = etype *
    num_nodes + src, dst unchanged, features Z = stack_r(X @ W_r)
    reshaped to (R * N, F). One hub layout over the union graph then
    replaces ``num_rels`` per-relation SpMMs — and because the
    destination space is untouched by the source stacking, the ordinary
    hub-first relabel applies and the engine's identity-expand fused-pad
    forward holds, which per-relation layouts structurally cannot do
    (a dst is a hub in one relation and a tail row in another, so no
    single numbering puts every relation's merge order in node order;
    stacking relations into the SOURCE axis dissolves the conflict).
    This is also the reference's design realized TPU-native: typed
    edges run through the SAME kernels as untyped ones with per-etype
    projected features (``python/dgl/nn/pytorch/conv/relgraphconv.py``
    segment-matmul + gspmm, SURVEY §2.2).

    Returns ``(gu, perm)``: a bipartite block graph with
    ``num_src_nodes = num_rels * N`` and, when ``relabel=True``, node
    ids renumbered hub-first (``perm[new] = old``; apply it to every
    node-aligned array — features, labels, masks — exactly like
    ``reorder_graph``). Feed to ``RelGraphConv(union_graph=gu)``.
    """
    from dgl1_tpu.graph import Graph as _G, _build_formats

    etypes = np.asarray(etypes, np.int64)
    e = g.num_edges()
    etypes = etypes[:e]
    src, dst = (np.asarray(a)[:e].astype(np.int64) for a in g.edges())
    n = g.num_nodes()
    r_n = int(num_rels) * n

    def build(s2, d2):
        arrays = _build_formats(
            s2, d2, r_n, n, e, e, hub=hub,
            hub_dense_floor=hub_dense_floor,
            formats=("coo", "csr", "csc", "ell", "hub"))
        return _G(**arrays, num_src_nodes=r_n, num_dst_nodes=n,
                  num_edges=e, is_block=True)

    perm = np.arange(n, dtype=np.int64)
    src_u = etypes * n + src
    gu = build(src_u, dst)
    if relabel and gu.hub_dst is not None:
        from dgl1_tpu.hub_format import hub_order

        perm = hub_order(gu)
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        gu = build(etypes * n + inv[src], inv[dst])
        if (gu.hub_dst_meta is not None
                and not gu.hub_dst_meta.identity_expand):
            import warnings

            warnings.warn(
                "typed_union_graph: hub-first relabel did not produce "
                "an identity layout (pathological hub-group tie); the "
                "descriptor expand stays — correctness unaffected.",
                stacklevel=2)
    return gu, perm


def laplacian_pe(g: Graph, k: int, padding: bool = False):
    """Laplacian positional encoding (parity: ``dgl.laplacian_pe`` /
    ``python/dgl/transforms/functional.py``): the k non-trivial smallest
    eigenvectors of the symmetric-normalized Laplacian, sign-randomized
    by convention left to the caller (returned raw here, deterministic).

    Host-side (offline preprocessing quantity, like
    :func:`laplacian_lambda_max`). ``padding=True`` zero-pads when the
    graph has fewer than ``k + 1`` nodes.
    """
    import jax.numpy as jnp
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    n = g.num_nodes()
    if not padding and n <= k:
        raise ValueError(f"need num_nodes > k, got {n} <= {k}")
    src, dst = _coo(g)
    A = sp.coo_matrix((np.ones(len(src)), (dst, src)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)  # undirected, simple
    deg = np.asarray(A.sum(1)).ravel()
    with np.errstate(divide="ignore"):  # isolated nodes: masked anyway
        dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    L = sp.eye(n) - sp.diags(dinv) @ A @ sp.diags(dinv)
    kk = min(k + 1, n)
    if n < 40 or kk >= n - 1:
        w, v = np.linalg.eigh(L.toarray())
    else:
        w, v = spla.eigsh(L.tocsc(), k=kk, which="SM", tol=1e-6)
    order = np.argsort(w)
    v = v[:, order[1:kk]]  # drop the trivial eigenvector
    if v.shape[1] < k:
        v = np.pad(v, ((0, 0), (0, k - v.shape[1])))
    return jnp.asarray(v[:, :k].astype(np.float32))


def random_walk_pe(g: Graph, k: int, eweight_name: Optional[str] = None):
    """Random-walk positional encoding (parity: ``dgl.random_walk_pe``):
    ``PE[i, j] = (RW^(j+1))_{ii}`` for the row-normalized random-walk
    matrix, j = 0..k-1. Host-side scipy (offline preprocessing)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    n = g.num_nodes()
    src, dst = _coo(g)
    w = (np.asarray(g.edata[eweight_name], np.float64)[: len(src)]
         if eweight_name else np.ones(len(src)))
    A = sp.coo_matrix((w, (src, dst)), shape=(n, n)).tocsr()
    deg = np.asarray(A.sum(1)).ravel()
    dinv = np.where(deg > 0, 1.0 / deg, 0.0)
    RW = sp.diags(dinv) @ A  # row-normalized: walk src -> dst
    pe = np.zeros((n, k))
    M = RW.copy()
    for j in range(k):
        pe[:, j] = M.diagonal()
        if j + 1 < k:
            M = M @ RW
    return jnp.asarray(pe.astype(np.float32))


def shortest_dist(g: Graph, root=None, return_paths: bool = False):
    """All-pairs (or single-source) unweighted shortest distances
    (parity: ``dgl.shortest_dist``; used by graph-transformer distance
    encodings). Host-side BFS via scipy.sparse.csgraph; unreachable
    pairs get -1. ``return_paths`` additionally returns per-pair edge-id
    paths padded with -1 (root mode only, parity subset)."""
    import numpy as np
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import shortest_path

    n = g.num_nodes()
    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    adj = csr_matrix((np.ones(e), (src, dst)), shape=(n, n))
    import jax.numpy as jnp

    if root is None:
        d = shortest_path(adj, method="D", unweighted=True)
        out = np.where(np.isinf(d), -1, d).astype(np.int64)
        if return_paths:
            raise NotImplementedError(
                "return_paths requires a root (parity subset)")
        return jnp.asarray(out)
    d, pred = shortest_path(adj, method="D", unweighted=True,
                            indices=int(root), return_predecessors=True)
    dist = np.where(np.isinf(d), -1, d).astype(np.int64)
    if not return_paths:
        return jnp.asarray(dist)
    # Edge-id lookup for (u, v) pairs on the predecessor tree.
    eid_of = {}
    for i in range(e):
        eid_of.setdefault((int(src[i]), int(dst[i])), i)
    max_len = max(int(dist.max(initial=0)), 1)
    paths = np.full((n, max_len), -1, np.int64)
    for v in range(n):
        if dist[v] <= 0:
            continue
        cur = v
        hops = []
        while pred[cur] >= 0:
            hops.append(eid_of[(int(pred[cur]), int(cur))])
            cur = int(pred[cur])
        paths[v, : len(hops)] = hops[::-1]
    return jnp.asarray(dist), jnp.asarray(paths)


def merge(graphs):
    """Merge graphs over a shared node space: node count = max, edges =
    concatenation, edge data concatenated per key (parity:
    ``dgl.merge``). Node data comes from the FIRST graph carrying each
    key (the reference's precedence)."""
    import numpy as np

    n = max(g.num_nodes() for g in graphs)
    srcs, dsts = [], []
    for g in graphs:
        e = g.num_edges()
        srcs.append(np.asarray(g.src)[:e])
        dsts.append(np.asarray(g.dst)[:e])
    out = graph((np.concatenate(srcs), np.concatenate(dsts)),
                num_nodes=n)
    import jax.numpy as jnp

    for g in graphs:
        for k, v in g.ndata.items():
            if k in out.ndata:
                continue
            if v.shape[0] == n:
                out.ndata[k] = v
            else:
                # Shorter node-data tensors (a smaller member graph) are
                # zero-filled up to the merged node count instead of being
                # silently dropped (the reference materializes every key).
                v = jnp.asarray(v)
                out.ndata[k] = jnp.concatenate(
                    [v, jnp.zeros((n - v.shape[0],) + v.shape[1:],
                                  v.dtype)], axis=0)
    keys = set()
    for g in graphs:
        keys |= set(g.edata.keys())
    for k in sorted(keys):
        # Graphs missing the key contribute zero rows for their edges
        # (the reference zero-fills via the frame scheme rather than
        # dropping the key).
        ref = next(jnp.asarray(g.edata[k]) for g in graphs
                   if k in g.edata)
        vals = []
        for g in graphs:
            e = g.num_edges()
            if k in g.edata:
                vals.append(jnp.asarray(g.edata[k])[:e])
            else:
                vals.append(jnp.zeros((e,) + ref.shape[1:], ref.dtype))
        cat = jnp.concatenate(vals, axis=0)
        pad = out.num_edges_padded() - cat.shape[0]
        if pad:
            cat = jnp.concatenate(
                [cat, jnp.zeros((pad,) + cat.shape[1:], cat.dtype)])
        out.edata[k] = cat
    return out
