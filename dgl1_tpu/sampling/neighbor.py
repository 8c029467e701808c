"""Neighbor sampling (host-side, vectorized numpy).

Parity: ``src/graph/sampling/neighbor/neighbor.cc :: SampleNeighbors`` +
``src/array/cpu/rowwise_sampling.cc`` (per-row uniform pick with/without
replacement) and the Python wrapper ``python/dgl/sampling/neighbor.py``.

TPU-native: sampling is a host (CPU) producer — the device only ever sees
the static-shape padded blocks built from these frontiers (see
``dgl1_tpu.dataloading``). Without-replacement sampling is vectorized as
"assign a random key per candidate edge, keep the k smallest keys per
seed" (one lexsort, no Python loop over seeds — the numpy replacement for
the reference's OpenMP row loop).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu import random as dgl_random

from dgl1_tpu.graph import Graph, graph

__all__ = ["sample_neighbors", "sample_neighbors_arrays"]


def _ranges(starts: np.ndarray, degs: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+d) ranges without a Python loop over rows."""
    total = int(degs.sum())
    if total == 0:
        return np.zeros((0,), dtype=np.int64)
    off = np.repeat(np.cumsum(degs) - degs, degs)
    return np.repeat(starts, degs) + (np.arange(total) - off)


def _csc_arrays(g: Graph):
    return (
        np.asarray(g.csc_indptr),
        np.asarray(g.csc_src),
        np.asarray(g.csc_eid),
    )


def sample_neighbors_arrays(
    indptr: np.ndarray,
    nbr: np.ndarray,
    eid: Optional[np.ndarray],
    seeds: np.ndarray,
    fanout: int,
    replace: bool = False,
    rng: Optional[np.random.Generator] = None,
    prob: Optional[np.ndarray] = None,
):
    """Row-wise sampling on raw CSR/CSC arrays.

    Returns (nbr_sampled, seed_index_per_sample, eid_sampled). Raw-array
    form so the distributed sampler can reuse it on partition-local CSCs.
    """
    rng = rng or dgl_random.default_rng()
    seeds = np.asarray(seeds, dtype=np.int64)
    starts = indptr[seeds].astype(np.int64)
    degs = (indptr[seeds + 1] - indptr[seeds]).astype(np.int64)

    if fanout < 0:
        # Full neighborhood (fanout=-1, parity with the reference).
        seed_idx = np.repeat(np.arange(len(seeds)), degs)
        picked = _ranges(starts, degs)
    elif replace:
        k = fanout
        valid = degs > 0
        r = rng.random((len(seeds), k))
        idx = np.floor(r * np.maximum(degs, 1)[:, None]).astype(np.int64)
        picked = (starts[:, None] + idx)[valid].reshape(-1)
        seed_idx = np.repeat(np.arange(len(seeds))[valid], k)
    else:
        k = fanout
        counts = np.minimum(degs, k)
        # Candidate edges of all seeds, flattened (vectorized ragged fill).
        seed_of_cand = np.repeat(np.arange(len(seeds)), degs)
        cand = _ranges(starts, degs)
        if prob is not None:
            # Weighted without replacement: Efraimidis-Spirakis keys
            # u^(1/w) — take the k largest <=> smallest -log(u)/w.
            w = np.maximum(prob[eid[cand] if eid is not None else cand], 1e-30)
            key = -np.log(np.maximum(rng.random(cand.shape), 1e-300)) / w
        else:
            key = rng.random(cand.shape)
        order = np.lexsort((key, seed_of_cand))
        sorted_seed = seed_of_cand[order]
        seg_start = np.searchsorted(sorted_seed, np.arange(len(seeds)))
        pos = np.arange(len(cand)) - seg_start[sorted_seed]
        keep = pos < counts[sorted_seed]
        picked = cand[order][keep]
        seed_idx = sorted_seed[keep]

    nbr_s = nbr[picked]
    eid_s = eid[picked] if eid is not None else picked
    return nbr_s, seed_idx, eid_s


def _etype_fanout(fanout, canonical):
    """Resolve an int-or-dict fanout for one canonical etype (parity: the
    reference's per-etype fanout dict, ``neighbor.cc :: SampleNeighbors``)."""
    if isinstance(fanout, dict):
        if canonical in fanout:
            return int(fanout[canonical])
        if canonical[1] in fanout:
            return int(fanout[canonical[1]])
        raise KeyError(f"fanout dict has no entry for etype {canonical!r}")
    return int(fanout)


def _sample_neighbors_hetero(hg, nodes, fanout, prob, replace, rng, formats,
                             edge_dir: str = "in"):
    """Per-etype sampling on a HeteroGraph: for each relation (st, et, dt),
    sample up to fanout[et] in-edges of the dt-type seed nodes (or, with
    ``edge_dir='out'``, out-edges of the st-type seeds through the CSR
    layout). Returns a hetero frontier in the parent node spaces with
    per-etype ``edata['_ID']``. Parity: ``dgl.sampling.sample_neighbors``
    on heterographs (SURVEY.md §2.1 neighbor-sampling row)."""
    from dgl1_tpu.graph import block as _block
    from dgl1_tpu.heterograph import HeteroGraph

    rng = rng or dgl_random.default_rng()
    if not isinstance(nodes, dict):
        if len(hg.ntypes) != 1:
            raise ValueError("nodes must be a {ntype: ids} dict on a "
                             "multi-ntype heterograph")
        nodes = {hg.ntypes[0]: nodes}
    nodes = {nt: np.asarray(v, dtype=np.int64) for nt, v in nodes.items()}
    counts = {nt: hg.num_nodes(nt) for nt in hg.ntypes}
    rels = {}
    for c in hg.canonical_etypes:
        st, _, dt = c
        rel = hg.rel_graphs[c]
        seeds = nodes.get(dt if edge_dir == "in" else st)
        k = _etype_fanout(fanout, c)
        if seeds is None or len(seeds) == 0 or k == 0:
            fr = _block((np.zeros(0, np.int64), np.zeros(0, np.int64)),
                        num_src_nodes=counts[st], num_dst_nodes=counts[dt],
                        formats=formats or ("coo",))
            fr.edata["_ID"] = np.zeros((0,), np.int32)
            rels[c] = fr
            continue
        p = None
        if prob is not None and prob in rel.edata:
            p = np.asarray(rel.edata[prob]).reshape(-1)
        if edge_dir == "in":
            nbr, seed_idx, eids = sample_neighbors_arrays(
                np.asarray(rel.csc_indptr), np.asarray(rel.csc_src),
                np.asarray(rel.csc_eid), seeds, k, replace, rng, p,
            )
            edges = (nbr, seeds[seed_idx])
        else:
            nbr, seed_idx, eids = sample_neighbors_arrays(
                np.asarray(rel.csr_indptr), np.asarray(rel.csr_dst),
                np.asarray(rel.csr_eid), seeds, k, replace, rng, p,
            )
            edges = (seeds[seed_idx], nbr)
        fr = _block(edges,
                    num_src_nodes=counts[st], num_dst_nodes=counts[dt],
                    formats=formats or ("coo",))
        fr.edata["_ID"] = eids.astype(np.int32)
        rels[c] = fr
    return HeteroGraph(rels, counts)


def sample_neighbors(
    g,
    nodes,
    fanout,
    edge_dir: str = "in",
    prob: Optional[str] = None,
    replace: bool = False,
    rng: Optional[np.random.Generator] = None,
    formats=None,
):
    """Sample up to ``fanout`` in-edges (or out-edges) per seed node.

    Returns a frontier graph in the parent node space whose edges are the
    sampled ones; original edge ids are in ``edata['_ID']``.
    Parity: ``dgl.sampling.sample_neighbors``.

    Heterograph form: ``g`` a HeteroGraph, ``nodes`` a ``{ntype: ids}``
    dict, ``fanout`` an int or a per-etype dict (keyed by etype name or
    canonical 3-tuple) — parity with the reference's per-etype fanout
    (``src/graph/sampling/neighbor/neighbor.cc``).

    ``formats``: restrict the frontier's derived layouts (see
    ``dgl.graph``). The block pipeline passes ``("coo",)`` — ``to_block``
    only reads the edge list, and the ELL/tile builds were ~half the
    host sampling cost per batch.
    """
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(g, HeteroGraph):
        if edge_dir not in ("in", "out"):
            raise ValueError("edge_dir must be 'in' or 'out'")
        return _sample_neighbors_hetero(g, nodes, fanout, prob, replace,
                                        rng, formats, edge_dir)
    if edge_dir == "out":
        rev = sample_neighbors(
            g.reverse(copy_edata=False), nodes, fanout, "in", prob, replace,
            rng, formats=formats,
        )
        out = rev.reverse(copy_edata=True)
        return out
    if edge_dir != "in":
        raise ValueError("edge_dir must be 'in' or 'out'")

    indptr, src_arr, eid_arr = _csc_arrays(g)
    p = None
    if prob is not None:
        p = np.asarray(g.edata[prob]).reshape(-1)
    nodes = np.asarray(nodes, dtype=np.int64)
    nbr, seed_idx, eids = sample_neighbors_arrays(
        indptr, src_arr, eid_arr, nodes, fanout, replace, rng, p
    )
    dst = nodes[seed_idx]
    frontier = graph((nbr, dst), num_nodes=g.num_src_nodes(),
                     formats=formats)
    # Host-side numpy on purpose (sampling hot path; see fused.py note).
    frontier.edata["_ID"] = eids.astype(np.int32)
    return frontier


def select_topk(g, k: int, weight: str, nodes=None, edge_dir: str = "in",
                ascending: bool = False):
    """Subgraph keeping each node's top-k in-edges (or out-edges with
    ``edge_dir='out'``) by ``edata[weight]`` (parity:
    ``dgl.sampling.select_topk``). Host-side preprocessing like the
    samplers; returns an edge-induced subgraph in the parent's node space
    with ``edata['_ID']``."""
    import numpy as np

    from dgl1_tpu.transform import edge_subgraph

    if edge_dir == "out":
        indptr = np.asarray(g.csr_indptr)
        eid = np.asarray(g.csr_eid)
        num_rows = g.num_src_nodes()
    elif edge_dir == "in":
        indptr = np.asarray(g.csc_indptr)
        eid = np.asarray(g.csc_eid)
        num_rows = g.num_dst_nodes()
    else:
        raise ValueError("edge_dir must be 'in' or 'out'")
    w = np.asarray(g.edata[weight]).reshape(-1)[: g.num_edges()]
    if nodes is None:
        nodes = np.arange(num_rows)
    nodes = np.asarray(nodes, dtype=np.int64)
    # Vectorized per-row top-k: one lexsort of the selected rows' edges
    # by (row, weight), then keep each row's first/last k by rank — no
    # per-node Python loop (PinSAGE-style pipelines call this per
    # batch).
    counts = (indptr[nodes + 1] - indptr[nodes]).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return edge_subgraph(g, np.zeros((0,), np.int64),
                             relabel_nodes=False)
    owner = np.repeat(np.arange(len(nodes)), counts)
    flat = (np.repeat(indptr[nodes], counts)
            + (np.arange(total)
               - np.repeat(np.cumsum(counts) - counts, counts)))
    ids = eid[flat].astype(np.int64)
    order = np.lexsort((w[ids], owner))
    rank = np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                        counts)
    sel = rank < k if ascending else rank >= counts[owner] - k
    keep = ids[order][sel]
    return edge_subgraph(g, np.sort(keep), relabel_nodes=False)
