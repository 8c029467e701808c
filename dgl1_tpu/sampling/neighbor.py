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
        total = int(degs.sum())
        seed_idx = np.repeat(np.arange(len(seeds)), degs)
        flat = np.concatenate(
            [np.arange(s, s + d) for s, d in zip(starts, degs)]
        ) if total else np.zeros((0,), dtype=np.int64)
        picked = flat
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
        # Candidate edges of all seeds, flattened.
        seed_of_cand = np.repeat(np.arange(len(seeds)), degs)
        cand = np.concatenate(
            [np.arange(s, s + d) for s, d in zip(starts, degs)]
        ) if degs.sum() else np.zeros((0,), dtype=np.int64)
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


def sample_neighbors(
    g: Graph,
    nodes,
    fanout: int,
    edge_dir: str = "in",
    prob: Optional[str] = None,
    replace: bool = False,
    rng: Optional[np.random.Generator] = None,
    formats=None,
) -> Graph:
    """Sample up to ``fanout`` in-edges (or out-edges) per seed node.

    Returns a frontier graph in the parent node space whose edges are the
    sampled ones; original edge ids are in ``edata['_ID']``.
    Parity: ``dgl.sampling.sample_neighbors``.

    ``formats``: restrict the frontier's derived layouts (see
    ``dgl.graph``). The block pipeline passes ``("coo",)`` — ``to_block``
    only reads the edge list, and the ELL/tile builds were ~half the
    host sampling cost per batch.
    """
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
    """Subgraph keeping each node's top-k in-edges by ``edata[weight]``
    (parity: ``dgl.sampling.select_topk``). Host-side preprocessing like
    the samplers; returns an edge-induced subgraph in the parent's node
    space with ``edata['_ID']``."""
    import numpy as np

    from dgl1_tpu.transform import edge_subgraph

    if edge_dir != "in":
        raise NotImplementedError("select_topk supports edge_dir='in'")
    w = np.asarray(g.edata[weight]).reshape(-1)[: g.num_edges()]
    indptr = np.asarray(g.csc_indptr)
    eid = np.asarray(g.csc_eid)
    if nodes is None:
        nodes = np.arange(g.num_dst_nodes())
    keep = []
    for v in np.asarray(nodes, dtype=np.int64):
        lo, hi = int(indptr[v]), int(indptr[v + 1])
        ids = eid[lo:hi]
        if len(ids) > k:
            order = np.argsort(w[ids])
            ids = ids[order[:k]] if ascending else ids[order[-k:]]
        keep.append(ids)
    keep = (np.concatenate(keep) if keep
            else np.zeros((0,), dtype=np.int64))
    return edge_subgraph(g, np.sort(keep), relabel_nodes=False)
