"""Random walks (parity: ``src/graph/sampling/randomwalks/*.cc`` +
``python/dgl/sampling/randomwalks.py``). Host-side vectorized numpy: one
step for all walkers at a time (the walker loop is over walk *length*, not
walkers)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu import random as dgl_random

from dgl1_tpu.graph import Graph

__all__ = ["random_walk", "node2vec_random_walk"]


def _step(indptr, nbr, cur, alive, rng, w_cumsum=None):
    """One vectorized walk step for all walkers; returns next nodes
    (undefined where ``~alive``)."""
    deg = indptr[cur + 1] - indptr[cur]
    if len(nbr) == 0:
        return cur.copy(), deg
    if w_cumsum is None:
        step = np.floor(
            rng.random(len(cur)) * np.maximum(deg, 1)).astype(np.int64)
        # Dead-end rows (deg==0) at the array end would index one past
        # nbr; they are masked out by the caller — clamp for safety.
        return nbr[np.minimum(indptr[cur] + step, len(nbr) - 1)], deg
    # Weighted: per-row inverse-CDF via searchsorted on the global edge
    # cumsum (row sum = cumsum[hi-1] - base).
    lo = indptr[cur]
    hi = indptr[cur + 1]
    base = np.where(lo > 0, w_cumsum[lo - 1], 0.0)
    total = w_cumsum[np.maximum(hi - 1, 0)] - base
    u = base + rng.random(len(cur)) * np.maximum(total, 1e-30)
    pos = np.searchsorted(w_cumsum, u, side="right")
    pos = np.minimum(pos, np.maximum(hi - 1, 0))
    return nbr[np.minimum(np.maximum(pos, lo), len(nbr) - 1)], deg


def random_walk(
    g,
    nodes,
    length: Optional[int] = None,
    restart_prob: float = 0.0,
    rng: Optional[np.random.Generator] = None,
    metapath: Optional[list] = None,
    prob: Optional[str] = None,
):
    """Random walk from each start node (parity:
    ``dgl.sampling.random_walk``).

    Homogeneous: ``length`` uniform (or ``prob``-weighted, an edata key)
    steps; returns traces of shape (num_seeds, length+1), -1 marking a
    terminated walk (dead end or restart).

    Heterogeneous: ``metapath`` is a list of etypes walked one relation
    per step (the metapath2vec / hetero-PinSAGE walk); returns
    ``(traces, types)`` where ``types`` indexes ``g.ntypes`` per trace
    column, matching the reference's return shape.
    """
    rng = rng or dgl_random.default_rng()
    cur = np.asarray(nodes, dtype=np.int64)
    n = len(cur)

    if metapath is not None:
        canon = [g.to_canonical_etype(et) for et in metapath]
        for a, b in zip(canon[:-1], canon[1:]):
            if a[2] != b[0]:
                raise ValueError(
                    f"metapath discontinuity: {a} -> {b}")
        traces = np.full((n, len(canon) + 1), -1, dtype=np.int64)
        traces[:, 0] = cur
        alive = np.ones((n,), dtype=bool)
        for t, c in enumerate(canon, start=1):
            rel = g.rel_graphs[c]
            indptr = np.asarray(rel.csr_indptr).astype(np.int64)
            nbr = np.asarray(rel.csr_dst).astype(np.int64)
            wc = None
            if prob is not None and prob in rel.edata:
                e = rel.num_edges()
                w = np.asarray(rel.edata[prob], np.float64).reshape(-1)[:e]
                wc = np.cumsum(w[np.asarray(rel.csr_eid)[:e]])
            nxt, deg = _step(indptr, nbr, cur, alive, rng, wc)
            alive = alive & (deg > 0)
            if restart_prob > 0:
                alive = alive & (rng.random(n) >= restart_prob)
            cur = np.where(alive, nxt, cur)
            traces[alive, t] = nxt[alive]
        ntype_ix = {nt: i for i, nt in enumerate(g.ntypes)}
        types = np.asarray(
            [ntype_ix[canon[0][0]]] + [ntype_ix[c[2]] for c in canon],
            dtype=np.int64)
        return traces, types

    if length is None:
        raise ValueError("length is required without a metapath")
    indptr = np.asarray(g.csr_indptr).astype(np.int64)
    nbr = np.asarray(g.csr_dst).astype(np.int64)
    wc = None
    if prob is not None and prob in g.edata:
        e = g.num_edges()
        w = np.asarray(g.edata[prob], np.float64).reshape(-1)[:e]
        wc = np.cumsum(w[np.asarray(g.csr_eid)[:e]])
    traces = np.full((n, length + 1), -1, dtype=np.int64)
    traces[:, 0] = cur
    alive = np.ones((n,), dtype=bool)
    for t in range(1, length + 1):
        nxt, deg = _step(indptr, nbr, cur, alive, rng, wc)
        alive = alive & (deg > 0)
        if restart_prob > 0:
            alive = alive & (rng.random(n) >= restart_prob)
        cur = np.where(alive, nxt, cur)
        traces[alive, t] = nxt[alive]
    return traces


def node2vec_random_walk(
    g: Graph,
    nodes,
    p: float,
    q: float,
    walk_length: int,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """node2vec biased walk (2nd-order). Simple host implementation using
    rejection sampling per step (parity: ``dgl.sampling.node2vec_random_walk``)."""
    rng = rng or dgl_random.default_rng()
    indptr = np.asarray(g.csr_indptr).astype(np.int64)
    nbr = np.asarray(g.csr_dst).astype(np.int64)
    nbr_sets = None  # lazily built per-walk for the q bias check
    cur = np.asarray(nodes, dtype=np.int64)
    n = len(cur)
    traces = np.full((n, walk_length + 1), -1, dtype=np.int64)
    traces[:, 0] = cur
    prev = np.full((n,), -1, dtype=np.int64)
    max_bias = max(1.0, 1.0 / p, 1.0 / q)
    for t in range(1, walk_length + 1):
        deg = indptr[cur + 1] - indptr[cur]
        alive = deg > 0
        nxt = cur.copy()
        for i in np.nonzero(alive)[0]:
            s, d = indptr[cur[i]], deg[i]
            for _ in range(32):  # rejection sampling with a cap
                cand = nbr[s + int(rng.integers(d))]
                if prev[i] < 0:
                    bias = 1.0
                elif cand == prev[i]:
                    bias = 1.0 / p
                else:
                    lo, hi = indptr[prev[i]], indptr[prev[i] + 1]
                    bias = 1.0 if np.any(nbr[lo:hi] == cand) else 1.0 / q
                if rng.random() < bias / max_bias:
                    nxt[i] = cand
                    break
            else:
                nxt[i] = nbr[s + int(rng.integers(d))]
        prev = np.where(alive, cur, prev)
        cur = np.where(alive, nxt, cur)
        traces[alive, t] = cur[alive]
    return traces
