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


def random_walk(
    g: Graph,
    nodes,
    length: int,
    restart_prob: float = 0.0,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Uniform random walk of ``length`` steps from each start node.

    Returns traces of shape (num_seeds, length+1); -1 marks a terminated
    walk (dead end or restart).
    """
    rng = rng or dgl_random.default_rng()
    indptr = np.asarray(g.csr_indptr).astype(np.int64)
    nbr = np.asarray(g.csr_dst).astype(np.int64)
    cur = np.asarray(nodes, dtype=np.int64)
    n = len(cur)
    traces = np.full((n, length + 1), -1, dtype=np.int64)
    traces[:, 0] = cur
    alive = np.ones((n,), dtype=bool)
    for t in range(1, length + 1):
        deg = indptr[cur + 1] - indptr[cur]
        alive = alive & (deg > 0)
        if restart_prob > 0:
            alive = alive & (rng.random(n) >= restart_prob)
        step = np.floor(rng.random(n) * np.maximum(deg, 1)).astype(np.int64)
        nxt = nbr[indptr[cur] + step]
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
