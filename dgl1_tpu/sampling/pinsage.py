"""PinSAGE-style neighbor sampler via random walks.

Parity: ``python/dgl/sampling/pinsage.py :: PinSAGESampler`` /
``RandomWalkNeighborSampler``: the top-k visited nodes over many short
random walks become weighted neighbors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu.graph import Graph, graph
from dgl1_tpu.sampling.randomwalks import random_walk

__all__ = ["RandomWalkNeighborSampler", "PinSAGESampler"]


class RandomWalkNeighborSampler:
    """For each seed, run ``num_random_walks`` walks of ``num_traversals``
    steps, count visits, keep the ``num_neighbors`` most-visited nodes.
    Returns a frontier graph with visit counts in ``edata['weights']``."""

    def __init__(self, g: Graph, num_traversals: int, termination_prob: float,
                 num_random_walks: int, num_neighbors: int,
                 seed: Optional[int] = None):
        self.g = g
        self.num_traversals = num_traversals
        self.termination_prob = termination_prob
        self.num_random_walks = num_random_walks
        self.num_neighbors = num_neighbors
        self.rng = np.random.default_rng(seed)

    def __call__(self, seed_nodes) -> Graph:
        seeds = np.asarray(seed_nodes, dtype=np.int64)
        starts = np.repeat(seeds, self.num_random_walks)
        traces = random_walk(
            self.g, starts, length=self.num_traversals,
            restart_prob=self.termination_prob, rng=self.rng,
        )
        visited = traces[:, 1:]  # exclude the seed itself
        src_list, dst_list, w_list = [], [], []
        n_walks = self.num_random_walks
        for i, s in enumerate(seeds):
            vs = visited[i * n_walks:(i + 1) * n_walks].reshape(-1)
            vs = vs[(vs >= 0) & (vs != s)]
            if len(vs) == 0:
                continue
            uniq, counts = np.unique(vs, return_counts=True)
            top = np.argsort(-counts, kind="stable")[: self.num_neighbors]
            src_list.append(uniq[top])
            dst_list.append(np.full(len(top), s, dtype=np.int64))
            w_list.append(counts[top])
        if src_list:
            src = np.concatenate(src_list)
            dst = np.concatenate(dst_list)
            w = np.concatenate(w_list)
        else:
            src = dst = w = np.zeros(0, np.int64)
        frontier = graph((src, dst), num_nodes=self.g.num_nodes())
        import jax.numpy as jnp

        frontier.edata["weights"] = jnp.asarray(w.astype(np.float32))
        return frontier


class PinSAGESampler(RandomWalkNeighborSampler):
    """Homogeneous-projection PinSAGE sampler (parity:
    ``dgl.sampling.PinSAGESampler``; the bipartite metapath projection of
    the reference collapses to 2-step traversals on the projected graph)."""

    def __init__(self, g: Graph, num_traversals: int = 2,
                 termination_prob: float = 0.5, num_random_walks: int = 10,
                 num_neighbors: int = 3, seed: Optional[int] = None):
        super().__init__(g, num_traversals, termination_prob,
                         num_random_walks, num_neighbors, seed)
