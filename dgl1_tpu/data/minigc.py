"""MiniGC: synthetic graph-classification dataset.

Parity: ``python/dgl/data/minigc.py :: MiniGCDataset`` — 8 graph topology
classes (cycle, star, wheel, lollipop, hypercube, grid, clique, circular
ladder). Fully synthetic upstream too, so this is exact-parity offline.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from dgl1_tpu.graph import Graph, graph
from dgl1_tpu.transform import to_bidirected

__all__ = ["MiniGCDataset"]


def _cycle(n, rng):
    s = np.arange(n)
    return s, (s + 1) % n


def _star(n, rng):
    leaves = np.arange(1, n)
    return np.zeros(n - 1, np.int64), leaves


def _wheel(n, rng):
    hub_s, hub_d = _star(n, rng)
    rim = np.arange(1, n)
    rim_d = np.concatenate([np.arange(2, n), [1]])
    return np.concatenate([hub_s, rim]), np.concatenate([hub_d, rim_d])


def _lollipop(n, rng):
    m = n // 2  # clique size
    cs, cd = np.meshgrid(np.arange(m), np.arange(m))
    mask = cs < cd
    s = list(cs[mask])
    d = list(cd[mask])
    # path
    for i in range(m - 1, n - 1):
        s.append(i)
        d.append(i + 1)
    return np.asarray(s), np.asarray(d)


def _hypercube(n, rng):
    dim = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    size = 2 ** dim
    s, d = [], []
    for v in range(size):
        for b in range(dim):
            u = v ^ (1 << b)
            if u > v:
                s.append(v)
                d.append(u)
    return np.asarray(s), np.asarray(d)


def _grid(n, rng):
    side = max(int(np.sqrt(n)), 2)
    s, d = [], []
    for i in range(side):
        for j in range(side):
            v = i * side + j
            if j + 1 < side:
                s.append(v); d.append(v + 1)
            if i + 1 < side:
                s.append(v); d.append(v + side)
    return np.asarray(s), np.asarray(d)


def _clique(n, rng):
    cs, cd = np.meshgrid(np.arange(n), np.arange(n))
    mask = cs < cd
    return cs[mask], cd[mask]


def _circular_ladder(n, rng):
    m = max(n // 2, 3)
    s = list(np.arange(m)) + list(np.arange(m) + m) + list(np.arange(m))
    d = (list((np.arange(m) + 1) % m) + list((np.arange(m) + 1) % m + m)
         + list(np.arange(m) + m))
    return np.asarray(s), np.asarray(d)


_GENERATORS = [_cycle, _star, _wheel, _lollipop, _hypercube, _grid, _clique,
               _circular_ladder]


class MiniGCDataset:
    """``MiniGCDataset(num_graphs, min_nodes, max_nodes)`` ->
    (graph, label) pairs over 8 topology classes."""

    num_classes = 8

    def __init__(self, num_graphs: int, min_nv: int = 10, max_nv: int = 20,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self.graphs: List[Graph] = []
        self.labels: List[int] = []
        import jax.numpy as jnp

        for i in range(num_graphs):
            cls = int(rng.integers(0, len(_GENERATORS)))
            n = int(rng.integers(min_nv, max_nv + 1))
            s, d = _GENERATORS[cls](n, rng)
            g = to_bidirected(graph((s, d)))
            # Degree as the node feature (the reference uses in-degree).
            g.ndata["attr"] = jnp.asarray(
                np.asarray(g.in_degrees(), dtype=np.float32)[:, None]
            )
            self.graphs.append(g)
            self.labels.append(cls)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, int]:
        return self.graphs[i], self.labels[i]
