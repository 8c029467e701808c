"""GraphSAINT subgraph sampling (parity: ``python/dgl/dataloading/
saint.py :: SAINTSampler`` — "GraphSAINT: Graph Sampling Based Inductive
Learning Method").

Modes: 'node' (degree-proportional node budget), 'edge' (edges w.p.
proportional to 1/d_u + 1/d_v), 'walk' (union of random walks). Each
batch is the node-induced subgraph of the sampled set, padded to bucketed
static sizes so XLA compiles a handful of programs per epoch (the same
static-shape stance as ClusterGCNDataLoader).

Normalization: a preprocessing pass over ``num_pre`` sampled batches
estimates node/edge inclusion counts; yielded subgraphs carry
``ndata['loss_norm']`` (inverse node frequency) and ``edata['aggr_norm']``
(count_v / count_e along each edge) per the paper's unbiased estimators.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu.graph import Graph

__all__ = ["SAINTSampler"]


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


class SAINTSampler:
    def __init__(self, g: Graph, mode: str, budget, num_batches: int,
                 num_pre: int = 20, seed: Optional[int] = None,
                 node_pad_multiple: int = 256,
                 edge_pad_multiple: int = 1024):
        if mode not in ("node", "edge", "walk"):
            raise ValueError(f"unknown SAINT mode {mode!r}")
        self.g = g
        self.mode = mode
        self.budget = budget
        self.num_batches = num_batches
        self.rng = np.random.default_rng(seed)
        self.npad = node_pad_multiple
        self.epad = edge_pad_multiple

        e = g.num_edges()
        self._src = np.asarray(g.src)[:e]
        self._dst = np.asarray(g.dst)[:e]
        n = g.num_nodes()
        deg = np.bincount(self._dst, minlength=n) + np.bincount(
            self._src, minlength=n)
        self._deg = np.maximum(deg, 1)

        # Preprocessing: estimate inclusion frequencies for the
        # normalization coefficients (saint.py does the same warmup).
        node_count = np.ones(n)  # +1 smoothing avoids div-by-zero
        edge_count = np.ones(e)
        for _ in range(num_pre):
            nodes = self._sample_nodes()
            node_count[nodes] += 1
            emask = self._edge_mask(nodes)
            edge_count[emask] += 1
        self._node_count = node_count
        self._edge_count = edge_count

    def _sample_nodes(self) -> np.ndarray:
        n = self.g.num_nodes()
        if self.mode == "node":
            p = self._deg / self._deg.sum()
            k = min(int(self.budget), n)
            return np.unique(self.rng.choice(n, size=k, p=p))
        if self.mode == "edge":
            w = (1.0 / self._deg[self._src] + 1.0 / self._deg[self._dst])
            p = w / w.sum()
            k = min(int(self.budget), len(self._src))
            eids = self.rng.choice(len(self._src), size=k, p=p)
            return np.unique(np.concatenate([self._src[eids],
                                             self._dst[eids]]))
        # walk: budget = (num_roots, length)
        roots, length = self.budget
        from dgl1_tpu.sampling import random_walk

        starts = self.rng.integers(0, n, int(roots))
        traces = random_walk(self.g, starts, length=int(length),
                             rng=self.rng)
        visited = np.asarray(traces).reshape(-1)
        return np.unique(visited[visited >= 0])

    def _edge_mask(self, nodes: np.ndarray) -> np.ndarray:
        keep = np.zeros(self.g.num_nodes(), bool)
        keep[nodes] = True
        return keep[self._src] & keep[self._dst]

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self):
        import jax.numpy as jnp

        from dgl1_tpu.graph import graph as make_graph

        for _ in range(self.num_batches):
            nodes = self._sample_nodes()
            emask = self._edge_mask(nodes)
            eids = np.nonzero(emask)[0]
            relabel = np.full(self.g.num_nodes(), -1, np.int64)
            relabel[nodes] = np.arange(len(nodes))
            n_pad = _round_up(len(nodes), self.npad)
            e_pad = _round_up(max(len(eids), 1), self.epad)
            sg = make_graph(
                (relabel[self._src[eids]], relabel[self._dst[eids]]),
                num_nodes=n_pad, pad_edges_to=e_pad,
            )
            nid = jnp.asarray(np.pad(nodes, (0, n_pad - len(nodes))
                                     ).astype(np.int32))
            sg.ndata["_ID"] = nid
            for k, v in self.g.ndata.items():
                sg.ndata[k] = jnp.take(v, nid, axis=0, mode="clip")
            # Unbiased-estimator norms (zero on padded rows/edges).
            loss_norm = 1.0 / self._node_count[nodes]
            loss_norm = loss_norm * (len(loss_norm) / loss_norm.sum())
            ln = np.zeros(n_pad, np.float32)
            ln[: len(nodes)] = loss_norm
            sg.ndata["loss_norm"] = jnp.asarray(ln)
            an = np.zeros(e_pad, np.float32)
            an[: len(eids)] = (self._node_count[self._dst[eids]]
                               / self._edge_count[eids])
            sg.edata["aggr_norm"] = jnp.asarray(an)
            mask = np.zeros(n_pad, bool)
            mask[: len(nodes)] = True
            yield sg, jnp.asarray(mask)
