"""Cluster-GCN sampling (parity: ``examples/pytorch/cluster_gcn`` and
DGL's ``ClusterGCNSampler``): partition the graph into clusters once,
train on node-induced subgraphs of random cluster unions.

TPU-native: the reference relies on dynamic subgraph shapes; here every
batch subgraph is padded to bucketed static sizes (nodes and edges
rounded up to a multiple), so XLA compiles a handful of programs for the
whole epoch instead of one per batch. The partitioner is the same
edge-cut machinery as the distributed layer
(``parallel/partition.py``), standing in for the reference's METIS.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["ClusterGCNDataLoader"]


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


class ClusterGCNDataLoader:
    """Iterate padded cluster-union subgraphs of ``g``.

    Yields ``(subgraph, node_mask)`` where ``subgraph`` has
    ``node_mask.shape[0]`` (padded) nodes, real nodes first; ndata rows
    are sliced from the parent (padded rows zero) and ``ndata['_ID']``
    holds parent ids (padded entries point at node 0 — mask them).
    """

    def __init__(self, g: Graph, num_parts: int, parts_per_batch: int = 1,
                 shuffle: bool = True, seed: Optional[int] = None,
                 node_pad_multiple: int = 256,
                 edge_pad_multiple: int = 1024,
                 prefetch: int = 2,
                 partition_assignment: Optional[np.ndarray] = None):
        from dgl1_tpu.parallel.partition import greedy_partition_assignment

        self.g = g
        self.parts_per_batch = parts_per_batch
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.node_pad_multiple = node_pad_multiple
        self.edge_pad_multiple = edge_pad_multiple
        self.prefetch = prefetch
        if partition_assignment is None:
            partition_assignment = greedy_partition_assignment(g, num_parts)
        assignment = np.asarray(partition_assignment)
        self.clusters: List[np.ndarray] = [
            np.nonzero(assignment == p)[0].astype(np.int64)
            for p in range(num_parts)
        ]
        e = g.num_edges()
        self._src = np.asarray(g.src)[:e]
        self._dst = np.asarray(g.dst)[:e]
        self._ndata = {k: np.asarray(v) for k, v in g.ndata.items()}

    def __len__(self):
        return (len(self.clusters) + self.parts_per_batch - 1) \
            // self.parts_per_batch

    def _make_batch(self, nodes: np.ndarray):
        import jax.numpy as jnp

        relabel = np.full((self.g.num_nodes(),), -1, dtype=np.int64)
        relabel[nodes] = np.arange(len(nodes))
        keep = (relabel[self._src] >= 0) & (relabel[self._dst] >= 0)
        s = relabel[self._src[keep]]
        d = relabel[self._dst[keep]]
        n_pad = _round_up(len(nodes), self.node_pad_multiple)
        e_pad = _round_up(len(s), self.edge_pad_multiple)
        sg = graph((s, d), num_nodes=n_pad, pad_edges_to=e_pad)
        mask = np.zeros((n_pad,), dtype=bool)
        mask[: len(nodes)] = True
        ids = np.zeros((n_pad,), dtype=np.int64)
        ids[: len(nodes)] = nodes
        for k, v in self._ndata.items():
            out = np.zeros((n_pad,) + v.shape[1:], v.dtype)
            out[: len(nodes)] = v[nodes]
            sg.ndata[k] = jnp.asarray(out)
        sg.ndata["_ID"] = jnp.asarray(ids.astype(np.int32))
        return sg, jnp.asarray(mask)

    def _groups(self):
        order = (self.rng.permutation(len(self.clusters)) if self.shuffle
                 else np.arange(len(self.clusters)))
        q = self.parts_per_batch
        for i in range(len(self)):
            parts = order[i * q:(i + 1) * q]
            yield np.concatenate([self.clusters[p] for p in parts])

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            for nodes in self._groups():
                yield self._make_batch(nodes)
            return
        qu: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        err: list = []

        def producer():
            try:
                for nodes in self._groups():
                    qu.put(self._make_batch(nodes))
            except BaseException as exc:  # surfaced in the consumer
                err.append(exc)
            finally:
                qu.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = qu.get()
                if item is stop:
                    break
                yield item
            if err:
                raise err[0]
        finally:
            t.join(timeout=1.0)
