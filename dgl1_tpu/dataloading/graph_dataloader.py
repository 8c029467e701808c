"""GraphDataLoader — batched graph-classification loading.

Parity: ``python/dgl/dataloading/pytorch/__init__.py ::
GraphDataLoader`` (wraps torch DataLoader + ``dgl.batch`` collate).
TPU-native: every batch is padded to bucketed static node/edge budgets
by appending one disjoint *padding graph* (isolated nodes + self-loop
edges on its own first node), so the jitted train step compiles for a
handful of shapes instead of one per batch. The padding graph is an
extra final segment in ``batch_num_nodes`` — readouts emit
``batch_size + 1`` rows; callers slice ``[:batch_size]`` (the returned
``mask`` also flags repeated fill graphs in the last partial batch).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

from dgl1_tpu.batch import batch
from dgl1_tpu.graph import Graph, graph

__all__ = ["GraphDataLoader"]


def _round_up(x: int, m: int) -> int:
    return max(((x + m - 1) // m) * m, m)


def _pad_graph(n_nodes: int, n_edges: int, like: Graph) -> Graph:
    """Disjoint filler: ``n_nodes`` isolated nodes, ``n_edges``
    self-loops on node 0 (zero features -> identity under every
    aggregator used after masking)."""
    import jax.numpy as jnp

    s = np.zeros((n_edges,), dtype=np.int64)
    g = graph((s, s), num_nodes=max(n_nodes, 1))
    for k, v in like.ndata.items():
        g.ndata[k] = jnp.zeros((g.num_nodes(),) + tuple(v.shape[1:]),
                               v.dtype)
    for k, v in like.edata.items():
        g.edata[k] = jnp.zeros((n_edges,) + tuple(v.shape[1:]), v.dtype)
    return g


class GraphDataLoader:
    """Iterate ``(batched_graph, labels, mask)`` over a dataset of
    ``(graph, label)`` items."""

    def __init__(self, dataset, batch_size: int = 32, shuffle: bool = False,
                 drop_last: bool = False, pad: bool = True,
                 node_pad_multiple: int = 256,
                 edge_pad_multiple: int = 512,
                 prefetch: int = 2, seed: Optional[int] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad = pad
        self.node_pad_multiple = node_pad_multiple
        self.edge_pad_multiple = edge_pad_multiple
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, idxs: np.ndarray):
        import jax.numpy as jnp

        n_real = len(idxs)
        if n_real < self.batch_size:  # repeat-fill the partial batch
            idxs = np.concatenate([
                idxs, np.full((self.batch_size - n_real,), idxs[-1],
                              dtype=idxs.dtype)])
        items = [self.dataset[int(i)] for i in idxs]
        graphs = [it[0] for it in items]
        labels = np.asarray([it[1] for it in items])
        mask = np.zeros((self.batch_size,), dtype=bool)
        mask[:n_real] = True
        if self.pad:
            tot_n = sum(g.num_nodes() for g in graphs)
            tot_e = sum(g.num_edges() for g in graphs)
            pad_n = _round_up(tot_n + 1, self.node_pad_multiple) - tot_n
            pad_e = _round_up(tot_e + 1, self.edge_pad_multiple) - tot_e
            graphs = graphs + [_pad_graph(pad_n, pad_e, graphs[0])]
        bg = batch(graphs)
        return bg, jnp.asarray(labels), jnp.asarray(mask)

    def _batches(self):
        order = (self.rng.permutation(len(self.dataset)) if self.shuffle
                 else np.arange(len(self.dataset)))
        for i in range(len(self)):
            yield order[i * self.batch_size:(i + 1) * self.batch_size]

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            for idxs in self._batches():
                yield self._make_batch(idxs)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        err: list = []

        def producer():
            try:
                for idxs in self._batches():
                    q.put(self._make_batch(idxs))
            except BaseException as exc:  # surfaced in the consumer
                err.append(exc)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
            if err:
                raise err[0]
        finally:
            t.join(timeout=1.0)
