"""Edge (link-prediction) dataloader.

Parity: ``python/dgl/dataloading/dataloader.py :: EdgeCollator`` /
``EdgeDataLoader``: a batch of edges yields (input_nodes, positive pair
graph, negative pair graph, blocks); blocks are computed from the unique
endpoint nodes of the positive+negative pairs.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from dgl1_tpu import random as dgl_random

from dgl1_tpu.graph import Graph, block
from dgl1_tpu.dataloading.dataloader import NodeDataLoader

__all__ = ["EdgeDataLoader", "as_edge_prediction_sampler"]


class as_edge_prediction_sampler:
    """Wraps a block sampler for edge batches (parity with the 0.8-era
    ``as_edge_prediction_sampler``; also used internally by EdgeDataLoader)."""

    def __init__(self, sampler, negative_sampler=None, exclude=None,
                 reverse_eids=None):
        if exclude not in (None, "self", "reverse_id"):
            raise ValueError(f"unsupported exclude mode {exclude!r}")
        if exclude == "reverse_id" and reverse_eids is None:
            raise ValueError("exclude='reverse_id' needs reverse_eids")
        self.sampler = sampler
        self.negative_sampler = negative_sampler
        self.exclude = exclude
        self.reverse_eids = (None if reverse_eids is None
                             else np.asarray(reverse_eids, dtype=np.int64))

    def sample(self, g: Graph, eids: np.ndarray,
               rng: Optional[np.random.Generator] = None):
        rng = rng or dgl_random.default_rng()
        eids = np.asarray(eids, dtype=np.int64)
        src = np.asarray(g.src)[eids].astype(np.int64)
        dst = np.asarray(g.dst)[eids].astype(np.int64)
        if self.negative_sampler is not None:
            neg_src, neg_dst = self.negative_sampler(g, eids, rng=rng)
        else:
            neg_src = neg_dst = np.zeros((0,), dtype=np.int64)
        # Unique endpoints, first-seen order -> local pair-graph ids.
        all_nodes = np.concatenate([src, dst, neg_src, neg_dst])
        uniq, inv = np.unique(all_nodes, return_inverse=True)
        n = len(src)
        k = len(neg_src)
        pos_graph = block(
            (inv[:n], inv[n:2 * n]),
            num_src_nodes=len(uniq), num_dst_nodes=len(uniq),
        )
        neg_graph = block(
            (inv[2 * n:2 * n + k], inv[2 * n + k:]),
            num_src_nodes=len(uniq), num_dst_nodes=len(uniq),
        )
        exc = None
        if self.exclude == "self":
            exc = eids
        elif self.exclude == "reverse_id":
            exc = np.concatenate([eids, self.reverse_eids[eids]])
        input_nodes, _, blocks = self.sampler.sample_blocks(
            g, uniq, rng=rng, exclude_eids=exc)
        import jax.numpy as jnp

        pos_graph.srcdata["_ID"] = jnp.asarray(uniq.astype(np.int32))
        neg_graph.srcdata["_ID"] = jnp.asarray(uniq.astype(np.int32))
        return input_nodes, pos_graph, neg_graph, blocks


class EdgeDataLoader:
    """Iterates mini-batches of edges for link prediction.

    Note: pair graphs have data-dependent node counts (unique endpoints),
    so the link-prediction path recompiles across batch shapes unless the
    score function is shape-polymorphic; the blocks themselves are
    static-shape via the node sampler's padding.
    """

    def __init__(self, g: Graph, eids, sampler, batch_size: int = 1024,
                 shuffle: bool = True, negative_sampler=None,
                 drop_last: bool = True, seed: Optional[int] = None,
                 exclude=None, reverse_eids=None):
        self.g = g
        self.eids = np.asarray(eids, dtype=np.int64)
        self.wrapped = as_edge_prediction_sampler(
            sampler, negative_sampler, exclude=exclude,
            reverse_eids=reverse_eids)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.eids)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        order = (
            self.rng.permutation(len(self.eids)) if self.shuffle
            else np.arange(len(self.eids))
        )
        eids = self.eids[order]
        for i in range(len(self)):
            batch = eids[i * self.batch_size:(i + 1) * self.batch_size]
            yield self.wrapped.sample(self.g, batch, rng=self.rng)
