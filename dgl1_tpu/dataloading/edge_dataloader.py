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
                 reverse_eids=None, reverse_etypes=None):
        if exclude not in (None, "self", "reverse_id", "reverse_types"):
            raise ValueError(f"unsupported exclude mode {exclude!r}")
        if exclude == "reverse_id" and reverse_eids is None:
            raise ValueError("exclude='reverse_id' needs reverse_eids")
        if exclude == "reverse_types" and reverse_etypes is None:
            raise ValueError("exclude='reverse_types' needs reverse_etypes")
        self.sampler = sampler
        self.negative_sampler = negative_sampler
        self.exclude = exclude
        self.reverse_eids = (None if reverse_eids is None
                             else np.asarray(reverse_eids, dtype=np.int64))
        self.reverse_etypes = reverse_etypes

    def sample_hetero(self, g, eids: dict,
                      rng: Optional[np.random.Generator] = None):
        """Hetero edge batch: ``eids`` is an ``{etype: ids}`` dict. Pair
        graphs are heterographs over the per-ntype unique endpoints (with
        global ids in ``nframes[nt]['_ID']``); negatives corrupt each
        relation in its own dst space; ``exclude='reverse_types'`` drops
        the same ids in the paired reverse relation (parity:
        ``EdgeCollator`` on heterographs)."""
        import jax.numpy as jnp

        from dgl1_tpu.heterograph import HeteroGraph, heterograph

        rng = rng or dgl_random.default_rng()
        targets = {g.to_canonical_etype(et): np.asarray(v, np.int64)
                   for et, v in eids.items()}
        pos, neg = {}, {}
        nt_nodes = {}
        for c, ids in targets.items():
            rel = g.rel_graphs[c]
            src = np.asarray(rel.src)[ids].astype(np.int64)
            dst = np.asarray(rel.dst)[ids].astype(np.int64)
            pos[c] = (src, dst)
            if self.negative_sampler is not None:
                ns, nd = self.negative_sampler(rel, ids, rng=rng)
            else:
                ns = nd = np.zeros((0,), np.int64)
            neg[c] = (ns, nd)
            nt_nodes.setdefault(c[0], []).extend([src, ns])
            nt_nodes.setdefault(c[2], []).extend([dst, nd])
        uniq = {nt: np.unique(np.concatenate(v))
                for nt, v in nt_nodes.items()}

        def local(nt, ids):
            return np.searchsorted(uniq[nt], ids)

        counts = {nt: len(v) for nt, v in uniq.items()}
        pos_graph = heterograph(
            {c: (local(c[0], s), local(c[2], d))
             for c, (s, d) in pos.items()}, num_nodes_dict=counts)
        neg_graph = heterograph(
            {c: (local(c[0], s), local(c[2], d))
             for c, (s, d) in neg.items()}, num_nodes_dict=counts)
        for hg2 in (pos_graph, neg_graph):
            for nt, v in uniq.items():
                hg2.nframes[nt]["_ID"] = jnp.asarray(v.astype(np.int32))
        exc = None
        if self.exclude == "self":
            exc = dict(targets)
        elif self.exclude == "reverse_types":
            exc = dict(targets)
            for c, ids in targets.items():
                rc = g.to_canonical_etype(self.reverse_etypes[c[1]])
                # Convention (as in the reference's usage): edge i of an
                # etype and edge i of its reverse etype are the same pair.
                exc[rc] = np.concatenate([exc.get(rc, np.zeros(0, np.int64)),
                                          ids])
        input_nodes, _, blocks = self.sampler.sample_blocks(
            g, uniq, rng=rng, exclude_eids=exc)
        return input_nodes, pos_graph, neg_graph, blocks

    def sample(self, g, eids,
               rng: Optional[np.random.Generator] = None):
        from dgl1_tpu.heterograph import HeteroGraph

        if isinstance(g, HeteroGraph):
            if not isinstance(eids, dict):
                if len(g.canonical_etypes) != 1:
                    raise ValueError("hetero edge batches need an "
                                     "{etype: ids} dict")
                eids = {g.canonical_etypes[0][1]: eids}
            return self.sample_hetero(g, eids, rng=rng)
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

    def __init__(self, g, eids, sampler, batch_size: int = 1024,
                 shuffle: bool = True, negative_sampler=None,
                 drop_last: bool = True, seed: Optional[int] = None,
                 exclude=None, reverse_eids=None, reverse_etypes=None):
        self.g = g
        if isinstance(eids, dict):
            # Flatten to (etype, eid) pairs; batches regroup per etype.
            self._etypes = list(eids.keys())
            parts = [np.asarray(v, np.int64) for v in eids.values()]
            self.eids = np.concatenate(parts)
            self._eid_type = np.concatenate([
                np.full(len(v), i, np.int64)
                for i, v in enumerate(parts)])
        else:
            self._etypes = None
            self.eids = np.asarray(eids, dtype=np.int64)
            self._eid_type = None
        self.wrapped = as_edge_prediction_sampler(
            sampler, negative_sampler, exclude=exclude,
            reverse_eids=reverse_eids, reverse_etypes=reverse_etypes)
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
        types = self._eid_type[order] if self._eid_type is not None else None
        for i in range(len(self)):
            sl = slice(i * self.batch_size, (i + 1) * self.batch_size)
            batch = eids[sl]
            if types is not None:
                t = types[sl]
                batch = {self._etypes[j]: batch[t == j]
                         for j in np.unique(t)}
            yield self.wrapped.sample(self.g, batch, rng=self.rng)
