"""Knowledge-graph datasets for R-GCN workloads.

Parity: ``python/dgl/data/knowledge_graph.py`` (FB15k-237, WN18) and
``python/dgl/data/rdf.py`` (AIFB entity classification). Offline fallback:
synthetic typed-edge graphs with the real datasets' statistics.
"""

from __future__ import annotations

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.graph import graph

__all__ = ["FB15k237Dataset", "WN18Dataset", "AIFBDataset"]


def _typed_graph(num_nodes, num_edges, num_rels, seed, labeled_classes=None):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, size=num_edges)
    dst = rng.integers(0, num_nodes, size=num_edges)
    # Relation assignment skewed (Zipf-ish) like real KGs.
    rel_w = (np.arange(1, num_rels + 1) ** -1.1)
    rel_w /= rel_w.sum()
    etype = rng.choice(num_rels, size=num_edges, p=rel_w)
    g = graph((src, dst), num_nodes=num_nodes)
    g.edata["etype"] = jnp.asarray(etype.astype(np.int32))
    if labeled_classes:
        # Entity classification split (AIFB-style): labels correlated with
        # the relation-type histogram of incident edges for learnability.
        sig = np.zeros((num_nodes, labeled_classes))
        for c in range(labeled_classes):
            rels = rng.choice(num_rels, size=3, replace=False)
            m = np.isin(etype, rels)
            np.add.at(sig[:, c], dst[m], 1.0)
        labels = sig.argmax(axis=1)
        g.ndata["label"] = jnp.asarray(labels.astype(np.int32))
        idx = rng.permutation(num_nodes)
        train = np.zeros(num_nodes, dtype=bool)
        test = np.zeros(num_nodes, dtype=bool)
        train[idx[: num_nodes // 2]] = True
        test[idx[num_nodes // 2:]] = True
        g.ndata["train_mask"] = jnp.asarray(train)
        g.ndata["test_mask"] = jnp.asarray(test)
    return g


class FB15k237Dataset(GraphDataset):
    name = "fb15k237"
    num_rels = 237

    def _generate(self):
        g = _typed_graph(14541, 310116, 237, seed=237)
        return [g], {}


class WN18Dataset(GraphDataset):
    name = "wn18"
    num_rels = 18

    def _generate(self):
        g = _typed_graph(40943, 151442, 18, seed=18)
        return [g], {}


class AIFBDataset(GraphDataset):
    name = "aifb"
    num_rels = 45
    num_classes = 4

    def _generate(self):
        g = _typed_graph(8285, 58086, 45, seed=45, labeled_classes=4)
        return [g], {}
