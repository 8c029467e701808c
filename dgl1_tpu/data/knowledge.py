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


def load_triples(raw_dir):
    """Parse the standard knowledge-graph triple files (``train.txt`` /
    ``valid.txt`` / ``test.txt``, one tab-separated ``head rel tail`` per
    line; ``entities.dict`` / ``relations.dict`` id maps honored when
    present) into one graph with ``edata['etype']`` and per-edge
    train/val/test masks.

    Parity: ``python/dgl/data/knowledge_graph.py :: KnowledgeGraphDataset
    .process`` — same file format, same edge-split semantics (the splits
    are LINK splits: every triple is one edge of the full graph).
    """
    import jax.numpy as jnp

    from dgl1_tpu.graph import graph as make_graph

    def read_dict(path):
        m = {}
        with open(path) as f:
            for line in f:
                idx, name = line.rstrip("\n").split("\t")
                m[name] = int(idx)
        return m

    ent2id = {}
    rel2id = {}
    if (raw_dir / "entities.dict").exists():
        ent2id = read_dict(raw_dir / "entities.dict")
    if (raw_dir / "relations.dict").exists():
        rel2id = read_dict(raw_dir / "relations.dict")

    def intern(m, key):
        if key not in m:
            m[key] = len(m)
        return m[key]

    triples = {}
    for part in ("train", "valid", "test"):
        rows = []
        with open(raw_dir / f"{part}.txt") as f:
            for line in f:
                h, r, t = line.rstrip("\n").split("\t")
                rows.append((intern(ent2id, h), intern(rel2id, r),
                             intern(ent2id, t)))
        triples[part] = np.asarray(rows, np.int64).reshape(-1, 3)

    allt = np.concatenate([triples[p] for p in ("train", "valid", "test")])
    n = len(ent2id)
    g = make_graph((allt[:, 0], allt[:, 2]), num_nodes=n)
    g.edata["etype"] = jnp.asarray(allt[:, 1].astype(np.int32))
    e = len(allt)
    off = 0
    for part, field in (("train", "train_mask"), ("valid", "val_mask"),
                        ("test", "test_mask")):
        mask = np.zeros((e,), bool)
        mask[off: off + len(triples[part])] = True
        g.edata[field] = jnp.asarray(mask)
        off += len(triples[part])
    g.meta["num_rels"] = len(rel2id)
    g.meta["num_entities"] = n
    return g


class _TripleDataset(GraphDataset):
    def _has_raw(self) -> bool:
        return all((self.raw_dir / f"{p}.txt").exists()
                   for p in ("train", "valid", "test"))

    def _load_raw(self):
        g = load_triples(self.raw_dir)
        self.num_rels = g.meta["num_rels"]
        return [g], {}


class FB15k237Dataset(_TripleDataset):
    name = "fb15k237"
    num_rels = 237

    def _generate(self):
        g = _typed_graph(14541, 310116, 237, seed=237)
        return [g], {}


class WN18Dataset(_TripleDataset):
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
