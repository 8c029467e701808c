"""Citation datasets: Cora / Citeseer / Pubmed.

Parity: ``python/dgl/data/citation_graph.py``. When the standard planetoid
raw files (``ind.<name>.x / .y / .tx / .ty / .allx / .ally / .graph /
.test.index``) are present under the data dir they are parsed exactly like
the reference (same reassembly, same splits: train = first len(y) nodes,
val = the next 500, test = test.index); otherwise a clearly-flagged
synthetic SBM with the true datasets' statistics is generated
(``ds.is_synthetic`` is True in that case — no network in this
environment).
"""

from __future__ import annotations

import pickle

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.synthetic import synthetic_classification_graph

__all__ = ["CoraGraphDataset", "CiteseerGraphDataset", "PubmedGraphDataset",
           "load_planetoid"]

_PLANETOID_SUFFIXES = ("x", "y", "tx", "ty", "allx", "ally", "graph",
                       "test.index")


def load_planetoid(raw_dir, name):
    """Parse the planetoid pickle set into one labeled graph.

    Parity: ``python/dgl/data/citation_graph.py :: CitationGraphDataset
    .process`` — identical reassembly: rows = vstack(allx, tx) with the
    test block permuted into ``test.index`` order (citeseer's isolated
    test nodes fill the index range with zero rows), labels from the
    one-hot (ally, ty), edges from the adjacency-list pickle (made
    bidirectional), masks: train = [0, len(y)), val = the following 500,
    test = test.index.
    """
    import jax.numpy as jnp
    from scipy import sparse as sp

    from dgl1_tpu.graph import graph as make_graph
    from dgl1_tpu.transform import to_bidirected

    objs = {}
    for suf in _PLANETOID_SUFFIXES:
        path = raw_dir / f"ind.{name}.{suf}"
        if suf == "test.index":
            objs[suf] = np.loadtxt(path, dtype=np.int64).reshape(-1)
        else:
            with open(path, "rb") as f:
                # py2-era pickles: latin1 keeps numpy buffers intact.
                objs[suf] = pickle.load(f, encoding="latin1")

    x, y = objs["x"], objs["y"]
    tx, ty = objs["tx"], objs["ty"]
    allx, ally = objs["allx"], objs["ally"]
    test_idx = objs["test.index"]  # tx row j is node test_idx[j]

    test_sorted = np.sort(test_idx)
    lo, hi = int(test_sorted[0]), int(test_sorted[-1])
    if hi - lo + 1 != len(test_idx):
        # Citeseer: some test ids are isolated and missing from tx/ty —
        # fill the index range with zero rows (reference does the same).
        full = hi - lo + 1
        tx_full = sp.lil_matrix((full, x.shape[1]), dtype=np.float32)
        tx_full[test_sorted - lo, :] = tx
        tx = tx_full.tocsr()
        ty_full = np.zeros((full, y.shape[1]), dtype=ty.dtype)
        ty_full[test_sorted - lo] = ty
        ty = ty_full

    # Canonical planetoid reassembly: the appended test block sits at node
    # ids [lo, hi]; permute it from sorted-id order into test.index order.
    feats = sp.vstack((allx, tx)).tolil()
    feats[test_idx, :] = feats[test_sorted, :]
    labels_oh = np.vstack((ally, ty))
    labels_oh[test_idx] = labels_oh[test_sorted]
    labels = labels_oh.argmax(axis=1)

    n = feats.shape[0]
    adj = objs["graph"]
    src = np.concatenate(
        [np.full(len(vs), u, np.int64) for u, vs in adj.items() if len(vs)]
    ) if adj else np.zeros(0, np.int64)
    dst = np.concatenate(
        [np.asarray(list(vs), np.int64) for vs in adj.values() if len(vs)]
    ) if adj else np.zeros(0, np.int64)
    keep = (src < n) & (dst < n)
    g = make_graph((src[keep], dst[keep]), num_nodes=n)
    g = to_bidirected(g)

    train_mask = np.zeros(n, bool)
    train_mask[: y.shape[0]] = True
    val_mask = np.zeros(n, bool)
    val_mask[y.shape[0]: y.shape[0] + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_idx] = True

    g.ndata["feat"] = jnp.asarray(
        np.asarray(feats.todense(), dtype=np.float32))
    g.ndata["label"] = jnp.asarray(labels.astype(np.int32))
    g.ndata["train_mask"] = jnp.asarray(train_mask)
    g.ndata["val_mask"] = jnp.asarray(val_mask)
    g.ndata["test_mask"] = jnp.asarray(test_mask)
    return g


class _CitationDataset(GraphDataset):
    # (num_nodes, num_edges~, feat_dim, num_classes) of the real datasets.
    stats = (2708, 10556, 1433, 7)

    def _has_raw(self) -> bool:
        return all((self.raw_dir / f"ind.{self.name}.{suf}").exists()
                   for suf in _PLANETOID_SUFFIXES)

    def _load_raw(self):
        return [load_planetoid(self.raw_dir, self.name)], {}

    def _generate(self):
        n, _e, d, c = self.stats
        g = synthetic_classification_graph(
            num_nodes=n,
            num_classes=c,
            feat_dim=d,
            avg_degree=max(2.0, self.stats[1] / self.stats[0] / 2),
            seed=hash(self.name) % (2 ** 31),
        )
        return [g], {}

    @property
    def num_classes(self):
        return self.stats[3]

    @property
    def num_labels(self):
        return self.num_classes


class CoraGraphDataset(_CitationDataset):
    name = "cora"
    stats = (2708, 10556, 1433, 7)


class CiteseerGraphDataset(_CitationDataset):
    name = "citeseer"
    stats = (3327, 9104, 3703, 6)


class PubmedGraphDataset(_CitationDataset):
    name = "pubmed"
    stats = (19717, 88648, 500, 3)
