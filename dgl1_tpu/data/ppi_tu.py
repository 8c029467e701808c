"""PPI (multilabel inductive) and TU (graph classification) datasets.

Parity: ``python/dgl/data/ppi.py`` and ``python/dgl/data/tu.py``. Offline
fallbacks mirror the real datasets' shape statistics; PPI labels are
neighborhood-correlated so inductive GNNs beat feature-only models, and
TU graphs reuse the MiniGC topology generator with per-dataset stats.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.minigc import _GENERATORS
from dgl1_tpu.data.synthetic import synthetic_classification_graph
from dgl1_tpu.graph import Graph, graph
from dgl1_tpu.transform import to_bidirected

__all__ = ["PPIDataset", "TUDataset"]


class PPIDataset:
    """24 protein-protein interaction graphs, 50 feats, 121 binary labels
    (parity: ``dgl.data.PPIDataset``; ``mode`` in train/valid/test)."""

    def __init__(self, mode: str = "train", scale: int = 4, seed: int = 50):
        import jax.numpy as jnp

        counts = {"train": 20, "valid": 2, "test": 2}[mode]
        offset = {"train": 0, "valid": 20, "test": 22}[mode]
        self.graphs: List[Graph] = []
        self.labels = []
        for i in range(counts):
            rng = np.random.default_rng(seed + offset + i)
            n = int(rng.integers(2245 // scale, 3500 // scale))
            g = synthetic_classification_graph(
                num_nodes=n, num_classes=8, feat_dim=50,
                avg_degree=28.0 / scale, seed=seed + offset + i,
                train_per_class=1, num_val=1, num_test=1,
            )
            # Multilabel targets: 121 labels driven by class + noise.
            cls = np.asarray(g.ndata["label"])
            proto = rng.random((8, 121)) < 0.3
            y = proto[cls] ^ (rng.random((n, 121)) < 0.05)
            g.ndata["label"] = jnp.asarray(y.astype(np.float32))
            for k in ("train_mask", "val_mask", "test_mask"):
                del g.ndata[k]
            self.graphs.append(g)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Graph:
        return self.graphs[i]


_TU_STATS = {
    # name: (num_graphs, classes, min_nodes, max_nodes, feat_dim)
    "ENZYMES": (600, 6, 10, 60, 18),
    "PROTEINS": (1113, 2, 10, 60, 1),
    "DD": (1178, 2, 60, 200, 1),
    "MUTAG": (188, 2, 10, 28, 7),
}


class TUDataset:
    """TU graph-classification collections (parity: ``dgl.data.TUDataset``).

    Offline fallback: topology-class graphs (MiniGC generators) binned into
    the dataset's class count, with degree/noise node features.
    """

    def __init__(self, name: str = "ENZYMES", seed: int = 0):
        import jax.numpy as jnp

        if name not in _TU_STATS:
            raise ValueError(f"unknown TU dataset {name!r}")
        num_graphs, classes, lo, hi, fdim = _TU_STATS[name]
        self.num_classes = classes
        rng = np.random.default_rng(seed + hash(name) % 1000)
        self.graphs: List[Graph] = []
        self.labels: List[int] = []
        for _ in range(num_graphs):
            cls = int(rng.integers(0, classes))
            gen = _GENERATORS[cls % len(_GENERATORS)]
            n = int(rng.integers(lo, hi + 1))
            s, d = gen(n, rng)
            g = to_bidirected(graph((s, d)))
            deg = np.asarray(g.in_degrees(), dtype=np.float32)[:, None]
            noise = rng.normal(size=(g.num_nodes(), fdim)).astype(np.float32)
            feat = np.concatenate([deg, noise], axis=1)[:, :max(fdim, 1)]
            g.ndata["node_attr"] = jnp.asarray(feat)
            self.graphs.append(g)
            self.labels.append(cls)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, int]:
        return self.graphs[i], self.labels[i]


_GIN_STATS = {
    # name: (num_graphs, classes, min_nodes, max_nodes)
    "MUTAG": (188, 2, 10, 28),
    "COLLAB": (5000, 3, 32, 120),
    "IMDBBINARY": (1000, 2, 12, 136),
    "IMDBMULTI": (1500, 3, 7, 89),
    "NCI1": (4110, 2, 10, 111),
    "PROTEINS": (1113, 2, 10, 60),
    "PTC": (344, 2, 6, 64),
    "REDDITBINARY": (2000, 2, 60, 400),
    "REDDITMULTI5K": (5000, 5, 60, 400),
}


class GINDataset:
    """Graph-kernel datasets with GIN preprocessing (parity:
    ``python/dgl/data/gindt.py :: GINDataset``): one-hot degree (or node
    label) features in ``ndata['attr']``, optional self loops.

    Offline fallback: MiniGC topology generators at the named dataset's
    graph-count/class/size statistics (``num_molecules`` caps the count
    so tests stay fast).
    """

    def __init__(self, name: str = "MUTAG", self_loop: bool = False,
                 degree_as_nlabel: bool = True, max_graphs: int = 512,
                 seed: int = 0):
        import jax.numpy as jnp

        from dgl1_tpu.transform import add_self_loop

        if name not in _GIN_STATS:
            raise ValueError(f"unknown GIN dataset {name!r}")
        num_graphs, classes, lo, hi = _GIN_STATS[name]
        num_graphs = min(num_graphs, max_graphs)
        self.num_classes = self.gclasses = classes
        rng = np.random.default_rng(seed + hash(name) % 1000)
        self.graphs: List[Graph] = []
        self.labels: List[int] = []
        max_deg = 0
        raw = []
        for _ in range(num_graphs):
            cls = int(rng.integers(0, classes))
            gen = _GENERATORS[cls % len(_GENERATORS)]
            n = int(rng.integers(lo, min(hi, 64) + 1))
            s, d = gen(n, rng)
            g = to_bidirected(graph((s, d)))
            if self_loop:
                g = add_self_loop(g)
            deg = np.asarray(g.in_degrees())
            max_deg = max(max_deg, int(deg.max()))
            raw.append((g, deg, cls))
        self.dim_nfeats = max_deg + 1
        for g, deg, cls in raw:
            onehot = np.zeros((g.num_nodes(), max_deg + 1), np.float32)
            onehot[np.arange(g.num_nodes()), deg] = 1.0
            g.ndata["attr"] = jnp.asarray(onehot)
            g.ndata["label"] = jnp.asarray(deg.astype(np.int64))
            self.graphs.append(g)
            self.labels.append(cls)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, int]:
        return self.graphs[i], self.labels[i]


__all__.append("GINDataset")
