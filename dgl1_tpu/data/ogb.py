"""OGB node-property datasets (ogbn-products / ogbn-mag / ogbn-papers100M).

Parity role: the reference's examples consume these via the ``ogb`` pip
package; here a loader parses the standard pre-downloaded OGB directory
layout if present (``raw/edge.csv.gz`` + ``raw/node-feat.csv.gz`` +
``raw/node-label.csv.gz`` [+ ``num-node-list.csv.gz``], splits under
``split/*/{train,valid,test}.csv.gz`` — uncompressed ``.csv`` and the
``.npy`` processed variants are accepted too), else generates scaled
synthetic stand-ins (clearly flagged via ``is_synthetic``) so the
benchmark configs in BASELINE.md remain runnable offline.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.synthetic import synthetic_classification_graph

__all__ = ["OGBDataset"]


def _find(dirpath: Path, stem: str):
    """Locate ``stem`` as .csv.gz / .csv / .npy under ``dirpath``."""
    for suffix in (".csv.gz", ".csv", ".npy"):
        p = dirpath / f"{stem}{suffix}"
        if p.exists():
            return p
    return None


def _load_table(path: Path, dtype):
    """Load one OGB table (comma-separated numeric rows, or .npy)."""
    if path.suffix == ".npy":
        return np.load(path).astype(dtype)
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rt") as f:
        arr = np.loadtxt(f, delimiter=",", dtype=dtype, ndmin=2)
    return arr

_STATS = {
    # name: (nodes, avg_degree, feat_dim, classes, scale_divisor)
    "ogbn-products": (2_449_029, 50, 100, 47, 20),
    "ogbn-arxiv": (169_343, 13, 128, 40, 1),
    "ogbn-mag": (736_389, 28, 128, 349, 10),
    "ogbn-papers100M": (111_059_956, 15, 128, 172, 1000),
}


class OGBDataset(GraphDataset):
    """``OGBDataset('ogbn-arxiv')`` — returns one labeled graph.

    ``scale=1`` gives the true node count for the synthetic fallback;
    default scales large graphs down by the per-dataset divisor.
    """

    def __init__(self, name: str, scale: int = 0, **kw):
        if name not in _STATS:
            raise ValueError(f"unknown OGB dataset {name!r}")
        self.ogb_name = name
        self.name = name.replace("-", "_")
        nodes, deg, dim, classes, divisor = _STATS[name]
        self._scale = scale if scale > 0 else divisor
        self.num_classes = classes
        super().__init__(**kw)

    def _has_raw(self) -> bool:
        return _find(self.raw_dir / "raw", "edge") is not None

    def _load_raw(self):
        """Parse the standard OGB node-prop directory (homogeneous graphs;
        ogbn-mag's hetero layout is handled by the mag-specific loaders).

        Parity: what ``ogb.nodeproppred.DglNodePropPredDataset`` assembles
        from the same files."""
        import jax.numpy as jnp

        from dgl1_tpu.graph import graph as make_graph

        raw = self.raw_dir / "raw"
        edges = _load_table(_find(raw, "edge"), np.int64)
        n_path = _find(raw, "num-node-list")
        feat_path = _find(raw, "node-feat")
        label_path = _find(raw, "node-label")
        if n_path is not None:
            n = int(_load_table(n_path, np.int64).reshape(-1)[0])
        else:
            n = int(edges.max()) + 1
        g = make_graph((edges[:, 0], edges[:, 1]), num_nodes=n)
        if feat_path is not None:
            g.ndata["feat"] = jnp.asarray(
                _load_table(feat_path, np.float32))
        if label_path is not None:
            g.ndata["label"] = jnp.asarray(
                _load_table(label_path, np.int64).reshape(-1)
                .astype(np.int32))
        # Splits: any split/<scheme>/{train,valid,test} present.
        split_root = self.raw_dir / "split"
        if split_root.exists():
            schemes = sorted(p for p in split_root.iterdir() if p.is_dir())
            if schemes:
                for part, field in (("train", "train_mask"),
                                    ("valid", "val_mask"),
                                    ("test", "test_mask")):
                    p = _find(schemes[0], part)
                    if p is None:
                        continue
                    ids = _load_table(p, np.int64).reshape(-1)
                    mask = np.zeros((n,), bool)
                    mask[ids] = True
                    g.ndata[field] = jnp.asarray(mask)
        return [g], {}

    def _generate(self):
        nodes, deg, dim, classes, _ = _STATS[self.ogb_name]
        n = max(nodes // self._scale, 10 * classes)
        g = synthetic_classification_graph(
            num_nodes=n,
            num_classes=classes,
            feat_dim=dim,
            avg_degree=float(deg),
            train_per_class=max(20, n // (20 * classes)),
            num_val=min(5000, n // 10),
            num_test=min(10000, n // 5),
            seed=hash(self.ogb_name) % (2 ** 31),
        )
        return [g], {}
