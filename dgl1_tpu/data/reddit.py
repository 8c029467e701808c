"""Reddit dataset (parity: ``python/dgl/data/reddit.py``).

Real raw files (``reddit_data.npz``: feature/label/node_types arrays,
``reddit_graph.npz``: scipy CSR adjacency — the reference's exact on-disk
format) are parsed when present under the data dir. Offline fallback: a
scaled synthetic SBM (``is_synthetic`` flags it). The real Reddit is
232,965 nodes / 114M edges / 602 feats / 41 classes; pass
``full_scale=True`` for a full-size synthetic.
"""

from __future__ import annotations

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.synthetic import synthetic_classification_graph

__all__ = ["RedditDataset"]


class RedditDataset(GraphDataset):
    name = "reddit"
    num_classes = 41

    def __init__(self, full_scale: bool = False, **kw):
        self.full_scale = full_scale
        if full_scale:
            self.name = "reddit_full"
        super().__init__(**kw)

    def _has_raw(self) -> bool:
        return ((self.raw_dir / "reddit_data.npz").exists()
                and (self.raw_dir / "reddit_graph.npz").exists())

    def _load_raw(self):
        """Parity: ``RedditDataset.process`` — node_types 1/2/3 are the
        train/val/test split."""
        import jax.numpy as jnp
        from scipy import sparse as sp

        from dgl1_tpu.graph import from_scipy

        data = np.load(self.raw_dir / "reddit_data.npz")
        adj = sp.load_npz(self.raw_dir / "reddit_graph.npz")
        g = from_scipy(adj)
        types = data["node_types"]
        g.ndata["feat"] = jnp.asarray(data["feature"].astype(np.float32))
        g.ndata["label"] = jnp.asarray(data["label"].astype(np.int32))
        g.ndata["train_mask"] = jnp.asarray(types == 1)
        g.ndata["val_mask"] = jnp.asarray(types == 2)
        g.ndata["test_mask"] = jnp.asarray(types == 3)
        return [g], {}

    def _generate(self):
        scale = 1 if self.full_scale else 10
        g = synthetic_classification_graph(
            num_nodes=232965 // scale,
            num_classes=41,
            feat_dim=602,
            avg_degree=50.0 if self.full_scale else 25.0,
            train_per_class=2000 // scale or 20,
            num_val=2000,
            num_test=5000,
            seed=41,
        )
        return [g], {}
