"""Reddit dataset (parity: ``python/dgl/data/reddit.py``).

Offline fallback: a scaled synthetic SBM. The real Reddit is 232,965 nodes
/ 114M edges / 602 feats / 41 classes; generating that offline is feasible
but slow, so the fallback defaults to a 1/10-scale graph with the same
schema — pass ``full_scale=True`` for the full-size synthetic.
"""

from __future__ import annotations

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
