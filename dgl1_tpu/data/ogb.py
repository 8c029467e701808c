"""OGB node-property datasets (ogbn-products / ogbn-mag / ogbn-papers100M).

Parity role: the reference's examples consume these via the ``ogb`` pip
package; here a thin loader reads pre-downloaded OGB numpy files if
present, else generates scaled synthetic stand-ins (clearly flagged) so the
benchmark configs in BASELINE.md remain runnable offline.
"""

from __future__ import annotations

import numpy as np

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.synthetic import synthetic_classification_graph

__all__ = ["OGBDataset"]

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
