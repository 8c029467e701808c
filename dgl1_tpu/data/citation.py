"""Citation datasets: Cora / Citeseer / Pubmed.

Parity: ``python/dgl/data/citation_graph.py``. Offline fallback: synthetic
SBM graphs with the true datasets' node/edge/class/feature statistics (the
real planetoid files are parsed if present under the data dir).
"""

from __future__ import annotations

from dgl1_tpu.data.base import GraphDataset
from dgl1_tpu.data.synthetic import synthetic_classification_graph

__all__ = ["CoraGraphDataset", "CiteseerGraphDataset", "PubmedGraphDataset"]


class _CitationDataset(GraphDataset):
    # (num_nodes, num_edges~, feat_dim, num_classes) of the real datasets.
    stats = (2708, 10556, 1433, 7)

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
