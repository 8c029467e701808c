"""Graph-construction modules for point clouds (parity:
``python/dgl/nn/pytorch/factory.py`` — ``KNNGraph`` / ``SegmentedKNNGraph``).

Thin callable wrappers over :func:`dgl1_tpu.transform.knn_graph`; the
pairwise-distance step is one dense MXU matmul.
"""

from __future__ import annotations

from dgl1_tpu.transform import knn_graph, segmented_knn_graph

__all__ = ["KNNGraph", "SegmentedKNNGraph"]


class KNNGraph:
    """Layer that turns (N, D) or (B, N, D) point sets into kNN graphs."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x):
        return knn_graph(x, self.k)


class SegmentedKNNGraph:
    """kNN graphs within segments of a packed point set."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x, segs):
        return segmented_knn_graph(x, self.k, segs)
