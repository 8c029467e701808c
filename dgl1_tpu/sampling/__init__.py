"""Sampling package (parity: ``python/dgl/sampling``)."""

from dgl1_tpu.sampling.neighbor import sample_neighbors, select_topk
from dgl1_tpu.sampling.randomwalks import random_walk, node2vec_random_walk
from dgl1_tpu.sampling.negative import global_uniform_negative_sampling
from dgl1_tpu.sampling.pinsage import (
    PinSAGESampler,
    RandomWalkNeighborSampler,
)

__all__ = [
    "sample_neighbors",
    "select_topk",
    "random_walk",
    "node2vec_random_walk",
    "global_uniform_negative_sampling",
    "PinSAGESampler",
    "RandomWalkNeighborSampler",
]
