"""Negative samplers for link prediction (parity:
``python/dgl/dataloading/negative_sampler.py``)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu import random as dgl_random

from dgl1_tpu.graph import Graph

__all__ = ["Uniform", "PerSourceUniform"]


class Uniform:
    """For each positive edge, draw k uniform random destination nodes
    (parity: ``negative_sampler.Uniform``)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, g: Graph, eids: np.ndarray,
                 rng: Optional[np.random.Generator] = None):
        rng = rng or dgl_random.default_rng()
        eids = np.asarray(eids, dtype=np.int64)
        src = np.asarray(g.src)[eids]
        neg_src = np.repeat(src, self.k)
        neg_dst = rng.integers(
            0, g.num_dst_nodes(), size=len(neg_src), dtype=np.int64
        )
        return neg_src, neg_dst


# Alias: the reference's Uniform is per-source uniform.
PerSourceUniform = Uniform
