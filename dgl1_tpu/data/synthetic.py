"""Deterministic synthetic graph generators.

This environment has no network access, so the citation/Reddit/OGB dataset
classes fall back to deterministic synthetic graphs with the same schema
(features/labels/masks) and comparable shape statistics when the raw files
are absent. The generator is an SBM with class-correlated features tuned
so that structure-aware models (GCN/GAT/SAGE) beat a feature-only MLP —
preserving the *benchmark role* of the originals (learnability + accuracy
gates), which is the only role they can play offline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu.graph import Graph, graph
from dgl1_tpu.transform import to_bidirected

__all__ = ["synthetic_classification_graph", "powerlaw_graph"]


def synthetic_classification_graph(
    num_nodes: int,
    num_classes: int,
    feat_dim: int,
    avg_degree: float = 4.0,
    homophily: float = 0.9,
    feature_noise: float = None,
    train_per_class: int = 20,
    num_val: int = 500,
    num_test: int = 1000,
    seed: int = 0,
    bidirected: bool = True,
) -> Graph:
    """SBM graph + noisy class-centroid features + citation-style splits.

    ``feature_noise`` defaults to ``0.35 * sqrt(feat_dim)`` so that
    feature-only classification is well below ceiling (class-mean
    separation ||dmu||^2 / sigma^2 ~ 5) while neighborhood averaging
    recovers most of it — preserving the benchmark's property that
    structure-aware models beat feature-only ones.
    """
    rng = np.random.default_rng(seed)
    if feature_noise is None:
        feature_noise = 0.35 * float(np.sqrt(feat_dim))
    labels = rng.integers(0, num_classes, size=num_nodes)

    # Sparse SBM sampling: draw edge endpoints biased to same-class pairs.
    num_edges = int(num_nodes * avg_degree)
    src = rng.integers(0, num_nodes, size=num_edges)
    same = rng.random(num_edges) < homophily
    # For homophilous edges pick a random node of the same class.
    order = np.argsort(labels, kind="stable")
    class_start = np.searchsorted(labels[order], np.arange(num_classes))
    class_count = np.bincount(labels, minlength=num_classes)
    rand_same = order[
        class_start[labels[src]]
        + (rng.random(num_edges) * class_count[labels[src]]).astype(np.int64)
    ]
    rand_any = rng.integers(0, num_nodes, size=num_edges)
    dst = np.where(same, rand_same, rand_any)
    keep = src != dst
    g = graph((src[keep], dst[keep]), num_nodes=num_nodes)
    if bidirected:
        g = to_bidirected(g)

    centroids = rng.normal(size=(num_classes, feat_dim))
    feats = centroids[labels] + feature_noise * rng.normal(
        size=(num_nodes, feat_dim)
    )

    train_mask = np.zeros(num_nodes, dtype=bool)
    for c in range(num_classes):
        ids = np.nonzero(labels == c)[0]
        train_mask[rng.choice(ids, size=min(train_per_class, len(ids)),
                              replace=False)] = True
    rest = np.nonzero(~train_mask)[0]
    rest = rng.permutation(rest)
    val_mask = np.zeros(num_nodes, dtype=bool)
    test_mask = np.zeros(num_nodes, dtype=bool)
    val_mask[rest[:num_val]] = True
    test_mask[rest[num_val:num_val + num_test]] = True

    import jax.numpy as jnp

    g.ndata["feat"] = jnp.asarray(feats.astype(np.float32))
    g.ndata["label"] = jnp.asarray(labels.astype(np.int32))
    g.ndata["train_mask"] = jnp.asarray(train_mask)
    g.ndata["val_mask"] = jnp.asarray(val_mask)
    g.ndata["test_mask"] = jnp.asarray(test_mask)
    return g


def powerlaw_graph(num_nodes: int, avg_degree: int, alpha: float = 2.1,
                   seed: int = 0, **kw) -> Graph:
    """Power-law degree graph (Zipf out-degrees) for kernel benchmarking —
    reproduces the skew that stresses SpMM tiling on real graphs."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    # Zipf-weighted destination choice via inverse-CDF on ranks.
    ranks = np.arange(1, num_nodes + 1, dtype=np.float64)
    w = ranks ** -alpha
    cdf = np.cumsum(w)
    cdf /= cdf[-1]
    dst = np.searchsorted(cdf, rng.random(num_edges)).astype(np.int64)
    src = rng.integers(0, num_nodes, size=num_edges)
    return graph((src, dst), num_nodes=num_nodes, **kw)
