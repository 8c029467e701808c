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

__all__ = ["synthetic_classification_graph", "powerlaw_graph",
           "synthetic_mag_heterograph"]


def synthetic_mag_heterograph(scale: int = 10, num_classes: int = 349,
                              feat_dim: int = 128, seed: int = 7):
    """ogbn-mag-shaped synthetic heterograph (clearly flagged stand-in).

    Schema matches the real ogbn-mag (the reference trains R-GCN on it —
    ``examples/pytorch/rgcn-hetero``): ntypes paper/author/institution/
    field_of_study; etypes writes, cites, affiliated_with, has_topic (plus
    reverses so papers RECEIVE messages from every modality). Labels and
    features live on papers; the relational signal is learnable — fields
    and authors carry class affinity, so a hetero model beats paper-only.

    Returns ``(hg, split)`` where papers have ``feat``/``label`` in
    ``hg.nodes['paper'].data`` and split is {train/val/test: ids}.
    """
    rng = np.random.default_rng(seed)
    n_paper = max(736_389 // scale, num_classes * 10)
    n_author = max(1_134_649 // scale, 100)
    n_inst = max(8_740 // max(scale // 4, 1), 20)
    n_field = max(59_965 // scale, num_classes)

    lab_p = rng.integers(0, num_classes, size=n_paper)
    # Authors and fields get a home class; their edges prefer it.
    lab_a = rng.integers(0, num_classes, size=n_author)
    lab_f = np.concatenate([
        np.arange(num_classes),  # every class has at least one field
        rng.integers(0, num_classes, size=n_field - num_classes),
    ])

    def _pick_same(lab_dst_pool, want_class, p_same=0.8):
        """Endpoint ids from lab_dst_pool, biased to the wanted class."""
        order = np.argsort(lab_dst_pool, kind="stable")
        start = np.searchsorted(lab_dst_pool[order],
                                np.arange(num_classes))
        count = np.bincount(lab_dst_pool, minlength=num_classes)
        same = rng.random(len(want_class)) < p_same
        r_same = order[start[want_class] + (
            rng.random(len(want_class)) * np.maximum(count[want_class], 1)
        ).astype(np.int64)]
        r_any = rng.integers(0, len(lab_dst_pool), size=len(want_class))
        return np.where(same & (count[want_class] > 0), r_same, r_any)

    # writes: ~7 papers per author, class-aligned.
    e_w = n_author * 7
    a_w = rng.integers(0, n_author, size=e_w)
    p_w = _pick_same(lab_p, lab_a[a_w])
    # cites: homophilous paper-paper, avg out-degree ~10.
    e_c = n_paper * 10
    p_c_src = rng.integers(0, n_paper, size=e_c)
    p_c_dst = _pick_same(lab_p, lab_p[p_c_src])
    # affiliated_with: authors -> institutions (no class signal).
    e_af = n_author * 1
    a_af = rng.integers(0, n_author, size=e_af)
    i_af = rng.integers(0, n_inst, size=e_af)
    # has_topic: papers -> class-aligned fields, ~5 each.
    e_t = n_paper * 5
    p_t = rng.integers(0, n_paper, size=e_t)
    f_t = _pick_same(lab_f, lab_p[p_t])

    from dgl1_tpu.heterograph import heterograph

    counts = {"paper": n_paper, "author": n_author,
              "institution": n_inst, "field_of_study": n_field}
    hg = heterograph({
        ("author", "writes", "paper"): (a_w, p_w),
        ("paper", "rev_writes", "author"): (p_w, a_w),
        ("paper", "cites", "paper"): (p_c_src, p_c_dst),
        ("author", "affiliated_with", "institution"): (a_af, i_af),
        ("institution", "rev_affiliated_with", "author"): (i_af, a_af),
        ("paper", "has_topic", "field_of_study"): (p_t, f_t),
        ("field_of_study", "rev_has_topic", "paper"): (f_t, p_t),
    }, num_nodes_dict=counts)

    noise = 0.5 * float(np.sqrt(feat_dim))
    centroids = rng.normal(size=(num_classes, feat_dim))
    feat = (centroids[lab_p]
            + noise * rng.normal(size=(n_paper, feat_dim)))

    import jax.numpy as jnp

    hg.nodes["paper"].data["feat"] = jnp.asarray(feat.astype(np.float32))
    hg.nodes["paper"].data["label"] = jnp.asarray(lab_p.astype(np.int32))
    perm = rng.permutation(n_paper)
    n_tr = int(0.6 * n_paper)
    n_va = int(0.2 * n_paper)
    split = {"train": perm[:n_tr], "val": perm[n_tr:n_tr + n_va],
             "test": perm[n_tr + n_va:]}
    return hg, split


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


def geometric_graph(num_nodes: int, avg_degree: int, seed: int = 0,
                    **kw) -> Graph:
    """Local-band "geometric" graph: node ids are positions along a
    1-D embedding and edges connect nearby ids (Gaussian offsets), the
    locality structure of meshes/road networks — the regime where NO node
    is a hub and every engine sits on the per-edge gather wall (the
    benchmark matrix's anti-hub counterpoint to :func:`powerlaw_graph`)."""
    rng = np.random.default_rng(seed)
    num_edges = num_nodes * avg_degree
    src = rng.integers(0, num_nodes, size=num_edges)
    off = np.rint(rng.normal(0.0, max(avg_degree, 2), num_edges)
                  ).astype(np.int64)
    off = np.where(off == 0, 1, off)
    dst = np.clip(src + off, 0, num_nodes - 1)
    return graph((src, dst), num_nodes=num_nodes, **kw)


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
