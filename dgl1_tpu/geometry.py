"""Geometry package (parity: ``python/dgl/geometry/``): point-cloud
helpers used by PointNet++-style models."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["farthest_point_sampler", "neighbor_matching"]


def farthest_point_sampler(pos, npoints: int, start_idx=None):
    """Iterative farthest-point sampling (parity:
    ``python/dgl/geometry/fps.py``): greedily pick the point maximizing
    the distance to the chosen set.

    ``pos``: (B, N, C) batched coordinates. Returns (B, npoints) int32
    indices. TPU-native: the selection loop is a ``lax.fori_loop`` over a
    running min-distance field — O(npoints * N) fully vectorized, no
    host sync per step.
    """
    pos = jnp.asarray(pos)
    if pos.ndim == 2:
        return farthest_point_sampler(pos[None], npoints, start_idx)[0]
    B, N, C = pos.shape
    if start_idx is None:
        start = jnp.zeros((B,), jnp.int32)
    else:
        start = jnp.full((B,), int(start_idx), jnp.int32)

    def body(i, state):
        sel, mind = state
        last = sel[:, i - 1]  # (B,)
        lastpos = jnp.take_along_axis(
            pos, last[:, None, None].astype(jnp.int32), axis=1)  # (B,1,C)
        d = jnp.sum((pos - lastpos) ** 2, axis=-1)  # (B, N)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)
        sel = sel.at[:, i].set(nxt)
        return sel, mind

    sel0 = jnp.zeros((B, npoints), jnp.int32).at[:, 0].set(start)
    mind0 = jnp.full((B, N), jnp.inf, pos.dtype)
    sel, _ = jax.lax.fori_loop(1, npoints, body, (sel0, mind0))
    return sel


def neighbor_matching(g, num_clusters=None, edge_weights=None,
                      relabel_idx: bool = True):
    """Edge-coarsening by greedy heavy-edge neighbor matching (parity:
    ``python/dgl/geometry/edge_coarsening.py``): visit edges by
    descending weight, match endpoints not yet matched. Returns per-node
    cluster ids (host-side numpy — graph coarsening is offline work).
    """
    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    n = g.num_nodes()
    w = (np.asarray(edge_weights)[:e] if edge_weights is not None
         else np.ones(e))
    order = np.argsort(-w, kind="stable")
    match = np.full(n, -1, np.int64)
    for i in order:
        u, v = int(src[i]), int(dst[i])
        if u != v and match[u] < 0 and match[v] < 0:
            match[u] = v
            match[v] = u
    cluster = np.arange(n)
    matched = match >= 0
    cluster[matched] = np.minimum(np.arange(n)[matched], match[matched])
    if relabel_idx:
        _, cluster = np.unique(cluster, return_inverse=True)
    return cluster
