"""Tensor parallelism (model-axis weight sharding) for wide GNN layers.

SURVEY.md §2.3 marks TP "absent (dense layers replicated)" in the
reference; this module is the TPU-native option the reference never had.
The key structural fact: **g-SpMM is feature-parallel** — aggregation
touches each feature column independently — so a Megatron-style
column-parallel projection composes with graph aggregation at ZERO extra
communication: shard W1 on its output axis, keep the SpMM on the sharded
activations, and close with a row-parallel W2 whose psum XLA inserts
automatically from the sharding annotations (the scaling-book recipe:
pick a mesh, annotate, let XLA place collectives over ICI).

When to use: feature widths where a replicated weight matrix or the
(N, F) activations pressure HBM (F in the thousands); for GCN/GAT-scale
widths (<= 1k) replication wins — the measured matrix in
docs/PERF_NOTES.md shows SpMM is gather/HBM-bound, so slicing F only
divides the already-cheap dense work. That trade-off is why this stays an
opt-in helper rather than the default path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_params_tp", "make_tp_gcn_layer"]


def shard_params_tp(mesh: Mesh, w1: jnp.ndarray, w2: jnp.ndarray,
                    axis: str = "m"):
    """Place the Megatron pair: W1 column-sharded (out axis), W2
    row-sharded (in axis). Returns device arrays with the named
    shardings attached."""
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, axis)))
    w2s = jax.device_put(w2, NamedSharding(mesh, P(axis, None)))
    return w1s, w2s


def make_tp_gcn_layer(g, mesh: Mesh, axis: str = "m",
                      activation=jax.nn.relu):
    """Jittable ``y = act(Â @ (x W1)) W2`` with the hidden axis sharded
    over ``axis`` (Â = the graph aggregation; normalization is the
    caller's concern). ``x``/``y`` are replicated (compose with the graph
    partition axis for 2-D meshes); the only collective is the psum XLA
    inserts to un-shard W2's contraction.
    """
    from dgl1_tpu.ops import gspmm

    g = jax.device_put(g, NamedSharding(mesh, P()))

    def layer(w1, w2, x):
        h = x @ w1                      # (N, H/m) per device
        h = gspmm(g, "copy_lhs", "sum", h, None)  # feature-parallel
        h = activation(h)
        return h @ w2                   # row-parallel: psum closes it

    out_sharding = NamedSharding(mesh, P())
    return jax.jit(layer, out_shardings=out_sharding)
