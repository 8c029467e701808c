"""Heterogeneous graph attention network (HAN).

Parity: ``examples/pytorch/han/model.py`` — per-metapath GAT over the
metapath-reachable graphs plus a semantic attention that mixes the
metapath-specific embeddings. TPU-native: the metapath graphs are
precomputed once on the host (:func:`dgl1_tpu.metapath_reachable_graph`)
and the per-metapath GATs run as independent fused-attention passes; the
semantic mix is two dense MXU matmuls.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn.conv import GATConv

__all__ = ["SemanticAttention", "HANLayer", "HAN"]


class SemanticAttention(nn.Module):
    """Attention over M metapath channels: score each channel by a shared
    MLP averaged over nodes, softmax across channels, weighted sum."""

    hidden_size: int = 128

    @nn.compact
    def __call__(self, z):  # z: (N, M, D)
        w = nn.Dense(self.hidden_size, name="project")(z)
        w = jnp.tanh(w)
        w = nn.Dense(1, use_bias=False, name="score")(w)  # (N, M, 1)
        beta = jax.nn.softmax(jnp.mean(w, axis=0), axis=0)  # (M, 1)
        return jnp.sum(z * beta[None], axis=1)  # (N, D)


class HANLayer(nn.Module):
    """One HAN layer: a GATConv per metapath graph + semantic attention."""

    num_metapaths: int
    out_feats: int
    num_heads: int = 8
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graphs: Sequence[Graph], h, deterministic=True):
        assert len(graphs) == self.num_metapaths
        outs = []
        for i, g in enumerate(graphs):
            z = GATConv(
                self.out_feats,
                num_heads=self.num_heads,
                feat_drop=self.dropout,
                attn_drop=self.dropout,
                activation=nn.elu,
                name=f"gat_{i}",
            )(g, h, deterministic=deterministic)
            outs.append(z.reshape(z.shape[0], -1))  # (N, H*F)
        z = jnp.stack(outs, axis=1)  # (N, M, H*F)
        return SemanticAttention(name="semantic")(z)


class HAN(nn.Module):
    """Stacked HAN layers + linear classifier (parity:
    ``examples/pytorch/han/model.py :: HAN``). Call with the list of
    metapath-reachable graphs (homogeneous, one node type)."""

    num_metapaths: int
    hidden_feats: int
    out_feats: int
    num_heads: int = 8
    num_layers: int = 1
    dropout: float = 0.6

    @nn.compact
    def __call__(self, graphs: Sequence[Graph], h, deterministic=True):
        for i in range(self.num_layers):
            h = HANLayer(
                self.num_metapaths,
                self.hidden_feats,
                num_heads=self.num_heads,
                dropout=self.dropout,
                name=f"layer{i}",
            )(graphs, h, deterministic=deterministic)
        return nn.Dense(self.out_feats, name="predict")(h)
