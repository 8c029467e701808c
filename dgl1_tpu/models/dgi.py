"""Deep Graph Infomax (parity: ``examples/pytorch/dgi/dgi.py``):
unsupervised node embeddings by maximizing mutual information between
patch (node) representations and a graph summary, against a
feature-shuffled corruption."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn import GraphConv

__all__ = ["DGI", "DGIEncoder"]


class DGIEncoder(nn.Module):
    hidden: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, g: Graph, x):
        for i in range(self.num_layers):
            x = GraphConv(self.hidden, name=f"conv{i}")(g, x)
            x = nn.PReLU(name=f"prelu{i}")(x)
        return x


class DGI(nn.Module):
    """``loss = DGI().apply(params, g, feat, perm)``; embeddings via
    ``method='embed'``. ``perm`` is a node permutation (the corruption —
    the reference shuffles features row-wise)."""

    hidden: int
    num_layers: int = 1

    def setup(self):
        self.encoder = DGIEncoder(self.hidden, self.num_layers)
        self.weight = self.param(
            "discriminator", nn.initializers.xavier_uniform(),
            (self.hidden, self.hidden))

    def embed(self, g: Graph, feat):
        return self.encoder(g, feat)

    def __call__(self, g: Graph, feat, perm):
        pos = self.encoder(g, feat)
        neg = self.encoder(g, feat[perm])
        summary = nn.sigmoid(jnp.mean(pos, axis=0))
        pos_score = pos @ (self.weight @ summary)
        neg_score = neg @ (self.weight @ summary)
        # BCE with logits: positives -> 1, corrupted -> 0.
        pos_loss = jnp.mean(jax.nn.softplus(-pos_score))
        neg_loss = jnp.mean(jax.nn.softplus(neg_score))
        return pos_loss + neg_loss
