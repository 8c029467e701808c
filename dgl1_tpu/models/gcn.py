"""2+-layer GCN (parity: ``examples/pytorch/gcn/train.py`` model)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn.conv import GraphConv

__all__ = ["GCN"]


class GCN(nn.Module):
    hidden_feats: int
    out_feats: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h = feat
        for i in range(self.num_layers - 1):
            h = GraphConv(self.hidden_feats, name=f"layer{i}")(g, h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return GraphConv(self.out_feats, name=f"layer{self.num_layers - 1}")(
            g, h
        )
