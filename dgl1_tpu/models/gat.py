"""Multi-head GAT (parity: ``examples/pytorch/gat/train.py`` model:
8-head hidden layers with ELU, 1-head mean-averaged output layer)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn.conv import GATConv

__all__ = ["GAT"]


class GAT(nn.Module):
    hidden_feats: int
    out_feats: int
    num_layers: int = 2
    heads: int = 8
    out_heads: int = 1
    feat_drop: float = 0.6
    attn_drop: float = 0.6
    negative_slope: float = 0.2
    residual: bool = False

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h = feat
        for i in range(self.num_layers - 1):
            h = GATConv(
                self.hidden_feats,
                num_heads=self.heads,
                feat_drop=self.feat_drop,
                attn_drop=self.attn_drop,
                negative_slope=self.negative_slope,
                residual=self.residual,
                name=f"layer{i}",
            )(g, h, deterministic=deterministic)
            h = nn.elu(h.reshape(h.shape[0], -1))
        out = GATConv(
            self.out_feats,
            num_heads=self.out_heads,
            feat_drop=self.feat_drop,
            attn_drop=self.attn_drop,
            negative_slope=self.negative_slope,
            residual=self.residual,
            name=f"layer{self.num_layers - 1}",
        )(g, h, deterministic=deterministic)
        return out.mean(axis=1)
