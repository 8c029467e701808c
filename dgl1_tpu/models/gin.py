"""GIN graph classifier (parity: ``examples/pytorch/gin/gin.py`` —
GIN with per-layer MLPs, sum/mean readout over every layer's
representation, jumping-knowledge style prediction sum)."""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn import AvgPooling, GINConv, SumPooling

__all__ = ["GIN"]


class _MLP(nn.Module):
    hidden: int
    out: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.LayerNorm(name=f"ln{i}")(
                nn.Dense(self.hidden, name=f"fc{i}")(x)))
        return nn.Dense(self.out, name="fc_out")(x)


class GIN(nn.Module):
    """``GIN(hidden, classes)``: ``num_layers`` GINConv blocks, readout
    from every layer (incl. input) summed into the logits (the paper's
    and the reference example's configuration)."""

    hidden: int
    classes: int
    num_layers: int = 5
    learn_eps: bool = False
    readout: str = "sum"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, x, deterministic: bool = True):
        pool = SumPooling() if self.readout == "sum" else AvgPooling()
        hidden_rep = [x]
        for i in range(self.num_layers - 1):
            mlp = _MLP(self.hidden, self.hidden, name=f"mlp{i}")
            x = GINConv(apply_func=mlp, learn_eps=self.learn_eps,
                        name=f"gin{i}")(g, x)
            x = nn.relu(nn.LayerNorm(name=f"bn{i}")(x))
            hidden_rep.append(x)
        score = 0.0
        for i, h in enumerate(hidden_rep):
            hg = pool(g, h)
            if self.dropout > 0 and not deterministic:
                hg = nn.Dropout(self.dropout, deterministic=False)(hg)
            score = score + nn.Dense(self.classes, name=f"pred{i}")(hg)
        return score
