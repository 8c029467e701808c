"""GraphSAGE for full-graph and mini-batch (blocks) training.

Parity: ``examples/pytorch/graphsage/train_full.py`` and the mini-batch
``train_sampling.py`` model (forward over a list of blocks).
"""

from __future__ import annotations

from typing import List, Union

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn.conv import SAGEConv

__all__ = ["GraphSAGE"]


class GraphSAGE(nn.Module):
    hidden_feats: int
    out_feats: int
    num_layers: int = 2
    aggregator: str = "mean"
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Union[Graph, List[Graph]], feat,
                 deterministic: bool = True):
        blocks = g if isinstance(g, (list, tuple)) else [g] * self.num_layers
        h = feat
        for i in range(self.num_layers):
            out = (self.out_feats if i == self.num_layers - 1
                   else self.hidden_feats)
            h = SAGEConv(out, aggregator_type=self.aggregator,
                         name=f"layer{i}")(blocks[i], h,
                                           deterministic=deterministic)
            if i != self.num_layers - 1:
                h = nn.relu(h)
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
