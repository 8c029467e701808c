"""R-GCN entity classification (parity: ``examples/pytorch/rgcn/entity_classify.py``)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.nn.conv import RelGraphConv

__all__ = ["RGCN"]


class RGCN(nn.Module):
    num_nodes: int
    hidden_feats: int
    out_feats: int
    num_rels: int
    num_bases: int = 0
    num_layers: int = 2
    self_loop: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, etypes, feat=None, deterministic: bool = True,
                 presorted: bool = False, etype_counts=None,
                 rel_graphs=None, union_graph=None):
        if feat is None:
            # Featureless entity classification: learned node embeddings.
            embed = self.param(
                "embed",
                nn.initializers.xavier_uniform(),
                (self.num_nodes, self.hidden_feats),
            )
            h = embed
            in_feats = self.hidden_feats
        else:
            h = feat
            in_feats = feat.shape[-1]
        reg = "basis" if self.num_bases > 0 else None
        for i in range(self.num_layers):
            out = (self.out_feats if i == self.num_layers - 1
                   else self.hidden_feats)
            h = RelGraphConv(
                in_feats=in_feats if i == 0 else self.hidden_feats,
                out_feats=out,
                num_rels=self.num_rels,
                regularizer=reg,
                num_bases=self.num_bases,
                self_loop=self.self_loop,
                dropout=self.dropout,
                activation=nn.relu if i != self.num_layers - 1 else None,
                name=f"layer{i}",
            )(g, h, etypes, presorted=presorted, etype_counts=etype_counts,
              rel_graphs=rel_graphs, union_graph=union_graph,
              deterministic=deterministic)
        return h
