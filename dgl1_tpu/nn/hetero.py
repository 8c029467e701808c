"""HeteroGraphConv: apply a per-relation module and combine per-dsttype.

Parity: ``python/dgl/nn/pytorch/hetero.py :: HeteroGraphConv``.
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.heterograph import HeteroGraph

__all__ = ["HeteroGraphConv"]


class HeteroGraphConv(nn.Module):
    """``mods`` maps edge-type name -> module; ``aggregate`` combines results
    landing on the same destination node type ('sum'/'mean'/'max'/'min'/
    'stack')."""

    mods: Dict[str, nn.Module]
    aggregate: str = "sum"

    @nn.compact
    def __call__(self, hg: HeteroGraph, inputs: Dict[str, jnp.ndarray]):
        per_dst: Dict[str, list] = {}
        for c in hg.canonical_etypes:
            srctype, etype, dsttype = c
            if etype not in self.mods or srctype not in inputs:
                continue
            rel = hg.rel_graphs[c]
            if dsttype in inputs:
                # On a hetero block the dst nodes are the first
                # num_dst rows of the dsttype's src-side features
                # (to_block puts seeds first); on a full heterograph
                # the slice is a no-op.
                dst_feat = inputs[dsttype][: rel.num_dst_nodes()]
                out = self.mods[etype](rel, (inputs[srctype], dst_feat))
            else:
                out = self.mods[etype](rel, inputs[srctype])
            per_dst.setdefault(dsttype, []).append(out)
        results = {}
        for dsttype, outs in per_dst.items():
            if self.aggregate == "sum":
                results[dsttype] = sum(outs[1:], outs[0])
            elif self.aggregate == "mean":
                results[dsttype] = sum(outs[1:], outs[0]) / len(outs)
            elif self.aggregate == "max":
                v = outs[0]
                for w in outs[1:]:
                    v = jnp.maximum(v, w)
                results[dsttype] = v
            elif self.aggregate == "min":
                v = outs[0]
                for w in outs[1:]:
                    v = jnp.minimum(v, w)
                results[dsttype] = v
            elif self.aggregate == "stack":
                results[dsttype] = jnp.stack(outs, axis=1)
            else:
                raise ValueError(f"unknown aggregate {self.aggregate!r}")
        return results
