"""Typed/heterogeneous linear layers (parity:
``python/dgl/nn/pytorch/linear.py``)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu.ops.segment import gather_mm, segment_mm

__all__ = ["TypedLinear", "HeteroLinear", "HeteroEmbedding"]


class TypedLinear(nn.Module):
    """Per-type linear: ``y_i = x_i @ W[type_i]`` (parity:
    ``linear.py :: TypedLinear``, the HGT/R-GCN building block).

    TPU-native: rows sorted by type use ``jax.lax.ragged_dot`` (grouped
    MXU GEMM, ``sorted_by_type=True``); unsorted rows use the one-hot
    ``gather_mm`` mixture (fine for small ``num_types``). Optional basis
    regularization shares ``num_bases`` bases across types.
    """

    in_size: int
    out_size: int
    num_types: int
    regularizer: Optional[str] = None  # None | 'basis'
    num_bases: int = 0

    def _weights(self):
        if self.regularizer is None:
            return self.param(
                "weight", nn.initializers.xavier_uniform(),
                (self.num_types, self.in_size, self.out_size))
        if self.regularizer == "basis":
            basis = self.param(
                "basis", nn.initializers.xavier_uniform(),
                (self.num_bases, self.in_size, self.out_size))
            coeff = self.param(
                "coeff", nn.initializers.xavier_uniform(),
                (self.num_types, self.num_bases))
            return jnp.einsum("tb,bio->tio", coeff, basis)
        raise ValueError(f"unsupported regularizer {self.regularizer!r}")

    @nn.compact
    def __call__(self, x, x_type, sorted_by_type: bool = False):
        w = self._weights()
        if sorted_by_type:
            counts = jnp.bincount(x_type, length=self.num_types)
            return segment_mm(x, w, counts)
        return gather_mm(x, w, x_type)


class HeteroLinear(nn.Module):
    """Per-node-type dense projections over a feature dict (parity:
    ``linear.py :: HeteroLinear``). ``in_sizes`` maps ntype -> input
    width (keys fix the set of types)."""

    in_sizes: Dict[str, int]
    out_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, feat_dict: Dict[str, jnp.ndarray]):
        out = {}
        for t in self.in_sizes:
            if t in feat_dict:
                out[t] = nn.Dense(self.out_size, use_bias=self.use_bias,
                                  name=f"fc_{t}")(feat_dict[t])
        return out


class HeteroEmbedding(nn.Module):
    """Per-node-type embedding tables (parity:
    ``linear.py :: HeteroEmbedding``). ``num_embeddings`` maps
    ntype -> table size. Call with a dict of id arrays (or no argument
    via ``weights()`` semantics: pass the full ``jnp.arange`` ids)."""

    num_embeddings: Dict[str, int]
    embedding_dim: int

    @nn.compact
    def __call__(self, ids_dict: Dict[str, jnp.ndarray]):
        out = {}
        for t, n in self.num_embeddings.items():
            if t in ids_dict:
                emb = nn.Embed(n, self.embedding_dim, name=f"emb_{t}")
                out[t] = emb(ids_dict[t])
        return out
