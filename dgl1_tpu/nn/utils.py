"""NN utilities (parity: ``python/dgl/nn/pytorch/utils.py``)."""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["WeightBasis"]


class WeightBasis(nn.Module):
    """Basis-decomposed weight bank (parity: ``utils.py :: WeightBasis``):
    ``num_outputs`` weights of given shape composed from ``num_bases``
    shared bases — the R-GCN regularizer, exposed standalone."""

    shape: Tuple[int, ...]
    num_bases: int
    num_outputs: int

    @nn.compact
    def __call__(self):
        basis = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_bases,) + tuple(self.shape),
        )
        coeff = self.param(
            "w_comp", nn.initializers.xavier_uniform(),
            (self.num_outputs, self.num_bases),
        )
        flat = basis.reshape(self.num_bases, -1)
        return (coeff @ flat).reshape(
            (self.num_outputs,) + tuple(self.shape)
        )
