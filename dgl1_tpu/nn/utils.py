"""NN utilities (parity: ``python/dgl/nn/pytorch/utils.py``)."""

from __future__ import annotations

from typing import Sequence as _Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["WeightBasis", "Sequential"]


class Sequential(nn.Module):
    """Chain graph modules, threading ``(graph, feat)`` through each
    (parity: ``python/dgl/nn/pytorch/utils.py :: Sequential``). Modules
    that don't take a graph (plain activations/Dense) are called with
    the features alone."""

    layers: _Sequence

    @nn.compact
    def __call__(self, g, feat):
        import inspect

        for layer in self.layers:
            try:
                params = inspect.signature(layer).parameters.values()
                takes_graph = any(
                    p.kind == inspect.Parameter.VAR_POSITIONAL for p in params
                ) or sum(
                    p.kind in (inspect.Parameter.POSITIONAL_ONLY,
                               inspect.Parameter.POSITIONAL_OR_KEYWORD)
                    for p in params) >= 2
            except (TypeError, ValueError):
                takes_graph = True
            feat = layer(g, feat) if takes_graph else layer(feat)
        return feat


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
