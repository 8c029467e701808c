"""NN utilities (parity: ``python/dgl/nn/pytorch/utils.py``)."""

from __future__ import annotations

from typing import Sequence as _Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["WeightBasis", "Sequential", "JumpingKnowledge",
           "LabelPropagation"]


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


class JumpingKnowledge(nn.Module):
    """Combine per-layer node representations (parity:
    ``python/dgl/nn/pytorch/utils.py :: JumpingKnowledge``).

    mode: 'cat' (concat), 'max' (elementwise max), 'lstm' (BiLSTM
    attention over the layer axis).
    """

    mode: str = "cat"

    @nn.compact
    def __call__(self, feat_list):
        if self.mode == "cat":
            return jnp.concatenate(list(feat_list), axis=-1)
        if self.mode == "max":
            return jnp.max(jnp.stack(feat_list, axis=0), axis=0)
        if self.mode == "lstm":
            # (N, L, F) sequence over layers; BiLSTM -> per-layer scalar
            # attention -> weighted sum.
            seq = jnp.stack(list(feat_list), axis=1)
            f = seq.shape[-1]
            fwd = nn.RNN(nn.OptimizedLSTMCell(features=f), name="fwd")(seq)
            bwd = nn.RNN(nn.OptimizedLSTMCell(features=f), name="bwd")(
                seq[:, ::-1])[:, ::-1]
            alpha = nn.Dense(1, name="att")(
                jnp.concatenate([fwd, bwd], axis=-1))[..., 0]
            alpha = nn.softmax(alpha, axis=-1)  # (N, L)
            return jnp.einsum("nl,nlf->nf", alpha, seq)
        raise ValueError(f"unknown mode {self.mode!r}")


class LabelPropagation(nn.Module):
    """Parameter-free label propagation (parity:
    ``python/dgl/nn/pytorch/utils.py :: LabelPropagation``):
    ``Y' = alpha * D^-1/2 A D^-1/2 Y + (1 - alpha) Y``, k rounds, clamped
    to [0, 1]; rows in ``mask`` (the known labels) are reset each round.
    """

    k: int = 3
    alpha: float = 0.9
    norm_type: str = "sym"  # 'sym' | 'rw'
    clamp: bool = True
    reset: bool = True

    @nn.compact
    def __call__(self, g, labels, mask=None):
        from dgl1_tpu.ops import gspmm

        y = labels.astype(jnp.float32)
        if y.ndim == 1:  # class ids -> one-hot
            num = int(jnp.asarray(labels).max()) + 1
            y = jnp.eye(num, dtype=jnp.float32)[labels]
        init = y
        if mask is not None:
            y = jnp.where(mask[:, None], y, 0.0)
            init = y
        deg_in = jnp.maximum(g.in_degrees().astype(y.dtype), 1.0)
        deg_out = jnp.maximum(g.out_degrees().astype(y.dtype), 1.0)
        for _ in range(self.k):
            h = y
            if self.norm_type == "sym":
                h = h * (deg_out ** -0.5)[:, None]
            h = gspmm(g, "copy_lhs", "sum", h, None)
            if self.norm_type == "sym":
                h = h * (deg_in ** -0.5)[:, None]
            else:
                h = h / deg_in[:, None]
            y = self.alpha * h + (1.0 - self.alpha) * y
            if self.clamp:
                y = jnp.clip(y, 0.0, 1.0)
            if self.reset and mask is not None:
                y = jnp.where(mask[:, None], init, y)
        return y
