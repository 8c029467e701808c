"""Graph-level readout modules (parity: ``python/dgl/nn/pytorch/glob.py``).

All readouts run over a batched graph using the per-graph segment lengths
from ``dgl1_tpu.batch`` — segment ops, never Python loops, so a batch of
graphs is one static XLA program.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu.batch import batch_num_nodes
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.segment import (
    segment_ids_from_lengths,
    segment_reduce,
    segment_softmax,
)

__all__ = [
    "SumPooling",
    "AvgPooling",
    "MaxPooling",
    "SortPooling",
    "GlobalAttentionPooling",
    "Set2Set",
    "WeightAndSum",
]


def _readout(g: Graph, feat, op: str):
    seglen = batch_num_nodes(g)
    return segment_reduce(seglen, feat[: g.num_src_nodes()], op)


class SumPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat):
        return _readout(g, feat, "sum")


class AvgPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat):
        return _readout(g, feat, "mean")


class MaxPooling(nn.Module):
    @nn.compact
    def __call__(self, g: Graph, feat):
        return _readout(g, feat, "max")


class SortPooling(nn.Module):
    """Sort nodes by their last feature channel, keep top-k (parity:
    ``glob.py :: SortPooling``)."""

    k: int

    @nn.compact
    def __call__(self, g: Graph, feat):
        seglen = batch_num_nodes(g)
        n_graphs = seglen.shape[0]
        ids = segment_ids_from_lengths(seglen, feat.shape[0])
        feat = jnp.sort(feat, axis=-1)
        key = feat[:, -1]
        # Per-graph top-k via a segment-aware sort: order by (graph, -key).
        order = jnp.lexsort((-key, ids))
        sorted_feat = feat[order]
        starts = jnp.concatenate(
            [jnp.zeros((1,), seglen.dtype), jnp.cumsum(seglen)[:-1]]
        )
        idx = starts[:, None] + jnp.arange(self.k)[None, :]
        valid = jnp.arange(self.k)[None, :] < seglen[:, None]
        gathered = jnp.take(sorted_feat, jnp.clip(idx, 0, feat.shape[0] - 1),
                            axis=0)
        gathered = jnp.where(valid[..., None], gathered, 0.0)
        return gathered.reshape(n_graphs, -1)


class GlobalAttentionPooling(nn.Module):
    """Gated attention readout (parity: ``glob.py :: GlobalAttentionPooling``)."""

    gate_nn: nn.Module = None
    feat_nn: nn.Module = None

    @nn.compact
    def __call__(self, g: Graph, feat):
        seglen = batch_num_nodes(g)
        gate = self.gate_nn(feat)
        a = segment_softmax(seglen, gate)
        h = self.feat_nn(feat) if self.feat_nn is not None else feat
        return segment_reduce(seglen, a * h, "sum")


class Set2Set(nn.Module):
    """Set2Set readout (parity: ``glob.py :: Set2Set``): n_iters of
    LSTM-query attention over node features."""

    input_dim: int
    n_iters: int = 6
    n_layers: int = 1

    @nn.compact
    def __call__(self, g: Graph, feat):
        seglen = batch_num_nodes(g)
        n_graphs = seglen.shape[0]
        ids = segment_ids_from_lengths(seglen, feat.shape[0])
        lstm = nn.OptimizedLSTMCell(features=self.input_dim, name="lstm")
        carry = lstm.initialize_carry(
            jax.random.PRNGKey(0), (n_graphs, 2 * self.input_dim)
        )
        q_star = jnp.zeros((n_graphs, 2 * self.input_dim), dtype=feat.dtype)
        for _ in range(self.n_iters):
            carry, q = lstm(carry, q_star)
            e = jnp.sum(feat * jnp.take(q, ids, axis=0), axis=-1,
                        keepdims=True)
            a = segment_softmax(seglen, e)
            readout = segment_reduce(seglen, a * feat, "sum")
            q_star = jnp.concatenate([q, readout], axis=-1)
        return q_star


class WeightAndSum(nn.Module):
    """Per-node learned sigmoid gate, weighted-sum readout (parity:
    ``python/dgl/nn/pytorch/glob.py :: WeightAndSum``)."""

    in_feats: int

    @nn.compact
    def __call__(self, g: Graph, feat):
        w = nn.sigmoid(
            nn.Dense(1, name="atom_weighting")(feat)
        )
        seglen = batch_num_nodes(g)
        return segment_reduce(seglen, w * feat[: g.num_src_nodes()], "sum")
