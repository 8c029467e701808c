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
    "SetTransformerEncoder",
    "SetTransformerDecoder",
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


def _masked_multihead_attention(q, k, v, q_ids, k_ids, num_heads):
    """Set attention restricted to same-graph (q, k) pairs.

    Packed layout: ``q`` (Nq, d), ``k``/``v`` (Nk, d), with per-element
    graph ids. The block-diagonal mask keeps every graph's set separate
    while the score matrix stays ONE static (Nq, Nk) MXU matmul — the
    TPU-native stand-in for the reference's per-graph padded batching
    (``python/dgl/nn/pytorch/glob.py`` MultiHeadAttention used by
    SetTransformer).
    """
    nq, d = q.shape
    nk = k.shape[0]
    d_head = d // num_heads
    qh = q.reshape(nq, num_heads, d_head)
    kh = k.reshape(nk, num_heads, d_head)
    vh = v.reshape(nk, num_heads, d_head)
    # (H, Nq, Nk) scores on the MXU.
    score = jnp.einsum("qhd,khd->hqk", qh, kh) / jnp.sqrt(
        jnp.asarray(d_head, q.dtype))
    mask = q_ids[:, None] == k_ids[None, :]
    score = jnp.where(mask[None, :, :], score, -1e30)
    attn = jax.nn.softmax(score, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", attn, vh)
    return out.reshape(nq, d)


class _MAB(nn.Module):
    """Multihead attention block: LN(x + MHA) then LN(h + rFF) (parity:
    SetTransformer's MAB; ``glob.py :: SetAttentionBlock`` building block)."""

    d_model: int
    num_heads: int
    d_ff: int

    @nn.compact
    def __call__(self, q, kv, q_ids, kv_ids):
        wq = nn.Dense(self.d_model, name="wq")(q)
        wk = nn.Dense(self.d_model, name="wk")(kv)
        wv = nn.Dense(self.d_model, name="wv")(kv)
        h = q + nn.Dense(self.d_model, name="wo")(
            _masked_multihead_attention(wq, wk, wv, q_ids, kv_ids,
                                        self.num_heads))
        h = nn.LayerNorm(name="ln0")(h)
        ff = nn.Dense(self.d_model, name="ff1")(
            nn.relu(nn.Dense(self.d_ff, name="ff0")(h)))
        return nn.LayerNorm(name="ln1")(h + ff)


def _graph_ids(g: Graph, total: int):
    return segment_ids_from_lengths(batch_num_nodes(g), total)


def _repeat_ids(n_graphs: int, m: int):
    """Graph ids for ``m`` learned slots per graph: [0]*m, [1]*m, ..."""
    return jnp.repeat(jnp.arange(n_graphs, dtype=jnp.int32), m)


class SetTransformerEncoder(nn.Module):
    """Permutation-equivariant set-transformer encoder over each graph's
    node set (parity: ``python/dgl/nn/pytorch/glob.py ::
    SetTransformerEncoder``; SAB/ISAB blocks from Lee et al. 2019).

    ``block_type='sab'`` stacks full self-attention blocks;
    ``'isab'`` uses ``m`` learned inducing points per graph (two MABs),
    dropping the cost from O(n^2) to O(n*m). Returns updated node
    features in the same packed layout.
    """

    d_model: int
    num_heads: int = 4
    d_ff: int = 256
    n_layers: int = 1
    block_type: str = "sab"
    m: int = 16

    @nn.compact
    def __call__(self, g: Graph, feat):
        n = g.num_src_nodes()
        x = feat[:n]
        if x.shape[-1] != self.d_model:
            x = nn.Dense(self.d_model, name="proj")(x)
        ids = _graph_ids(g, n)
        n_graphs = batch_num_nodes(g).shape[0]
        for layer in range(self.n_layers):
            if self.block_type == "sab":
                x = _MAB(self.d_model, self.num_heads, self.d_ff,
                         name=f"sab{layer}")(x, x, ids, ids)
            elif self.block_type == "isab":
                ind = self.param(
                    f"inducing{layer}", nn.initializers.xavier_uniform(),
                    (self.m, self.d_model))
                ind_b = jnp.tile(ind, (n_graphs, 1))
                ind_ids = _repeat_ids(n_graphs, self.m)
                h = _MAB(self.d_model, self.num_heads, self.d_ff,
                         name=f"isab{layer}_0")(ind_b, x, ind_ids, ids)
                x = _MAB(self.d_model, self.num_heads, self.d_ff,
                         name=f"isab{layer}_1")(x, h, ids, ind_ids)
            else:
                raise ValueError(f"unknown block_type {self.block_type!r}")
        return x


class SetTransformerDecoder(nn.Module):
    """Set-transformer decoder/readout (parity: ``glob.py ::
    SetTransformerDecoder``): PMA with ``k`` learned seed vectors per
    graph, followed by SAB layers over the k seeds; returns
    (n_graphs, k * d_model)."""

    d_model: int
    num_heads: int = 4
    d_ff: int = 256
    n_layers: int = 1
    k: int = 4

    @nn.compact
    def __call__(self, g: Graph, feat):
        n = g.num_src_nodes()
        x = feat[:n]
        if x.shape[-1] != self.d_model:
            x = nn.Dense(self.d_model, name="proj")(x)
        ids = _graph_ids(g, n)
        n_graphs = batch_num_nodes(g).shape[0]
        # rFF on the set, then PMA: seeds attend to each graph's nodes.
        x = nn.Dense(self.d_model, name="pma_ff")(nn.relu(x))
        seeds = self.param("seeds", nn.initializers.xavier_uniform(),
                           (self.k, self.d_model))
        s = jnp.tile(seeds, (n_graphs, 1))
        s_ids = _repeat_ids(n_graphs, self.k)
        s = _MAB(self.d_model, self.num_heads, self.d_ff, name="pma")(
            s, x, s_ids, ids)
        for layer in range(self.n_layers):
            s = _MAB(self.d_model, self.num_heads, self.d_ff,
                     name=f"sab{layer}")(s, s, s_ids, s_ids)
        return s.reshape(n_graphs, self.k * self.d_model)


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
