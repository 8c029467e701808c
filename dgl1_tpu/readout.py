"""Graph-level readout API over batched graphs.

Parity: ``python/dgl/readout.py`` (``dgl.readout_nodes``, ``dgl.sum_nodes``,
``dgl.softmax_nodes``, ``dgl.broadcast_nodes``, ``dgl.topk_nodes``, and the
edge variants). TPU-native: every readout is a contiguous segment op over
the batch (`batch_num_nodes` lengths) — one static XLA program regardless
of batch composition, no per-graph Python loops. ``topk_*`` densifies to a
(B, max_n, D) tile and runs ``lax.top_k`` so the sort lands on the VPU.

Features may be named (a key into ``g.ndata``/``g.edata``, matching the
reference API) or passed directly as arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dgl1_tpu.batch import batch_num_edges, batch_num_nodes
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.segment import (
    segment_ids_from_lengths,
    segment_reduce,
    segment_softmax,
)

__all__ = [
    "readout_nodes",
    "readout_edges",
    "sum_nodes",
    "sum_edges",
    "mean_nodes",
    "mean_edges",
    "max_nodes",
    "max_edges",
    "softmax_nodes",
    "softmax_edges",
    "broadcast_nodes",
    "broadcast_edges",
    "topk_nodes",
    "topk_edges",
]


def _node_feat(g: Graph, feat):
    x = g.ndata[feat] if isinstance(feat, str) else feat
    return jnp.asarray(x)[: g.num_nodes()]


def _edge_feat(g: Graph, feat):
    x = g.edata[feat] if isinstance(feat, str) else feat
    return jnp.asarray(x)[: g.num_edges()]


def _readout(seglen, x, weight, op: str):
    if weight is not None:
        w = weight
        if w.ndim < x.ndim:
            w = w.reshape(w.shape + (1,) * (x.ndim - w.ndim))
        x = x * w
    return segment_reduce(seglen, x, op)


def readout_nodes(g: Graph, feat, weight=None, *, op: str = "sum"):
    """Per-graph reduction of a node feature over a batched graph
    (parity: ``dgl.readout_nodes``). Returns (B, \\*feat_dims)."""
    x = _node_feat(g, feat)
    w = None if weight is None else _node_feat(g, weight)
    return _readout(batch_num_nodes(g), x, w, op)


def readout_edges(g: Graph, feat, weight=None, *, op: str = "sum"):
    """Per-graph reduction of an edge feature (parity: ``dgl.readout_edges``)."""
    x = _edge_feat(g, feat)
    w = None if weight is None else _edge_feat(g, weight)
    return _readout(batch_num_edges(g), x, w, op)


def sum_nodes(g, feat, weight=None):
    return readout_nodes(g, feat, weight, op="sum")


def sum_edges(g, feat, weight=None):
    return readout_edges(g, feat, weight, op="sum")


def mean_nodes(g, feat, weight=None):
    return readout_nodes(g, feat, weight, op="mean")


def mean_edges(g, feat, weight=None):
    return readout_edges(g, feat, weight, op="mean")


def max_nodes(g, feat, weight=None):
    return readout_nodes(g, feat, weight, op="max")


def max_edges(g, feat, weight=None):
    return readout_edges(g, feat, weight, op="max")


def softmax_nodes(g: Graph, feat):
    """Softmax of a node feature within each graph of the batch
    (parity: ``dgl.softmax_nodes``)."""
    return segment_softmax(batch_num_nodes(g), _node_feat(g, feat))


def softmax_edges(g: Graph, feat):
    return segment_softmax(batch_num_edges(g), _edge_feat(g, feat))


def broadcast_nodes(g: Graph, graph_feat):
    """Replicate a per-graph feature (B, ...) to every node of that graph
    (parity: ``dgl.broadcast_nodes``). Returns (N, ...)."""
    seglen = batch_num_nodes(g)
    ids = segment_ids_from_lengths(seglen, g.num_nodes())
    return jnp.take(jnp.asarray(graph_feat), ids, axis=0)


def broadcast_edges(g: Graph, graph_feat):
    seglen = batch_num_edges(g)
    ids = segment_ids_from_lengths(seglen, g.num_edges())
    return jnp.take(jnp.asarray(graph_feat), ids, axis=0)


def _topk(seglen, x, k: int, descending: bool, sortby):
    """Shared top-k over contiguous segments. Densify to (B, max_n, D),
    pad with +/-inf, one ``lax.top_k`` call."""
    import numpy as np

    lengths = np.asarray(seglen)
    if k > int(lengths.min()):
        raise ValueError(
            f"topk: k={k} exceeds the smallest graph ({int(lengths.min())} "
            "nodes/edges) in the batch"
        )
    total, max_n = x.shape[0], int(lengths.max())
    num_graphs = len(lengths)
    if x.ndim == 1:
        x = x[:, None]
        squeeze = True
    else:
        squeeze = False
    ids = segment_ids_from_lengths(seglen, total)
    starts = jnp.concatenate(
        [jnp.zeros((1,), seglen.dtype), jnp.cumsum(seglen)[:-1]]
    )
    rank = jnp.arange(total) - jnp.take(starts, ids)
    fill = -jnp.inf if descending else jnp.inf
    dense = jnp.full((num_graphs, max_n) + x.shape[1:], fill, dtype=x.dtype)
    dense = dense.at[ids, rank].set(x)
    sign = 1.0 if descending else -1.0
    if sortby is None:
        # Each feature column ranked independently (reference semantics).
        keys = jnp.moveaxis(dense * sign, 1, -1)  # (B, D, max_n)
        vals, idx = jax.lax.top_k(keys, k)
        vals = jnp.moveaxis(vals, -1, 1) * sign
        idx = jnp.moveaxis(idx, -1, 1)
    else:
        key = dense[..., sortby] * sign  # (B, max_n)
        _, idx = jax.lax.top_k(key, k)  # (B, k) within-graph positions
        vals = jnp.take_along_axis(dense, idx[..., None], axis=1)
    if squeeze:
        vals = vals[..., 0]
        if sortby is None:
            idx = idx[..., 0]
    return vals, idx


def topk_nodes(g: Graph, feat, k: int, *, descending: bool = True,
               sortby=None):
    """Per-graph top-k nodes by feature value (parity: ``dgl.topk_nodes``).

    With ``sortby=None`` every feature column is ranked independently
    (values and indices are (B, k, D)); with ``sortby=j`` whole rows are
    ranked by column j (values (B, k, D), indices (B, k)). Indices are
    within-graph node positions.
    """
    return _topk(batch_num_nodes(g), _node_feat(g, feat), k, descending,
                 sortby)


def topk_edges(g: Graph, feat, k: int, *, descending: bool = True,
               sortby=None):
    return _topk(batch_num_edges(g), _edge_feat(g, feat), k, descending,
                 sortby)
