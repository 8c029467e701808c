"""Batching graphs by disjoint union (graph classification workloads).

Parity: ``python/dgl/batch.py`` (``dgl.batch`` / ``dgl.unbatch``) and the
aten disjoint-union op. TPU-native: batching IS the static-shape strategy —
a batch of small graphs becomes one big static graph; ``batch_num_nodes`` /
``batch_num_edges`` feed the segment readouts in :mod:`dgl1_tpu.nn.glob`.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["batch", "unbatch", "batch_num_nodes", "batch_num_edges"]


def batch(graphs: Sequence[Graph]) -> Graph:
    """Disjoint union; node/edge features are concatenated. The result
    carries ``batch_num_nodes``/``batch_num_edges`` (int arrays) in ndata
    bookkeeping fields ``_batch_num_nodes`` / ``_batch_num_edges``
    accessible via the helpers below."""
    assert len(graphs) > 0
    offsets = np.cumsum([0] + [g.num_nodes() for g in graphs])
    srcs, dsts = [], []
    for g, off in zip(graphs, offsets[:-1]):
        e = g.num_edges()
        srcs.append(np.asarray(g.src)[:e] + off)
        dsts.append(np.asarray(g.dst)[:e] + off)
    big = graph(
        (np.concatenate(srcs), np.concatenate(dsts)),
        num_nodes=int(offsets[-1]),
    )
    # Concatenate features present in every graph.
    for key in graphs[0].ndata:
        if all(key in g.ndata for g in graphs):
            big.ndata[key] = jnp.concatenate(
                [jnp.asarray(g.ndata[key])[: g.num_nodes()] for g in graphs],
                axis=0,
            )
    for key in graphs[0].edata:
        if all(key in g.edata for g in graphs):
            big.edata[key] = jnp.concatenate(
                [jnp.asarray(g.edata[key])[: g.num_edges()] for g in graphs],
                axis=0,
            )
    big._batch_num_nodes = jnp.asarray(
        np.array([g.num_nodes() for g in graphs], dtype=np.int32)
    )
    big._batch_num_edges = jnp.asarray(
        np.array([g.num_edges() for g in graphs], dtype=np.int32)
    )
    return big


def batch_num_nodes(g: Graph):
    bn = getattr(g, "_batch_num_nodes", None)
    if bn is None:
        return jnp.asarray([g.num_nodes()], dtype=jnp.int32)
    return bn


def batch_num_edges(g: Graph):
    be = getattr(g, "_batch_num_edges", None)
    if be is None:
        return jnp.asarray([g.num_edges()], dtype=jnp.int32)
    return be


def unbatch(bg: Graph) -> List[Graph]:
    bnn = np.asarray(batch_num_nodes(bg))
    bne = np.asarray(batch_num_edges(bg))
    n_off = np.cumsum(np.concatenate([[0], bnn]))
    e_off = np.cumsum(np.concatenate([[0], bne]))
    src = np.asarray(bg.src)[: bg.num_edges()]
    dst = np.asarray(bg.dst)[: bg.num_edges()]
    out = []
    for i in range(len(bnn)):
        s = src[e_off[i]:e_off[i + 1]] - n_off[i]
        d = dst[e_off[i]:e_off[i + 1]] - n_off[i]
        g = graph((s, d), num_nodes=int(bnn[i]))
        for k, v in bg.ndata.items():
            g.ndata[k] = v[n_off[i]:n_off[i + 1]]
        for k, v in bg.edata.items():
            g.edata[k] = v[e_off[i]:e_off[i + 1]]
        out.append(g)
    return out
