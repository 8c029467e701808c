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


def _batch_hetero(graphs):
    """Disjoint union of heterographs: per-ntype node offsets, per-relation
    edge concatenation, common frame keys concatenated (parity:
    ``dgl.batch`` on heterographs)."""
    from dgl1_tpu.heterograph import heterograph

    ntypes = graphs[0].ntypes
    cetypes = graphs[0].canonical_etypes
    for g in graphs[1:]:
        if g.ntypes != ntypes or g.canonical_etypes != cetypes:
            raise ValueError("batched heterographs must share the schema")
    offs = {nt: np.cumsum([0] + [g.num_nodes(nt) for g in graphs])
            for nt in ntypes}
    data = {}
    for c in cetypes:
        st, _, dt = c
        ss, ds = [], []
        for i, g in enumerate(graphs):
            rel = g.rel_graphs[c]
            e = rel.num_edges()
            ss.append(np.asarray(rel.src)[:e] + offs[st][i])
            ds.append(np.asarray(rel.dst)[:e] + offs[dt][i])
        data[c] = (np.concatenate(ss), np.concatenate(ds))
    big = heterograph(
        data, num_nodes_dict={nt: int(offs[nt][-1]) for nt in ntypes})
    for nt in ntypes:
        for key in graphs[0].nframes[nt]:
            if all(key in g.nframes[nt] for g in graphs):
                big.nframes[nt][key] = jnp.concatenate(
                    [jnp.asarray(g.nframes[nt][key]) for g in graphs],
                    axis=0)
    for c in cetypes:
        for key in graphs[0].rel_graphs[c].edata:
            if all(key in g.rel_graphs[c].edata for g in graphs):
                big.rel_graphs[c].edata[key] = jnp.concatenate(
                    [jnp.asarray(g.rel_graphs[c].edata[key])[
                        : g.rel_graphs[c].num_edges()] for g in graphs],
                    axis=0)
    big.meta["_batch_num_nodes"] = {
        nt: np.asarray([g.num_nodes(nt) for g in graphs], np.int32)
        for nt in ntypes}
    big.meta["_batch_num_edges"] = {
        c: np.asarray([g.rel_graphs[c].num_edges() for g in graphs],
                      np.int32) for c in cetypes}
    return big


def batch(graphs: Sequence[Graph]) -> Graph:
    """Disjoint union; node/edge features are concatenated. The result
    carries ``batch_num_nodes``/``batch_num_edges`` (int arrays) in ndata
    bookkeeping fields ``_batch_num_nodes`` / ``_batch_num_edges``
    accessible via the helpers below. Heterographs batch per ntype /
    relation."""
    assert len(graphs) > 0
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(graphs[0], HeteroGraph):
        return _batch_hetero(graphs)
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


def batch_num_nodes(g, ntype: str = None):
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(g, HeteroGraph):
        per = g.meta.get("_batch_num_nodes")
        nt = ntype or (g.ntypes[0] if len(g.ntypes) == 1 else None)
        if nt is None:
            raise ValueError("ntype required on a multi-type heterograph")
        if per is None:
            return jnp.asarray([g.num_nodes(nt)], dtype=jnp.int32)
        return jnp.asarray(per[nt])
    bn = getattr(g, "_batch_num_nodes", None)
    if bn is None:
        return jnp.asarray([g.num_nodes()], dtype=jnp.int32)
    return bn


def batch_num_edges(g, etype=None):
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(g, HeteroGraph):
        per = g.meta.get("_batch_num_edges")
        c = (g.to_canonical_etype(etype) if etype is not None
             else (g.canonical_etypes[0]
                   if len(g.canonical_etypes) == 1 else None))
        if c is None:
            raise ValueError("etype required on a multi-etype heterograph")
        if per is None:
            return jnp.asarray([g.rel_graphs[c].num_edges()],
                               dtype=jnp.int32)
        return jnp.asarray(per[c])
    be = getattr(g, "_batch_num_edges", None)
    if be is None:
        return jnp.asarray([g.num_edges()], dtype=jnp.int32)
    return be


def _unbatch_hetero(bg) -> list:
    from dgl1_tpu.heterograph import heterograph

    bnn = {nt: np.asarray(v)
           for nt, v in bg.meta["_batch_num_nodes"].items()}
    bne = {c: np.asarray(v)
           for c, v in bg.meta["_batch_num_edges"].items()}
    k = len(next(iter(bnn.values())))
    n_off = {nt: np.cumsum(np.concatenate([[0], v]))
             for nt, v in bnn.items()}
    e_off = {c: np.cumsum(np.concatenate([[0], v]))
             for c, v in bne.items()}
    out = []
    for i in range(k):
        data = {}
        for c in bg.canonical_etypes:
            st, _, dt = c
            rel = bg.rel_graphs[c]
            e = rel.num_edges()
            lo, hi = e_off[c][i], e_off[c][i + 1]
            data[c] = (
                np.asarray(rel.src)[:e][lo:hi] - n_off[st][i],
                np.asarray(rel.dst)[:e][lo:hi] - n_off[dt][i])
        g = heterograph(data, num_nodes_dict={
            nt: int(bnn[nt][i]) for nt in bg.ntypes})
        for nt in bg.ntypes:
            for key, v in bg.nframes[nt].items():
                g.nframes[nt][key] = v[n_off[nt][i]:n_off[nt][i + 1]]
        for c in bg.canonical_etypes:
            for key, v in bg.rel_graphs[c].edata.items():
                g.rel_graphs[c].edata[key] = v[e_off[c][i]:e_off[c][i + 1]]
        out.append(g)
    return out


def unbatch(bg) -> List[Graph]:
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(bg, HeteroGraph):
        return _unbatch_hetero(bg)
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
