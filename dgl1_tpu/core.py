"""Message-passing core: lowers ``update_all`` / ``apply_edges`` calls to
fused sparse ops, with a UDF fallback.

Parity: ``python/dgl/core.py`` (``message_passing``, ``invoke_gspmm``,
``invoke_gsddmm``, ``invoke_udf_reduce`` with degree bucketing) and the
0.4-era scheduler (``python/dgl/runtime/scheduler.py``). TPU-native: the
builtin path is a closed lowering table onto :func:`dgl1_tpu.ops.gspmm` /
:func:`dgl1_tpu.ops.gsddmm`; the UDF reduce path degree-buckets on host
when eager (exact mailbox widths) and lowers through the static ELL
mailbox plan when traced (``jit``-compatible degree bucketing — see
:func:`invoke_udf_reduce_ell`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from dgl1_tpu.function import BinaryMessage, CopyMessage, Reducer
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.sddmm import gsddmm
from dgl1_tpu.ops.spmm import gspmm

__all__ = ["update_all", "apply_edges", "send_and_recv", "EdgeBatch", "NodeBatch"]


class _LazyDataView(dict):
    """Dict-like view gathering node data onto edges lazily (UDF path).

    Parity: ``python/dgl/udf.py`` EdgeBatch src/dst views.
    """

    def __init__(self, data: Dict, index):
        super().__init__()
        self._data = data
        self._index = index

    def __getitem__(self, key):
        x = self._data[key]
        if self._index is None:
            return x
        return jnp.take(x, self._index, axis=0, mode="clip")

    def keys(self):
        return self._data.keys()

    def __contains__(self, key):
        return key in self._data


class EdgeBatch:
    """Batch of edges passed to an edge UDF (parity: ``dgl.udf.EdgeBatch``)."""

    def __init__(self, g: Graph, src_idx, dst_idx, edata: Dict):
        self.src = _LazyDataView(g.srcdata, src_idx)
        self.dst = _LazyDataView(g.dstdata, dst_idx)
        self.data = edata
        self._g = g

    def edges(self):
        return self._g.src, self._g.dst


class NodeBatch:
    """Batch of nodes passed to a node UDF (parity: ``dgl.udf.NodeBatch``).

    On the compiled (jit) path the mailbox is a statically padded
    degree-bucket: ``mailbox[f]`` is (n, k, *feat) with padded slots
    ZERO-FILLED, ``mailbox_mask`` (n, k) marks real messages, and
    ``degrees`` holds the true in-degree per node — sum-style UDFs are
    exact as-is; order statistics should mask via ``mailbox_mask``
    (TPU-native static-shape divergence from the reference's exact-width
    buckets; the eager path keeps exact widths)."""

    def __init__(self, data: Dict, mailbox: Dict, nodes, mailbox_mask=None,
                 degrees=None):
        self.data = data
        self.mailbox = mailbox
        self._nodes = nodes
        self.mailbox_mask = mailbox_mask
        self.degrees = degrees

    def nodes(self):
        return self._nodes


def _spmm_target_ok(m: Union[CopyMessage, BinaryMessage]) -> bool:
    if isinstance(m, CopyMessage):
        return m.target in ("u", "e")
    return {m.lhs, m.rhs} <= {"u", "e"}


def _fetch(g: Graph, target: str, field: str):
    store = {"u": g.srcdata, "v": g.dstdata, "e": g.edata}[target]
    if field not in store:
        raise KeyError(f"field {field!r} not found in {target}-data")
    return store[field]


def invoke_gspmm(g: Graph, mfunc, rfunc: Reducer):
    """Lower a builtin (message, reduce) pair to one fused gspmm call."""
    if isinstance(mfunc, CopyMessage):
        if mfunc.target == "u":
            return gspmm(g, "copy_lhs", rfunc.op, _fetch(g, "u", mfunc.in_field),
                         None)
        return gspmm(g, "copy_rhs", rfunc.op, None,
                     _fetch(g, "e", mfunc.in_field))
    assert isinstance(mfunc, BinaryMessage)
    lhs_data = _fetch(g, mfunc.lhs, mfunc.lhs_field)
    rhs_data = _fetch(g, mfunc.rhs, mfunc.rhs_field)
    op = mfunc.binary_op
    if mfunc.lhs == "u" and mfunc.rhs == "e":
        return gspmm(g, op, rfunc.op, lhs_data, rhs_data)
    if mfunc.lhs == "e" and mfunc.rhs == "u":
        # Commute or flip: gspmm's lhs is always u-data.
        if op in ("add", "mul"):
            return gspmm(g, op, rfunc.op, rhs_data, lhs_data)
        flipped = {"sub": "sub", "div": "div"}[op]
        # e - u = -(u - e); e / u = (u / e)^-1 — lower via gsddmm instead to
        # keep the kernel table closed.
        msg = gsddmm(g, flipped, lhs_data, rhs_data, lhs_target="e",
                     rhs_target="u")
        return gspmm(g, "copy_rhs", rfunc.op, None, msg)
    raise AssertionError("not a gspmm-lowerable message")


def invoke_gsddmm(g: Graph, mfunc):
    """Lower a builtin message function to one fused gsddmm call."""
    if isinstance(mfunc, CopyMessage):
        if mfunc.target == "u":
            return gsddmm(g, "copy_lhs", _fetch(g, "u", mfunc.in_field), None,
                          lhs_target="u")
        return _fetch(g, "e", mfunc.in_field)
    assert isinstance(mfunc, BinaryMessage)
    return gsddmm(
        g,
        mfunc.binary_op,
        _fetch(g, mfunc.lhs, mfunc.lhs_field),
        _fetch(g, mfunc.rhs, mfunc.rhs_field),
        lhs_target=mfunc.lhs,
        rhs_target=mfunc.rhs,
    )


def _is_traced(g: Graph) -> bool:
    return isinstance(g.csc_indptr, jax.core.Tracer)


def invoke_udf_reduce_ell(g: Graph, msg: Dict[str, jnp.ndarray],
                          rfunc: Callable):
    """Compiled degree-bucketed UDF reduce: the ELL layout IS a static
    mailbox plan (bucket widths/counts live in the pytree aux, so XLA
    compiles one program per graph shape — the jit-able counterpart of
    the reference's ``runtime/degree_bucketing.py``). Padded slots are
    zero-filled and flagged via ``NodeBatch.mailbox_mask``; rows come
    back bucket-sorted and one fill-gather restores node order
    (zero-degree nodes -> zeros, matching the reference's zero-init).
    """
    meta, ell = g.ell_dst_meta, g.ell_dst
    num_dst = g.num_dst_nodes()
    idx, eid, inv_perm = ell["idx"], ell["eid"], ell["inv_perm"]
    if inv_perm.shape[0] == 0:  # uniform static blocks: row == node id
        perm = jnp.arange(num_dst)
    else:
        # Stable argsort: positions 0..n_nonzero-1 recover row -> node.
        perm = jnp.argsort(inv_perm, stable=True)

    out_fields = None
    chunks: Dict[str, list] = {}
    slot_off = 0
    row_off = 0
    for k, n_b in meta:
        sl_idx = idx[slot_off:slot_off + n_b * k]
        sl_eid = eid[slot_off:slot_off + n_b * k]
        valid = (sl_idx < (1 << 29)).reshape(n_b, k)
        mailbox = {}
        for f, v in msg.items():
            m = jnp.take(v, sl_eid, axis=0, mode="clip").reshape(
                (n_b, k) + v.shape[1:])
            vm = valid.reshape((n_b, k) + (1,) * (v.ndim - 1))
            mailbox[f] = jnp.where(vm, m, jnp.zeros_like(m))
        nodes = perm[row_off:row_off + n_b]
        ndata = {f: jnp.take(v, nodes, axis=0, mode="clip")
                 for f, v in g.dstdata.items()}
        ret = rfunc(NodeBatch(ndata, mailbox, nodes,
                              mailbox_mask=valid,
                              degrees=valid.sum(axis=1)))
        if out_fields is None:
            out_fields = list(ret.keys())
        for f, v in ret.items():
            chunks.setdefault(f, []).append(v)
        slot_off += n_b * k
        row_off += n_b
    out = {}
    for f in (out_fields or []):
        stacked = jnp.concatenate(chunks[f], axis=0)
        if inv_perm.shape[0] == 0:
            out[f] = stacked
        else:
            out[f] = jnp.take(stacked, inv_perm, axis=0, mode="fill",
                              fill_value=0.0)
    return out


def invoke_udf_reduce(g: Graph, msg: Dict[str, jnp.ndarray], rfunc: Callable):
    """Degree-bucketed UDF reduce (parity: ``core.py :: invoke_udf_reduce`` /
    0.4 ``runtime/degree_bucketing.py``). Eager graphs take the exact-width
    host-bucketed path below; traced graphs (inside ``jit``) lower through
    the static ELL mailbox plan (:func:`invoke_udf_reduce_ell`).
    """
    if _is_traced(g):
        if g.ell_dst is None:
            raise NotImplementedError(
                "UDF reduce under jit needs the graph's ELL layout; build "
                "the graph with formats including 'ell'")
        return invoke_udf_reduce_ell(g, msg, rfunc)
    num_dst = g.num_dst_nodes()
    indptr = np.asarray(g.csc_indptr)
    deg = np.diff(indptr)
    eid_by_dst = np.asarray(g.csc_eid)
    out_fields = None
    results: Dict[str, list] = {}
    node_chunks = []
    for d in np.unique(deg):
        nodes = np.nonzero(deg == d)[0].astype(np.int32)
        node_chunks.append(nodes)
        if d == 0:
            # Zero-degree nodes produce zeros (reference zero-initializes).
            results.setdefault("__zero__", []).append(nodes)
            continue
        # Pow-2 bucket padding: repeated eager reduces (Tree-LSTM
        # frontiers) hit the same compiled shapes; pad node ids are OOB so
        # gathers clip and the final scatter drops them.
        pad_n = 1 << (len(nodes) - 1).bit_length() if len(nodes) > 1 else 1
        if pad_n != len(nodes):
            nodes = np.concatenate(
                [nodes, np.full((pad_n - len(nodes),), num_dst, np.int32)]
            )
        # Gather each bucket's mailbox: (n_nodes, d, *feat) per msg field.
        starts = indptr[np.minimum(nodes, num_dst)]
        idx = np.minimum(starts[:, None] + np.arange(d)[None, :],
                         max(len(eid_by_dst) - 1, 0))
        eids = eid_by_dst[idx]  # (n, d) user edge ids
        mailbox = {
            k: jnp.take(v, jnp.asarray(eids.reshape(-1)), axis=0,
                        mode="clip").reshape(eids.shape + v.shape[1:])
            for k, v in msg.items()
        }
        ndata = {k: jnp.take(v, jnp.asarray(nodes), axis=0, mode="clip")
                 for k, v in g.dstdata.items()}
        ret = rfunc(NodeBatch(ndata, mailbox, jnp.asarray(nodes)))
        if out_fields is None:
            out_fields = list(ret.keys())
        for k, v in ret.items():
            results.setdefault(k, []).append((nodes, v))
    out = {}
    for k in (out_fields or []):
        pieces = results[k]
        shape = (num_dst,) + tuple(pieces[0][1].shape[1:])
        buf = jnp.zeros(shape, dtype=pieces[0][1].dtype)
        for nodes, v in pieces:
            buf = buf.at[jnp.asarray(nodes)].set(v)
        out[k] = buf
    return out


def message_passing(g: Graph, mfunc, rfunc, afunc=None):
    """Full message-passing driver (parity: ``core.py :: message_passing``)."""
    builtin_m = isinstance(mfunc, (CopyMessage, BinaryMessage))
    builtin_r = isinstance(rfunc, Reducer)
    if builtin_m and builtin_r:
        if _spmm_target_ok(mfunc):
            out = invoke_gspmm(g, mfunc, rfunc)
        else:
            # Message touches v (e.g. u_dot_v): SDDMM to edges, then reduce.
            msg = invoke_gsddmm(g, mfunc)
            out = gspmm(g, "copy_rhs", rfunc.op, None, msg)
        result = {rfunc.out_field: out}
    else:
        # UDF path: materialize messages (builtin or UDF), bucket-reduce.
        if builtin_m:
            msg = {mfunc.out_field: invoke_gsddmm(g, mfunc)}
        else:
            eb = EdgeBatch(g, g.src, g.dst, g.edata)
            msg = mfunc(eb)
        if builtin_r:
            out = gspmm(g, "copy_rhs", rfunc.op, None, msg[rfunc.msg_field])
            result = {rfunc.out_field: out}
        else:
            result = invoke_udf_reduce(g, msg, rfunc)
    if afunc is not None:
        ndata = dict(g.dstdata)
        ndata.update(result)
        nb = NodeBatch(ndata, {}, None)
        result.update(afunc(nb))
    return result


def update_all(g: Graph, mfunc, rfunc, afunc=None):
    result = message_passing(g, mfunc, rfunc, afunc)
    g.dstdata.update(result)
    if len(result) == 1:
        return next(iter(result.values()))
    return result


def apply_edges(g: Graph, func, edges="__ALL__"):
    all_edges = isinstance(edges, str) and edges == "__ALL__"
    if not all_edges:
        # Edge-subset application (eager): compute on the subset and write
        # the rows back (parity: DGLHeteroGraph.apply_edges(eids)).
        eids = jnp.asarray(np.asarray(edges))
        sub_src = jnp.take(g.src, eids, axis=0, mode="clip")
        sub_dst = jnp.take(g.dst, eids, axis=0, mode="clip")
        sub_edata = {k: jnp.take(v, eids, axis=0, mode="clip")
                     for k, v in g.edata.items()}
        if isinstance(func, (CopyMessage, BinaryMessage)):
            m = func
            if isinstance(m, CopyMessage):
                if m.target == "u":
                    out = {m.out_field: jnp.take(
                        _fetch(g, "u", m.in_field), sub_src, axis=0,
                        mode="clip")}
                else:
                    out = {m.out_field: sub_edata[m.in_field]}
            else:
                def get(target, field):
                    if target == "u":
                        return jnp.take(_fetch(g, "u", field), sub_src,
                                        axis=0, mode="clip")
                    if target == "v":
                        return jnp.take(_fetch(g, "v", field), sub_dst,
                                        axis=0, mode="clip")
                    return sub_edata[field]

                from dgl1_tpu.ops.engine_xla import _binary

                out = {m.out_field: _binary(
                    m.binary_op, get(m.lhs, m.lhs_field),
                    get(m.rhs, m.rhs_field))}
        else:
            eb = EdgeBatch(g, sub_src, sub_dst, sub_edata)
            out = func(eb)
        for k, v in out.items():
            if k in g.edata:
                g.edata[k] = g.edata[k].at[eids].set(v)
            else:
                buf = jnp.zeros((g.num_edges_padded(),) + v.shape[1:],
                                dtype=v.dtype)
                g.edata[k] = buf.at[eids].set(v)
        if len(out) == 1:
            return next(iter(out.values()))
        return out
    if isinstance(func, (CopyMessage, BinaryMessage)):
        out = {func.out_field: invoke_gsddmm(g, func)}
    else:
        eb = EdgeBatch(g, g.src, g.dst, g.edata)
        out = func(eb)
    g.edata.update(out)
    if len(out) == 1:
        return next(iter(out.values()))
    return out


def apply_nodes(g: Graph, func, v="__ALL__"):
    """Compute a node-wise UDF and store into ``ndata`` (parity:
    ``DGLHeteroGraph.apply_nodes``). ``func(NodeBatch) -> {name: value}``;
    with a node subset ``v`` (int ids or a boolean mask) the UDF sees only
    those rows and the result is row-written back (eager for subsets,
    jit-safe for '__ALL__').

    Return contract (divergence: the reference returns None): the UDF's
    output dict, unwrapped to the bare array when it has exactly one
    entry — matching this package's ``apply_edges``/``send_and_recv``
    convention."""
    all_nodes = isinstance(v, str) and v == "__ALL__"
    if all_nodes:
        nb = NodeBatch(g.dstdata, {}, jnp.arange(g.num_dst_nodes()))
        out = func(nb)
        g.dstdata.update(out)
    else:
        v_np = np.asarray(v)
        if v_np.dtype == bool:
            # A DGL-style boolean selector: convert to indices (jnp.take
            # would silently treat it as 0/1 integer ids).
            v_np = np.nonzero(v_np)[0]
        vj = jnp.asarray(v_np)
        ndata = {k: jnp.take(val, vj, axis=0, mode="clip")
                 for k, val in g.dstdata.items()}
        out = func(NodeBatch(ndata, {}, vj))
        for k, val in out.items():
            if k in g.dstdata:
                g.dstdata[k] = g.dstdata[k].at[vj].set(val)
            else:
                full = jnp.zeros((g.num_dst_nodes(),) + val.shape[1:],
                                 val.dtype)
                g.dstdata[k] = full.at[vj].set(val)
    if len(out) == 1:
        return next(iter(out.values()))
    return out


def send_and_recv(g: Graph, edges, mfunc, rfunc, afunc=None):
    """Message passing over an edge subset (eager-only; builds a subgraph).

    Parity: ``DGLHeteroGraph.send_and_recv``.
    """
    from dgl1_tpu.transform import edge_subgraph

    sub = edge_subgraph(g, edges, relabel_nodes=False)
    result = message_passing(sub, mfunc, rfunc, afunc)
    g.dstdata.update(result)
    if len(result) == 1:
        return next(iter(result.values()))
    return result


def filter_nodes(g: Graph, predicate) -> jnp.ndarray:
    """Node ids satisfying ``predicate(NodeBatch) -> bool mask`` (parity:
    ``DGLHeteroGraph.filter_nodes``; eager)."""
    nb = NodeBatch(g.dstdata, {}, jnp.arange(g.num_dst_nodes()))
    mask = predicate(nb)
    return jnp.nonzero(np.asarray(mask))[0]


def filter_edges(g: Graph, predicate) -> jnp.ndarray:
    """Edge ids satisfying ``predicate(EdgeBatch) -> bool mask`` (parity:
    ``DGLHeteroGraph.filter_edges``; eager, real edges only)."""
    eb = EdgeBatch(g, g.src, g.dst, g.edata)
    mask = np.asarray(predicate(eb))[: g.num_edges()]
    return jnp.nonzero(mask)[0]


def pull(g: Graph, v, message_func, reduce_func, apply_node_func=None):
    """Pull messages into nodes ``v`` along their in-edges (parity:
    ``DGLHeteroGraph.pull``). Writeback is row-masked: only receiving
    nodes' rows change and only ``v`` rows get ``apply_node_func`` — nodes
    outside ``v`` keep their current values, which is what makes stateful
    topological propagation (Tree-LSTM) correct. ``apply_node_func`` runs
    on all of ``v`` even when some receive no messages (the reference
    zero-initializes those mailboxes). Eager-only."""
    from dgl1_tpu.transform import edge_subgraph

    v = np.asarray(v, dtype=np.int64)
    e = g.num_edges()
    dst = np.asarray(g.dst)[:e]
    eids = np.nonzero(np.isin(dst, v))[0]
    if len(eids):
        # Pow-2 edge padding + minimal formats: repeated data-dependent
        # pulls (Tree-LSTM frontiers) reuse compiled programs instead of
        # recompiling per frontier size (static-shape design stance).
        pad_e = 1 << (len(eids) - 1).bit_length() if len(eids) > 1 else 1
        builtin_r = isinstance(reduce_func, Reducer)
        sub = edge_subgraph(g, eids, relabel_nodes=False,
                            pad_edges_to=pad_e,
                            formats=("ell",) if builtin_r else ("csc",))
        result = message_passing(sub, message_func, reduce_func, None)
        recv = np.unique(dst[eids])
        mask = np.zeros((g.num_dst_nodes(),), bool)
        mask[recv] = True
        mj = jnp.asarray(mask)
        for k, col in result.items():
            old = g.dstdata.get(k)
            if old is not None and tuple(np.shape(old)) == tuple(col.shape):
                m = mj.reshape((-1,) + (1,) * (col.ndim - 1))
                col = jnp.where(m, col, old)
            g.dstdata[k] = col
    if apply_node_func is not None:
        # Pow-2 node padding; pad ids are out-of-bounds, so the clip
        # gather reads a harmless row and the scatter drops the update.
        pad_n = 1 << (len(v) - 1).bit_length() if len(v) > 1 else 1
        v_pad = np.full((pad_n,), g.num_dst_nodes(), np.int64)
        v_pad[: len(v)] = v
        vj = jnp.asarray(v_pad)
        ndata = {k: jnp.take(x, vj, axis=0, mode="clip")
                 for k, x in g.dstdata.items()}
        out = apply_node_func(NodeBatch(ndata, {}, vj))
        for k, val in out.items():
            old = g.dstdata.get(k)
            if old is None or tuple(np.shape(old)) != \
                    (g.num_dst_nodes(),) + tuple(val.shape[1:]):
                old = jnp.zeros((g.num_dst_nodes(),) + tuple(val.shape[1:]),
                                val.dtype)
            g.dstdata[k] = old.at[vj].set(val)
    return g


def push(g: Graph, u, message_func, reduce_func, apply_node_func=None):
    """Send messages along the out-edges of ``u`` and reduce at their
    destinations (parity: ``DGLHeteroGraph.push``). Eager-only."""
    u = np.asarray(u, dtype=np.int64)
    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    eids = np.nonzero(np.isin(src, u))[0]
    recv = np.unique(np.asarray(g.dst)[:e][eids])
    if len(eids) == 0:
        return g
    from dgl1_tpu.transform import edge_subgraph

    sub = edge_subgraph(g, eids, relabel_nodes=False)
    result = message_passing(sub, message_func, reduce_func, None)
    mask = np.zeros((g.num_dst_nodes(),), bool)
    mask[recv] = True
    mj = jnp.asarray(mask)
    for k, col in result.items():
        old = g.dstdata.get(k)
        if old is not None and tuple(np.shape(old)) == tuple(col.shape):
            m = mj.reshape((-1,) + (1,) * (col.ndim - 1))
            col = jnp.where(m, col, old)
        g.dstdata[k] = col
    if apply_node_func is not None:
        rj = jnp.asarray(recv)
        ndata = {k: jnp.take(x, rj, axis=0, mode="clip")
                 for k, x in g.dstdata.items()}
        out = apply_node_func(NodeBatch(ndata, {}, rj))
        for k, val in out.items():
            old = g.dstdata.get(k)
            if old is None or tuple(np.shape(old)) != \
                    (g.num_dst_nodes(),) + tuple(val.shape[1:]):
                old = jnp.zeros((g.num_dst_nodes(),) + tuple(val.shape[1:]),
                                val.dtype)
            g.dstdata[k] = old.at[rj].set(val)
    return g


def prop_nodes(g: Graph, nodes_generator, message_func, reduce_func,
               apply_node_func=None):
    """Propagate messages along node frontiers (parity: ``dgl.prop_nodes``
    and traversal-based propagation): for each frontier, pull messages into
    those nodes (eager)."""
    for frontier in nodes_generator:
        pull(g, np.asarray(frontier), message_func, reduce_func,
             apply_node_func)
    return g


def prop_nodes_topo(g: Graph, message_func, reduce_func, reverse=False,
                    apply_node_func=None):
    """Propagate in topological frontier order (parity:
    ``dgl.prop_nodes_topo`` — the Tree-LSTM recurrence driver).
    ``reverse=True`` traverses/propagates against edge direction."""
    from dgl1_tpu import traversal

    if reverse:
        rg = g.reverse(copy_edata=True)
        rg.ndata = g.ndata
        rg.srcdata = g.srcdata
        rg.dstdata = g.dstdata
        prop_nodes(rg, traversal.topological_nodes_generator(rg),
                   message_func, reduce_func, apply_node_func)
        return g
    return prop_nodes(g, traversal.topological_nodes_generator(g),
                      message_func, reduce_func, apply_node_func)


class _FillDataView(dict):
    """Dict-like gather view with OOB-fill-zero semantics (the compiled
    topo path's mailbox contract: padded slots are zero)."""

    def __init__(self, data: Dict, index):
        super().__init__()
        self._data = data
        self._index = index

    def __getitem__(self, key):
        x = self._data[key]
        if self._index is None:
            return x
        return jnp.take(x, self._index, axis=0, mode="fill",
                        fill_value=0)

    def keys(self):
        return self._data.keys()

    def __contains__(self, key):
        return key in self._data


def topo_schedule(g: Graph, reverse: bool = False,
                  pad_levels: int = None, pad_width: int = None,
                  pad_k: int = None):
    """Static (L, W, K) topological schedule for
    :func:`prop_nodes_topo_compiled`.

    Host-side preprocessing (numpy; compute once per graph structure,
    outside jit): levels from the topological frontier generator, every
    level padded to the max frontier width ``W``, every node's mailbox
    padded to the max in-degree ``K``. ``pad_*`` round the dimensions up
    so several graphs share one compiled program (the static-shape
    design stance — the eager ``prop_nodes_topo`` re-dispatches one
    host-scheduled pull per frontier instead).

    Returns a dict of numpy arrays: ``ids`` (L, W) node ids (sentinel
    N), ``msrc``/``meid`` (L, W, K) mailbox source node / edge ids
    (sentinel = num_src / 0), ``mmask`` (L, W, K), ``deg`` (L, W).
    """
    from dgl1_tpu import traversal

    gg = g.reverse(copy_edata=True) if reverse else g
    fronts = [np.asarray(f, dtype=np.int64)
              for f in traversal.topological_nodes_generator(gg)]
    n_dst = gg.num_dst_nodes()
    n_src = gg.num_src_nodes()
    indptr = np.asarray(gg.csc_indptr)[: n_dst + 1]
    srcs = np.asarray(gg.csc_src)
    eids = np.asarray(gg.csc_eid)
    deg_all = np.diff(indptr)

    L = len(fronts)
    W = max((len(f) for f in fronts), default=1)
    K = int(deg_all.max(initial=1))
    if pad_levels is not None:
        L = max(L, pad_levels)
    if pad_width is not None:
        W = -(-W // pad_width) * pad_width
    if pad_k is not None:
        K = -(-K // pad_k) * pad_k

    ids = np.full((L, W), n_dst, np.int32)
    msrc = np.full((L, W, K), n_src, np.int32)
    meid = np.zeros((L, W, K), np.int32)
    mmask = np.zeros((L, W, K), bool)
    deg = np.zeros((L, W), np.int32)
    for lvl, f in enumerate(fronts):
        ids[lvl, : len(f)] = f
        deg[lvl, : len(f)] = deg_all[f]
        counts = deg_all[f]
        total = int(counts.sum())
        if total == 0:
            continue
        owner = np.repeat(np.arange(len(f)), counts)
        slot = (np.arange(total)
                - np.repeat(np.cumsum(counts) - counts, counts))
        flat = np.repeat(indptr[f], counts) + slot
        msrc[lvl, owner, slot] = srcs[flat]
        meid[lvl, owner, slot] = eids[flat]
        mmask[lvl, owner, slot] = True
    return {"ids": ids, "msrc": msrc, "meid": meid, "mmask": mmask,
            "deg": deg}


def prop_nodes_topo_compiled(g: Graph, schedule, message_func,
                             reduce_func, apply_node_func=None):
    """Jit-safe topological propagation over a static schedule.

    The TPU-native replacement for the eager frontier loop (the
    reference drives Tree-LSTM through one host round-trip per level;
    SURVEY.md §7 stance #2): levels unroll into ONE traced program of
    identical static-shape steps — per level, the mailbox is a (W, K)
    fill-zero gather from the running frames, the reduce/apply UDFs see
    the standard padded-mailbox :class:`NodeBatch` contract, and
    writebacks are sentinel-routed ``.at[].set(mode='drop')``. Reduce
    fields only land on nodes with in-edges; ``apply_node_func`` on
    every real frontier node (eager-``pull`` parity).

    ``schedule`` comes from :func:`topo_schedule` (host-side, computed
    outside jit; pass its arrays through the jit boundary as regular
    inputs — shapes are static per (L, W, K) bucket). A
    ``topo_schedule(g, reverse=True)`` schedule propagates against edge
    direction with NO graph reversal here — the schedule carries the
    structure; this function only reads ``g.dstdata``/``g.edata``.
    """
    ids_a = jnp.asarray(schedule["ids"])
    msrc_a = jnp.asarray(schedule["msrc"])
    meid_a = jnp.asarray(schedule["meid"])
    mmask_a = jnp.asarray(schedule["mmask"])
    deg_a = jnp.asarray(schedule["deg"])
    L, W, K = schedule["msrc"].shape
    n = g.num_dst_nodes()

    frames = dict(g.dstdata)
    for lvl in range(L):
        ids = ids_a[lvl]
        msrc = msrc_a[lvl].reshape(-1)
        meid = meid_a[lvl].reshape(-1)
        mmask = mmask_a[lvl]
        degs = deg_a[lvl]
        nmask = ids < n

        # Message UDF over the (W*K) mailbox slots.
        eb = EdgeBatch.__new__(EdgeBatch)
        eb.src = _FillDataView(frames, msrc)
        eb.dst = _FillDataView(frames, jnp.repeat(ids, K))
        eb.data = _FillDataView(g.edata, meid)
        eb._g = g
        msgs = message_func(eb)
        flat_mask = mmask.reshape(-1)
        mailbox = {}
        for k, v in msgs.items():
            v = jnp.where(
                flat_mask.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0)
            mailbox[k] = v.reshape((W, K) + v.shape[1:])

        nb = NodeBatch(_FillDataView(frames, ids), mailbox, ids,
                       mailbox_mask=mmask, degrees=degs)
        red = reduce_func(nb)
        wids_r = jnp.where(nmask & (degs > 0), ids, n)
        for k, v in red.items():
            base = frames.get(k)
            if base is None:
                base = jnp.zeros((n,) + v.shape[1:], v.dtype)
            frames[k] = base.at[wids_r].set(v, mode="drop")

        if apply_node_func is not None:
            out = apply_node_func(
                NodeBatch(_FillDataView(frames, ids), {}, ids))
            wids = jnp.where(nmask, ids, n)
            for k, v in out.items():
                base = frames.get(k)
                if base is None:
                    base = jnp.zeros((n,) + v.shape[1:], v.dtype)
                frames[k] = base.at[wids].set(v, mode="drop")
    g.dstdata.update(frames)
    return g


def prop_nodes_bfs(g: Graph, source, message_func, reduce_func,
                   apply_node_func=None):
    """Propagate along BFS frontiers from ``source`` (parity:
    ``dgl.prop_nodes_bfs``)."""
    from dgl1_tpu import traversal

    return prop_nodes(g, traversal.bfs_nodes_generator(g, source),
                      message_func, reduce_func, apply_node_func)


def prop_edges_dfs(g: Graph, source, message_func, reduce_func,
                   apply_node_func=None):
    """Propagate along DFS edge frontiers (parity: ``dgl.prop_edges_dfs``)."""
    from dgl1_tpu import traversal

    return prop_edges(g, traversal.dfs_edges_generator(g, source),
                      message_func, reduce_func, apply_node_func)


def prop_edges(g: Graph, edges_generator, message_func, reduce_func,
               apply_node_func=None):
    """Propagate along edge frontiers (parity: ``dgl.prop_edges``)."""
    for eids in edges_generator:
        send_and_recv(g, np.asarray(eids), message_func, reduce_func,
                      apply_node_func)
    return g
