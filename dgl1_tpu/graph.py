"""Graph structure core: an immutable-structure, static-shape graph pytree.

Reference parity (SURVEY.md §2): this module replaces the reference's C++
graph store — ``src/graph/unit_graph.cc :: UnitGraph`` (COO/CSR/CSC with
format conversion & caching) and the Python facade
``python/dgl/heterograph.py :: DGLHeteroGraph`` (ndata/edata views,
update_all / apply_edges / send_and_recv, degrees, subgraphing).

TPU-native design decisions (deliberately NOT a port):

* **No FFI / C++ object store.** The graph is a plain Python object whose
  structural arrays (COO, CSR, CSC) are ``jax.Array`` leaves of a registered
  pytree; static metadata (node/edge counts, block-ness) lives in the pytree
  aux data so ``jit`` recompiles only when the *shape* of the graph changes.
* **All three formats precomputed on host at construction** with numpy
  (argsort + searchsorted), instead of lazy C++ conversion. XLA never sees a
  format conversion.
* **Static shapes everywhere.** Edge arrays may be padded to a requested
  multiple; padded entries carry sentinel endpoints equal to
  ``num_{src,dst}_nodes`` so that segment reductions drop them natively
  (XLA scatter semantics discard out-of-range indices) and an explicit
  ``edge_mask`` is carried for ops that need it (e.g. masked edge softmax).
* **Reversal is free**: CSR and CSC swap roles, no data movement — the
  autodiff duality (∂SpMM needs the reverse graph) costs zero memory.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Graph",
    "graph",
    "block",
    "create_block",
    "rand_graph",
    "rand_bipartite",
    "from_scipy",
    "from_networkx",
    "to_networkx",
    "TILE_EDGES",
    "TILE_ROWS",
]

ID_DTYPE = np.int32

# Edge-tile geometry for the Pallas segment-reduce kernel (see
# ops/engine_pallas.py): T edges per tile, R output rows per row-block.
# The per-tile reduce is a (T x R)^T @ (T x F) matmul on the MXU, so R
# bounds the FLOP cost per edge (2*R per feature element) while T only
# sets the DMA granularity. T must be a multiple of 1024 so 1-D int32
# tile arrays match XLA's (1024)-element tiled layout on TPU.
TILE_EDGES = 1024
TILE_ROWS = 128


def _as_numpy_ids(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype not in (np.int32, np.int64):
        arr = arr.astype(np.int64)
    return arr.astype(ID_DTYPE)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Graph:
    """A (possibly bipartite) multigraph with static-shape COO/CSR/CSC.

    Structural leaves (all ``int32`` except the boolean mask), with
    ``E`` = padded edge count:

    ``src, dst``              COO endpoints in user edge order; padded
                              entries hold the sentinel ``num_src_nodes`` /
                              ``num_dst_nodes``.
    ``edge_mask``             bool, True for real edges.
    ``csr_indptr``            (num_src_nodes+1,) out-edge row pointers.
    ``csr_dst, csr_eid``      dst / user-edge-id sorted by src.
    ``csr_src``               segment ids (src) aligned with csr_dst.
    ``csc_indptr``            (num_dst_nodes+1,) in-edge row pointers.
    ``csc_src, csc_eid``      src / user-edge-id sorted by dst.
    ``csc_dst``               segment ids (dst) aligned with csc_src.

    Feature storage: ``ndata`` / ``edata`` dicts (and ``srcdata`` /
    ``dstdata`` for bipartite blocks) are part of the pytree, mirroring the
    reference's Frame column store (``python/dgl/frame.py``). They may be
    mutated in place from Python (DGL-style imperative use); the primary
    compute API is functional and does not rely on them.
    """

    __slots__ = (
        "src",
        "dst",
        "edge_mask",
        "csr_indptr",
        "csr_dst",
        "csr_eid",
        "csr_src",
        "csc_indptr",
        "csc_src",
        "csc_eid",
        "csc_dst",
        "tdst",
        "tsrc",
        "ell_dst",
        "ell_src",
        "ell_dst_meta",
        "ell_src_meta",
        "hub_dst",
        "hub_src",
        "hub_dst_meta",
        "hub_src_meta",
        "bdense",
        "bdense_meta",
        "_num_src_nodes",
        "_num_dst_nodes",
        "_num_edges",
        "_num_edges_padded",
        "_is_block",
        "ndata",
        "edata",
        "srcdata",
        "dstdata",
        "_batch_num_nodes",
        "_batch_num_edges",
        "meta",
    )

    def __init__(
        self,
        *,
        src,
        dst,
        edge_mask,
        csr_indptr,
        csr_dst,
        csr_eid,
        csr_src,
        csc_indptr,
        csc_src,
        csc_eid,
        csc_dst,
        num_src_nodes: int,
        num_dst_nodes: int,
        num_edges: int,
        is_block: bool = False,
        tdst: Optional[Dict[str, Any]] = None,
        tsrc: Optional[Dict[str, Any]] = None,
        ell_dst: Optional[Dict[str, Any]] = None,
        ell_src: Optional[Dict[str, Any]] = None,
        ell_dst_meta: Optional[Tuple] = None,
        ell_src_meta: Optional[Tuple] = None,
        hub_dst: Optional[Dict[str, Any]] = None,
        hub_src: Optional[Dict[str, Any]] = None,
        hub_dst_meta: Optional[Tuple] = None,
        hub_src_meta: Optional[Tuple] = None,
        bdense: Optional[Dict[str, Any]] = None,
        bdense_meta=None,
        ndata: Optional[Dict[str, Any]] = None,
        edata: Optional[Dict[str, Any]] = None,
        srcdata: Optional[Dict[str, Any]] = None,
        dstdata: Optional[Dict[str, Any]] = None,
    ):
        self.src = src
        self.dst = dst
        self.edge_mask = edge_mask
        self.csr_indptr = csr_indptr
        self.csr_dst = csr_dst
        self.csr_eid = csr_eid
        self.csr_src = csr_src
        self.csc_indptr = csc_indptr
        self.csc_src = csc_src
        self.csc_eid = csc_eid
        self.csc_dst = csc_dst
        # Edge-tile descriptors for the Pallas reduce kernel: reduce-by-dst
        # (tdst) and reduce-by-src (tsrc, used by the backward pass on the
        # reverse graph). None when built without tiles.
        self.tdst = tdst
        self.tsrc = tsrc
        # Degree-bucketed ELL layouts (reduce-by-dst / reduce-by-src) with
        # their static bucket metadata.
        self.ell_dst = ell_dst
        self.ell_src = ell_src
        self.ell_dst_meta = ell_dst_meta
        self.ell_src_meta = ell_src_meta
        # Hub-dense HYB layout (reduce-by-dst; see hub_format.py). hub_src
        # is the same for the reverse direction, built on demand only.
        self.hub_dst = hub_dst
        self.hub_src = hub_src
        self.hub_dst_meta = hub_dst_meta
        self.hub_src_meta = hub_src_meta
        # Clustered block-dense layout (see bdense_format.py): direction-
        # specific; dropped on reverse() (the engine's custom_vjp handles
        # the src direction internally through the same blocks).
        self.bdense = bdense
        self.bdense_meta = bdense_meta
        self._num_src_nodes = int(num_src_nodes)
        self._num_dst_nodes = int(num_dst_nodes)
        self._num_edges = int(num_edges)
        self._num_edges_padded = int(np.shape(src)[0])
        self._is_block = bool(is_block)
        self.ndata = {} if ndata is None else dict(ndata)
        self.edata = {} if edata is None else dict(edata)
        self._batch_num_nodes = None
        self._batch_num_edges = None
        # Host-side annotations (e.g. real-vs-padded counts from to_block).
        # Not part of the pytree: static bookkeeping only.
        self.meta: Dict[str, Any] = {}
        if is_block:
            self.srcdata = {} if srcdata is None else dict(srcdata)
            self.dstdata = {} if dstdata is None else dict(dstdata)
        else:
            # Homogeneous graph: srcdata/dstdata alias ndata (DGL semantics).
            self.srcdata = self.ndata
            self.dstdata = self.ndata

    # ------------------------------------------------------------------
    # Static metadata
    # ------------------------------------------------------------------
    @property
    def is_block(self) -> bool:
        return self._is_block

    def num_nodes(self) -> int:
        if self._is_block:
            raise ValueError(
                "num_nodes() is ambiguous on a block; use num_src_nodes() / "
                "num_dst_nodes()."
            )
        return self._num_src_nodes

    @property
    def number_of_nodes(self):
        return self.num_nodes

    def num_src_nodes(self) -> int:
        return self._num_src_nodes

    def num_dst_nodes(self) -> int:
        return self._num_dst_nodes

    def num_edges(self) -> int:
        """Number of *real* (unpadded) edges."""
        return self._num_edges

    def num_edges_padded(self) -> int:
        """Static length of the edge arrays (>= num_edges)."""
        return self._num_edges_padded

    def num_real_edges(self) -> int:
        """Real (unpadded) edge count. Equal to ``num_edges()`` except on
        static-shape pipeline blocks (``block(uniform_ell_k=...)``), whose
        static count is pinned to the padded length so every mini-batch of
        an epoch shares one compiled program; there the real count lives
        in ``meta['num_real_edges']`` (host side) or, after a pytree
        round-trip, in the ``edge_mask`` leaf."""
        if "num_real_edges" in self.meta:
            return int(self.meta["num_real_edges"])
        if self._num_edges == self._num_edges_padded:
            import numpy as _np

            return int(_np.asarray(self.edge_mask).sum())
        return self._num_edges

    @property
    def is_padded(self) -> bool:
        return self._num_edges_padded != self._num_edges

    # ------------------------------------------------------------------
    # Queries
    # ------------------------------------------------------------------
    def formats(self, formats=None):
        """Parity: ``DGLGraph.formats`` (``python/dgl/heterograph.py``) /
        ``UnitGraph::restrict_format``. No argument: report which layouts
        exist. With a format name or list: return a NEW graph rebuilt
        from the edge list with only those derived layouts ("coo"/"csr"/
        "csc" are always kept; "tile"/"ell"/"hub" opt into the engine
        layouts)."""
        if formats is None:
            created = ["coo", "csr", "csc"]
            if self.tdst is not None:
                created.append("tile")
            if self.ell_dst is not None:
                created.append("ell")
            if self.hub_dst is not None:
                created.append("hub")
            if self.bdense is not None:
                created.append("bdense")
            universe = ["coo", "csr", "csc", "tile", "ell", "hub",
                        "bdense"]
            return {"created": created,
                    "not created": [f for f in universe
                                    if f not in created]}
        if isinstance(formats, str):
            formats = (formats,)
        e = self.num_edges()
        src = np.asarray(self.src)[:e]
        dst = np.asarray(self.dst)[:e]
        g2 = graph((src, dst),
                   num_nodes=max(self.num_src_nodes(), self.num_dst_nodes()),
                   pad_edges_to=self.num_edges_padded(),
                   formats=tuple(formats))
        g2.ndata.update(self.ndata)
        g2.edata.update(self.edata)
        return g2

    def edges(self, order: str = "eid"):
        """Return (src, dst) in user edge order (padded length)."""
        if order == "eid":
            return self.src, self.dst
        if order == "srcdst":
            return self.csr_src, self.csr_dst
        raise ValueError(f"unknown order {order!r}")

    def in_degrees(self, v=None):
        deg = jnp.diff(self.csc_indptr)
        return deg if v is None else deg[v]

    def out_degrees(self, u=None):
        deg = jnp.diff(self.csr_indptr)
        return deg if u is None else deg[u]

    def edge_ids(self, u, v, return_uv: bool = False):
        """Edge id(s) of edges (u[i] -> v[i]) (parity:
        ``DGLGraph.edge_ids``). Host-side query. With ``return_uv``
        returns (u, v, eid) triples covering EVERY parallel edge;
        otherwise returns one eid per pair (the first in CSR order) and
        raises if a pair has no edge."""
        u = np.asarray(u, dtype=np.int64).reshape(-1)
        v = np.asarray(v, dtype=np.int64).reshape(-1)
        indptr = np.asarray(self.csr_indptr)
        col = np.asarray(self.csr_dst)
        eid = np.asarray(self.csr_eid)
        if return_uv:
            us, vs, es = [], [], []
            for uu, vv in zip(u, v):
                lo, hi = int(indptr[uu]), int(indptr[uu + 1])
                hits = np.nonzero(col[lo:hi] == vv)[0]
                us.append(np.full(len(hits), uu, np.int64))
                vs.append(np.full(len(hits), vv, np.int64))
                es.append(eid[lo:hi][hits].astype(np.int64))
            cat = (lambda xs: np.concatenate(xs) if xs else
                   np.zeros(0, np.int64))
            return cat(us), cat(vs), cat(es)
        out = np.empty(len(u), dtype=np.int64)
        for i, (uu, vv) in enumerate(zip(u, v)):
            lo, hi = int(indptr[uu]), int(indptr[uu + 1])
            hits = np.nonzero(col[lo:hi] == vv)[0]
            if len(hits) == 0:
                raise KeyError(f"no edge ({int(uu)} -> {int(vv)})")
            out[i] = eid[lo + hits[0]]
        return out if out.size != 1 else out[0]

    def has_edges_between(self, u, v):
        """Boolean mask: does edge (u[i] -> v[i]) exist (parity:
        ``DGLGraph.has_edges_between``). Host-side query."""
        u = np.asarray(u, dtype=np.int64).reshape(-1)
        v = np.asarray(v, dtype=np.int64).reshape(-1)
        indptr = np.asarray(self.csr_indptr)
        col = np.asarray(self.csr_dst)
        out = np.zeros(len(u), dtype=bool)
        for i, (uu, vv) in enumerate(zip(u, v)):
            lo, hi = int(indptr[uu]), int(indptr[uu + 1])
            out[i] = bool((col[lo:hi] == vv).any())
        return out if out.size != 1 else bool(out[0])

    # -- small facade queries (parity: DGLGraph misc surface) ----------

    @property
    def number_of_edges(self):
        return self.num_edges

    @property
    def ntypes(self):
        return ["_N"]

    @property
    def etypes(self):
        return ["_E"]

    @property
    def canonical_etypes(self):
        return [("_N", "_E", "_N")]

    @property
    def is_homogeneous(self) -> bool:
        return True

    @property
    def idtype(self):
        return jnp.asarray(self.src[:1]).dtype

    @property
    def device(self):
        arr = self.src
        return getattr(arr, "device", None) if hasattr(arr, "device") else None

    def nodes(self, ntype=None):
        """All node ids (parity: ``DGLGraph.nodes()``)."""
        if self._is_block:
            raise ValueError("nodes() is ambiguous on a block")
        return jnp.arange(self.num_nodes())

    def all_edges(self, order: str = "eid"):
        """Alias of :meth:`edges` (parity: ``DGLGraph.all_edges``)."""
        return self.edges(order)

    def find_edges(self, eid):
        """(src, dst) endpoints of the given edge ids (parity:
        ``DGLGraph.find_edges``)."""
        eid = jnp.asarray(eid)
        return jnp.asarray(self.src)[eid], jnp.asarray(self.dst)[eid]

    def successors(self, v: int):
        """Out-neighbors of node ``v`` (host-side query)."""
        indptr = np.asarray(self.csr_indptr)
        return np.asarray(self.csr_dst)[int(indptr[v]):int(indptr[v + 1])]

    def predecessors(self, v: int):
        """In-neighbors of node ``v`` (host-side query)."""
        indptr = np.asarray(self.csc_indptr)
        return np.asarray(self.csc_src)[int(indptr[v]):int(indptr[v + 1])]

    def _edges_of(self, nodes, indptr, other, eid, incoming: bool,
                  form: str):
        nodes = np.asarray(nodes, dtype=np.int64).reshape(-1)
        indptr = np.asarray(indptr)
        other = np.asarray(other)
        eid = np.asarray(eid)
        us, vs, es = [], [], []
        for n in nodes:
            lo, hi = int(indptr[n]), int(indptr[n + 1])
            o = other[lo:hi]
            s = np.full(hi - lo, n, np.int64)
            us.append(o if incoming else s)
            vs.append(s if incoming else o)
            es.append(eid[lo:hi].astype(np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs else
               np.zeros(0, np.int64))
        u, v, e = cat(us), cat(vs), cat(es)
        if form == "uv":
            return u, v
        if form == "eid":
            return e
        if form == "all":
            return u, v, e
        raise ValueError(f"unknown form {form!r}")

    def in_edges(self, v, form: str = "uv"):
        """Edges whose destination is in ``v`` (parity:
        ``DGLGraph.in_edges``; host-side query)."""
        return self._edges_of(v, self.csc_indptr, self.csc_src,
                              self.csc_eid, True, form)

    def out_edges(self, u, form: str = "uv"):
        """Edges whose source is in ``u`` (parity: ``DGLGraph.out_edges``;
        host-side query)."""
        return self._edges_of(u, self.csr_indptr, self.csr_dst,
                              self.csr_eid, False, form)

    def subgraph(self, nodes):
        """Node-induced subgraph (parity: ``DGLGraph.subgraph``)."""
        from dgl1_tpu.transform import node_subgraph

        return node_subgraph(self, nodes)

    def to(self, device):
        """Device placement of every array leaf (parity: ``DGLGraph.to``):
        returns a new Graph with the same host-side metadata."""
        import jax

        return jax.device_put(self, device)

    def adjacency_matrix(self, transpose: bool = False, scipy_fmt=None,
                         etype=None):
        """Adjacency as ``A[dst, src] = 1`` (parity:
        ``DGLGraph.adjacency_matrix`` — the SpMM orientation), or the
        transpose. ``scipy_fmt`` in {'coo', 'csr', 'csc'} returns a scipy
        sparse matrix; default returns a dense jnp array (device use)."""
        from scipy import sparse as sp

        e = self.num_real_edges()
        src = np.asarray(self.src)[:e]
        dst = np.asarray(self.dst)[:e]
        rows, cols = (src, dst) if transpose else (dst, src)
        shape = ((self.num_src_nodes(), self.num_dst_nodes()) if transpose
                 else (self.num_dst_nodes(), self.num_src_nodes()))
        mat = sp.coo_matrix(
            (np.ones(e, np.float32), (rows, cols)), shape=shape)
        if scipy_fmt is not None:
            return mat.asformat(scipy_fmt)
        return jnp.asarray(mat.todense())

    def incidence_matrix(self, typestr: str = "both", scipy_fmt=None):
        """Node-edge incidence matrix (parity:
        ``DGLGraph.incidence_matrix`` / ``python/dgl/heterograph.py``):
        shape (N, E); ``'in'``: M[v, e] = 1 iff v is e's destination;
        ``'out'``: M[u, e] = 1 iff u is e's source; ``'both'``:
        M[u, e] = -1, M[v, e] = 1, and 0 for self-loops. ``scipy_fmt``
        as in :meth:`adjacency_matrix`."""
        from scipy import sparse as sp

        e = self.num_real_edges()
        src = np.asarray(self.src)[:e]
        dst = np.asarray(self.dst)[:e]
        eids = np.arange(e)
        n = self.num_nodes()
        if typestr == "in":
            rows, cols, vals = dst, eids, np.ones(e, np.float32)
        elif typestr == "out":
            rows, cols, vals = src, eids, np.ones(e, np.float32)
        elif typestr == "both":
            non_loop = src != dst
            rows = np.concatenate([src[non_loop], dst[non_loop]])
            cols = np.concatenate([eids[non_loop], eids[non_loop]])
            vals = np.concatenate([
                -np.ones(int(non_loop.sum()), np.float32),
                np.ones(int(non_loop.sum()), np.float32)])
        else:
            raise ValueError(f"unknown incidence typestr {typestr!r}")
        mat = sp.coo_matrix((vals, (rows, cols)), shape=(n, e))
        if scipy_fmt is not None:
            return mat.asformat(scipy_fmt)
        return jnp.asarray(mat.todense())

    # DGL aliases.
    adj = adjacency_matrix
    inc = incidence_matrix

    # ------------------------------------------------------------------
    # DGL 0.5 facade crumbs (parity sweep, round 4)
    # ------------------------------------------------------------------
    def has_nodes(self, vid):
        """Parity: ``DGLGraph.has_nodes`` — bool (or bool array) of
        whether the ids are valid node ids."""
        v = np.asarray(vid)
        out = (v >= 0) & (v < self.num_nodes())
        return bool(out) if out.ndim == 0 else out

    def is_multigraph(self) -> bool:
        """Parity: ``DGLGraph.is_multigraph`` — True iff some (u, v)
        pair repeats."""
        e = self.num_real_edges()
        if e == 0:
            return False
        key = (np.asarray(self.src)[:e].astype(np.int64)
               * max(self.num_dst_nodes(), 1)
               + np.asarray(self.dst)[:e].astype(np.int64))
        return len(np.unique(key)) < e

    def clone(self) -> "Graph":
        """Parity: ``DGLGraph.clone`` — same structure (arrays are
        immutable jax buffers, shared), fresh frame dicts."""
        import copy

        new = copy.copy(self)
        new.ndata = dict(self.ndata)
        new.edata = dict(self.edata)
        return new

    def local_var(self) -> "Graph":
        """Parity: ``DGLGraph.local_var`` — a view whose frame
        mutations do not leak back (prefer :meth:`local_scope`)."""
        return self.clone()

    def long(self) -> "Graph":
        """Parity: ``DGLGraph.long`` — ids are already int32/int64
        device arrays; no-op."""
        return self

    def node_attr_schemes(self):
        """Parity: ``DGLGraph.node_attr_schemes`` — {name: (shape,
        dtype)} of node frame fields."""
        return {k: (tuple(v.shape[1:]), v.dtype)
                for k, v in self.ndata.items()}

    def edge_attr_schemes(self):
        return {k: (tuple(v.shape[1:]), v.dtype)
                for k, v in self.edata.items()}

    def create_formats_(self) -> "Graph":
        """Parity: ``DGLGraph.create_formats_`` — formats here are
        built eagerly at construction (static shapes for XLA); no-op."""
        return self

    def number_of_src_nodes(self) -> int:
        return self.num_src_nodes()

    def number_of_dst_nodes(self) -> int:
        return self.num_dst_nodes()

    def srcnodes(self):
        """Parity: ``DGLGraph.srcnodes`` (block source-node ids)."""
        return jnp.arange(self.num_src_nodes())

    def dstnodes(self):
        return jnp.arange(self.num_dst_nodes())

    # ------------------------------------------------------------------
    # Structure transforms that are pure pytree rewires (zero copy)
    # ------------------------------------------------------------------
    def reverse(self, copy_edata: bool = True) -> "Graph":
        """Reverse all edges. CSR and CSC swap roles — no data movement.

        Parity: ``dgl.reverse`` / ``src/graph/graph_op.cc``; here it is free,
        which is what makes the SpMM<->SDDMM autodiff duality cheap.
        """
        g = Graph(
            src=self.dst,
            dst=self.src,
            edge_mask=self.edge_mask,
            csr_indptr=self.csc_indptr,
            csr_dst=self.csc_src,
            csr_eid=self.csc_eid,
            csr_src=self.csc_dst,
            csc_indptr=self.csr_indptr,
            csc_src=self.csr_dst,
            csc_eid=self.csr_eid,
            csc_dst=self.csr_src,
            tdst=self.tsrc,
            tsrc=self.tdst,
            ell_dst=self.ell_src,
            ell_src=self.ell_dst,
            hub_dst=self.hub_src,
            hub_src=self.hub_dst,
            hub_dst_meta=self.hub_src_meta,
            hub_src_meta=self.hub_dst_meta,
            bdense=None,
            ell_dst_meta=self.ell_src_meta,
            ell_src_meta=self.ell_dst_meta,
            num_src_nodes=self._num_dst_nodes,
            num_dst_nodes=self._num_src_nodes,
            num_edges=self._num_edges,
            is_block=self._is_block,
            edata=self.edata if copy_edata else None,
        )
        if self._is_block:
            g.srcdata = dict(self.dstdata)
            g.dstdata = dict(self.srcdata)
        else:
            g.ndata.update(self.ndata)
            g.srcdata = g.ndata
            g.dstdata = g.ndata
        return g

    # ------------------------------------------------------------------
    # DGL-parity message passing API (delegates to core)
    # ------------------------------------------------------------------
    def update_all(self, message_func, reduce_func, apply_node_func=None):
        """Compute ``reduce(message)`` over incoming edges for every node and
        store the result into ``dstdata``. Returns the reduced tensor.

        Parity: ``DGLHeteroGraph.update_all`` -> ``core.message_passing``.
        """
        from dgl1_tpu import core

        return core.update_all(self, message_func, reduce_func, apply_node_func)

    def apply_edges(self, func, edges="__ALL__"):
        """Compute an edge-wise function and store into ``edata``.

        Parity: ``DGLHeteroGraph.apply_edges`` -> g-SDDMM.
        """
        from dgl1_tpu import core

        return core.apply_edges(self, func, edges)

    def apply_nodes(self, func, v="__ALL__"):
        """Compute a node-wise UDF and store into ``ndata``.

        Parity: ``DGLHeteroGraph.apply_nodes``.
        """
        from dgl1_tpu import core

        return core.apply_nodes(self, func, v)

    def send_and_recv(self, edges, message_func, reduce_func, apply_node_func=None):
        from dgl1_tpu import core

        return core.send_and_recv(
            self, edges, message_func, reduce_func, apply_node_func
        )

    def filter_nodes(self, predicate):
        from dgl1_tpu import core

        return core.filter_nodes(self, predicate)

    def filter_edges(self, predicate):
        from dgl1_tpu import core

        return core.filter_edges(self, predicate)

    def prop_nodes(self, nodes_generator, message_func, reduce_func,
                   apply_node_func=None):
        from dgl1_tpu import core

        return core.prop_nodes(self, nodes_generator, message_func,
                               reduce_func, apply_node_func)

    def pull(self, v, message_func, reduce_func, apply_node_func=None):
        from dgl1_tpu import core

        return core.pull(self, v, message_func, reduce_func,
                         apply_node_func)

    def push(self, u, message_func, reduce_func, apply_node_func=None):
        from dgl1_tpu import core

        return core.push(self, u, message_func, reduce_func,
                         apply_node_func)

    def local_scope(self):
        """Context manager restoring ndata/edata on exit (parity:
        ``DGLHeteroGraph.local_scope``)."""
        return _LocalScope(self)

    # ------------------------------------------------------------------
    # Pytree protocol
    # ------------------------------------------------------------------
    def _struct_leaves(self):
        return (
            self.src,
            self.dst,
            self.edge_mask,
            self.csr_indptr,
            self.csr_dst,
            self.csr_eid,
            self.csr_src,
            self.csc_indptr,
            self.csc_src,
            self.csc_eid,
            self.csc_dst,
            self.tdst,
            self.tsrc,
            self.ell_dst,
            self.ell_src,
            self.hub_dst,
            self.hub_src,
            self.bdense,
        )

    def tree_flatten(self):
        ndata = dict(self.ndata)
        edata = dict(self.edata)
        if self._is_block:
            srcdata = dict(self.srcdata)
            dstdata = dict(self.dstdata)
        else:
            srcdata = {}
            dstdata = {}
        children = (
            self._struct_leaves(),
            ndata,
            edata,
            srcdata,
            dstdata,
            self._batch_num_nodes,
            self._batch_num_edges,
        )
        aux = (
            self._num_src_nodes,
            self._num_dst_nodes,
            self._num_edges,
            self._is_block,
            self.ell_dst_meta,
            self.ell_src_meta,
            self.hub_dst_meta,
            self.hub_src_meta,
            self.bdense_meta,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        struct, ndata, edata, srcdata, dstdata, bnn, bne = children
        (num_src, num_dst, num_edges, is_block, ell_dst_meta, ell_src_meta,
         hub_dst_meta, hub_src_meta, bdense_meta) = aux
        (
            src,
            dst,
            edge_mask,
            csr_indptr,
            csr_dst,
            csr_eid,
            csr_src,
            csc_indptr,
            csc_src,
            csc_eid,
            csc_dst,
            tdst,
            tsrc,
            ell_dst,
            ell_src,
            hub_dst,
            hub_src,
            bdense,
        ) = struct
        g = cls(
            src=src,
            dst=dst,
            edge_mask=edge_mask,
            csr_indptr=csr_indptr,
            csr_dst=csr_dst,
            csr_eid=csr_eid,
            csr_src=csr_src,
            csc_indptr=csc_indptr,
            csc_src=csc_src,
            csc_eid=csc_eid,
            csc_dst=csc_dst,
            num_src_nodes=num_src,
            num_dst_nodes=num_dst,
            num_edges=num_edges,
            is_block=is_block,
            tdst=tdst,
            tsrc=tsrc,
            ell_dst=ell_dst,
            ell_src=ell_src,
            ell_dst_meta=ell_dst_meta,
            ell_src_meta=ell_src_meta,
            hub_dst=hub_dst,
            hub_src=hub_src,
            hub_dst_meta=hub_dst_meta,
            hub_src_meta=hub_src_meta,
            bdense=bdense,
            bdense_meta=bdense_meta,
            ndata=ndata,
            edata=edata,
            srcdata=srcdata if is_block else None,
            dstdata=dstdata if is_block else None,
        )
        g._batch_num_nodes = bnn
        g._batch_num_edges = bne
        return g

    def __repr__(self):
        kind = "Block" if self._is_block else "Graph"
        return (
            f"{kind}(num_src_nodes={self._num_src_nodes}, "
            f"num_dst_nodes={self._num_dst_nodes}, "
            f"num_edges={self._num_edges}"
            + (f", padded_to={self._num_edges_padded}" if self.is_padded else "")
            + ")"
        )


class _LocalScope:
    def __init__(self, g: Graph):
        self._g = g

    def __enter__(self):
        g = self._g
        self._saved = (dict(g.ndata), dict(g.edata))
        if g.is_block:
            self._saved_bip = (dict(g.srcdata), dict(g.dstdata))
        return g

    def __exit__(self, *exc):
        g = self._g
        g.ndata.clear()
        g.ndata.update(self._saved[0])
        g.edata.clear()
        g.edata.update(self._saved[1])
        if g.is_block:
            g.srcdata.clear()
            g.srcdata.update(self._saved_bip[0])
            g.dstdata.clear()
            g.dstdata.update(self._saved_bip[1])
        return False


jax.tree_util.register_pytree_node(
    Graph, Graph.tree_flatten, Graph.tree_unflatten
)


# ----------------------------------------------------------------------
# Construction (host side, numpy)
# ----------------------------------------------------------------------

def _build_formats(src: np.ndarray, dst: np.ndarray, num_src: int, num_dst: int,
                   num_edges: int, num_padded: int, hub=None,
                   hub_dense_floor: Optional[int] = None,
                   formats: Optional[Tuple[str, ...]] = None):
    """Build padded COO + CSR + CSC host-side.

    Parity: ``src/array/array.cc`` COOToCSR/COOSort; implemented as numpy
    argsort + bincount (stable sorts keep edge-id order within a row, which
    preserves the reference's edge-order guarantees).

    ``formats``: None builds everything (COO/CSR/CSC plus the derived
    engine layouts — tiles, ELL, hub). A tuple restricts the derived
    layouts (parity: ``DGLGraph.formats`` / ``UnitGraph::restrict_format``):
    the canonical COO+CSR+CSC trio is always built (cheap, C++ builder);
    "tile"/"ell"/"hub" opt into the corresponding engine layout. E.g.
    ``formats=("csc",)`` gives a sampling-only parent graph at a fraction
    of the build time/memory.
    """
    want = (lambda k: True) if formats is None else (
        lambda k: k in formats)
    pad = num_padded - num_edges

    def padded(a, sentinel):
        if pad == 0:
            return a.astype(ID_DTYPE)
        return np.concatenate(
            [a.astype(ID_DTYPE), np.full((pad,), sentinel, dtype=ID_DTYPE)]
        )

    coo_src = padded(src, num_src)
    coo_dst = padded(dst, num_dst)
    mask = np.zeros((num_padded,), dtype=bool)
    mask[:num_edges] = True

    from dgl1_tpu import _native

    native = _native.lib()
    if native is not None:
        src32 = np.ascontiguousarray(src, dtype=ID_DTYPE)
        dst32 = np.ascontiguousarray(dst, dtype=ID_DTYPE)

        def adj(key, other, num_keys, key_sentinel, other_sentinel):
            indptr = np.zeros((num_keys + 1,), dtype=ID_DTYPE)
            s_other = np.full((num_padded,), other_sentinel, dtype=ID_DTYPE)
            s_eid = np.zeros((num_padded,), dtype=ID_DTYPE)
            s_key = np.full((num_padded,), key_sentinel, dtype=ID_DTYPE)
            native.build_adj(key, other, num_edges, num_keys, indptr,
                             s_other, s_eid, s_key)
            return indptr, s_other, s_eid, s_key

        csr_indptr, csr_dst, csr_eid, csr_src = adj(
            src32, dst32, num_src, num_src, num_dst
        )
        csc_indptr, csc_src, csc_eid, csc_dst = adj(
            dst32, src32, num_dst, num_dst, num_src
        )
    else:
        eid = np.arange(num_edges, dtype=ID_DTYPE)

        # CSR: sort by src (stable).
        order = np.argsort(src, kind="stable").astype(ID_DTYPE)
        csr_src = padded(src[order], num_src)
        csr_dst = padded(dst[order], num_dst)
        csr_eid = padded(eid[order], 0)
        counts = np.bincount(src, minlength=num_src) if num_edges else np.zeros(num_src, dtype=np.int64)
        csr_indptr = np.zeros((num_src + 1,), dtype=ID_DTYPE)
        np.cumsum(counts, out=csr_indptr[1:])

        # CSC: sort by dst (stable).
        order = np.argsort(dst, kind="stable").astype(ID_DTYPE)
        csc_dst = padded(dst[order], num_dst)
        csc_src = padded(src[order], num_src)
        csc_eid = padded(eid[order], 0)
        counts = np.bincount(dst, minlength=num_dst) if num_edges else np.zeros(num_dst, dtype=np.int64)
        csc_indptr = np.zeros((num_dst + 1,), dtype=ID_DTYPE)
        np.cumsum(counts, out=csc_indptr[1:])

    ell_dst_meta = ell_dst = ell_src_meta = ell_src = None
    if want("ell"):
        ell_dst_meta, ell_dst = _build_ell(
            csc_indptr, csc_src, csc_eid, num_dst, num_edges
        )
        ell_src_meta, ell_src = _build_ell(
            csr_indptr, csr_dst, csr_eid, num_src, num_edges
        )
    # Hub-dense HYB layout (reduce-by-dst): auto-built only when the head
    # of the in-degree distribution clears the density bar. hub=True
    # forces it (tests / known-skewed graphs), an int sets the per-group
    # edge floor explicitly, hub=False skips.
    hub_dst_meta = hub_dst = None
    if want("hub") and hub is not False and num_edges > 0:
        from dgl1_tpu import hub_format

        if hub is None:
            floor = None
        elif hub is True:
            floor = 1
        else:
            floor = int(hub)
        hub_dst_meta, hub_dst = hub_format.build_hub_format(
            csc_indptr, csc_src, csc_eid, csc_dst, num_src, num_dst,
            num_edges, num_padded, _build_ell,
            min_group_edges=floor, dense_floor=hub_dense_floor,
        )
    bdense_meta = bdense = None
    if formats is not None and "bdense" in formats and num_edges > 0:
        from dgl1_tpu.bdense_format import build_block_dense

        bdense_meta, bdense = build_block_dense(
            np.asarray(src, np.int64), np.asarray(dst, np.int64),
            num_src, num_dst, _build_ell,
        )
    return dict(
        bdense_meta=bdense_meta,
        bdense=bdense,
        src=coo_src,
        dst=coo_dst,
        edge_mask=mask,
        csr_indptr=csr_indptr,
        csr_dst=csr_dst,
        csr_eid=csr_eid,
        csr_src=csr_src,
        csc_indptr=csc_indptr,
        csc_src=csc_src,
        csc_eid=csc_eid,
        csc_dst=csc_dst,
        tdst=(_build_tiles(csc_dst, csc_src, csc_eid, num_edges, num_dst)
              if want("tile") else None),
        tsrc=(_build_tiles(csr_src, csr_dst, csr_eid, num_edges, num_src)
              if want("tile") else None),
        ell_dst_meta=ell_dst_meta,
        ell_dst=ell_dst,
        ell_src_meta=ell_src_meta,
        ell_src=ell_src,
        hub_dst_meta=hub_dst_meta,
        hub_dst=hub_dst,
    )


def _ladder_rung(k: int) -> int:
    """Smallest ELL ladder rung >= k."""
    for r in _ELL_LADDER:
        if r >= k:
            return r
    raise ValueError(f"degree {k} above the ELL ladder")


def _build_ell_uniform(indptr: np.ndarray, nbr_sorted: np.ndarray,
                       eid_sorted: np.ndarray, num_target: int, k: int):
    """Uniform single-rung ELL: every row (zero-degree included) gets
    exactly ``rung(k)`` slots, so the bucket metadata — and with it the jit
    static key — is a pure function of (num_target, k), identical for
    every sampled block of an epoch. This is the static-shape layout for
    pipeline blocks whose per-row degree is bounded by the fanout
    (TPU-native counterpart of the reference's dynamically-sized blocks;
    SURVEY.md §7 stance #2).

    Returns (meta, arrays) like :func:`_build_ell`; ``inv_perm`` is a
    zero-length array, the engine-side marker for "rows already in order,
    skip the inverse permute".
    """
    k_pad = _ladder_rung(max(int(k), 1))
    deg = np.diff(indptr[: num_target + 1]).astype(np.int64)
    if deg.size and int(deg.max(initial=0)) > k_pad:
        raise ValueError(
            f"row degree {int(deg.max())} exceeds uniform ELL width {k_pad}"
        )
    sentinel = np.int64(1 << 30)
    mat = np.full((num_target, k_pad), sentinel, dtype=np.int64)
    emat = np.zeros((num_target, k_pad), dtype=np.int64)
    total = int(deg.sum())
    if total:
        flat_rows = np.repeat(np.arange(num_target), deg)
        flat_cols = np.arange(total) - np.repeat(np.cumsum(deg) - deg, deg)
        src_pos = np.repeat(indptr[:num_target].astype(np.int64), deg) \
            + flat_cols
        mat[flat_rows, flat_cols] = nbr_sorted[src_pos]
        emat[flat_rows, flat_cols] = eid_sorted[src_pos]
    meta = ((k_pad, num_target),)
    return meta, {
        "idx": mat.reshape(-1).astype(ID_DTYPE),
        "eid": emat.reshape(-1).astype(ID_DTYPE),
        "inv_perm": np.zeros((0,), ID_DTYPE),
    }


def static_tile_bound(num_edges_padded: int, num_target: int) -> int:
    """Static upper bound on the tile count of :func:`_build_tiles`:
    every row block adds at most one partial tile on top of the
    edge-count floor."""
    T, R = TILE_EDGES, TILE_ROWS
    return max(
        (num_edges_padded + T - 1) // T + (num_target + R - 1) // R, 1
    )


def _pad_tiles(tiles: dict, pad_to: int, num_target: int) -> dict:
    """Pad the tile arrays to a static tile count with no-op tiles
    (lid = -1 everywhere -> zero one-hot rows; first = 0 -> pure
    accumulate). Keeps every leaf shape a function of the static bounds
    so sampled blocks share ONE compiled program."""
    T = TILE_EDGES
    n = tiles["lid"].shape[0]
    if n > pad_to:
        raise ValueError(
            f"actual tile count {n} exceeds static bound {pad_to}")
    if n == pad_to:
        return tiles
    extra = pad_to - n
    n_blocks = max((num_target + TILE_ROWS - 1) // TILE_ROWS, 1)
    return dict(
        rows=np.concatenate(
            [tiles["rows"],
             np.full((extra,), n_blocks - 1, ID_DTYPE)]),
        first=np.concatenate([tiles["first"], np.zeros((extra,), ID_DTYPE)]),
        lid=np.concatenate(
            [tiles["lid"], np.full((extra, T), -1, ID_DTYPE)], axis=0),
        gather=np.concatenate(
            [tiles["gather"], np.zeros((extra * T,), ID_DTYPE)]),
        eid=np.concatenate(
            [tiles["eid"], np.zeros((extra * T,), ID_DTYPE)]),
        block_mask=tiles["block_mask"],
    )


def _build_tiles(target_sorted: np.ndarray, gather_sorted: np.ndarray,
                 eid_sorted: np.ndarray, num_edges: int, num_target: int):
    """Build the edge-tile descriptors for the Pallas segment-reduce kernel.

    Input arrays are in target-sorted order (CSC for reduce-by-dst, CSR for
    reduce-by-src), possibly padded with sentinel targets >= num_target at
    the end (which are excluded here). Layout: output rows are grouped into
    blocks of TILE_ROWS; each block's edges occupy whole tiles of
    TILE_EDGES slots (padded with lid = -1). This is the TPU-native
    replacement for the reference's atomic-scatter CUDA SpMM
    (``src/array/cuda/spmm.cu``): reduction becomes a per-tile one-hot
    matmul with sequential accumulation, which XLA scatter cannot match on
    TPU (no atomics, pathological scatter lowering).

    Returns dict of numpy arrays:
      rows   (n_tiles,)       int32 row-block index of each tile
      first  (n_tiles,)       int32 1 if tile is the first of its block
      lid    (n_tiles, T)     int32 target id within block, -1 padding
      gather (n_tiles*T,)     int32 source-side node id per slot (0 pad)
      eid    (n_tiles*T,)     int32 user edge id per slot (0 pad)
    """
    T, R = TILE_EDGES, TILE_ROWS

    from dgl1_tpu import _native

    native = _native.lib()
    if native is not None:
        tgt32 = np.ascontiguousarray(target_sorted[:num_edges], ID_DTYPE)
        gat32 = np.ascontiguousarray(gather_sorted[:num_edges], ID_DTYPE)
        eid32 = np.ascontiguousarray(eid_sorted[:num_edges], ID_DTYPE)
        n_tiles = int(native.plan_tiles(tgt32, num_edges, num_target, T, R))
        rows = np.zeros((n_tiles,), ID_DTYPE)
        first = np.zeros((n_tiles,), ID_DTYPE)
        lid = np.full((n_tiles * T,), -1, ID_DTYPE)
        gather = np.zeros((n_tiles * T,), ID_DTYPE)
        eid_out = np.zeros((n_tiles * T,), ID_DTYPE)
        n_blocks = max((num_target + R - 1) // R, 1)
        block_mask = np.bincount(
            tgt32 // R, minlength=n_blocks
        ).astype(np.int64) > 0
        if n_tiles == 0:
            return dict(
                rows=np.zeros((1,), ID_DTYPE),
                first=np.ones((1,), ID_DTYPE),
                lid=np.full((1, T), -1, ID_DTYPE),
                gather=np.zeros((T,), ID_DTYPE),
                eid=np.zeros((T,), ID_DTYPE),
                block_mask=block_mask,
            )
        native.build_tiles(tgt32, gat32, eid32, num_edges, num_target, T, R,
                           rows, first, lid, gather, eid_out)
        return dict(rows=rows, first=first, lid=lid.reshape(n_tiles, T),
                    gather=gather, eid=eid_out, block_mask=block_mask)

    tgt = target_sorted[:num_edges].astype(np.int64)
    gat = gather_sorted[:num_edges].astype(np.int64)
    eid = eid_sorted[:num_edges].astype(np.int64)

    n_blocks = max((num_target + R - 1) // R, 1)
    blk = tgt // R
    cnt = np.bincount(blk, minlength=n_blocks) if num_edges else np.zeros(
        n_blocks, dtype=np.int64
    )
    # Empty row blocks get NO tiles (their output rows are uninitialized
    # memory and must be masked out by the consumer via block_mask) —
    # forcing a zero-fill tile per empty block doubled the slot count on
    # hub-concentrated graphs.
    tiles_per_block = (cnt + T - 1) // T
    block_mask = (cnt > 0)
    n_tiles = int(tiles_per_block.sum())
    if n_tiles == 0:
        return dict(
            rows=np.zeros((1,), ID_DTYPE),
            first=np.ones((1,), ID_DTYPE),
            lid=np.full((1, T), -1, ID_DTYPE),
            gather=np.zeros((T,), ID_DTYPE),
            eid=np.zeros((T,), ID_DTYPE),
            block_mask=np.zeros((n_blocks,), bool),
        )

    rows = np.repeat(np.arange(n_blocks), tiles_per_block).astype(ID_DTYPE)
    first = np.zeros((n_tiles,), ID_DTYPE)
    starts = np.concatenate([[0], np.cumsum(tiles_per_block)[:-1]])
    # Trailing empty blocks alias past the end; empty blocks elsewhere
    # alias the next block's start (which IS a first tile) — harmless.
    first[starts[starts < n_tiles]] = 1

    # Slot index per edge: edges of block b start at slot_start[b] and are
    # contiguous (they are contiguous in the sorted edge order).
    slot_start = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(tiles_per_block[:-1] * T, out=slot_start[1:])
    edge_start = np.zeros(n_blocks, dtype=np.int64)
    np.cumsum(cnt[:-1], out=edge_start[1:])
    pos_in_block = np.arange(num_edges) - edge_start[blk]
    slot = slot_start[blk] + pos_in_block

    n_slots = n_tiles * T
    lid = np.full((n_slots,), -1, dtype=ID_DTYPE)
    gather = np.zeros((n_slots,), dtype=ID_DTYPE)
    eid_out = np.zeros((n_slots,), dtype=ID_DTYPE)
    lid[slot] = (tgt - blk * R).astype(ID_DTYPE)
    gather[slot] = gat.astype(ID_DTYPE)
    eid_out[slot] = eid.astype(ID_DTYPE)
    return dict(
        rows=rows,
        first=first,
        lid=lid.reshape(n_tiles, T),
        gather=gather,
        eid=eid_out,
        block_mask=block_mask,
    )


# Bucket ladder for the ELL engine: row degrees round up to the nearest
# rung (waste <= 1.5x per row, ~1.25x typical): 1,2,3,4,6,8,12,... then
# alternating x1.5/x1.33 doublings up to 2^24.
def _make_ell_ladder():
    ladder = [1, 2, 3]
    while ladder[-1] < (1 << 24):
        ladder.append(ladder[-2] * 2)
    return ladder


_ELL_LADDER = _make_ell_ladder()


def _build_ell(indptr: np.ndarray, nbr_sorted: np.ndarray,
               eid_sorted: np.ndarray, num_target: int, num_edges: int,
               min_slots: Optional[int] = None):
    """Degree-bucketed ELL layout for scatter-free segment reduction.

    Rows (reduce targets) are grouped by padded degree k (ladder above);
    within a bucket every row stores exactly k gather slots (sentinel
    ``len(nbr source space)`` marks padding — consumed with OOB-fill
    gathers). Output rows come back bucket-sorted; ``inv_perm`` maps an
    original row id to its bucket-sorted position (== num_rows_nonzero for
    zero-degree rows, resolved by a fill-gather).

    Returns (meta, arrays): meta is a static tuple of (k, n_rows) pairs;
    arrays = {idx (slots,), eid (slots,), inv_perm (num_target,)}.

    Parity note: this is the TPU answer to the reference's CUDA
    atomic-scatter SpMM and also generalizes its degree-bucketing UDF
    scheduler (``python/dgl/runtime/degree_bucketing.py``) into the fused
    kernel path itself.
    """
    if num_edges > 0 and num_target > 0:
        from dgl1_tpu import _native

        native = _native.lib()
        if native is not None:
            ip32 = np.ascontiguousarray(indptr[: num_target + 1], ID_DTYPE)
            nbr32 = np.ascontiguousarray(nbr_sorted, ID_DTYPE)
            eid32 = np.ascontiguousarray(eid_sorted, ID_DTYPE)
            meta_k = np.zeros((64,), np.int64)
            meta_nb = np.zeros((64,), np.int64)
            n_out = np.zeros((2,), np.int64)
            ms = -1 if min_slots is None else int(min_slots)
            nb = native.plan_ell(ip32, num_target, num_edges, ms, meta_k,
                                 meta_nb, n_out)
            idx = np.empty((int(n_out[0]),), ID_DTYPE)
            eid = np.empty((int(n_out[0]),), ID_DTYPE)
            inv_perm = np.empty((num_target,), ID_DTYPE)
            native.fill_ell(ip32, nbr32, eid32, num_target, num_edges, ms,
                            idx, eid, inv_perm)
            meta = tuple(
                (int(meta_k[i]), int(meta_nb[i])) for i in range(nb)
            )
            return meta, {"idx": idx, "eid": eid, "inv_perm": inv_perm}

    deg = np.diff(indptr[: num_target + 1]).astype(np.int64)
    ladder = np.asarray(_ELL_LADDER, dtype=np.int64)
    kidx = np.searchsorted(ladder, deg, side="left")
    kidx = np.minimum(kidx, len(ladder) - 1)

    # Coalesce small buckets upward: each gather/reduce op costs ~0.2ms
    # on TPU regardless of size, so buckets below a slot floor pay more in
    # launch overhead than their padding would cost at the next rung.
    MIN_SLOTS = min(1 << 16, max(num_edges // 4, 1)) \
        if min_slots is None else min_slots
    counts = np.bincount(kidx[deg > 0], minlength=len(ladder))
    for r in range(len(ladder) - 1):
        if counts[r] and counts[r] * ladder[r] < MIN_SLOTS:
            counts[r + 1] += counts[r]
            counts[r] = 0
            kidx = np.where((kidx == r) & (deg > 0), r + 1, kidx)
    kpad = ladder[kidx]
    kpad = np.where(deg == 0, 0, kpad)

    order = np.argsort(np.where(deg == 0, np.int64(1 << 60), kpad),
                       kind="stable")
    nz = order[: int((deg > 0).sum())]

    inv_perm = np.full((num_target,), len(nz), dtype=ID_DTYPE)
    inv_perm[nz] = np.arange(len(nz), dtype=ID_DTYPE)

    meta = []
    idx_parts = []
    eid_parts = []
    sentinel = np.int64(1 << 30)  # any value >= source-space size: OOB fill
    pos = 0
    while pos < len(nz):
        k = int(kpad[nz[pos]])
        end = pos
        while end < len(nz) and kpad[nz[end]] == k:
            end += 1
        rows = nz[pos:end]
        n_b = len(rows)
        mat = np.full((n_b, k), sentinel, dtype=np.int64)
        emat = np.zeros((n_b, k), dtype=np.int64)
        starts = indptr[rows]
        degs = deg[rows]
        # Vectorized ragged fill: flat positions within the bucket matrix.
        flat_rows = np.repeat(np.arange(n_b), degs)
        flat_cols = np.arange(int(degs.sum())) - np.repeat(
            np.cumsum(degs) - degs, degs
        )
        src_pos = np.repeat(starts, degs) + flat_cols
        mat[flat_rows, flat_cols] = nbr_sorted[src_pos]
        emat[flat_rows, flat_cols] = eid_sorted[src_pos]
        meta.append((k, n_b))
        idx_parts.append(mat.reshape(-1))
        eid_parts.append(emat.reshape(-1))
        pos = end

    idx = (np.concatenate(idx_parts) if idx_parts else
           np.zeros(0, np.int64))
    eid = (np.concatenate(eid_parts) if eid_parts else
           np.zeros(0, np.int64))
    return tuple(meta), {
        "idx": idx.astype(ID_DTYPE),
        "eid": eid.astype(ID_DTYPE),
        "inv_perm": inv_perm,
    }


def _build_ell_fixed_rows(indptr, nbr_sorted, eid_sorted, meta_fixed,
                          row_base: int, num_target: int):
    """ELL stack with PINNED row order: bucket b of ``meta_fixed``
    (a ((k, n), ...) tuple) hosts rows ``[row_base + off, row_base +
    off + n)`` IN ID ORDER, so stack position == id - row_base for
    every covered row — regardless of this edge set's own degrees.
    Rows whose degree here is 0 become phantom all-sentinel rows.

    This is the typed-identity enabler (PERF_NOTES r6): per-relation
    tail stacks share the GLOBAL (total-degree) bucket meta of a
    hub_order-relabeled graph, which makes every relation's merge
    order the node order at once (a per-relation degree-sorted stack
    cannot — a dst sorts differently under each relation's degrees).

    Raises ValueError if any row's degree exceeds its bucket width
    (impossible when meta_fixed comes from the superset graph: bucket
    width >= total degree >= subset degree).
    """
    n_rows = int(sum(n for _, n in meta_fixed))
    deg = np.diff(indptr[: num_target + 1]).astype(np.int64)
    sentinel = np.int64(1 << 30)
    idx_parts, eid_parts = [], []
    off = 0
    for k, n_b in meta_fixed:
        rows = np.arange(row_base + off, row_base + off + n_b,
                         dtype=np.int64)
        rows = rows[rows < num_target]
        degs = deg[rows] if len(rows) else np.zeros((0,), np.int64)
        if degs.size and int(degs.max(initial=0)) > k:
            raise ValueError(
                f"fixed-row ELL: degree {int(degs.max())} exceeds "
                f"bucket width {k}")
        mat = np.full((n_b, k), sentinel, dtype=np.int64)
        emat = np.zeros((n_b, k), dtype=np.int64)
        total = int(degs.sum())
        if total:
            flat_rows = np.repeat(np.arange(len(rows)), degs)
            flat_cols = np.arange(total) - np.repeat(
                np.cumsum(degs) - degs, degs)
            src_pos = np.repeat(indptr[rows].astype(np.int64), degs) \
                + flat_cols
            mat[flat_rows, flat_cols] = nbr_sorted[src_pos]
            emat[flat_rows, flat_cols] = eid_sorted[src_pos]
        idx_parts.append(mat.reshape(-1))
        eid_parts.append(emat.reshape(-1))
        off += n_b
    inv_perm = np.full((num_target,), n_rows, dtype=ID_DTYPE)
    covered = np.arange(row_base, min(row_base + n_rows, num_target),
                        dtype=np.int64)
    inv_perm[covered] = (covered - row_base).astype(ID_DTYPE)
    idx = (np.concatenate(idx_parts) if idx_parts
           else np.zeros(0, np.int64))
    eid = (np.concatenate(eid_parts) if eid_parts
           else np.zeros(0, np.int64))
    return tuple(meta_fixed), {
        "idx": idx.astype(ID_DTYPE),
        "eid": eid.astype(ID_DTYPE),
        "inv_perm": inv_perm,
    }


def graph(
    data: Tuple,
    num_nodes: Optional[int] = None,
    pad_edges_to: Optional[int] = None,
    pad_edges_multiple: Optional[int] = None,
    device_arrays: bool = False,
    hub=None,
    hub_dense_floor: Optional[int] = None,
    formats: Optional[Tuple[str, ...]] = None,
) -> Graph:
    """Create a homogeneous graph from an edge list ``(src, dst)``.

    Parity: ``dgl.graph`` (``python/dgl/convert.py``). ``pad_edges_to`` /
    ``pad_edges_multiple`` pad the edge arrays to a static size so several
    graphs share one compiled program (the TPU-native replacement for the
    reference's dynamic nnz).
    """
    src, dst = data
    src = _as_numpy_ids(src)
    dst = _as_numpy_ids(dst)
    if src.shape != dst.shape or src.ndim != 1:
        raise ValueError("src/dst must be 1-D arrays of equal length")
    num_edges = int(src.shape[0])
    if num_nodes is None:
        num_nodes = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1)
    if num_edges and (src.min() < 0 or dst.min() < 0 or
                      src.max() >= num_nodes or dst.max() >= num_nodes):
        raise ValueError("edge endpoint out of range")
    num_padded = num_edges
    if pad_edges_to is not None:
        if pad_edges_to < num_edges:
            raise ValueError("pad_edges_to < num_edges")
        num_padded = int(pad_edges_to)
    elif pad_edges_multiple:
        num_padded = max(_round_up(num_edges, pad_edges_multiple), pad_edges_multiple)
    arrays = _build_formats(src, dst, num_nodes, num_nodes, num_edges,
                            num_padded, hub=hub,
                            hub_dense_floor=hub_dense_floor,
                            formats=formats)
    if device_arrays:
        metas = {k: arrays.pop(k)
                 for k in ("ell_dst_meta", "ell_src_meta", "hub_dst_meta")}
        arrays = jax.tree.map(jnp.asarray, arrays)
        arrays.update(metas)
    return Graph(
        **arrays,
        num_src_nodes=num_nodes,
        num_dst_nodes=num_nodes,
        num_edges=num_edges,
    )


def block(
    data: Tuple,
    num_src_nodes: Optional[int] = None,
    num_dst_nodes: Optional[int] = None,
    pad_edges_to: Optional[int] = None,
    formats: Optional[Tuple[str, ...]] = None,
    uniform_ell_k: Optional[int] = None,
) -> Graph:
    """Create a bipartite message-flow block (parity: ``dgl.create_block`` /
    ``src/graph/transform/to_bipartite.cc :: ToBlock`` output shape).

    ``uniform_ell_k``: static-shape pipeline mode for sampled blocks whose
    in-degree is bounded by a fanout ``k``. Builds (a) a uniform
    single-rung dst-ELL (static bucket metadata), (b) BOTH tile directions
    padded to a static tile count for the Pallas engine (backward /
    min-max reduces), and (c) pins the pytree's static edge count to the
    padded length — so every mini-batch of an epoch shares ONE compiled
    XLA program (SURVEY.md §7 stance #2; the real edge count lives in
    ``meta['num_real_edges']`` and the ``edge_mask`` leaf).
    """
    src, dst = data
    src = _as_numpy_ids(src)
    dst = _as_numpy_ids(dst)
    num_edges = int(src.shape[0])
    if num_src_nodes is None:
        num_src_nodes = int(src.max(initial=-1) + 1)
    if num_dst_nodes is None:
        num_dst_nodes = int(dst.max(initial=-1) + 1)
    num_padded = int(pad_edges_to) if pad_edges_to is not None else num_edges
    if uniform_ell_k is not None:
        arrays = _build_formats(
            src, dst, num_src_nodes, num_dst_nodes, num_edges, num_padded,
            formats=("coo",),
        )
        ell_dst_meta, ell_dst = _build_ell_uniform(
            arrays["csc_indptr"], arrays["csc_src"], arrays["csc_eid"],
            num_dst_nodes, uniform_ell_k,
        )
        arrays["ell_dst_meta"], arrays["ell_dst"] = ell_dst_meta, ell_dst
        arrays["tdst"] = _pad_tiles(
            _build_tiles(arrays["csc_dst"], arrays["csc_src"],
                         arrays["csc_eid"], num_edges, num_dst_nodes),
            static_tile_bound(num_padded, num_dst_nodes), num_dst_nodes,
        )
        arrays["tsrc"] = _pad_tiles(
            _build_tiles(arrays["csr_src"], arrays["csr_dst"],
                         arrays["csr_eid"], num_edges, num_src_nodes),
            static_tile_bound(num_padded, num_src_nodes), num_src_nodes,
        )
        g = Graph(
            **arrays,
            num_src_nodes=num_src_nodes,
            num_dst_nodes=num_dst_nodes,
            num_edges=num_padded,
            is_block=True,
        )
        g.meta["num_real_edges"] = num_edges
        return g
    arrays = _build_formats(
        src, dst, num_src_nodes, num_dst_nodes, num_edges, num_padded,
        formats=formats,
    )
    return Graph(
        **arrays,
        num_src_nodes=num_src_nodes,
        num_dst_nodes=num_dst_nodes,
        num_edges=num_edges,
        is_block=True,
    )


create_block = block


def rand_graph(num_nodes: int, num_edges: int, seed: int = 0, **kw) -> Graph:
    """Uniform random multigraph (parity: ``dgl.rand_graph``), deterministic."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, size=num_edges)
    dst = rng.integers(0, num_nodes, size=num_edges)
    return graph((src, dst), num_nodes=num_nodes, **kw)


def rand_bipartite(num_src: int, num_dst: int, num_edges: int, seed: int = 0,
                   **kw) -> Graph:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, size=num_edges)
    dst = rng.integers(0, num_dst, size=num_edges)
    return block((src, dst), num_src_nodes=num_src, num_dst_nodes=num_dst, **kw)


def from_scipy(sp_mat, **kw) -> Graph:
    """Create a graph from a scipy sparse matrix (parity: ``dgl.from_scipy``).

    Row index is src, column index is dst.
    """
    coo = sp_mat.tocoo()
    return graph((coo.row, coo.col), num_nodes=max(coo.shape), **kw)


def from_networkx(nx_graph, node_attrs=(), edge_attrs=(), **kw) -> Graph:
    """Create a graph from a networkx graph (parity: ``dgl.from_networkx``,
    ``python/dgl/convert.py``). Undirected inputs get both edge
    directions; listed node/edge attributes are stacked into
    ndata/edata."""
    import networkx as nx

    nodes = list(nx_graph.nodes())
    relabel = {v: i for i, v in enumerate(nodes)}
    edges = list(nx_graph.edges())
    src = np.asarray([relabel[u] for u, v in edges], dtype=np.int64)
    dst = np.asarray([relabel[v] for u, v in edges], dtype=np.int64)
    if not nx_graph.is_directed():
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    g = graph((src, dst), num_nodes=len(nodes), **kw)
    if node_attrs:
        import jax.numpy as jnp

        for key in node_attrs:
            vals = np.asarray([nx_graph.nodes[v][key] for v in nodes])
            g.ndata[key] = jnp.asarray(
                vals if vals.ndim > 1 else vals[:, None])
    if edge_attrs:
        import jax.numpy as jnp

        for key in edge_attrs:
            vals = np.asarray([nx_graph.edges[e][key] for e in edges])
            if not nx_graph.is_directed():
                vals = np.concatenate([vals, vals])
            g.edata[key] = jnp.asarray(
                vals if vals.ndim > 1 else vals[:, None])
    return g


def to_networkx(g: Graph, node_attrs=(), edge_attrs=()):
    """Convert to a networkx MultiDiGraph (parity: ``dgl.to_networkx``)."""
    import networkx as nx

    nxg = nx.MultiDiGraph()
    nxg.add_nodes_from(range(g.num_nodes()))
    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    keys = [nxg.add_edge(int(src[i]), int(dst[i]), id=i)
            for i in range(e)]
    for key in node_attrs:
        vals = np.asarray(g.ndata[key])
        for v in range(g.num_nodes()):
            nxg.nodes[v][key] = vals[v]
    for key in edge_attrs:
        vals = np.asarray(g.edata[key])
        for i in range(e):
            nxg.edges[int(src[i]), int(dst[i]), keys[i]][key] = vals[i]
    return nxg
