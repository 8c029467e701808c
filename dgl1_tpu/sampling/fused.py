"""Fused native sampling: neighbor sample + to_block in one C++ pass.

Parity: the reference performs per-layer mini-batch sampling in C++ too —
``src/array/cpu/rowwise_sampling.cc`` (uniform row-wise pick without
replacement) feeding ``src/graph/transform/to_bipartite.cc :: ToBlock``
(hash-map relabel). This module is the TPU-shaped equivalent: one native
call emits the sampled edges *already relabeled and dst-major*, so the
static-shape padded block (COO + CSC + CSR + both ELL directions) is
assembled with no sort, no full-graph-sized relabel array, and no numpy
lexsort — the three costs that dominated the pure-numpy pipeline
(~743 ms/batch at ogbn-products scale; see docs/PERF_NOTES.md).

Falls back to the numpy path (``sampling.neighbor`` + ``transform.to_block``)
whenever the native library is unavailable or the config is not covered
(weighted sampling, replacement, full neighborhood).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from dgl1_tpu import _native
from dgl1_tpu import random as dgl_random
from dgl1_tpu.graph import (
    Graph,
    ID_DTYPE,
    _build_ell_uniform,
    _build_tiles,
    _pad_tiles,
    static_tile_bound,
)

__all__ = ["sample_block_fused", "supports_fused"]


def supports_fused(g, fanout: int, prob, replace: bool) -> bool:
    if _native.lib() is None:
        return False
    if prob is not None or replace or fanout <= 0 or fanout > 4096:
        return False
    if getattr(g, "is_block", False):
        return False
    return True


def sample_block_fused(
    g: Graph,
    seeds: np.ndarray,
    num_real_dst: int,
    fanout: int,
    pad_src_to: int,
    pad_edges_to: int,
    rng: Optional[np.random.Generator] = None,
) -> Graph:
    """Sample ``fanout`` in-edges per real seed and return the padded
    bipartite block (same contract as ``transform.to_block`` on a
    ``sample_neighbors`` frontier, with ``include_dst_in_src=True``).

    ``seeds`` may carry a phantom tail (static-shape pipeline): only the
    first ``num_real_dst`` entries are sampled. Blocks carry
    ``meta['num_real_src'/'num_real_dst']`` and parent ids in
    ``srcdata['_ID']`` / ``dstdata['_ID']``; parent edge ids (real prefix
    only) in ``edata['_ID']``.
    """
    native = _native.lib()
    rng = rng or dgl_random.default_rng()
    seeds = np.ascontiguousarray(seeds, dtype=np.int64)
    P = len(seeds)

    indptr = np.ascontiguousarray(np.asarray(g.csc_indptr), ID_DTYPE)
    nbr = np.ascontiguousarray(np.asarray(g.csc_src), ID_DTYPE)
    eid = np.ascontiguousarray(np.asarray(g.csc_eid), ID_DTYPE)

    cap_e = int(pad_edges_to)
    cap_s = int(pad_src_to)
    out_deg = np.zeros((P,), ID_DTYPE)
    lsrc = np.full((cap_e,), cap_s, dtype=ID_DTYPE)  # sentinel = num_src
    peid = np.zeros((cap_e,), ID_DTYPE)
    src_ids = np.zeros((cap_s,), np.int64)
    counts = np.zeros((2,), np.int64)
    seed64 = np.uint64(rng.integers(0, np.iinfo(np.uint64).max,
                                    dtype=np.uint64))
    rc = native.sample_block(
        indptr, nbr, eid, 1, seeds, P, int(num_real_dst), int(fanout),
        seed64, cap_e, cap_s, out_deg, lsrc, peid, src_ids, counts,
    )
    if rc != 0:
        raise ValueError(
            f"sample_block capacity overflow (pad_src_to={pad_src_to}, "
            f"pad_edges_to={pad_edges_to}, fanout={fanout})"
        )
    n_edges = int(counts[0])
    n_src = int(counts[1])

    # User edge order := dst-major sampled order, so COO == CSC and
    # csc_eid is the identity on the real prefix.
    csc_indptr = np.zeros((P + 1,), ID_DTYPE)
    np.cumsum(out_deg, out=csc_indptr[1:])
    csc_eid = np.arange(cap_e, dtype=ID_DTYPE)
    csc_eid[n_edges:] = 0
    csc_dst = np.full((cap_e,), P, dtype=ID_DTYPE)
    reps = np.repeat(np.arange(P, dtype=ID_DTYPE), out_deg)
    csc_dst[:n_edges] = reps
    mask = np.zeros((cap_e,), bool)
    mask[:n_edges] = True

    # CSR (reduce-by-src, used by the backward duality) via counting sort.
    csr_indptr = np.zeros((cap_s + 1,), ID_DTYPE)
    csr_dst = np.full((cap_e,), P, dtype=ID_DTYPE)
    csr_eid = np.zeros((cap_e,), ID_DTYPE)
    csr_src = np.full((cap_e,), cap_s, dtype=ID_DTYPE)
    native.build_adj(lsrc[:n_edges], csc_dst[:n_edges], n_edges, cap_s,
                     csr_indptr, csr_dst, csr_eid, csr_src)

    # Static-shape layouts: a uniform single-rung dst-ELL (bucket metadata
    # is a pure function of (P, fanout)) and statically padded reverse
    # tiles for the backward — NOT the data-dependent degree-bucketed ELL,
    # whose bucket structure is part of the jit static key and recompiled
    # the train step every batch.
    ell_dst_meta, ell_dst = _build_ell_uniform(csc_indptr, lsrc, csc_eid, P,
                                               fanout)
    tdst = _pad_tiles(
        _build_tiles(csc_dst, lsrc, csc_eid, n_edges, P),
        static_tile_bound(cap_e, P), P,
    )
    tsrc = _pad_tiles(
        _build_tiles(csr_src, csr_dst, csr_eid, n_edges, cap_s),
        static_tile_bound(cap_e, cap_s), cap_s,
    )

    b = Graph(
        src=lsrc,
        dst=csc_dst,
        edge_mask=mask,
        csr_indptr=csr_indptr,
        csr_dst=csr_dst,
        csr_eid=csr_eid,
        csr_src=csr_src,
        csc_indptr=csc_indptr,
        csc_src=lsrc,
        csc_eid=csc_eid,
        csc_dst=csc_dst,
        num_src_nodes=cap_s,
        num_dst_nodes=P,
        num_edges=cap_e,
        is_block=True,
        tdst=tdst,
        tsrc=tsrc,
        ell_dst=ell_dst,
        ell_dst_meta=ell_dst_meta,
    )
    b.meta["num_real_edges"] = n_edges
    src_id_arr = np.zeros((cap_s,), dtype=ID_DTYPE)
    src_id_arr[:n_src] = src_ids[:n_src]
    # Keep the id maps host-side numpy: a jnp.asarray here is an eager
    # host->device transfer per block (~3.5MB/batch -> ~0.4s on the dev
    # tunnel); the training loop device_puts blocks it actually ships.
    b.srcdata["_ID"] = src_id_arr
    b.dstdata["_ID"] = seeds.astype(ID_DTYPE)
    peid[n_edges:] = 0  # static leaf shape: id map padded to the bound
    b.edata["_ID"] = peid
    b.meta["num_real_src"] = n_src
    b.meta["num_real_dst"] = int(num_real_dst)
    return b
