"""Clustered block-dense adjacency format ("bdense").

The per-edge gather wall (~210M rows/s on TPU v5e, docs/PERF_NOTES.md
benchmark matrix) binds every per-edge-gather SpMM formulation on
hub-free graphs. This format exploits LOCALITY instead of degree skew
(the hub format's lever): after a locality reorder (``dgl.reorder_graph``
— RCM/partition order; band/geometric graphs are already local), the
adjacency concentrates in a small set of BLK x BLK blocks. Each dense
block is stored as a count matrix and the SpMM becomes
``out[rb] += A_block @ u[cb]`` on the MXU — HBM traffic per edge drops
from F*4 bytes (one source-row read per edge) to
``(BLK*BLK*1 + BLK*F*4)/count`` bytes, a win whenever a block holds more
than ~BLK edges. Leftover edges fall to the ELL tail, so coverage is
always exact.

The SAME blocks serve the backward: grad_u over a block is
``A_block^T @ ct[rb]`` — the src-direction reduce (uniform out-degrees,
no hubs to exploit) stops paying the gather wall too.

No counterpart exists in the reference (its CUDA SpMM is edge-parallel
with atomics); this is a TPU-native design for the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

BLK = 128  # MXU-native block edge length


class BDenseMeta(NamedTuple):
    """Static descriptor (pytree aux)."""

    n_blocks: int          # dense blocks kept
    n_rb: int              # ceil(num_dst / BLK)
    n_cb: int              # ceil(num_src / BLK)
    tail_meta_dst: Tuple   # ELL meta for leftover edges, reduce-by-dst
    tail_meta_src: Tuple   # ELL meta for leftover edges, reduce-by-src
    covered: int           # edges on the dense tier
    max_row_blocks: int = 1  # max dense blocks in one rb row
    max_col_blocks: int = 1  # max dense blocks in one cb column


def plan_blocks(src: np.ndarray, dst: np.ndarray, num_src: int,
                num_dst: int, min_edges: Optional[int] = None):
    """Dense-tier planner (shared by the single-device format below and
    the sharded per-partition path in ``parallel/halo.py``).

    Returns ``(K, arrays, tail_eids)`` where ``arrays`` holds:

      a        (max(K,1)*BLK, BLK) bf16/f32 count blocks, rb-sorted
      ab       same blocks re-sorted in cb (backward-iteration) order
      rb, cb   (K,) int32 dst/src block ids (rb-sorted)
      first_f  (K,) 1 if first block of its rb run
      rbb, cbb (K,) rb/cb in backward order
      first_b  (K,) 1 if first block of its cb run
      rb_mask  (n_rb,) bool: dst block rows touched by the dense tier
      cb_mask  (n_cb,) bool: src block rows touched (backward zero-fill)

    and ``tail_eids`` indexes the edges NOT covered by the dense tier.
    """
    if min_edges is None:
        min_edges = BLK // 4  # blocks >= ~32 edges beat the per-edge
        # gather (one 128x128 bf16 block read ~32KB vs 32 gathered rows
        # at the ~90M rows/s gather-unit wall)
    n_rb = max((num_dst + BLK - 1) // BLK, 1)
    n_cb = max((num_src + BLK - 1) // BLK, 1)
    rb_e = dst.astype(np.int64) // BLK
    cb_e = src.astype(np.int64) // BLK
    key = rb_e * n_cb + cb_e
    uniq, inv, counts = np.unique(key, return_inverse=True,
                                  return_counts=True)
    keep = counts >= min_edges
    dense_block_of_edge = keep[inv]
    kept_keys = uniq[keep]
    K = len(kept_keys)

    # Dense tier: per-block count matrices.
    a = np.zeros((max(K, 1) * BLK, BLK), np.float32)
    if K:
        block_pos = np.full(len(uniq), -1, np.int64)
        block_pos[np.nonzero(keep)[0]] = np.arange(K)
        de = np.nonzero(dense_block_of_edge)[0]
        k_of_e = block_pos[inv[de]]
        lr = (dst[de].astype(np.int64) % BLK)
        lc = (src[de].astype(np.int64) % BLK)
        np.add.at(a, (k_of_e * BLK + lr, lc), 1.0)
    # Counts are tiny integers (edge multiplicities): store bf16 to halve
    # the dominant HBM stream of the block matmuls (exact for integers
    # <= 256; the kernel casts per-block in VMEM and accumulates f32 —
    # same policy as hub_format.py's dense count matrix).
    if a.max(initial=0.0) <= 256:
        import ml_dtypes

        a = a.astype(ml_dtypes.bfloat16)
    rb = (kept_keys // n_cb).astype(np.int32)
    cb = (kept_keys % n_cb).astype(np.int32)
    # kept_keys is sorted by key = rb-major: rb runs are contiguous.
    first_f = np.ones((max(K, 1),), np.int32)
    if K:
        first_f[1:] = (rb[1:] != rb[:-1]).astype(np.int32)
    perm_b = (np.argsort(cb, kind="stable").astype(np.int32)
              if K else np.zeros((1,), np.int32))
    rbb = rb[perm_b] if K else np.zeros((1,), np.int32)
    cbb = cb[perm_b] if K else np.zeros((1,), np.int32)
    first_b = np.ones((max(K, 1),), np.int32)
    if K:
        first_b[1:] = (cbb[1:] != cbb[:-1]).astype(np.int32)
    rb_mask = np.zeros((n_rb,), bool)
    cb_mask = np.zeros((n_cb,), bool)
    if K:
        rb_mask[rb] = True
        cb_mask[cb] = True
    if K == 0:
        rb = np.zeros((1,), np.int32)
        cb = np.zeros((1,), np.int32)
    # Backward copy in cb-sorted order: block k of `ab` is block
    # perm_b[k] of `a`. Doubles A storage (bf16, cheap) so BOTH kernel
    # directions stream their A operand sequentially — no dynamic
    # A-block indexing in the grid.
    ab = (a.reshape(max(K, 1), BLK, BLK)[perm_b].reshape(-1, BLK)
          if K else a)
    # Row/column grouping pointers (the attention path iterates whole rb
    # rows / cb columns; blocks are contiguous per row in `a` and per
    # column in `ab`). Tiny: (n_rb+1,) + (n_cb+1,) int32.
    row_ptr = np.searchsorted(rb[: max(K, 1) if K else 0],
                              np.arange(n_rb + 1)).astype(np.int32)
    col_ptr = np.searchsorted(cbb[: max(K, 1) if K else 0],
                              np.arange(n_cb + 1)).astype(np.int32)
    arrays = {
        "a": a, "ab": ab,
        "rb": rb, "cb": cb, "first_f": first_f,
        "rbb": rbb, "cbb": cbb, "first_b": first_b,
        "rb_mask": rb_mask, "cb_mask": cb_mask,
        "row_ptr": row_ptr, "col_ptr": col_ptr,
    }
    return K, arrays, np.nonzero(~dense_block_of_edge)[0]


def build_block_dense(src: np.ndarray, dst: np.ndarray, num_src: int,
                      num_dst: int, build_ell,
                      min_edges: Optional[int] = None):
    """Plan the full block-dense layout (dense tier + ELL tails) from
    the (real) edge list. See :func:`plan_blocks` for the dense-tier
    array layout; this adds the t_*/r_* ELL tail arrays (dst/src
    directions) for exact coverage.
    """
    e = len(src)
    n_rb = max((num_dst + BLK - 1) // BLK, 1)
    n_cb = max((num_src + BLK - 1) // BLK, 1)
    K, arrays, te = plan_blocks(src, dst, num_src, num_dst, min_edges)

    # Tail: leftover edges, both ELL directions (exact coverage).
    t_src, t_dst = src[te], dst[te]
    n_tail = len(te)

    def ell_dir(tgt, other, n_tgt):
        order = np.argsort(tgt, kind="stable")
        indptr = np.zeros((n_tgt + 1,), np.int64)
        np.cumsum(np.bincount(tgt, minlength=n_tgt), out=indptr[1:])
        eid = np.arange(n_tail, dtype=np.int64)[order]
        return build_ell(indptr, other[order].astype(np.int32),
                         eid.astype(np.int32), n_tgt, n_tail)

    tail_meta_dst, tail_dst = ell_dir(t_dst, t_src, num_dst)
    tail_meta_src, tail_src = ell_dir(t_src, t_dst, num_src)

    meta = BDenseMeta(
        n_blocks=K, n_rb=n_rb, n_cb=n_cb,
        tail_meta_dst=tail_meta_dst, tail_meta_src=tail_meta_src,
        covered=int(e - n_tail),
        max_row_blocks=int(np.diff(arrays["row_ptr"]).max(initial=0)) or 1,
        max_col_blocks=int(np.diff(arrays["col_ptr"]).max(initial=0)) or 1,
    )
    arrays.update({
        "t_idx": tail_dst["idx"], "t_eid": tail_dst["eid"],
        "t_inv": tail_dst["inv_perm"],
        "r_idx": tail_src["idx"], "r_eid": tail_src["eid"],
        "r_inv": tail_src["inv_perm"],
        # Tail endpoints in tail-list order (the attention path computes
        # per-tail-edge logits; the SpMM engine never touches these).
        "t_src": t_src.astype(np.int32), "t_dst": t_dst.astype(np.int32),
    })
    return meta, arrays
