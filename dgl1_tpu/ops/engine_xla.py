"""XLA segment-op engine for g-SpMM and g-SDDMM.

Parity: this engine implements the exact semantics of the reference's fused
sparse kernels — ``src/array/cpu/spmm.h :: SpMMSumCsr`` /
``src/array/cuda/spmm.cu`` (g-SpMM) and ``src/array/cpu/sddmm.h`` /
``src/array/cuda/sddmm.cu`` (g-SDDMM), dispatched from
``src/array/kernel.cc :: SpMM/SDDMM`` — but as pure jnp gather + segment
reductions that XLA compiles. It is simultaneously:

* the v0 compute path (correct on CPU and TPU),
* the permanent oracle that the Pallas kernels are tested against,
* the fallback for operand shapes the Pallas kernels don't cover.

TPU-native design notes:

* Reductions are *segment-structured*, never atomic-scatter: edges are
  stored sorted by destination (CSC order), so ``segment_sum`` sees sorted
  ids (``indices_are_sorted=True``) — the key divergence from the
  reference's CUDA atomics (``src/array/cuda/atomic.cuh``), which have no
  TPU equivalent.
* Padded edges carry sentinel segment ids equal to ``num_segments``; XLA
  scatter drops out-of-range updates, so padding needs no masking on the
  sum path.
* Gradients flow through JAX AD: the transpose of gather is scatter-add and
  the transpose of ``segment_sum`` is gather — exactly the SpMM <-> SDDMM
  duality the reference hand-writes in
  ``python/dgl/backend/pytorch/sparse.py :: GSpMM.backward``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph

__all__ = ["gspmm_xla", "gsddmm_xla", "SPMM_OPS", "SPMM_REDUCES", "SDDMM_OPS"]

SPMM_OPS = ("add", "sub", "mul", "div", "copy_lhs", "copy_rhs")
SPMM_REDUCES = ("sum", "max", "min", "mean", "prod")
SDDMM_OPS = ("add", "sub", "mul", "div", "dot", "copy_lhs", "copy_rhs")


def _binary(op: str, lhs, rhs):
    if op == "add":
        return lhs + rhs
    if op == "sub":
        return lhs - rhs
    if op == "mul":
        return lhs * rhs
    if op == "div":
        return lhs / rhs
    if op == "dot":
        return jnp.sum(lhs * rhs, axis=-1, keepdims=True)
    raise ValueError(f"unknown binary op {op!r}")


def _gather_rows(x, idx):
    # Sentinel (out-of-range) indices clip to the last row; the gathered
    # value is never consumed (dropped by the scatter or masked).
    return jnp.take(x, idx, axis=0, mode="clip")


def gspmm_xla(g: Graph, op: str, reduce_op: str, u: Optional[jnp.ndarray],
              e: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Generalized SpMM: per-edge ``op(u[src], e)`` then per-destination
    ``reduce`` over incoming edges.

    ``u``: (num_src_nodes, *feat) or None; ``e``: (num_edges_padded, *feat)
    in user edge order or None. Returns (num_dst_nodes, *feat_out).
    Feature shapes broadcast per numpy rules (parity: ``src/kernel/bcast``).
    """
    if op not in SPMM_OPS:
        raise ValueError(f"gspmm op {op!r} not in {SPMM_OPS}")
    if reduce_op not in SPMM_REDUCES:
        raise ValueError(f"gspmm reduce {reduce_op!r} not in {SPMM_REDUCES}")

    num_dst = g.num_dst_nodes()
    seg_ids = g.csc_dst

    # Build the per-edge message in CSC (dst-sorted) order.
    if op == "copy_lhs":
        if u is None:
            raise ValueError("copy_lhs requires u")
        msg = _gather_rows(u, g.csc_src)
    elif op == "copy_rhs":
        if e is None:
            raise ValueError("copy_rhs requires e")
        msg = _gather_rows(e, g.csc_eid)
    else:
        if u is None or e is None:
            raise ValueError(f"op {op!r} requires both u and e")
        msg = _binary(op, _gather_rows(u, g.csc_src), _gather_rows(e, g.csc_eid))

    if reduce_op in ("sum", "mean"):
        out = jax.ops.segment_sum(
            msg, seg_ids, num_segments=num_dst, indices_are_sorted=True
        )
        if reduce_op == "mean":
            deg = g.in_degrees().astype(out.dtype)
            deg = jnp.maximum(deg, 1.0)
            out = out / deg.reshape((num_dst,) + (1,) * (out.ndim - 1))
        return out

    if reduce_op == "prod":
        out = jax.ops.segment_prod(
            msg, seg_ids, num_segments=num_dst, indices_are_sorted=True
        )
        return out

    # max / min. Empty segments come back +/-inf from the segment op; the
    # reference zero-initializes its output buffer, so empty rows are 0.
    if reduce_op == "max":
        out = jax.ops.segment_max(
            msg, seg_ids, num_segments=num_dst, indices_are_sorted=True
        )
    else:
        out = jax.ops.segment_min(
            msg, seg_ids, num_segments=num_dst, indices_are_sorted=True
        )
    deg = g.in_degrees()
    empty = (deg == 0).reshape((num_dst,) + (1,) * (out.ndim - 1))
    return jnp.where(empty, jnp.zeros_like(out), out)


def gsddmm_xla(g: Graph, op: str, lhs: Optional[jnp.ndarray],
               rhs: Optional[jnp.ndarray], lhs_target: str = "u",
               rhs_target: str = "v") -> jnp.ndarray:
    """Generalized SDDMM: per-edge binary op between data on any two of
    {source node 'u', destination node 'v', edge 'e'}.

    Returns (num_edges_padded, *feat_out) in user edge order. Rows for
    padded edges are garbage and must be ignored via ``g.edge_mask``
    downstream (all builtin consumers do).
    """
    if op not in SDDMM_OPS:
        raise ValueError(f"gsddmm op {op!r} not in {SDDMM_OPS}")

    def fetch(data, target):
        if data is None:
            raise ValueError(f"gsddmm op {op!r} missing operand for {target!r}")
        if target == "u":
            return _gather_rows(data, g.src)
        if target == "v":
            return _gather_rows(data, g.dst)
        if target == "e":
            return data
        raise ValueError(f"unknown target {target!r}")

    if op == "copy_lhs":
        return fetch(lhs, lhs_target)
    if op == "copy_rhs":
        return fetch(rhs, rhs_target)
    return _binary(op, fetch(lhs, lhs_target), fetch(rhs, rhs_target))
