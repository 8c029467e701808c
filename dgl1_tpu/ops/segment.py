"""Segment ops: segment_reduce / segment_softmax / segment_mm / gather_mm.

Parity: ``python/dgl/ops/segment.py`` and the kernels in
``src/array/cpu/segment_reduce.h`` / ``src/array/cuda/segment_reduce.cu``.
TPU-native: ``segment_mm`` (the R-GCN / hetero grouped-GEMM primitive,
MoE-style) lowers to ``jax.lax.ragged_dot`` which XLA maps onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "segment_reduce",
    "segment_softmax",
    "segment_mm",
    "gather_mm",
    "segment_ids_from_lengths",
]


def segment_ids_from_lengths(seglen, total: int):
    """Expand segment lengths to per-element segment ids.

    ``seglen``: (S,) int array, sum == total (static). Returns (total,) ids.
    """
    offsets = jnp.cumsum(seglen)
    # id[i] = number of offsets <= i
    pos = jnp.arange(total)
    return jnp.searchsorted(offsets, pos, side="right").astype(jnp.int32)


def segment_reduce(seglen, value, reducer: str = "sum"):
    """Reduce ``value`` (total, ...) within contiguous segments of lengths
    ``seglen`` (S,). Parity: ``dgl.ops.segment_reduce``."""
    total = value.shape[0]
    num_segments = seglen.shape[0]
    ids = segment_ids_from_lengths(seglen, total)
    if reducer in ("sum", "mean"):
        out = jax.ops.segment_sum(
            value, ids, num_segments=num_segments, indices_are_sorted=True
        )
        if reducer == "mean":
            denom = jnp.maximum(seglen, 1).astype(out.dtype)
            out = out / denom.reshape((num_segments,) + (1,) * (out.ndim - 1))
        return out
    if reducer == "max":
        out = jax.ops.segment_max(
            value, ids, num_segments=num_segments, indices_are_sorted=True
        )
    elif reducer == "min":
        out = jax.ops.segment_min(
            value, ids, num_segments=num_segments, indices_are_sorted=True
        )
    elif reducer == "prod":
        return jax.ops.segment_prod(
            value, ids, num_segments=num_segments, indices_are_sorted=True
        )
    else:
        raise ValueError(f"unknown reducer {reducer!r}")
    empty = (seglen == 0).reshape((num_segments,) + (1,) * (out.ndim - 1))
    return jnp.where(empty, jnp.zeros_like(out), out)


def segment_softmax(seglen, value):
    """Numerically-stable softmax within contiguous segments."""
    total = value.shape[0]
    num_segments = seglen.shape[0]
    ids = segment_ids_from_lengths(seglen, total)
    mx = jax.ops.segment_max(
        value, ids, num_segments=num_segments, indices_are_sorted=True
    )
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.exp(value - jnp.take(mx, ids, axis=0, mode="clip"))
    s = jax.ops.segment_sum(
        ex, ids, num_segments=num_segments, indices_are_sorted=True
    )
    return ex / jnp.take(jnp.maximum(s, 1e-38), ids, axis=0, mode="clip")


def segment_mm(a, b, seglen_a):
    """Grouped GEMM: rows of ``a`` (N, K) are split into R contiguous groups
    of lengths ``seglen_a`` (R,); group r is multiplied by ``b[r]`` (K, M).

    Parity: ``dgl.ops.segment_mm`` (the R-GCN per-relation matmul).
    TPU-native: lowers to ``jax.lax.ragged_dot`` (MXU grouped matmul).
    """
    return jax.lax.ragged_dot(a, b, group_sizes=seglen_a.astype(jnp.int32))


def gather_mm(a, b, idx_b):
    """Per-row matmul with a per-row weight index: out[i] = a[i] @ b[idx_b[i]].

    Parity: ``dgl.ops.gather_mm``. For relation-sorted rows prefer
    :func:`segment_mm` (ragged MXU path); this general form materializes a
    one-hot mixture and is intended for small numbers of weight matrices.
    """
    num_rel = b.shape[0]
    onehot = jax.nn.one_hot(idx_b, num_rel, dtype=a.dtype)  # (N, R)
    # (N,R),(N,K),(R,K,M) -> (N,M); XLA fuses this into R batched matmuls.
    return jnp.einsum("nr,nk,rkm->nm", onehot, a, b)
