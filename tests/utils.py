"""Dense jnp reference implementations of g-SpMM / g-SDDMM for the
dual-path oracle tests (the pattern of the reference's
``tests/compute/test_kernel.py``): differentiable, independent of the
engine under test."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dense_binary(op, lhs, rhs):
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
    raise ValueError(op)


def dense_gspmm(src, dst, num_dst, op, reduce_op, u, e):
    """Messages via direct indexing; reduce via masked dense ops over the
    edge axis. src/dst: (E,) numpy int arrays (real edges only)."""
    if op == "copy_lhs":
        msg = u[src]
    elif op == "copy_rhs":
        msg = e
    else:
        msg = dense_binary(op, u[src], e)
    E = len(src)
    onehot = (np.asarray(dst)[:, None] == np.arange(num_dst)[None, :])
    onehot = jnp.asarray(onehot)  # (E, N_dst)
    big = msg.reshape(E, -1)
    mask = onehot[:, :, None]  # (E, N, 1)
    expanded = big[:, None, :]  # (E, 1, F)
    if reduce_op in ("sum", "mean"):
        out = jnp.sum(jnp.where(mask, expanded, 0.0), axis=0)
        if reduce_op == "mean":
            deg = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
            out = out / deg[:, None]
    elif reduce_op == "max":
        out = jnp.max(jnp.where(mask, expanded, -jnp.inf), axis=0)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif reduce_op == "min":
        out = jnp.min(jnp.where(mask, expanded, jnp.inf), axis=0)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    elif reduce_op == "prod":
        out = jnp.prod(jnp.where(mask, expanded, 1.0), axis=0)
    else:
        raise ValueError(reduce_op)
    return out.reshape((num_dst,) + msg.shape[1:])


def dense_gsddmm(src, dst, op, lhs, rhs, lhs_target="u", rhs_target="v"):
    def fetch(data, target):
        if target == "u":
            return data[src]
        if target == "v":
            return data[dst]
        return data

    if op == "copy_lhs":
        return fetch(lhs, lhs_target)
    if op == "copy_rhs":
        return fetch(rhs, rhs_target)
    return dense_binary(op, fetch(lhs, lhs_target), fetch(rhs, rhs_target))
