"""Sparse embedding + sparse optimizers.

Parity: ``dgl.nn.NodeEmbedding`` + ``dgl.optim.SparseAdam/SparseAdagrad``
(``python/dgl/distributed/optim/sparse_optim.py`` in DistDGL). TPU-native:
the embedding table is a plain jax array (shard it over a mesh axis for
DistEmbedding semantics); a minibatch step gathers rows, computes grads on
the gathered slice, and applies a row-sparse update — the only scatter is
over the minibatch's unique rows (small), keeping the table itself pure.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["NodeEmbedding", "SparseAdamState", "sparse_adam_init",
           "sparse_adam_update", "sparse_adagrad_init",
           "sparse_adagrad_update"]


class NodeEmbedding(NamedTuple):
    """Learnable per-node embedding table (functional)."""

    table: jnp.ndarray  # (num_nodes, dim)

    @staticmethod
    def create(key, num_nodes: int, dim: int, scale: float = None
               ) -> "NodeEmbedding":
        if scale is None:
            scale = 1.0 / jnp.sqrt(dim)
        return NodeEmbedding(
            jax.random.uniform(key, (num_nodes, dim), jnp.float32,
                               -scale, scale)
        )

    def __call__(self, ids):
        return jnp.take(self.table, ids, axis=0, mode="clip")


class SparseAdamState(NamedTuple):
    m: jnp.ndarray       # (num_nodes, dim) first moment
    v: jnp.ndarray       # (num_nodes, dim) second moment
    step: jnp.ndarray    # (num_nodes,) per-row step count


def sparse_adam_init(table: jnp.ndarray) -> SparseAdamState:
    return SparseAdamState(
        m=jnp.zeros_like(table),
        v=jnp.zeros_like(table),
        step=jnp.zeros((table.shape[0],), jnp.int32),
    )


def sparse_adam_update(
    table: jnp.ndarray,
    state: SparseAdamState,
    ids: jnp.ndarray,
    row_grads: jnp.ndarray,
    lr: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, SparseAdamState]:
    """Row-sparse Adam: ``ids`` (B,) unique rows, ``row_grads`` (B, dim).

    Matches the reference's SparseAdam: per-row step counts drive the bias
    correction (rows update at different rates).
    """
    step = state.step.at[ids].add(1, mode="drop")
    t = jnp.take(step, ids, axis=0, mode="clip").astype(jnp.float32)[:, None]
    m_rows = (beta1 * jnp.take(state.m, ids, axis=0, mode="clip")
              + (1 - beta1) * row_grads)
    v_rows = (beta2 * jnp.take(state.v, ids, axis=0, mode="clip")
              + (1 - beta2) * row_grads ** 2)
    m_hat = m_rows / (1 - beta1 ** t)
    v_hat = v_rows / (1 - beta2 ** t)
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)
    return (
        table.at[ids].add(-delta, mode="drop"),
        SparseAdamState(
            m=state.m.at[ids].set(m_rows, mode="drop"),
            v=state.v.at[ids].set(v_rows, mode="drop"),
            step=step,
        ),
    )


def sparse_adagrad_init(table: jnp.ndarray) -> jnp.ndarray:
    return jnp.zeros_like(table)


def sparse_adagrad_update(table, accum, ids, row_grads, lr: float = 1e-2,
                          eps: float = 1e-10):
    acc_rows = jnp.take(accum, ids, axis=0, mode="clip") + row_grads ** 2
    delta = lr * row_grads / (jnp.sqrt(acc_rows) + eps)
    return (
        table.at[ids].add(-delta, mode="drop"),
        accum.at[ids].set(acc_rows, mode="drop"),
    )
