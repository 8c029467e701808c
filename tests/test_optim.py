"""Sparse embedding/optimizer tests (parity role: DistEmbedding tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from dgl1_tpu.optim import (
    NodeEmbedding,
    sparse_adam_init,
    sparse_adam_update,
    sparse_adagrad_init,
    sparse_adagrad_update,
)


def test_sparse_adam_only_touches_rows():
    emb = NodeEmbedding.create(jax.random.PRNGKey(0), 20, 4)
    state = sparse_adam_init(emb.table)
    ids = jnp.asarray([2, 5, 7])
    grads = jnp.ones((3, 4))
    new_table, new_state = sparse_adam_update(emb.table, state, ids, grads)
    changed = np.any(np.asarray(new_table != emb.table), axis=1)
    assert set(np.nonzero(changed)[0]) == {2, 5, 7}
    np.testing.assert_array_equal(np.asarray(new_state.step)[[2, 5, 7]], 1)
    assert np.asarray(new_state.step)[[0, 1, 3]].sum() == 0


def test_sparse_adam_learns_embedding():
    """Minimize ||emb[i] - target_i||^2 over sampled batches."""
    key = jax.random.PRNGKey(1)
    emb = NodeEmbedding.create(key, 50, 8)
    target = jax.random.normal(jax.random.PRNGKey(2), (50, 8))
    table = emb.table
    state = sparse_adam_init(table)
    rng = np.random.default_rng(0)

    @jax.jit
    def step(table, state, ids):
        def loss(rows):
            return jnp.sum((rows - jnp.take(target, ids, axis=0)) ** 2)

        rows = jnp.take(table, ids, axis=0)
        g = jax.grad(loss)(rows)
        return sparse_adam_update(table, state, ids, g, lr=5e-2)

    for _ in range(300):
        ids = jnp.asarray(rng.choice(50, size=16, replace=False))
        table, state = step(table, state, ids)
    err = float(jnp.mean((table - target) ** 2))
    assert err < 0.05, err


def test_sparse_adagrad():
    table = jnp.ones((10, 3))
    acc = sparse_adagrad_init(table)
    ids = jnp.asarray([0, 4])
    g = jnp.ones((2, 3))
    t2, a2 = sparse_adagrad_update(table, acc, ids, g, lr=0.1)
    assert float(t2[0, 0]) < 1.0
    assert float(t2[1, 0]) == 1.0
    np.testing.assert_allclose(np.asarray(a2)[[0, 4]], 1.0)
