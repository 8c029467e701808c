"""Partitioned full-graph GCN training step (the multi-chip reference path).

Structure (SURVEY.md §2.3): node features sharded by partition over the
mesh axis; per layer, one halo ``all_to_all`` + local segment aggregation
inside ``shard_map``; dense projections run outside shard_map on the
sharded activations (GSPMD partitions them batch-parallel); parameters are
replicated and their gradients are globally reduced by the shard_map /
GSPMD transposes automatically — no hand-written allreduce, which is the
whole point vs the reference's torch-DDP + RPC split.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl1_tpu.parallel.halo import PartitionedGraph
from dgl1_tpu.parallel.sharded_ops import make_sharded_gcn_matvec

__all__ = ["make_gcn_train_step", "init_gcn_params"]


def init_gcn_params(key, in_feats: int, hidden: int, num_classes: int,
                    dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "w1": glorot(k1, (in_feats, hidden), dtype),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": glorot(k2, (hidden, num_classes), dtype),
        "b2": jnp.zeros((num_classes,), dtype),
    }


def make_gcn_train_step(
    pg: PartitionedGraph,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    num_classes: int,
    combined: bool = False,
    prefilled: bool = False,
):
    """Returns a jitted ``step(params, opt_state, x, labels, mask) ->
    (params, opt_state, loss)`` with x/labels/mask sharded over axis 'p'.

    ``combined=True``: activations ride the copy-free
    ``[owned | halo | pad]`` layout (x is (P, R, F) from
    ``pg.shard_node_data_combined``; labels/mask stay (P, n_loc));
    requires ``hub=...`` at build — the flagship multi-chip
    configuration (docs/PERF_NOTES.md round 4).

    ``prefilled=True`` (combined only): ``x`` was pushed through
    ``sharded_ops.fill_halo_combined`` ONCE — the input features are
    static across steps, so the first layer reads the standing halo
    slots instead of refreshing them. This removes the layer-1
    dynamic_update_slice COPY that an undonated jit input forces (the
    diagnosed sharded fwd+bwd overhead, PERF_NOTES r4).

    CONSTRAINT: ``prefilled=True`` trusts that x's halo slots hold the
    owners' CURRENT rows. Feeding per-step-varying features (e.g.
    sampled mini-batch features) through a prefilled step silently
    aggregates stale halo rows — re-run ``fill_halo_combined`` whenever
    x changes, or build with ``prefilled=False``. Set
    ``DGL1_TPU_CHECK_PREFILL=1`` to verify the standing halo against a
    fresh fill on every call (debug; adds a halo exchange per step).

    The partitioned-graph pytree is threaded through jit as a real
    ARGUMENT (partial-of-jit): closing over it would bake the layout
    arrays into the HLO as constants — compile bloat and a remote-
    compile 413 once hub layouts are attached.
    """
    from dgl1_tpu.parallel.sharded_ops import (
        make_sharded_gcn_matvec_combined)

    if prefilled and not combined:
        raise ValueError("prefilled=True requires combined=True")
    maker = (make_sharded_gcn_matvec_combined if combined
             else make_sharded_gcn_matvec)
    matvec_fn = maker(pg, mesh).func  # shard_map fn: (pg, x) -> y
    matvec_first = (make_sharded_gcn_matvec_combined(
        pg, mesh, halo_filled=True).func if prefilled else matvec_fn)

    def loss_fn(pg_a, params, x, labels, mask):
        h = matvec_first(pg_a, x)
        h = jax.nn.relu(
            jnp.einsum("pnf,fh->pnh", h, params["w1"]) + params["b1"]
        )
        h = matvec_fn(pg_a, h)
        logits = jnp.einsum("pnh,hc->pnc", h, params["w2"]) + params["b2"]
        if combined:
            logits = logits[:, : pg.n_loc]
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
        ce = -jnp.sum(logp * onehot, axis=-1)
        m = mask.astype(logits.dtype)
        return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

    def step(pg_a, params, opt_state, x, labels, mask):
        loss, grads = jax.value_and_grad(loss_fn, argnums=1)(
            pg_a, params, x, labels, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    shard = NamedSharding(mesh, P("p"))
    repl = NamedSharding(mesh, P())
    spec_pg = jax.tree.map(lambda _: shard, pg)
    jitted = jax.jit(
        step,
        in_shardings=(spec_pg, repl, repl, shard, shard, shard),
        out_shardings=(repl, repl, repl),
    )
    step_fn = functools.partial(jitted, pg)
    if prefilled and os.environ.get("DGL1_TPU_CHECK_PREFILL"):
        from dgl1_tpu.parallel.sharded_ops import fill_halo_combined

        fill = fill_halo_combined(pg, mesh)

        def checked_step(params, opt_state, x, labels, mask):
            fresh = fill(x)
            if not bool(jnp.allclose(fresh[:, pg.n_loc:], x[:, pg.n_loc:],
                                     atol=1e-6)):
                raise AssertionError(
                    "prefilled=True but x's halo slots are STALE "
                    "(differ from a fresh fill_halo_combined) — "
                    "re-fill after every feature change, or build "
                    "with prefilled=False.")
            return jitted(pg, params, opt_state, x, labels, mask)

        step_fn = checked_step
    return (step_fn, functools.partial(loss_fn, pg))


def make_gcn_predict(pg: PartitionedGraph, mesh: Mesh):
    """Jitted sharded forward: ``predict(params, x) -> (P, n_loc) argmax
    class ids`` (the eval counterpart of :func:`make_gcn_train_step`)."""
    matvec = make_sharded_gcn_matvec(pg, mesh)

    def predict(params, x):
        h = matvec(x)
        h = jax.nn.relu(
            jnp.einsum("pnf,fh->pnh", h, params["w1"]) + params["b1"]
        )
        h = matvec(h)
        logits = jnp.einsum("pnh,hc->pnc", h, params["w2"]) + params["b2"]
        return jnp.argmax(logits, axis=-1)

    shard = NamedSharding(mesh, P("p"))
    repl = NamedSharding(mesh, P())
    return jax.jit(predict, in_shardings=(repl, shard),
                   out_shardings=shard)
