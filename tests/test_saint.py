"""GraphSAINT sampler tests: subgraph validity, static padding, norms,
and an end-to-end training sanity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.dataloading import SAINTSampler


def make_graph(n=200, e=1200, seed=0):
    g = dgl.rand_graph(n, e, seed=seed)
    g.ndata["feat"] = jnp.asarray(np.random.default_rng(seed).normal(
        size=(n, 8)).astype(np.float32))
    g.ndata["label"] = jnp.asarray(
        np.random.default_rng(seed + 1).integers(0, 3, n))
    return g


@pytest.mark.parametrize("mode,budget", [
    ("node", 64), ("edge", 200), ("walk", (16, 4)),
])
def test_saint_subgraph_validity(mode, budget):
    g = make_graph()
    sampler = SAINTSampler(g, mode, budget, num_batches=3, num_pre=3,
                           seed=0)
    e = g.num_edges()
    src_p = np.asarray(g.src)[:e]
    dst_p = np.asarray(g.dst)[:e]
    parent_edges = set(zip(src_p.tolist(), dst_p.tolist()))
    count = 0
    for sg, mask in sampler:
        count += 1
        n_real = int(np.asarray(mask).sum())
        assert n_real > 0
        assert sg.num_nodes() % 256 == 0  # padded
        nid = np.asarray(sg.ndata["_ID"])[:n_real]
        se = sg.num_edges()
        ss, sd = np.asarray(sg.src)[:se], np.asarray(sg.dst)[:se]
        # Every subgraph edge maps to a parent edge.
        for u, v in zip(nid[ss].tolist(), nid[sd].tolist()):
            assert (u, v) in parent_edges
        # Norms present, zero on padding.
        ln = np.asarray(sg.ndata["loss_norm"])
        assert np.all(ln[n_real:] == 0) and np.all(ln[:n_real] > 0)
        an = np.asarray(sg.edata["aggr_norm"])
        assert np.all(an[:se] > 0)
        # ndata sliced through.
        np.testing.assert_allclose(
            np.asarray(sg.ndata["feat"])[:n_real],
            np.asarray(g.ndata["feat"])[nid])
    assert count == 3


def test_saint_static_shapes_reused():
    g = make_graph()
    sampler = SAINTSampler(g, "node", 64, num_batches=5, num_pre=2, seed=1)
    shapes = {(sg.num_nodes(), sg.src.shape[0]) for sg, _ in sampler}
    # Bucketed padding: a handful of distinct compiled shapes at most.
    assert len(shapes) <= 2


def test_saint_trains():
    from dgl1_tpu import nn as gnn
    import optax

    g = make_graph()
    sampler = SAINTSampler(g, "node", 96, num_batches=4, num_pre=2, seed=2)
    conv = gnn.GraphConv(3)
    params = conv.init(jax.random.PRNGKey(0), g, g.ndata["feat"])
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(params, state, sg, mask):
        def loss_fn(p):
            logits = conv.apply(p, sg, sg.ndata["feat"])
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(
                logp, sg.ndata["label"][:, None].astype(jnp.int32),
                axis=1)[:, 0]
            w = sg.ndata["loss_norm"] * mask
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for sg, mask in sampler:
        params, state, loss = step(params, state, sg, mask)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
