"""Message-passing core tests: builtin-vs-UDF consistency (parity role:
``tests/compute/test_update_all.py`` / ``test_specialization.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu import function as fn


def make():
    g = dgl.rand_graph(12, 40, seed=5)
    rng = np.random.default_rng(5)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(12, 4)).astype(np.float32))
    g.edata["w"] = jnp.asarray(rng.normal(size=(40, 4)).astype(np.float32))
    return g


def test_update_all_builtin_matches_udf_message():
    g = make()
    out_builtin = g.update_all(fn.u_mul_e("h", "w", "m"), fn.sum("m", "o1"))

    # Same computation with a Python message UDF (messages materialized).
    def mfunc(edges):
        return {"m": edges.src["h"] * edges.data["w"]}

    out_udf = g.update_all(mfunc, fn.sum("m", "o2"))
    np.testing.assert_allclose(out_builtin, out_udf, rtol=1e-5, atol=1e-6)


def test_update_all_udf_reduce():
    g = make()
    out_builtin = g.update_all(fn.copy_u("h", "m"), fn.max("m", "o1"))

    def rfunc(nodes):
        return {"o2": jnp.max(nodes.mailbox["m"], axis=1)}

    out_udf = g.update_all(fn.copy_u("h", "m"), rfunc)
    np.testing.assert_allclose(out_builtin, out_udf, rtol=1e-5, atol=1e-6)


def test_u_dot_v_message_with_sum():
    g = make()
    out = g.update_all(fn.u_dot_v("h", "h", "m"), fn.sum("m", "o"))
    src = np.asarray(g.src)[:40]
    dst = np.asarray(g.dst)[:40]
    h = np.asarray(g.ndata["h"])
    ref = np.zeros((12, 1), np.float32)
    for e in range(40):
        ref[dst[e], 0] += h[src[e]] @ h[dst[e]]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_apply_edges_builtin_and_udf():
    g = make()
    out_b = g.apply_edges(fn.u_add_v("h", "h", "s"))

    def efunc(edges):
        return {"s2": edges.src["h"] + edges.dst["h"]}

    out_u = g.apply_edges(efunc)
    np.testing.assert_allclose(out_b, out_u, rtol=1e-6)
    assert "s" in g.edata and "s2" in g.edata


def test_apply_node_func():
    g = make()
    g.update_all(
        fn.copy_u("h", "m"), fn.sum("m", "agg"),
        lambda nodes: {"out": nodes.data["agg"] * 2.0},
    )
    np.testing.assert_allclose(
        g.ndata["out"], 2.0 * np.asarray(g.ndata["agg"]), rtol=1e-6
    )


def test_local_scope():
    g = make()
    with g.local_scope():
        g.ndata["tmp"] = jnp.zeros((12, 1))
        g.update_all(fn.copy_u("h", "m"), fn.sum("m", "scratch"))
        assert "scratch" in g.ndata
    assert "tmp" not in g.ndata
    assert "scratch" not in g.ndata


def test_send_and_recv_subset():
    g = make()
    eids = np.array([0, 3, 7, 11])
    out = g.send_and_recv(eids, fn.copy_u("h", "m"), fn.sum("m", "o"))
    src = np.asarray(g.src)[:40]
    dst = np.asarray(g.dst)[:40]
    h = np.asarray(g.ndata["h"])
    ref = np.zeros((12, 4), np.float32)
    for e in eids:
        ref[dst[e]] += h[src[e]]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_udf_reduce_compiled_matches_eager():
    """UDF reduce inside jit (static ELL mailbox plan) matches the eager
    exact-width degree-bucketed path on values AND grads, and a masked
    order-statistic UDF matches the builtin max."""
    import jax

    from dgl1_tpu import core

    g = dgl.rand_graph(150, 1800, seed=3)
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(150, 6)).astype(np.float32))

    def reducer(nodes):
        # padding-safe custom reduce (padded slots are zero-filled)
        return {"out": (nodes.mailbox["m"] ** 2).sum(axis=1)}

    g.ndata["h"] = h
    out_eager = g.update_all(fn.copy_u("h", "m"), reducer)

    @jax.jit
    def step(g, h):
        g.ndata["h"] = h
        return core.message_passing(g, fn.copy_u("h", "m"), reducer,
                                    None)["out"]

    out_jit = step(g, h)
    np.testing.assert_allclose(np.asarray(out_jit), np.asarray(out_eager),
                               atol=1e-5)

    # Grads through the compiled UDF path vs the dense reference.
    @jax.jit
    def loss(g, h):
        g.ndata["h"] = h
        res = core.message_passing(g, fn.copy_u("h", "m"), reducer, None)
        return (res["out"] ** 2).sum()

    gj = jax.grad(loss, argnums=1)(g, h)
    e = g.num_edges()
    src = jnp.asarray(np.asarray(g.src)[:e])
    dst = jnp.asarray(np.asarray(g.dst)[:e])

    def loss_ref(h):
        out = jax.ops.segment_sum(h[src] ** 2, dst, num_segments=150)
        return (out ** 2).sum()

    gr = jax.grad(loss_ref)(h)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(gr), rtol=1e-5,
                               atol=1e-3)

    # Masked order statistic via mailbox_mask == builtin max.
    def max_reducer(nodes):
        m = jnp.where(nodes.mailbox_mask[..., None], nodes.mailbox["m"],
                      -jnp.inf)
        out = m.max(axis=1)
        return {"out": jnp.where(jnp.isfinite(out), out, 0.0)}

    @jax.jit
    def step_max(g, h):
        g.ndata["h"] = h
        return core.message_passing(g, fn.copy_u("h", "m"), max_reducer,
                                    None)["out"]

    ref_max = dgl.ops.gspmm(g, "copy_lhs", "max", h, None)
    np.testing.assert_allclose(np.asarray(step_max(g, h)),
                               np.asarray(ref_max), atol=1e-5)


def test_udf_reduce_compiled_degrees_and_dstdata():
    """The compiled NodeBatch carries true degrees and dst-side ndata."""
    import jax

    from dgl1_tpu import core

    g = dgl.rand_graph(60, 500, seed=9)
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(60, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(60, 4)).astype(np.float32))

    def mean_plus_bias(nodes):
        s = nodes.mailbox["m"].sum(axis=1)
        deg = jnp.maximum(nodes.degrees.astype(s.dtype), 1.0)[:, None]
        return {"out": s / deg + nodes.data["b"]}

    @jax.jit
    def step(g, h, b):
        g.ndata["h"] = h
        g.ndata["b"] = b
        return core.message_passing(g, fn.copy_u("h", "m"),
                                    mean_plus_bias, None)["out"]

    out = step(g, h, b)
    ref = dgl.ops.gspmm(g, "copy_lhs", "mean", h, None) + b
    # zero-degree nodes: compiled path yields 0 (+bias via data) —
    # mean oracle also zero-fills, so add bias everywhere.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_apply_nodes_all_and_subset():
    import numpy as np
    import jax.numpy as jnp
    import dgl1_tpu as dgl

    g = dgl.rand_graph(8, 20, seed=0)
    g.ndata["h"] = jnp.arange(8, dtype=jnp.float32)[:, None]

    g.apply_nodes(lambda nb: {"h2": nb.data["h"] * 2.0})
    np.testing.assert_allclose(np.asarray(g.ndata["h2"][:, 0]),
                               np.arange(8) * 2.0)

    v = jnp.asarray([1, 3, 5])
    g.apply_nodes(lambda nb: {"h": nb.data["h"] + 100.0}, v)
    want = np.arange(8, dtype=np.float32)
    want[[1, 3, 5]] += 100.0
    np.testing.assert_allclose(np.asarray(g.ndata["h"][:, 0]), want)
