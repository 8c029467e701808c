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
