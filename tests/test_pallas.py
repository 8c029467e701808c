"""Pallas engine vs XLA oracle (interpret mode on CPU).

The dual-path contract (SURVEY.md §4): every covered (op, reduce) pair
must match the XLA segment engine in value AND gradient, including on
padded graphs and through the model layers that use it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import dispatch
from dgl1_tpu.ops.engine_pallas import gspmm_pallas
from dgl1_tpu.ops.engine_xla import gspmm_xla

N, E = 300, 2000


def make(pad=0):
    return dgl.rand_graph(N, E, seed=0,
                          pad_edges_to=E + pad if pad else None)


def data(seed=1, f=10, shift=2.0):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(N, f)).astype(np.float32)) + shift
    e = jnp.asarray(rng.normal(size=(E, f)).astype(np.float32)) + shift
    return u, e


@pytest.mark.parametrize("op", ["copy_lhs", "copy_rhs", "add", "sub",
                                "mul", "div"])
@pytest.mark.parametrize("red", ["sum", "mean"])
def test_forward_matches_xla(op, red):
    g = make()
    u, e = data()
    uu = u if op != "copy_rhs" else None
    ee = e if op != "copy_lhs" else None
    a = gspmm_pallas(g, op, red, uu, ee)
    b = gspmm_xla(g, op, red, uu, ee)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["copy_lhs", "copy_rhs", "add", "mul", "div"])
def test_grad_matches_xla(op):
    g = make()
    u, e = data(2)
    uu = u if op != "copy_rhs" else None
    ee = e if op != "copy_lhs" else None

    def lp(u, e):
        return jnp.sum(jnp.sin(gspmm_pallas(
            g, op, "sum", u if op != "copy_rhs" else None,
            e if op != "copy_lhs" else None)))

    def lx(u, e):
        return jnp.sum(jnp.sin(gspmm_xla(
            g, op, "sum", u if op != "copy_rhs" else None,
            e if op != "copy_lhs" else None)))

    gp = jax.grad(lp, argnums=(0, 1))(u, e)
    gx = jax.grad(lx, argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


def test_padded_graph():
    g = make(pad=37)
    u, _ = data(3)
    e_pad = jnp.asarray(
        np.random.default_rng(3).normal(size=(E + 37, 10)).astype(np.float32)
    )
    a = gspmm_pallas(g, "mul", "sum", u, e_pad)
    b = gspmm_xla(g, "mul", "sum", u, e_pad)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_broadcast():
    g = make()
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(N, 3, 8)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 3, 1)).astype(np.float32)) + 2.0
    a = gspmm_pallas(g, "mul", "sum", u, e)
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # Gradient reduces correctly to the broadcast operand shape.
    gp = jax.grad(lambda e: jnp.sum(gspmm_pallas(g, "mul", "sum", u, e) ** 2))(e)
    gx = jax.grad(lambda e: jnp.sum(gspmm_xla(g, "mul", "sum", u, e) ** 2))(e)
    assert gp.shape == e.shape
    np.testing.assert_allclose(gp, gx, rtol=1e-3, atol=1e-3)


def test_engine_forced_through_public_api():
    g = make()
    u, e = data(5)
    dispatch.set_engine("pallas")
    try:
        a = dgl.ops.gspmm(g, "mul", "sum", u, e)
    finally:
        dispatch.set_engine("auto")
    b = dgl.ops.gspmm(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_gcn_layer_through_pallas():
    from dgl1_tpu.nn import GraphConv

    g = dgl.add_self_loop(dgl.rand_graph(200, 1000, seed=6))
    feat = jnp.asarray(
        np.random.default_rng(6).normal(size=(200, 16)).astype(np.float32)
    )
    conv = GraphConv(8)
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    dispatch.set_engine("pallas")
    try:
        out_p = conv.apply(params, g, feat)
        grad_p = jax.grad(
            lambda p: jnp.sum(conv.apply(p, g, feat) ** 2)
        )(params)
    finally:
        dispatch.set_engine("auto")
    out_x = conv.apply(params, g, feat)
    grad_x = jax.grad(lambda p: jnp.sum(conv.apply(p, g, feat) ** 2))(params)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(grad_p), jax.tree.leaves(grad_x)):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_unsupported_falls_back():
    g = make()
    u, _ = data(7)
    # max reduce is not covered by the Pallas engine -> returns None.
    assert gspmm_pallas(g, "copy_lhs", "max", u, None) is None
    # Public API must still work with the engine forced.
    dispatch.set_engine("pallas")
    try:
        out = dgl.ops.gspmm(g, "copy_lhs", "max", u, None)
    finally:
        dispatch.set_engine("auto")
    np.testing.assert_allclose(out, gspmm_xla(g, "copy_lhs", "max", u, None),
                               rtol=1e-5)
