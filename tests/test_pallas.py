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
    # Integer dtypes are not covered by the Pallas engine -> None.
    ui = jnp.ones((N, 4), dtype=jnp.int32)
    assert gspmm_pallas(g, "copy_lhs", "sum", ui, None) is None
    # Public API must still work with the engine forced (falls back).
    dispatch.set_engine("pallas")
    try:
        out = dgl.ops.gspmm(g, "copy_lhs", "sum", ui, None)
    finally:
        dispatch.set_engine("auto")
    np.testing.assert_allclose(out, gspmm_xla(g, "copy_lhs", "sum", ui, None))


@pytest.mark.parametrize("red", ["max", "min"])
@pytest.mark.parametrize("op", ["copy_lhs", "copy_rhs", "mul"])
def test_minmax_forward_matches_xla(op, red):
    g = make()
    u, e = data(8)
    uu = u if op != "copy_rhs" else None
    ee = e if op != "copy_lhs" else None
    a = gspmm_pallas(g, op, red, uu, ee)
    b = gspmm_xla(g, op, red, uu, ee)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
def test_minmax_grad_matches_dense(op):
    """Compare max-reduce gradients against the dense jnp reference (even
    tie-splitting), which is also what jax AD of the XLA engine gives."""
    from tests.utils import dense_gspmm

    g = make()
    src = np.asarray(g.src)[:E]
    dst = np.asarray(g.dst)[:E]
    u, e = data(9)
    uu = u
    ee = e if op == "mul" else None

    def lp(u, e):
        return jnp.sum(jnp.sin(gspmm_pallas(
            g, op, "max", u, e if op == "mul" else None)))

    def ld(u, e):
        return jnp.sum(jnp.sin(dense_gspmm(
            src, dst, N, op, "max", u, e if op == "mul" else None)))

    gp = jax.grad(lp, argnums=(0, 1))(u, e)
    gd = jax.grad(ld, argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gd[0], rtol=1e-3, atol=1e-3)
    if op == "mul":
        np.testing.assert_allclose(gp[1], gd[1], rtol=1e-3, atol=1e-3)


def test_minmax_padded():
    g0 = make()
    g1 = make(pad=41)
    u, _ = data(10)
    a = gspmm_pallas(g0, "copy_lhs", "max", u, None)
    b = gspmm_pallas(g1, "copy_lhs", "max", u, None)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_edge_softmax_grad_through_pallas():
    g = make()
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(E, 4)).astype(np.float32))

    def loss(engine, x):
        dispatch.set_engine(engine)
        try:
            return jnp.sum(jnp.cos(dgl.edge_softmax(g, x)))
        finally:
            dispatch.set_engine("auto")

    gp = jax.grad(lambda x: loss("pallas", x))(logits)
    gx = jax.grad(lambda x: loss("xla", x))(logits)
    np.testing.assert_allclose(gp, gx, rtol=1e-3, atol=1e-4)
