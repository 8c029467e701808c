"""ELL engine vs XLA oracle: values + gradients (the dual-path contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import dispatch
from dgl1_tpu.ops.engine_ell import gspmm_ell
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


def test_ell_structure_sane():
    g = make()
    total_slots = sum(k * n for k, n in g.ell_dst_meta)
    assert total_slots == g.ell_dst["idx"].shape[0]
    nz_rows = sum(n for _, n in g.ell_dst_meta)
    assert nz_rows == int(np.sum(np.asarray(g.in_degrees()) > 0))
    # Waste bounded by the ladder ratio.
    assert total_slots <= 1.5 * E + nz_rows


@pytest.mark.parametrize("op", ["copy_lhs", "copy_rhs", "add", "sub",
                                "mul", "div"])
@pytest.mark.parametrize("red", ["sum", "mean"])
def test_ell_forward_matches_xla(op, red):
    g = make()
    u, e = data()
    uu = u if op != "copy_rhs" else None
    ee = e if op != "copy_lhs" else None
    a = gspmm_ell(g, op, red, uu, ee)
    b = gspmm_xla(g, op, red, uu, ee)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["copy_lhs", "copy_rhs", "add", "mul", "div"])
def test_ell_grad_matches_xla(op):
    g = make()
    u, e = data(2)

    def mk(fn):
        def loss(u, e):
            return jnp.sum(jnp.sin(fn(
                g, op, "sum", u if op != "copy_rhs" else None,
                e if op != "copy_lhs" else None)))

        return loss

    gp = jax.grad(mk(gspmm_ell), argnums=(0, 1))(u, e)
    gx = jax.grad(mk(gspmm_xla), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


def test_ell_padded_matches():
    g0 = make()
    g1 = make(pad=37)
    u, _ = data(3)
    e_pad = jnp.asarray(
        np.random.default_rng(3).normal(size=(E + 37, 10)).astype(np.float32)
    )
    a = gspmm_ell(g1, "mul", "sum", u, e_pad)
    b = gspmm_xla(g0, "mul", "sum", u, e_pad[:E])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # Padded-edge e-grads must be zero.
    ge = jax.grad(
        lambda e: jnp.sum(gspmm_ell(g1, "mul", "sum", u, e) ** 2)
    )(e_pad)
    np.testing.assert_allclose(np.asarray(ge)[E:], 0.0)


def test_ell_through_public_api_and_gcn():
    from dgl1_tpu.nn import GraphConv

    g = dgl.add_self_loop(dgl.rand_graph(200, 1000, seed=6))
    feat = jnp.asarray(
        np.random.default_rng(6).normal(size=(200, 16)).astype(np.float32)
    )
    conv = GraphConv(8)
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    dispatch.set_engine("ell")
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


def test_ell_zero_degree_rows():
    # Node 3 has no in-edges; ELL must return zeros there.
    g = dgl.graph((np.array([0, 1]), np.array([1, 0])), num_nodes=4)
    u = jnp.ones((4, 2))
    out = gspmm_ell(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(np.asarray(out)[2:], 0.0)
    np.testing.assert_allclose(np.asarray(out)[:2], 1.0)
