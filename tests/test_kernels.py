"""Dual-path oracle tests: gspmm/gsddmm vs dense reference, values AND
gradients, across ops x reduces x broadcast shapes x padding.

This is the rebuild of the reference's ``tests/compute/test_kernel.py``
oracle (SURVEY.md §4) — it pins the entire fused-kernel semantic surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import gspmm, gsddmm
from tests.utils import dense_gspmm, dense_gsddmm

N, E = 10, 30


def make_graph(pad=0, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, N, size=E)
    dst = rng.integers(0, N, size=E)
    g = dgl.graph((src, dst), num_nodes=N,
                  pad_edges_to=E + pad if pad else None)
    return g, src, dst


SPMM_CASES = [
    (op, red)
    for op in ["copy_lhs", "copy_rhs", "add", "sub", "mul", "div"]
    for red in ["sum", "max", "min", "mean", "prod"]
]


@pytest.mark.parametrize("op,red", SPMM_CASES)
@pytest.mark.parametrize("pad", [0, 17])
def test_gspmm_forward(op, red, pad):
    g, src, dst = make_graph(pad)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32)) + 2.0
    e_real = rng.normal(size=(E, 4)).astype(np.float32) + 2.0
    e = jnp.asarray(
        np.concatenate([e_real, np.full((pad, 4), 7.0, np.float32)])
        if pad else e_real
    )
    out = gspmm(g, op, red, u, e)
    ref = dense_gspmm(src, dst, N, op, red, u, jnp.asarray(e_real))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("op,red", [
    ("copy_lhs", "sum"), ("mul", "sum"), ("add", "mean"),
    ("copy_lhs", "max"), ("mul", "max"), ("copy_rhs", "min"),
    ("div", "sum"), ("sub", "mean"),
])
def test_gspmm_grad(op, red):
    g, src, dst = make_graph()
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32)) + 2.0
    e = jnp.asarray(rng.normal(size=(E, 3)).astype(np.float32)) + 2.0

    def loss_impl(u, e):
        return jnp.sum(jnp.sin(gspmm(g, op, red, u, e)))

    def loss_ref(u, e):
        return jnp.sum(jnp.sin(dense_gspmm(src, dst, N, op, red, u, e)))

    gu, ge = jax.grad(loss_impl, argnums=(0, 1))(u, e)
    gu_r, ge_r = jax.grad(loss_ref, argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gu, gu_r, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ge, ge_r, rtol=2e-4, atol=2e-4)


def test_gspmm_broadcast():
    g, src, dst = make_graph()
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(N, 2, 4)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 2, 1)).astype(np.float32))
    out = gspmm(g, "mul", "sum", u, e)
    ref = dense_gspmm(src, dst, N, "mul", "sum", u, e)
    assert out.shape == (N, 2, 4)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


SDDMM_CASES = [
    ("add", "u", "v"), ("sub", "u", "v"), ("mul", "u", "v"),
    ("div", "u", "v"), ("dot", "u", "v"), ("add", "u", "e"),
    ("mul", "e", "v"), ("dot", "v", "u"),
]


@pytest.mark.parametrize("op,lt,rt", SDDMM_CASES)
def test_gsddmm_forward(op, lt, rt):
    g, src, dst = make_graph()
    rng = np.random.default_rng(4)

    def mk(target):
        n = {"u": N, "v": N, "e": E}[target]
        return jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)) + 2.0

    lhs, rhs = mk(lt), mk(rt)
    out = gsddmm(g, op, lhs, rhs, lhs_target=lt, rhs_target=rt)
    ref = dense_gsddmm(src, dst, op, lhs, rhs, lt, rt)
    np.testing.assert_allclose(out[:E], ref, rtol=1e-5, atol=1e-5)


def test_gsddmm_grad():
    g, src, dst = make_graph()
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))

    def loss_impl(u, v):
        return jnp.sum(jnp.cos(gsddmm(g, "dot", u, v)[:E]))

    def loss_ref(u, v):
        return jnp.sum(jnp.cos(dense_gsddmm(src, dst, "dot", u, v)))

    gu, gv = jax.grad(loss_impl, argnums=(0, 1))(u, v)
    gu_r, gv_r = jax.grad(loss_ref, argnums=(0, 1))(u, v)
    np.testing.assert_allclose(gu, gu_r, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gv, gv_r, rtol=1e-4, atol=1e-4)


def test_edge_softmax_matches_dense():
    g, src, dst = make_graph()
    rng = np.random.default_rng(6)
    logits = jnp.asarray(rng.normal(size=(E, 1)).astype(np.float32))
    a = np.asarray(dgl.edge_softmax(g, logits))
    # Dense reference: softmax per destination over incoming edges.
    ref = np.zeros((E, 1), np.float32)
    for v in range(N):
        m = dst == v
        if m.sum() == 0:
            continue
        x = np.asarray(logits)[m, 0]
        ex = np.exp(x - x.max())
        ref[m, 0] = ex / ex.sum()
    np.testing.assert_allclose(a, ref, rtol=1e-5, atol=1e-6)
    # Weights per destination sum to 1.
    sums = np.zeros(N)
    np.add.at(sums, dst, a[:, 0])
    np.testing.assert_allclose(sums[np.bincount(dst, minlength=N) > 0], 1.0,
                               rtol=1e-5)


def test_edge_softmax_padded_matches_unpadded():
    g0, src, dst = make_graph()
    g1, _, _ = make_graph(pad=13)
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(E, 2)).astype(np.float32)
    a0 = dgl.edge_softmax(g0, jnp.asarray(logits))
    padded = np.concatenate([logits, np.full((13, 2), 3.0, np.float32)])
    a1 = dgl.edge_softmax(g1, jnp.asarray(padded))
    np.testing.assert_allclose(a0, a1[:E], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a1[E:]), 0.0)


def test_gspmm_padded_matches_unpadded():
    g0, src, dst = make_graph()
    g1, _, _ = make_graph(pad=13)
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
    for red in ["sum", "max", "mean"]:
        out0 = gspmm(g0, "copy_lhs", red, u, None)
        out1 = gspmm(g1, "copy_lhs", red, u, None)
        np.testing.assert_allclose(out0, out1, rtol=1e-6)


def test_segment_mm_matches_loop():
    from dgl1_tpu.ops import segment_mm, gather_mm

    rng = np.random.default_rng(9)
    sizes = np.array([3, 0, 5, 2], np.int32)
    a = jnp.asarray(rng.normal(size=(10, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4, 4, 6)).astype(np.float32))
    out = segment_mm(a, b, jnp.asarray(sizes))
    idx = np.repeat(np.arange(4), sizes)
    ref = np.stack([np.asarray(a)[i] @ np.asarray(b)[idx[i]]
                    for i in range(10)])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    out2 = gather_mm(a, b, jnp.asarray(idx))
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)
