"""Block-dense fused attention vs the composed oracle: values + grads
(the dual-path contract, as tests/test_attention.py does for the hub
kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import gsddmm, gspmm
from dgl1_tpu.ops.battention import bdense_gat_attention, can_fuse_battention
from dgl1_tpu.ops.edge_softmax import edge_softmax

FORMATS = ("coo", "csr", "csc", "ell", "bdense")
N, H, D = 520, 4, 8


def band_graph(n=N, e=9000, width=60, seed=0, extra_scatter=300):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-width, width, e), 0, n - 1)
    # A scattered minority ensures a real ELL tail participates.
    s2 = rng.integers(0, n, extra_scatter)
    d2 = rng.integers(0, n, extra_scatter)
    return dgl.graph((np.concatenate([src, s2]),
                      np.concatenate([dst, d2])),
                     num_nodes=n, formats=FORMATS)


def data(seed=1):
    rng = np.random.default_rng(seed)
    el = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(N, H, D)).astype(np.float32))
    return el, er, ft


def composed(g, el, er, ft, slope=0.2):
    e = gsddmm(g, "add", el[:, :, None], er[:, :, None],
               lhs_target="u", rhs_target="v")
    e = jnp.where(e >= 0, e, slope * e)
    a = edge_softmax(g, e)
    return gspmm(g, "mul", "sum", ft, a)


def test_battention_forward_matches_composed():
    g = band_graph()
    assert can_fuse_battention(g)
    assert g.bdense_meta.covered < g.num_edges()  # real tail present
    el, er, ft = data()
    out = bdense_gat_attention(g, el, er, ft)
    ref = composed(g, el, er, ft)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_battention_grads_match_composed():
    g = band_graph(seed=3)
    el, er, ft = data(2)

    def loss_fused(el, er, ft):
        return jnp.sum(jnp.sin(bdense_gat_attention(g, el, er, ft)))

    def loss_ref(el, er, ft):
        return jnp.sum(jnp.sin(composed(g, el, er, ft)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(el, er, ft)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(el, er, ft)
    for a, b, name in zip(g1, g2, ("gel", "ger", "gft")):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_battention_under_jit():
    g = band_graph(seed=5)
    el, er, ft = data(4)
    out = jax.jit(lambda el, er, ft: bdense_gat_attention(
        g, el, er, ft))(el, er, ft)
    ref = composed(g, el, er, ft)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_battention_extreme_logits_stable():
    g = band_graph(seed=7)
    el, er, ft = data(6)
    el = el * 40.0  # large spread: naive exp would overflow
    out = np.asarray(bdense_gat_attention(g, el, er, ft))
    ref = np.asarray(composed(g, el, er, ft))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_battention_declines_without_format():
    g = dgl.rand_graph(50, 200, seed=1)
    el, er, ft = data()
    assert bdense_gat_attention(g, el[:50], er[:50], ft[:50]) is None


def test_battention_zero_indegree_rows():
    # Nodes with no in-edges at all must produce zeros, not NaN.
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 1, 2])
    g = dgl.graph((np.tile(src, 40), np.tile(dst, 40)), num_nodes=300,
                  formats=FORMATS)
    rng = np.random.default_rng(0)
    el = jnp.asarray(rng.normal(size=(300, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(300, H)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(300, H, D)).astype(np.float32))
    out = np.asarray(bdense_gat_attention(g, el, er, ft))
    assert np.all(np.isfinite(out))
    assert np.allclose(out[5:], 0.0)


def test_gatconv_uses_battention_path():
    from dgl1_tpu import nn as gnn

    g = band_graph(seed=11)
    rng = np.random.default_rng(11)
    feat = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))
    conv = gnn.GATConv(out_feats=D, num_heads=H)
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    out = conv.apply(params, g, feat)
    # Same params on a plain graph (no bdense): the composed path.
    g0 = dgl.graph((np.asarray(g.src)[:g.num_edges()],
                    np.asarray(g.dst)[:g.num_edges()]), num_nodes=N)
    ref = conv.apply(params, g0, feat)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # Gradients agree through the module too.
    def loss(p, graph):
        return jnp.sum(conv.apply(p, graph, feat) ** 2)

    ga = jax.grad(loss)(params, g)
    gb = jax.grad(loss)(params, g0)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
