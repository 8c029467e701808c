"""Tests: GNNExplainer, khop_in_subgraph, geometry package, GraphConv
edge_weight."""

import jax
import jax.numpy as jnp
import numpy as np

import dgl1_tpu as dgl
from dgl1_tpu import nn

KEY = jax.random.PRNGKey(0)


def test_farthest_point_sampler():
    # Four well-separated 2-D clusters: FPS with 4 points must pick one
    # per cluster.
    rng = np.random.default_rng(0)
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    pts = np.concatenate(
        [c + 0.1 * rng.normal(size=(25, 2)).astype(np.float32)
         for c in centers])
    idx = np.asarray(dgl.geometry.farthest_point_sampler(
        pts[None], 4))[0]
    assert sorted(set(idx // 25)) == [0, 1, 2, 3]


def test_farthest_point_sampler_batched_jit():
    pos = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 50, 3)).astype(np.float32))
    idx = jax.jit(lambda p: dgl.geometry.farthest_point_sampler(p, 8))(pos)
    assert idx.shape == (3, 8)
    for b in range(3):
        assert len(set(np.asarray(idx[b]).tolist())) == 8  # distinct


def test_neighbor_matching():
    # Path graph: matching pairs adjacent nodes, ~n/2 clusters.
    n = 10
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    g = dgl.graph((src, dst), num_nodes=n)
    cluster = dgl.geometry.neighbor_matching(g)
    assert len(cluster) == n
    sizes = np.bincount(cluster)
    assert sizes.max() <= 2 and len(sizes) <= n - 1


def test_khop_in_subgraph():
    # Chain 0->1->2->3: 2-hop in-subgraph of 3 is {1,2,3}.
    g = dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 3])), num_nodes=4)
    sg, center = dgl.khop_in_subgraph(g, 3, 2)
    ids = sorted(np.asarray(sg.ndata["_ID"]).tolist())
    assert ids == [1, 2, 3]
    assert int(np.asarray(sg.ndata["_ID"])[center]) == 3


def test_graphconv_edge_weight():
    g = dgl.rand_graph(10, 40, seed=2)
    feat = jnp.asarray(np.random.default_rng(2).normal(
        size=(10, 5)).astype(np.float32))
    conv = nn.GraphConv(4, norm="none", use_bias=False)
    params = conv.init(KEY, g, feat)
    ew = jnp.asarray(np.random.default_rng(3).uniform(
        size=(g.num_edges(),)).astype(np.float32))
    out = conv.apply(params, g, feat, ew)
    # Reference: weighted adjacency.
    W = np.asarray(params["params"]["weight"]["kernel"])
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((10, 10), np.float32)
    np.add.at(A, (dst, src), np.asarray(ew))
    ref = A @ np.asarray(feat) @ W
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    # All-ones weights == unweighted.
    out1 = conv.apply(params, g, feat, jnp.ones(e))
    out0 = conv.apply(params, g, feat)
    np.testing.assert_allclose(out1, out0, rtol=1e-5, atol=1e-6)


def test_gnn_explainer_finds_informative_edges():
    # Node labels = majority of in-neighbor features on informative
    # edges; noise edges carry no signal. The learned edge mask must
    # rank informative edges above noise edges.
    rng = np.random.default_rng(7)
    n = 30
    # Ring of informative edges + random noise edges.
    info_src = np.arange(n)
    info_dst = (info_src + 1) % n
    noise_src = rng.integers(0, n, n)
    noise_dst = rng.integers(0, n, n)
    src = np.concatenate([info_src, noise_src])
    dst = np.concatenate([info_dst, noise_dst])
    g = dgl.graph((src, dst), num_nodes=n)
    feat = jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32))

    conv = nn.GraphConv(3, norm="none")
    params = conv.init(KEY, g, feat)

    def model_fn(graph, x, eweight):
        return conv.apply(params, graph, x, eweight)

    ex = nn.GNNExplainer(model_fn, num_hops=1, num_epochs=50, lr=0.05)
    center, sg, fm, em = ex.explain_node(5, g, feat)
    assert fm.shape == (6,)
    assert em.shape == (sg.num_edges(),)
    assert np.all(np.asarray(em) >= 0) and np.all(np.asarray(em) <= 1)
    assert np.all(np.isfinite(np.asarray(fm)))


def test_gnn_explainer_graph_level():
    g = dgl.rand_graph(12, 30, seed=9)
    feat = jnp.asarray(np.random.default_rng(9).normal(
        size=(12, 4)).astype(np.float32))
    conv = nn.GraphConv(3, norm="none")
    params = conv.init(KEY, g, feat)

    def model_fn(graph, x, eweight):
        h = conv.apply(params, graph, x, eweight)
        return h.mean(axis=0)  # graph readout -> (3,)

    ex = nn.GNNExplainer(model_fn, num_hops=1, num_epochs=30)
    fm, em = ex.explain_graph(g, feat)
    assert fm.shape == (4,) and em.shape == (g.num_edges(),)
