"""Tests for the round-2 NN additions: GATv2, EGAT, EdgeGAT, GCNII, PNA,
JumpingKnowledge, LabelPropagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu import nn

KEY = jax.random.PRNGKey(0)


def make(n=12, e=48, f=6, seed=1):
    g = dgl.rand_graph(n, e, seed=seed)
    feat = jnp.asarray(
        np.random.default_rng(seed).normal(size=(n, f)).astype(np.float32)
    )
    return g, feat


def finite_nonzero_grads(module, g, feat, *args, **kwargs):
    params = module.init(KEY, g, feat, *args, **kwargs)
    out = module.apply(params, g, feat, *args, **kwargs)

    def loss(p, x):
        o = module.apply(p, g, x, *args, **kwargs)
        if isinstance(o, tuple):
            o = o[0]
        return jnp.sum(o ** 2)

    grads = jax.grad(loss, argnums=(0, 1))(params, feat)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)
    return params, out


def test_gatv2_shapes_grads():
    g, feat = make()
    conv = nn.GATv2Conv(out_feats=4, num_heads=3)
    _, out = finite_nonzero_grads(conv, g, feat)
    assert out.shape == (12, 3, 4)


def test_gatv2_share_weights():
    g, feat = make()
    conv = nn.GATv2Conv(out_feats=4, num_heads=2, share_weights=True)
    params = conv.init(KEY, g, feat)
    assert "fc_dst" not in params["params"]
    out = conv.apply(params, g, feat)
    assert out.shape == (12, 2, 4)


def test_gatv2_attention_normalized():
    # Constant features => uniform attention => output equals the
    # (normalized) mean of transformed features per dst.
    g = dgl.rand_graph(10, 40, seed=3)
    feat = jnp.ones((10, 5), jnp.float32)
    conv = nn.GATv2Conv(out_feats=4, num_heads=1)
    params = conv.init(KEY, g, feat)
    out = np.asarray(conv.apply(params, g, feat))[:, 0]
    deg = np.asarray(g.in_degrees())
    # Rows with in-edges must all equal the same transformed value.
    rows = out[deg > 0]
    np.testing.assert_allclose(rows, rows[0:1].repeat(len(rows), 0),
                               rtol=1e-4, atol=1e-5)


def test_egat_conv():
    g, feat = make()
    ef = jnp.asarray(np.random.default_rng(2).normal(
        size=(g.num_edges(), 3)).astype(np.float32))
    conv = nn.EGATConv(out_node_feats=4, out_edge_feats=5, num_heads=2)
    params = conv.init(KEY, g, feat, ef)
    h, f = conv.apply(params, g, feat, ef)
    assert h.shape == (12, 2, 4)
    assert f.shape == (g.num_edges(), 2, 5)
    finite_nonzero_grads(conv, g, feat, ef)


def test_edgegat_conv():
    g, feat = make()
    ef = jnp.asarray(np.random.default_rng(4).normal(
        size=(g.num_edges(), 3)).astype(np.float32))
    conv = nn.EdgeGATConv(out_feats=4, num_heads=2)
    _, out = finite_nonzero_grads(conv, g, feat, ef)
    assert out.shape == (12, 2, 4)


def test_gcn2_conv_identity_limit():
    # alpha=0, lambda -> 0 (layer -> inf): output ~= smoothed input.
    g = dgl.add_self_loop(dgl.rand_graph(10, 30, seed=5))
    feat = jnp.asarray(np.random.default_rng(5).normal(
        size=(10, 6)).astype(np.float32))
    conv = nn.GCN2Conv(layer=1000000, alpha=0.0, lambda_=1.0)
    params = conv.init(KEY, g, feat, feat)
    out = np.asarray(conv.apply(params, g, feat, feat))
    # beta ~ 0 so W contributes ~nothing: compare to P @ feat.
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((10, 10), np.float32)
    np.add.at(A, (dst, src), 1.0)
    din = np.maximum(A.sum(1), 1.0)
    dout = np.maximum(A.sum(0), 1.0)
    ref = np.diag(din ** -0.5) @ A @ np.diag(dout ** -0.5) @ np.asarray(feat)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_gcn2_conv_grads():
    g, feat = make(f=6)
    conv = nn.GCN2Conv(layer=2, alpha=0.2, lambda_=1.0)
    _, out = finite_nonzero_grads(conv, g, feat, feat)
    assert out.shape == feat.shape
    conv2 = nn.GCN2Conv(layer=2, alpha=0.2, project_initial_features=True)
    params = conv2.init(KEY, g, feat, feat)
    assert "fc_0" not in params["params"]


def test_pna_conv():
    g, feat = make(f=8)
    conv = nn.PNAConv(out_feats=6, num_towers=2, delta=1.3)
    _, out = finite_nonzero_grads(conv, g, feat)
    assert out.shape == (12, 6)


def test_pna_conv_sum_identity_scaler_math():
    g = dgl.rand_graph(8, 24, seed=7)
    feat = jnp.asarray(np.random.default_rng(7).normal(
        size=(8, 4)).astype(np.float32))
    conv = nn.PNAConv(out_feats=4, aggregators=("sum",),
                      scalers=("identity",), residual=False)
    params = conv.init(KEY, g, feat)
    out = conv.apply(params, g, feat)
    # Reference: tower input [h_v || sum_agg], then two linears.
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((8, 8), np.float32)
    np.add.at(A, (dst, src), 1.0)
    agg = A @ np.asarray(feat)
    inp = np.concatenate([np.asarray(feat), agg], -1)
    p = params["params"]
    t = inp @ np.asarray(p["tower_0"]["kernel"]) + np.asarray(
        p["tower_0"]["bias"])
    ref = t @ np.asarray(p["mixing"]["kernel"]) + np.asarray(
        p["mixing"]["bias"])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["cat", "max", "lstm"])
def test_jumping_knowledge(mode):
    feats = [jnp.asarray(np.random.default_rng(i).normal(
        size=(10, 4)).astype(np.float32)) for i in range(3)]
    jk = nn.JumpingKnowledge(mode=mode)
    params = jk.init(KEY, feats)
    out = jk.apply(params, feats)
    if mode == "cat":
        assert out.shape == (10, 12)
        np.testing.assert_allclose(out, jnp.concatenate(feats, -1))
    else:
        assert out.shape == (10, 4)
    if mode == "max":
        np.testing.assert_allclose(
            out, np.max(np.stack(feats), axis=0), rtol=1e-6)


def test_label_propagation():
    # Two disconnected cliques: labels propagate within, not across.
    src = np.array([0, 1, 2, 0, 1, 2, 3, 4, 5, 3, 4, 5])
    dst = np.array([1, 2, 0, 2, 0, 1, 4, 5, 3, 5, 3, 4])
    g = dgl.graph((src, dst), num_nodes=6)
    labels = jnp.array([0, 0, 0, 1, 1, 1])
    mask = jnp.array([True, False, False, True, False, False])
    lp = nn.LabelPropagation(k=10, alpha=0.9)
    out = lp.apply({}, g, labels, mask)
    pred = np.asarray(out).argmax(-1)
    np.testing.assert_array_equal(pred, np.asarray(labels))
    # Probabilities clamped to [0, 1].
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_new_convs_on_blocks():
    # Sampled-pipeline compatibility: GATv2 on a bipartite block.
    g = dgl.rand_graph(30, 120, seed=9)
    from dgl1_tpu.sampling import sample_neighbors
    from dgl1_tpu.transform import to_block

    seeds = np.arange(8)
    frontier = sample_neighbors(g, seeds, 4)
    blk = to_block(frontier, seeds)
    feat = jnp.asarray(np.random.default_rng(9).normal(
        size=(blk.num_src_nodes(), 6)).astype(np.float32))
    conv = nn.GATv2Conv(out_feats=4, num_heads=2)
    params = conv.init(KEY, blk, feat)
    out = conv.apply(params, blk, feat)
    assert out.shape == (blk.num_dst_nodes(), 2, 4)


def test_typed_linear_sorted_matches_unsorted():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(size=(20, 5)).astype(np.float32))
    types_sorted = jnp.asarray(np.sort(rng.integers(0, 3, 20)))
    tl = nn.TypedLinear(in_size=5, out_size=4, num_types=3)
    params = tl.init(KEY, x, types_sorted)
    a = tl.apply(params, x, types_sorted, sorted_by_type=True)
    b = tl.apply(params, x, types_sorted, sorted_by_type=False)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    # Exact: row i uses W[type_i].
    W = np.asarray(params["params"]["weight"])
    ref = np.stack([np.asarray(x)[i] @ W[int(types_sorted[i])]
                    for i in range(20)])
    np.testing.assert_allclose(b, ref, rtol=1e-4, atol=1e-5)


def test_typed_linear_basis():
    x = jnp.ones((6, 5), jnp.float32)
    t = jnp.asarray([0, 1, 2, 0, 1, 2])
    tl = nn.TypedLinear(in_size=5, out_size=4, num_types=3,
                        regularizer="basis", num_bases=2)
    params = tl.init(KEY, x, t)
    out = tl.apply(params, x, t)
    assert out.shape == (6, 4)
    assert params["params"]["basis"].shape == (2, 5, 4)


def test_hetero_linear_and_embedding():
    hl = nn.HeteroLinear(in_sizes={"user": 4, "item": 6}, out_size=3)
    feats = {"user": jnp.ones((5, 4)), "item": jnp.ones((7, 6))}
    params = hl.init(KEY, feats)
    out = hl.apply(params, feats)
    assert out["user"].shape == (5, 3) and out["item"].shape == (7, 3)

    he = nn.HeteroEmbedding(num_embeddings={"user": 10, "item": 20},
                            embedding_dim=8)
    ids = {"user": jnp.asarray([0, 3]), "item": jnp.asarray([1, 2, 19])}
    params = he.init(KEY, ids)
    emb = he.apply(params, ids)
    assert emb["user"].shape == (2, 8) and emb["item"].shape == (3, 8)


def test_hgt_conv():
    g, feat = make(n=14, e=60, f=8, seed=21)
    rng = np.random.default_rng(21)
    ntype = jnp.asarray(rng.integers(0, 2, 14))
    etype = jnp.asarray(rng.integers(0, 3, g.num_edges()))
    conv = nn.HGTConv(in_size=8, head_size=4, num_heads=2,
                      num_ntypes=2, num_etypes=3)
    params = conv.init(KEY, g, feat, ntype, etype)
    out = conv.apply(params, g, feat, ntype, etype)
    assert out.shape == (14, 8)  # head_size * num_heads == in_size: skip on

    def loss(p, x):
        return jnp.sum(conv.apply(p, g, x, ntype, etype) ** 2)

    grads = jax.grad(loss, argnums=(0, 1))(params, feat)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)


def test_hgt_conv_under_jit():
    g, feat = make(n=14, e=60, f=8, seed=22)
    ntype = jnp.zeros((14,), jnp.int32)
    etype = jnp.zeros((g.num_edges(),), jnp.int32)
    conv = nn.HGTConv(in_size=8, head_size=2, num_heads=2,
                      num_ntypes=1, num_etypes=1)
    params = conv.init(KEY, g, feat, ntype, etype)
    out = jax.jit(lambda p, g, x: conv.apply(p, g, x, ntype, etype))(
        params, g, feat)
    assert out.shape == (14, 4)


def test_edge_weight_norm_both_matches_dense():
    g, _ = make(n=10, e=40, f=4, seed=3)
    e = g.num_edges()
    w = jnp.asarray(
        np.random.default_rng(0).uniform(0.5, 2.0, size=e).astype(np.float32)
    )
    wp = jnp.zeros(g.num_edges_padded(), jnp.float32).at[:e].set(w)
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    n = g.num_nodes()
    out_w = np.zeros(n, np.float32)
    in_w = np.zeros(n, np.float32)
    np.add.at(out_w, src, np.asarray(w))
    np.add.at(in_w, dst, np.asarray(w))

    got = nn.EdgeWeightNorm(norm="both")(g, wp)
    want = np.asarray(w) / np.sqrt(out_w[src] * in_w[dst])
    np.testing.assert_allclose(np.asarray(got)[:e], want, rtol=1e-5)

    got_r = nn.EdgeWeightNorm(norm="right")(g, wp)
    np.testing.assert_allclose(np.asarray(got_r)[:e],
                               np.asarray(w) / in_w[dst], rtol=1e-5)


def test_edge_weight_norm_feeds_graphconv():
    g, feat = make(n=10, e=40, f=4, seed=5)
    e = g.num_edges()
    w = jnp.ones(g.num_edges_padded(), jnp.float32)
    cw = nn.EdgeWeightNorm(norm="both")(g, w)
    mod = nn.GraphConv(out_feats=3, norm="none")
    params = mod.init(KEY, g, feat, edge_weight=cw)
    out_w = mod.apply(params, g, feat, edge_weight=cw)
    # With unit weights, EdgeWeightNorm reproduces symmetric GCN norm.
    mod2 = nn.GraphConv(out_feats=3, norm="both")
    out_sym = mod2.apply(params, g, feat)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(out_sym),
                               rtol=1e-4, atol=1e-5)
