"""NN module tests (parity role: ``tests/pytorch/test_nn.py``): shape and
gradient smoke tests per conv, plus exact-math checks where cheap."""

import flax.linen as fnn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu import nn

KEY = jax.random.PRNGKey(0)


def make(n=12, e=48, f=6):
    g = dgl.rand_graph(n, e, seed=1)
    feat = jnp.asarray(
        np.random.default_rng(1).normal(size=(n, f)).astype(np.float32)
    )
    return g, feat


def check_grads(module, g, feat, *args, **kwargs):
    params = module.init(KEY, g, feat, *args, **kwargs)
    out = module.apply(params, g, feat, *args, **kwargs)

    def loss(p, x):
        return jnp.sum(module.apply(p, g, x, *args, **kwargs) ** 2)

    grads = jax.grad(loss, argnums=(0, 1))(params, feat)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)
    return out


def test_graphconv_math():
    g = dgl.add_self_loop(dgl.rand_graph(8, 20, seed=2))
    feat = jnp.asarray(
        np.random.default_rng(2).normal(size=(8, 5)).astype(np.float32)
    )
    conv = nn.GraphConv(3)
    params = conv.init(KEY, g, feat)
    out = conv.apply(params, g, feat)
    assert out.shape == (8, 3)
    # Exact check: D^-1/2 A D^-1/2 X W + b.
    W = np.asarray(params["params"]["weight"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((8, 8), np.float32)
    np.add.at(A, (dst, src), 1.0)
    dout = np.maximum(A.sum(0), 1)
    din = np.maximum(A.sum(1), 1)
    ref = (np.diag(din ** -0.5) @ A @ np.diag(dout ** -0.5)
           @ np.asarray(feat) @ W + b)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_gatconv():
    g, feat = make()
    out = check_grads(nn.GATConv(4, num_heads=3), g, feat)
    assert out.shape == (12, 3, 4)
    # Attention weights per dst sum to one -> with all-equal features the
    # output is a convex combination; just check finiteness + shape here.


def test_dotgatconv():
    g, feat = make()
    out = check_grads(nn.DotGatConv(4, num_heads=3), g, feat)
    assert out.shape == (12, 3, 4)
    # edge_softmax weights sum to 1 per dst: with identical source rows
    # the aggregated output equals the (shared) projected row.
    const = jnp.ones_like(feat)
    conv = nn.DotGatConv(4, num_heads=2)
    params = conv.init(KEY, g, const)
    out = conv.apply(params, g, const)
    proj = np.asarray(const @ params["params"]["fc"]["kernel"]).reshape(
        12, 2, 4)
    deg = np.asarray(g.in_degrees())
    has_in = deg > 0
    np.testing.assert_allclose(
        np.asarray(out)[has_in], proj[has_in], rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(out)[~has_in], 0.0)


def test_sageconv_aggregators():
    g, feat = make()
    for agg in ["mean", "gcn", "pool"]:
        out = check_grads(nn.SAGEConv(7, aggregator_type=agg), g, feat)
        assert out.shape == (12, 7)


def test_sageconv_mean_math():
    g, feat = make()
    conv = nn.SAGEConv(4, aggregator_type="mean", use_bias=False)
    params = conv.init(KEY, g, feat)
    out = conv.apply(params, g, feat)
    Wn = np.asarray(params["params"]["fc_neigh"]["kernel"])
    Ws = np.asarray(params["params"]["fc_self"]["kernel"])
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((12, 12), np.float32)
    np.add.at(A, (dst, src), 1.0)
    mean_n = A @ np.asarray(feat) / np.maximum(A.sum(1, keepdims=True), 1)
    ref = np.asarray(feat) @ Ws + mean_n @ Wn
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_relgraphconv():
    g, feat = make()
    etypes = jnp.asarray(
        np.random.default_rng(3).integers(0, 3, size=48).astype(np.int32)
    )
    conv = nn.RelGraphConv(6, 5, num_rels=3)
    params = conv.init(KEY, g, feat, etypes)
    out = conv.apply(params, g, feat, etypes)
    assert out.shape == (12, 5)
    # Against per-edge loop.
    W = np.asarray(params["params"]["weight"])
    Wl = np.asarray(params["params"]["loop_weight"])
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    ref = np.asarray(feat) @ Wl
    for i in range(e):
        ref[dst[i]] += np.asarray(feat)[src[i]] @ W[int(etypes[i])]
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_relgraphconv_rel_graphs_fast_path():
    """The per-relation subgraph path (typed_subgraphs + project->SpMM)
    must match the generic gather_mm path on values AND grads — it is
    the TPU-native R-GCN formulation (no per-edge feature tensor)."""
    g, feat = make()
    et = np.random.default_rng(5).integers(0, 3, size=48).astype(np.int32)
    rel_graphs = dgl.typed_subgraphs(g, et, 3)
    assert sum(gr.num_edges() for gr in rel_graphs) == g.num_edges()
    for kw in ({}, {"regularizer": "basis", "num_bases": 2}):
        conv = nn.RelGraphConv(6, 5, num_rels=3, **kw)
        params = conv.init(KEY, g, feat, jnp.asarray(et))
        out_ref = conv.apply(params, g, feat, jnp.asarray(et))
        out_fast = conv.apply(params, g, feat, rel_graphs=rel_graphs)
        np.testing.assert_allclose(out_fast, out_ref, rtol=1e-4, atol=1e-4)

        def loss_ref(p):
            return jnp.sum(conv.apply(p, g, feat, jnp.asarray(et)) ** 2)

        def loss_fast(p):
            return jnp.sum(conv.apply(p, g, feat,
                                      rel_graphs=rel_graphs) ** 2)

        g_ref = jax.grad(loss_ref)(params)
        g_fast = jax.grad(loss_fast)(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
            np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_relgraphconv_basis_and_presorted():
    g, feat = make()
    rng = np.random.default_rng(4)
    et = np.sort(rng.integers(0, 4, size=48)).astype(np.int32)
    counts = jnp.asarray(np.bincount(et, minlength=4).astype(np.int32))
    conv = nn.RelGraphConv(6, 5, num_rels=4, regularizer="basis", num_bases=2)
    # NOTE: presorted requires the graph's edges sorted by etype in user
    # order, which holds here because we assign sorted etypes to user ids.
    params = conv.init(KEY, g, feat, jnp.asarray(et))
    out1 = conv.apply(params, g, feat, jnp.asarray(et))
    out2 = conv.apply(params, g, feat, jnp.asarray(et), presorted=True,
                      etype_counts=counts)
    np.testing.assert_allclose(out1, out2, rtol=1e-4, atol=1e-4)


def test_other_convs_smoke():
    g, feat = make()
    g_sl = dgl.add_self_loop(g)
    for mod, graph in [
        (nn.GINConv(), g),
        (nn.SGConv(5, k=2), g_sl),
        (nn.APPNPConv(k=3), g_sl),
        (nn.TAGConv(5, k=2), g_sl),
        (nn.ChebConv(5, k=3), g_sl),
        (nn.EdgeConv(5), g),
        (nn.AGNNConv(), g),
        (nn.GatedGraphConv(6, n_steps=2), g),
    ]:
        out = check_grads(mod, graph, feat)
        assert out.shape[0] == 12


def test_dense_conv_matches_sparse():
    g, feat = make()
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    A = np.zeros((12, 12), np.float32)
    np.add.at(A, (dst, src), 1.0)
    sparse = nn.GraphConv(4)
    dense = nn.DenseGraphConv(4)
    ps = sparse.init(KEY, g, feat)
    out_s = sparse.apply(ps, g, feat)
    pd = {"params": {"weight": ps["params"]["weight"],
                     "bias": ps["params"]["bias"]}}
    out_d = dense.apply(pd, jnp.asarray(A), feat)
    np.testing.assert_allclose(out_s, out_d, rtol=1e-4, atol=1e-4)


def test_readouts():
    g1 = dgl.rand_graph(5, 10, seed=5)
    g2 = dgl.rand_graph(7, 14, seed=6)
    bg = dgl.batch([g1, g2])
    feat = jnp.asarray(
        np.random.default_rng(5).normal(size=(12, 3)).astype(np.float32)
    )
    sum_out = nn.SumPooling().apply({}, bg, feat)
    np.testing.assert_allclose(
        sum_out,
        np.stack([np.asarray(feat)[:5].sum(0), np.asarray(feat)[5:].sum(0)]),
        rtol=1e-5,
    )
    avg_out = nn.AvgPooling().apply({}, bg, feat)
    np.testing.assert_allclose(
        avg_out,
        np.stack([np.asarray(feat)[:5].mean(0), np.asarray(feat)[5:].mean(0)]),
        rtol=1e-5,
    )
    max_out = nn.MaxPooling().apply({}, bg, feat)
    np.testing.assert_allclose(
        max_out,
        np.stack([np.asarray(feat)[:5].max(0), np.asarray(feat)[5:].max(0)]),
        rtol=1e-5,
    )


def test_hetero_graph_conv():
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("game", "played_by", "user"): (np.array([0, 1]), np.array([2, 0])),
    })
    conv = nn.HeteroGraphConv(
        {"follows": nn.GraphConv(4, norm="right"),
         "played_by": nn.GraphConv(4, norm="right")},
        aggregate="sum",
    )
    inputs = {
        "user": jnp.ones((3, 5)),
        "game": jnp.ones((2, 5)),
    }
    params = conv.init(KEY, hg, inputs)
    out = conv.apply(params, hg, inputs)
    assert out["user"].shape == (3, 4)


def test_sageconv_lstm():
    g, feat = make()
    conv = nn.SAGEConv(6, aggregator_type="lstm")
    params = conv.init(KEY, g, feat)
    out = conv.apply(params, g, feat)
    assert out.shape == (12, 6)
    assert np.all(np.isfinite(np.asarray(out)))
    # Zero-in-degree nodes aggregate to the self term only: finite.
    grads = jax.grad(
        lambda p: jnp.sum(conv.apply(p, g, feat) ** 2)
    )(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(grads))


def test_to_homo_hetero_roundtrip():
    import dgl1_tpu as dgl

    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([0, 2]), np.array([0, 1])),
    })
    g = dgl.transform.to_homogeneous(hg)
    assert g.num_nodes() == 5
    assert g.num_edges() == 4
    hg2 = dgl.transform.to_heterogeneous(g, hg.ntypes, ["follows", "plays"])
    assert hg2.num_edges("plays") == 2
    assert hg2.num_nodes("game") == 2


def test_apply_edges_subset():
    import dgl1_tpu as dgl
    from dgl1_tpu import function as fn

    g = dgl.rand_graph(10, 30, seed=3)
    g.ndata["h"] = jnp.asarray(
        np.random.default_rng(3).normal(size=(10, 4)).astype(np.float32)
    )
    eids = np.array([1, 5, 9])
    g.apply_edges(fn.u_add_v("h", "h", "s"), edges=eids)
    s = np.asarray(g.edata["s"])
    h = np.asarray(g.ndata["h"])
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    for e in eids:
        np.testing.assert_allclose(s[e], h[src[e]] + h[dst[e]], rtol=1e-6)
    np.testing.assert_allclose(s[0], 0.0)  # untouched row stays zero


def test_dense_cheb_conv():
    g, feat = make(n=10, e=40, f=6)
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    adj = np.zeros((10, 10), np.float32)
    adj[dst, src] = 1.0
    conv = nn.DenseChebConv(4, k=3)
    params = conv.init(KEY, jnp.asarray(adj), feat)
    out = conv.apply(params, jnp.asarray(adj), feat)
    assert out.shape == (10, 4)
    # k=1 reduces to a plain dense projection + bias.
    conv1 = nn.DenseChebConv(4, k=1)
    p1 = conv1.init(KEY, jnp.asarray(adj), feat)
    o1 = conv1.apply(p1, jnp.asarray(adj), feat)
    W = np.asarray(p1["params"]["W_0"]["kernel"])
    b = np.asarray(p1["params"]["bias"])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(feat) @ W + b,
                               rtol=1e-5, atol=1e-5)


def test_cfconv():
    g, feat = make(n=12, e=48, f=6)
    efeat = jnp.asarray(
        np.random.default_rng(5).normal(
            size=(g.num_edges_padded(), 3)).astype(np.float32))
    conv = nn.CFConv(hidden_feats=8, out_feats=5)
    params = conv.init(KEY, g, feat, efeat)
    out = conv.apply(params, g, feat, efeat)
    assert out.shape == (12, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_weight_and_sum():
    graphs = [dgl.rand_graph(5, 10, seed=s) for s in range(3)]
    for g in graphs:
        g.ndata["h"] = jnp.asarray(
            np.random.default_rng(1).normal(size=(5, 4)).astype(np.float32))
    bg = dgl.batch(graphs)
    mod = nn.WeightAndSum(in_feats=4)
    params = mod.init(KEY, bg, bg.ndata["h"])
    out = mod.apply(params, bg, bg.ndata["h"])
    assert out.shape == (3, 4)


def test_weight_basis():
    mod = nn.WeightBasis(shape=(4, 5), num_bases=2, num_outputs=7)
    params = mod.init(KEY)
    w = mod.apply(params)
    assert w.shape == (7, 4, 5)
    basis = np.asarray(params["params"]["weight"]).reshape(2, -1)
    coeff = np.asarray(params["params"]["w_comp"])
    np.testing.assert_allclose(
        np.asarray(w).reshape(7, -1), coeff @ basis, rtol=1e-5, atol=1e-6)


def test_knn_graph_module():
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(15, 3)).astype(np.float32))
    g = nn.KNNGraph(4)(x)
    assert g.num_nodes() == 15 and g.num_edges() == 60
    g2 = nn.SegmentedKNNGraph(3)(x, [7, 8])
    assert g2.num_edges() == 45


def test_han_model():
    from dgl1_tpu.models import HAN

    hg = dgl.heterograph({
        ("paper", "pa", "author"): ([0, 1, 2, 3], [0, 0, 1, 1]),
        ("author", "ap", "paper"): ([0, 0, 1, 1], [0, 1, 2, 3]),
    }, num_nodes_dict={"paper": 4, "author": 2})
    graphs = [dgl.metapath_reachable_graph(hg, ["pa", "ap"])]
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 6)).astype(np.float32))
    model = HAN(num_metapaths=1, hidden_feats=3, out_feats=2, num_heads=2,
                dropout=0.0)
    params = model.init(KEY, graphs, feat)
    out = model.apply(params, graphs, feat)
    assert out.shape == (4, 2)
    grads = jax.grad(
        lambda p: jnp.sum(model.apply(p, graphs, feat) ** 2))(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree.leaves(grads))


def test_set_transformer():
    g1 = dgl.rand_graph(5, 10, seed=5)
    g2 = dgl.rand_graph(7, 14, seed=6)
    bg = dgl.batch([g1, g2])
    feat = jnp.asarray(
        np.random.default_rng(9).normal(size=(12, 6)).astype(np.float32)
    )
    for block in ("sab", "isab"):
        enc = nn.SetTransformerEncoder(d_model=8, num_heads=2, d_ff=16,
                                       n_layers=2, block_type=block, m=3)
        out = check_grads(enc, bg, feat)
        assert out.shape == (12, 8)
    dec = nn.SetTransformerDecoder(d_model=8, num_heads=2, d_ff=16,
                                   n_layers=1, k=2)
    out = check_grads(dec, bg, feat)
    assert out.shape == (2, 16)

    # Graph separation: nodes of graph 2 must not influence graph 1's
    # readout. Perturb a graph-2 node feature, graph-1 row unchanged.
    params = dec.init(KEY, bg, feat)
    base = dec.apply(params, bg, feat)
    feat2 = feat.at[8].add(10.0)
    pert = dec.apply(params, bg, feat2)
    np.testing.assert_allclose(base[0], pert[0], rtol=1e-6)
    assert np.abs(np.asarray(pert[1] - base[1])).max() > 1e-4

    # Permutation invariance of the decoder within a graph.
    perm = np.array([3, 1, 4, 0, 2], np.int64)
    g1p_src = perm[np.asarray(g1.src)[: g1.num_edges()]]
    g1p_dst = perm[np.asarray(g1.dst)[: g1.num_edges()]]
    g1p = dgl.graph((g1p_src, g1p_dst), num_nodes=5)
    bgp = dgl.batch([g1p, g2])
    inv = np.argsort(perm)
    featp = jnp.concatenate([feat[:5][inv], feat[5:]], axis=0)
    outp = dec.apply(params, bgp, featp)
    np.testing.assert_allclose(outp, base, rtol=1e-4, atol=1e-5)


def test_sequential():
    g, feat = make()
    seq = nn.Sequential([
        nn.GraphConv(8),
        fnn.relu,
        nn.GraphConv(4),
    ])
    out = check_grads(seq, g, feat)
    assert out.shape == (12, 4)


def test_atomic_conv():
    g = dgl.rand_graph(10, 30, seed=9)
    z = jnp.asarray(
        np.random.default_rng(3).choice([1.0, 6.0, 8.0], size=(10, 1))
    )
    dist = jnp.asarray(
        np.random.default_rng(4).uniform(0.5, 4.0, size=(30, 1)).astype(
            np.float32))
    conv = nn.AtomicConv(
        interaction_cutoffs=(3.0, 3.0),
        rbf_kernel_means=(1.0, 2.0),
        rbf_kernel_scaling=(1.0, 1.0),
        features_to_use=(1.0, 6.0, 8.0),
    )
    params = conv.init(KEY, g, z, dist)
    out = conv.apply(params, g, z, dist)
    assert out.shape == (10, 6)  # 3 types x 2 filters
    # Oracle: dense accumulation.
    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    dn = np.asarray(dist)[:, 0]
    ref = np.zeros((10, 3, 2))
    for t_i, t in enumerate([1.0, 6.0, 8.0]):
        for k in range(2):
            mu, beta, cut = [1.0, 2.0][k], 1.0, 3.0
            for ei in range(e):
                rbf = np.exp(-beta * (dn[ei] - mu) ** 2)
                env = 0.5 * (np.cos(np.pi * dn[ei] / cut) + 1)
                val = rbf * env * (dn[ei] <= cut)
                if abs(float(np.asarray(z)[src[ei], 0]) - t) < 1e-6:
                    ref[dst[ei], t_i, k] += val
    np.testing.assert_allclose(out, ref.reshape(10, 6), rtol=1e-4,
                               atol=1e-5)
