"""Coverage for smaller public APIs: traversal, datasets, constructors,
walks, GMMConv, DistNodeDataLoader (parity role: the long tail of the
reference's compute tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl


def test_from_scipy_and_rand_bipartite():
    import scipy.sparse as sp

    m = sp.random(10, 10, density=0.2, random_state=0, format="coo")
    g = dgl.from_scipy(m)
    assert g.num_nodes() == 10
    assert g.num_edges() == m.nnz

    b = dgl.rand_bipartite(5, 8, 20, seed=1)
    assert b.is_block
    assert b.num_src_nodes() == 5
    assert b.num_dst_nodes() == 8


def test_bfs_and_topological():
    # 0 -> 1 -> 2, 0 -> 3
    g = dgl.graph((np.array([0, 1, 0]), np.array([1, 2, 3])), num_nodes=4)
    levels = dgl.bfs_nodes_generator(g, 0)
    assert [sorted(l.tolist()) for l in levels] == [[0], [1, 3], [2]]
    topo = dgl.topological_nodes_generator(g)
    assert sorted(topo[0].tolist()) == [0]
    edges = dgl.bfs_edges_generator(g, 0)
    assert len(edges) == 2

    # Cycle -> topological must raise.
    gc = dgl.graph((np.array([0, 1]), np.array([1, 0])), num_nodes=2)
    with pytest.raises(ValueError):
        dgl.topological_nodes_generator(gc)


def test_node2vec_walk():
    g = dgl.to_bidirected(
        dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 3])), num_nodes=4)
    )
    traces = dgl.sampling.node2vec_random_walk(
        g, [0, 1], p=0.5, q=2.0, walk_length=5,
        rng=np.random.default_rng(0),
    )
    assert traces.shape == (2, 6)
    assert (traces >= 0).all()


def test_minigc_and_tu_batching():
    ds = dgl.data.MiniGCDataset(16, 8, 12, seed=1)
    graphs = [ds[i][0] for i in range(8)]
    bg = dgl.batch(graphs)
    assert bg.num_nodes() == sum(g.num_nodes() for g in graphs)

    tu = dgl.data.TUDataset("MUTAG")
    g, y = tu[0]
    assert 0 <= y < tu.num_classes
    assert "node_attr" in g.ndata


def test_ppi_multilabel_shapes():
    ds = dgl.data.PPIDataset("test", scale=8)
    g = ds[0]
    assert np.asarray(g.ndata["label"]).shape[1] == 121
    assert np.asarray(g.ndata["feat"]).shape[1] == 50


def test_gmmconv():
    from dgl1_tpu import nn

    g = dgl.rand_graph(12, 40, seed=2)
    feat = jnp.asarray(
        np.random.default_rng(2).normal(size=(12, 5)).astype(np.float32)
    )
    pseudo = jnp.asarray(
        np.random.default_rng(3).normal(size=(40, 2)).astype(np.float32)
    )
    conv = nn.GMMConv(5, 7, dim=2, n_kernels=3)
    params = conv.init(jax.random.PRNGKey(0), g, feat, pseudo)
    out = conv.apply(params, g, feat, pseudo)
    assert out.shape == (12, 7)
    grads = jax.grad(
        lambda p: float(0) + jnp.sum(conv.apply(p, g, feat, pseudo) ** 2)
    )(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(grads))


def test_dist_node_dataloader():
    from dgl1_tpu.dataloading import NeighborSampler
    from dgl1_tpu.parallel import DistGraph, DistNodeDataLoader

    g = dgl.rand_graph(60, 400, seed=3)
    g.ndata["feat"] = jnp.asarray(
        np.random.default_rng(3).normal(size=(60, 5)).astype(np.float32)
    )
    dg = DistGraph(g, 4, part_method="random")
    # DistTensor round-trip must agree with the original features.
    ids = np.array([0, 17, 59])
    np.testing.assert_allclose(
        dg.ndata["feat"][ids], np.asarray(g.ndata["feat"])[ids]
    )
    dl = DistNodeDataLoader(dg, np.arange(32), NeighborSampler([3]),
                            batch_size=16, seed=0)
    count = 0
    for inp, out, blocks, mask, x in dl:
        assert x.shape[0] == len(inp)
        count += 1
    assert count == 2


def test_save_load_block(tmp_path):
    b = dgl.rand_bipartite(4, 6, 12, seed=5)
    b.srcdata["h"] = jnp.ones((4, 2))
    path = str(tmp_path / "blk.npz")
    dgl.data.save_graphs(path, [b])
    loaded, _ = dgl.data.load_graphs(path)
    assert loaded[0].is_block
    assert loaded[0].num_src_nodes() == 4
    np.testing.assert_allclose(np.asarray(loaded[0].srcdata["h"]), 1.0)


def test_checkpoint_roundtrip(tmp_path):
    from dgl1_tpu.utils import load_checkpoint, save_checkpoint

    tree = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, tree, step=7)
    restored, step = load_checkpoint(path, tree)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(tree["w"]))


def test_hetero_type_subgraphs():
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([0, 2], [0, 1]),
        ("dev", "makes", "game"): ([0], [1]),
    })
    hg.nodes_data("user")["h"] = jnp.ones((3, 2))
    sub = dgl.node_type_subgraph(hg, ["user", "game"])
    assert set(sub.ntypes) == {"user", "game"}
    assert sub.canonical_etypes == [("user", "follows", "user"),
                                    ("user", "plays", "game")]
    assert sub.nodes_data("user")["h"].shape == (3, 2)
    sub2 = dgl.edge_type_subgraph(hg, ["plays"])
    assert set(sub2.ntypes) == {"user", "game"}
    assert sub2.num_edges() == 2
    with pytest.raises(KeyError):
        dgl.node_type_subgraph(hg, ["nope"])


def test_hetero_apply_edges():
    from dgl1_tpu import function as fn

    hg = dgl.heterograph({("u", "r", "v"): ([0, 1, 1], [0, 0, 1])})
    hg.nodes_data("u")["h"] = jnp.asarray([[1.0], [2.0]])
    hg.nodes_data("v")["h"] = jnp.asarray([[10.0], [20.0]])
    out = hg.apply_edges(fn.u_add_v("h", "h", "e"), etype="r")
    np.testing.assert_allclose(np.asarray(out).ravel(),
                               [11.0, 12.0, 22.0])


def test_global_seed_determinism():
    from dgl1_tpu.sampling import sample_neighbors

    g = dgl.rand_graph(50, 400, seed=1)
    dgl.seed(42)
    f1 = sample_neighbors(g, np.arange(20), 3)
    dgl.seed(42)
    f2 = sample_neighbors(g, np.arange(20), 3)
    np.testing.assert_array_equal(np.asarray(f1.edges()[0]),
                                  np.asarray(f2.edges()[0]))


def test_top_level_serialize_alias(tmp_path):
    g = dgl.rand_graph(8, 20, seed=2)
    path = str(tmp_path / "g.npz")
    dgl.save_graphs(path, [g])
    loaded, _ = dgl.load_graphs(path)
    assert loaded[0].num_edges() == 20
    assert dgl.DGLGraph is dgl.Graph


def test_save_load_heterograph(tmp_path):
    rng = np.random.default_rng(0)
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([0, 2, 1]),
                                    np.array([0, 1, 0])),
    }, num_nodes_dict={"user": 3, "game": 2})
    hg.nodes["user"].data["h"] = jnp.asarray(
        rng.normal(size=(3, 4)).astype("float32"))
    hg.edges["plays"].data["w"] = jnp.asarray([1.0, 2.0, 3.0])
    path = str(tmp_path / "hg.npz")
    dgl.save_graphs(path, [hg])
    loaded, _ = dgl.load_graphs(path)
    h2 = loaded[0]
    assert set(h2.canonical_etypes) == set(hg.canonical_etypes)
    assert h2.num_nodes("user") == 3 and h2.num_nodes("game") == 2
    c = ("user", "plays", "game")
    e = h2.rel_graphs[c].num_edges()
    np.testing.assert_array_equal(
        np.asarray(h2.rel_graphs[c].src)[:e], [0, 2, 1])
    np.testing.assert_allclose(
        np.asarray(h2.edges["plays"].data["w"]), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(h2.nodes["user"].data["h"]),
                               np.asarray(hg.nodes["user"].data["h"]))


def test_hetero_multitype_data_views():
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0]), np.array([1])),
        ("user", "plays", "game"): (np.array([0]), np.array([0])),
    }, num_nodes_dict={"user": 2, "game": 1})
    hg.ndata["h"] = {"user": jnp.ones((2, 3)), "game": jnp.zeros((1, 3))}
    got = hg.ndata["h"]
    assert set(got) == {"user", "game"}
    np.testing.assert_allclose(np.asarray(got["user"]), 1.0)
    # Partial keys: only types carrying the key appear.
    hg.nodes["game"].data["g_only"] = jnp.ones((1,))
    assert set(hg.ndata["g_only"]) == {"game"}
    assert "h" in hg.ndata and "missing" not in hg.ndata
    hg.edata["w"] = {("user", "plays", "game"): jnp.ones((1,))}
    assert set(hg.edata["w"]) == {("user", "plays", "game")}
    del hg.ndata["h"]
    assert "h" not in hg.ndata


def test_batch_unbatch_heterograph():
    h1 = dgl.heterograph({
        ("u", "r", "v"): (np.array([0, 1]), np.array([0, 0])),
        ("v", "s", "u"): (np.array([0]), np.array([1])),
    }, num_nodes_dict={"u": 2, "v": 1})
    h2 = dgl.heterograph({
        ("u", "r", "v"): (np.array([2]), np.array([1])),
        ("v", "s", "u"): (np.array([0, 1]), np.array([0, 2])),
    }, num_nodes_dict={"u": 3, "v": 2})
    h1.nodes["u"].data["h"] = jnp.ones((2, 3))
    h2.nodes["u"].data["h"] = 2.0 * jnp.ones((3, 3))
    h1.edges["r"].data["w"] = jnp.asarray([1.0, 2.0])
    h2.edges["r"].data["w"] = jnp.asarray([3.0])
    bg = dgl.batch([h1, h2])
    assert bg.num_nodes("u") == 5 and bg.num_nodes("v") == 3
    np.testing.assert_array_equal(
        np.asarray(dgl.batch_num_nodes(bg, "u")), [2, 3])
    np.testing.assert_array_equal(
        np.asarray(dgl.batch_num_edges(bg, "r")), [2, 1])
    rel = bg.rel_graphs[("u", "r", "v")]
    e = rel.num_edges()
    # Second graph's edge offset: u by 2, v by 1.
    np.testing.assert_array_equal(np.asarray(rel.src)[:e], [0, 1, 4])
    np.testing.assert_array_equal(np.asarray(rel.dst)[:e], [0, 0, 2])
    np.testing.assert_allclose(np.asarray(bg.edges["r"].data["w"]),
                               [1.0, 2.0, 3.0])
    parts = dgl.unbatch(bg)
    assert len(parts) == 2
    assert parts[1].num_nodes("u") == 3
    r2 = parts[1].rel_graphs[("u", "r", "v")]
    np.testing.assert_array_equal(
        np.asarray(r2.src)[: r2.num_edges()], [2])
    np.testing.assert_allclose(
        np.asarray(parts[0].nodes["u"].data["h"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(parts[1].nodes["u"].data["h"]), 2.0)


def test_incidence_matrix():
    # 0->1, 1->2, 2->2 (self-loop)
    g = dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 2])), num_nodes=3)
    m_in = np.asarray(g.incidence_matrix("in"))
    np.testing.assert_allclose(
        m_in, [[0, 0, 0], [1, 0, 0], [0, 1, 1]])
    m_out = np.asarray(g.incidence_matrix("out"))
    np.testing.assert_allclose(
        m_out, [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    m_both = np.asarray(g.incidence_matrix("both"))
    # Self-loop column is all zero; non-loops: -1 at src, +1 at dst.
    np.testing.assert_allclose(
        m_both, [[-1, 0, 0], [1, -1, 0], [0, 1, 0]])
    sp_m = g.incidence_matrix("in", scipy_fmt="csr")
    assert sp_m.shape == (3, 3) and sp_m.nnz == 3
    assert np.asarray(g.inc("out")).shape == (3, 3)


def test_merge_zero_fills_missing_data():
    g1 = dgl.graph((np.array([0]), np.array([1])), num_nodes=2)
    g2 = dgl.graph((np.array([1]), np.array([0])), num_nodes=3)
    g1.edata["w"] = jnp.asarray([[1.0, 2.0]])
    g2.edata["v"] = jnp.asarray([7.0])
    g1.ndata["h"] = jnp.ones((2, 4))  # short: zero-filled to 3 rows
    merged = dgl.merge([g1, g2])
    e = merged.num_edges()
    assert e == 2
    # g2 lacks 'w' -> zero rows for its edges (not a dropped key).
    np.testing.assert_allclose(
        np.asarray(merged.edata["w"])[:e], [[1.0, 2.0], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(merged.edata["v"])[:e],
                               [0.0, 7.0])
    np.testing.assert_allclose(np.asarray(merged.ndata["h"]),
                               [[1] * 4, [1] * 4, [0] * 4])


def test_gin_raw_sparse_tag_remap(tmp_path):
    from dgl1_tpu.data.ppi_tu import load_gin_raw

    # Tags {0, 7, 9}: contiguous remap -> dim 3, not 10.
    txt = "2\n3 0\n0 1 1\n7 1 2\n9 1 0\n2 1\n7 1 1\n7 1 0\n"
    p = tmp_path / "TOY.txt"
    p.write_text(txt)
    graphs, labels, dim = load_gin_raw(p, degree_as_nlabel=False)
    assert dim == 3
    np.testing.assert_array_equal(np.asarray(graphs[0].ndata["label"]),
                                  [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(graphs[1].ndata["label"]),
                                  [1, 1])
    attr = np.asarray(graphs[0].ndata["attr"])
    assert attr.shape == (3, 3)
    np.testing.assert_allclose(attr.sum(1), 1.0)


def test_sst_vocab_shared_across_splits(tmp_path):
    from dgl1_tpu.data.sst import SSTDataset

    (tmp_path / "train.txt").write_text(
        "(3 (2 alpha) (4 beta))\n(1 (2 gamma) (0 alpha))\n")
    # 'delta' is OOV under the shared train vocab -> folds to id 0.
    (tmp_path / "test.txt").write_text("(4 (3 beta) (2 delta))\n")
    tr = SSTDataset("train", raw_dir=tmp_path)
    te = SSTDataset("test", raw_dir=tmp_path)
    assert not tr.is_synthetic and not te.is_synthetic
    assert te.vocab_size == tr.vocab_size == 3
    xs = np.asarray(te.trees[0].ndata["x"])
    mask = np.asarray(te.trees[0].ndata["mask"])
    leaf_ids = xs[mask > 0]
    assert set(leaf_ids.tolist()) <= set(range(tr.vocab_size))
    assert tr.vocab["beta"] in leaf_ids  # shared id, not per-split
    # Explicit vocab threading matches the auto-shared path.
    te2 = SSTDataset("test", raw_dir=tmp_path, vocab=tr._vocab)
    np.testing.assert_array_equal(
        np.asarray(te2.trees[0].ndata["x"]), xs)


def test_dist_graph_part_method_and_global_num_edges(tmp_path):
    from dgl1_tpu.parallel import DistGraph
    from dgl1_tpu.parallel.hetero import partition_hetero_graph

    hg = dgl.heterograph({
        ("u", "r", "v"): (np.arange(8) % 4, (np.arange(8) * 3) % 6),
        ("v", "s", "u"): (np.arange(6) % 6, np.arange(6) % 4),
    }, num_nodes_dict={"u": 4, "v": 6})
    partition_hetero_graph(hg, "toy", 2, str(tmp_path))
    view = DistGraph.from_hetero_partition(str(tmp_path), "toy", 0)
    # Global scope for BOTH facade counters (ADVICE r3).
    assert view.num_nodes() == 10
    assert view.num_edges() == 14
    assert view.num_edges("r") == 8
    assert view.num_edges(("v", "s", "u")) == 6

    # Explicit 'greedy' on a heterograph is honored (sentinel default).
    d1 = DistGraph(hg, 2, part_method="greedy")
    assert set(d1.part.keys()) == {"u", "v"}


def test_facade_crumbs_sweep_round4():
    """DGL 0.5 method-list sweep (VERDICT r3 #9): the remaining
    single-method crumbs on both facades."""
    g = dgl.graph((np.array([0, 1, 0]), np.array([1, 2, 1])), num_nodes=3)
    assert g.has_nodes(2) and not g.has_nodes(3)
    np.testing.assert_array_equal(g.has_nodes([0, 5]), [True, False])
    assert g.is_multigraph()  # (0, 1) twice
    g_simple = dgl.graph((np.array([0]), np.array([1])), num_nodes=2)
    assert not g_simple.is_multigraph()
    c = g.clone()
    c.ndata["h"] = jnp.ones((3, 2))
    assert "h" not in g.ndata
    assert g.long() is g and g.create_formats_() is g
    g.ndata["x"] = jnp.ones((3, 4))
    assert g.node_attr_schemes()["x"][0] == (4,)
    assert g.number_of_src_nodes() == 3
    np.testing.assert_array_equal(np.asarray(g.dstnodes()), [0, 1, 2])
    assert g.local_var().num_nodes() == 3

    hg = dgl.heterograph({
        ("u", "r", "v"): (np.array([0, 0]), np.array([1, 1])),
    }, num_nodes_dict={"u": 2, "v": 3})
    assert hg.get_ntype_id("u") == hg.ntypes.index("u")
    assert hg.get_etype_id("r") == 0
    assert hg.has_nodes(1, "v") and not hg.has_nodes(3, "v")
    assert hg.is_multigraph()
    hc = hg.clone()
    hc.nodes["u"].data["h"] = jnp.ones((2, 2))
    assert "h" not in hg.nframes.get("u", {})
    assert hg.long() is hg
    assert hg.node_attr_schemes("u") == {}
