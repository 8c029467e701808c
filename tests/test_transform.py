"""Transform tests (parity role: ``tests/compute/test_transform.py`` /
``test_subgraph.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl


def test_add_remove_self_loop():
    g = dgl.graph((np.array([0, 1]), np.array([1, 2])), num_nodes=3)
    g2 = dgl.add_self_loop(g)
    assert g2.num_edges() == 5
    g3 = dgl.remove_self_loop(g2)
    assert g3.num_edges() == 2


def test_to_bidirected():
    g = dgl.graph((np.array([0, 0, 1]), np.array([1, 1, 2])), num_nodes=3)
    b = dgl.to_bidirected(g)
    edges = set(zip(np.asarray(b.src)[:b.num_edges()].tolist(),
                    np.asarray(b.dst)[:b.num_edges()].tolist()))
    assert edges == {(0, 1), (1, 0), (1, 2), (2, 1)}


def test_add_reverse_edges():
    g = dgl.graph((np.array([0, 0, 1]), np.array([1, 1, 2])), num_nodes=3)
    g.ndata["h"] = jnp.arange(3.0)[:, None]
    g.edata["w"] = jnp.asarray([1.0, 2.0, 3.0])
    r = dgl.add_reverse_edges(g, copy_edata=True)
    assert r.num_edges() == 6  # no dedup, originals first
    src = np.asarray(r.src)[: r.num_edges()]
    dst = np.asarray(r.dst)[: r.num_edges()]
    np.testing.assert_array_equal(src, [0, 0, 1, 1, 1, 2])
    np.testing.assert_array_equal(dst, [1, 1, 2, 0, 0, 1])
    np.testing.assert_allclose(np.asarray(r.edata["w"]),
                               [1.0, 2.0, 3.0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(r.ndata["h"])[:, 0], [0, 1, 2])
    # Default: edata not copied.
    r2 = dgl.add_reverse_edges(g)
    assert "w" not in r2.edata


def test_node_subgraph():
    g = dgl.rand_graph(10, 40, seed=2)
    g.ndata["h"] = jnp.arange(10.0)[:, None]
    sub = dgl.node_subgraph(g, [2, 5, 7])
    assert sub.num_nodes() == 3
    np.testing.assert_array_equal(np.asarray(sub.ndata["_ID"]), [2, 5, 7])
    np.testing.assert_allclose(np.asarray(sub.ndata["h"])[:, 0], [2, 5, 7])
    # Every subgraph edge exists in the parent.
    src_p = np.asarray(g.src)[np.asarray(sub.edata["_ID"])]
    np.testing.assert_array_equal(
        src_p, np.asarray(sub.ndata["_ID"])[np.asarray(sub.src)[:sub.num_edges()]]
    )


def test_edge_subgraph():
    g = dgl.rand_graph(10, 40, seed=3)
    sub = dgl.edge_subgraph(g, [0, 5, 6])
    assert sub.num_edges() == 3
    parent_src = np.asarray(g.src)[[0, 5, 6]]
    np.testing.assert_array_equal(
        np.asarray(sub.ndata["_ID"])[np.asarray(sub.src)[:3]], parent_src
    )


def test_khop():
    # Path graph 0->1->2->3.
    g = dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 3])), num_nodes=4)
    g2 = dgl.khop_graph(g, 2)
    edges = set(zip(np.asarray(g2.src)[:g2.num_edges()].tolist(),
                    np.asarray(g2.dst)[:g2.num_edges()].tolist()))
    assert edges == {(0, 2), (1, 3)}


def test_line_graph():
    g = dgl.graph((np.array([0, 1, 2]), np.array([1, 2, 0])), num_nodes=3)
    lg = dgl.line_graph(g)
    assert lg.num_nodes() == 3
    edges = set(zip(np.asarray(lg.src)[:lg.num_edges()].tolist(),
                    np.asarray(lg.dst)[:lg.num_edges()].tolist()))
    assert edges == {(0, 1), (1, 2), (2, 0)}


def test_to_block_basic():
    # Frontier: edges into seeds {5, 3}: (1->5), (2->3), (3->5).
    frontier = dgl.graph(
        (np.array([1, 2, 3]), np.array([5, 3, 5])), num_nodes=6
    )
    blk = dgl.to_block(frontier, [5, 3])
    assert blk.is_block
    assert blk.num_dst_nodes() == 2
    # src ids: seeds first, then new srcs in first-seen order.
    np.testing.assert_array_equal(
        np.asarray(blk.srcdata["_ID"]), [5, 3, 1, 2]
    )
    np.testing.assert_array_equal(np.asarray(blk.dstdata["_ID"]), [5, 3])
    # Local edges: (2->0), (3->1), (1->0).
    assert set(zip(np.asarray(blk.src)[:3].tolist(),
                   np.asarray(blk.dst)[:3].tolist())) == {
        (2, 0), (3, 1), (1, 0)
    }


def test_to_block_padded():
    frontier = dgl.graph(
        (np.array([1, 2]), np.array([5, 3])), num_nodes=6
    )
    blk = dgl.to_block(frontier, [5, 3], pad_src_to=8, pad_edges_to=16)
    assert blk.num_src_nodes() == 8
    assert blk.num_edges_padded() == 16
    assert blk.meta["num_real_src"] == 4
    assert blk.meta["num_real_dst"] == 2


def test_compact_graphs():
    g = dgl.graph((np.array([0, 4]), np.array([4, 0])), num_nodes=8)
    c = dgl.compact_graphs(g)
    assert c.num_nodes() == 2
    assert c.num_edges() == 2


def test_save_load_graphs(tmp_path):
    g = dgl.rand_graph(6, 12, seed=1)
    g.ndata["h"] = jnp.ones((6, 3))
    g.edata["w"] = jnp.arange(12.0)
    path = str(tmp_path / "graphs.npz")
    dgl.data.save_graphs(path, [g], labels={"y": np.arange(6)})
    gs, labels = dgl.data.load_graphs(path)
    assert gs[0].num_nodes() == 6
    np.testing.assert_allclose(np.asarray(gs[0].ndata["h"]), 1.0)
    np.testing.assert_array_equal(np.asarray(labels["y"]), np.arange(6))


def test_mutation_ops():
    import jax.numpy as jnp

    g = dgl.rand_graph(8, 20, seed=4)
    g.ndata["h"] = jnp.arange(8.0)[:, None]
    g.edata["w"] = jnp.ones((20, 2))

    g2 = dgl.add_edges(g, [0, 1], [7, 6], data={"w": jnp.full((2, 2), 5.0)})
    assert g2.num_edges() == 22
    w = np.asarray(g2.edata["w"])
    np.testing.assert_allclose(w[:20], 1.0)
    np.testing.assert_allclose(w[20:], 5.0)
    s, d = np.asarray(g2.src)[:22], np.asarray(g2.dst)[:22]
    assert (s[20], d[20]) == (0, 7) and (s[21], d[21]) == (1, 6)

    g3 = dgl.remove_edges(g2, [0, 21])
    assert g3.num_edges() == 20
    assert np.asarray(g3.edata["w"]).shape == (20, 2)

    g4 = dgl.add_nodes(g, 3)
    assert g4.num_nodes() == 11
    assert g4.num_edges() == 20
    h = np.asarray(g4.ndata["h"])
    np.testing.assert_allclose(h[8:], 0.0)

    g5 = dgl.remove_nodes(g, [0])
    assert g5.num_nodes() == 7
    e = g5.num_edges()
    s, d = np.asarray(g5.src)[:e], np.asarray(g5.dst)[:e]
    # No edge references the removed node (old id 0 -> gone; ids shifted).
    ids = np.asarray(g5.ndata["_ID"])
    assert 0 not in ids
    # Edge endpoints valid.
    assert s.max(initial=0) < 7 and d.max(initial=0) < 7


def test_shortest_dist_and_merge_and_apply_each():
    import numpy as np

    g = dgl.graph(([0, 1, 2], [1, 2, 3]), num_nodes=5)
    d = np.asarray(dgl.shortest_dist(g))
    assert d[0, 3] == 3 and d[0, 4] == -1 and d[3, 0] == -1
    dr, paths = dgl.shortest_dist(g, root=0, return_paths=True)
    assert np.asarray(dr)[3] == 3
    assert list(np.asarray(paths)[3]) == [0, 1, 2]
    g2 = dgl.graph(([3], [4]), num_nodes=5)
    m = dgl.merge([g, g2])
    assert m.num_edges() == 4 and m.num_nodes() == 5
    assert dgl.apply_each({"a": 1}, lambda x: x + 1) == {"a": 2}


def test_reorder_graph_hub_algo():
    """node_permute_algo='hub': one-step hub-first identity relabel +
    rebuild (replaces the hub_order -> custom-reorder -> re-attach-config
    dance); identity_expand holds and aggregation stays oracle-exact,
    with non-default floors threaded through permute_config."""
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.ops.engine_xla import gspmm_xla

    g0 = powerlaw_graph(1 << 11, 8, seed=3)
    g = dgl.reorder_graph(g0, node_permute_algo="hub")
    assert g.hub_dst_meta.identity_expand
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g.num_nodes(), 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dgl.ops.gspmm(g, "copy_lhs", "sum", x, None)),
        np.asarray(gspmm_xla(g, "copy_lhs", "sum", x, None)),
        rtol=1e-4, atol=1e-4)

    src = rng.integers(0, 512, 9000)
    dst = (rng.zipf(1.7, 9000) % 512)
    g1 = dgl.graph((src, dst), num_nodes=512, hub=24, hub_dense_floor=400)
    g2 = dgl.reorder_graph(
        g1, node_permute_algo="hub",
        permute_config={"hub": 24, "hub_dense_floor": 400})
    assert g2.hub_dst_meta.identity_expand
    x2 = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dgl.ops.gspmm(g2, "copy_lhs", "sum", x2, None)),
        np.asarray(gspmm_xla(g2, "copy_lhs", "sum", x2, None)),
        rtol=1e-4, atol=1e-4)
    # ndata rides the permutation (store_ids gives the mapping back).
    assert "_ID" in g2.ndata


def test_reorder_graph_hub_algo_floor_mismatch():
    """ADVICE r4 #1: when permute_config's floors differ from the floors
    the INPUT graph was built with, the permutation must be derived from
    a layout with the CFG floors (not the input's), or the rebuild
    silently loses identity_expand. The fixed path rebuilds the source
    layout with the cfg floors; identity_expand must hold and values
    stay oracle-exact."""
    from dgl1_tpu.ops.engine_xla import gspmm_xla

    rng = np.random.default_rng(7)
    src = rng.integers(0, 512, 9000)
    dst = (rng.zipf(1.7, 9000) % 512)
    # Input graph: DEFAULT floors. Reorder: explicit non-default floors.
    g1 = dgl.graph((src, dst), num_nodes=512)
    g2 = dgl.reorder_graph(
        g1, node_permute_algo="hub",
        permute_config={"hub": 24, "hub_dense_floor": 400})
    assert g2.hub_dst_meta.identity_expand
    x2 = jnp.asarray(rng.normal(size=(512, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dgl.ops.gspmm(g2, "copy_lhs", "sum", x2, None)),
        np.asarray(gspmm_xla(g2, "copy_lhs", "sum", x2, None)),
        rtol=1e-4, atol=1e-4)
