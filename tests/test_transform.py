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
