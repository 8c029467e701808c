"""Graph structure tests (parity role: ``tests/compute/test_graph.py`` /
``test_heterograph.py``): construction, format consistency, degrees,
reversal, padding invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl


def test_construction_and_formats():
    src = np.array([0, 1, 2, 2, 3])
    dst = np.array([1, 2, 3, 3, 0])
    g = dgl.graph((src, dst), num_nodes=5)
    assert g.num_nodes() == 5
    assert g.num_edges() == 5
    # CSR: edges grouped by src, edge ids preserved within groups.
    indptr = np.asarray(g.csr_indptr)
    np.testing.assert_array_equal(indptr, [0, 1, 2, 4, 5, 5])
    np.testing.assert_array_equal(np.asarray(g.csr_dst), [1, 2, 3, 3, 0])
    # CSC: grouped by dst.
    indptr_c = np.asarray(g.csc_indptr)
    np.testing.assert_array_equal(indptr_c, [0, 1, 2, 3, 5, 5])
    # COO round-trip through csr_eid.
    np.testing.assert_array_equal(
        np.asarray(g.src)[np.asarray(g.csr_eid)], np.asarray(g.csr_src)
    )
    np.testing.assert_array_equal(
        np.asarray(g.dst)[np.asarray(g.csc_eid)], np.asarray(g.csc_dst)
    )


def test_degrees():
    g = dgl.rand_graph(20, 100, seed=3)
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    np.testing.assert_array_equal(
        np.asarray(g.out_degrees()), np.bincount(src, minlength=20)
    )
    np.testing.assert_array_equal(
        np.asarray(g.in_degrees()), np.bincount(dst, minlength=20)
    )


def test_reverse_is_free_and_correct():
    g = dgl.rand_graph(10, 40, seed=1)
    r = g.reverse()
    np.testing.assert_array_equal(np.asarray(r.src), np.asarray(g.dst))
    np.testing.assert_array_equal(np.asarray(r.dst), np.asarray(g.src))
    np.testing.assert_array_equal(
        np.asarray(r.in_degrees()), np.asarray(g.out_degrees())
    )
    # Structural arrays are shared (no copies).
    assert r.csr_indptr is g.csc_indptr


def test_padding_sentinels():
    g = dgl.graph((np.array([0, 1]), np.array([1, 0])), num_nodes=2,
                  pad_edges_to=8)
    assert g.num_edges() == 2
    assert g.num_edges_padded() == 8
    assert np.asarray(g.edge_mask).sum() == 2
    # Padded COO endpoints hold the sentinel (== num_nodes).
    assert np.all(np.asarray(g.src)[2:] == 2)
    assert np.all(np.asarray(g.csc_dst)[2:] == 2)


def test_graph_is_pytree():
    g = dgl.rand_graph(6, 12, seed=0)
    g.ndata["h"] = jnp.ones((6, 3))
    leaves = jax.tree.leaves(g)
    assert any(l.shape == (6, 3) for l in leaves)

    @jax.jit
    def f(graph):
        return dgl.ops.copy_u_sum(graph, graph.ndata["h"])

    out = f(g)
    np.testing.assert_allclose(
        out, np.asarray(dgl.ops.copy_u_sum(g, g.ndata["h"]))
    )


def test_formats_restriction():
    g = dgl.rand_graph(30, 120, seed=3)
    rep = g.formats()
    assert {"coo", "csr", "csc"} <= set(rep["created"])

    g2 = g.formats("csc")
    assert g2.formats()["created"] == ["coo", "csr", "csc"]
    assert g2.ell_dst is None and g2.tdst is None and g2.hub_dst is None
    # Engines decline; dispatch falls back to the XLA oracle with the
    # same values.
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(30, 4)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dgl.ops.copy_u_sum(g2, x)),
        np.asarray(dgl.ops.copy_u_sum(g, x)), rtol=1e-5, atol=1e-5)

    # Restriction at construction.
    g3 = dgl.rand_graph(30, 120, seed=3, formats=("csc", "ell"))
    assert g3.ell_dst is not None and g3.tdst is None


def test_zero_edge_graph():
    g = dgl.graph((np.array([], np.int64), np.array([], np.int64)),
                  num_nodes=4)
    out = dgl.ops.copy_u_sum(g, jnp.ones((4, 2)))
    np.testing.assert_allclose(out, 0.0)


def test_heterograph_basics():
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([0, 2]), np.array([0, 1])),
    })
    assert hg.num_nodes("user") == 3
    assert hg.num_nodes("game") == 2
    assert hg.num_edges("plays") == 2
    assert hg.to_canonical_etype("plays") == ("user", "plays", "game")

    hg.nodes_data("user")["h"] = jnp.ones((3, 4))
    out = hg.update_all(
        dgl.function.copy_u("h", "m"), dgl.function.sum("m", "agg"),
        etype="plays",
    )
    agg = hg.nodes_data("game")["agg"]
    np.testing.assert_allclose(np.asarray(agg), [[1, 1, 1, 1], [1, 1, 1, 1]])


def test_heterograph_facade_methods():
    """apply_nodes / metagraph / degrees / src-dst types / local_scope
    (parity: DGLHeteroGraph surface beyond message passing)."""
    hg = dgl.heterograph({
        ("user", "follows", "user"): (np.array([0, 1]), np.array([1, 2])),
        ("user", "plays", "game"): (np.array([0, 2]), np.array([0, 1])),
    })
    assert hg.srctypes == ["user"]
    assert sorted(hg.dsttypes) == ["game", "user"]
    assert hg.num_src_nodes("user") == 3
    deg = np.asarray(hg.in_degrees(etype="plays"))
    np.testing.assert_array_equal(deg[:2], [1, 1])
    assert int(hg.out_degrees(0, etype="follows")) == 1

    mg = hg.metagraph()
    assert set(mg.nodes) == {"user", "game"}
    assert mg.has_edge("user", "game")

    hg.nodes["user"].data["h"] = jnp.ones((3, 2))
    hg.apply_nodes(lambda nb: {"h2": nb.data["h"] * 2}, ntype="user")
    np.testing.assert_allclose(np.asarray(hg.nodes["user"].data["h2"]), 2.0)

    with hg.local_scope():
        hg.nodes["user"].data["tmp"] = jnp.zeros((3, 1))
        assert "tmp" in hg.nodes["user"].data
    assert "tmp" not in hg.nodes["user"].data
    assert "h" in hg.nodes["user"].data


def test_batch_unbatch():
    g1 = dgl.rand_graph(4, 6, seed=1)
    g2 = dgl.rand_graph(3, 5, seed=2)
    g1.ndata["h"] = jnp.ones((4, 2))
    g2.ndata["h"] = 2 * jnp.ones((3, 2))
    bg = dgl.batch([g1, g2])
    assert bg.num_nodes() == 7
    assert bg.num_edges() == 11
    gs = dgl.unbatch(bg)
    assert [g.num_nodes() for g in gs] == [4, 3]
    np.testing.assert_array_equal(np.asarray(gs[1].src),
                                  np.asarray(g2.src))
    np.testing.assert_allclose(np.asarray(gs[1].ndata["h"]), 2.0)


def test_multi_update_all_cross_reducers():
    hg = dgl.heterograph({
        ("a", "r1", "c"): (np.array([0, 1]), np.array([0, 0])),
        ("b", "r2", "c"): (np.array([0]), np.array([0])),
    })
    dgl_fn = dgl.function
    hg.nodes_data("a")["h"] = jnp.asarray([[1.0], [3.0]])
    hg.nodes_data("b")["h"] = jnp.asarray([[10.0]])
    for reducer, expect in [("sum", 14.0), ("max", 10.0), ("min", 4.0),
                            ("mean", 7.0)]:
        hg.multi_update_all(
            {"r1": (dgl_fn.copy_u("h", "m"), dgl_fn.sum("m", "o")),
             "r2": (dgl_fn.copy_u("h", "m"), dgl_fn.sum("m", "o"))},
            reducer,
        )
        assert float(hg.nodes_data("c")["o"][0, 0]) == expect
    hg.multi_update_all(
        {"r1": (dgl_fn.copy_u("h", "m"), dgl_fn.sum("m", "o")),
         "r2": (dgl_fn.copy_u("h", "m"), dgl_fn.sum("m", "o"))},
        "stack",
    )
    assert hg.nodes_data("c")["o"].shape == (1, 2, 1)


def test_networkx_roundtrip():
    import networkx as nx

    nxg = nx.karate_club_graph()
    g = dgl.from_networkx(nxg)
    assert g.num_nodes() == 34
    assert g.num_edges() == 2 * nxg.number_of_edges()
    back = dgl.to_networkx(g)
    assert back.number_of_nodes() == 34
    assert back.number_of_edges() == g.num_edges()
    # Attributes survive.
    g.ndata["h"] = jnp.arange(34.0)[:, None]
    b2 = dgl.to_networkx(g, node_attrs=["h"])
    assert float(b2.nodes[7]["h"][0]) == 7.0
    # Directed input keeps directions as-is.
    d = nx.DiGraph([(0, 1), (1, 2)])
    gd = dgl.from_networkx(d)
    assert gd.num_edges() == 2


def test_edge_ids_and_has_edges_between():
    g = dgl.graph(([0, 0, 1, 2, 0], [1, 2, 2, 0, 1]), num_nodes=3)
    assert int(g.edge_ids(0, 2)) == 1
    assert bool(g.has_edges_between(0, 1))
    assert not bool(g.has_edges_between(1, 0))
    np.testing.assert_array_equal(
        g.has_edges_between([0, 1, 2], [1, 0, 0]), [True, False, True])
    # Parallel edges (0->1 twice): return_uv enumerates both.
    u, v, e = g.edge_ids([0], [1], return_uv=True)
    assert len(e) == 2 and set(e.tolist()) == {0, 4}
    with pytest.raises(KeyError):
        g.edge_ids(1, 0)


def test_adjacency_matrix():
    g = dgl.graph(([0, 1, 1], [1, 2, 2]), num_nodes=3)
    import scipy.sparse as sp

    A = g.adjacency_matrix(scipy_fmt="csr")
    assert isinstance(A, sp.csr_matrix)
    # SpMM orientation: A[dst, src].
    assert A[1, 0] == 1 and A[2, 1] == 2 and A[0, 1] == 0
    At = g.adjacency_matrix(transpose=True, scipy_fmt="coo")
    assert At.shape == (3, 3) and At.tocsr()[0, 1] == 1  # At[src, dst]
    dense = np.asarray(g.adjacency_matrix())
    assert dense[2, 1] == 2


def test_select_topk_out_edges():
    from dgl1_tpu.sampling.neighbor import select_topk

    g = dgl.graph(([0, 0, 0, 1], [1, 2, 0, 2]), num_nodes=3)
    import jax.numpy as jnp

    g.edata["w"] = jnp.asarray(np.asarray([3.0, 1.0, 2.0, 5.0]))
    sub = select_topk(g, 2, "w", edge_dir="out")
    eids = set(np.asarray(sub.edata["_ID"]).tolist())
    # node 0 keeps its top-2 out-edges by weight (w=3,2), node 1 keeps its
    # single out-edge.
    assert eids == {0, 2, 3}


def test_misc_facade_queries():
    g = dgl.graph((np.array([0, 0, 1, 2]), np.array([1, 2, 2, 0])),
                  num_nodes=3)
    np.testing.assert_array_equal(np.asarray(g.nodes()), [0, 1, 2])
    assert g.number_of_edges() == 4
    assert g.ntypes == ["_N"] and g.etypes == ["_E"]
    assert g.is_homogeneous
    np.testing.assert_array_equal(g.successors(0), [1, 2])
    np.testing.assert_array_equal(np.sort(g.predecessors(2)), [0, 1])
    s, d = g.find_edges([1, 3])
    np.testing.assert_array_equal(np.asarray(s), [0, 2])
    np.testing.assert_array_equal(np.asarray(d), [2, 0])
    u, v, e = g.in_edges([2], form="all")
    np.testing.assert_array_equal(np.sort(u), [0, 1])
    np.testing.assert_array_equal(v, [2, 2])
    assert set(e.tolist()) == {1, 2}
    u, v = g.out_edges([0])
    np.testing.assert_array_equal(u, [0, 0])
    np.testing.assert_array_equal(np.sort(v), [1, 2])
    np.testing.assert_array_equal(np.sort(g.out_edges([0], form="eid")),
                                  [0, 1])
    sub = g.subgraph([0, 2])
    assert sub.num_nodes() == 2
    g2 = g.to(None)  # device placement round-trip (CPU tests)
    assert g2.num_edges() == g.num_edges()
