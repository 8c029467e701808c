"""Batch readout API (parity: ``python/dgl/readout.py`` tests in
``tests/compute/test_readout.py``) and the kNN / metapath / subgraph
transforms added alongside it."""

import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl


def _batched(seed=0):
    rng = np.random.default_rng(seed)
    graphs = []
    for n, e in [(5, 12), (3, 4), (7, 20)]:
        g = dgl.rand_graph(n, e, seed=int(rng.integers(1 << 30)))
        g.ndata["h"] = jnp.asarray(
            rng.normal(size=(n, 4)).astype(np.float32))
        g.ndata["w"] = jnp.asarray(rng.random(n).astype(np.float32))
        g.edata["e"] = jnp.asarray(
            rng.normal(size=(g.num_edges(), 3)).astype(np.float32))
        graphs.append(g)
    return graphs, dgl.batch(graphs)


@pytest.mark.parametrize("op", ["sum", "mean", "max"])
def test_readout_nodes_ops(op):
    graphs, bg = _batched()
    got = np.asarray(dgl.readout_nodes(bg, "h", op=op))
    for i, g in enumerate(graphs):
        h = np.asarray(g.ndata["h"])
        ref = {"sum": h.sum(0), "mean": h.mean(0), "max": h.max(0)}[op]
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-5)


def test_weighted_sum_nodes_and_edges():
    graphs, bg = _batched()
    got = np.asarray(dgl.sum_nodes(bg, "h", "w"))
    for i, g in enumerate(graphs):
        ref = (np.asarray(g.ndata["h"])
               * np.asarray(g.ndata["w"])[:, None]).sum(0)
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-5)
    got_e = np.asarray(dgl.mean_edges(bg, "e"))
    for i, g in enumerate(graphs):
        np.testing.assert_allclose(
            got_e[i], np.asarray(g.edata["e"]).mean(0), rtol=1e-5, atol=1e-5)


def test_softmax_and_broadcast_nodes():
    graphs, bg = _batched()
    sm = np.asarray(dgl.softmax_nodes(bg, "h"))
    off = 0
    for g in graphs:
        n = g.num_nodes()
        h = np.asarray(g.ndata["h"])
        ex = np.exp(h - h.max(0))
        np.testing.assert_allclose(sm[off:off + n], ex / ex.sum(0),
                                   rtol=1e-5, atol=1e-5)
        off += n
    gf = np.arange(3 * 2, dtype=np.float32).reshape(3, 2)
    bc = np.asarray(dgl.broadcast_nodes(bg, gf))
    off = 0
    for i, g in enumerate(graphs):
        n = g.num_nodes()
        assert (bc[off:off + n] == gf[i]).all()
        off += n
    bce = np.asarray(dgl.broadcast_edges(bg, gf))
    assert bce.shape[0] == bg.num_edges()


def test_topk_nodes_columnwise_and_sortby():
    graphs, bg = _batched()
    k = 3
    vals, idx = dgl.topk_nodes(bg, "h", k)
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert vals.shape == (3, k, 4) and idx.shape == (3, k, 4)
    for i, g in enumerate(graphs):
        h = np.asarray(g.ndata["h"])
        ref = -np.sort(-h, axis=0)[:k]
        np.testing.assert_allclose(vals[i], ref, rtol=1e-5, atol=1e-5)

    vals2, idx2 = dgl.topk_nodes(bg, "h", k, sortby=1)
    vals2, idx2 = np.asarray(vals2), np.asarray(idx2)
    assert idx2.shape == (3, k)
    for i, g in enumerate(graphs):
        h = np.asarray(g.ndata["h"])
        order = np.argsort(-h[:, 1])[:k]
        np.testing.assert_allclose(vals2[i], h[order], rtol=1e-5, atol=1e-5)
        assert (idx2[i] == order).all()

    with pytest.raises(ValueError):
        dgl.topk_nodes(bg, "h", 4)  # smallest graph has 3 nodes

    # ascending variant
    vals3, _ = dgl.topk_nodes(bg, "h", 2, descending=False)
    for i, g in enumerate(graphs):
        h = np.asarray(g.ndata["h"])
        np.testing.assert_allclose(
            np.asarray(vals3)[i], np.sort(h, axis=0)[:2], rtol=1e-5,
            atol=1e-5)


def test_topk_edges_and_unbatched_graph():
    graphs, bg = _batched()
    vals, _ = dgl.topk_edges(bg, "e", 2)
    assert np.asarray(vals).shape == (3, 2, 3)
    g = graphs[0]
    s = np.asarray(dgl.sum_nodes(g, "h"))
    np.testing.assert_allclose(
        s[0], np.asarray(g.ndata["h"]).sum(0), rtol=1e-5, atol=1e-5)


def test_in_out_subgraph():
    g = dgl.graph(([0, 1, 2, 3, 0], [1, 2, 3, 0, 2]), num_nodes=4)
    sub = dgl.in_subgraph(g, [2])
    assert sub.num_nodes() == 4
    s, d = np.asarray(sub.src)[:sub.num_edges()], np.asarray(
        sub.dst)[:sub.num_edges()]
    assert set(zip(s.tolist(), d.tolist())) == {(1, 2), (0, 2)}
    sub = dgl.out_subgraph(g, [0])
    s, d = np.asarray(sub.src)[:sub.num_edges()], np.asarray(
        sub.dst)[:sub.num_edges()]
    assert set(zip(s.tolist(), d.tolist())) == {(0, 1), (0, 2)}


def test_knn_graph():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 3)).astype(np.float32)
    k = 4
    g = dgl.knn_graph(x, k)
    assert g.num_nodes() == 20 and g.num_edges() == 20 * k
    src = np.asarray(g.src)[: g.num_edges()].reshape(20, k)
    dst = np.asarray(g.dst)[: g.num_edges()].reshape(20, k)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    for i in range(20):
        assert (dst[i] == i).all()
        ref = set(np.argsort(d2[i])[:k].tolist())
        assert set(src[i].tolist()) == ref


def test_segmented_knn_graph():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(12, 2)).astype(np.float32)
    g = dgl.segmented_knn_graph(x, 3, [5, 7])
    src = np.asarray(g.src)[: g.num_edges()]
    dst = np.asarray(g.dst)[: g.num_edges()]
    # no cross-segment edges
    seg = np.repeat([0, 1], [5, 7])
    assert (seg[src] == seg[dst]).all()
    assert g.num_edges() == 12 * 3


def test_metapath_reachable_graph():
    hg = dgl.heterograph({
        ("user", "follows", "user"): ([0, 1], [1, 2]),
        ("user", "plays", "game"): ([1, 2], [0, 1]),
    })
    out = dgl.metapath_reachable_graph(hg, ["follows", "plays"])
    s = np.asarray(out.src)[: out.num_edges()]
    d = np.asarray(out.dst)[: out.num_edges()]
    assert set(zip(s.tolist(), d.tolist())) == {(0, 0), (1, 1)}


def test_laplacian_lambda_max():
    g = dgl.rand_graph(30, 120, seed=3)
    g = dgl.to_bidirected(g)
    vals = dgl.laplacian_lambda_max(g)
    assert len(vals) == 1 and 0.0 < vals[0] <= 2.0 + 1e-5
    graphs = [dgl.to_bidirected(dgl.rand_graph(10, 30, seed=s))
              for s in range(3)]
    bg = dgl.batch(graphs)
    vals = dgl.laplacian_lambda_max(bg)
    assert len(vals) == 3
    for v, sub in zip(vals, graphs):
        np.testing.assert_allclose(
            v, dgl.laplacian_lambda_max(sub)[0], rtol=1e-4)
