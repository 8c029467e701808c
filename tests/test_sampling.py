"""Sampling tests (parity role: ``tests/compute/test_sampler.py``):
fanout respected, no-replacement uniqueness, block pipeline invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.dataloading import (
    MultiLayerFullNeighborSampler,
    NeighborSampler,
    NodeDataLoader,
)
from dgl1_tpu.sampling import random_walk, sample_neighbors


def test_sample_neighbors_fanout_and_uniqueness():
    g = dgl.rand_graph(50, 500, seed=7)
    rng = np.random.default_rng(0)
    seeds = np.array([0, 1, 2, 3, 4])
    f = sample_neighbors(g, seeds, fanout=3, rng=rng)
    src = np.asarray(f.src)[:f.num_edges()]
    dst = np.asarray(f.dst)[:f.num_edges()]
    in_deg = np.asarray(g.in_degrees())
    counts = {int(s): 0 for s in seeds}
    for d in dst:
        counts[int(d)] += 1
    for s in seeds:
        assert counts[int(s)] == min(3, in_deg[s])
    # Without replacement: edge ids unique.
    eids = np.asarray(f.edata["_ID"])
    assert len(np.unique(eids)) == len(eids)
    # Every sampled edge is a real parent edge into its seed.
    np.testing.assert_array_equal(np.asarray(g.src)[eids], src)
    np.testing.assert_array_equal(np.asarray(g.dst)[eids], dst)


def test_sample_neighbors_replace():
    g = dgl.rand_graph(20, 60, seed=8)
    rng = np.random.default_rng(1)
    seeds = np.arange(10)
    f = sample_neighbors(g, seeds, fanout=5, replace=True, rng=rng)
    dst = np.asarray(f.dst)[:f.num_edges()]
    in_deg = np.asarray(g.in_degrees())
    c = np.bincount(dst, minlength=20)
    for s in seeds:
        assert c[s] == (5 if in_deg[s] > 0 else 0)


def test_sample_distribution_uniform():
    # One seed with many in-edges: each should be picked ~uniformly.
    n = 101
    src = np.arange(1, n)
    dst = np.zeros(n - 1, dtype=np.int64)
    g = dgl.graph((src, dst), num_nodes=n)
    rng = np.random.default_rng(2)
    hits = np.zeros(n)
    for _ in range(300):
        f = sample_neighbors(g, [0], fanout=10, rng=rng)
        hits[np.asarray(f.src)[:f.num_edges()]] += 1
    p = hits[1:] / hits[1:].sum()
    assert abs(p.mean() - 1.0 / (n - 1)) < 1e-9
    assert p.std() < 3.0 / (n - 1)  # loose uniformity check


def test_neighbor_sampler_blocks_static_shapes():
    g = dgl.rand_graph(200, 2000, seed=9)
    sampler = NeighborSampler([3, 5])
    rng = np.random.default_rng(3)
    shapes = set()
    for _ in range(3):
        seeds = rng.integers(0, 200, size=16)
        inp, out, blocks = sampler.sample_blocks(g, seeds, rng=rng)
        shapes.add(tuple(
            (b.num_src_nodes(), b.num_dst_nodes(), b.num_edges_padded())
            for b in blocks
        ))
        # Block chaining: dst array of outer == src array of inner.
        assert blocks[0].num_dst_nodes() == blocks[1].num_src_nodes()
    assert len(shapes) == 1  # static across batches


def test_blocks_compute_correct_aggregation():
    """Mean-aggregation through sampled full-neighborhood blocks must match
    full-graph aggregation."""
    import jax.numpy as jnp

    g = dgl.rand_graph(30, 200, seed=10)
    feat = np.random.default_rng(4).normal(size=(30, 4)).astype(np.float32)
    sampler = MultiLayerFullNeighborSampler(1)
    seeds = np.array([3, 7, 9])
    inp, out, blocks = sampler.sample_blocks(g, seeds)
    blk = blocks[0]
    h_src = jnp.asarray(feat[np.asarray(blk.srcdata["_ID"])])
    agg = dgl.ops.copy_u_mean(blk, h_src)
    full = dgl.ops.copy_u_mean(g, jnp.asarray(feat))
    np.testing.assert_allclose(
        np.asarray(agg)[:3], np.asarray(full)[seeds], rtol=1e-5, atol=1e-6
    )


def test_node_dataloader_iterates_all_seeds():
    g = dgl.rand_graph(100, 600, seed=11)
    sampler = NeighborSampler([2])
    loader = NodeDataLoader(g, np.arange(50), sampler, batch_size=16,
                            shuffle=True, seed=0)
    seen = []
    for inp, out, blocks, mask in loader:
        assert len(out) == 16
        seen.extend(np.asarray(out)[mask].tolist())
    assert sorted(seen) == list(range(50))


def test_random_walk():
    g = dgl.graph((np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0])),
                  num_nodes=4)
    traces = random_walk(g, [0, 1], length=4,
                        rng=np.random.default_rng(0))
    np.testing.assert_array_equal(traces[0], [0, 1, 2, 3, 0])
    np.testing.assert_array_equal(traces[1], [1, 2, 3, 0, 1])


def test_random_walk_weighted_prob():
    # Node 0 has two out-edges; weight forces edge to node 2 always.
    g = dgl.graph((np.array([0, 0, 1, 2]), np.array([1, 2, 0, 0])),
                  num_nodes=3)
    g.edata["w"] = np.array([0.0, 1.0, 1.0, 1.0], dtype=np.float32)
    traces = random_walk(g, [0] * 8, length=1, prob="w",
                         rng=np.random.default_rng(0))
    np.testing.assert_array_equal(traces[:, 1], [2] * 8)


def test_random_walk_metapath():
    hg = dgl.heterograph({
        ("user", "plays", "game"): (np.array([0, 1]), np.array([1, 0])),
        ("game", "played_by", "user"): (np.array([0, 1]),
                                        np.array([1, 0])),
    }, num_nodes_dict={"user": 2, "game": 2})
    traces, types = random_walk(
        hg, [0, 1], metapath=["plays", "played_by", "plays"],
        rng=np.random.default_rng(0))
    assert traces.shape == (2, 4)
    # Deterministic chain: user0 -plays-> game1 -played_by-> user0 ...
    np.testing.assert_array_equal(traces[0], [0, 1, 0, 1])
    np.testing.assert_array_equal(traces[1], [1, 0, 1, 0])
    nts = hg.ntypes
    assert [nts[t] for t in types] == ["user", "game", "user", "game"]


def test_pinsage_sampler():
    from dgl1_tpu.sampling import RandomWalkNeighborSampler

    g = dgl.rand_graph(50, 500, seed=12)
    sampler = RandomWalkNeighborSampler(
        g, num_traversals=2, termination_prob=0.2, num_random_walks=20,
        num_neighbors=3, seed=0,
    )
    frontier = sampler([1, 2, 3])
    dst = np.asarray(frontier.dst)[: frontier.num_edges()]
    assert set(dst.tolist()) <= {1, 2, 3}
    c = np.bincount(dst, minlength=50)
    assert all(c[s] <= 3 for s in [1, 2, 3])
    w = np.asarray(frontier.edata["weights"])
    assert (w > 0).all()


def test_gat_on_sampled_blocks():
    """GATConv (SDDMM + masked edge softmax) must work on padded bipartite
    blocks from the static-shape sampler."""
    import jax
    import jax.numpy as jnp
    from dgl1_tpu import nn

    g = dgl.rand_graph(100, 1000, seed=13)
    feat = np.random.default_rng(13).normal(size=(100, 8)).astype(np.float32)
    sampler = NeighborSampler([4])
    inp, out, blocks = sampler.sample_blocks(
        g, np.arange(16), rng=np.random.default_rng(0)
    )
    blk = blocks[0]
    x = jnp.asarray(feat[np.asarray(blk.srcdata["_ID"])])
    conv = nn.GATConv(6, num_heads=2)
    params = conv.init(jax.random.PRNGKey(0), blk, x)
    y = conv.apply(params, blk, x)
    assert y.shape == (blk.num_dst_nodes(), 2, 6)
    assert np.all(np.isfinite(np.asarray(y)))


def test_layerwise_inference_matches_full():
    import jax
    import jax.numpy as jnp
    from dgl1_tpu import nn
    from dgl1_tpu.dataloading import layerwise_inference

    g = dgl.rand_graph(60, 400, seed=14)
    feat = jnp.asarray(
        np.random.default_rng(14).normal(size=(60, 6)).astype(np.float32)
    )
    conv = nn.SAGEConv(5, aggregator_type="mean")
    params = conv.init(jax.random.PRNGKey(0), g, feat)

    full = conv.apply(params, g, feat)
    batched = layerwise_inference(
        g, feat,
        [lambda blk, h: conv.apply(params, blk, h)],
        batch_size=17,
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_cluster_gcn_dataloader():
    from dgl1_tpu.dataloading import ClusterGCNDataLoader

    g = dgl.rand_graph(100, 600, seed=11)
    g.ndata["feat"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32))
    loader = ClusterGCNDataLoader(g, num_parts=5, parts_per_batch=2,
                                  shuffle=True, seed=3,
                                  node_pad_multiple=32,
                                  edge_pad_multiple=64)
    assert len(loader) == 3
    seen = []
    for sg, mask in loader:
        m = np.asarray(mask)
        ids = np.asarray(sg.ndata["_ID"])[m]
        seen.extend(ids.tolist())
        # Padded shapes are bucketed multiples.
        assert sg.num_nodes() % 32 == 0
        assert sg.num_edges_padded() % 64 == 0
        assert m.shape[0] == sg.num_nodes()
        # Real nodes first; features match the parent rows.
        np.testing.assert_allclose(
            np.asarray(sg.ndata["feat"])[m],
            np.asarray(g.ndata["feat"])[ids], rtol=1e-6)
        # Every real edge connects real nodes, endpoints within cluster set.
        e = sg.num_edges()
        s = np.asarray(sg.src)[:e]
        d = np.asarray(sg.dst)[:e]
        assert m[s].all() and m[d].all()
        # Induced-subgraph invariant: parent edges between selected nodes
        # all appear.
        sel = set(ids.tolist())
        pe = g.num_edges()
        ps, pd = np.asarray(g.src)[:pe], np.asarray(g.dst)[:pe]
        n_induced = int(((np.isin(ps, ids)) & (np.isin(pd, ids))).sum())
        assert e == n_induced
    # Full cover, no duplicates across the epoch.
    assert sorted(seen) == list(range(100))


def test_graph_dataloader_padded():
    from dgl1_tpu.batch import batch_num_nodes
    from dgl1_tpu.dataloading import GraphDataLoader

    ds = dgl.data.MiniGCDataset(10, 8, 14, seed=5)
    loader = GraphDataLoader(ds, batch_size=4, shuffle=True, seed=1,
                             node_pad_multiple=64, edge_pad_multiple=128)
    assert len(loader) == 3
    shapes = set()
    seen = 0
    for bg, labels, mask in loader:
        assert labels.shape == (4,)
        assert mask.shape == (4,)
        seen += int(np.asarray(mask).sum())
        # Padded budgets: total nodes/edges land on the bucket grid.
        assert bg.num_nodes() % 64 == 0
        assert bg.num_edges() % 128 == 0
        shapes.add((bg.num_nodes(), bg.num_edges()))
        # batch bookkeeping includes the pad graph as a final segment.
        assert batch_num_nodes(bg).shape[0] == 5
        # Pad graph contributes zero to a sum readout.
        from dgl1_tpu import nn as gnn
        out = gnn.SumPooling().apply({}, bg, bg.ndata["attr"])
        assert out.shape[0] == 5
    assert seen == 10
    assert len(shapes) <= 2  # few compiled shapes per epoch


def test_edge_dataloader_exclude_reverse():
    """exclude='reverse_id' must keep the batch's edges AND their
    reverses out of every sampled block (the link-prediction leakage
    guard; parity: EdgeCollator exclude)."""
    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import (EdgeDataLoader, NeighborSampler,
                                      as_edge_prediction_sampler)

    rng = np.random.default_rng(0)
    n = 60
    s_half = rng.integers(0, n, size=150)
    d_half = rng.integers(0, n, size=150)
    # Second half is the exact reverse of the first: i <-> i + 150.
    g = dgl.graph((np.concatenate([s_half, d_half]),
                   np.concatenate([d_half, s_half])), num_nodes=n)
    reverse_eids = np.concatenate([np.arange(150, 300),
                                   np.arange(0, 150)])
    wrapped = as_edge_prediction_sampler(
        NeighborSampler([4, 4], static_shapes=False),
        exclude="reverse_id", reverse_eids=reverse_eids)
    batch = np.arange(0, 32)
    excluded = np.concatenate([batch, reverse_eids[batch]])
    _, pos, neg, blocks = wrapped.sample(g, batch,
                                         rng=np.random.default_rng(1))
    checked = 0
    for blk in blocks:
        eid = blk.edata.get("_ID")
        if eid is None:
            continue
        real = np.asarray(eid)[: blk.num_edges()]
        assert not np.isin(real, excluded).any()
        checked += 1
    assert checked == 2
    # The loader surface drives the same path.
    loader = EdgeDataLoader(g, np.arange(300),
                            NeighborSampler([4, 4], static_shapes=False),
                            batch_size=32, seed=1, exclude="reverse_id",
                            reverse_eids=reverse_eids)
    next(iter(loader))


def test_sampler_exclude_eids_filters_frontier():
    """sample_blocks(exclude_eids=...) never emits an excluded edge id."""
    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import NeighborSampler

    rng = np.random.default_rng(3)
    g = dgl.rand_graph(80, 800, seed=2)
    excl = rng.choice(800, size=200, replace=False)
    sampler = NeighborSampler([5, 5], static_shapes=False)
    _, _, blocks = sampler.sample_blocks(
        g, np.arange(20), rng=np.random.default_rng(0), exclude_eids=excl)
    checked = 0
    for blk in blocks:
        eid = blk.edata.get("_ID")
        if eid is None:
            continue
        real = np.asarray(eid)[: blk.num_edges()]
        assert not np.isin(real, excl).any()
        checked += 1
    assert checked == 2


def test_select_topk():
    import dgl1_tpu as dgl
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    g = dgl.rand_graph(30, 240, seed=5)
    w = rng.random(240).astype(np.float32)
    g.edata["w"] = jnp.asarray(w)
    sub = dgl.sampling.select_topk(g, 3, "w")
    assert int(np.asarray(sub.in_degrees()).max()) <= 3
    # Kept edges per node are the max-weight ones.
    eids = np.asarray(sub.edata["_ID"])
    src = np.asarray(g.src)[:240]
    dst = np.asarray(g.dst)[:240]
    for v in range(30):
        all_in = np.flatnonzero(dst == v)
        kept = eids[np.asarray(sub.dst)[: sub.num_edges()] == v]
        if len(all_in) > 3:
            topk = all_in[np.argsort(w[all_in])[-3:]]
            assert set(kept) == set(topk)
