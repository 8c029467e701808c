"""Partitioned/sharded execution tests (parity role:
``tests/distributed/``: partition -> reassemble equals original; here
additionally the halo-exchange aggregation must match the single-device
kernel bit-for-bit up to float reassociation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import dgl1_tpu as dgl
from dgl1_tpu.parallel import (
    DistGraph,
    GraphPartitionBook,
    build_partitioned_graph,
    edge_cut_fraction,
    greedy_partition_assignment,
    load_partition,
    partition_graph,
    random_partition_assignment,
)
from dgl1_tpu.parallel.sharded_ops import make_sharded_gcn_matvec

NUM_DEVICES = 8


def mesh8():
    return Mesh(np.array(jax.devices()[:NUM_DEVICES]), ("p",))


def test_partition_assignment_balance_and_cut():
    g = dgl.rand_graph(400, 4000, seed=1)
    part = greedy_partition_assignment(g, 4)
    sizes = np.bincount(part, minlength=4)
    assert sizes.min() > 0
    assert sizes.max() <= 1.3 * 400 / 4
    cut_greedy = edge_cut_fraction(g, part)
    cut_rand = edge_cut_fraction(g, random_partition_assignment(g, 4))
    # Random graphs have little structure; greedy should still not be
    # WORSE than random.
    assert cut_greedy <= cut_rand + 0.05


def test_partition_roundtrip(tmp_path):
    g = dgl.rand_graph(50, 300, seed=2)
    g.ndata["feat"] = jnp.asarray(
        np.random.default_rng(0).normal(size=(50, 4)).astype(np.float32)
    )
    part = partition_graph(g, "toy", 4, str(tmp_path), part_method="greedy")
    # Reassemble all inner edges from the partitions; must equal original.
    all_edges = []
    for p in range(4):
        lg, feats, book = load_partition(str(tmp_path), "toy", p)
        orig_nid = np.asarray(lg.ndata["orig_id"])
        e = lg.num_edges()
        src = orig_nid[np.asarray(lg.src)[:e]]
        dst = orig_nid[np.asarray(lg.dst)[:e]]
        eid = np.asarray(lg.edata["orig_id"])
        np.testing.assert_array_equal(np.asarray(g.src)[eid], src)
        np.testing.assert_array_equal(np.asarray(g.dst)[eid], dst)
        all_edges.append(eid)
        inner = np.asarray(lg.ndata["inner_node"])
        np.testing.assert_array_equal(
            np.sort(orig_nid[inner]), np.nonzero(part == p)[0]
        )
    got = np.sort(np.concatenate(all_edges))
    np.testing.assert_array_equal(got, np.arange(g.num_edges()))


def test_partition_book():
    part = np.array([0, 1, 0, 2, 1, 0])
    book = GraphPartitionBook(part, 3)
    np.testing.assert_array_equal(book.nid2partid([0, 3, 4]), [0, 2, 1])
    np.testing.assert_array_equal(book.partid2nids(0), [0, 2, 5])
    np.testing.assert_array_equal(book.nid2localnid([0, 2, 5]), [0, 1, 2])
    np.testing.assert_array_equal(book.map_to_global(1, [0, 1]), [1, 4])


@pytest.mark.parametrize("part_method", ["random", "greedy"])
def test_sharded_gcn_matvec_matches_single_device(part_method):
    g = dgl.rand_graph(96, 900, seed=3)
    if part_method == "random":
        part = random_partition_assignment(g, NUM_DEVICES, seed=0)
    else:
        part = greedy_partition_assignment(g, NUM_DEVICES)
    pg = build_partitioned_graph(g, part, NUM_DEVICES)
    feat = jnp.asarray(
        np.random.default_rng(1).normal(size=(96, 16)).astype(np.float32)
    )

    # Single-device reference: D^-1/2 A D^-1/2 x via the XLA engine.
    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None])
    )

    mesh = mesh8()
    matvec = make_sharded_gcn_matvec(pg, mesh)
    x = pg.shard_node_data(feat)
    y = jax.jit(matvec)(x)
    got = np.asarray(pg.unshard_node_data(y))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sharded_matvec_grad_matches():
    g = dgl.rand_graph(64, 500, seed=4)
    part = random_partition_assignment(g, NUM_DEVICES, seed=1)
    pg = build_partitioned_graph(g, part, NUM_DEVICES)
    feat = np.random.default_rng(2).normal(size=(64, 8)).astype(np.float32)
    mesh = mesh8()
    matvec = make_sharded_gcn_matvec(pg, mesh)

    def loss_sharded(x):
        return jnp.sum(jnp.sin(matvec(x)))

    gx = jax.grad(loss_sharded)(pg.shard_node_data(jnp.asarray(feat)))
    got = np.asarray(pg.unshard_node_data(gx))

    deg_out = jnp.asarray(np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5)
    deg_in = jnp.asarray(np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5)

    def loss_ref(x):
        y = deg_in[:, None] * dgl.ops.copy_u_sum(g, x * deg_out[:, None])
        return jnp.sum(jnp.sin(y))

    ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(feat)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dist_graph_tensor():
    g = dgl.rand_graph(40, 200, seed=5)
    g.ndata["x"] = jnp.asarray(np.arange(40, dtype=np.float32)[:, None])
    dg = DistGraph(g, 4, part_method="random")
    ids = np.array([0, 13, 39, 7])
    np.testing.assert_allclose(
        dg.ndata["x"][ids][:, 0], ids.astype(np.float32)
    )
    dg.ndata["x"][np.array([5])] = np.array([[99.0]])
    np.testing.assert_allclose(dg.ndata["x"][np.array([5])], [[99.0]])


def test_partition_balance_edges_powerlaw():
    """balance_edges=True balances EDGE ownership (dst part) on skewed
    graphs — without it, hub parts own nearly all edges (the regression
    that collapsed projected multi-chip efficiency)."""
    from dgl1_tpu.parallel.partition import greedy_partition_assignment

    rng = np.random.default_rng(0)
    n, e = 4096, 32768
    # Zipf-ish in-degrees with the max capped (ogbn-like profile).
    w = np.minimum(rng.zipf(2.2, size=n), e // 200)
    deg = np.maximum((w * (e / w.sum())).astype(np.int64), 0)
    dst = np.repeat(np.arange(n), deg)[:e]
    if len(dst) < e:
        dst = np.concatenate([dst, rng.integers(0, n, size=e - len(dst))])
    src = rng.integers(0, n, size=e)
    g = dgl.graph((src, dst), num_nodes=n, formats=("csc",))

    k = 4
    part = greedy_partition_assignment(g, k, balance_edges=True)
    assert part.min() >= 0 and part.max() < k
    e_own = np.bincount(part[np.asarray(g.dst)[:e]], minlength=k)
    balance = e / (k * e_own.max())
    assert balance > 0.85, (balance, e_own)
    assert (np.bincount(part, minlength=k) > 0).all()


def test_vertex_cut_matvec_matches_dense_oracle():
    """Vertex-cut (split-destination) mode: a mega-hub's in-edges spread
    across parts; partials return via the second all_to_all and merge.
    Values AND grads must match the dense normalized-adjacency oracle."""
    from jax.sharding import Mesh

    from dgl1_tpu.parallel import (build_partitioned_graph,
                                   vertex_cut_edge_owner)
    from dgl1_tpu.parallel.partition import greedy_partition_assignment
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gcn_matvec

    rng = np.random.default_rng(0)
    n, e = 256, 4096
    dst = np.concatenate([np.zeros(2000, np.int64),
                          rng.integers(0, n, size=e - 2000)])
    src = rng.integers(0, n, size=e)
    g = dgl.graph((src, dst), num_nodes=n)
    part = greedy_partition_assignment(g, 4, balance_edges=True)
    eo = vertex_cut_edge_owner(g, part, 4, threshold=100)
    assert (np.bincount(eo, minlength=4) > 0).all()
    # The hub's edges must actually be split across parts.
    assert len(np.unique(eo[np.asarray(dst) == 0])) == 4
    pg = build_partitioned_graph(g, part, 4, edge_owner=eo)
    assert pg.m_part > 0

    mesh = Mesh(np.array(jax.devices()[:4]), ("p",))
    mv = make_sharded_gcn_matvec(pg, mesh)
    feat = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    x = pg.shard_node_data(feat)

    @jax.jit
    def fwd_and_grad(x):
        y, vjp = jax.vjp(mv, x)
        return y, vjp(jnp.cos(y))[0]

    y_s, gx_s = fwd_and_grad(x)
    yg = np.asarray(pg.unshard_node_data(y_s))

    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    A = np.zeros((n, n), np.float32)
    np.add.at(A, (dst, src), 1.0)
    M = deg_in[:, None] * A * deg_out[None, :]
    ref = M @ np.asarray(feat)
    np.testing.assert_allclose(yg, ref, atol=1e-4)

    gx = np.asarray(pg.unshard_node_data(gx_s))

    def loss_ref(f):
        return jnp.sum(jnp.sin(jnp.asarray(M) @ f))

    gref = np.asarray(jax.grad(loss_ref)(jnp.asarray(feat)))
    np.testing.assert_allclose(gx, gref, atol=1e-4)


def test_sharded_gat_attention_matches_single_device():
    """Sharded GAT aggregation (halo all_to_all of el/ft + local exact
    edge softmax) must match the single-device gat_attention oracle on
    values AND grads."""
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gat_layer

    g = dgl.rand_graph(96, 900, seed=7)
    part = random_partition_assignment(g, NUM_DEVICES, seed=0)
    pg = build_partitioned_graph(g, part, NUM_DEVICES)
    rng = np.random.default_rng(3)
    h, d = 4, 8
    el = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(96, h, d)).astype(np.float32))

    # Single-device composed reference.
    def ref_fn(el, er, ft):
        e = g.num_edges()
        src = np.asarray(g.src)[:e]
        dst = np.asarray(g.dst)[:e]
        z = np.asarray(el)[src] + np.asarray(er)[dst]
        z = np.where(z >= 0, z, 0.2 * z)
        out = np.zeros((96, h, d), np.float32)
        for v in range(96):
            sel = dst == v
            if not sel.any():
                continue
            zz = z[sel]
            p = np.exp(zz - zz.max(0, keepdims=True))
            a = p / p.sum(0, keepdims=True)
            out[v] = (a[:, :, None] * np.asarray(ft)[src[sel]]).sum(0)
        return out

    mesh = mesh8()
    layer = make_sharded_gat_layer(pg, mesh)
    el_s = pg.shard_node_data(el)
    er_s = pg.shard_node_data(er)
    ft_s = pg.shard_node_data(ft)

    # ONE compiled program for fwd AND grads (d/dx sum(sin(out)) has
    # cotangent cos(out)) — separate jit+grad compiles dominated runtime.
    @jax.jit
    def fwd_and_grads(el_s, er_s, ft_s):
        out, vjp = jax.vjp(layer, el_s, er_s, ft_s)
        return out, vjp(jnp.cos(out))

    out_s, gs = fwd_and_grads(el_s, er_s, ft_s)
    out = np.asarray(pg.unshard_node_data(out_s))
    np.testing.assert_allclose(out, ref_fn(el, er, ft), rtol=2e-4, atol=2e-4)

    # Grads vs the fused/composed single-device op.
    from dgl1_tpu.ops.attention import gat_attention
    from dgl1_tpu.ops import gsddmm, gspmm
    from dgl1_tpu.ops.edge_softmax import edge_softmax

    got = [np.asarray(pg.unshard_node_data(x)) for x in gs]

    def loss_single(el, er, ft):
        zc = gsddmm(g, "add", el[:, :, None], er[:, :, None],
                    lhs_target="u", rhs_target="v")
        zc = jnp.where(zc >= 0, zc, 0.2 * zc)
        a = edge_softmax(g, zc)
        out = gspmm(g, "mul", "sum", ft, a)
        return jnp.sum(jnp.sin(out))

    ref = jax.grad(loss_single, argnums=(0, 1, 2))(el, er, ft)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-3, atol=2e-3)


def test_metis_partition_parity_surface():
    """dgl.metis_partition returns per-part node subgraphs with
    inner_node flags and halo hops (parity: dgl.transform.metis_partition
    via the LDG greedy assignment)."""
    g = dgl.rand_graph(80, 320, seed=9)
    parts = dgl.metis_partition(g, 4, extra_cached_hops=1)
    assert set(parts) == {0, 1, 2, 3}
    inner_total = 0
    for p in parts.values():
        flags = np.asarray(p.ndata["inner_node"])
        assert "_ID" in p.ndata
        inner_total += int(flags.sum())
        # halo nodes exist (dense-ish random graph)
        assert flags.sum() <= p.num_nodes()
    assert inner_total == 80


def test_multilevel_partitioner_beats_greedy_on_grid():
    """Multilevel HEM coarsening + Fennel-stream coarsest + label-prop
    refinement must clearly beat the flat LDG stream on geometric
    graphs (SURVEY hard part #5); metis_partition_assignment keeps the
    better of the two."""
    from dgl1_tpu.parallel import (multilevel_partition_assignment,
                                   metis_partition_assignment)

    L = 60
    src, dst = [], []
    for r in range(L):
        for c in range(L):
            if c + 1 < L:
                src.append(r * L + c)
                dst.append(r * L + c + 1)
            if r + 1 < L:
                src.append(r * L + c)
                dst.append((r + 1) * L + c)
    src, dst = np.array(src), np.array(dst)
    g = dgl.graph((np.concatenate([src, dst]),
                   np.concatenate([dst, src])), num_nodes=L * L,
                  formats=("csc",))
    k = 4
    cut_g = edge_cut_fraction(g, greedy_partition_assignment(g, k))
    pm = multilevel_partition_assignment(g, k)
    cut_m = edge_cut_fraction(g, pm)
    sizes = np.bincount(pm, minlength=k)
    assert sizes.min() > 0 and sizes.max() <= 1.2 * L * L / k
    assert cut_m < cut_g
    cut_best = edge_cut_fraction(g, metis_partition_assignment(g, k))
    assert cut_best <= min(cut_m, cut_g) + 1e-9


def test_vertex_cut_gat_attention_matches_single_device():
    """Vertex-cut sharded GAT: a mega-hub's in-edges split across parts;
    the cross-part ONLINE softmax (er shipped to edge parts, (m, s, n)
    partials merged at the owner with exp(m_p - M) rescaling) must match
    the single-device attention oracle on values AND grads."""
    from dgl1_tpu.ops import gsddmm, gspmm
    from dgl1_tpu.ops.edge_softmax import edge_softmax
    from dgl1_tpu.parallel import vertex_cut_edge_owner
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gat_layer

    rng = np.random.default_rng(11)
    n, e = 128, 2600
    # Zipf-ish: node 0 is a mega hub with 1200 in-edges.
    dst = np.concatenate([np.zeros(1200, np.int64),
                          rng.integers(0, n, size=e - 1200)])
    src = rng.integers(0, n, size=e)
    g = dgl.graph((src, dst), num_nodes=n)
    part = greedy_partition_assignment(g, 4, balance_edges=True)
    eo = vertex_cut_edge_owner(g, part, 4, threshold=64)
    assert len(np.unique(eo[np.asarray(g.dst)[:e] == 0])) == 4
    pg = build_partitioned_graph(g, part, 4, edge_owner=eo)
    assert pg.m_part > 0

    h, d = 3, 8
    el = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(n, h, d)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:4]), ("p",))
    layer = make_sharded_gat_layer(pg, mesh)
    el_s, er_s, ft_s = (pg.shard_node_data(x) for x in (el, er, ft))

    @jax.jit
    def fwd_and_grads(el_s, er_s, ft_s):
        out, vjp = jax.vjp(layer, el_s, er_s, ft_s)
        return out, vjp(jnp.cos(out))

    out_s, gs = fwd_and_grads(el_s, er_s, ft_s)
    out = np.asarray(pg.unshard_node_data(out_s))

    def single(el, er, ft):
        zc = gsddmm(g, "add", el[:, :, None], er[:, :, None],
                    lhs_target="u", rhs_target="v")
        zc = jnp.where(zc >= 0, zc, 0.2 * zc)
        a = edge_softmax(g, zc)
        return gspmm(g, "mul", "sum", ft, a)

    ref = np.asarray(single(el, er, ft))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    got = [np.asarray(pg.unshard_node_data(x)) for x in gs]

    def loss_single(el, er, ft):
        return jnp.sum(jnp.sin(single(el, er, ft)))

    refg = jax.grad(loss_single, argnums=(0, 1, 2))(el, er, ft)
    for a, b in zip(got, refg):
        np.testing.assert_allclose(a, np.asarray(b), rtol=2e-3, atol=2e-3)


def _band_graph(n, e, width, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-width, width, e), 0, n - 1)
    return dgl.graph((src, dst), num_nodes=n)


@pytest.mark.parametrize("mode", ["fwd", "grad"])
def test_sharded_bdense_matvec_matches(mode):
    # Local (band) graph partitioned contiguously: within-part edges go
    # on the block-dense tier, cross-part/halo edges ride the tile tail.
    n = 2048
    g = _band_graph(n, 40000, 100, seed=6)
    part = (np.arange(n) * NUM_DEVICES // n).astype(np.int32)
    pg = build_partitioned_graph(g, part, NUM_DEVICES, bdense=True)
    assert pg.bdense is not None
    # Dense tier carries real coverage on at least some parts.
    a_total = float(np.asarray(pg.bdense["a"], np.float64).sum())
    assert a_total > 0.5 * g.num_edges()

    feat = jnp.asarray(np.random.default_rng(3).normal(
        size=(n, 16)).astype(np.float32))
    deg_out = jnp.asarray(
        np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5)
    deg_in = jnp.asarray(np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5)
    mesh = mesh8()
    matvec = make_sharded_gcn_matvec(pg, mesh)

    if mode == "fwd":
        y = jax.jit(matvec)(pg.shard_node_data(feat))
        got = np.asarray(pg.unshard_node_data(y))
        ref = np.asarray(deg_in[:, None] * dgl.ops.copy_u_sum(
            g, feat * deg_out[:, None]))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    else:
        def loss_sharded(x):
            return jnp.sum(jnp.sin(matvec(x)))

        gx = jax.grad(loss_sharded)(pg.shard_node_data(feat))
        got = np.asarray(pg.unshard_node_data(gx))

        def loss_ref(x):
            y = deg_in[:, None] * dgl.ops.copy_u_sum(
                g, x * deg_out[:, None])
            return jnp.sum(jnp.sin(y))

        ref = np.asarray(jax.grad(loss_ref)(feat))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sharded_bdense_vertex_cut():
    # bdense composes with split-destination ownership: partial slots
    # are just extra output rows for the dense/tail reduce.
    from dgl1_tpu.parallel.halo import vertex_cut_edge_owner

    n = 1024
    g = _band_graph(n, 20000, 64, seed=8)
    # Add a mega-hub to force vertex-cut ownership.
    rng = np.random.default_rng(9)
    hub_src = rng.integers(0, n, 2000)
    src = np.concatenate([np.asarray(g.src)[:g.num_edges()], hub_src])
    dst = np.concatenate([np.asarray(g.dst)[:g.num_edges()],
                          np.full(2000, 7)])
    g2 = dgl.graph((src, dst), num_nodes=n)
    part = (np.arange(n) * NUM_DEVICES // n).astype(np.int32)
    owner = vertex_cut_edge_owner(g2, part, NUM_DEVICES, threshold=500)
    assert np.any(owner != part[np.asarray(g2.dst)[:g2.num_edges()]])
    pg = build_partitioned_graph(g2, part, NUM_DEVICES, edge_owner=owner,
                                 bdense=True)
    feat = jnp.asarray(np.random.default_rng(4).normal(
        size=(n, 8)).astype(np.float32))
    deg_out = jnp.asarray(
        np.maximum(np.asarray(g2.out_degrees()), 1) ** -0.5)
    deg_in = jnp.asarray(
        np.maximum(np.asarray(g2.in_degrees()), 1) ** -0.5)
    mesh = mesh8()
    matvec = make_sharded_gcn_matvec(pg, mesh)
    y = jax.jit(matvec)(pg.shard_node_data(feat))
    got = np.asarray(pg.unshard_node_data(y))
    ref = np.asarray(deg_in[:, None] * dgl.ops.copy_u_sum(
        g2, feat * deg_out[:, None]))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_node_edge_split():
    from dgl1_tpu.distributed import GraphPartitionBook, edge_split, node_split

    part = np.array([0, 0, 1, 1, 0, 1, 0, 1])
    book = GraphPartitionBook(part, 2)
    mask = np.array([1, 0, 1, 1, 1, 0, 0, 1], dtype=bool)
    r0 = node_split(mask, book, rank=0)
    r1 = node_split(mask, book, rank=1)
    np.testing.assert_array_equal(np.sort(np.concatenate([r0, r1])),
                                  np.nonzero(mask)[0])
    assert (part[r0] == 0).all() and (part[r1] == 1).all()
    # Even striping covers everything disjointly.
    e0 = node_split(mask, None, rank=0, num_parts=2)
    e1 = node_split(mask, None, rank=1, num_parts=2)
    np.testing.assert_array_equal(np.sort(np.concatenate([e0, e1])),
                                  np.nonzero(mask)[0])
    # Edge split by explicit owner array.
    owner = np.array([0, 1, 0, 1, 1])
    es = edge_split(np.arange(5), owner=owner, rank=1)
    np.testing.assert_array_equal(es, [1, 3, 4])


def _powerlawish(n, e, seed=0):
    """Hub-heavy random graph: Zipf-ish dst concentration."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=e)
    # ~60% of edges into the top few destinations, rest uniform.
    hub_e = int(0.6 * e)
    hubs = rng.integers(0, max(n // 50, 1), size=hub_e)
    rest = rng.integers(0, n, size=e - hub_e)
    dst = np.concatenate([hubs, rest])
    return dgl.graph((src, dst), num_nodes=n)


@pytest.mark.parametrize("mode", ["halo", "vcut"])
def test_sharded_hub_matvec_matches(mode):
    """The flagship hub engine inside the partitioned local SpMM
    (round-4 VERDICT #1): values AND grads must match the single-device
    oracle, in both destination-owner (halo) and split-destination
    (vertex-cut) edge placement. (4-device mesh: SPMD compile time on
    the CPU box scales with P; 8-device coverage comes from the
    mixed-size and combined-layout tests.)"""
    from dgl1_tpu.parallel.halo import vertex_cut_edge_owner

    k = 4
    g = _powerlawish(96, 2200, seed=7)
    part = random_partition_assignment(g, k, seed=0)
    kw = dict(hub=32, hub_dense_floor=64)
    if mode == "vcut":
        kw["edge_owner"] = vertex_cut_edge_owner(
            g, part, k, threshold=40)
    pg = build_partitioned_graph(g, part, k, **kw)
    assert pg.hub is not None and pg.hub_meta is not None
    assert pg.hub_meta.n_groups >= 1
    feat = jnp.asarray(
        np.random.default_rng(1).normal(size=(96, 16)).astype(np.float32))

    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None]))

    mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
    matvec = make_sharded_gcn_matvec(pg, mesh)
    x = pg.shard_node_data(feat)
    y = jax.jit(matvec)(x)
    got = np.asarray(pg.unshard_node_data(y))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # Grads through the hub custom-vjp + all_to_all transpose.
    def loss_sharded(x):
        return jnp.sum(jnp.sin(matvec(x)))

    gx = jax.grad(loss_sharded)(x)
    got_g = np.asarray(pg.unshard_node_data(gx))

    deg_out_j = jnp.asarray(deg_out.astype(np.float32))
    deg_in_j = jnp.asarray(deg_in.astype(np.float32))

    def loss_ref(xf):
        y = deg_in_j[:, None] * dgl.ops.copy_u_sum(
            g, xf * deg_out_j[:, None])
        return jnp.sum(jnp.sin(y))

    ref_g = np.asarray(jax.grad(loss_ref)(feat))
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4, atol=1e-4)


def test_sharded_hub_mixed_part_sizes():
    """Geometry unification: one part hub-heavy, others nearly empty
    (no natural hub groups) must still stack and match the oracle."""
    n = 64
    rng = np.random.default_rng(3)
    # All hub edges into nodes 0..3 (one part), few edges elsewhere.
    src = rng.integers(0, n, size=1500)
    dst = rng.integers(0, 4, size=1500)
    src2 = rng.integers(0, n, size=40)
    dst2 = rng.integers(4, n, size=40)
    g = dgl.graph((np.concatenate([src, src2]),
                   np.concatenate([dst, dst2])), num_nodes=n)
    part = (np.arange(n) // (n // NUM_DEVICES)).astype(np.int32)
    pg = build_partitioned_graph(g, part, NUM_DEVICES, hub=16,
                                 hub_dense_floor=32)
    assert pg.hub is not None
    feat = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None]))
    matvec = make_sharded_gcn_matvec(pg, mesh8())
    y = jax.jit(matvec)(pg.shard_node_data(feat))
    got = np.asarray(pg.unshard_node_data(y))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["halo", "vcut"])
def test_sharded_hub_combined_layout_matches(mode):
    """Combined-layout path (activations stay [owned|halo|pad] across
    layers; in-place halo slot update, no concat/pad copies): values and
    grads must match the oracle, including a CHAINED two-layer compose
    (the layout's whole point)."""
    from dgl1_tpu.parallel.halo import vertex_cut_edge_owner
    from dgl1_tpu.parallel.sharded_ops import (
        make_sharded_gcn_matvec_combined)

    g = _powerlawish(96, 2200, seed=9)
    part = random_partition_assignment(g, NUM_DEVICES, seed=2)
    kw = dict(hub=32, hub_dense_floor=64)
    if mode == "vcut":
        kw["edge_owner"] = vertex_cut_edge_owner(
            g, part, NUM_DEVICES, threshold=40)
    pg = build_partitioned_graph(g, part, NUM_DEVICES, **kw)
    assert pg.hub is not None and pg.hub_rows > 0
    feat = jnp.asarray(
        np.random.default_rng(5).normal(size=(96, 16)).astype(np.float32))

    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5

    def ref_layer(x):
        return deg_in[:, None] * np.asarray(
            dgl.ops.copy_u_sum(g, np.asarray(x) * deg_out[:, None]))

    ref2 = ref_layer(np.tanh(ref_layer(feat)))

    mesh = mesh8()
    mv = make_sharded_gcn_matvec_combined(pg, mesh)

    @jax.jit
    def two_layer(x):
        return mv(jnp.tanh(mv(x)))

    x = pg.shard_node_data_combined(feat)
    # tanh(0)=0 keeps phantom/halo rows inert between layers.
    y = two_layer(x)
    got = np.asarray(pg.unshard_node_data_combined(y))
    np.testing.assert_allclose(got, ref2, rtol=1e-4, atol=1e-4)

    # Grad through the chained layers.
    def loss_sharded(x):
        return jnp.sum(jnp.sin(two_layer(x)))

    gx = jax.grad(loss_sharded)(x)
    got_g = np.asarray(pg.unshard_node_data_combined(gx))

    do = jnp.asarray(deg_out.astype(np.float32))
    di = jnp.asarray(deg_in.astype(np.float32))

    def loss_ref(xf):
        def layer(z):
            return di[:, None] * dgl.ops.copy_u_sum(g, z * do[:, None])

        return jnp.sum(jnp.sin(layer(jnp.tanh(layer(xf)))))

    ref_g = np.asarray(jax.grad(loss_ref)(feat))
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4, atol=1e-4)


def test_sharded_hub_bf16_halo_wire():
    """bf16 halo wire format (ICI payload compression): values within
    bf16 rounding of the f32 oracle, grads finite and close."""
    g = _powerlawish(96, 2200, seed=11)
    part = random_partition_assignment(g, 4, seed=3)
    pg = build_partitioned_graph(g, part, 4, hub=32,
                                 hub_dense_floor=64, halo_dtype="bf16")
    assert pg.halo_dtype == "bf16"
    feat = jnp.asarray(
        np.random.default_rng(7).normal(size=(96, 16)).astype(np.float32))
    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None]))
    mv = make_sharded_gcn_matvec(
        pg, Mesh(np.array(jax.devices()[:4]), ("p",)))
    x = pg.shard_node_data(feat)
    y = jax.jit(mv)(x)
    got = np.asarray(pg.unshard_node_data(y))
    # Only CUT-edge contributions round (~4e-3 relative); owned-edge
    # aggregation is exact.
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # (Grad-path coverage for the bf16 wire rides the dryrun halo leg —
    # compiling a second 8-device grad program here costs ~20 s of
    # suite time for no additional oracle signal.)


def test_sharded_hub_int8_halo_wire():
    """int8 halo wire (per-row absmax scale + int8 mantissa, QUARTER
    the ICI bytes — the lever that keeps projected eff >= 0.8 at the
    identity-rate compute, tools/bench_scaling.py r5): values within
    quantization tolerance of the f32 oracle; grads flow through the
    straight-through wire transpose and stay close."""
    g = _powerlawish(96, 2200, seed=29)
    part = random_partition_assignment(g, 4, seed=5)
    pg = build_partitioned_graph(g, part, 4, hub=32,
                                 hub_dense_floor=64, halo_dtype="int8")
    assert pg.halo_dtype == "int8"
    feat = jnp.asarray(
        np.random.default_rng(9).normal(size=(96, 16)).astype(np.float32))
    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None]))
    mv = make_sharded_gcn_matvec(
        pg, Mesh(np.array(jax.devices()[:4]), ("p",)))
    x = pg.shard_node_data(feat)
    got = np.asarray(pg.unshard_node_data(jax.jit(mv)(x)))
    # Only CUT-edge contributions quantize (~8e-3 row-relative).
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)

    gx = jax.grad(lambda x: jnp.sum(jnp.sin(mv(x))))(x)
    got_g = np.asarray(pg.unshard_node_data(gx))
    do = jnp.asarray(deg_out.astype(np.float32))
    di = jnp.asarray(deg_in.astype(np.float32))
    ref_g = np.asarray(jax.grad(lambda xf: jnp.sum(jnp.sin(
        di[:, None] * dgl.ops.copy_u_sum(g, xf * do[:, None]))))(feat))
    assert np.isfinite(got_g).all()
    np.testing.assert_allclose(got_g, ref_g, rtol=8e-2, atol=8e-2)


def test_sharded_gat_fused_matches_segment_path():
    """Per-part FUSED flash-attention vs the segment-softmax sharded
    path and the single-device composed oracle — values and grads."""
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gat_layer

    k = 4
    g = _powerlawish(96, 2200, seed=13)
    part = random_partition_assignment(g, k, seed=4)
    pg = build_partitioned_graph(g, part, k, hub=32, hub_dense_floor=64)
    assert pg.hub is not None
    mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
    rng = np.random.default_rng(0)
    h, d = 2, 8
    el = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(96, h, d)).astype(np.float32))

    seg = make_sharded_gat_layer(pg, mesh)
    fus = make_sharded_gat_layer(pg, mesh, fused=True)
    xs = (pg.shard_node_data(el), pg.shard_node_data(er),
          pg.shard_node_data(ft))
    y_seg = np.asarray(pg.unshard_node_data(jax.jit(seg)(*xs)))
    y_fus = np.asarray(pg.unshard_node_data(jax.jit(fus)(*xs)))
    mask = np.asarray(g.in_degrees()) > 0  # zero-deg rows: seg uses 0/eps
    np.testing.assert_allclose(y_fus[mask], y_seg[mask],
                               rtol=2e-4, atol=2e-4)

    def loss(fn, el, er, ft):
        return jnp.sum(jnp.sin(fn(el, er, ft)))

    g_seg = jax.grad(lambda *a: loss(seg, *a), argnums=(0, 1, 2))(*xs)
    g_fus = jax.grad(lambda *a: loss(fus, *a), argnums=(0, 1, 2))(*xs)
    for a, b in zip(g_seg, g_fus):
        ga = np.asarray(pg.unshard_node_data(a))
        gb = np.asarray(pg.unshard_node_data(b))
        np.testing.assert_allclose(gb[mask], ga[mask], rtol=2e-4,
                                   atol=2e-4)


def test_gcn_train_step_combined_layout_learns():
    """make_gcn_train_step(combined=True): the copy-free flagship
    configuration trains and matches the plain-layout step's loss
    trajectory."""
    import optax

    from dgl1_tpu.parallel.train import (init_gcn_params,
                                         make_gcn_train_step)

    k = 4
    g = _powerlawish(96, 2200, seed=17)
    part = random_partition_assignment(g, k, seed=6)
    pg = build_partitioned_graph(g, part, k, hub=32, hub_dense_floor=64)
    mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
    rng = np.random.default_rng(2)
    feat = jnp.asarray(rng.normal(size=(96, 12)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 96).astype(np.int32))
    opt = optax.adam(5e-2)
    params0 = init_gcn_params(jax.random.PRNGKey(0), 12, 16, 4)

    from dgl1_tpu.parallel.sharded_ops import fill_halo_combined

    losses = {}
    for mode in ("plain", "combined", "prefilled"):
        combined = mode != "plain"
        step, _ = make_gcn_train_step(pg, mesh, opt, 4,
                                      combined=combined,
                                      prefilled=mode == "prefilled")
        x = (pg.shard_node_data_combined(feat) if combined
             else pg.shard_node_data(feat))
        if mode == "prefilled":
            # Static input features: one standing halo fill outside the
            # step; layer 1 then skips its halo update entirely.
            x = fill_halo_combined(pg, mesh)(x)
        y = pg.shard_node_data(labels).astype(jnp.int32)
        params, st = params0, opt.init(params0)
        tr = []
        for _ in range(5):
            params, st, loss = step(params, st, x, y, pg.node_mask)
            tr.append(float(loss))
        losses[mode] = tr
    # Same math, different layout: identical trajectories to fp tolerance.
    np.testing.assert_allclose(losses["combined"], losses["plain"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(losses["prefilled"], losses["combined"],
                               rtol=1e-4, atol=1e-4)
    assert losses["combined"][-1] < losses["combined"][0]


def test_sharded_hub_identity_multipart():
    """hub_identity=True at k>1 (round-5 #1): per-part hub-first local
    renumbering against the forced union geometry must achieve
    identity_expand on every part — including diag extraction and
    multi-rung tail-bucket inflation — and stay oracle-exact on values
    AND grads in both the plain and combined layouts. No hub_order
    preprocessing of the input graph is involved (the relabel is
    internal and composes through orig_ids)."""
    from dgl1_tpu.parallel.sharded_ops import (
        make_sharded_gcn_matvec_combined)

    k = 4
    n = 1024
    rng = np.random.default_rng(11)
    p = (np.arange(n) + 1.0) ** -1.1
    p /= p.sum()
    dst = rng.choice(n, size=12000, p=p)
    src = rng.integers(0, n, size=12000)
    sl = np.arange(n)  # self-loops everywhere -> diag extraction
    g = dgl.graph((np.concatenate([src, sl]), np.concatenate([dst, sl])),
                  num_nodes=n)
    part = (np.arange(n) % k).astype(np.int32)
    pg = build_partitioned_graph(g, part, k, hub=1200,
                                 hub_dense_floor=2000, hub_identity=True)
    m = pg.hub_meta
    assert m is not None and m.identity_expand
    assert m.has_diag and m.n_tail_rows > 0  # the hard layout features

    feat = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    deg_out = np.maximum(np.asarray(g.out_degrees()), 1) ** -0.5
    deg_in = np.maximum(np.asarray(g.in_degrees()), 1) ** -0.5
    ref = deg_in[:, None] * np.asarray(
        dgl.ops.copy_u_sum(g, feat * deg_out[:, None]))
    mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
    do = jnp.asarray(deg_out.astype(np.float32))
    di = jnp.asarray(deg_in.astype(np.float32))

    def loss_ref(xf):
        return jnp.sum(jnp.sin(
            di[:, None] * dgl.ops.copy_u_sum(g, xf * do[:, None])))

    ref_g = np.asarray(jax.grad(loss_ref)(feat))

    for mv, shard, unshard in (
        (make_sharded_gcn_matvec(pg, mesh),
         pg.shard_node_data, pg.unshard_node_data),
        (make_sharded_gcn_matvec_combined(pg, mesh),
         pg.shard_node_data_combined, pg.unshard_node_data_combined),
    ):
        x = shard(feat)
        got = np.asarray(unshard(jax.jit(mv)(x)))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        gx = jax.grad(lambda x: jnp.sum(jnp.sin(mv(x))))(x)
        got_g = np.asarray(unshard(gx))
        np.testing.assert_allclose(got_g, ref_g, rtol=1e-4, atol=1e-4)

    # Guards: vertex-cut placement must refuse; hub=False must refuse.
    from dgl1_tpu.parallel.halo import vertex_cut_edge_owner
    with pytest.raises(ValueError):
        build_partitioned_graph(
            g, part, k, hub=500, hub_identity=True,
            edge_owner=vertex_cut_edge_owner(g, part, k, threshold=40))
    with pytest.raises(ValueError):
        build_partitioned_graph(g, part, k, hub_identity=True)


def test_sharded_gat_fused_on_identity_build():
    """Fused sharded attention on a hub_identity build (the flagship
    k>1 config): the attention merges take the identity concat path
    with phantom slots — values must match the segment-softmax sharded
    path (phantom hub blocks must read zeros, init-padded chunks)."""
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gat_layer

    k = 4
    g = _powerlawish(96, 2200, seed=31)
    part = random_partition_assignment(g, k, seed=7)
    pg = build_partitioned_graph(g, part, k, hub=32, hub_dense_floor=64,
                                 hub_identity=True)
    assert pg.hub_meta is not None and pg.hub_meta.identity_expand
    mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
    rng = np.random.default_rng(1)
    h, d = 2, 8
    el = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(96, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(96, h, d)).astype(np.float32))
    seg = make_sharded_gat_layer(pg, mesh)
    fus = make_sharded_gat_layer(pg, mesh, fused=True)
    xs = (pg.shard_node_data(el), pg.shard_node_data(er),
          pg.shard_node_data(ft))
    y_seg = np.asarray(pg.unshard_node_data(jax.jit(seg)(*xs)))
    y_fus = np.asarray(pg.unshard_node_data(jax.jit(fus)(*xs)))
    mask = np.asarray(g.in_degrees()) > 0
    np.testing.assert_allclose(y_fus[mask], y_seg[mask],
                               rtol=2e-4, atol=2e-4)


def test_sharded_hub_identity_at_mesh1():
    """Mesh=1 on a hub_order-relabeled graph: the sharded hub layout
    must inherit identity_expand (the 4G fused-pad forward) and stay
    oracle-exact; at k>1 the padded parts must NOT claim identity."""
    from dgl1_tpu.parallel.sharded_ops import sharded_gspmm_combined

    g0 = _powerlawish(96, 2200, seed=23)
    e0 = g0.num_edges()
    g0 = dgl.graph((np.asarray(g0.src)[:e0], np.asarray(g0.dst)[:e0]),
                   num_nodes=96, hub=32, hub_dense_floor=64)
    g = dgl.reorder_graph(
        g0, node_permute_algo="custom",
        permute_config={"nodes_perm": dgl.hub_order(g0)})
    # reorder_graph rebuilds with default floors; re-attach the small
    # graph's hub layout for identity detection.
    eg = g.num_edges()
    g = dgl.graph((np.asarray(g.src)[:eg], np.asarray(g.dst)[:eg]),
                  num_nodes=96, hub=32, hub_dense_floor=64)
    pg1 = build_partitioned_graph(g, np.zeros(96, np.int32), 1,
                                  tiles=False, hub=32,
                                  hub_dense_floor=64)
    assert pg1.hub_meta.identity_expand

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("p",))
    feat = jnp.asarray(
        np.random.default_rng(3).normal(size=(96, 8)).astype(np.float32))
    x = pg1.shard_node_data_combined(feat)
    spec_pg = jax.tree.map(lambda _: P("p"), pg1)
    fn = jax.shard_map(
        lambda pg_l, xx: sharded_gspmm_combined(pg_l, xx[0], "p")[None],
        mesh=mesh1, in_specs=(spec_pg, P("p")), out_specs=P("p"),
        check_vma=False)
    y = np.asarray(jax.jit(fn)(pg1, x))[0, : pg1.n_loc]
    ref = np.asarray(dgl.ops.copy_u_sum(g, feat))
    np.testing.assert_allclose(y[:96], ref, rtol=1e-4, atol=1e-4)

    part4 = random_partition_assignment(g, 4, seed=1)
    pg4 = build_partitioned_graph(g, part4, 4, tiles=False, hub=32,
                                  hub_dense_floor=64)
    assert pg4.hub_meta is not None
    assert not pg4.hub_meta.identity_expand
