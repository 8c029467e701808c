"""Heterograph partitioning + sharded typed training tests.

Parity role: ``tests/distributed/test_partition.py`` on heterographs
(partition -> reassemble equals original; halo/inner flags consistent)
plus the sharded typed layer matching the single-device R-GCN oracle on
values AND grads (anchor: ``src/graph/transform/partition_hetero.cc ::
PartitionWithHalo``, DistDGL R-GCN training, SURVEY.md §2.1 METIS row /
§2.2 DistDGL row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import dgl1_tpu as dgl
from dgl1_tpu.heterograph import heterograph
from dgl1_tpu.parallel import (
    DistGraph,
    build_partitioned_hetero,
    hetero_edge_cut_fraction,
    hetero_partition_assignment,
    load_hetero_partition,
    make_sharded_rgcn_layer,
    partition_hetero_graph,
)

NUM_DEVICES = 8


def mesh8(k=NUM_DEVICES):
    return Mesh(np.array(jax.devices()[:k]), ("p",))


def make_hg(seed=0, np_=200, na=120, ni=30, e=600):
    rng = np.random.default_rng(seed)
    return heterograph({
        ("author", "writes", "paper"):
            (rng.integers(0, na, e), rng.integers(0, np_, e)),
        ("paper", "cites", "paper"):
            (rng.integers(0, np_, e), rng.integers(0, np_, e)),
        ("author", "affiliated", "inst"):
            (rng.integers(0, na, e // 2), rng.integers(0, ni, e // 2)),
        ("paper", "rev_writes", "author"):
            (rng.integers(0, np_, e), rng.integers(0, na, e)),
    }, num_nodes_dict={"paper": np_, "author": na, "inst": ni})


def rgcn_oracle(hg, feats, weights, selfw=None, norm="right"):
    """Single-device reference: sum_r A_r @ (x W_r), right norm, + self."""
    in_deg = {nt: np.zeros(hg.num_nodes(nt)) for nt in hg.ntypes}
    for c in hg.canonical_etypes:
        rel = hg[c]
        e = rel.num_edges()
        np.add.at(in_deg[c[2]], np.asarray(rel.dst)[:e], 1)
    out = {}
    for c in hg.canonical_etypes:
        st, _, dt = c
        y = dgl.ops.copy_u_sum(hg[c], feats[st] @ weights[c])
        out[dt] = out.get(dt, 0) + y
    for nt in out:
        if norm == "right":
            out[nt] = out[nt] / jnp.maximum(
                jnp.asarray(in_deg[nt], jnp.float32), 1.0)[:, None]
        if selfw is not None:
            out[nt] = out[nt] + feats[nt] @ selfw[nt]
    return out


def test_hetero_assignment_balance_and_coverage():
    hg = make_hg()
    part = hetero_partition_assignment(hg, 4, part_method="greedy")
    assert set(part) == set(hg.ntypes)
    for nt in hg.ntypes:
        assert len(part[nt]) == hg.num_nodes(nt)
    # All-types balance: the homogenized stream balances total weight.
    tot = np.concatenate([part[nt] for nt in hg.ntypes])
    sizes = np.bincount(tot, minlength=4)
    assert sizes.min() > 0
    cut = hetero_edge_cut_fraction(hg, part)
    rand = {nt: np.random.default_rng(1).integers(
        0, 4, hg.num_nodes(nt)).astype(np.int32) for nt in hg.ntypes}
    assert cut <= hetero_edge_cut_fraction(hg, rand) + 0.1


@pytest.mark.parametrize("tiles", [False, True])
def test_sharded_rgcn_layer_matches_oracle(tiles):
    hg = make_hg(seed=1, np_=100, na=60, ni=20, e=300 if tiles else 600)
    k = 4 if tiles else NUM_DEVICES
    part = hetero_partition_assignment(
        hg, k, part_method="random" if tiles else "greedy")
    phg = build_partitioned_hetero(hg, part, k, tiles=tiles)
    rng = np.random.default_rng(2)
    f_in, f_out = 12, 6
    feats = {nt: jnp.asarray(rng.normal(
        size=(hg.num_nodes(nt), f_in)).astype(np.float32))
        for nt in hg.ntypes}
    weights = {c: jnp.asarray(rng.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for c in hg.canonical_etypes}
    selfw = {nt: jnp.asarray(rng.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for nt in hg.ntypes}

    ref = rgcn_oracle(hg, feats, weights, selfw)
    layer = make_sharded_rgcn_layer(phg, mesh8(k))
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}
    out = jax.jit(lambda x, w, s: layer(x, w, s))(x, weights, selfw)
    assert set(out) == set(ref)
    for nt in ref:
        got = np.asarray(phg.unshard_node_data(nt, out[nt]))
        np.testing.assert_allclose(got, np.asarray(ref[nt]),
                                   rtol=1e-4, atol=1e-4)


def test_sharded_rgcn_grads_match_oracle():
    hg = make_hg(seed=3, np_=80, na=50, ni=16, e=400)
    part = hetero_partition_assignment(hg, NUM_DEVICES,
                                       part_method="greedy")
    phg = build_partitioned_hetero(hg, part, NUM_DEVICES)
    rng = np.random.default_rng(4)
    f = 8
    feats = {nt: jnp.asarray(rng.normal(
        size=(hg.num_nodes(nt), f)).astype(np.float32))
        for nt in hg.ntypes}
    weights = {c: jnp.asarray(rng.normal(
        size=(f, f)).astype(np.float32) * 0.1)
        for c in hg.canonical_etypes}
    selfw = {nt: jnp.asarray(rng.normal(
        size=(f, f)).astype(np.float32) * 0.1) for nt in hg.ntypes}
    layer = make_sharded_rgcn_layer(phg, mesh8())
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}

    def loss_sharded(w, s, x):
        out = layer(x, w, s)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values())

    gw, gs, gx = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
        weights, selfw, x)

    def loss_ref(w, s, feats):
        out = rgcn_oracle(hg, feats, w, s)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values())

    gw_ref, gs_ref, gf_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        weights, selfw, feats)
    for c in weights:
        np.testing.assert_allclose(np.asarray(gw[c]),
                                   np.asarray(gw_ref[c]),
                                   rtol=1e-3, atol=1e-4)
    for nt in selfw:
        np.testing.assert_allclose(np.asarray(gs[nt]),
                                   np.asarray(gs_ref[nt]),
                                   rtol=1e-3, atol=1e-4)
    # Feature grads come back through the all_to_all transpose.
    for nt in feats:
        got = np.asarray(phg.unshard_node_data(nt, gx[nt]))
        np.testing.assert_allclose(got, np.asarray(gf_ref[nt]),
                                   rtol=1e-3, atol=1e-4)


def test_hetero_partition_roundtrip(tmp_path):
    hg = make_hg(seed=5, np_=60, na=40, ni=12, e=200)
    rng = np.random.default_rng(6)
    hg.nframes["paper"]["feat"] = jnp.asarray(
        rng.normal(size=(60, 5)).astype(np.float32))
    hg.nframes["author"]["feat"] = jnp.asarray(
        rng.normal(size=(40, 3)).astype(np.float32))
    part = partition_hetero_graph(hg, "toy", 4, str(tmp_path),
                                  part_method="greedy")
    seen = {c: [] for c in hg.canonical_etypes}
    for p in range(4):
        lg, feats, book = load_hetero_partition(str(tmp_path), "toy", p)
        for c in hg.canonical_etypes:
            st, _, dt = c
            rel = lg[c]
            e = rel.num_edges()
            src_l = np.asarray(rel.src)[:e]
            dst_l = np.asarray(rel.dst)[:e]
            nid_s = np.asarray(lg.nframes[st]["orig_id"])
            nid_d = np.asarray(lg.nframes[dt]["orig_id"])
            eid = np.asarray(rel.edata["orig_id"])
            full = hg[c]
            fe = full.num_edges()
            np.testing.assert_array_equal(
                np.asarray(full.src)[:fe][eid], nid_s[src_l])
            np.testing.assert_array_equal(
                np.asarray(full.dst)[:fe][eid], nid_d[dst_l])
            # Every owned edge's dst is an inner node of this part.
            inner = np.asarray(lg.nframes[dt]["inner_node"])
            assert inner[dst_l].all()
            seen[c].append(eid)
        # Owned nodes match the assignment; features sliced per owner.
        for nt in hg.ntypes:
            inner = np.asarray(lg.nframes[nt]["inner_node"])
            nid = np.asarray(lg.nframes[nt]["orig_id"])
            np.testing.assert_array_equal(
                np.sort(nid[inner]), np.nonzero(part[nt] == p)[0])
            if "feat" in hg.nframes[nt]:
                np.testing.assert_allclose(
                    feats[nt]["feat"],
                    np.asarray(hg.nframes[nt]["feat"])[nid[inner]])
    for c in hg.canonical_etypes:
        got = np.sort(np.concatenate(seen[c]))
        np.testing.assert_array_equal(got, np.arange(hg[c].num_edges()))


def test_partition_graph_dispatches_hetero(tmp_path):
    from dgl1_tpu.parallel import partition_graph

    hg = make_hg(seed=7, np_=40, na=30, ni=10, e=120)
    part = partition_graph(hg, "dispatch", 2, str(tmp_path))
    assert set(part) == set(hg.ntypes)
    lg, feats, book = load_hetero_partition(str(tmp_path), "dispatch", 0)
    assert book["hetero"] is True


def test_dist_graph_hetero_facade():
    hg = make_hg(seed=8, np_=60, na=40, ni=12, e=200)
    rng = np.random.default_rng(9)
    hg.nframes["paper"]["feat"] = jnp.asarray(
        rng.normal(size=(60, 4)).astype(np.float32))
    dg = DistGraph(hg, 4)
    assert dg.hetero
    assert dg.num_nodes("paper") == 60
    # Global-id reads against the per-ntype shards.
    ids = np.array([3, 17, 42])
    np.testing.assert_allclose(
        dg.ndata["paper"]["feat"][ids],
        np.asarray(hg.nframes["paper"]["feat"])[ids])
    phg = dg.partitioned()
    assert phg.num_parts == 4
    # One sharded layer runs end to end through the facade's plan.
    f = 4
    feats = {nt: jnp.asarray(rng.normal(
        size=(hg.num_nodes(nt), f)).astype(np.float32))
        for nt in hg.ntypes}
    weights = {c: jnp.asarray(rng.normal(
        size=(f, f)).astype(np.float32) * 0.1)
        for c in hg.canonical_etypes}
    layer = make_sharded_rgcn_layer(phg, mesh8(4), norm="none")
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}
    out = layer(x, weights)
    ref = rgcn_oracle(hg, feats, weights, None, norm="none")
    for nt in ref:
        np.testing.assert_allclose(
            np.asarray(phg.unshard_node_data(nt, out[nt])),
            np.asarray(ref[nt]), rtol=1e-4, atol=1e-4)


def test_dist_graph_from_hetero_partition(tmp_path):
    hg = make_hg(seed=10, np_=50, na=30, ni=10, e=150)
    rng = np.random.default_rng(11)
    hg.nframes["paper"]["feat"] = jnp.asarray(
        rng.normal(size=(50, 3)).astype(np.float32))
    partition_hetero_graph(hg, "hostview", 3, str(tmp_path),
                           part_method="greedy")
    dg = DistGraph.from_hetero_partition(str(tmp_path), "hostview", 1)
    assert dg.hetero and dg.part_id == 1
    assert dg.num_nodes("paper") == 50
    assert dg.num_nodes() == 90
    # The local shard serves exactly this part's owned paper rows.
    own = dg.books["paper"].partid2nids(1)
    np.testing.assert_allclose(
        dg.ndata["paper"]["feat"][own],
        np.asarray(hg.nframes["paper"]["feat"])[own])
    # The per-host view cannot build a full halo plan.
    import pytest as _pytest
    with _pytest.raises(ValueError):
        dg.partitioned()


def test_sharded_typed_attention_matches_oracle():
    """Cross-relation softmax attention (HGT convention) vs a
    single-device dense oracle, values AND grads."""
    from dgl1_tpu.parallel.hetero import make_sharded_hetero_attention

    hg = make_hg(seed=12, np_=80, na=50, ni=16, e=350)
    part = hetero_partition_assignment(hg, 4, part_method="greedy")
    phg = build_partitioned_hetero(hg, part, 4)
    rng = np.random.default_rng(13)
    h, d = 2, 6
    etypes = hg.canonical_etypes
    el = {c: jnp.asarray(rng.normal(
        size=(hg.num_nodes(c[0]), h)).astype(np.float32))
        for c in etypes}
    er = {nt: jnp.asarray(rng.normal(
        size=(hg.num_nodes(nt), h)).astype(np.float32))
        for nt in hg.ntypes}
    ft = {c: jnp.asarray(rng.normal(
        size=(hg.num_nodes(c[0]), h, d)).astype(np.float32))
        for c in etypes}

    def oracle(el, er, ft):
        slope = 0.2
        num = {nt: np.zeros((hg.num_nodes(nt), h, d)) for nt in hg.ntypes}
        den = {nt: np.zeros((hg.num_nodes(nt), h)) for nt in hg.ntypes}
        m = {nt: np.full((hg.num_nodes(nt), h), -1e30)
             for nt in hg.ntypes}
        zs = {}
        for c in etypes:
            st, _, dt = c
            rel = hg[c]
            e = rel.num_edges()
            s = np.asarray(rel.src)[:e]
            t = np.asarray(rel.dst)[:e]
            z = np.asarray(el[c])[s] + np.asarray(er[dt])[t]
            z = np.where(z >= 0, z, slope * z)
            zs[c] = (s, t, z)
            np.maximum.at(m[dt], t, z)
        for c in etypes:
            st, _, dt = c
            s, t, z = zs[c]
            p = np.exp(z - m[dt][t])
            np.add.at(den[dt], t, p)
            np.add.at(num[dt], t, p[:, :, None] * np.asarray(ft[c])[s])
        return {nt: num[nt] / np.maximum(den[nt], 1e-30)[:, :, None]
                for nt in hg.ntypes if den[nt].sum() > 0}

    layer = make_sharded_hetero_attention(phg, mesh8(4))
    el_s = {c: phg.shard_node_data(c[0], v) for c, v in el.items()}
    er_s = {nt: phg.shard_node_data(nt, v) for nt, v in er.items()}
    ft_s = {c: phg.shard_node_data(c[0], v) for c, v in ft.items()}
    out = jax.jit(lambda a, b, c: layer(a, b, c))(el_s, er_s, ft_s)
    ref = oracle(el, er, ft)
    assert set(out) == set(ref)
    for nt in ref:
        got = np.asarray(phg.unshard_node_data(nt, out[nt]))
        np.testing.assert_allclose(got, ref[nt], rtol=1e-4, atol=1e-5)

    # Grads through the cross-relation softmax + halo transpose.
    def loss_sharded(el_s, er_s, ft_s):
        o = layer(el_s, er_s, ft_s)
        return sum(jnp.sum(jnp.sin(v)) for v in o.values())

    ge, gr, gf = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2)))(
        el_s, er_s, ft_s)

    def loss_ref(el, er, ft):
        slope = 0.2
        tot = 0.0
        num = {nt: 0.0 for nt in hg.ntypes}
        den = {nt: 0.0 for nt in hg.ntypes}
        m = {}
        zs = {}
        for c in etypes:
            st, _, dt = c
            rel = hg[c]
            e = rel.num_edges()
            s = np.asarray(rel.src)[:e]
            t = np.asarray(rel.dst)[:e]
            z = el[c][s] + er[dt][t]
            z = jnp.where(z >= 0, z, slope * z)
            zs[c] = (s, t, z)
            mr = jax.ops.segment_max(z, t,
                                     num_segments=hg.num_nodes(dt))
            m[dt] = mr if dt not in m or isinstance(m.get(dt), float) \
                else jnp.maximum(m[dt], mr)
        m = {nt: jax.lax.stop_gradient(jnp.maximum(v, -1e30))
             for nt, v in m.items()}
        for c in etypes:
            st, _, dt = c
            s, t, z = zs[c]
            p = jnp.exp(z - m[dt][t])
            den[dt] = den[dt] + jax.ops.segment_sum(
                p, t, num_segments=hg.num_nodes(dt))
            num[dt] = num[dt] + jax.ops.segment_sum(
                p[:, :, None] * ft[c][s], t,
                num_segments=hg.num_nodes(dt))
        for nt in hg.ntypes:
            if not isinstance(den[nt], float):
                o = num[nt] / jnp.maximum(den[nt], 1e-30)[:, :, None]
                tot = tot + jnp.sum(jnp.sin(o))
        return tot

    ge_r, gr_r, gf_r = jax.grad(loss_ref, argnums=(0, 1, 2))(el, er, ft)
    for c in etypes:
        np.testing.assert_allclose(
            np.asarray(phg.unshard_node_data(c[0], ge[c])),
            np.asarray(ge_r[c]), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(phg.unshard_node_data(c[0], gf[c])),
            np.asarray(gf_r[c]), rtol=1e-3, atol=1e-4)
    for nt in hg.ntypes:
        np.testing.assert_allclose(
            np.asarray(phg.unshard_node_data(nt, gr[nt])),
            np.asarray(gr_r[nt]), rtol=1e-3, atol=1e-4)


def test_hetero_empty_relation_and_isolated_dsttype():
    """A relation with zero edges and a dst type fed only by it must
    build and run (static padding covers both)."""
    hg = heterograph({
        ("a", "r1", "b"): (np.array([0, 1, 2]), np.array([0, 1, 0])),
        ("a", "r2", "c"): (np.zeros(0, np.int64), np.zeros(0, np.int64)),
    }, num_nodes_dict={"a": 4, "b": 2, "c": 3})
    part = hetero_partition_assignment(hg, 2, part_method="random")
    phg = build_partitioned_hetero(hg, part, 2)
    layer = make_sharded_rgcn_layer(phg, mesh8(2), norm="none")
    feats = {nt: jnp.ones((hg.num_nodes(nt), 4)) for nt in hg.ntypes}
    w = {c: jnp.ones((4, 4)) for c in hg.canonical_etypes}
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}
    out = layer(x, w)
    ref_b = np.asarray(dgl.ops.copy_u_sum(
        hg[("a", "r1", "b")], feats["a"] @ w[("a", "r1", "b")]))
    np.testing.assert_allclose(
        np.asarray(phg.unshard_node_data("b", out["b"])), ref_b,
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(phg.unshard_node_data("c", out["c"])), 0.0)


def test_mesh_size_mismatch_raises():
    hg = make_hg(seed=20, np_=30, na=20, ni=8, e=60)
    part = hetero_partition_assignment(hg, 4, part_method="random")
    phg = build_partitioned_hetero(hg, part, 4)
    with pytest.raises(ValueError, match="mesh axis"):
        make_sharded_rgcn_layer(phg, mesh8(2))


def test_sharded_rgcn_hub_engine_matches_oracle():
    """Per-relation HUB layouts inside the typed sharded local reduce
    (round 4): values AND grads vs the single-device oracle."""
    # Hub-heavy relations: concentrate dsts so the hub bar clears.
    rng = np.random.default_rng(9)
    e = 1200
    hg = heterograph({
        ("author", "writes", "paper"):
            (rng.integers(0, 60, e), rng.integers(0, 6, e)),
        ("paper", "cites", "paper"):
            (rng.integers(0, 100, e), rng.integers(0, 8, e)),
        ("author", "affiliated", "inst"):
            (rng.integers(0, 60, e // 2), rng.integers(0, 20, e // 2)),
    }, num_nodes_dict={"paper": 100, "author": 60, "inst": 20})
    k = 4
    part = hetero_partition_assignment(hg, k, part_method="random")
    phg = build_partitioned_hetero(hg, part, k, hub=16,
                                   hub_dense_floor=32)
    assert phg.hub is not None
    n_hub_rel = sum(1 for c in phg.etypes if phg.hub[c] is not None)
    assert n_hub_rel >= 2, f"expected hub layouts, got {n_hub_rel}"
    rng2 = np.random.default_rng(3)
    f_in, f_out = 12, 6
    feats = {nt: jnp.asarray(rng2.normal(
        size=(hg.num_nodes(nt), f_in)).astype(np.float32))
        for nt in hg.ntypes}
    weights = {c: jnp.asarray(rng2.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for c in hg.canonical_etypes}
    selfw = {nt: jnp.asarray(rng2.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for nt in hg.ntypes}

    ref = rgcn_oracle(hg, feats, weights, selfw)
    layer = make_sharded_rgcn_layer(phg, mesh8(k))
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}
    out = jax.jit(lambda x, w, s: layer(x, w, s))(x, weights, selfw)
    for nt in ref:
        got = np.asarray(phg.unshard_node_data(nt, out[nt]))
        np.testing.assert_allclose(got, np.asarray(ref[nt]),
                                   rtol=1e-4, atol=1e-4)

    # Grads wrt features AND relation weights through the hub vjp.
    def loss_sharded(x, w):
        out = layer(x, w, selfw)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values())

    gx, gw = jax.grad(loss_sharded, argnums=(0, 1))(x, weights)

    def loss_ref(feats, w):
        out = rgcn_oracle(hg, feats, w, selfw)
        return sum(jnp.sum(jnp.sin(v)) for v in out.values())

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, weights)
    for nt in feats:
        got = np.asarray(phg.unshard_node_data(nt, gx[nt]))
        np.testing.assert_allclose(got, np.asarray(gx_ref[nt]),
                                   rtol=1e-4, atol=1e-4)
    for c in weights:
        np.testing.assert_allclose(np.asarray(gw[c]),
                                   np.asarray(gw_ref[c]),
                                   rtol=1e-4, atol=2e-4)


def test_sharded_typed_identity_layouts_match_oracle():
    """Typed identity sharded path (PERF_NOTES r6): hub_identity=True
    orders each ntype's local ids hub-first by total in-degree and pins
    every relation's per-part layout to that shared numbering — ALL
    hub relations must claim identity_expand, and values AND grads must
    still match the single-device oracle (phantom slots/rows absorb
    per-(relation, part) gaps)."""
    rng = np.random.default_rng(9)
    e = 1200
    hg = heterograph({
        ("author", "writes", "paper"):
            (rng.integers(0, 60, e), rng.integers(0, 6, e)),
        ("paper", "cites", "paper"):
            (rng.integers(0, 100, e), rng.integers(0, 8, e)),
        ("author", "affiliated", "inst"):
            (rng.integers(0, 60, e // 2), rng.integers(0, 20, e // 2)),
    }, num_nodes_dict={"paper": 100, "author": 60, "inst": 20})
    k = 4
    part = hetero_partition_assignment(hg, k, part_method="random")
    phg = build_partitioned_hetero(hg, part, k, hub=16,
                                   hub_dense_floor=32, hub_identity=True)
    assert phg.hub is not None
    for c in phg.etypes:
        assert phg.hub.get(c) is not None
        assert phg.hub_meta[c].identity_expand, c

    rng2 = np.random.default_rng(3)
    f_in, f_out = 12, 6
    feats = {nt: jnp.asarray(rng2.normal(
        size=(hg.num_nodes(nt), f_in)).astype(np.float32))
        for nt in hg.ntypes}
    weights = {c: jnp.asarray(rng2.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for c in hg.canonical_etypes}
    selfw = {nt: jnp.asarray(rng2.normal(
        size=(f_in, f_out)).astype(np.float32) * 0.1)
        for nt in hg.ntypes}

    ref = rgcn_oracle(hg, feats, weights, selfw)
    layer = make_sharded_rgcn_layer(phg, mesh8(k))
    x = {nt: phg.shard_node_data(nt, feats[nt]) for nt in hg.ntypes}
    out = jax.jit(lambda x, w, s: layer(x, w, s))(x, weights, selfw)
    for nt in ref:
        got = np.asarray(phg.unshard_node_data(nt, out[nt]))
        np.testing.assert_allclose(got, np.asarray(ref[nt]),
                                   rtol=1e-4, atol=1e-4)

    def loss_sharded(x, w):
        o = layer(x, w, selfw)
        return sum(jnp.sum(jnp.sin(v)) for v in o.values())

    def loss_ref(feats, w):
        o = rgcn_oracle(hg, feats, w, selfw)
        return sum(jnp.sum(jnp.sin(v)) for v in o.values())

    gx, gw = jax.grad(loss_sharded, argnums=(0, 1))(x, weights)
    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(feats, weights)
    for nt in feats:
        got = np.asarray(phg.unshard_node_data(nt, gx[nt]))
        np.testing.assert_allclose(got, np.asarray(gx_ref[nt]),
                                   rtol=1e-3, atol=1e-3)
    for c in weights:
        np.testing.assert_allclose(np.asarray(gw[c]),
                                   np.asarray(gw_ref[c]),
                                   rtol=1e-3, atol=1e-3)
