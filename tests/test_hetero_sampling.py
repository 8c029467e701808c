"""Heterogeneous sampled minibatch pipeline + static-shape block contract.

Mirrors the reference's hetero sampling surface (per-etype fanout in
``sample_neighbors``, hetero ``to_block``, dataloader over a seed ntype —
``src/graph/sampling/neighbor/neighbor.cc`` per-etype fanout and
``python/dgl/dataloading/neighbor.py``), plus the TPU-native static-shape
invariants: every mini-batch of an epoch flattens to the SAME pytree
structure and leaf shapes, so one XLA program serves the epoch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgl1_tpu.dataloading.dataloader import NodeDataLoader
from dgl1_tpu.dataloading.neighbor_sampler import NeighborSampler
from dgl1_tpu.heterograph import heterograph
from dgl1_tpu.ops import gspmm
from dgl1_tpu.sampling.neighbor import sample_neighbors
from dgl1_tpu.transform import to_block


def _mag_ish(rng, n_paper=500, n_author=300, n_field=50):
    return heterograph({
        ("author", "writes", "paper"): (
            rng.integers(0, n_author, 2000), rng.integers(0, n_paper, 2000)),
        ("paper", "cites", "paper"): (
            rng.integers(0, n_paper, 3000), rng.integers(0, n_paper, 3000)),
        ("field", "topic_of", "paper"): (
            rng.integers(0, n_field, 1000), rng.integers(0, n_paper, 1000)),
        ("paper", "has_topic", "field"): (
            rng.integers(0, n_paper, 1000), rng.integers(0, n_field, 1000)),
    }, num_nodes_dict={"paper": n_paper, "author": n_author,
                       "field": n_field})


FANOUT = {"writes": 3, "cites": 5, "topic_of": 2, "has_topic": 4}


def test_hetero_sample_neighbors_per_etype_fanout(rng):
    hg = _mag_ish(rng)
    seeds = {"paper": np.arange(50)}
    fr = sample_neighbors(hg, seeds, FANOUT, rng=rng)
    for c in hg.canonical_etypes:
        rel = fr.rel_graphs[c]
        e = rel.num_edges()
        if c[2] != "paper":
            assert e == 0  # no seeds of that dst type
            continue
        dst = np.asarray(rel.dst)[:e]
        src = np.asarray(rel.src)[:e]
        eid = np.asarray(rel.edata["_ID"])[:e]
        k = FANOUT[c[1]]
        deg = np.bincount(dst, minlength=hg.num_nodes("paper"))
        assert deg.max(initial=0) <= k
        assert deg[50:].sum() == 0  # only seeds receive edges
        # fanout respected exactly: min(parent in-degree, k) per seed
        parent = hg.rel_graphs[c]
        pdeg = np.diff(np.asarray(parent.csc_indptr))
        for v in range(50):
            assert deg[v] == min(int(pdeg[v]), k)
        # edge-id round trip into the parent relation
        pe = parent.num_edges()
        assert np.array_equal(np.asarray(parent.src)[:pe][eid], src)
        assert np.array_equal(np.asarray(parent.dst)[:pe][eid], dst)
        # without replacement: unique edge ids per seed
        for v in np.unique(dst):
            sel = eid[dst == v]
            assert len(np.unique(sel)) == len(sel)


def test_hetero_sample_neighbors_int_fanout_and_zero(rng):
    hg = _mag_ish(rng)
    fr = sample_neighbors(hg, {"paper": np.arange(20)}, 2, rng=rng)
    for c in fr.canonical_etypes:
        e = fr.rel_graphs[c].num_edges()
        if c[2] == "paper":
            dst = np.asarray(fr.rel_graphs[c].dst)[:e]
            assert np.bincount(dst, minlength=1).max(initial=0) <= 2
    fr0 = sample_neighbors(hg, {"paper": np.arange(20)},
                           {**FANOUT, "cites": 0}, rng=rng)
    assert fr0.rel_graphs[("paper", "cites", "paper")].num_edges() == 0


def test_hetero_to_block_invariants(rng):
    hg = _mag_ish(rng)
    seeds = {"paper": np.arange(30)}
    fr = sample_neighbors(hg, seeds, FANOUT, rng=rng)
    blk = to_block(fr, seeds)
    assert blk.is_block
    # dst-in-src prefix: the paper src list starts with the seeds
    assert np.array_equal(
        np.asarray(blk.srcframes["paper"]["_ID"])[:30], np.arange(30))
    assert blk.meta["num_real_dst"]["paper"] == 30
    for c in blk.canonical_etypes:
        rel = blk.rel_graphs[c]
        e = rel.num_real_edges()
        if e == 0:
            continue
        lsrc = np.asarray(rel.src)[:e]
        ldst = np.asarray(rel.dst)[:e]
        eid = np.asarray(rel.edata["_ID"])[:e]
        psrc = np.asarray(blk.srcframes[c[0]]["_ID"])[lsrc]
        pdst = np.asarray(blk.nframes[c[2]]["_ID"])[ldst]
        parent = hg.rel_graphs[c]
        pe = parent.num_edges()
        assert np.array_equal(np.asarray(parent.src)[:pe][eid], psrc)
        assert np.array_equal(np.asarray(parent.dst)[:pe][eid], pdst)
        # real src ids occupy a prefix per ntype
        nrs = blk.meta["num_real_src"][c[0]]
        assert lsrc.max(initial=0) < nrs


def test_hetero_dataloader_static_shapes_and_single_trace(rng):
    hg = _mag_ish(rng)
    sampler = NeighborSampler([FANOUT, FANOUT])
    # 130 seeds / batch 32 -> 5 batches incl. a partial one (static pads).
    dl = NodeDataLoader(hg, {"paper": np.arange(130)}, sampler,
                        batch_size=32, prefetch=0, seed=0)
    structures = set()
    traces = [0]

    @jax.jit
    def fwd(blocks, x):
        traces[0] += 1
        h = {}
        for c in blocks[0].canonical_etypes:
            rel = blocks[0].rel_graphs[c]
            out = gspmm(rel, "copy_lhs", "sum", x[c[0]], None)
            h[c[2]] = h.get(c[2], 0) + out
        return h["paper"].sum()

    feats = {nt: jnp.asarray(rng.normal(size=(hg.num_nodes(nt), 8))
                             .astype(np.float32)) for nt in hg.ntypes}
    n_batches = 0
    for inp, out, blocks, mask in dl:
        flat, treedef = jax.tree_util.tree_flatten(blocks)
        structures.add((treedef, tuple(np.shape(l) for l in flat)))
        x = {nt: feats[nt][jnp.asarray(ids)] for nt, ids in inp.items()}
        fwd(blocks, x)
        n_batches += 1
    assert n_batches == 5
    assert len(structures) == 1  # ONE static structure for the epoch
    assert traces[0] == 1  # hence ONE compiled program


def test_hetero_padded_matches_unpadded_oracle(rng):
    """The statically padded block computes the same per-seed aggregation
    as an unpadded block built from the same frontier (values + grads)."""
    hg = _mag_ish(rng)
    seeds = {"paper": np.arange(40)}
    fr = sample_neighbors(hg, seeds, FANOUT, rng=rng)
    pad_src = {"paper": 400, "author": 200, "field": 150}
    pad_edges = {c: 40 * FANOUT[c[1]] if c[2] == "paper" else 0
                 for c in hg.canonical_etypes}
    ks = {c: FANOUT[c[1]] for c in hg.canonical_etypes}
    blk_p = to_block(fr, seeds, pad_src_to=pad_src, pad_edges_to=pad_edges,
                     uniform_k=ks)
    blk_u = to_block(fr, seeds)

    c = ("author", "writes", "paper")
    n_auth_p = blk_p.num_src_nodes("author")
    n_auth_u = blk_u.num_src_nodes("author")
    x = jnp.asarray(rng.normal(size=(n_auth_p, 8)).astype(np.float32))
    # Padded src rows map to parent 0; the unpadded block's rows are the
    # real prefix of the padded block's rows.
    xu = x[:n_auth_u]

    def f_p(x):
        return gspmm(blk_p.rel_graphs[c], "copy_lhs", "sum", x, None)

    def f_u(x):
        return gspmm(blk_u.rel_graphs[c], "copy_lhs", "sum", x, None)

    out_p, out_u = f_p(x), f_u(xu)
    assert np.allclose(out_p[:40], out_u[:40], atol=1e-5)
    g_p = jax.grad(lambda a: (f_p(a) ** 2).sum())(x)
    g_u = jax.grad(lambda a: (f_u(a) ** 2).sum())(xu)
    assert np.allclose(g_p[:n_auth_u], g_u, atol=1e-4)
    assert np.allclose(g_p[n_auth_u:], 0.0)


def test_homo_partial_batch_pad_seeds_not_aliased(rng):
    """Regression: a partial batch padded by repeating the last seed must
    NOT alias the duplicate ids onto one relabeled dst row (which zeroed
    the last real seed's aggregation and inflated the pad row's)."""
    import dgl1_tpu as dgl

    g = dgl.rand_graph(200, 4000, seed=7)
    feat = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    sampler = NeighborSampler([4])
    # 40 seeds, batch 32 -> second batch has 8 real + 24 pad copies.
    dl = NodeDataLoader(g, np.arange(40), sampler, batch_size=32,
                        shuffle=False, prefetch=0, seed=0)
    batches = list(dl)
    inp, out, blocks, mask = batches[1]
    assert mask.sum() == 8
    h = gspmm(blocks[0], "copy_lhs", "sum",
              feat[jnp.asarray(inp)], None)
    # Oracle: aggregate each real seed's sampled in-edges directly.
    b = blocks[0]
    ne = b.num_real_edges()
    lsrc = np.asarray(b.src)[:ne]
    ldst = np.asarray(b.dst)[:ne]
    ref = np.zeros((32, 8), np.float32)
    np.add.at(ref, ldst,
              np.asarray(feat)[np.asarray(b.srcdata["_ID"])[lsrc]])
    assert np.allclose(np.asarray(h)[:8], ref[:8], atol=1e-5)
    # The last real seed (local row 7) aggregates its own edges, and pad
    # rows received no edges at all.
    assert np.bincount(ldst, minlength=32)[8:].sum() == 0


def test_hetero_block_frames_and_views(rng):
    hg = _mag_ish(rng)
    seeds = {"paper": np.arange(10)}
    fr = sample_neighbors(hg, seeds, FANOUT, rng=rng)
    blk = to_block(fr, seeds)
    assert set(blk.srctypes) == {"paper", "author", "field"}
    assert blk.dsttypes == ["paper"]
    assert blk.num_dst_nodes("paper") == 10
    assert blk.num_dst_nodes("author") == 0
    # srcnodes / dstnodes accessors
    assert np.array_equal(np.asarray(blk.srcnodes["paper"].data["_ID"][:10]),
                          np.arange(10))
    assert "_ID" in blk.dstnodes["paper"].data
    with pytest.raises(ValueError):
        blk.num_nodes()
    # pytree round trip preserves block structure
    flat, treedef = jax.tree_util.tree_flatten(blk)
    blk2 = jax.tree_util.tree_unflatten(treedef, flat)
    assert blk2.is_block
    assert blk2.num_src_nodes("author") == blk.num_src_nodes("author")


def test_hetero_sampled_training_loss_decreases(rng):
    """End-to-end sampled hetero (R-GCN-style) training under one jit."""
    import flax.linen as nn
    import optax

    from dgl1_tpu.nn.conv import GraphConv
    from dgl1_tpu.nn.hetero import HeteroGraphConv

    hg = _mag_ish(rng)
    feats = {nt: jnp.asarray(rng.normal(size=(hg.num_nodes(nt), 8))
                             .astype(np.float32)) for nt in hg.ntypes}
    labels = jnp.asarray(rng.integers(0, 3, hg.num_nodes("paper")))

    class Net(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            ets = list(FANOUT)
            h = HeteroGraphConv({e: GraphConv(8) for e in ets},
                                name="l0")(blocks[0], x)
            h = {k: nn.relu(v) for k, v in h.items()}
            return HeteroGraphConv({e: GraphConv(3) for e in ets},
                                   name="l1")(blocks[1], h)["paper"]

    model = Net()
    dl = NodeDataLoader(hg, {"paper": np.arange(200)},
                        NeighborSampler([FANOUT, FANOUT]),
                        batch_size=64, prefetch=0, seed=0)
    inp, out, blocks, mask = next(iter(dl))
    x0 = {nt: feats[nt][jnp.asarray(ids)] for nt, ids in inp.items()}
    params = model.init(jax.random.PRNGKey(0), blocks, x0)
    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, y, m):
        def loss_fn(p):
            ls = optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, blocks, x), y)
            return jnp.sum(ls * m) / jnp.maximum(m.sum(), 1)

        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    first = last = None
    for epoch in range(5):
        tot = n = 0.0
        for inp, out, blocks, mask in dl:
            x = {nt: feats[nt][jnp.asarray(ids)] for nt, ids in inp.items()}
            y = labels[jnp.asarray(out["paper"])]
            params, opt_state, loss = step(
                params, opt_state, blocks, x, y,
                jnp.asarray(mask, jnp.float32))
            tot += float(loss)
            n += 1
        if first is None:
            first = tot / n
        last = tot / n
    assert last < first


def test_hetero_sample_neighbors_out_direction(rng):
    hg = _mag_ish(rng)
    seeds = {"paper": np.arange(40)}
    fr = sample_neighbors(hg, seeds, FANOUT, edge_dir="out", rng=rng)
    for c in hg.canonical_etypes:
        rel = fr.rel_graphs[c]
        e = rel.num_edges()
        if c[0] != "paper":
            assert e == 0  # no seeds of that SRC type
            continue
        src = np.asarray(rel.src)[:e]
        eid = np.asarray(rel.edata["_ID"])[:e]
        k = FANOUT[c[1]]
        odeg = np.bincount(src, minlength=hg.num_nodes("paper"))
        assert odeg.max(initial=0) <= k
        assert odeg[40:].sum() == 0  # only seeds emit edges
        # Sampled edges exist in the parent with matching endpoints.
        parent = hg.rel_graphs[c]
        ps = np.asarray(parent.src)[eid]
        pd = np.asarray(parent.dst)[eid]
        np.testing.assert_array_equal(ps, src)
        np.testing.assert_array_equal(pd, np.asarray(rel.dst)[:e])
        # fanout respected exactly: min(parent out-degree, k) per seed
        pdeg = np.diff(np.asarray(parent.csr_indptr))
        np.testing.assert_array_equal(
            odeg[:40], np.minimum(pdeg[:40], k))


def test_hetero_sample_blocks_exclude_eids(rng):
    hg = _mag_ish(rng)
    sampler = NeighborSampler([FANOUT, FANOUT], static_shapes=False)
    seeds = {"paper": np.arange(30)}
    # Exclude half the 'cites' edges by id; they must never appear in any
    # block of that relation.
    exc = np.arange(0, 3000, 2)
    _, _, blocks = sampler.sample_blocks(
        hg, seeds, rng=rng, exclude_eids={("paper", "cites", "paper"): exc})
    seen = []
    for blk in blocks:
        rel = blk.rel_graphs[("paper", "cites", "paper")]
        e = rel.num_edges()
        if e and "_ID" in rel.edata:
            seen.append(np.asarray(rel.edata["_ID"])[:e])
    seen = np.concatenate(seen) if seen else np.zeros(0, np.int64)
    assert not np.isin(seen, exc).any()
    # Other relations still sample normally.
    assert any(
        blk.rel_graphs[("author", "writes", "paper")].num_edges() > 0
        for blk in blocks)


def test_hetero_edge_dataloader_link_pred(rng):
    from dgl1_tpu.dataloading.edge_dataloader import EdgeDataLoader
    from dgl1_tpu.dataloading.negative_sampler import Uniform

    n_u, n_v, E = 40, 30, 200
    s = rng.integers(0, n_u, E)
    d = rng.integers(0, n_v, E)
    hg = heterograph({
        ("u", "likes", "v"): (s, d),
        ("v", "liked_by", "u"): (d, s),  # edge i == reverse of edge i
    }, num_nodes_dict={"u": n_u, "v": n_v})
    sampler = NeighborSampler([{"likes": 3, "liked_by": 3}] * 2,
                              static_shapes=False)
    loader = EdgeDataLoader(
        hg, {"likes": np.arange(E)}, sampler, batch_size=64,
        negative_sampler=Uniform(2), exclude="reverse_types",
        reverse_etypes={"likes": "liked_by"}, seed=0)
    c = ("u", "likes", "v")
    rc = ("v", "liked_by", "u")
    n_batches = 0
    for input_nodes, pos, neg, blocks in loader:
        n_batches += 1
        rel = pos.rel_graphs[c]
        e = rel.num_edges()
        assert e == 64
        # Pair-graph endpoints map back to real parent edges.
        uid = np.asarray(pos.nframes["u"]["_ID"])
        vid = np.asarray(pos.nframes["v"]["_ID"])
        gs = uid[np.asarray(rel.src)[:e]]
        gd = vid[np.asarray(rel.dst)[:e]]
        key = set(zip(s.tolist(), d.tolist()))
        assert all((a, b) in key for a, b in zip(gs, gd))
        # Negatives: 2 per positive, src-preserving.
        nrel = neg.rel_graphs[c]
        assert nrel.num_edges() == 128
        # Exclusion: no batch edge id appears in any block, in EITHER
        # direction.
        batch_ids = set()
        for blk in blocks:
            for cc in (c, rc):
                r = blk.rel_graphs[cc]
                ee = r.num_edges()
                if ee and "_ID" in r.edata:
                    batch_ids |= set(
                        np.asarray(r.edata["_ID"])[:ee].tolist())
        # The loader excluded THIS batch's eids; we can't know them
        # directly here, but reverse_types symmetry means any sampled
        # (src,dst) pair of the batch would have to come from another
        # edge id. Check structural: sampled ids are valid parent ids.
        assert all(0 <= i < E for i in batch_ids)
    assert n_batches == 3


def test_hetero_edge_exclusion_blocks_batch_edges(rng):
    from dgl1_tpu.dataloading.edge_dataloader import as_edge_prediction_sampler

    n_u, n_v, E = 20, 15, 80
    s = rng.integers(0, n_u, E)
    d = rng.integers(0, n_v, E)
    hg = heterograph({
        ("u", "likes", "v"): (s, d),
        ("v", "liked_by", "u"): (d, s),
    }, num_nodes_dict={"u": n_u, "v": n_v})
    sampler = NeighborSampler([{"likes": -1, "liked_by": -1}],
                              static_shapes=False)
    wrapped = as_edge_prediction_sampler(
        sampler, exclude="reverse_types",
        reverse_etypes={"likes": "liked_by"})
    batch = np.arange(0, 40)
    _, pos, neg, blocks = wrapped.sample_hetero(
        hg, {"likes": batch}, rng=rng)
    c = ("u", "likes", "v")
    rc = ("v", "liked_by", "u")
    for blk in blocks:
        for cc in (c, rc):
            r = blk.rel_graphs[cc]
            ee = r.num_edges()
            if ee and "_ID" in r.edata:
                ids = np.asarray(r.edata["_ID"])[:ee]
                assert not np.isin(ids, batch).any(), cc
