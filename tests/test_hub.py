"""Hub-dense HYB engine vs XLA oracle: values + gradients.

Same dual-path contract as test_ell.py / test_pallas.py (the reference's
``tests/compute/test_kernel.py`` pattern): every covered (op, reduce)
pair must match the jnp gather/segment oracle on values AND grads, on
skewed (power-law-ish) graphs where the hub path actually engages.

The engine has three tiers (dense count-matrix / chunked one-hot / ELL
tail); tests run in three configurations that pin each tier combination:
``chunked`` (dense disabled), ``dense`` (everything dense), ``mixed``
(dense group + chunked group + tail).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.hub_format import BLK, CHUNK, SENT
from dgl1_tpu.ops.engine_hub import gspmm_hub
from dgl1_tpu.ops.engine_xla import gspmm_xla

N, E = 300, 3000

CONFIGS = {
    # min_group_edges, dense_floor
    "chunked": (300, 1 << 40),
    "dense": (300, 1),
    "mixed": (300, 1000),
}


def make_skewed(config="chunked", n=N, e=E, pad=0, seed=0):
    """Half Zipf + half uniform destinations: a dense hub head (group 0
    ~2/3 of edges), a mid group (~600 edges) and a real spread-out tail —
    so each config pins a distinct tier combination."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=e)
    dst = np.concatenate([
        rng.zipf(1.7, size=e // 2) % n,
        rng.integers(0, n, size=e - e // 2),
    ]).astype(np.int64)
    rng.shuffle(dst)
    floor, dense_floor = CONFIGS[config]
    return dgl.graph((src, dst), num_nodes=n, hub=floor,
                     hub_dense_floor=dense_floor,
                     pad_edges_to=e + pad if pad else None)


def data(seed=1, f=10, shift=2.0, e_rows=E, e_feat=(1,)):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(N, f)).astype(np.float32)) + shift
    e = jnp.asarray(
        rng.normal(size=(e_rows,) + e_feat).astype(np.float32)) + shift
    return u, e


def test_hub_tier_configs_are_distinct():
    mc = make_skewed("chunked").hub_dst_meta
    md = make_skewed("dense").hub_dst_meta
    mm = make_skewed("mixed").hub_dst_meta
    assert mc.n_dense == 0 and mc.n_groups >= 1
    assert md.n_dense == md.n_groups >= 1
    assert mm.n_dense >= 1 and mm.n_groups > mm.n_dense
    assert mm.covered < E  # mixed config keeps a real ELL tail


def test_hub_structure_sane():
    g = make_skewed()
    assert g.hub_dst is not None
    m = g.hub_dst_meta
    assert m.n_win == -(-N // BLK)
    # Every real fwd slot's eid maps back to itself.
    fa = np.asarray(g.hub_dst["full_fwd"]["a"])
    fe = np.asarray(g.hub_dst["full_fwd"]["eid"])
    real = fa >= 0
    assert m.covered == int(real.sum()) == E - int(
        (np.asarray(g.hub_dst["edge_to_tslot"]) != SENT).sum()
    )
    e2f = np.asarray(g.hub_dst["edge_to_fslot"])
    assert (e2f[fe[real]] == np.flatnonzero(real)).all()
    assert len(fa) == m.n_full_f * CHUNK


def _edges_from_chunks(lay, a_is_src, group_offset=0):
    """Reconstruct (src, dst_slot) keys from a chunk layout."""
    per_in = np.repeat(np.asarray(lay["in_id"]), CHUNK).astype(np.int64)
    per_out = np.repeat(np.asarray(lay["out_id"]), CHUNK).astype(np.int64)
    a = np.asarray(lay["a"]).astype(np.int64)
    b = np.asarray(lay["b"]).astype(np.int64)
    real = a >= 0
    if a_is_src:
        src = per_in[real] * BLK + a[real]
        slot = (per_out[real] + group_offset) * BLK + b[real]
    else:
        slot = per_in[real] * BLK + a[real]
        src = (per_out[real] + 0) * BLK + b[real]
    return np.sort(src * (1 << 32) + slot)


def test_hub_chunk_layouts_encode_same_edges():
    """full fwd/bwd layouts encode the hub edge multiset; part layouts +
    dense count matrix together cover it too."""
    g = make_skewed("mixed")
    hub, m = g.hub_dst, g.hub_dst_meta
    fwd = _edges_from_chunks(hub["full_fwd"], a_is_src=True)
    bwd = _edges_from_chunks(hub["full_bwd"], a_is_src=False)
    assert len(fwd) == m.covered
    np.testing.assert_array_equal(fwd, bwd)
    # Ground truth from the COO arrays.
    src = np.asarray(g.src)[: g.num_edges()]
    dst = np.asarray(g.dst)[: g.num_edges()]
    hub_ids = np.asarray(hub["hub_ids"])
    slot_of = {int(r): i for i, r in enumerate(hub_ids) if r != SENT}
    truth = np.sort(np.array(
        [int(s) * (1 << 32) + slot_of[int(d)]
         for s, d in zip(src, dst) if int(d) in slot_of], dtype=np.int64
    ))
    np.testing.assert_array_equal(fwd, truth)
    # Dense C + part layout partition the hub set.
    part = _edges_from_chunks(hub["part_fwd"], a_is_src=True,
                              group_offset=m.n_dense)
    c = np.asarray(hub["dense_c"])
    dense_keys = []
    for (s, k), cnt in np.ndenumerate(c):
        dense_keys += [s * (1 << 32) + k] * int(cnt)
    both = np.sort(np.concatenate([part, np.array(dense_keys, np.int64)]))
    np.testing.assert_array_equal(both, truth)


@pytest.mark.parametrize("config", list(CONFIGS))
@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
@pytest.mark.parametrize("red", ["sum", "mean"])
def test_hub_forward_matches_xla(config, op, red):
    g = make_skewed(config)
    u, e = data()
    ee = e if op == "mul" else None
    a = gspmm_hub(g, op, red, u, ee)
    assert a is not None
    b = gspmm_xla(g, op, red, u, ee)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("config", list(CONFIGS))
@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
def test_hub_grad_matches_xla(config, op):
    g = make_skewed(config)
    # Zero-mean data: hub rows sum ~1000 edges, and a mean offset makes
    # the f32 accumulation-order difference between the MXU path and the
    # segment oracle visible through the sin() loss. The vjp itself is
    # exact (fixed-cotangent comparison agrees to 2e-6).
    u, e = data(2, shift=0.0)

    def mk(fn):
        def loss(u, e):
            return jnp.sum(jnp.sin(fn(
                g, op, "sum", u, e if op == "mul" else None)))

        return loss

    gp = jax.grad(mk(gspmm_hub), argnums=(0, 1))(u, e)
    gx = jax.grad(mk(gspmm_xla), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("config", list(CONFIGS))
@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
def test_hub_wide_features_multi_block(config, op):
    """f > 128 exercises the kernels' in-kernel feature-block loop —
    values AND grads must match the oracle across every 128-lane stripe
    (a stripe-indexing bug shows as exact-zero or duplicated stripes)."""
    g = make_skewed(config)
    u, e = data(3, f=200, shift=0.0)
    ee = e if op == "mul" else None
    a = gspmm_hub(g, op, "sum", u, ee)
    b = gspmm_xla(g, op, "sum", u, ee)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def mk(fn):
        def loss(u, e):
            return jnp.sum(jnp.sin(fn(
                g, op, "sum", u, e if op == "mul" else None)))

        return loss

    gp = jax.grad(mk(gspmm_hub), argnums=(0, 1))(u, e)
    gx = jax.grad(mk(gspmm_xla), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("config", list(CONFIGS))
@pytest.mark.parametrize("op", ["copy_lhs", "mul", "copy_rhs"])
def test_hub_self_loop_diagonal(config, op):
    """add_self_loop graphs: single self-loop tail edges are extracted
    to the node-level diagonal (hub_format ``has_diag``) — values AND
    grads (incl. grad_e at the extracted edge ids) must match the
    oracle."""
    base = make_skewed(config)
    e0 = base.num_edges()
    src = np.asarray(base.src)[:e0]
    dst = np.asarray(base.dst)[:e0]
    loops = np.arange(N, dtype=src.dtype)
    floor, dense_floor = CONFIGS[config]
    g = dgl.graph((np.concatenate([src, loops]),
                   np.concatenate([dst, loops])), num_nodes=N, hub=floor,
                  hub_dense_floor=dense_floor)
    if not g.hub_dst_meta.has_diag:
        pytest.skip("all loops landed on hub destinations")
    u, e = data(7, shift=0.0, e_rows=g.num_edges_padded())
    ee = None if op == "copy_lhs" else e
    uu = None if op == "copy_rhs" else u
    a = gspmm_hub(g, op, "sum", uu, ee)
    b = gspmm_xla(g, op, "sum", uu, ee)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def mk(fn):
        def loss(u, e):
            return jnp.sum(jnp.sin(fn(
                g, op, "sum",
                None if op == "copy_rhs" else u,
                None if op == "copy_lhs" else e)))

        return loss

    gp = jax.grad(mk(gspmm_hub), argnums=(0, 1))(u, e)
    gx = jax.grad(mk(gspmm_xla), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


def test_hub_padded_edges():
    g = make_skewed("mixed", pad=53)
    u, e = data(3, e_rows=E + 53)
    a = gspmm_hub(g, "mul", "sum", u, e)
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    ge = jax.grad(
        lambda e: jnp.sum(gspmm_hub(g, "mul", "sum", u, e) ** 2)
    )(e)
    np.testing.assert_allclose(np.asarray(ge)[E:], 0.0)


def test_hub_multihead_feats():
    """u with extra feature dims (H, D) and scalar edge weight (E, 1, 1)."""
    g = make_skewed("mixed")
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(N, 3, 5)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 1, 1)).astype(np.float32))
    a = gspmm_hub(g, "mul", "sum", u, e)
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    # copy_lhs with multi-dim feats exercises dense+part tiers too.
    a = gspmm_hub(g, "copy_lhs", "sum", u, None)
    b = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_hub_declines_uncovered():
    g = make_skewed()
    u, _ = data()
    e_bad = jnp.ones((E, 7))  # head count mismatches u's leading dim
    assert gspmm_hub(g, "mul", "sum", u, e_bad) is None
    assert gspmm_hub(g, "copy_lhs", "max", u, None) is None
    assert gspmm_hub(g, "add", "sum", u, jnp.ones((E, 10))) is None
    g2 = dgl.rand_graph(50, 100, seed=1)  # below density bar: no format
    assert g2.hub_dst is None
    assert gspmm_hub(g2, "copy_lhs", "sum", u[:50], None) is None


@pytest.mark.parametrize("config", list(CONFIGS))
def test_hub_gat_pattern_multihead(config):
    """u_mul_e with u (N, H, D) and e (E, H, 1) — the GAT attention SpMM."""
    g = make_skewed(config)
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.normal(size=(N, 4, 6)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 4, 1)).astype(np.float32))
    a = gspmm_hub(g, "mul", "sum", u, e)
    assert a is not None
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def mk(fn):
        return lambda u, e: jnp.sum(jnp.sin(fn(g, "mul", "sum", u, e)))

    gp = jax.grad(mk(gspmm_hub), argnums=(0, 1))(u, e)
    gx = jax.grad(mk(gspmm_xla), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


def test_hub_full_feature_weights():
    """u_mul_e with e (E, F): per-head with rep=1."""
    g = make_skewed("mixed")
    rng = np.random.default_rng(10)
    u = jnp.asarray(rng.normal(size=(N, 10)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 10)).astype(np.float32))
    a = gspmm_hub(g, "mul", "sum", u, e)
    assert a is not None
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda u, e: jnp.sum(
        gspmm_hub(g, "mul", "sum", u, e) ** 2), argnums=(0, 1))(u, e)
    gx = jax.grad(lambda u, e: jnp.sum(
        gspmm_xla(g, "mul", "sum", u, e) ** 2), argnums=(0, 1))(u, e)
    np.testing.assert_allclose(gp[0], gx[0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gp[1], gx[1], rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("config", list(CONFIGS))
def test_hub_copy_rhs(config):
    """copy_e + sum — the edge-softmax denominator pattern."""
    g = make_skewed(config)
    rng = np.random.default_rng(11)
    e = jnp.asarray(rng.normal(size=(E, 4, 1)).astype(np.float32))
    a = gspmm_hub(g, "copy_rhs", "sum", None, e)
    assert a is not None
    b = gspmm_xla(g, "copy_rhs", "sum", None, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda e: jnp.sum(jnp.sin(
        gspmm_hub(g, "copy_rhs", "sum", None, e))))(e)
    gx = jax.grad(lambda e: jnp.sum(jnp.sin(
        gspmm_xla(g, "copy_rhs", "sum", None, e))))(e)
    np.testing.assert_allclose(gp, gx, rtol=1e-3, atol=1e-3)


def test_hub_all_edges_dense():
    """Single destination absorbs everything: tail is empty."""
    n, e = 200, 1500
    rng = np.random.default_rng(5)
    src = rng.integers(0, n, size=e)
    dst = np.zeros((e,), dtype=np.int64)
    g = dgl.graph((src, dst), num_nodes=n, hub=True, hub_dense_floor=1)
    assert g.hub_dst is not None and g.hub_dst_meta.n_dense >= 1
    u = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    a = gspmm_hub(g, "copy_lhs", "sum", u, None)
    b = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    ga = jax.grad(lambda u: jnp.sum(gspmm_hub(g, "copy_lhs", "sum", u,
                                              None) ** 2))(u)
    gb = jax.grad(lambda u: jnp.sum(gspmm_xla(g, "copy_lhs", "sum", u,
                                              None) ** 2))(u)
    np.testing.assert_allclose(ga, gb, rtol=1e-3, atol=1e-3)


def test_hub_zero_degree_rows():
    """Rows with no in-edges must come back exactly zero."""
    g = make_skewed("mixed")
    u, _ = data(6)
    out = np.asarray(gspmm_hub(g, "copy_lhs", "sum", u, None))
    deg = np.asarray(g.in_degrees())
    np.testing.assert_allclose(out[deg == 0], 0.0)


def test_hub_auto_dispatch_uses_hub_on_forced_graph():
    from dgl1_tpu.ops import dispatch

    g = make_skewed()
    u, _ = data(7)
    dispatch.set_engine("hub")
    try:
        a = dgl.ops.gspmm(g, "copy_lhs", "sum", u, None)
    finally:
        dispatch.set_engine("auto")
    b = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_hub_bf16():
    g = make_skewed("mixed")
    u, e = data(8)
    u16, e16 = u.astype(jnp.bfloat16), e.astype(jnp.bfloat16)
    a = gspmm_hub(g, "mul", "sum", u16, e16)
    assert a.dtype == jnp.bfloat16
    b = gspmm_xla(g, "mul", "sum", u.astype(jnp.float32),
                  e.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(a, np.float32), b, rtol=0.1, atol=0.5
    )


def test_hub_order_identity_expand():
    """Hub-first relabel (dgl.hub_order): identity_expand must hold on
    the relabeled graph and values+grads stay oracle-exact through the
    fused concat/pad path (round-4 headline lever)."""
    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.ops.engine_xla import gspmm_xla

    g = powerlaw_graph(1 << 12, 8, seed=3)
    assert g.hub_dst is not None
    assert not g.hub_dst_meta.identity_expand  # natural order is not
    perm = dgl.hub_order(g)
    g2 = dgl.reorder_graph(g, node_permute_algo="custom",
                           permute_config={"nodes_perm": perm})
    m = g2.hub_dst_meta
    assert m.identity_expand, "relabel must produce the identity layout"
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(g2.num_nodes(), 24)).astype(np.float32))
    y = dgl.ops.gspmm(g2, "copy_lhs", "sum", x, None)
    y_ref = gspmm_xla(g2, "copy_lhs", "sum", x, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    gr = jax.grad(lambda x: jnp.sum(
        dgl.ops.gspmm(g2, "copy_lhs", "sum", x, None) ** 2))(x)
    gr_ref = jax.grad(lambda x: jnp.sum(
        gspmm_xla(g2, "copy_lhs", "sum", x, None) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=1e-4, atol=2e-4)
    # The relabeled graph is isomorphic: unsharding through the perm
    # reproduces the original graph's aggregation.
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    y_orig = gspmm_xla(g, "copy_lhs", "sum", x[jnp.asarray(inv)], None)
    np.testing.assert_allclose(np.asarray(y)[inv], np.asarray(y_orig),
                               rtol=1e-4, atol=1e-4)


def test_hub_order_identity_u_mul_e_and_mean():
    """Identity layout must hold for the weighted and mean paths too
    (they share the expand)."""
    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.ops.engine_xla import gspmm_xla

    g0 = powerlaw_graph(1 << 11, 8, seed=5)
    g = dgl.reorder_graph(g0, node_permute_algo="custom",
                          permute_config={"nodes_perm": dgl.hub_order(g0)})
    assert g.hub_dst_meta.identity_expand
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(g.num_nodes(), 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(g.num_edges_padded(), 1)
                               ).astype(np.float32))
    for op, e in (("mul", w), ("copy_lhs", None)):
        for red in ("sum", "mean"):
            y = dgl.ops.gspmm(g, op if op != "mul" else "mul", red,
                              x, e)
            y_ref = gspmm_xla(g, op if op != "mul" else "mul", red,
                              x, e)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                       rtol=1e-4, atol=1e-4)


def test_chunk_env_override_matches_oracle():
    """DGL1_TPU_CHUNK=2048 (the attention per-grid-step overhead lever,
    PERF_NOTES r4) must keep every layout/engine path oracle-exact.
    Subprocess: CHUNK is captured at import."""
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import dgl1_tpu as dgl
from dgl1_tpu.hub_format import CHUNK
assert CHUNK == 2048, CHUNK
from dgl1_tpu.data.synthetic import powerlaw_graph
from dgl1_tpu.ops.engine_xla import gspmm_xla
g = powerlaw_graph(1 << 11, 8, seed=2)
x = jnp.asarray(np.random.default_rng(0).normal(
    size=(g.num_nodes(), 8)).astype(np.float32))
y = dgl.ops.gspmm(g, "copy_lhs", "sum", x, None)
y_ref = gspmm_xla(g, "copy_lhs", "sum", x, None)
np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                           rtol=1e-4, atol=1e-4)
# weighted path exercises the full chunk layouts
w = jnp.asarray(np.random.default_rng(1).normal(
    size=(g.num_edges_padded(), 1)).astype(np.float32))
ym = dgl.ops.gspmm(g, "mul", "sum", x, w)
ym_ref = gspmm_xla(g, "mul", "sum", x, w)
np.testing.assert_allclose(np.asarray(ym), np.asarray(ym_ref),
                           rtol=1e-4, atol=1e-4)
print("OK")
"""
    env = dict(os.environ)
    env["DGL1_TPU_CHUNK"] = "2048"
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0 and "OK" in r.stdout, (r.stdout, r.stderr)


def test_typed_union_graph_identity_and_oracle():
    """Identity-rate typed path (VERDICT r4 #2): dgl.typed_union_graph
    stacks relations into the source axis so ONE hub layout (with the
    ordinary hub-first identity relabel) serves every relation; values
    AND grads must match the per-edge numpy oracle, and the layout must
    claim identity_expand on this hubby graph."""
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph

    rng = np.random.default_rng(0)
    n, R, F, O = 2000, 5, 16, 12
    g = powerlaw_graph(n, 8, seed=2, hub=True)
    e = g.num_edges()
    et = rng.integers(0, R, e).astype(np.int64)
    gu, perm = dgl.typed_union_graph(g, et, R, hub=True)
    assert gu.hub_dst_meta is not None and gu.hub_dst_meta.identity_expand
    assert gu.num_src_nodes() == R * n and gu.num_dst_nodes() == n
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)

    X = rng.standard_normal((n, F)).astype(np.float32)
    W = rng.standard_normal((R, F, O)).astype(np.float32)
    src, dst = (np.asarray(a)[:e] for a in g.edges())
    msg = np.einsum("ef,efo->eo", X[src].astype(np.float64),
                    W[et].astype(np.float64))
    ref = np.zeros((n, O), np.float64)
    np.add.at(ref, dst, msg)

    def union_fwd(Xj, Wj):
        z = jnp.einsum("nf,rfo->rno", Xj, Wj).reshape(R * n, O)
        return dgl.ops.gspmm(gu, "copy_lhs", "sum", z, None)

    Xr = jnp.asarray(X[perm])  # node data rides the relabel
    out = np.asarray(union_fwd(Xr, jnp.asarray(W)))[inv]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    wp = rng.standard_normal((n, O)).astype(np.float32)
    gX, gW = jax.grad(
        lambda a, b: jnp.sum(union_fwd(a, b) * jnp.asarray(wp[perm])),
        argnums=(0, 1))(Xr, jnp.asarray(W))
    gX_ref = np.zeros((n, F), np.float64)
    gW_ref = np.zeros((R, F, O), np.float64)
    for r in range(R):
        m = et == r
        tmp = np.zeros((n, O), np.float64)
        np.add.at(tmp, src[m], wp[dst[m]].astype(np.float64))
        gX_ref += tmp @ W[r].astype(np.float64).T
        gW_ref[r] = (X[src[m]].astype(np.float64).T
                     @ wp[dst[m]].astype(np.float64))
    np.testing.assert_allclose(np.asarray(gX)[inv], gX_ref,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gW), gW_ref,
                               rtol=1e-4, atol=1e-4)


def test_rgcn_union_graph_matches_rel_graphs():
    """RelGraphConv(union_graph=) must reproduce the rel_graphs path
    (same flax params, same output) on a relabel-consistent input."""
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.models import RGCN

    rng = np.random.default_rng(1)
    n, R = 800, 4
    g = dgl.rand_graph(n, n * 6, seed=3)
    e = g.num_edges()
    et = rng.integers(0, R, e).astype(np.int64)
    rel_graphs = dgl.typed_subgraphs(g, et, R)
    gu, perm = dgl.typed_union_graph(g, et, R, relabel=False)
    X = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    etj = jnp.asarray(et.astype(np.int32))

    model = RGCN(num_nodes=n, hidden_feats=16, out_feats=6, num_rels=R,
                 num_bases=2)
    params = model.init(jax.random.PRNGKey(0), g, etj, X,
                        rel_graphs=rel_graphs)
    y_rel = model.apply(params, g, etj, X, rel_graphs=rel_graphs)
    y_uni = model.apply(params, g, etj, X, union_graph=gu)
    np.testing.assert_allclose(np.asarray(y_uni), np.asarray(y_rel),
                               rtol=2e-4, atol=2e-4)


def test_typed_subgraphs_identity_oracle():
    """Identity-rate per-relation path (VERDICT r4 #2, the winning
    design): typed_subgraphs(identity=True) pins every relation's hub
    slots and tail stack rows to the parent's hub-first numbering —
    ALL relations claim identity_expand and each SpMM stays
    oracle-exact on values and grads (phantom slots/rows read zeros)."""
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph

    rng = np.random.default_rng(0)
    n, R = 4000, 5
    g = dgl.add_self_loop(powerlaw_graph(n, 8, seed=2))
    e = g.num_edges()
    et = rng.integers(0, R, e).astype(np.int64)
    rel_graphs, perm = dgl.typed_subgraphs(g, et, R, identity=True)
    assert len(rel_graphs) == R and perm.shape == (n,)
    assert all(gr.hub_dst_meta is not None
               and gr.hub_dst_meta.identity_expand for gr in rel_graphs)

    X = rng.standard_normal((n, 16)).astype(np.float32)
    for gr in rel_graphs:
        y = np.asarray(dgl.ops.gspmm(gr, "copy_lhs", "sum",
                                     jnp.asarray(X), None))
        sr, dr = (np.asarray(a)[: gr.num_edges()] for a in gr.edges())
        ref = np.zeros((n, 16), np.float64)
        np.add.at(ref, dr, X[sr].astype(np.float64))
        np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)
        gX = np.asarray(jax.grad(lambda x: jnp.sum(dgl.ops.gspmm(
            gr, "copy_lhs", "sum", x, None) ** 2))(jnp.asarray(X)))
        gref = np.zeros((n, 16), np.float64)
        np.add.at(gref, sr, (2 * ref)[dr])
        # Hub-row sums differ from the f64 oracle by f32 accumulation
        # order (same tolerance as test_hub_grad_matches_xla).
        np.testing.assert_allclose(gX, gref, rtol=1e-3, atol=1e-3)
