"""Fused flash-style GAT attention vs the composed oracle path.

The fused op must match SDDMM u_add_v -> leaky_relu -> edge_softmax ->
u_mul_e SpMM (all on the XLA oracle engine) on values AND gradients, for
every tier configuration of the hub format.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import dispatch
from dgl1_tpu.ops.attention import can_fuse_attention, gat_attention
from dgl1_tpu.ops.engine_xla import gspmm_xla

from tests.test_hub import CONFIGS, make_skewed, N, E

SLOPE = 0.2


def composed(g, el, er, ft, slope=SLOPE):
    """Oracle: the exact composed lowering (forced XLA engine)."""
    from dgl1_tpu.ops import edge_softmax, gsddmm, gspmm

    dispatch.set_engine("xla")
    try:
        e = gsddmm(g, "add", el[:, :, None], er[:, :, None],
                   lhs_target="u", rhs_target="v")
        e = jnp.where(e >= 0, e, slope * e)
        a = edge_softmax(g, e)
        return gspmm(g, "mul", "sum", ft, a)
    finally:
        dispatch.set_engine("auto")


def data(h=4, d=8, seed=0):
    rng = np.random.default_rng(seed)
    el = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(N, h, d)).astype(np.float32))
    return el, er, ft


@pytest.mark.parametrize("config", list(CONFIGS))
def test_fused_forward_matches_composed(config):
    g = make_skewed(config)
    assert can_fuse_attention(g)
    el, er, ft = data()
    a = gat_attention(g, el, er, ft, SLOPE)
    b = composed(g, el, er, ft)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("config", list(CONFIGS))
def test_fused_grads_match_composed(config):
    g = make_skewed(config)
    el, er, ft = data(seed=1)

    def loss(fn):
        return lambda el, er, ft: jnp.sum(
            jnp.sin(fn(g, el, er, ft)))

    gf = jax.grad(loss(lambda g, el, er, ft: gat_attention(
        g, el, er, ft, SLOPE)), argnums=(0, 1, 2))(el, er, ft)
    gc = jax.grad(loss(composed), argnums=(0, 1, 2))(el, er, ft)
    for a, b, name in zip(gf, gc, ["el", "er", "ft"]):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad_{name}")


def test_fused_single_head_and_wide():
    g = make_skewed("mixed")
    for h, d in [(1, 16), (8, 32), (2, 100)]:
        el, er, ft = data(h=h, d=d, seed=h)
        a = gat_attention(g, el, er, ft, SLOPE)
        b = composed(g, el, er, ft)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_fused_el_er_3d_shapes():
    """(N, H, 1) logits (the GATConv shapes) are accepted."""
    g = make_skewed("mixed")
    el, er, ft = data(seed=3)
    a = gat_attention(g, el[:, :, None], er[:, :, None], ft, SLOPE)
    b = composed(g, el, er, ft)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_gatconv_uses_fused_and_matches():
    """GATConv output identical whether the fused path or the composed
    path runs (deterministic, attn_drop irrelevant)."""
    from dgl1_tpu.nn import GATConv
    from dgl1_tpu.ops import attention

    g = make_skewed("mixed")
    rng = np.random.default_rng(4)
    feat = jnp.asarray(rng.normal(size=(N, 12)).astype(np.float32))
    conv = GATConv(8, num_heads=4)
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    out_fused = conv.apply(params, g, feat)

    orig = attention.gat_attention
    try:
        # Disable fusion; the composed path must agree.
        attention_can = attention.can_fuse_attention
        import dgl1_tpu.nn.conv as conv_mod  # noqa: F401
        attention.can_fuse_attention = lambda g: False
        # nn.conv imported the names at call time via module attr access.
        out_composed = conv.apply(params, g, feat)
    finally:
        attention.can_fuse_attention = attention_can
        attention.gat_attention = orig
    np.testing.assert_allclose(out_fused, out_composed, rtol=1e-4,
                               atol=1e-4)
    # And gradients flow through the fused path.
    gr = jax.grad(lambda p: jnp.sum(conv.apply(p, g, feat) ** 2))(params)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(gr))


def test_fused_zero_in_degree_rows():
    g = make_skewed("mixed")
    el, er, ft = data(seed=5)
    out = np.asarray(gat_attention(g, el, er, ft, SLOPE))
    deg = np.asarray(g.in_degrees())
    np.testing.assert_allclose(out[deg == 0], 0.0)
    assert np.isfinite(out).all()

@pytest.mark.parametrize("config", list(CONFIGS))
def test_fused_bf16_mode_close_to_composed(config):
    """ops.precision "bf16" mode: one-hot operands are exact, features
    round at bf16 (~4e-3 relative) — values and grads stay within a
    loose tolerance of the f32 composed oracle."""
    from dgl1_tpu.ops import matmul_precision

    g = make_skewed(config)
    el, er, ft = data()
    with matmul_precision("bf16"):
        a = gat_attention(g, el, er, ft, SLOPE)

        def s_fused(el_, er_, ft_):
            return jnp.sum(gat_attention(g, el_, er_, ft_, SLOPE) ** 2)

        ga = jax.grad(s_fused, argnums=(0, 1, 2))(el, er, ft)
    b = composed(g, el, er, ft)

    def s_comp(el_, er_, ft_):
        return jnp.sum(composed(g, el_, er_, ft_) ** 2)

    gb = jax.grad(s_comp, argnums=(0, 1, 2))(el, er, ft)
    np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)
    for x, y in zip(ga, gb):
        # bf16 feature rounding: grads agree to ~1e-1 absolute (values
        # are O(1-10) here); the logit path stays f32 so there are no
        # leaky-relu kink flips.
        np.testing.assert_allclose(x, y, rtol=8e-2, atol=1.5e-1)


def test_fused_grads_wide_single_head():
    """Regression: when one head's feature span exceeds one 128-lane
    block (n_fb > 1), the per-edge jacobian dot g_e must accumulate over
    ALL feature blocks before the logit grads emit — the fb-outer kernel
    layout summed per stripe and read back only stripe 0 (gel/ger were
    ~2x-wrong at h=1, d=256)."""
    g = make_skewed("mixed")
    rng = np.random.default_rng(0)
    h, d = 1, 256
    el = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(N, h, d)).astype(np.float32))

    def s_f(el_, er_, ft_):
        return jnp.sum(gat_attention(g, el_, er_, ft_, SLOPE) ** 2)

    def s_c(el_, er_, ft_):
        return jnp.sum(composed(g, el_, er_, ft_) ** 2)

    ga = jax.grad(s_f, argnums=(0, 1, 2))(el, er, ft)
    gb = jax.grad(s_c, argnums=(0, 1, 2))(el, er, ft)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-3)


def test_fused_extreme_logit_spread():
    """The window-max softmax bound must stay numerically safe under a
    wide el spread (±40 across nodes): outputs still match the composed
    per-destination-exact-max softmax."""
    g = make_skewed("mixed")
    rng = np.random.default_rng(7)
    h, d = 4, 8
    el = jnp.asarray((rng.normal(size=(N, h)) * 20.0).astype(np.float32))
    er = jnp.asarray((rng.normal(size=(N, h)) * 5.0).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(N, h, d)).astype(np.float32))
    a = gat_attention(g, el, er, ft, SLOPE)
    b = composed(g, el, er, ft)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)


def test_fused_attn_dropout_semantics():
    """In-kernel attention dropout: seed-deterministic, unbiased-ish
    (empirical keep fraction ~ keep prob), drop=0.0 exactly equals the
    undropped path, and grads match finite differences with the mask
    FIXED by the seed (the fwd and bwd layouts must regenerate identical
    per-edge masks from (seed, eid, head))."""
    g = make_skewed("mixed")
    rng = np.random.default_rng(11)
    h, d = 4, 8
    el = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(N, h)).astype(np.float32))
    ft = jnp.asarray(rng.normal(size=(N, h, d)).astype(np.float32))
    seed = jnp.asarray([1234], jnp.int32)

    base = gat_attention(g, el, er, ft, SLOPE)
    zero_drop = gat_attention(g, el, er, ft, SLOPE, 0.0, seed)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero_drop))

    drop = 0.5
    o1 = gat_attention(g, el, er, ft, SLOPE, drop, seed)
    o2 = gat_attention(g, el, er, ft, SLOPE, drop, seed)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = gat_attention(g, el, er, ft, SLOPE, drop,
                       jnp.asarray([99], jnp.int32))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    assert np.isfinite(np.asarray(o1)).all()

    # Unbiasedness: the mean over many seeds approaches the undropped
    # output (inverted scaling).
    acc = np.zeros_like(np.asarray(base))
    n_seeds = 24
    for sd in range(n_seeds):
        acc += np.asarray(gat_attention(
            g, el, er, ft, SLOPE, drop, jnp.asarray([sd], jnp.int32)))
    deg = np.asarray(g.in_degrees()).astype(np.float64)
    got = acc / n_seeds
    ref = np.asarray(base)
    # Compare where the softmax average is well-populated (degree >= 4).
    sel = deg >= 4
    err = np.abs(got[sel] - ref[sel]).mean()
    scale = np.abs(ref[sel]).mean()
    assert err < 0.3 * scale, (err, scale)

    # Grad correctness under a FIXED mask: finite differences vs vjp.
    def loss(el_, er_, ft_):
        return jnp.sum(gat_attention(g, el_, er_, ft_, SLOPE, drop, seed)
                       ** 2)

    gel, ger, gft = jax.grad(loss, argnums=(0, 1, 2))(el, er, ft)
    rng2 = np.random.default_rng(5)
    for x, gx, name in ((el, gel, "el"), (er, ger, "er"), (ft, gft, "ft")):
        v = jnp.asarray(rng2.normal(size=x.shape).astype(np.float32))
        eps = 1e-3
        f1 = float(loss(*[a + eps * v if a is x else a
                          for a in (el, er, ft)]))
        f0 = float(loss(*[a - eps * v if a is x else a
                          for a in (el, er, ft)]))
        fd = (f1 - f0) / (2 * eps)
        an = float(jnp.sum(gx * v))
        np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-2), name


def test_fused_self_loop_diagonal_extraction():
    """add_self_loop graphs route single self-loop tail edges to the
    node-level diagonal (at_* tail variant) — values AND grads must still
    match the composed oracle, with and without dropout determinism."""
    base = make_skewed("mixed")
    e = base.num_edges()
    src = np.asarray(base.src)[:e]
    dst = np.asarray(base.dst)[:e]
    loops = np.arange(N, dtype=src.dtype)
    floor, dense_floor = CONFIGS["mixed"]
    g = dgl.graph((np.concatenate([src, loops]),
                   np.concatenate([dst, loops])), num_nodes=N, hub=floor,
                  hub_dense_floor=dense_floor)
    assert can_fuse_attention(g)
    assert g.hub_dst_meta.has_diag
    assert float(np.asarray(g.hub_dst["diag"]).sum()) > 0
    # The diag-stripped tail is much smaller than a tail that would
    # carry one row per self-looped node.
    assert g.hub_dst_meta.n_tail_rows < N

    el, er, ft = data(seed=3)
    a = gat_attention(g, el, er, ft, SLOPE)
    b = composed(g, el, er, ft)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda el, er, ft: jnp.sum(jnp.sin(fn(g, el, er, ft)))

    gf = jax.grad(loss(lambda g, el, er, ft: gat_attention(
        g, el, er, ft, SLOPE)), argnums=(0, 1, 2))(el, er, ft)
    gc = jax.grad(loss(composed), argnums=(0, 1, 2))(el, er, ft)
    for x, y, name in zip(gf, gc, ["el", "er", "ft"]):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad_{name}")

    # Dropout on the diag path: deterministic per seed, finite grads,
    # and finite-difference agreement under a fixed mask.
    seed = jnp.asarray([55], jnp.int32)
    o1 = gat_attention(g, el, er, ft, SLOPE, 0.5, seed)
    o2 = gat_attention(g, el, er, ft, SLOPE, 0.5, seed)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def dloss(el_, er_, ft_):
        return jnp.sum(gat_attention(g, el_, er_, ft_, SLOPE, 0.5, seed)
                       ** 2)

    gel, ger, gft = jax.grad(dloss, argnums=(0, 1, 2))(el, er, ft)
    v = jnp.asarray(np.random.default_rng(9).normal(
        size=er.shape).astype(np.float32))
    eps = 1e-3
    fd = (float(dloss(el, er + eps * v, ft))
          - float(dloss(el, er - eps * v, ft))) / (2 * eps)
    an = float(jnp.sum(ger * v))
    np.testing.assert_allclose(an, fd, rtol=2e-2, atol=2e-2)


def test_fused_identity_layout_matches_composed():
    """hub_order-relabeled graph (identity_expand meta): the attention
    merges collapse to fused concat+pad (the SpMM identity lever applied
    to mraw/num/den/ger — PERF_NOTES r5); values AND grads must stay
    oracle-exact, incl. the diag path (self-loops)."""
    from tests.test_hub import CONFIGS as HUB_CONFIGS

    floor, dense_floor = HUB_CONFIGS["mixed"]
    g0 = make_skewed("mixed")
    e0 = g0.num_edges()
    src = np.asarray(g0.src)[:e0]
    dst = np.asarray(g0.dst)[:e0]
    sl = np.arange(g0.num_nodes())  # self-loops -> diag extraction
    kw = dict(num_nodes=g0.num_nodes(), hub=floor,
              hub_dense_floor=dense_floor)
    g1 = dgl.graph((np.concatenate([src, sl]), np.concatenate([dst, sl])),
                   **kw)
    perm = dgl.hub_order(g1)
    g2 = dgl.reorder_graph(g1, node_permute_algo="custom",
                           permute_config={"nodes_perm": perm})
    # reorder_graph rebuilds with default floors; re-attach this hub
    # config for identity detection (same move as the mesh=1 test).
    e2 = g2.num_edges()
    g = dgl.graph((np.asarray(g2.src)[:e2], np.asarray(g2.dst)[:e2]),
                  **kw)
    assert g.hub_dst_meta.identity_expand
    assert g.hub_dst_meta.has_diag
    assert can_fuse_attention(g)
    el, er, ft = data(seed=7)
    a = gat_attention(g, el, er, ft, SLOPE)
    b = composed(g, el, er, ft)
    mask = np.asarray(g.in_degrees()) > 0
    np.testing.assert_allclose(np.asarray(a)[mask], np.asarray(b)[mask],
                               rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda el, er, ft: jnp.sum(jnp.sin(fn(g, el, er, ft)))

    gf = jax.grad(loss(lambda g, el, er, ft: gat_attention(
        g, el, er, ft, SLOPE)), argnums=(0, 1, 2))(el, er, ft)
    gc = jax.grad(loss(composed), argnums=(0, 1, 2))(el, er, ft)
    for a_, b_, name in zip(gf, gc, ["el", "er", "ft"]):
        np.testing.assert_allclose(a_, b_, rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad_{name}")


def test_fused_grads_with_bwd_split(monkeypatch):
    """DGL1_TPU_BWD_SPLIT: the bwd chunk kernels run on CHUNK//split
    blocks (halved scoped-vmem temporaries — the CHUNK=4096 enabler,
    PERF_NOTES r5) with duplicated per-chunk descriptors; grads must
    stay oracle-exact."""
    import dgl1_tpu.ops.attention as A

    monkeypatch.setattr(A, "_BWD_SPLIT", 2)
    g = make_skewed("mixed")
    el, er, ft = data(seed=3)

    def loss(fn):
        return lambda el, er, ft: jnp.sum(jnp.sin(fn(g, el, er, ft)))

    gf = jax.grad(loss(lambda g, el, er, ft: gat_attention(
        g, el, er, ft, SLOPE)), argnums=(0, 1, 2))(el, er, ft)
    gc = jax.grad(loss(composed), argnums=(0, 1, 2))(el, er, ft)
    for a, b, name in zip(gf, gc, ["el", "er", "ft"]):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3,
                                   err_msg=f"grad_{name}")


def test_fused_el_in_ft_packing_matches_default():
    """DGL1_TPU_EL_IN_FT=1 (el rides ft's top lanes — opt-in, measured
    neutral at model scale, PERF_NOTES r6) must match the default path
    on values and grads."""
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
import dgl1_tpu as dgl
from dgl1_tpu.data.synthetic import powerlaw_graph
from dgl1_tpu.ops.attention import gat_attention

rng = np.random.default_rng(0)
n, h, d = 2048, 2, 60   # h*d + h <= f_pad -> packing engages
g = powerlaw_graph(n, 8, seed=1, hub=True)
el = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
er = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
ft = jnp.asarray(rng.standard_normal((n, h, d)).astype(np.float32))
y = gat_attention(g, el, er, ft)
gel, ger, gft = jax.grad(lambda a, b, c: jnp.sum(
    gat_attention(g, a, b, c) ** 2), argnums=(0, 1, 2))(el, er, ft)
np.savez("OUTPATH", y=np.asarray(y), gel=np.asarray(gel),
         ger=np.asarray(ger), gft=np.asarray(gft))
print("OK")
"""
    import tempfile

    outs = {}
    with tempfile.TemporaryDirectory() as td:
        for mode in ("0", "1"):
            env = dict(os.environ)
            env["DGL1_TPU_EL_IN_FT"] = mode
            path = os.path.join(td, f"out{mode}.npz")
            r = subprocess.run(
                [sys.executable, "-c", code.replace("OUTPATH", path)],
                env=env, capture_output=True, text=True, timeout=300)
            assert r.returncode == 0 and "OK" in r.stdout, (
                r.stdout, r.stderr)
            outs[mode] = np.load(path)
        for k in ("y", "gel", "ger", "gft"):
            np.testing.assert_allclose(outs["1"][k], outs["0"][k],
                                       rtol=1e-5, atol=1e-5)
