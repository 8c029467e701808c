"""Block-dense engine vs XLA oracle: values + gradients, plus
reorder_graph (the locality supplier). Dual-path contract as in
tests/test_ell.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops import dispatch, gspmm
from dgl1_tpu.ops.engine_bdense import gspmm_bdense
from dgl1_tpu.ops.engine_xla import gspmm_xla

FORMATS = ("coo", "csr", "csc", "ell", "bdense")
N = 400


def band_graph(n=N, e=6000, width=40, seed=0):
    """Local (band) graph — the bdense-friendly regime."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-width, width, e), 0, n - 1)
    return src, dst


def make(formats=FORMATS, **kw):
    src, dst = band_graph(**kw)
    return dgl.graph((src, dst), num_nodes=N, formats=formats)


def data(seed=1, f=16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(N, f)).astype(np.float32))


def test_bdense_planner_covers_band():
    g = make()
    m = g.bdense_meta
    assert m.n_blocks > 0
    # A width-40 band on 400 nodes concentrates in near-diagonal blocks.
    assert m.covered > 0.9 * g.num_edges()
    # Count matrices hold every covered edge exactly once (bf16 entries
    # are exact small integers; sum in f64).
    bd = g.bdense
    assert float(np.asarray(bd["a"], np.float64).sum()) == float(m.covered)


@pytest.mark.parametrize("red", ["sum", "mean"])
def test_bdense_forward_matches_xla(red):
    g = make()
    u = data()
    a = gspmm_bdense(g, "copy_lhs", red, u, None)
    b = gspmm_xla(g, "copy_lhs", red, u, None)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_bdense_grad_matches_xla():
    g = make()
    u = data(2)

    def mk(fn):
        def loss(u):
            return jnp.sum(jnp.sin(fn(g, "copy_lhs", "sum", u, None)))
        return loss

    ga = jax.grad(mk(gspmm_bdense))(u)
    gb = jax.grad(mk(gspmm_xla))(u)
    np.testing.assert_allclose(ga, gb, rtol=1e-4, atol=1e-4)


def test_bdense_under_jit_and_vjp():
    g = make()
    u = data(3)

    @jax.jit
    def step(g, u):
        out, vjp = jax.vjp(
            lambda u: gspmm_bdense(g, "copy_lhs", "sum", u, None), u)
        return out, vjp(jnp.ones_like(out))[0]

    out, gu = step(g, u)
    ref = gspmm_xla(g, "copy_lhs", "sum", u, None)
    gref = jax.grad(
        lambda u: gspmm_xla(g, "copy_lhs", "sum", u, None).sum())(u)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gu, gref, rtol=1e-4, atol=1e-4)


def test_bdense_tail_only_graph():
    # A scattered graph: no block reaches min_edges, everything on the
    # ELL tail — coverage must still be exact.
    rng = np.random.default_rng(7)
    src = rng.integers(0, N, 120)
    dst = rng.integers(0, N, 120)
    g = dgl.graph((src, dst), num_nodes=N, formats=FORMATS)
    assert g.bdense_meta.n_blocks == 0
    u = data(4)
    a = gspmm_bdense(g, "copy_lhs", "sum", u, None)
    b = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_bdense_declines_uncovered_calls():
    g = make()
    u = data()
    e = jnp.ones((g.num_edges(), 16), jnp.float32)
    assert gspmm_bdense(g, "mul", "sum", u, e) is None
    assert gspmm_bdense(g, "copy_lhs", "max", u, None) is None
    g2 = make(formats=None)  # default formats: no bdense planned
    assert getattr(g2, "bdense", None) is None
    assert gspmm_bdense(g2, "copy_lhs", "sum", u, None) is None


def test_auto_dispatch_prefers_bdense_then_falls_back():
    g = make()
    u = data(5)
    dispatch.set_engine("auto")
    out = gspmm(g, "copy_lhs", "sum", u, None)
    ref = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    # Uncovered op still dispatches correctly through the fallbacks.
    e = jnp.ones((g.num_edges(), 16), jnp.float32) * 0.5
    out2 = gspmm(g, "mul", "sum", u, e)
    ref2 = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-4)


def test_rcm_reorder_improves_block_coverage():
    # A ring-of-cliques graph shuffled to destroy locality: RCM must
    # recover enough to put most edges on the dense tier.
    rng = np.random.default_rng(11)
    n, csize, epc = 2048, 64, 300
    blocks = []
    for c in range(n // csize):
        base = c * csize
        s = rng.integers(base, base + csize, epc)
        d = rng.integers(base, base + csize, epc)
        blocks.append((s, d))
    src = np.concatenate([b[0] for b in blocks])
    dst = np.concatenate([b[1] for b in blocks])
    shuf = rng.permutation(n)
    g = dgl.graph((shuf[src], shuf[dst]), num_nodes=n, formats=FORMATS)
    frac_before = g.bdense_meta.covered / g.num_edges()

    g2 = dgl.reorder_graph(g, node_permute_algo="rcm", formats=FORMATS)
    frac_after = g2.bdense_meta.covered / g2.num_edges()
    assert frac_after > max(frac_before, 0.5)

    # Reordered graph computes the same aggregate, mapped back via _ID.
    u = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    perm = np.asarray(g2.ndata["_ID"])  # perm[new] = old
    out_new = gspmm_bdense(g2, "copy_lhs", "sum", u[perm], None)
    out_old = gspmm_xla(g, "copy_lhs", "sum", u, None)
    np.testing.assert_allclose(out_new, np.asarray(out_old)[perm],
                               rtol=1e-4, atol=1e-4)


def test_reorder_graph_metis_and_custom():
    src, dst = band_graph()
    g = dgl.graph((src, dst), num_nodes=N)
    g.ndata["x"] = jnp.arange(N, dtype=jnp.float32)
    g.edata["w"] = jnp.arange(g.num_edges(), dtype=jnp.float32)

    g2 = dgl.reorder_graph(g, node_permute_algo="metis",
                           permute_config={"k": 4})
    perm = np.asarray(g2.ndata["_ID"])
    assert sorted(perm.tolist()) == list(range(N))
    np.testing.assert_allclose(np.asarray(g2.ndata["x"]), perm)
    # Edge data follows the edge permutation.
    eperm = np.asarray(g2.edata["_ID"])
    np.testing.assert_allclose(np.asarray(g2.edata["w"]), eperm)
    # Structure preserved under the relabel.
    relabel = np.empty(N, np.int64)
    relabel[perm] = np.arange(N)
    s2, d2 = np.asarray(g2.src), np.asarray(g2.dst)
    assert sorted(zip(relabel[src].tolist(), relabel[dst].tolist())) == \
        sorted(zip(s2.tolist(), d2.tolist()))

    ident = dgl.reorder_graph(
        g, node_permute_algo="custom",
        permute_config={"nodes_perm": np.arange(N),
                        "edges_perm": np.arange(g.num_edges())},
        edge_permute_algo="custom")
    np.testing.assert_array_equal(np.asarray(ident.src), src)
    np.testing.assert_array_equal(np.asarray(ident.dst), dst)


def test_rcm_order_band_matrix_bandwidth():
    # RCM on a shuffled path graph recovers a near-diagonal order.
    n = 256
    rng = np.random.default_rng(3)
    shuf = rng.permutation(n)
    src = shuf[np.arange(n - 1)]
    dst = shuf[np.arange(1, n)]
    g = dgl.graph((np.concatenate([src, dst]),
                   np.concatenate([dst, src])), num_nodes=n)
    perm = dgl.rcm_order(g)
    relabel = np.empty(n, np.int64)
    relabel[perm] = np.arange(n)
    bw = np.abs(relabel[np.asarray(g.src)] -
                relabel[np.asarray(g.dst)]).max()
    assert bw <= 2  # path graph RCM bandwidth is 1; allow slack


def test_laplacian_pe_ring():
    # Ring graph: eigenvectors are sin/cos harmonics; PE columns must be
    # orthonormal and orthogonal to the constant vector.
    n = 24
    src = np.arange(n)
    dst = (src + 1) % n
    g = dgl.graph((np.concatenate([src, dst]),
                   np.concatenate([dst, src])), num_nodes=n)
    pe = np.asarray(dgl.laplacian_pe(g, k=4))
    assert pe.shape == (n, 4)
    for j in range(4):
        np.testing.assert_allclose(np.linalg.norm(pe[:, j]), 1.0,
                                   rtol=1e-4)
        assert abs(pe[:, j].sum()) < 1e-3  # orthogonal to constant


def test_laplacian_pe_padding():
    g = dgl.graph((np.array([0, 1]), np.array([1, 0])), num_nodes=3)
    pe = np.asarray(dgl.laplacian_pe(g, k=5, padding=True))
    assert pe.shape == (3, 5)
    with np.testing.assert_raises(Exception):
        dgl.laplacian_pe(g, k=5)


def test_random_walk_pe_triangle():
    # Directed triangle: return probability is 1 exactly at step 3.
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    g = dgl.graph((src, dst), num_nodes=3)
    pe = np.asarray(dgl.random_walk_pe(g, k=4))
    np.testing.assert_allclose(pe[:, 0], 0.0, atol=1e-7)  # step 1
    np.testing.assert_allclose(pe[:, 1], 0.0, atol=1e-7)  # step 2
    np.testing.assert_allclose(pe[:, 2], 1.0, atol=1e-7)  # step 3
    np.testing.assert_allclose(pe[:, 3], 0.0, atol=1e-7)  # step 4


def test_bdense_bf16_precision_mode():
    from dgl1_tpu.ops import matmul_precision

    g = make()
    u = data(6)
    ref = gspmm_xla(g, "copy_lhs", "sum", u, None)
    with matmul_precision("bf16"):
        out = gspmm_bdense(g, "copy_lhs", "sum", u, None)
    # bf16 feature rounding: ~4e-3 per element, accumulated in f32 over
    # ~40-edge rows -> a few 1e-2 absolute on O(1) sums.
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=1e-1)
