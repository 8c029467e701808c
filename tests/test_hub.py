"""Hub-dense HYB engine vs XLA oracle: values + gradients.

Same dual-path contract as test_ell.py / test_pallas.py (the reference's
``tests/compute/test_kernel.py`` pattern): every covered (op, reduce)
pair must match the jnp gather/segment oracle on values AND grads, on
skewed (power-law-ish) graphs where the hub path actually engages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.hub_format import BLK, CHUNK, SENT, build_hub_format
from dgl1_tpu.ops.engine_hub import gspmm_hub
from dgl1_tpu.ops.engine_xla import gspmm_xla

N, E = 300, 3000


def make_skewed(n=N, e=E, pad=0, seed=0):
    """Zipf-ish destinations so real hubs exist. The per-group edge floor
    is set so the first hub group(s) qualify but the tail stays on ELL —
    both paths and their merge are exercised."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=e)
    ranks = rng.zipf(1.7, size=e) % n
    dst = ranks.astype(np.int64)
    return dgl.graph((src, dst), num_nodes=n, hub=e // 8,
                     pad_edges_to=e + pad if pad else None)


def data(seed=1, f=10, shift=2.0, e_rows=E, e_feat=(1,)):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(N, f)).astype(np.float32)) + shift
    e = jnp.asarray(
        rng.normal(size=(e_rows,) + e_feat).astype(np.float32)) + shift
    return u, e


def test_hub_structure_sane():
    g = make_skewed()
    assert g.hub_dst is not None
    meta = g.hub_dst_meta
    n_cf, n_cb, n_win, n_groups, _, _, n_tail_rows, covered = meta
    assert n_groups >= 1
    assert n_win == -(-N // BLK)
    # Every real fwd slot's eid maps back to itself.
    fa, fe = np.asarray(g.hub_dst["fa"]), np.asarray(g.hub_dst["fe"])
    real = fa >= 0
    assert covered == int(real.sum()) == E - int(
        (np.asarray(g.hub_dst["edge_to_tslot"]) != SENT).sum()
    )
    e2f = np.asarray(g.hub_dst["edge_to_fslot"])
    assert (e2f[fe[real]] == np.flatnonzero(real)).all()
    # Chunk descriptor lengths consistent.
    assert len(fa) == n_cf * CHUNK
    assert len(np.asarray(g.hub_dst["ba"])) == n_cb * CHUNK


def _edges_from_chunks(hub, meta, n_chunks_key, in_key, out_key, a_key,
                       b_key, a_is_src):
    """Reconstruct (src, dst_slot) pairs from a chunk layout."""
    per_in = np.repeat(np.asarray(hub[in_key]), CHUNK)
    per_out = np.repeat(np.asarray(hub[out_key]), CHUNK)
    a = np.asarray(hub[a_key])
    b = np.asarray(hub[b_key])
    real = a >= 0
    if a_is_src:
        src = per_in[real] * BLK + a[real]
        slot = per_out[real] * BLK + b[real]
    else:
        slot = per_in[real] * BLK + a[real]
        src = per_out[real] * BLK + b[real]
    return np.sort(src.astype(np.int64) * (1 << 32) + slot)


def test_hub_chunk_layouts_encode_same_edges():
    """fwd (group-major) and bwd (window-major) chunk layouts must encode
    exactly the hub edge multiset."""
    g = make_skewed()
    hub, meta = g.hub_dst, g.hub_dst_meta
    fwd = _edges_from_chunks(hub, meta, 0, "f_in", "f_out", "fa", "fb",
                             a_is_src=True)
    bwd = _edges_from_chunks(hub, meta, 1, "b_in", "b_out", "ba", "bb",
                             a_is_src=False)
    assert len(fwd) == meta[7]  # edges covered
    np.testing.assert_array_equal(fwd, bwd)
    # And it matches the ground-truth hub edge set from the COO arrays.
    src = np.asarray(g.src)[: g.num_edges()]
    dst = np.asarray(g.dst)[: g.num_edges()]
    hub_ids = np.asarray(hub["hub_ids"])
    slot_of = {int(r): i for i, r in enumerate(hub_ids) if r != SENT}
    truth = np.sort(np.array(
        [int(s) * (1 << 32) + slot_of[int(d)]
         for s, d in zip(src, dst) if int(d) in slot_of], dtype=np.int64
    ))
    np.testing.assert_array_equal(fwd, truth)


@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
@pytest.mark.parametrize("red", ["sum", "mean"])
def test_hub_forward_matches_xla(op, red):
    g = make_skewed()
    u, e = data()
    ee = e if op == "mul" else None
    a = gspmm_hub(g, op, red, u, ee)
    assert a is not None
    b = gspmm_xla(g, op, red, u, ee)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("op", ["copy_lhs", "mul"])
def test_hub_grad_matches_xla(op):
    g = make_skewed()
    # Zero-mean data: hub rows sum ~1000 edges, and a mean offset makes the
    # f32 accumulation-order difference between the chunked-matmul and the
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


def test_hub_padded_edges():
    g = make_skewed(pad=53)
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
    g = make_skewed()
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=(N, 3, 5)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(E, 1, 1)).astype(np.float32))
    a = gspmm_hub(g, "mul", "sum", u, e)
    b = gspmm_xla(g, "mul", "sum", u, e)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_hub_declines_uncovered():
    g = make_skewed()
    u, _ = data()
    e_full = jnp.ones((E, 10))
    assert gspmm_hub(g, "mul", "sum", u, e_full) is None  # non-scalar e
    assert gspmm_hub(g, "copy_lhs", "max", u, None) is None
    assert gspmm_hub(g, "add", "sum", u, e_full) is None
    g2 = dgl.rand_graph(50, 100, seed=1)  # below density bar: no format
    assert g2.hub_dst is None
    assert gspmm_hub(g2, "copy_lhs", "sum", u[:50], None) is None


def test_hub_all_edges_dense():
    """Single destination absorbs everything: tail is empty."""
    n, e = 200, 1500
    rng = np.random.default_rng(5)
    src = rng.integers(0, n, size=e)
    dst = np.zeros((e,), dtype=np.int64)
    g = dgl.graph((src, dst), num_nodes=n, hub=True)
    assert g.hub_dst is not None
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
    g = make_skewed()
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
    g = make_skewed()
    u, e = data(8)
    u16, e16 = u.astype(jnp.bfloat16), e.astype(jnp.bfloat16)
    a = gspmm_hub(g, "mul", "sum", u16, e16)
    assert a.dtype == jnp.bfloat16
    b = gspmm_xla(g, "mul", "sum", u.astype(jnp.float32),
                  e.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(a, np.float32), b, rtol=0.1, atol=0.5
    )
