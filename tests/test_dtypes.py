"""Mixed-precision coverage: all engines must handle bfloat16 features
(the production dtype on TPU) with f32-level structural correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.ops.engine_ell import gspmm_ell
from dgl1_tpu.ops.engine_pallas import gspmm_pallas
from dgl1_tpu.ops.engine_xla import gspmm_xla

N, E = 200, 1200


@pytest.mark.parametrize("engine", [gspmm_xla, gspmm_ell, gspmm_pallas])
def test_bf16_forward(engine):
    g = dgl.rand_graph(N, E, seed=0)
    rng = np.random.default_rng(0)
    u32 = rng.normal(size=(N, 8)).astype(np.float32)
    u16 = jnp.asarray(u32, dtype=jnp.bfloat16)
    out16 = engine(g, "copy_lhs", "sum", u16, None)
    assert out16.dtype == jnp.bfloat16
    ref = gspmm_xla(g, "copy_lhs", "sum", jnp.asarray(u32), None)
    np.testing.assert_allclose(
        np.asarray(out16, dtype=np.float32), np.asarray(ref),
        rtol=0.05, atol=0.05,
    )


@pytest.mark.parametrize("engine", [gspmm_ell, gspmm_pallas])
def test_bf16_grad(engine):
    g = dgl.rand_graph(N, E, seed=1)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32),
                    dtype=jnp.bfloat16)

    def loss(u):
        return jnp.sum(engine(g, "copy_lhs", "sum", u, None)
                       .astype(jnp.float32))

    gu = jax.grad(loss)(u)
    assert gu.dtype == jnp.bfloat16
    # grad of sum through copy_u+sum = out-degree per node.
    deg = np.asarray(g.out_degrees(), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(gu[:, 0], dtype=np.float32), deg, rtol=0.05, atol=0.05
    )


def test_bf16_gcn_layer():
    from dgl1_tpu.nn import GraphConv

    g = dgl.add_self_loop(dgl.rand_graph(64, 300, seed=2))
    feat = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 16)),
        dtype=jnp.bfloat16,
    )
    conv = GraphConv(8)
    params = conv.init(jax.random.PRNGKey(0), g, feat)
    out = conv.apply(params, g, feat)
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))


def test_matmul_precision_policy_default():
    """Round-4 bf16 verdict (docs/PERF_NOTES.md): the hub/attention
    kernels are stream-bound, not MXU-bound — bf16 matmul mode moved NO
    model-level epoch time (GCN 6.30->6.12, R-GCN 23.7->23.6, GAT
    127.4->127.6 ms), so f32 (bit-strict vs the oracle) stays the
    default. This test pins the decision; flip it only with a new
    measurement table."""
    import importlib

    from dgl1_tpu.ops import precision

    assert precision.get_matmul_precision() == "f32"
    # Opt-in stays available and round-trips.
    with precision.matmul_precision("bf16"):
        assert precision.get_matmul_precision() == "bf16"
    assert precision.get_matmul_precision() == "f32"
