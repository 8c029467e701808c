"""Tensor-parallel (model-axis) weight sharding for wide GNN layers.

SURVEY.md §2.3 TP row: absent in the reference; here the Megatron
column/row pair composes with g-SpMM at zero extra communication because
aggregation is feature-parallel. The sharded layer must match the
replicated oracle on values AND weight gradients."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import dgl1_tpu as dgl
from dgl1_tpu.ops import gspmm
from dgl1_tpu.parallel.tp import make_tp_gcn_layer, shard_params_tp


def test_tp_gcn_layer_matches_replicated_oracle():
    g = dgl.rand_graph(300, 2400, seed=0)
    rng = np.random.default_rng(0)
    F, H, O = 64, 512, 32
    x = jnp.asarray(rng.normal(size=(300, F)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(F, H)).astype(np.float32)) * 0.05
    w2 = jnp.asarray(rng.normal(size=(H, O)).astype(np.float32)) * 0.05

    mesh = Mesh(np.array(jax.devices()[:8]), ("m",))
    w1s, w2s = shard_params_tp(mesh, w1, w2)
    # The hidden axis is genuinely sharded 8 ways.
    assert w1s.sharding.spec == jax.sharding.PartitionSpec(None, "m")
    shard_shapes = {s.data.shape for s in w1s.addressable_shards}
    assert shard_shapes == {(F, H // 8)}

    layer = make_tp_gcn_layer(g, mesh)
    y = layer(w1s, w2s, x)

    def ref(w1, w2, x):
        h = jax.nn.relu(gspmm(g, "copy_lhs", "sum", x @ w1, None))
        return h @ w2

    np.testing.assert_allclose(np.asarray(y), np.asarray(ref(w1, w2, x)),
                               rtol=1e-4, atol=1e-3)

    gw1, gw2 = jax.jit(jax.grad(
        lambda w1, w2: (layer(w1, w2, x) ** 2).sum(),
        argnums=(0, 1)))(w1s, w2s)
    rw1, rw2 = jax.grad(
        lambda w1, w2: (ref(w1, w2, x) ** 2).sum(), argnums=(0, 1))(w1, w2)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(rw1),
                               rtol=1e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(rw2),
                               rtol=1e-3, atol=2e-2)
