"""Headline benchmark: g-SpMM (copy_u + sum, GCN/GAT layer config)
edges/s/chip on a power-law graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the fraction of the HBM-bandwidth roofline
("speed of light", BASELINE.md): an ideal SpMM must read each source row
once per edge, so edges/s <= HBM_BW / (feat_dim * bytes_per_elem).
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_NODES = 1 << 20
AVG_DEGREE = 8
FEAT_DIM = 128
DTYPE_BYTES = 4

# TPU v5e HBM bandwidth (public spec: ~819 GB/s); CPU fallback uses a
# nominal 100 GB/s so the ratio stays meaningful when smoke-testing.
HBM_BW = {"tpu": 819e9, "cpu": 100e9}


def main():
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    n = NUM_NODES if on_tpu else NUM_NODES // 16

    g = powerlaw_graph(n, AVG_DEGREE, seed=0)
    num_edges = g.num_edges()
    # Pin the structure on device ONCE — with host numpy leaves every jit
    # call would re-upload the whole graph (hundreds of MB per step).
    g = jax.device_put(g)
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, FEAT_DIM)).astype(np.float32)
    )

    # Chain iterations (output feeds back in) and force a scalar fetch at
    # the end: on remote-attached TPUs, block_until_ready alone does not
    # reliably synchronize, so unchained timing under-reports wildly.
    fwd = jax.jit(lambda graph, x: dgl.ops.copy_u_sum(graph, x) * 0.1)
    _ = float(fwd(g, feat)[0, 0])  # compile + sync

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    out = feat
    for _ in range(iters):
        out = fwd(g, out)
    _ = float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters

    edges_per_s = num_edges / dt
    roofline = HBM_BW["tpu" if on_tpu else "cpu"] / (FEAT_DIM * DTYPE_BYTES)
    print(json.dumps({
        "metric": "spmm_copy_u_sum_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": f"edges/s (N={n}, E={num_edges}, F={FEAT_DIM}, "
                f"{backend}, engine={dgl.ops.get_engine()})",
        "vs_baseline": round(edges_per_s / roofline, 4),
    }))


if __name__ == "__main__":
    main()
