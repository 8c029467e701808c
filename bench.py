"""Headline benchmark: g-SpMM (copy_u + sum, GCN/GAT layer config)
edges/s/chip on a power-law graph.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the fraction of the HBM-bandwidth roofline
("speed of light", BASELINE.md): an ideal SpMM reads each source row once
per edge, so edges/s <= HBM_BW / (feat_dim * bytes). NOTE: on TPU v5e the
measured binding constraint for every scatter-free formulation is the
gather unit's row rate (~84M rows/s) — see docs/PERF_NOTES.md; the ELL
engine sits at that gather-based roofline.

Methodology (docs/PERF_NOTES.md): iterations are chained inside one
jitted fori_loop with a scalar fetch at the end — on remote-attached
TPUs, per-execute latency and result memoization corrupt naive timing.
The dispatch+fetch roundtrip is a FIXED ~30-45ms per call on the tunnel
(measured 2026-08-19), so the per-iteration time is taken as the slope
between two iteration counts, which cancels it exactly.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_NODES = 1 << 19
AVG_DEGREE = 8
FEAT_DIM = 128
DTYPE_BYTES = 4
ITERS_LO = 20
ITERS_HI = 120

HBM_BW = {"tpu": 819e9, "cpu": 100e9}


def run_matrix():
    """Honest coverage matrix: {power-law, uniform, geometric} x
    F in {32, 128, 512} x {fwd, fwd+bwd}, one JSON line per cell with the
    per-engine hub-coverage fraction — the headline's power-law number
    rides the dense/chunked hub tiers; uniform/geometric graphs sit on
    the per-edge gather wall (docs/PERF_NOTES.md 'Engine comparison').
    Run: ``python bench.py --matrix``.
    """
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import geometric_graph, powerlaw_graph
    from dgl1_tpu.graph import rand_graph

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    n = (1 << 17) if on_tpu else (1 << 13)
    iters_lo, iters_hi = (10, 40) if on_tpu else (1, 3)

    # Geometric (mesh/road locality) graphs carry the block-dense layout:
    # node ids are positions, so 128x128 near-diagonal blocks fill up and
    # the SpMM rides the MXU instead of the per-edge gather wall
    # (dgl1_tpu/bdense_format.py). Power-law rides the hub tiers; uniform
    # random has no exploitable structure (gather wall is the physics).
    ALL_B = ("coo", "csr", "csc", "tile", "ell", "hub", "bdense")
    def _powerlaw_ho():
        # Hub-first relabel: identity expand (docs/PERF_NOTES.md r4).
        g0 = powerlaw_graph(n, AVG_DEGREE, seed=0)
        if g0.hub_dst is None:
            return g0
        return dgl.reorder_graph(
            g0, node_permute_algo="custom",
            permute_config={"nodes_perm": dgl.hub_order(g0)})

    families = {
        "powerlaw": _powerlaw_ho,
        "uniform": lambda: rand_graph(n, n * AVG_DEGREE, seed=0),
        "geometric": lambda: geometric_graph(n, AVG_DEGREE, seed=0,
                                             formats=ALL_B),
    }
    rows = []
    for fam, make in families.items():
        g_host = make()
        num_edges = g_host.num_edges()
        hub_frac = bd_frac = 0.0
        if g_host.hub_dst_meta is not None:
            hub_frac = g_host.hub_dst_meta.covered / max(num_edges, 1)
        if getattr(g_host, "bdense_meta", None) is not None:
            bd_frac = g_host.bdense_meta.covered / max(num_edges, 1)
        g = jax.device_put(g_host)
        jax.block_until_ready(jax.tree.leaves(g))
        for F in (32, 128, 512):
            feat = jax.random.normal(jax.random.PRNGKey(0), (n, F),
                                     jnp.float32)
            for mode in ("fwd", "fwd+bwd"):
                def make_run(iters, mode=mode):
                    @jax.jit
                    def run(g2, x):
                        if mode == "fwd":
                            def body(i, x):
                                return dgl.ops.gspmm(
                                    g2, "copy_lhs", "sum", x, None) * 0.1
                        else:
                            def body(i, x):
                                return jax.grad(lambda x: jnp.sum(
                                    dgl.ops.gspmm(g2, "copy_lhs", "sum",
                                                  x, None) ** 2))(x) * 1e-4
                        return jax.lax.fori_loop(0, iters, body, x)

                    return run

                def timed(run):
                    _ = float(run(g, feat)[0, 0])
                    t0 = time.perf_counter()
                    _ = float(run(g, feat)[0, 0])
                    return time.perf_counter() - t0

                t_lo = timed(make_run(iters_lo))
                t_hi = timed(make_run(iters_hi))
                dt = (t_hi - t_lo) / (iters_hi - iters_lo)
                roofline = HBM_BW["tpu" if on_tpu else "cpu"] / (
                    F * DTYPE_BYTES)
                row = {
                    "family": fam, "F": F, "mode": mode,
                    "edges_per_s": round(num_edges / dt, 1),
                    "vs_roofline": round(num_edges / dt / roofline, 4),
                    "hub_coverage": round(hub_frac, 4),
                    "bdense_coverage": round(bd_frac, 4),
                    "E": num_edges, "N": n, "backend": backend,
                    "engine": dgl.ops.get_engine(),
                }
                rows.append(row)
                print(json.dumps(row), flush=True)
    return rows


def main():
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    n = NUM_NODES if on_tpu else NUM_NODES // 8
    iters_lo, iters_hi = (ITERS_LO, ITERS_HI) if on_tpu else (1, 4)

    from dgl1_tpu.data.synthetic import powerlaw_graph

    g = powerlaw_graph(n, AVG_DEGREE, seed=0)
    # Hub-first relabel (one-step reorder_graph 'hub' algo): destinations
    # land in merge order so the engine's inverse-permute expand collapses
    # to a fused concat at the HBM store floor (docs/PERF_NOTES.md r4).
    # The relabel is one-time host preprocessing — TIMED and reported as
    # relabel_ms so the headline states its full cost (the sharded path's
    # hub_identity build needs none; VERDICT r4 #7).
    import dgl1_tpu as _dgl

    relabel_ms = 0.0
    if g.hub_dst is not None:
        t0 = time.perf_counter()
        g = _dgl.reorder_graph(g, node_permute_algo="hub")
        relabel_ms = (time.perf_counter() - t0) * 1e3
    num_edges = g.num_edges()
    # Pin the structure on device ONCE; features generated on device.
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, FEAT_DIM),
                             jnp.float32)

    # g is a jit ARGUMENT, not a closure: closed-over device arrays are
    # baked into the HLO as constants, which breaks the remote-compile
    # path once the graph carries the dense hub count matrix (~256MB).
    def make_run(iters, body):
        @jax.jit
        def run(g, x):
            return jax.lax.fori_loop(0, iters, lambda i, x: body(g, x), x)

        return run

    def timed(run):
        _ = float(run(g, feat)[0, 0])  # compile + warmup
        t0 = time.perf_counter()
        _ = float(run(g, feat)[0, 0])
        return time.perf_counter() - t0

    def slope(body):
        t_lo = timed(make_run(iters_lo, body))
        t_hi = timed(make_run(iters_hi, body))
        # Two-point slope: cancels the fixed dispatch+fetch roundtrip.
        return (t_hi - t_lo) / (iters_hi - iters_lo)

    dt = slope(lambda g, x: dgl.ops.gspmm(g, "copy_lhs", "sum", x, None)
               * 0.1)

    # Carry-ablated fwd+bwd (VERDICT r4 #3): the chain's keep-alive
    # carry (x must stay live into the next iteration alongside the
    # grad output) costs a measurable copy at this scale; the published
    # number must state BOTH the chain rate (what a harness pays) and
    # the pure kernel rate (chain minus the isolated carry chain) —
    # decomposition methodology of tools/profile_hub_bwd.py. CAVEAT
    # (r6): with a CONSTANT cotangent (linear loss) XLA hoists part of
    # the backward out of the loop, so the carry-ablated cell
    # OVERSTATES the kernel; bwd_pass below is the honest isolated
    # backward (loop-VARYING cotangent feeding back, no glue), and
    # train_shape = E / (fwd_pass + bwd_pass) is the per-pass truth.
    def fwd_bwd_body(g, x):
        return jax.grad(
            lambda x: jnp.sum(dgl.ops.gspmm(g, "copy_lhs", "sum", x, None))
        )(x) + x * 1e-30

    dt_fb_chain = slope(fwd_bwd_body)
    dt_carry = slope(lambda g, x: x * 1.0001)
    dt_fb_pure = max(dt_fb_chain - dt_carry, 1e-9)

    # Isolated backward pass: grad of <gspmm(x), c> wrt x is A^T c —
    # the cotangent c IS the loop carry (varies every iteration, so
    # nothing hoists), the linear forward is dead code, and the output
    # replaces the carry (no keep-alive copy).
    def bwd_body(g, c):
        return jax.grad(lambda x: jnp.sum(
            dgl.ops.gspmm(g, "copy_lhs", "sum", x, None) * c))(c)

    dt_bwd = slope(bwd_body)

    edges_per_s = num_edges / dt
    roofline = HBM_BW["tpu" if on_tpu else "cpu"] / (FEAT_DIM * DTYPE_BYTES)
    print(json.dumps({
        "metric": "spmm_copy_u_sum_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": f"edges/s (N={n}, E={num_edges}, F={FEAT_DIM}, "
                f"{backend}, engine={dgl.ops.get_engine()})",
        "vs_baseline": round(edges_per_s / roofline, 4),
        "fwd_bwd_chain_edges_per_s": round(num_edges / dt_fb_chain, 1),
        "fwd_bwd_pure_linear_edges_per_s": round(num_edges / dt_fb_pure, 1),
        "bwd_pass_ms": round(dt_bwd * 1e3, 3),
        "train_shape_edges_per_s": round(num_edges / (dt + dt_bwd), 1),
        "carry_ms": round(dt_carry * 1e3, 3),
        "relabel_ms": round(relabel_ms, 1),
    }))


if __name__ == "__main__":
    import sys

    if "--matrix" in sys.argv:
        run_matrix()
    else:
        main()
