"""Stage-level profile of the hub engine forward on the bench graph.

Times each tier (dense MXU pass, chunked one-hot pass, ELL tail stack,
final inverse-permute) with the two-point chained-fori_loop method: the
tunnel's dispatch+fetch roundtrip is a FIXED ~30-45ms per call, so the
per-iteration time is the slope between two iteration counts
(docs/PERF_NOTES.md). Each isolated stage body also carries the
`x + eps*sum(out)` chaining pass (~0.67ms at N=2^19, F=128) — the
`carry_ms` row measures exactly that, subtract it per stage.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_NODES = 1 << 19
AVG_DEGREE = 8
FEAT_DIM = 128
ITERS_LO = 20
ITERS_HI = 120


def slope(body, g, feat):
    import jax
    import jax.numpy as jnp

    totals = []
    for iters in (ITERS_LO, ITERS_HI):
        @jax.jit
        def run(g, x):
            return jax.lax.fori_loop(0, iters, lambda i, x: body(g, x), x)

        _ = float(run(g, feat).reshape(-1)[0])  # compile + warmup
        t0 = time.perf_counter()
        _ = float(run(g, feat).reshape(-1)[0])
        totals.append(time.perf_counter() - t0)
    return (totals[1] - totals[0]) / (ITERS_HI - ITERS_LO)


def main():
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.hub_format import HubMeta
    from dgl1_tpu.ops import engine_hub as H
    from dgl1_tpu.ops.engine_ell import ell_stack

    import sys

    n = NUM_NODES
    g = powerlaw_graph(n, AVG_DEGREE, seed=0)
    if "--huborder" in sys.argv:
        g = dgl.reorder_graph(
            g, node_permute_algo="custom",
            permute_config={"nodes_perm": dgl.hub_order(g)})
        print("hub-first relabel: identity_expand =",
              g.hub_dst_meta.identity_expand, flush=True)
    meta: HubMeta = g.hub_dst_meta
    print(f"E={g.num_edges()} n_groups={meta.n_groups} "
          f"n_dense={meta.n_dense} tail_slots={g.hub_dst['t_idx'].shape}",
          flush=True)
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, FEAT_DIM),
                             jnp.float32)

    ff = FEAT_DIM
    f_pad = H._round_up(ff, H.BLK)

    # The chaining pass alone: every isolated stage pays this on top.
    t_carry = slope(lambda g, x: x * 1.0001, g, feat)

    # Full forward (output IS the carry: no extra pass).
    t_full = slope(
        lambda g, x: dgl.ops.gspmm(g, "copy_lhs", "sum", x, None) * 0.1,
        g, feat)

    rows_pad = None  # set below per stage

    def dense_only(g, x):
        rows_pad = g.hub_dst["dense_c"].shape[0]
        u_pad = H._pad_2d(x, rows_pad, f_pad)
        out = H._dense_fwd_call(g.hub_dst["dense_c"], u_pad)
        return x + 1e-30 * jnp.sum(out)

    t_dense = slope(dense_only, g, feat)

    meta_groups = int(meta.n_groups - meta.n_dense)

    def chunk_only(g, x):
        if meta_groups == 0:
            return x * 1.0001
        rows_pad = g.hub_dst["dense_c"].shape[0]
        u_pad = H._pad_2d(x, rows_pad, f_pad)
        out = H._chunk_call("plain", g.hub_dst["part_fwd"], None, None,
                            u_pad, meta_groups, f_pad)
        return x + 1e-30 * jnp.sum(out)

    t_chunk = slope(chunk_only, g, feat)

    def tail_only(g, x):
        stacked = ell_stack(meta.tail_meta_dst, g.hub_dst["t_idx"],
                            g.hub_dst["t_eid"], "copy_lhs", "sum", x, None)
        return x + 1e-30 * jnp.sum(stacked)

    t_tail = slope(tail_only, g, feat)

    # Expand/inverse-permute on a correctly-sized merged tensor.
    stacked = ell_stack(meta.tail_meta_dst, g.hub_dst["t_idx"],
                        g.hub_dst["t_eid"], "copy_lhs", "sum", feat, None)
    hub_rows = int(meta.n_groups * H.BLK)
    n_merge = int(stacked.shape[0]) + hub_rows
    m_pad = H._round_up(n_merge, 32)
    use_expand = (g.hub_dst["x_desc"].shape[0] > 0
                  and m_pad * H.BLK * 4 <= H._EXPAND_VMEM_BYTES)

    identity = bool(getattr(meta, "identity_expand", False))

    def expand_only(g, x):
        merged2 = jnp.zeros((m_pad, f_pad), jnp.float32) + x[:m_pad]
        if identity:
            out = jnp.concatenate(
                [merged2[:n_merge],
                 jnp.zeros((n - n_merge, f_pad), jnp.float32)], axis=0)
        elif use_expand:
            out = H._expand_call(merged2, g.hub_dst["x_starts"],
                                 g.hub_dst["x_desc"], n)
        else:
            out = jnp.take(merged2, g.hub_dst["t_inv"], axis=0,
                           mode="fill", fill_value=0.0)
        return x + 1e-30 * jnp.sum(out)

    t_expand = slope(expand_only, g, feat)

    print(json.dumps({
        "carry_ms": round(t_carry * 1e3, 3),
        "full_ms": round(t_full * 1e3, 3),
        "dense_ms_incl_carry": round(t_dense * 1e3, 3),
        "chunk_ms_incl_carry": round(t_chunk * 1e3, 3),
        "tail_ell_ms_incl_carry": round(t_tail * 1e3, 3),
        "expand_ms_incl_carry": round(t_expand * 1e3, 3),
        "uses_pallas_expand": bool(use_expand),
        "stacked_rows": int(stacked.shape[0]),
        "hub_rows": hub_rows,
    }))


if __name__ == "__main__":
    main()
