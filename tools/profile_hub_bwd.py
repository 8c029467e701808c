"""Stage-level profile of the hub engine BACKWARD (copy_u+sum, grad_u).

Round-3 target (VERDICT weak #1): powerlaw F=128 fwd+bwd >= 2.5G edges/s
(from 1.25G). This isolates each `_bwd` stage at the benchmark-matrix
config (N=2^17, E=2^20) with the two-point chained-fori_loop method
(CLAUDE.md timing rules).
"""

from __future__ import annotations

import json
import time

import numpy as np

import os
NUM_NODES = 1 << int(os.environ.get("PROF_LOG2N", "17"))
AVG_DEGREE = 8
FEAT_DIM = 128
ITERS_LO = 20
ITERS_HI = 120


def slope(body, g, feat):
    import jax

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
    from dgl1_tpu.ops.engine_ell import ell_reduce

    n = NUM_NODES
    g = powerlaw_graph(n, AVG_DEGREE, seed=0)
    meta: HubMeta = g.hub_dst_meta
    e_real = g.num_edges()
    print(f"E={e_real} n_groups={meta.n_groups} n_dense={meta.n_dense} "
          f"n_win={meta.n_win} tail_slots={g.hub_dst['t_idx'].shape} "
          f"r_slots={g.hub_dst['r_idx'].shape}", flush=True)
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, FEAT_DIM),
                             jnp.float32)

    ff = FEAT_DIM
    f_pad = H._round_up(ff, H.BLK)

    t_carry = slope(lambda g, x: x * 1.0001, g, feat)

    t_fwd = slope(
        lambda g, x: dgl.ops.gspmm(g, "copy_lhs", "sum", x, None) * 0.1,
        g, feat)

    def fwd_bwd(g, x):
        return jax.grad(
            lambda x: jnp.sum(dgl.ops.gspmm(g, "copy_lhs", "sum", x, None))
        )(x) + x * 1e-30

    t_fwdbwd = slope(fwd_bwd, g, feat)

    # --- isolated backward stages (copy_lhs path of engine_hub._bwd) ---
    def ct_gather(g, x):
        ct_hubs = jnp.take(x, g.hub_dst["hub_ids"], axis=0, mode="fill",
                           fill_value=0.0)
        return x + 1e-30 * jnp.sum(ct_hubs)

    t_ctg = slope(ct_gather, g, feat)

    def dense_bwd(g, x):
        ct_hubs = jnp.take(x, g.hub_dst["hub_ids"], axis=0, mode="fill",
                           fill_value=0.0)
        ct_d = H._pad_2d(ct_hubs[: meta.n_dense * H.BLK],
                         meta.n_dense * H.BLK, f_pad)
        out = H._dense_bwd_call(g.hub_dst["dense_c"], ct_d)
        return x + 1e-30 * jnp.sum(out)

    t_dense = slope(dense_bwd, g, feat) if meta.n_dense else 0.0

    n_part_groups = int(meta.n_groups - meta.n_dense)

    def chunk_bwd(g, x):
        ct_hubs = jnp.take(x, g.hub_dst["hub_ids"], axis=0, mode="fill",
                           fill_value=0.0)
        ct_pad = H._pad_2d(ct_hubs, meta.n_groups * H.BLK, f_pad)
        out = H._chunk_call("plain", g.hub_dst["part_bwd"],
                            None, None, ct_pad[meta.n_dense * H.BLK:],
                            meta.n_win, f_pad)
        return x + 1e-30 * jnp.sum(out)

    t_chunk = slope(chunk_bwd, g, feat) if n_part_groups else 0.0

    def win_mask(g, x):
        y = jnp.zeros((meta.n_win * H.BLK, f_pad), jnp.float32) + x[0, 0]
        win_rows = jnp.repeat(g.hub_dst["win_mask_part"], H.BLK,
                              total_repeat_length=meta.n_win * H.BLK)
        out = jnp.where(win_rows[:, None], y, jnp.zeros_like(y))
        return x + 1e-30 * jnp.sum(out)

    t_mask = slope(win_mask, g, feat) if n_part_groups else 0.0

    def tail_bwd(g, x):
        tail_src_ell = {"idx": g.hub_dst["r_idx"],
                        "eid": g.hub_dst["r_eid"],
                        "inv_perm": g.hub_dst["r_inv"]}
        gu_tail = ell_reduce(meta.tail_meta_src, tail_src_ell, "copy_lhs",
                             "sum", x, None, n)
        return x + 1e-30 * jnp.sum(gu_tail)

    t_tail = slope(tail_bwd, g, feat)

    # The XLA glue: zeros + two adds + final add + astype, full (N, F).
    def glue(g, x):
        gu = jnp.zeros((n, ff), jnp.float32)
        gu = gu + x * 2.0
        gu = gu + x * 3.0
        gu = gu + x * 0.5
        return x + 1e-30 * jnp.sum(gu)

    t_glue = slope(glue, g, feat)

    out = {
        "carry_ms": round(t_carry * 1e3, 3),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwdbwd_ms": round(t_fwdbwd * 1e3, 3),
        "bwd_ms": round((t_fwdbwd - t_fwd) * 1e3, 3),
        "ct_gather_ms": round((t_ctg - t_carry) * 1e3, 3),
        "dense_bwd_ms": round((t_dense - t_ctg) * 1e3, 3),
        "chunk_bwd_ms": round((t_chunk - t_ctg) * 1e3, 3),
        "win_mask_ms": round((t_mask - t_carry) * 1e3, 3),
        "tail_bwd_ms": round((t_tail - t_carry) * 1e3, 3),
        "glue_ms": round((t_glue - t_carry) * 1e3, 3),
        "fwd_Gedges": round(e_real / max(t_fwd, 1e-9) / 1e9, 2),
        "fwdbwd_Gedges": round(e_real / max(t_fwdbwd, 1e-9) / 1e9, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
