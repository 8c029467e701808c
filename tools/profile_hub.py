"""Stage-level profile of the hub engine forward on the bench graph.

Times each tier (dense MXU pass, chunked one-hot pass, ELL tail stack,
final inverse-permute gather) in isolation with the fori_loop chained
method (docs/PERF_NOTES.md), to target kernel work where the ms are.
"""

from __future__ import annotations

import json
import time

import numpy as np

NUM_NODES = 1 << 19
AVG_DEGREE = 8
FEAT_DIM = 128
ITERS = 20


def timeit(fn, *args):
    import jax

    out = fn(*args)
    # Fetch ONE element (slice on device) — np.asarray(out) would drag the
    # whole array over the ~8MB/s tunnel and corrupt the timing.
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(out.reshape(-1)[0])
    return (time.perf_counter() - t0) / ITERS


def main():
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.hub_format import HubMeta
    from dgl1_tpu.ops import engine_hub as H
    from dgl1_tpu.ops.engine_ell import ell_stack

    n = NUM_NODES
    g = powerlaw_graph(n, AVG_DEGREE, seed=0)
    meta: HubMeta = g.hub_dst_meta
    print(f"E={g.num_edges()} n_groups={meta.n_groups} "
          f"n_dense={meta.n_dense} tail_slots={g.hub_dst['t_idx'].shape}")
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, FEAT_DIM),
                             jnp.float32)

    ff = FEAT_DIM
    f_pad = H._round_up(ff, H.BLK)

    def loop(body):
        @jax.jit
        def run(g, x):
            def b(i, x):
                return body(g, x)

            return jax.lax.fori_loop(0, ITERS, b, x)

        return run

    # Full forward.
    full = loop(lambda g, x: dgl.ops.gspmm(g, "copy_lhs", "sum", x, None)
                * 0.1)
    t_full = timeit(full, g, feat)

    # Dense tier only (output reused as next input via slice).
    def dense_only(g, x):
        rows_pad = g.hub_dst["dense_c"].shape[0]
        u_pad = H._pad_2d(x, rows_pad, f_pad)
        out = H._dense_fwd_call(g.hub_dst["dense_c"], u_pad)  # (n_dense*BLK, f)
        return x + 1e-30 * jnp.sum(out)

    t_dense = timeit(loop(dense_only), g, feat)

    # Chunked tier only.
    meta_groups = int(meta.n_groups - meta.n_dense)

    def chunk_only(g, x):
        rows_pad = g.hub_dst["dense_c"].shape[0]
        u_pad = H._pad_2d(x, rows_pad, f_pad)
        out = H._chunk_call("plain", g.hub_dst["part_fwd"], None, None, u_pad,
                            meta_groups, f_pad)
        return x + 1e-30 * jnp.sum(out)

    t_chunk = timeit(loop(chunk_only), g, feat)

    # ELL tail only.
    def tail_only(g, x):
        stacked = ell_stack(meta.tail_meta_dst, g.hub_dst["t_idx"],
                            g.hub_dst["t_eid"], "copy_lhs", "sum", x, None)
        return x + 1e-30 * jnp.sum(stacked)

    t_tail = timeit(loop(tail_only), g, feat)

    # Final inverse-permute gather only, on a correctly-sized merged tensor.
    stacked = ell_stack(meta.tail_meta_dst, g.hub_dst["t_idx"], g.hub_dst["t_eid"],
                        "copy_lhs", "sum", feat, None)
    hub_rows = int(meta.n_groups * H.BLK)
    merged0 = jnp.concatenate(
        [stacked, jnp.zeros((hub_rows, ff), feat.dtype)], axis=0)
    t_inv = g.hub_dst["t_inv"]

    @jax.jit
    def take_loop(merged, idx):
        def b(i, m):
            out = jnp.take(m, idx, axis=0, mode="fill", fill_value=0.0)
            return m + 1e-30 * jnp.sum(out)

        return jax.lax.fori_loop(0, ITERS, b, merged)

    t_take = timeit(take_loop, merged0, t_inv)

    print(json.dumps({
        "full_ms": round(t_full * 1e3, 3),
        "dense_ms": round(t_dense * 1e3, 3),
        "chunk_ms": round(t_chunk * 1e3, 3),
        "tail_ell_ms": round(t_tail * 1e3, 3),
        "inverse_take_ms": round(t_take * 1e3, 3),
        "stacked_rows": int(stacked.shape[0]),
        "hub_rows": hub_rows,
        "out_rows": int(t_inv.shape[0]),
    }))


if __name__ == "__main__":
    main()
