"""Profile the fused GAT attention op (ops/attention.py) in isolation.

Two-point chained-fori_loop timing (docs/PERF_NOTES.md) of the fused
attention forward and forward+backward at a given scale, separated from
the dense projections of the full GATConv — locates where the arxiv-scale
GAT epoch time goes.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=169343)
    p.add_argument("--deg", type=int, default=26)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--iters", default="10,60")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--precision", default="f32", choices=["f32", "bf16"])
    p.add_argument("--self-loops", action="store_true",
                   help="add self loops (bench_models graph parity)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import dgl1_tpu as dgl  # noqa: F401
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.ops import set_matmul_precision
    from dgl1_tpu.ops.attention import can_fuse_attention, gat_attention

    set_matmul_precision(args.precision)

    n = args.nodes
    g = powerlaw_graph(n, args.deg, seed=0)
    if args.self_loops:
        import dgl1_tpu as d2
        g = d2.add_self_loop(g)
    assert can_fuse_attention(g), "hub format missing"
    e = g.num_edges()
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))

    h, d = args.heads, args.dim
    key = jax.random.PRNGKey(0)
    el = jax.random.normal(key, (n, h), jnp.float32)
    er = jax.random.normal(key, (n, h), jnp.float32)
    ft = jax.random.normal(key, (n, h, d), jnp.float32)

    def timed(fn, iters_lo, iters_hi):
        outs = []
        for iters in (iters_lo, iters_hi):
            @jax.jit
            def run(g, el, er, ft):
                def body(i, carry):
                    el_, ft_ = carry
                    out = fn(g, el_, er, ft_)
                    # Feed outputs back so nothing is DCE'd or hoisted.
                    return el_ + out[: el_.shape[0], :, 0] * 1e-9, ft_
                return jax.lax.fori_loop(0, iters, body, (el, ft))

            r = run(g, el, er, ft)
            _ = float(r[0][0, 0])
            t0 = time.perf_counter()
            r = run(g, el, er, ft)
            _ = float(r[0][0, 0])
            outs.append(time.perf_counter() - t0)
        return (outs[1] - outs[0]) / (iters_hi - iters_lo)

    lo, hi = (int(x) for x in args.iters.split(","))

    def fwd(g, el, er, ft):
        return gat_attention(g, el, er, ft)

    def fwdbwd(g, el, er, ft):
        def s(el_, er_, ft_):
            return jnp.sum(gat_attention(g, el_, er_, ft_) ** 2)

        gel, ger, gft = jax.grad(s, argnums=(0, 1, 2))(el, er, ft)
        return gft + ft * 0 + gel[:, :, None] + ger[:, :, None]

    t_f = timed(fwd, lo, hi)
    t_fb = timed(fwdbwd, lo, hi)
    print(json.dumps({
        "nodes": n, "edges": int(e), "heads": h, "dim": d,
        "fwd_ms": round(t_f * 1e3, 2),
        "fwd_bwd_ms": round(t_fb * 1e3, 2),
        "fwd_Medges_s": round(e / t_f / 1e6, 1),
        "fwd_bwd_Medges_s": round(e / t_fb / 1e6, 1),
        "precision": args.precision,
        "backend": jax.default_backend(),
    }), flush=True)


if __name__ == "__main__":
    main()
