"""Measure the block-dense engine on the geometric (locality) family,
real TPU: bdense vs the ELL gather path, fwd and fwd+bwd. Slope-timed
fori_loop per docs/PERF_NOTES.md methodology."""

import json
import time

import jax
import jax.numpy as jnp

import dgl1_tpu as dgl
from dgl1_tpu.data.synthetic import geometric_graph
from dgl1_tpu.ops import dispatch

N, DEG, F = 1 << 17, 8, 128
ALL_B = ("coo", "csr", "csc", "tile", "ell", "hub", "bdense")


def main():
    import sys

    on_tpu = jax.default_backend() not in ("cpu",)
    n = N if on_tpu else N // 16
    lo, hi = (5, 20) if on_tpu else (1, 3)
    engines = ("bdense", "ell") if "--ell" in sys.argv else ("bdense",)
    g_host = geometric_graph(n, DEG, seed=0, formats=ALL_B)
    e = g_host.num_edges()
    m = g_host.bdense_meta
    print(json.dumps({"n_blocks": m.n_blocks, "covered": m.covered,
                      "frac": round(m.covered / e, 4), "E": e}), flush=True)
    t0 = time.time()
    g = jax.device_put(g_host)
    jax.block_until_ready(jax.tree.leaves(g))
    print(f"# device_put {time.time() - t0:.1f}s", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, F), jnp.float32)

    for engine in engines:
        dispatch.set_engine(engine)
        for mode in ("fwd", "fwd+bwd"):
            def make(iters, mode=mode):
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

            def timed(run, tag):
                t0 = time.perf_counter()
                _ = float(run(g, x)[0, 0])
                print(f"# {engine}/{mode}/{tag} compile+warm "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
                t0 = time.perf_counter()
                _ = float(run(g, x)[0, 0])
                return time.perf_counter() - t0

            dt = (timed(make(hi), "hi") - timed(make(lo), "lo")) / (hi - lo)
            print(json.dumps({
                "engine": engine, "mode": mode,
                "edges_per_s": round(e / dt, 1),
                "ms": round(dt * 1e3, 3),
            }), flush=True)
    dispatch.set_engine("auto")


if __name__ == "__main__":
    main()
