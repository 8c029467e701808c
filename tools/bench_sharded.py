"""Real-chip timings for the sharded (partitioned) SpMM paths at mesh=1.

VERDICT r3 #1/#7: the multi-chip sharded code paths must not forfeit the
flagship single-chip rate. At mesh size 1 the partitioned program is the
same math as the unsharded engine plus the halo machinery (a no-op
all_to_all, the combined-space concat, sentinel padding), so its rate
directly measures the sharding overhead. Target: hub-engine sharded
fwd within ~15-20% of the unsharded bench.py headline.

Run on the TPU box:  python tools/bench_sharded.py [--n 19] [--feat 128]
Prints one JSON line per (path, direction) cell.

Methodology: chained iterations inside one jitted fori_loop, two-point
slope between iteration counts (docs/PERF_NOTES.md 2026-08-19 — the
remote tunnel adds a fixed ~30-45 ms dispatch+fetch roundtrip per call).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=19, help="log2 num nodes")
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--feat", type=int, default=128)
    ap.add_argument("--paths", default="hubc,hub,vcut,unsharded",
                    # hubi: internal hub_identity relabel (no hub_order
                    # preprocessing), combined layout

                    help="also: hubg (grad INSIDE shard_map — isolates "
                         "the linearization residual-matching overhead), "
                         "tiles, gat, gatf, rgcn")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph
    from dgl1_tpu.parallel.halo import (build_partitioned_graph,
                                        vertex_cut_edge_owner)
    from dgl1_tpu.parallel.sharded_ops import (halo_exchange,
                                               sharded_gspmm,
                                               sharded_gspmm_combined)

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    n = 1 << (args.n if on_tpu else args.n - 6)
    iters_lo, iters_hi = (10, 60) if on_tpu else (1, 3)
    f = args.feat

    g = powerlaw_graph(n, args.deg, seed=0)
    g_raw = g  # pre-relabel graph (the hubi path relabels internally)
    if g.hub_dst is not None:
        # Hub-first relabel: at mesh=1 the per-part layout inherits the
        # identity-expand fast path (PERF_NOTES r4).
        g = dgl.reorder_graph(
            g, node_permute_algo="custom",
            permute_config={"nodes_perm": dgl.hub_order(g)})
    e = g.num_edges()
    part = np.zeros(n, np.int32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("p",))

    feat = jax.random.normal(jax.random.PRNGKey(0), (1, n, f), jnp.float32)

    def build(kind):
        if kind in ("hub", "hubc", "hubg"):
            return build_partitioned_graph(g, part, 1, tiles=False,
                                           hub=True)
        if kind == "hubi":
            # k-agnostic identity relabel (round-5 #1): NO hub_order
            # preprocessing — build_partitioned_graph renumbers each
            # part hub-first internally; must match the hubc-on-
            # hub_order-graph rate.
            pgi = build_partitioned_graph(g_raw, part, 1, tiles=False,
                                          hub=True, hub_identity=True)
            assert pgi.hub_meta.identity_expand, "identity not achieved"
            return pgi
        if kind == "tiles":
            return build_partitioned_graph(g, part, 1, tiles=True)
        if kind == "vcut":
            eo = vertex_cut_edge_owner(g, part, 1)
            return build_partitioned_graph(g, part, 1, tiles=False,
                                           hub=True, edge_owner=eo)
        raise ValueError(kind)

    def run_cell(kind, direction):
        if kind == "unsharded":
            gg = jax.device_put(g)
            jax.block_until_ready(jax.tree.leaves(gg))
            x0 = feat[0]

            def make(iters):
                @jax.jit
                def run(gg, x):
                    def body(i, x):
                        if direction == "fwd":
                            return dgl.ops.gspmm(
                                gg, "copy_lhs", "sum", x, None) * 0.1
                        gr = jax.grad(lambda xx: jnp.sum(dgl.ops.gspmm(
                            gg, "copy_lhs", "sum", xx, None) ** 2))(x)
                        return x - 1e-12 * gr

                    return jax.lax.fori_loop(0, iters, body, x)

                return run

            def timed(run):
                _ = float(run(gg, x0)[0, 0])
                t0 = time.perf_counter()
                _ = float(run(gg, x0)[0, 0])
                return time.perf_counter() - t0

            t_lo = timed(make(iters_lo))
            t_hi = timed(make(iters_hi))
            return (t_hi - t_lo) / (iters_hi - iters_lo)

        pg = build(kind)
        if kind in ("hub", "hubc", "hubg", "hubi", "vcut"):
            assert pg.hub_meta is not None, "hub layout did not build"
        pg = jax.device_put(pg)
        jax.block_until_ready(
            [l for l in jax.tree.leaves(pg) if hasattr(l, "block_until_ready")])

        spec_pg = jax.tree.map(lambda _: P("p"), pg)
        combined = kind in ("hubc", "hubg", "hubi")
        grad_inside = kind == "hubg"
        xin = feat
        if combined:
            xin = jnp.pad(feat, ((0, 0), (0, pg.hub_rows - n), (0, 0)))

        def body_fn(pg_l, x):
            def one(xx):
                if combined:
                    # Activations stay in the [owned|halo|pad] layout:
                    # no concat/pad copy passes anywhere in the chain.
                    return sharded_gspmm_combined(pg_l, xx, "p")
                return sharded_gspmm(pg_l, xx, "p")[: pg_l.n_loc]

            if direction == "fwd":
                return (one(x[0]) * 0.1)[None]
            if grad_inside:
                # Whole fwd+bwd INSIDE the shard_map body: residuals
                # never cross the map boundary, so jax's per-leaf
                # output-spec re-matching (the measured ~1.7 ms sharded
                # bwd overhead) disappears. The psum makes the loss —
                # and with it the cross-device halo grads — global.
                def loss(xx):
                    return jax.lax.psum(jnp.sum(one(xx) ** 2), "p")

                gr = jax.grad(loss)(x[0])
                return (x[0] - 1e-12 * gr)[None]
            gr = jax.grad(lambda xx: jnp.sum(one(xx) ** 2))(x[0])
            return (x[0] - 1e-12 * gr)[None]

        def make(iters):
            inner = jax.shard_map(
                body_fn, mesh=mesh, in_specs=(spec_pg, P("p")),
                out_specs=P("p"), check_vma=False)

            @jax.jit
            def run(pg, x):
                def body(i, x):
                    return inner(pg, x)

                return jax.lax.fori_loop(0, iters, body, x)

            return run

        def timed(run):
            _ = float(run(pg, xin)[0, 0, 0])
            t0 = time.perf_counter()
            _ = float(run(pg, xin)[0, 0, 0])
            return time.perf_counter() - t0

        t_lo = timed(make(iters_lo))
        t_hi = timed(make(iters_hi))
        return (t_hi - t_lo) / (iters_hi - iters_lo)

    def run_gat(kind="gat"):
        """Sharded GAT attention at mesh=1 (n scaled down: the per-dst
        softmax path uses XLA segment ops — the known scatter cost on
        TPU; this leg MEASURES it rather than assuming)."""
        from dgl1_tpu.parallel.sharded_ops import make_sharded_gat_layer

        n_g = min(n, 1 << 17)
        gg = powerlaw_graph(n_g, args.deg, seed=1)
        e_g = gg.num_edges()
        part_g = np.zeros(n_g, np.int32)
        fused = kind == "gatf"
        pg = build_partitioned_graph(gg, part_g, 1, hub=fused or None,
                                     tiles=not fused)
        layer = make_sharded_gat_layer(pg, mesh, fused=fused)
        h, d = 4, 32
        key = jax.random.PRNGKey(0)
        el = jax.random.normal(key, (1, pg.n_loc, h))
        er = jax.random.normal(key, (1, pg.n_loc, h))
        ft = jax.random.normal(key, (1, pg.n_loc, h, d))

        def make(iters):
            @jax.jit
            def run(el, er, ft):
                def body(i, ft):
                    return layer(el, er, ft) * 0.5 + ft * 0.5

                return jax.lax.fori_loop(0, iters, body, ft)

            return run

        def timed(run):
            _ = float(run(el, er, ft)[0, 0, 0, 0])
            t0 = time.perf_counter()
            _ = float(run(el, er, ft)[0, 0, 0, 0])
            return time.perf_counter() - t0

        lo, hi = (5, 25) if on_tpu else (1, 2)
        t_lo = timed(make(lo))
        t_hi = timed(make(hi))
        dt = (t_hi - t_lo) / (hi - lo)
        print(json.dumps({
            "path": "gat_attention_fused" if fused else "gat_attention",
            "dir": "fwd",
            "ms_per_iter": round(dt * 1e3, 3),
            "edges_per_s": round(e_g / dt, 1),
            "gedges_per_s": round(e_g / dt / 1e9, 3),
            "cfg": f"N={n_g} E={e_g} H={h} D={d} mesh=1 {backend} "
                   + ("(fused hub kernels)" if fused
                      else "(segment-softmax path)"),
        }), flush=True)

    def run_step(kind):
        """Full combined-layout GCN train step at bench scale (fwd+bwd+
        adam), with ("stepp") and without ("step") the standing halo
        prefill — measures the layer-1 dynamic_update_slice copy that an
        undonated jit input forces (PERF_NOTES r4 halo-AD item)."""
        import optax

        from dgl1_tpu.parallel.sharded_ops import fill_halo_combined
        from dgl1_tpu.parallel.train import (init_gcn_params,
                                             make_gcn_train_step)

        prefilled = kind == "stepp"
        pg = build_partitioned_graph(g, part, 1, tiles=False, hub=True)
        hidden, classes = 128, 32
        opt = optax.adam(1e-3)
        step, _ = make_gcn_train_step(pg, mesh, opt, classes,
                                      combined=True, prefilled=prefilled)
        x = jnp.pad(feat, ((0, 0), (0, pg.hub_rows - n), (0, 0)))
        if prefilled:
            x = fill_halo_combined(pg, mesh)(x)
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.integers(0, classes, (1, pg.n_loc)), jnp.int32)
        params = init_gcn_params(jax.random.PRNGKey(0), f, hidden, classes)
        st = opt.init(params)

        # Chain steps inside ONE jitted fori_loop (CLAUDE.md: per-call
        # dispatch is a fixed ~30-45 ms through the tunnel); pg rides as
        # a jit ARGUMENT via step.func to keep the layout arrays out of
        # the HLO constants.
        jstep = step.func
        mask = jax.device_put(pg.node_mask)

        def make(iters):
            @jax.jit
            def run(pg_a, params, st, x, y, mask):
                def body(i, c):
                    p, s0 = c
                    p, s0, _ = jstep(pg_a, p, s0, x, y, mask)
                    return (p, s0)

                return jax.lax.fori_loop(0, iters, body, (params, st))[0]

            return run

        pg_d = jax.device_put(pg)

        def timed(run):
            _ = float(run(pg_d, params, st, x, y, mask)["w1"][0, 0])
            t0 = time.perf_counter()
            _ = float(run(pg_d, params, st, x, y, mask)["w1"][0, 0])
            return time.perf_counter() - t0

        lo, hi = (5, 25) if on_tpu else (1, 2)
        t_lo, t_hi = timed(make(lo)), timed(make(hi))
        dt = (t_hi - t_lo) / (hi - lo)
        print(json.dumps({
            "path": kind, "dir": "train_step",
            "ms_per_iter": round(dt * 1e3, 3),
            "edges_per_s_2layers": round(2 * e / dt, 1),
            "cfg": f"N={n} E={e} F={f} hidden={hidden} mesh=1 {backend} "
                   + ("prefilled halo" if prefilled else "per-step halo"),
        }), flush=True)

    def run_rgcn(identity=False):
        """Sharded typed R-GCN layer at mesh=1, mag-ish scale (169k
        nodes / ~4.4M typed edges / 8 relations) — fwd+bwd of
        make_sharded_rgcn_layer with per-relation hub layouts; compare
        against tools/bench_models.py --model rgcn (23.7 ms/epoch
        unsharded, includes basis decomp + adam)."""
        import dgl1_tpu as dgl
        from dgl1_tpu.parallel.hetero import (build_partitioned_hetero,
                                              sharded_typed_gspmm)

        rng = np.random.default_rng(0)
        n_nt, rels, e_rel = 169_000, 8, 550_000
        scale = 1 if on_tpu else 64
        n_nt, e_rel = n_nt // scale, e_rel // scale
        edges = {}
        for r in range(rels):
            # Zipf-ish dst concentration per relation (hub regime).
            dst_r = np.minimum(rng.zipf(1.9, size=e_rel) - 1, n_nt - 1)
            edges[("n", f"r{r}", "n")] = (
                rng.integers(0, n_nt, e_rel), dst_r)
        hg = dgl.heterograph(edges, num_nodes_dict={"n": n_nt})
        e_tot = sum(hg[c].num_edges() for c in hg.canonical_etypes)
        part = {"n": np.zeros(n_nt, np.int32)}
        phg = build_partitioned_hetero(hg, part, 1, hub=True,
                                       hub_identity=identity)
        n_ident = sum(1 for c in phg.etypes
                      if phg.hub[c] is not None
                      and phg.hub_meta[c].identity_expand)
        if identity:
            print(f"[rgcni] identity relations: {n_ident}/{rels} "
                  f"(the cost guard falls back on long-tail graphs - "
                  f"PERF_NOTES r6)", flush=True)
        n_hub = sum(1 for c in phg.etypes if phg.hub[c] is not None)
        f_in = f_out = 64

        # phg must be a jit ARGUMENT: the closed-over hub arrays would
        # be baked into the HLO as constants and trip the remote-compile
        # 413 size limit (PERF_NOTES round-1 landmine, same rule as
        # bench.py's graph).
        def typed_layer(phg_l, f, w, sw):
            agg = sharded_typed_gspmm(phg_l, {"n": f["n"][0]}, w, "p")
            y = agg["n"] / jnp.maximum(phg_l.in_deg["n"][0], 1.0)[:, None]
            return (y + f["n"][0] @ sw["n"])[None]

        spec_pg = jax.tree.map(lambda _: P("p"), phg)
        layer_sm = jax.shard_map(
            typed_layer, mesh=mesh,
            in_specs=(spec_pg, {"n": P("p")},
                      jax.tree.map(lambda _: P(), {
                          c: 0 for c in hg.canonical_etypes}),
                      {"n": P()}),
            out_specs=P("p"), check_vma=False)
        feats = {"n": jax.random.normal(
            jax.random.PRNGKey(0), (1, phg.n_loc["n"], f_in))}
        weights = {c: jax.random.normal(jax.random.PRNGKey(1),
                                        (f_in, f_out)) * 0.1
                   for c in hg.canonical_etypes}
        selfw = {"n": jax.random.normal(jax.random.PRNGKey(2),
                                        (f_in, f_out)) * 0.1}

        def make(iters):
            @jax.jit
            def run(phg, feats, weights, selfw):
                def body(i, carry):
                    f, w = carry

                    def loss(w):
                        out = layer_sm(phg, f, w, selfw)
                        return jnp.sum(out ** 2)

                    gw = jax.grad(loss)(w)
                    w = jax.tree.map(lambda a, g: a - 1e-12 * g, w, gw)
                    return (f, w)

                return jax.lax.fori_loop(0, iters, body,
                                         (feats, weights))[1]

            return run

        def timed(run):
            out = run(phg, feats, weights, selfw)
            _ = float(jax.tree.leaves(out)[0][0, 0])
            t0 = time.perf_counter()
            out = run(phg, feats, weights, selfw)
            _ = float(jax.tree.leaves(out)[0][0, 0])
            return time.perf_counter() - t0

        lo, hi = (5, 25) if on_tpu else (1, 2)
        t_lo = timed(make(lo))
        t_hi = timed(make(hi))
        dt = (t_hi - t_lo) / (hi - lo)
        print(json.dumps({
            "path": "typed_rgcn" + ("_identity" if identity else ""),
            "dir": "fwdbwd",
            "ms_per_iter": round(dt * 1e3, 3),
            "edges_per_s": round(e_tot / dt, 1),
            "gedges_per_s": round(e_tot / dt / 1e9, 3),
            "cfg": f"N={n_nt} E={e_tot} rels={rels} F={f_in} mesh=1 "
                   f"{backend} hub_rels={n_hub}",
        }), flush=True)

    for kind in args.paths.split(","):
        if kind in ("gat", "gatf"):
            run_gat(kind)
            continue
        if kind in ("step", "stepp"):
            run_step(kind)
            continue
        if kind == "rgcn":
            run_rgcn()
            continue
        if kind == "rgcni":
            run_rgcn(identity=True)
            continue
        for direction in ("fwd", "fwdbwd"):
            t0 = time.perf_counter()
            dt = run_cell(kind, direction)
            print(json.dumps({
                "path": kind, "dir": direction,
                "ms_per_iter": round(dt * 1e3, 3),
                "edges_per_s": round(e / dt, 1),
                "gedges_per_s": round(e / dt / 1e9, 3),
                "wall_s": round(time.perf_counter() - t0, 1),
                "cfg": f"N={n} E={e} F={f} mesh=1 {backend}",
            }), flush=True)


if __name__ == "__main__":
    main()
