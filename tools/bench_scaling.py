"""Multi-chip scaling evidence (BASELINE north-star: >=80% efficiency).

No multi-chip hardware is attached to this dev environment (one v5e via
a tunnel), so this tool produces the honest substitute:

1. **Executes** the full partitioned train step (halo all_to_all +
   local aggregation inside shard_map) on an N-device virtual CPU mesh —
   proving the sharded program compiles and runs for every N.
2. **Projects** scaling efficiency for the real topology from measured
   quantities: the partitioner's actual halo sizes / load balance on the
   target graph, the measured single-chip aggregation rate, and the
   published v5e ICI bandwidth. Projection model: per layer,
   ``t(k) = max(e_loc(k)/rate, halo_bytes(k)/ICI_BW)`` (compute and the
   all_to_all overlap at best; the max is the optimistic bound, the sum
   the pessimistic one — both reported).

Run with real multi-chip hardware to replace the projection with a
measurement (the step function is the same one `examples/train_dist.py`
uses).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# Effective per-chip ICI bandwidth for a v5e 2D-torus all_to_all
# (spec ~400 Gbps x 4 links per chip; all_to_all sustains a fraction).
ICI_BW_EFF = 80e9  # bytes/s, conservative


def sensitivity():
    """Projection sensitivity over (edge-cut fraction, feature width,
    halo wire format): how the >=80% north-star depends on partition
    quality, per width.

    Model per chip per layer: t_comp = (E/k)/rate(F); comm rows are the
    UPPER bound cut*E/k (one remote source row per cut edge — dedup of
    shared halo sources only helps); t_comm = rows*F*wire_bytes /
    ICI_BW_EFF. Efficiency (overlapped) = t1 / (k * max(t_comp,
    t_comm)). rate(F) from the measured SHARDED hub path at mesh=1
    (tools/bench_sharded.py, combined layout — round 4: the sharded
    per-chip rate now matches the single-chip headline, which makes
    partition quality and wire compression MORE binding, not less).
    The bf16 wire (build_partitioned_graph(halo_dtype='bf16')) halves
    comm bytes and therefore doubles the break-even cut.
    """
    # F=128: measured sharded-hub fwd at mesh=1 WITH the k-agnostic
    # identity relabel (4.12G, bench_sharded --paths hubi, round 5).
    # F=32/512: single-chip identity-matrix rates (PERF_NOTES r4
    # hub_order matrix) — the sharded relative overhead at F=128 was ~0
    # so they carry over. int8 wire: F + 4 bytes/row scale (~1.03 B/feat
    # at F=128) — QUARTERS comm, the lever that keeps eff >= 0.8 now
    # that the identity-rate compute made comm twice as binding.
    rates = {32: 4.10e9, 128: 4.12e9, 512: 3.71e9}
    e = (1 << 19) * 8
    k = 8
    print(json.dumps({"model": "eff = t1/(k*max(comp, comm))",
                      "E": e, "k": k, "ici_bw": ICI_BW_EFF}))
    for wire_bytes, wire in ((4, "f32"), (2, "bf16"), (1.03, "int8")):
        for F, rate in rates.items():
            t1 = e / rate
            row = {"wire": wire, "F": F}
            for cut in (0.02, 0.05, 0.1, 0.2, 0.3, 0.5):
                t_comp = (e / k) / rate
                t_comm = cut * (e / k) * F * wire_bytes / ICI_BW_EFF
                row[f"cut_{cut}"] = round(
                    t1 / (k * max(t_comp, t_comm)), 3)
            # Break-even cut: comm == comp.
            row["breakeven_cut"] = round(
                min((1 / rate) / (F * wire_bytes / ICI_BW_EFF), 1.0), 3)
            print(json.dumps(row), flush=True)
    # Achieved cuts (k=8, metis_partition_assignment with the round-4
    # FM refinement; measured 2026-08-21): the bar is eff >= 0.80 at
    # the ACHIEVED cut for F=128.
    achieved = {"geometric_2^16_deg8": 0.0048, "grid_256x256": 0.023,
                "community_64x1k": 0.124}
    for fam, cut in achieved.items():
        rate = rates[128]
        t_comp = (e / k) / rate
        row = {"family": fam, "achieved_cut": cut}
        for wire_bytes, wire in ((4, "f32"), (2, "bf16"),
                                 (1.03, "int8")):
            t_comm = cut * (e / k) * 128 * wire_bytes / ICI_BW_EFF
            row[f"eff_F128_{wire}"] = round(
                (e / rate) / (k * max(t_comp, t_comm)), 3)
        print(json.dumps(row), flush=True)


def sensitivity_layout():
    """LAYOUT-TRUE sensitivity (VERDICT r4 #4a): the cut*E/k row model
    above is an unpadded dedup-free estimate; the program actually ships
    ``(k-1) * (m_halo + m_part)`` rows per device per exchange — per-pair
    halo lists PADDED to the max pair count (all_to_all needs uniform
    blocks). tools/audit_comm.py verified the compiled HLO moves exactly
    the layout rows (ratio 1.0 at k=2,4,8). This builds the real
    partitions for each achieved-cut family at k=8 and re-projects
    efficiency from the LAYOUT rows — the number the model section's
    eff should be held against. Run: ``--sensitivity-layout``."""
    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import geometric_graph
    from dgl1_tpu.parallel import build_partitioned_graph
    from dgl1_tpu.parallel.partition import (edge_cut_fraction,
                                             metis_partition_assignment)

    def grid_graph(side):
        ii = np.arange(side * side).reshape(side, side)
        pairs = []
        pairs.append((ii[:, :-1].ravel(), ii[:, 1:].ravel()))
        pairs.append((ii[:-1, :].ravel(), ii[1:, :].ravel()))
        src = np.concatenate([a for a, _ in pairs]
                             + [b for _, b in pairs])
        dst = np.concatenate([b for _, b in pairs]
                             + [a for a, _ in pairs])
        return dgl.graph((src, dst), num_nodes=side * side,
                         formats=("csc",))

    fams = {
        "geometric_2^16_deg8": lambda: geometric_graph(1 << 16, 8, seed=0),
        "grid_256x256": lambda: grid_graph(256),
        "community_64x1k": lambda: dgl.data.synthetic_classification_graph(
            num_nodes=1 << 16, num_classes=64, feat_dim=8,
            avg_degree=8.0, homophily=0.9, seed=0),
    }
    k, F = 8, 128
    rate = 4.12e9  # sharded identity-rate fwd, F=128 (bench_sharded r5)
    for fam, make in fams.items():
        g = make()
        e = g.num_edges()
        part = metis_partition_assignment(g, k, balance_edges=True)
        pg = build_partitioned_graph(g, part, k)
        cut = float(edge_cut_fraction(g, part))
        layout_rows = (k - 1) * (pg.m_halo + pg.m_part)
        model_rows = cut * e / k
        t1 = e / rate
        t_comp = pg.e_loc / rate
        row = {"family": fam, "E": int(e), "cut": round(cut, 4),
               "m_halo": int(pg.m_halo), "m_part": int(pg.m_part),
               "layout_rows": int(layout_rows),
               "model_rows": round(model_rows, 1),
               "layout_over_model": round(
                   layout_rows / max(model_rows, 1e-9), 3)}
        for wire_bytes, wire in ((4.0, "f32"), (2.0, "bf16"),
                                 (1.03, "int8")):
            t_comm = layout_rows * F * wire_bytes / ICI_BW_EFF
            row[f"eff_layout_F128_{wire}"] = round(
                t1 / (k * max(t_comp, t_comm)), 3)
        print(json.dumps(row), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=1 << 19)
    p.add_argument("--deg", type=int, default=8)
    p.add_argument("--feat", type=int, default=128)
    p.add_argument("--rate", type=float, default=2.03e9,
                   help="measured single-chip aggregation rate (edges/s) "
                        "at this feature width (bench.py headline)")
    p.add_argument("--parts", default="1,2,4,8")
    p.add_argument("--megahub", action="store_true",
                   help="use the uncapped Zipf graph (one node owns >half "
                        "of E) — the vertex-cut stress case")
    p.add_argument("--execute", action="store_true",
                   help="also run one sharded step per k on a virtual "
                        "CPU mesh (needs XLA_FLAGS=--xla_force_host_"
                        "platform_device_count=<max k> and a small graph)")
    args = p.parse_args()

    import jax

    if args.execute:
        jax.config.update("jax_platforms", "cpu")

    import dgl1_tpu as dgl  # noqa: F401
    from dgl1_tpu.parallel import (build_partitioned_graph,
                                   vertex_cut_edge_owner)
    from dgl1_tpu.parallel.partition import (edge_cut_fraction,
                                             metis_partition_assignment)

    # ogbn-like degree profile: Zipf-ish skew but with the max in-degree
    # capped at ~0.5% of E (products: max deg is ~0.014% of E). An
    # uncapped Zipf at bench scale puts >half of ALL edges on one node,
    # which makes node-granular edge ownership unsplittable — that regime
    # needs vertex-cut (split-destination) partitioning, a documented
    # next step, not the common case.
    rng = np.random.default_rng(0)
    n_, e_ = args.nodes, args.nodes * args.deg
    cap = e_ if args.megahub else max(e_ // 200, 8)
    wts = np.minimum(rng.zipf(2.2, size=n_), cap)
    deg_arr = np.maximum((wts * (e_ / wts.sum())).astype(np.int64), 0)
    dst_a = np.repeat(np.arange(n_, dtype=np.int64), deg_arr)[:e_]
    if len(dst_a) < e_:
        dst_a = np.concatenate(
            [dst_a, rng.integers(0, n_, size=e_ - len(dst_a))])
    src_a = rng.integers(0, n_, size=e_)
    g = dgl.graph((src_a, dst_a), num_nodes=n_, formats=("csc",))
    e = g.num_edges()
    f_bytes = args.feat * 4
    t1 = e / args.rate  # single-chip layer time

    ks = [int(x) for x in args.parts.split(",")]
    for k in ks:
        part = (np.zeros(args.nodes, np.int32) if k == 1
                else metis_partition_assignment(g, k, balance_edges=True))
        # Vertex-cut edge ownership when it improves compute balance.
        pg_halo = build_partitioned_graph(g, part, k)
        pg = pg_halo
        mode = "halo"
        if k > 1:
            eo = vertex_cut_edge_owner(g, part, k)
            pg_vc = build_partitioned_graph(g, part, k, edge_owner=eo)
            if pg_vc.e_loc < pg_halo.e_loc:
                pg, mode = pg_vc, "vertex_cut"
        cut = float(edge_cut_fraction(g, part)) if k > 1 else 0.0
        # Per-device, per-layer costs.
        t_comp = pg.e_loc / args.rate
        halo_bytes = (k - 1) * (pg.m_halo + pg.m_part) * f_bytes
        t_comm = halo_bytes / ICI_BW_EFF
        eff_overlap = t1 / (k * max(t_comp, t_comm))
        eff_serial = t1 / (k * (t_comp + t_comm))
        out = {
            "k": k, "edges": int(e), "mode": mode,
            "edge_cut": round(cut, 4),
            "e_loc_max": int(pg.e_loc),
            "load_balance": round(e / max(k * pg.e_loc, 1), 4),
            "halo_slots_per_pair": int(pg.m_halo),
            "partial_slots_per_pair": int(pg.m_part),
            "comm_MB_per_layer_per_chip": round(halo_bytes / 1e6, 2),
            "projected_efficiency_overlapped": round(eff_overlap, 3),
            "projected_efficiency_serial": round(eff_serial, 3),
        }
        if args.execute and k <= len(jax.devices()):
            import jax.numpy as jnp
            import optax
            from jax.sharding import Mesh

            from dgl1_tpu.parallel.train import (init_gcn_params,
                                                 make_gcn_train_step)

            mesh = Mesh(np.array(jax.devices()[:k]), ("p",))
            opt = optax.adam(1e-2)
            step, _ = make_gcn_train_step(pg, mesh, opt, 4)
            rng = np.random.default_rng(0)
            feat = jnp.asarray(rng.normal(
                size=(args.nodes, args.feat)).astype("float32"))
            labels = pg.shard_node_data(
                jnp.asarray(rng.integers(0, 4, size=args.nodes))
            ).astype(jnp.int32)
            params = init_gcn_params(jax.random.PRNGKey(0), args.feat, 16, 4)
            st = opt.init(params)
            x = pg.shard_node_data(feat)
            params, st, loss = step(params, st, x, labels, pg.node_mask)
            jax.block_until_ready(loss)
            out["executed_on_virtual_mesh"] = True
            out["loss"] = round(float(loss), 4)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys

    if "--sensitivity-layout" in sys.argv:
        sensitivity_layout()
    elif "--sensitivity" in sys.argv:
        sensitivity()
    else:
        main()
