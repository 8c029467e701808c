"""Partitioned multi-chip full-graph GCN training (BASELINE config #5
pattern: edge-partitioned graph, halo all_to_all over the mesh, scaled to
N devices).

Parity: DistDGL's trainer (``examples/pytorch/graphsage/train_dist.py``)
— but with collectives instead of RPC: one ``all_to_all`` per layer moves
halo features over ICI inside ``shard_map``; parameter gradients reduce
automatically through the shard_map transpose.

Run on real chips, or simulate N chips on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_dist.py --cpu --parts 8
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--halo-dtype", default="f32",
                   choices=["f32", "bf16", "int8"],
                   help="halo all_to_all wire format (bf16 halves ICI "
                        "bytes, int8 + per-row scale quarters them; "
                        "accuracy deltas in PERF_NOTES r4/r5)")
    p.add_argument("--nodes", type=int, default=20000)
    p.add_argument("--avg-degree", type=float, default=8.0)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--homophily", type=float, default=0.9,
                   help="SBM same-class edge probability; lower = "
                        "harder task (more cut edges carry signal)")
    p.add_argument("--noise-mult", type=float, default=None,
                   help="feature noise multiplier x sqrt(feat_dim); "
                        "raises the feature-only error floor")
    p.add_argument("--acc-gate", type=float, default=None,
                   help="FAILABLE accuracy gate: exit nonzero unless "
                        "test acc >= this. Use with --homophily/"
                        "--noise-mult to put the task in a regime with "
                        "real headroom (VERDICT r4 #4b: a gate that "
                        "cannot fail cannot detect int8-wire or "
                        "identity-relabel damage)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--part-method", default="greedy",
                   choices=["greedy", "random"])
    p.add_argument("--hub-identity", action="store_true",
                   help="per-part hub-first renumbering + combined "
                        "[owned|halo|pad] activations + prefilled "
                        "layer-1 halo: the flagship identity-expand "
                        "configuration at any mesh size (PERF_NOTES r5). "
                        "NOTE: the prefilled layer-1 assumes STATIC "
                        "input features (halo slots filled once); "
                        "per-step-varying features need a re-fill or "
                        "prefilled=False (DGL1_TPU_CHECK_PREFILL=1 "
                        "verifies per step)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    import dgl1_tpu as dgl
    from dgl1_tpu.parallel import build_partitioned_graph
    from dgl1_tpu.parallel.partition import (
        edge_cut_fraction,
        greedy_partition_assignment,
        random_partition_assignment,
    )
    from dgl1_tpu.parallel.train import init_gcn_params, make_gcn_train_step

    n_dev = len(jax.devices())
    if n_dev < args.parts:
        raise SystemExit(
            f"need {args.parts} devices, have {n_dev}; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={args.parts} --cpu"
        )

    noise = (args.noise_mult * float(np.sqrt(args.feat_dim))
             if args.noise_mult is not None else None)
    g = dgl.data.synthetic_classification_graph(
        num_nodes=args.nodes, num_classes=args.classes,
        feat_dim=args.feat_dim, avg_degree=args.avg_degree,
        homophily=args.homophily, feature_noise=noise,
        train_per_class=max(20, args.nodes // (4 * args.classes)), seed=0,
    )
    if args.part_method == "greedy":
        part = greedy_partition_assignment(g, args.parts)
    else:
        part = random_partition_assignment(g, args.parts)
    print(f"[partition] {args.parts} parts, edge cut "
          f"{edge_cut_fraction(g, part):.3f}")
    pg = build_partitioned_graph(g, part, args.parts,
                                 halo_dtype=args.halo_dtype,
                                 hub=64 if args.hub_identity else False,
                                 hub_identity=args.hub_identity)
    print(f"[partition] n_loc={pg.n_loc} e_loc={pg.e_loc} "
          f"m_halo={pg.m_halo}"
          + (f" identity={pg.hub_meta.identity_expand}"
             if pg.hub_meta is not None else ""))

    mesh = Mesh(np.array(jax.devices()[: args.parts]), ("p",))
    opt = optax.adam(args.lr)
    combined = args.hub_identity and pg.hub is not None
    step, loss_fn = make_gcn_train_step(pg, mesh, opt, args.classes,
                                        combined=combined,
                                        prefilled=combined)

    if combined:
        from dgl1_tpu.parallel.sharded_ops import fill_halo_combined

        x = fill_halo_combined(pg, mesh)(
            pg.shard_node_data_combined(g.ndata["feat"]))
    else:
        x = pg.shard_node_data(g.ndata["feat"])
    labels = pg.shard_node_data(g.ndata["label"]).astype(jnp.int32)
    train_mask = pg.shard_node_data(g.ndata["train_mask"]) & pg.node_mask
    test_mask = pg.shard_node_data(g.ndata["test_mask"]) & pg.node_mask

    params = init_gcn_params(
        jax.random.PRNGKey(0), args.feat_dim, args.hidden, args.classes
    )
    opt_state = opt.init(params)

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, x, labels,
                                       train_mask)
        if (epoch + 1) % 10 == 0 or epoch == 0:
            print(f"epoch {epoch + 1:3d} loss {float(loss):.4f}")
    dt = time.perf_counter() - t0
    edges_per_s = g.num_edges() * 2 * args.epochs / dt  # 2 layers
    print(f"done in {dt:.1f}s ({edges_per_s / 1e6:.1f} M edge-aggr/s "
          f"across {args.parts} parts)")

    # Accuracy evaluation on the sharded model (the synthetic labels are
    # learnable by construction, so a broken distributed step shows up
    # here, not just as a non-increasing loss).
    from dgl1_tpu.parallel.train import make_gcn_predict

    predict = make_gcn_predict(pg, mesh)
    pred = predict(params, (pg.shard_node_data(g.ndata["feat"])
                            if combined else x))
    correct = np.asarray((pred == labels) & test_mask).sum()
    total = np.asarray(test_mask).sum()
    acc = correct / max(total, 1)
    print(f"test acc {acc:.4f} ({int(total)} test nodes)")
    if args.acc_gate is not None:
        if acc < args.acc_gate:
            raise SystemExit(
                f"ACCURACY GATE FAILED: sharded GCN test acc {acc:.4f} "
                f"< {args.acc_gate} (hard task homophily="
                f"{args.homophily}, wire={args.halo_dtype})")
        print(f"accuracy gate passed: {acc:.4f} >= {args.acc_gate}")
    elif args.epochs >= 30 and acc < 0.6:
        raise SystemExit(
            f"SANITY GATE FAILED: sharded GCN test acc {acc:.4f} < 0.6 on "
            f"the learnable synthetic task")


if __name__ == "__main__":
    main()
