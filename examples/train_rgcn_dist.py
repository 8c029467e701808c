"""Distributed (multi-chip) typed R-GCN entity classification.

The DistDGL R-GCN story rebuilt TPU-native (parity:
``examples/pytorch/rgcn-hetero`` + DistDGL distributed training; anchors
``src/graph/transform/partition_hetero.cc :: PartitionWithHalo``,
``python/dgl/distributed/partition.py``): the heterograph is partitioned
by homogenize->partition->split-per-ntype, every relation's edges live on
their destination's part, and each layer moves remote source features in
ONE ``all_to_all`` per node type over the mesh inside ``shard_map`` —
no RPC, no KVStore. Featureless node types get learned embeddings that
are themselves SHARDED by ownership (the DistEmbedding pattern): their
gradients flow back through the all_to_all transpose to the owning chip.

Run on real chips, or simulate 8 chips on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_rgcn_dist.py --cpu --parts 8
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--scale", type=int, default=200,
                   help="ogbn-mag divisor (200 -> ~3.7k papers)")
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--feat-dim", type=int, default=64)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--check-oracle", action="store_true",
                   help="also verify step-0 loss vs the single-device "
                        "R-GCN oracle")
    p.add_argument("--min-acc", type=float, default=0.6)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh

    from dgl1_tpu.data.synthetic import synthetic_mag_heterograph
    from dgl1_tpu.parallel import (
        build_partitioned_hetero,
        hetero_edge_cut_fraction,
        hetero_partition_assignment,
        make_sharded_rgcn_layer,
    )

    n_dev = len(jax.devices())
    if n_dev < args.parts:
        raise SystemExit(
            f"need {args.parts} devices, have {n_dev}; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={args.parts} --cpu")

    t0 = time.perf_counter()
    hg, split = synthetic_mag_heterograph(
        scale=args.scale, num_classes=args.classes,
        feat_dim=args.feat_dim)
    part = hetero_partition_assignment(hg, args.parts,
                                       part_method="greedy")
    phg = build_partitioned_hetero(hg, part, args.parts)
    cut = hetero_edge_cut_fraction(hg, part)
    print(f"partitioned {dict(phg.num_nodes)} nodes over {args.parts} "
          f"parts, cut={cut:.3f} ({time.perf_counter() - t0:.1f}s)")

    mesh = Mesh(np.array(jax.devices()[: args.parts]), ("p",))
    layer = make_sharded_rgcn_layer(phg, mesh)
    etypes = list(phg.etypes)
    ntypes = list(phg.ntypes)
    rng = jax.random.PRNGKey(0)

    feat = hg.nodes["paper"].data["feat"]
    labels = np.asarray(hg.nodes["paper"].data["label"])
    x_paper = phg.shard_node_data("paper", feat)
    y = phg.shard_node_data(
        "paper", jnp.asarray(labels)).astype(jnp.int32)
    masks = {}
    for name in ("train", "test"):
        m = np.zeros(hg.num_nodes("paper"), bool)
        m[split[name]] = True
        masks[name] = phg.shard_node_data(
            "paper", jnp.asarray(m.astype(np.float32)))

    h, f_in = args.hidden, args.feat_dim
    keys = iter(jax.random.split(rng, 64))

    def dense(key, i, o):
        return jax.random.normal(key, (i, o)) * (2.0 / (i + o)) ** 0.5

    params = {
        # Replicated relation/self weights per layer.
        "w1": {c: dense(next(keys), h, h) for c in etypes},
        "s1": {nt: dense(next(keys), h, h) for nt in ntypes},
        "w2": {c: dense(next(keys), h, args.classes) for c in etypes},
        "s2": {"paper": dense(next(keys), h, args.classes)},
        # Paper input projection (replicated) + SHARDED embeddings for
        # featureless ntypes (ownership layout: (P, n_loc, h)).
        "w_in": dense(next(keys), f_in, h),
        "emb": {
            nt: jax.random.normal(
                next(keys), (args.parts, phg.n_loc[nt], h)) * 0.1
            for nt in ntypes if nt != "paper"
        },
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def forward(prm):
        h0 = {"paper": jnp.einsum("pnf,fh->pnh", x_paper, prm["w_in"])}
        h0.update(prm["emb"])
        h1 = layer(h0, prm["w1"], prm["s1"])
        h1 = {nt: jax.nn.relu(v) for nt, v in h1.items()}
        out = layer(h1, prm["w2"], prm["s2"])
        return out["paper"]  # (P, n_loc, C)

    def loss_fn(prm, mask):
        logits = forward(prm)
        ll = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.clip(y, 0, args.classes - 1))
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def train_step(prm, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(prm, masks["train"])
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(prm, upd), opt_state, loss

    @jax.jit
    def accuracy(prm, mask):
        pred = jnp.argmax(forward(prm), axis=-1)
        hit = (pred == y).astype(jnp.float32) * mask
        return jnp.sum(hit) / jnp.maximum(jnp.sum(mask), 1.0)

    if args.check_oracle:
        _check_oracle(hg, phg, params, x_paper, masks, y, layer, args)

    t0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        params, opt_state, loss = train_step(params, opt_state)
        if epoch % 10 == 0 or epoch == 1:
            acc = float(accuracy(params, masks["test"]))
            print(f"epoch {epoch:4d} loss {float(loss):.4f} "
                  f"test {acc:.4f}")
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    acc = float(accuracy(params, masks["test"]))
    print(f"done in {dt:.1f}s ({args.epochs / dt:.1f} epochs/s); "
          f"test acc {acc:.4f}")
    assert acc >= args.min_acc, (
        f"accuracy gate failed: {acc:.4f} < {args.min_acc}")


def _check_oracle(hg, phg, params, x_paper, masks, y, layer, args):
    """Step-0 forward vs the single-device per-relation oracle."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import dgl1_tpu as dgl

    feats0 = {"paper": np.asarray(
        phg.unshard_node_data("paper", jnp.einsum(
            "pnf,fh->pnh", x_paper, params["w_in"])))}
    for nt, emb in params["emb"].items():
        feats0[nt] = np.asarray(phg.unshard_node_data(nt, emb))
    in_deg = {nt: np.zeros(hg.num_nodes(nt)) for nt in hg.ntypes}
    for c in hg.canonical_etypes:
        rel = hg[c]
        e = rel.num_edges()
        np.add.at(in_deg[c[2]], np.asarray(rel.dst)[:e], 1)

    def ref_layer(feats, w, s):
        out = {}
        for c in hg.canonical_etypes:
            st, _, dt = c
            if st not in feats:
                continue
            v = dgl.ops.copy_u_sum(
                hg[c], jnp.asarray(feats[st]) @ w[c])
            out[dt] = out.get(dt, 0) + v
        for nt in out:
            out[nt] = out[nt] / jnp.maximum(jnp.asarray(
                in_deg[nt], jnp.float32), 1.0)[:, None]
            if nt in s:
                out[nt] = out[nt] + jnp.asarray(feats[nt]) @ s[nt]
        return out

    h1 = {nt: np.asarray(jax.nn.relu(v)) for nt, v in ref_layer(
        feats0, params["w1"], params["s1"]).items()}
    ref = np.asarray(ref_layer(h1, params["w2"], params["s2"])["paper"])

    h0 = {"paper": jnp.einsum("pnf,fh->pnh", x_paper, params["w_in"])}
    h0.update(params["emb"])
    sh1 = layer(h0, params["w1"], params["s1"])
    sh1 = {nt: jax.nn.relu(v) for nt, v in sh1.items()}
    got = np.asarray(phg.unshard_node_data(
        "paper", layer(sh1, params["w2"], params["s2"])["paper"]))
    err = np.abs(got - ref).max()
    print(f"oracle check: max |sharded - single| = {err:.2e}")
    assert err < 1e-3, err


if __name__ == "__main__":
    main()
