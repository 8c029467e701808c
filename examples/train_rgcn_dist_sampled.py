"""Distributed SAMPLED typed R-GCN — the DistDGL training shape.

Parity: DistDGL's distributed R-GCN (sampled minibatches per trainer,
each trainer working its own partition's seeds, grads all-reduced;
SURVEY.md §3.5). TPU-native: the heterograph is partitioned
(homogenize -> partition -> split per ntype), each device's seeds come
from ITS paper partition (the partition-book contract), the hetero
neighbor sampler emits STATIC-SHAPE typed blocks (identical pytree
treedefs across devices), so per-device blocks stack on a leading mesh
axis and one ``shard_map`` program runs the typed minibatch step with
``pmean``'d grads — no RPC, no parameter server. Featureless node types
ride replicated embedding tables (rows gathered per block inside the
step).

Run on real chips, or simulate 8 chips on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_rgcn_dist_sampled.py --cpu --parts 8
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--scale", type=int, default=120)
    ap.add_argument("--classes", type=int, default=12)
    ap.add_argument("--feat-dim", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=48)
    ap.add_argument("--embed-dim", type=int, default=48)
    ap.add_argument("--fanout", default="4,4")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--min-acc", type=float, default=0.55)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, PartitionSpec as PS

    from dgl1_tpu.data.synthetic import synthetic_mag_heterograph
    from dgl1_tpu.dataloading import NeighborSampler
    from dgl1_tpu.nn.conv import GraphConv
    from dgl1_tpu.nn.hetero import HeteroGraphConv
    from dgl1_tpu.parallel import (GraphPartitionBook,
                                   hetero_partition_assignment)

    K = args.parts
    if len(jax.devices()) < K:
        raise SystemExit(
            f"need {K} devices; set XLA_FLAGS="
            f"--xla_force_host_platform_device_count={K} --cpu")
    mesh = Mesh(np.array(jax.devices()[:K]), ("p",))

    hg, split = synthetic_mag_heterograph(
        scale=args.scale, num_classes=args.classes,
        feat_dim=args.feat_dim)
    feat = np.asarray(hg.nodes["paper"].data["feat"])
    labels = np.asarray(hg.nodes["paper"].data["label"])
    part = hetero_partition_assignment(hg, K, part_method="greedy")
    book = GraphPartitionBook(part["paper"], K)
    train_mask = np.zeros(hg.num_nodes("paper"), bool)
    train_mask[split["train"]] = True
    # DistDGL seed contract: each trainer works the train seeds its
    # partition OWNS.
    seeds_per_dev = [
        np.intersect1d(book.partid2nids(p), split["train"])
        for p in range(K)
    ]
    print(f"partitioned: {[len(s) for s in seeds_per_dev]} train seeds "
          f"per device")

    fanouts = [int(x) for x in args.fanout.split(",")]
    etypes = [c[1] for c in hg.canonical_etypes]
    sampler = NeighborSampler([{e: k for e in etypes} for k in fanouts])
    embed_types = [nt for nt in hg.ntypes if nt != "paper"]

    class RGCN(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = HeteroGraphConv(
                {e: GraphConv(args.hidden) for e in etypes},
                name="l0")(blocks[0], x)
            h = {k: nn.relu(v) for k, v in h.items()}
            h = HeteroGraphConv(
                {e: GraphConv(args.classes) for e in etypes},
                name="l1")(blocks[1], h)
            return h["paper"]

    model = RGCN()
    rngs = np.random.default_rng(0)

    def device_batch(p, rng):
        """One device's sampled batch: (blocks, x_paper, emb_ids, y)."""
        own = seeds_per_dev[p]
        seeds = rng.choice(own, size=args.batch_size,
                           replace=len(own) < args.batch_size)
        inp, out, blocks = sampler.sample_blocks_hetero(
            hg, {"paper": seeds}, rng=rng)
        x_paper = feat[np.asarray(inp["paper"])]
        ids = {nt: np.asarray(inp.get(nt, np.zeros(0, np.int64)))
               for nt in embed_types}
        y = labels[np.asarray(out["paper"])]
        return blocks, x_paper, ids, y

    def stacked_step_inputs(rng):
        per_dev = [device_batch(p, rng) for p in range(K)]
        blocks = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
            *[b for b, _, _, _ in per_dev])
        x = jnp.asarray(np.stack([x for _, x, _, _ in per_dev]))
        ids = {nt: jnp.asarray(np.stack(
            [d[2][nt] for d in per_dev])) for nt in embed_types}
        y = jnp.asarray(np.stack([d[3] for d in per_dev]))
        return blocks, x, ids, y

    blocks0, x0, ids0, y0 = stacked_step_inputs(rngs)
    key = jax.random.PRNGKey(0)
    emb = {nt: jax.random.normal(
        jax.random.fold_in(key, i),
        (hg.num_nodes(nt), args.embed_dim)) * 0.1
        for i, nt in enumerate(embed_types)}

    def body(blocks, x, ids, y, params, emb):
        b = [jax.tree.map(lambda a: a[0], blk) for blk in blocks]

        def loss_fn(params, emb):
            feats = {"paper": x[0]}
            for nt in embed_types:
                # take's VJP routes row grads back into the replicated
                # tables; pmean below is the DDP all-reduce.
                feats[nt] = jnp.take(emb[nt], ids[nt][0], axis=0,
                                     mode="clip")
            logits = model.apply(params, b, feats)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y[0]).mean()

        loss, (gp, ge) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(params, emb)
        gp = jax.lax.pmean(gp, "p")
        ge = jax.lax.pmean(ge, "p")
        return jax.lax.pmean(loss, "p"), gp, ge

    sage_fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(PS("p"), PS("p"), PS("p"), PS("p"), PS(), PS()),
        out_specs=(PS(), PS(), PS()),
        check_vma=False,
    )

    params = model.init(
        jax.random.PRNGKey(1),
        [jax.tree.map(lambda a: a[0], blk) for blk in blocks0],
        {"paper": x0[0],
         **{nt: jnp.take(emb[nt], ids0[nt][0], axis=0, mode="clip")
            for nt in embed_types}})
    opt = optax.adam(args.lr)
    opt_state = opt.init((params, emb))

    @jax.jit
    def train_step(params, emb, opt_state, blocks, x, ids, y):
        loss, gp, ge = sage_fn(blocks, x, ids, y, params, emb)
        upd, opt_state = opt.update((gp, ge), opt_state)
        params, emb = optax.apply_updates((params, emb), upd)
        return params, emb, opt_state, loss

    steps = max(min(len(s) for s in seeds_per_dev)
                // args.batch_size, 1)
    t0 = time.perf_counter()
    for epoch in range(1, args.epochs + 1):
        tot = 0.0
        for _ in range(steps):
            blocks, x, ids, y = stacked_step_inputs(rngs)
            params, emb, opt_state, loss = train_step(
                params, emb, opt_state, blocks, x, ids, y)
            tot += float(loss)
        print(f"epoch {epoch:3d} loss {tot / steps:.4f}")
    dt = time.perf_counter() - t0

    # Sampled test accuracy (every device evaluates a test batch).
    test_ids = split["test"]
    hits = total = 0
    eval_rng = np.random.default_rng(99)
    for _ in range(4):
        seeds = eval_rng.choice(test_ids, size=args.batch_size,
                                replace=False)
        inp, out, blocks = sampler.sample_blocks_hetero(
            hg, {"paper": seeds}, rng=eval_rng)
        feats = {"paper": jnp.asarray(feat[np.asarray(inp["paper"])])}
        for nt in embed_types:
            feats[nt] = jnp.take(
                emb[nt], jnp.asarray(np.asarray(inp[nt])), axis=0,
                mode="clip")
        logits = model.apply(params, blocks, feats)
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        yb = labels[np.asarray(out["paper"])]
        hits += int((pred == yb).sum())
        total += len(yb)
    acc = hits / total
    print(f"done in {dt:.1f}s ({args.epochs * steps / dt:.1f} steps/s); "
          f"sampled test acc {acc:.4f}")
    assert acc >= args.min_acc, f"gate failed: {acc:.4f} < {args.min_acc}"


if __name__ == "__main__":
    main()
