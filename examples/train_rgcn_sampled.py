"""Sampled heterogeneous R-GCN entity classification at ogbn-mag scale.

Parity: the reference's ``examples/pytorch/rgcn-hetero/entity_classify_mb.py``
(mini-batch R-GCN on a heterograph: per-etype fanout sampling, hetero
blocks, learned embeddings for featureless node types with a sparse
optimizer). TPU-native: per-etype static-shape padded blocks mean the
whole epoch runs ONE compiled XLA train step; featureless-ntype embeddings
update through the row-sparse Adam of :mod:`dgl1_tpu.optim` (the DistDGL
SparseAdam counterpart).

Data is the clearly-flagged synthetic ogbn-mag stand-in (no network in
this environment); swap in the real dataset by placing OGB raw files under
the data dir.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=64,
                    help="divide ogbn-mag node counts by this")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--fanout", type=str, default="10,10")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--embed-dim", type=int, default=64)
    ap.add_argument("--num-classes", type=int, default=16,
                    help="349 on the real dataset; fewer for the scaled "
                         "synthetic stand-in")
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--sparse-lr", type=float, default=5e-2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--metrics", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import optax

    from dgl1_tpu.data.synthetic import synthetic_mag_heterograph
    from dgl1_tpu.dataloading import NeighborSampler, NodeDataLoader
    from dgl1_tpu.nn.conv import GraphConv
    from dgl1_tpu.nn.hetero import HeteroGraphConv
    from dgl1_tpu.optim import (NodeEmbedding, sparse_adam_init,
                                sparse_adam_update)
    from dgl1_tpu.utils.logging import MetricsLogger

    hg, split = synthetic_mag_heterograph(
        scale=args.scale, num_classes=args.num_classes)
    feat = hg.nodes["paper"].data["feat"]
    labels = hg.nodes["paper"].data["label"]
    print(f"synthetic ogbn-mag/{args.scale}: "
          + ", ".join(f"{nt}={hg.num_nodes(nt)}" for nt in hg.ntypes)
          + f", {hg.num_edges()} edges, {args.num_classes} classes")

    fanouts = [int(x) for x in args.fanout.split(",")]
    etypes = [c[1] for c in hg.canonical_etypes]
    sampler = NeighborSampler(
        [{e: k for e in etypes} for k in fanouts])
    loader = NodeDataLoader(hg, {"paper": split["train"]}, sampler,
                            batch_size=args.batch_size, shuffle=True,
                            seed=0)
    val_loader = NodeDataLoader(hg, {"paper": split["val"]}, sampler,
                                batch_size=args.batch_size, shuffle=False,
                                seed=1)

    embed_types = [nt for nt in hg.ntypes if nt != "paper"]
    key = jax.random.PRNGKey(0)
    tables = {}
    states = {}
    for i, nt in enumerate(embed_types):
        tables[nt] = NodeEmbedding.create(
            jax.random.fold_in(key, i), hg.num_nodes(nt), args.embed_dim
        ).table
        states[nt] = sparse_adam_init(tables[nt])

    class RGCN(nn.Module):
        hidden: int
        out: int

        @nn.compact
        def __call__(self, blocks, x):
            h = HeteroGraphConv({e: GraphConv(self.hidden) for e in etypes},
                                name="l0")(blocks[0], x)
            h = {k: nn.relu(v) for k, v in h.items()}
            h = HeteroGraphConv({e: GraphConv(self.out) for e in etypes},
                                name="l1")(blocks[1], h)
            return h["paper"]

    model = RGCN(hidden=args.hidden, out=args.num_classes)

    inp0, _, blocks0, _ = next(iter(loader))
    x0 = {"paper": feat[jnp.asarray(inp0["paper"])]}
    for nt in embed_types:
        x0[nt] = jnp.take(tables[nt], jnp.asarray(inp0[nt]), axis=0,
                          mode="clip")
    params = model.init(jax.random.PRNGKey(1), blocks0, x0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def _embed_ids(inp, blocks):
        """Input ids per featureless ntype, pad tail marked OOB so the
        sparse update drops it (pad rows repeat id 0; a duplicate id
        would corrupt the row-sparse Adam moments)."""
        out = {}
        for nt in embed_types:
            ids = np.asarray(inp[nt], dtype=np.int64)
            nreal = blocks[0].meta["num_real_src"][nt]
            ids = ids.copy()
            ids[nreal:] = tables[nt].shape[0]
            out[nt] = jnp.asarray(ids)
        return out

    @jax.jit
    def train_step(params, opt_state, tables, states, blocks, x_paper,
                   ids, y, mask):
        rows = {nt: jnp.take(tables[nt], ids[nt], axis=0, mode="fill",
                             fill_value=0.0) for nt in tables}

        def loss_fn(p, rows):
            x = {"paper": x_paper, **rows}
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * mask) / jnp.maximum(mask.sum(), 1.0)

        (loss, (gp, grows)) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(params, rows)
        updates, opt_state = opt.update(gp, opt_state)
        params = optax.apply_updates(params, updates)
        new_tables, new_states = {}, {}
        for nt in tables:
            new_tables[nt], new_states[nt] = sparse_adam_update(
                tables[nt], states[nt], ids[nt], grows[nt],
                lr=args.sparse_lr)
        return params, opt_state, new_tables, new_states, loss

    @jax.jit
    def eval_step(params, tables, blocks, x_paper, ids, y, mask):
        rows = {nt: jnp.take(tables[nt], ids[nt], axis=0, mode="fill",
                             fill_value=0.0) for nt in tables}
        x = {"paper": x_paper, **rows}
        pred = jnp.argmax(model.apply(params, blocks, x), axis=1)
        return jnp.sum((pred == y) * mask), jnp.sum(mask)

    logger = MetricsLogger(args.metrics) if args.metrics else None
    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        tot = n = 0.0
        for inp, out, blocks, mask in loader:
            ids = _embed_ids(inp, blocks)
            x_paper = feat[jnp.asarray(inp["paper"])]
            y = labels[jnp.asarray(out["paper"])]
            params, opt_state, tables, states, loss = train_step(
                params, opt_state, tables, states, blocks, x_paper, ids,
                y, jnp.asarray(mask, jnp.float32))
            tot += float(loss)
            n += 1
        dt = time.perf_counter() - t0
        correct = total = 0.0
        for inp, out, blocks, mask in val_loader:
            ids = _embed_ids(inp, blocks)
            c, t = eval_step(params, tables, blocks,
                             feat[jnp.asarray(inp["paper"])], ids,
                             labels[jnp.asarray(out["paper"])],
                             jnp.asarray(mask, jnp.float32))
            correct += float(c)
            total += float(t)
        acc = correct / max(total, 1)
        print(f"epoch {epoch:3d} loss {tot / n:.4f} val acc {acc:.4f} "
              f"({dt:.2f}s, {len(loader)} batches)")
        if logger:
            logger.log(epoch=epoch, loss=tot / n, val_acc=acc,
                       epoch_time_s=dt)
    print(f"final val accuracy {acc:.4f} (synthetic stand-in)")
    return acc


if __name__ == "__main__":
    main()
