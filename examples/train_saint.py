"""GraphSAINT training (parity: ``examples/pytorch/graphsaint``):
subgraph-sampled GCN with the paper's loss/aggregation normalizations.

Usage:
    python examples/train_saint.py [--mode node|edge|walk] [--cpu]
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed"])
    p.add_argument("--mode", default="node",
                   choices=["node", "edge", "walk"])
    p.add_argument("--budget", type=int, default=512)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batches-per-epoch", type=int, default=8)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import SAINTSampler
    from dgl1_tpu.nn import GraphConv

    ds = {
        "cora": dgl.data.CoraGraphDataset,
        "citeseer": dgl.data.CiteseerGraphDataset,
        "pubmed": dgl.data.PubmedGraphDataset,
    }[args.dataset]()
    g = ds[0]
    if ds.is_synthetic:
        print(f"[data] {args.dataset}: synthetic fallback")
    g = dgl.add_self_loop(dgl.remove_self_loop(g))
    labels = g.ndata["label"]
    num_classes = int(np.asarray(labels).max()) + 1

    budget = ((args.budget // 8, 4) if args.mode == "walk"
              else args.budget)
    sampler = SAINTSampler(g, args.mode, budget,
                           num_batches=args.batches_per_epoch, seed=0)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, sg, x):
            h = nn.relu(GraphConv(args.hidden, name="l0")(sg, x))
            return GraphConv(num_classes, name="l1")(sg, h)

    model = Net()
    sg0, _ = next(iter(sampler))
    params = model.init(jax.random.PRNGKey(0), sg0, sg0.ndata["feat"])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, sg, mask):
        def loss_fn(p):
            logits = model.apply(p, sg, sg.ndata["feat"])
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(
                logp, sg.ndata["label"][:, None].astype(jnp.int32),
                axis=1)[:, 0]
            tm = jnp.take(g.ndata["train_mask"], sg.ndata["_ID"],
                          axis=0, mode="clip")
            w = sg.ndata["loss_norm"] * mask * tm
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-6)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g, g.ndata["feat"])
        pred = jnp.argmax(logits, axis=1)
        correct = (pred == labels).astype(jnp.float32)

        def acc(mask):
            m = mask.astype(jnp.float32)
            return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)

        return acc(g.ndata["val_mask"]), acc(g.ndata["test_mask"])

    best_val = best_test = 0.0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        losses = []
        for sg, mask in sampler:
            params, opt_state, loss = step(params, opt_state, sg, mask)
            losses.append(float(loss))
        if (epoch + 1) % 5 == 0 or epoch == 0:
            va, te = evaluate(params)
            if float(va) > best_val:
                best_val, best_test = float(va), float(te)
            print(f"epoch {epoch + 1:3d} loss {np.mean(losses):.4f} "
                  f"val {float(va):.4f} test {float(te):.4f}")
    dt = time.perf_counter() - t0
    print(f"done in {dt:.1f}s; best val {best_val:.4f} "
          f"test@best-val {best_test:.4f}")


if __name__ == "__main__":
    main()
