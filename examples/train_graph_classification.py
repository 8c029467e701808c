"""Graph classification with the GIN model + GraphDataLoader (parity:
``examples/pytorch/gin/main.py`` on MiniGC-style data).

TPU-native: ``GraphDataLoader(pad=True)`` pads every batch to bucketed
(nodes, edges) budgets by appending a disjoint padding graph, so the
jitted train step compiles for a handful of shapes across the run.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-graphs", type=int, default=400)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.data import MiniGCDataset, split_dataset
    from dgl1_tpu.dataloading import GraphDataLoader
    from dgl1_tpu.models import GIN

    ds = MiniGCDataset(args.num_graphs, 10, 20)
    train_ds, test_ds = split_dataset(ds, (0.8, 0.2), shuffle=True,
                                      random_state=0)
    print(f"[data] MiniGC: {len(ds)} graphs, 8 classes")

    loader = GraphDataLoader(train_ds, batch_size=args.batch_size,
                             shuffle=True, seed=0)
    test_loader = GraphDataLoader(test_ds, batch_size=args.batch_size,
                                  shuffle=False)

    model = GIN(hidden=args.hidden, classes=8, num_layers=4)

    bg0, y0, m0 = next(iter(loader))
    x0 = bg0.ndata["attr"] / 10.0  # degree feature into unit range
    params = model.init(jax.random.PRNGKey(0), bg0, x0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, st, bg, y, mask):
        def loss_fn(p):
            logits = model.apply(p, bg, bg.ndata["attr"] / 10.0)
            logits = logits[: y.shape[0]]  # drop the padding graph
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            m = mask.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = opt.update(grads, st)
        return optax.apply_updates(p, updates), st, loss

    @jax.jit
    def predict(p, bg):
        logits = model.apply(p, bg, bg.ndata["attr"] / 10.0)
        return jnp.argmax(logits[: args.batch_size], axis=1)

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        tot = nb = 0
        for bg, y, mask in loader:
            params, opt_state, loss = train_step(params, opt_state, bg, y,
                                                 mask)
            tot += float(loss)
            nb += 1
        dt = time.perf_counter() - t0
        if (epoch + 1) % 5 == 0 or epoch == 0:
            correct = total = 0
            for bg, y, mask in test_loader:
                pred = predict(params, bg)
                m = np.asarray(mask)
                correct += int((np.asarray(pred)[m] == np.asarray(y)[m]).sum())
                total += int(m.sum())
            print(f"epoch {epoch + 1:3d} loss {tot / max(nb, 1):.4f} "
                  f"test acc {correct / max(total, 1):.4f} ({dt:.2f}s)")


if __name__ == "__main__":
    main()
