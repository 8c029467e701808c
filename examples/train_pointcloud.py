"""Point-cloud classification with DGCNN (EdgeConv on kNN graphs).

Parity: ``examples/pytorch/pointcloud`` (PointNet/EdgeConv on
ModelNet40). No dataset downloads here, so clouds are synthetic shape
families (sphere surface / cube surface / flat disk / helix) whose LOCAL
geometry differs — exactly what EdgeConv's ``theta(h_u - h_v)`` feature
detects. TPU-native details: the kNN graph is one dense MXU matmul
(``dgl.knn_graph``), clouds are batched with ``dgl.batch`` into one
static graph per step, and every cloud has a fixed point count so the
whole epoch compiles once.

Gate: test accuracy >= 0.85 (4-way).
"""

from __future__ import annotations

import argparse
import time


def make_cloud(kind: int, n: int, rng):
    import numpy as np

    if kind == 0:  # sphere surface
        v = rng.normal(size=(n, 3))
        pts = v / np.linalg.norm(v, axis=1, keepdims=True)
    elif kind == 1:  # cube surface
        pts = rng.uniform(-1, 1, size=(n, 3))
        ax = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        pts[np.arange(n), ax] = sign
    elif kind == 2:  # flat disk
        r = np.sqrt(rng.uniform(0, 1, n))
        th = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([r * np.cos(th), r * np.sin(th),
                        0.05 * rng.normal(size=n)], axis=1)
    else:  # helix
        t = rng.uniform(0, 4 * np.pi, n)
        pts = np.stack([np.cos(t), np.sin(t), t / (2 * np.pi) - 1],
                       axis=1) + 0.05 * rng.normal(size=(n, 3))
    # Random rotation so orientation carries no signal.
    q = rng.normal(size=(3, 3))
    qq, _ = np.linalg.qr(q)
    return (pts @ qq).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clouds", type=int, default=240)
    p.add_argument("--points", type=int, default=96)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=24)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--min-acc", type=float, default=0.85)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.nn.conv import EdgeConv

    rng = np.random.default_rng(0)
    n_classes = 4
    clouds, labels = [], []
    for i in range(args.clouds):
        kind = i % n_classes
        clouds.append(make_cloud(kind, args.points, rng))
        labels.append(kind)
    labels = np.asarray(labels, np.int32)

    # kNN graphs precomputed per cloud (the MXU pairwise-distance path),
    # batched per minibatch into one static disjoint-union graph.
    graphs = [dgl.knn_graph(c, args.k) for c in clouds]
    n_train = int(0.75 * args.clouds)
    perm = rng.permutation(args.clouds)
    train_ids, test_ids = perm[:n_train], perm[n_train:]

    class DGCNN(nn.Module):
        hidden: int
        classes: int

        @nn.compact
        def __call__(self, g, pos):
            h = EdgeConv(self.hidden)(g, pos)
            h = nn.relu(h)
            h = EdgeConv(self.hidden)(g, h)
            h = nn.relu(h)
            hg = dgl.readout_nodes(g, h, op="max")
            hg = nn.relu(nn.Dense(self.hidden)(hg))
            return nn.Dense(self.classes)(hg)

    model = DGCNN(hidden=args.hidden, classes=n_classes)

    def make_batch(ids):
        bg = dgl.batch([graphs[i] for i in ids])
        pos = jnp.concatenate([jnp.asarray(clouds[i]) for i in ids])
        return bg, pos, jnp.asarray(labels[ids])

    bg0, pos0, _ = make_batch(train_ids[: args.batch_size])
    params = model.init(jax.random.PRNGKey(0), bg0, pos0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, g, pos, y):
        def loss_fn(p):
            logits = model.apply(p, g, pos)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def predict(params, g, pos):
        return jnp.argmax(model.apply(params, g, pos), axis=-1)

    t0 = time.perf_counter()
    steps = max(len(train_ids) // args.batch_size, 1)
    for epoch in range(1, args.epochs + 1):
        ep_perm = rng.permutation(train_ids)
        tot = 0.0
        for s in range(steps):
            ids = ep_perm[s * args.batch_size:(s + 1) * args.batch_size]
            if len(ids) < args.batch_size:
                continue
            g, pos, y = make_batch(ids)
            params, opt_state, loss = train_step(params, opt_state, g,
                                                 pos, y)
            tot += float(loss)
        if epoch % 5 == 0 or epoch == 1:
            print(f"epoch {epoch:3d} loss {tot / steps:.4f}")
    dt = time.perf_counter() - t0

    hits = total = 0
    for s in range(0, len(test_ids), args.batch_size):
        ids = test_ids[s: s + args.batch_size]
        g, pos, y = make_batch(ids)
        pred = predict(params, g, pos)
        hits += int((np.asarray(pred) == np.asarray(y)).sum())
        total += len(ids)
    acc = hits / total
    print(f"done in {dt:.1f}s; test acc {acc:.4f} ({total} clouds)")
    assert acc >= args.min_acc, f"gate failed: {acc:.4f} < {args.min_acc}"


if __name__ == "__main__":
    main()
