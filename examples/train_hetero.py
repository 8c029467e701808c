"""Heterogeneous node classification with HeteroGraphConv (parity:
``examples/pytorch/rgcn-hetero`` / hetero API tutorials): a synthetic
user-item bipartite graph; user labels depend on the items they interact
with, so hetero message passing is required to solve it."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as fnn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu import nn

    rng = np.random.default_rng(0)
    n_users, n_items, n_classes = 1000, 200, 4
    item_class = rng.integers(0, n_classes, size=n_items)
    # Each user prefers one class of items.
    user_label = rng.integers(0, n_classes, size=n_users)
    n_inter = 8000
    u = rng.integers(0, n_users, size=n_inter)
    prefer = rng.random(n_inter) < 0.8
    it = np.where(
        prefer,
        # pick an item of the user's class
        np.asarray([rng.choice(np.nonzero(item_class == c)[0])
                    for c in user_label[u]]),
        rng.integers(0, n_items, size=n_inter),
    )
    hg = dgl.heterograph({
        ("user", "clicks", "item"): (u, it),
        ("item", "clicked_by", "user"): (it, u),
    }, num_nodes_dict={"user": n_users, "item": n_items})

    feats = {
        "user": jnp.asarray(rng.normal(size=(n_users, 16)).astype(np.float32)),
        "item": jnp.asarray(
            (np.eye(n_classes)[item_class]
             + 0.5 * rng.normal(size=(n_items, n_classes))).astype(np.float32)
        ),
    }
    labels = jnp.asarray(user_label.astype(np.int32))
    train_mask = np.zeros(n_users, dtype=bool)
    train_mask[rng.choice(n_users, size=200, replace=False)] = True
    test_mask = ~train_mask
    tm = jnp.asarray(train_mask)

    class HeteroGCN(fnn.Module):
        @fnn.compact
        def __call__(self, hg, x):
            h = nn.HeteroGraphConv(
                {"clicks": nn.GraphConv(args.hidden, norm="right"),
                 "clicked_by": nn.GraphConv(args.hidden, norm="right")},
                aggregate="sum", name="l1",
            )(hg, x)
            h = {k: fnn.relu(v) for k, v in h.items()}
            h = nn.HeteroGraphConv(
                {"clicks": nn.GraphConv(args.hidden, norm="right"),
                 "clicked_by": nn.GraphConv(n_classes, norm="right")},
                aggregate="sum", name="l2",
            )(hg, h)
            return h["user"]

    model = HeteroGCN()
    params = model.init(jax.random.PRNGKey(0), hg, feats)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, hg, feats)
        lp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(lp, labels[:, None], axis=1)[:, 0]
        m = tm.astype(jnp.float32)
        return jnp.sum(ce * m) / jnp.sum(m)

    @jax.jit
    def step(p, st):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        up, st = opt.update(grads, st)
        return optax.apply_updates(p, up), st, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if (epoch + 1) % 20 == 0 or epoch == 0:
            logits = model.apply(params, hg, feats)
            pred = np.asarray(jnp.argmax(logits, axis=1))
            acc = (pred[test_mask] == user_label[test_mask]).mean()
            print(f"epoch {epoch + 1:3d} loss {float(loss):.4f} "
                  f"test acc {acc:.4f}")


if __name__ == "__main__":
    main()
