"""DGI unsupervised pretraining + linear probe (parity:
``examples/pytorch/dgi/train.py``): train DGI on Cora, then fit a
logistic-regression classifier on the frozen embeddings."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--probe-epochs", type=int, default=150)
    p.add_argument("--hidden", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.models.dgi import DGI

    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(ds[0])
    feat = g.ndata["feat"]
    labels = np.asarray(g.ndata["label"]).astype(np.int32)
    print(f"[data] cora{'(synthetic)' if ds.is_synthetic else ''}: "
          f"{g.num_nodes()} nodes")

    model = DGI(hidden=args.hidden)
    rng = np.random.default_rng(0)
    perm0 = jnp.asarray(rng.permutation(g.num_nodes()))
    params = model.init(jax.random.PRNGKey(0), g, feat, perm0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, g, perm):
        loss, grads = jax.value_and_grad(
            lambda p: model.apply(p, g, feat, perm))(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        perm = jnp.asarray(rng.permutation(g.num_nodes()))
        params, opt_state, loss = step(params, opt_state, g, perm)
        if (epoch + 1) % 50 == 0:
            print(f"epoch {epoch + 1} dgi loss {float(loss):.4f}")

    emb = jax.jit(lambda p, g: model.apply(p, g, feat, method="embed"))(
        params, g)
    emb = jax.lax.stop_gradient(emb)

    # Linear probe on frozen embeddings.
    classes = int(labels.max()) + 1
    train_m = np.asarray(g.ndata["train_mask"])
    test_m = np.asarray(g.ndata["test_mask"])
    w0 = jnp.zeros((emb.shape[1], classes))
    b0 = jnp.zeros((classes,))
    popt = optax.adam(1e-2)
    pstate = popt.init((w0, b0))
    y = jnp.asarray(labels)
    tm = jnp.asarray(train_m.astype(np.float32))

    @jax.jit
    def probe_step(wb, pstate):
        def loss_fn(wb):
            w, b = wb
            logits = emb @ w + b
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ce * tm) / jnp.sum(tm)

        loss, grads = jax.value_and_grad(loss_fn)(wb)
        updates, pstate = popt.update(grads, pstate)
        return optax.apply_updates(wb, updates), pstate, loss

    wb = (w0, b0)
    for _ in range(args.probe_epochs):
        wb, pstate, ploss = probe_step(wb, pstate)
    pred = np.asarray(jnp.argmax(emb @ wb[0] + wb[1], axis=1))
    acc = (pred[test_m] == labels[test_m]).mean()
    print(f"linear-probe test acc on DGI embeddings: {acc:.4f}")


if __name__ == "__main__":
    main()
