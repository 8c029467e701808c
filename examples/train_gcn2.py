"""Deep GCNII training (parity: ``examples/pytorch/gcn2/``): stacked
``GCN2Conv`` layers with initial residual + identity mapping — depth
without oversmoothing.

Usage:
    python examples/train_gcn2.py [--dataset cora] [--layers 16] [--cpu]
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed"])
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--layers", type=int, default=16)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--lambda-", dest="lambda_", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--dropout", type=float, default=0.5)
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
    from dgl1_tpu.nn import GCN2Conv

    ds = {
        "cora": dgl.data.CoraGraphDataset,
        "citeseer": dgl.data.CiteseerGraphDataset,
        "pubmed": dgl.data.PubmedGraphDataset,
    }[args.dataset]()
    g = ds[0]
    if ds.is_synthetic:
        print(f"[data] {args.dataset}: synthetic fallback "
              f"({g.num_nodes()} nodes, {g.num_edges()} edges)")
    g = dgl.add_self_loop(dgl.remove_self_loop(g))

    feat = g.ndata["feat"]
    labels = g.ndata["label"]
    train_mask = g.ndata["train_mask"]
    val_mask = g.ndata["val_mask"]
    test_mask = g.ndata["test_mask"]
    num_classes = int(np.asarray(labels).max()) + 1

    class GCNII(nn.Module):
        @nn.compact
        def __call__(self, g, x, deterministic=True):
            drop = nn.Dropout(args.dropout, deterministic=deterministic)
            h0 = nn.relu(nn.Dense(args.hidden, name="fc_in")(drop(x)))
            h = h0
            for l in range(args.layers):
                h = drop(h)
                h = nn.relu(GCN2Conv(
                    layer=l + 1, alpha=args.alpha, lambda_=args.lambda_,
                    project_initial_features=True,
                    name=f"conv_{l}")(g, h, h0))
            return nn.Dense(num_classes, name="fc_out")(drop(h))

    model = GCNII()
    params = model.init(jax.random.PRNGKey(0), g, feat)
    opt = optax.adamw(args.lr, weight_decay=5e-4)
    opt_state = opt.init(params)

    def loss_fn(params, rng):
        logits = model.apply(params, g, feat, deterministic=False,
                             rngs={"dropout": rng})
        logp = jax.nn.log_softmax(logits)
        m = train_mask.astype(jnp.float32)
        ce = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                  axis=1)[:, 0]
        return jnp.sum(ce * m) / jnp.sum(m)

    @jax.jit
    def train_step(params, opt_state, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, rng)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g, feat)
        pred = jnp.argmax(logits, axis=1)
        correct = (pred == labels).astype(jnp.float32)

        def acc(mask):
            m = mask.astype(jnp.float32)
            return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)

        return acc(train_mask), acc(val_mask), acc(test_mask)

    key = jax.random.PRNGKey(1)
    best_val, best_test = 0.0, 0.0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if (epoch + 1) % 25 == 0 or epoch == 0:
            tr, va, te = evaluate(params)
            if float(va) > best_val:
                best_val, best_test = float(va), float(te)
            print(f"epoch {epoch + 1:4d} loss {float(loss):.4f} "
                  f"train {float(tr):.4f} val {float(va):.4f} "
                  f"test {float(te):.4f}")
    dt = time.perf_counter() - t0
    print(f"done in {dt:.1f}s ({args.epochs / dt:.1f} epochs/s, "
          f"{args.layers} layers); best val {best_val:.4f} "
          f"test@best-val {best_test:.4f}")

    # GCNII literature: Cora 85.5 / Citeseer 73.4 / Pubmed 80.3
    # (Chen et al. 2020) — enforced on real data only.
    gates = {"cora": 0.855, "citeseer": 0.734, "pubmed": 0.803}
    if not ds.is_synthetic:
        gate = gates[args.dataset] - 0.015
        if best_test < gate:
            raise SystemExit(
                f"ACCURACY GATE FAILED: {best_test:.4f} < {gate:.4f}")
        print(f"accuracy gate passed ({best_test:.4f} >= {gate:.4f})")


if __name__ == "__main__":
    main()
