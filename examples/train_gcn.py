"""Full-graph GCN training (BASELINE config #1: 2-layer GCN on Cora).

Parity: ``examples/pytorch/gcn/train.py``. Usage:
    python examples/train_gcn.py [--dataset cora] [--epochs 200] [--cpu]
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="cora",
                   choices=["cora", "citeseer", "pubmed"])
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--metrics", default=None, help="jsonl metrics path")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.models import GCN
    from dgl1_tpu.utils import MetricsLogger

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

    model = GCN(hidden_feats=args.hidden, out_feats=num_classes,
                dropout=args.dropout)
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
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g, feat)
        pred = jnp.argmax(logits, axis=1)
        correct = (pred == labels).astype(jnp.float32)

        def acc(mask):
            m = mask.astype(jnp.float32)
            return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)

        return acc(train_mask), acc(val_mask), acc(test_mask)

    logger = MetricsLogger(args.metrics) if args.metrics else None
    key = jax.random.PRNGKey(1)
    best_val, best_test = 0.0, 0.0
    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if (epoch + 1) % 20 == 0 or epoch == 0:
            tr, va, te = evaluate(params)
            if float(va) > best_val:
                best_val, best_test = float(va), float(te)
            print(f"epoch {epoch + 1:4d} loss {float(loss):.4f} "
                  f"train {float(tr):.4f} val {float(va):.4f} "
                  f"test {float(te):.4f}")
            if logger:
                logger.log(loss=float(loss), val_acc=float(va),
                           test_acc=float(te))
    dt = time.perf_counter() - t0
    print(f"done in {dt:.1f}s ({args.epochs / dt:.1f} epochs/s); "
          f"best val {best_val:.4f} test@best-val {best_test:.4f}")

    # Accuracy gate vs the literature (GCN: Cora 81.5 / Citeseer 70.3 /
    # Pubmed 79.0, Kipf & Welling 2017) — enforced only on REAL data;
    # the synthetic stand-in has its own difficulty profile.
    gates = {"cora": 0.815, "citeseer": 0.703, "pubmed": 0.790}
    if not ds.is_synthetic:
        gate = gates[args.dataset] - 0.01
        if best_test < gate:
            raise SystemExit(
                f"ACCURACY GATE FAILED: {args.dataset} test "
                f"{best_test:.4f} < {gate:.4f}")
        print(f"accuracy gate passed ({best_test:.4f} >= {gate:.4f})")


if __name__ == "__main__":
    main()
