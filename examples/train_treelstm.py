"""Tree-LSTM sentiment classification on (synthetic) SST.

Parity: ``examples/pytorch/tree_lstm/train.py`` — child-sum Tree-LSTM,
trees batched with ``dgl.batch``, recurrence via ``dgl.prop_nodes_topo``
(leaves to root), per-node 5-class sentiment; reports root and all-node
accuracy.

The recurrence runs the COMPILED topological schedule
(``dgl.topo_schedule`` + ``prop_nodes_topo_compiled``): the level loop
is one traced static-shape program per (levels, width, arity) bucket,
so the whole train step jits — the TPU-native upgrade over the
reference's host-driven eager frontier loop (``--eager`` restores the
reference-parity path).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--x-size", type=int, default=64)
    p.add_argument("--h-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--cell", default="childsum", choices=["childsum", "nary"])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--eager", action="store_true",
                   help="reference-parity host-driven frontier loop")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.data import SSTDataset
    from dgl1_tpu.models import TreeLSTM

    train_set = SSTDataset("train")
    # Share the train vocab: embedding tables are sized from it (ADVICE r3).
    test_set = SSTDataset("test", vocab=train_set._vocab)
    print(f"[data] SST(synthetic): {len(train_set)} train / "
          f"{len(test_set)} test trees, vocab {train_set.vocab_size}")

    model = TreeLSTM(num_vocab=train_set.vocab_size, x_size=args.x_size,
                     h_size=args.h_size, num_classes=SSTDataset.num_classes,
                     cell_type=args.cell)

    # Pad every batch to one static node count: shapes repeat across
    # batches, so the eager recurrence reuses compiled ops (without this,
    # every batch's distinct node count recompiles everything).
    node_pad = 1 << int(np.ceil(np.log2(
        args.batch_size * 24 + 1)))  # trees here have <= 23 nodes

    # Static schedule buckets: every batch pads to the same
    # (levels, width, arity), so ONE compiled program serves the epoch.
    sched_pad = dict(pad_levels=16, pad_width=256, pad_k=4)

    def batch_of(trees):
        bg = dgl.batch(trees)
        n = bg.num_nodes()
        bg = dgl.add_nodes(bg, node_pad - n)
        toks = jnp.asarray(np.asarray(bg.ndata["x"], np.int32))
        mask = jnp.asarray(np.asarray(bg.ndata["mask"], np.float32))
        y = jnp.asarray(np.asarray(bg.ndata["y"], np.int32))
        sched = (None if args.eager
                 else dgl.topo_schedule(bg, **sched_pad))
        # Root of each tree = last node of its segment (merge order).
        offs = np.cumsum([0] + [t.num_nodes() for t in trees])
        roots = jnp.asarray(offs[1:] - 1)
        return bg, toks, mask, y, roots, n, sched

    g0, t0_, m0, y0, _, n0, _s0 = batch_of(
        [train_set[i] for i in range(4)])
    params = model.init(jax.random.PRNGKey(0), g0, t0_, m0)
    # Compiled mode never reads the graph's edge arrays (the schedule
    # carries the structure), so ONE static dummy graph serves every
    # batch — without it, per-batch edge counts would retrace the jit.
    g_static = dgl.graph(([0], [0]), num_nodes=node_pad)
    opt = optax.adam(args.lr)  # adam converges much faster than the
    # reference's adagrad on the synthetic-SST signal
    opt_state = opt.init(params)

    def loss_fn(p, toks, mask, y, n_real, sched):
        g = g_static if not args.eager else None
        logits = model.apply(p, g, toks, mask, schedule=sched)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        valid = (jnp.arange(logits.shape[0]) < n_real).astype(logp.dtype)
        return jnp.sum(ce * valid) / n_real

    def loss_fn_eager(p, g, toks, mask, y, n_real):
        logits = model.apply(p, g, toks, mask)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        valid = (jnp.arange(logits.shape[0]) < n_real).astype(logp.dtype)
        return jnp.sum(ce * valid) / n_real

    grad_fn_eager = jax.value_and_grad(loss_fn_eager)
    # One compiled program per schedule bucket (the point).
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    rng = np.random.default_rng(0)
    n = len(train_set)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        t0 = time.perf_counter()
        losses = []
        for s in range(0, n, args.batch_size):
            trees = [train_set[i] for i in order[s:s + args.batch_size]]
            g, toks, mask, y, _, n_real, sched = batch_of(trees)
            if args.eager:
                loss, grads = grad_fn_eager(params, g, toks, mask, y,
                                            float(n_real))
            else:
                loss, grads = grad_fn(params, toks, mask, y,
                                      jnp.float32(n_real), sched)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
        print(f"epoch {epoch} loss {np.mean(losses):.4f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # Test: root + all-node accuracy.
    root_hit = root_tot = node_hit = node_tot = 0
    for s in range(0, len(test_set), args.batch_size):
        trees = [test_set[i] for i in range(s, min(s + args.batch_size,
                                                   len(test_set)))]
        g, toks, mask, y, roots, n_real, sched = batch_of(trees)
        gg = g if args.eager else g_static
        pred = np.asarray(model.apply(
            params, gg, toks, mask, schedule=sched).argmax(axis=1))
        y = np.asarray(y)[:n_real]
        pred_r = pred[:n_real]
        node_hit += int((pred_r == y).sum())
        node_tot += len(y)
        r = np.asarray(roots)
        root_hit += int((pred[r] == np.asarray(g.ndata["y"])[r]).sum())
        root_tot += len(r)
    acc_node = node_hit / node_tot
    print(f"test acc: root {root_hit / root_tot:.4f} "
          f"all-node {acc_node:.4f}")
    assert acc_node >= 0.75, (
        f"gate failed: all-node acc {acc_node:.4f} < 0.75")


if __name__ == "__main__":
    main()
