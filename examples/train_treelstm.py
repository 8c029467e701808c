"""Tree-LSTM sentiment classification on (synthetic) SST.

Parity: ``examples/pytorch/tree_lstm/train.py`` — child-sum Tree-LSTM,
trees batched with ``dgl.batch``, recurrence via ``dgl.prop_nodes_topo``
(leaves to root), per-node 5-class sentiment; reports root and all-node
accuracy.

The recurrence is host-driven (frontier structure is data-dependent), so
this example trains eagerly — the reference does the same through
pytorch's eager mode.
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
    test_set = SSTDataset("test")
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

    def batch_of(trees):
        bg = dgl.batch(trees)
        n = bg.num_nodes()
        bg = dgl.add_nodes(bg, node_pad - n)
        toks = jnp.asarray(np.asarray(bg.ndata["x"], np.int32))
        mask = jnp.asarray(np.asarray(bg.ndata["mask"], np.float32))
        y = jnp.asarray(np.asarray(bg.ndata["y"], np.int32))
        # Root of each tree = last node of its segment (merge order).
        offs = np.cumsum([0] + [t.num_nodes() for t in trees])
        roots = jnp.asarray(offs[1:] - 1)
        return bg, toks, mask, y, roots, n

    g0, t0_, m0, y0, _, n0 = batch_of([train_set[i] for i in range(4)])
    params = model.init(jax.random.PRNGKey(0), g0, t0_, m0)
    opt = optax.adam(args.lr)  # adam converges much faster than the
    # reference's adagrad on the synthetic-SST signal
    opt_state = opt.init(params)

    def loss_fn(p, g, toks, mask, y, n_real):
        logits = model.apply(p, g, toks, mask)
        logp = jax.nn.log_softmax(logits)
        ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
        valid = (jnp.arange(logits.shape[0]) < n_real).astype(logp.dtype)
        return jnp.sum(ce * valid) / n_real

    grad_fn = jax.value_and_grad(loss_fn)

    rng = np.random.default_rng(0)
    n = len(train_set)
    for epoch in range(args.epochs):
        order = rng.permutation(n)
        t0 = time.perf_counter()
        losses = []
        for s in range(0, n, args.batch_size):
            trees = [train_set[i] for i in order[s:s + args.batch_size]]
            g, toks, mask, y, _, n_real = batch_of(trees)
            loss, grads = grad_fn(params, g, toks, mask, y, n_real)
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
        g, toks, mask, y, roots, n_real = batch_of(trees)
        pred = np.asarray(model.apply(params, g, toks, mask).argmax(axis=1))
        y = np.asarray(y)[:n_real]
        pred_r = pred[:n_real]
        node_hit += int((pred_r == y).sum())
        node_tot += len(y)
        r = np.asarray(roots)
        root_hit += int((pred[r] == np.asarray(g.ndata["y"])[r]).sum())
        root_tot += len(r)
    print(f"test acc: root {root_hit / root_tot:.4f} "
          f"all-node {node_hit / node_tot:.4f}")


if __name__ == "__main__":
    main()
