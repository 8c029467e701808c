"""Cluster-GCN: partition-based mini-batch full-subgraph training.

Parity: ``examples/pytorch/cluster_gcn/cluster_gcn.py``. TPU-native:
each batch is a node-induced subgraph of a random union of clusters,
padded to bucketed static shapes so XLA compiles a handful of programs
for the whole run; the partitioner is the same edge-cut machinery as
the distributed layer (METIS stand-in).
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--parts-per-batch", type=int, default=4)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--metrics", default=None)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import ClusterGCNDataLoader
    from dgl1_tpu.models import GCN
    from dgl1_tpu.utils import MetricsLogger

    ds = dgl.data.CoraGraphDataset()
    g = dgl.add_self_loop(ds[0])
    print(f"[data] cora{'(synthetic)' if ds.is_synthetic else ''}: "
          f"{g.num_nodes()} nodes, {g.num_edges()} edges, "
          f"{args.num_parts} clusters")

    labels = np.asarray(g.ndata["label"]).astype(np.int32)
    train_mask = np.asarray(g.ndata["train_mask"])
    num_classes = int(labels.max()) + 1

    loader = ClusterGCNDataLoader(
        g, num_parts=args.num_parts, parts_per_batch=args.parts_per_batch,
        shuffle=True, seed=0)

    model = GCN(hidden_feats=args.hidden, out_feats=num_classes, dropout=0.0)

    sg0, mask0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), sg0, sg0.ndata["feat"])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, sg_struct, x, y, train_m):
        def loss_fn(p):
            logits = model.apply(p, sg_struct, x)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = train_m.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    logger = MetricsLogger(args.metrics) if args.metrics else None
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        total_loss = n_batches = 0
        for sg, node_mask in loader:
            ids = np.asarray(sg.ndata["_ID"])
            y = jnp.asarray(labels[ids])
            tm = jnp.asarray(train_mask[ids]) & node_mask
            params, opt_state, loss = train_step(
                params, opt_state, sg, sg.ndata["feat"], y, tm)
            total_loss += float(loss)
            n_batches += 1
        dt = time.perf_counter() - t0
        print(f"epoch {epoch} loss {total_loss / max(n_batches, 1):.4f} "
              f"({dt:.2f}s)")
        if logger:
            logger.log(epoch=epoch, loss=total_loss / max(n_batches, 1))

    # Full-graph evaluation.
    @jax.jit
    def predict(params, g, x):
        return jnp.argmax(model.apply(params, g, x), axis=1)

    pred = np.asarray(predict(params, g, g.ndata["feat"]))
    for split in ("val_mask", "test_mask"):
        m = np.asarray(g.ndata[split])
        acc = (pred[m] == labels[m]).mean()
        print(f"{split.split('_')[0]} acc: {acc:.4f}")


if __name__ == "__main__":
    main()
