"""Multi-process sampled GraphSAGE training, DistDGL-style.

Parity: ``examples/pytorch/graphsage/train_dist.py`` (the DistDGL
trainer). Each process owns ONE partition: it samples seeds from its own
partition-book shard, pulls features for ANY node from the replicated
mmap store written by ``partition_graph`` (the KVStore-pull replacement —
no RPC), and all-reduces gradients across the process mesh.

Run (spawns one worker per partition over loopback):
    python examples/train_dist_sampled.py --parts 2 --epochs 5

Or launch workers yourself (one per host):
    python examples/train_dist_sampled.py --worker --part-id 0 \
        --coordinator 10.0.0.1:12345 --parts 2 ...
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def build_args():
    p = argparse.ArgumentParser()
    p.add_argument("--parts", type=int, default=2)
    p.add_argument("--nodes", type=int, default=2000)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--classes", type=int, default=8)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--fanout", type=str, default="5,5")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--out", type=str, default="/tmp/dist_sampled_parts")
    p.add_argument("--worker", action="store_true")
    p.add_argument("--part-id", type=int, default=0)
    p.add_argument("--coordinator", type=str, default="127.0.0.1:12531")
    p.add_argument("--sharded-store", action="store_true",
                   help="pull features through the KVStore-parity "
                        "SHARDED store (each process maps only its own "
                        "partition's rows; remote rows over sockets) "
                        "instead of the replicated mmap")
    p.add_argument("--store-port-base", type=int, default=29410)
    return p


def prepare(args):
    """Rank-0 offline step: build + partition + persist (with the
    replicated feature store and structure files)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import dgl1_tpu as dgl
    from dgl1_tpu.parallel.partition import partition_graph

    g = dgl.data.synthetic_classification_graph(
        num_nodes=args.nodes, num_classes=args.classes,
        feat_dim=args.feat_dim, avg_degree=8.0, seed=4,
        train_per_class=max(args.nodes // (4 * args.classes), 20),
    )
    g.ndata["label"] = jnp.asarray(
        np.asarray(g.ndata["label"]).astype(np.int32))
    partition_graph(g, "dist_sampled", args.parts, args.out,
                    part_method="greedy")
    print(f"[prepare] partitioned {args.nodes} nodes into {args.parts} "
          f"parts under {args.out}")


def worker(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dgl1_tpu.parallel.dist_context import initialize

    initialize(coordinator_address=args.coordinator,
               num_processes=args.parts, process_id=args.part_id,
               timeout_s=120)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import NeighborSampler
    from dgl1_tpu.parallel.dist_dataloader import DistNodeDataLoader
    from dgl1_tpu.parallel.dist_graph import DistGraph

    pid = args.part_id
    dist_g = DistGraph.from_partition(args.out, "dist_sampled", pid)
    store = None
    if args.sharded_store:
        # KVStore-parity sharded feature access: this process maps ONLY
        # its own partition's feature rows; remote rows are pulled from
        # the owning peer over the thin host socket service
        # (dgl1_tpu/parallel/kvstore.py — python/dgl/distributed/
        # kvstore.py parity). Features beyond one host's storage run in
        # exactly this mode.
        from dgl1_tpu.parallel.kvstore import ShardedFeatureStore

        addrs = [("127.0.0.1", args.store_port_base + p)
                 for p in range(args.parts)]
        store = ShardedFeatureStore(args.out, "dist_sampled", pid,
                                    dist_g.part, addrs=addrs, serve=True)
        assert store.local_rows < dist_g.num_nodes(), \
            "sharded store must not hold the full matrix"

        class _StoreField:
            def __init__(self, field):
                self.field = field

            def __getitem__(self, nids):
                import numpy as _np

                return store.pull(self.field, _np.asarray(nids))

        for fld in list(dist_g.ndata):
            dist_g.ndata[fld] = _StoreField(fld)
        # All feature servers must be listening before any pull.
        from jax.experimental import multihost_utils as _mhu
        import jax.numpy as _jnp

        _mhu.process_allgather(_jnp.asarray([pid]))
    # This host's seeds: the training nodes among its owned partition.
    own = dist_g.book.partid2nids(pid)
    train_mask = dist_g.ndata["train_mask"][own].reshape(-1).astype(bool)
    train_ids = own[train_mask]
    fanouts = [int(x) for x in args.fanout.split(",")]
    loader = DistNodeDataLoader(
        dist_g, train_ids, NeighborSampler(fanouts), feat_name="feat",
        batch_size=args.batch_size, shuffle=True, seed=pid,
        drop_last=True, prefetch=0,
    )
    labels = dist_g.ndata["label"]
    # Equal step counts across processes (collectives are synchronous).
    steps = int(multihost_utils.process_allgather(
        jnp.asarray([len(loader) - (0 if len(train_ids) %
                                    args.batch_size == 0 else 1)])).min())
    steps = max(steps, 1)

    key = jax.random.PRNGKey(0)  # identical init everywhere
    k1, k2 = jax.random.split(key)
    params = {
        "W1": jax.random.normal(k1, (args.feat_dim, args.hidden)) * 0.2,
        "W2": jax.random.normal(k2, (args.hidden, args.classes)) * 0.2,
    }
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def loss_grads(params, blocks, x, y, m):
        def loss_fn(p):
            h = dgl.ops.gspmm(blocks[0], "copy_lhs", "mean", x, None)
            h = jax.nn.relu(h @ p["W1"])
            h = dgl.ops.gspmm(blocks[1], "copy_lhs", "mean",
                              h[: blocks[1].num_src_nodes()], None)
            logits = h @ p["W2"]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * m) / jnp.maximum(m.sum(), 1.0)

        return jax.value_and_grad(loss_fn)(params)

    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        tot = 0.0
        it = iter(loader)
        for _ in range(steps):
            inp, out, blocks, mask, x = next(it)
            y = jnp.asarray(labels[np.asarray(out)].reshape(-1))
            loss, grads = loss_grads(params, blocks, jnp.asarray(x), y,
                                     jnp.asarray(mask, jnp.float32))
            grads = jax.tree.map(
                lambda a: jnp.mean(
                    multihost_utils.process_allgather(a), axis=0), grads)
            upd, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, upd)
            tot += float(loss)
        if pid == 0:
            print(f"[worker0] epoch {epoch} loss {tot / steps:.4f} "
                  f"({time.perf_counter() - t0:.1f}s, {steps} steps x "
                  f"{args.parts} procs)", flush=True)

    # Sampled eval on this host's own test nodes.
    test_mask = dist_g.ndata["test_mask"][own].reshape(-1).astype(bool)
    test_ids = own[test_mask]
    eval_loader = DistNodeDataLoader(
        dist_g, test_ids, NeighborSampler(fanouts), feat_name="feat",
        batch_size=args.batch_size, shuffle=False, prefetch=0)

    @jax.jit
    def predict(params, blocks, x):
        h = dgl.ops.gspmm(blocks[0], "copy_lhs", "mean", x, None)
        h = jax.nn.relu(h @ params["W1"])
        h = dgl.ops.gspmm(blocks[1], "copy_lhs", "mean",
                          h[: blocks[1].num_src_nodes()], None)
        return jnp.argmax(h @ params["W2"], axis=1)

    correct = total = 0
    for inp, out, blocks, mask, x in eval_loader:
        pred = np.asarray(predict(params, blocks, jnp.asarray(x)))
        m = np.asarray(mask)
        correct += (pred[m] == np.asarray(
            labels[np.asarray(out)]).reshape(-1)[m]).sum()
        total += m.sum()
    local = np.asarray([correct, total], np.int64)
    agg = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(local))).reshape(args.parts, 2).sum(axis=0)
    if store is not None:
        st = store.stats()
        # The gate: remote rows really crossed the socket (sampled
        # neighborhoods span partitions), and the shard stayed partial.
        remote_all = np.asarray(multihost_utils.process_allgather(
            jnp.asarray([st["remote_rows"]], np.int32))).sum()
        assert remote_all > 0, "no remote pulls — store not exercised"
        if pid == 0:
            print(f"[worker0] sharded store: local_rows="
                  f"{store.local_rows}/{dist_g.num_nodes()}, pulls "
                  f"local={st['local_rows']} remote={st['remote_rows']} "
                  f"(all-proc remote={int(remote_all)})", flush=True)
        store.close()
    if pid == 0:
        print(f"[worker0] test acc {agg[0] / max(agg[1], 1):.4f} "
              f"({int(agg[1])} test nodes across {args.parts} parts)",
              flush=True)


def launch(args):
    prepare(args)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = []
    for pid in range(args.parts):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--part-id", str(pid), "--parts", str(args.parts),
               "--nodes", str(args.nodes), "--feat-dim",
               str(args.feat_dim), "--classes", str(args.classes),
               "--hidden", str(args.hidden), "--fanout", args.fanout,
               "--batch-size", str(args.batch_size), "--epochs",
               str(args.epochs), "--lr", str(args.lr), "--out", args.out,
               "--coordinator", args.coordinator,
               "--store-port-base", str(args.store_port_base)]
        if args.sharded_store:
            cmd.append("--sharded-store")
        procs.append(subprocess.Popen(cmd, env=env))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise SystemExit(f"worker failure: return codes {rc}")
    print("all workers done")


if __name__ == "__main__":
    a = build_args().parse_args()
    if a.worker:
        worker(a)
    else:
        launch(a)
