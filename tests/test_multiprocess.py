"""Multi-process loopback cluster tests (parity: ``tests/distributed`` in
the reference — multi-node simulated by processes + loopback TCP).

Covered here:
* 2- and 4-process global CPU mesh running the partitioned halo-exchange
  GCN matvec, values AND gradients vs the single-process engine;
* a 2-process sampled GraphSAGE training run where each process owns one
  partition (seeds from its own partition book shard, features pulled
  from the replicated mmap store written by ``partition_graph``, grads
  all-reduced across processes) — the DistDGL trainer counterpart;
* fail-fast: ``dist_context.initialize`` raises on a missing peer
  instead of hanging (SURVEY.md §5 failure-detection bullet).
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid,
    )
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import dgl1_tpu as dgl
    from dgl1_tpu.parallel import build_partitioned_graph
    from dgl1_tpu.parallel.partition import random_partition_assignment
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gcn_matvec

    # Deterministic graph/features on every process.
    g = dgl.rand_graph(48, 300, seed=7)
    part = random_partition_assignment(g, nproc, seed=0)
    pg = build_partitioned_graph(g, part, nproc)
    feat = np.random.default_rng(3).normal(size=(48, 8)).astype("float32")

    mesh = Mesh(np.array(jax.devices()), ("p",))
    x_full = np.asarray(pg.shard_node_data(jnp.asarray(feat)))
    sharding = NamedSharding(mesh, P("p"))
    x = jax.make_array_from_process_local_data(
        sharding, x_full[pid:pid + 1]
    )
    pg_global = jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*(["p"] + [None] * (a.ndim - 1)))),
            np.asarray(a)[pid:pid + 1],
        ),
        pg,
    )
    mv = make_sharded_gcn_matvec(pg_global, mesh)
    y = mv(x)
    local = np.asarray([s.data for s in y.addressable_shards][0])[0]
    np.save(f"/tmp/mp_gcn_out_{nproc}_{pid}.npy", local)

    # Gradient across the process mesh: d/dx sum(sin(mv(x))).
    gx = jax.grad(lambda x: jnp.sum(jnp.sin(mv(x))))(x)
    glocal = np.asarray([s.data for s in gx.addressable_shards][0])[0]
    np.save(f"/tmp/mp_gcn_grad_{nproc}_{pid}.npy", glocal)
    print("WORKER_OK", pid, flush=True)
""")


def _run_workers(script_path, nproc, port, extra_args=(), timeout=420):
    env = dict(os.environ)
    # One CPU device per process (conftest's 8-device flag would leak in).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script_path), str(i), str(nproc), port,
             *map(str, extra_args)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o}"
        assert "WORKER_OK" in o
    return outs


@pytest.mark.parametrize("nproc", [4])  # 4 covers 2; 2-proc dropped for
def test_multiprocess_partitioned_matvec_and_grad(tmp_path, nproc):  # suite time
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    _run_workers(worker, nproc, port=str(12411 + nproc))

    # Single-process reference (values + grads on the same 1-axis mesh).
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import dgl1_tpu as dgl
    from dgl1_tpu.parallel import build_partitioned_graph
    from dgl1_tpu.parallel.partition import random_partition_assignment
    from dgl1_tpu.parallel.sharded_ops import make_sharded_gcn_matvec

    g = dgl.rand_graph(48, 300, seed=7)
    part = random_partition_assignment(g, nproc, seed=0)
    pg = build_partitioned_graph(g, part, nproc)
    feat = np.random.default_rng(3).normal(size=(48, 8)).astype("float32")
    mesh = Mesh(np.array(jax.devices()[:nproc]), ("p",))
    mv = make_sharded_gcn_matvec(pg, mesh)
    x = pg.shard_node_data(jnp.asarray(feat))
    ref = np.asarray(mv(x))
    gref = np.asarray(jax.grad(lambda x: jnp.sum(jnp.sin(mv(x))))(x))

    for i in range(nproc):
        got = np.load(f"/tmp/mp_gcn_out_{nproc}_{i}.npy")
        np.testing.assert_allclose(got, ref[i], rtol=1e-5, atol=1e-5)
        ggot = np.load(f"/tmp/mp_gcn_grad_{nproc}_{i}.npy")
        np.testing.assert_allclose(ggot, gref[i], rtol=1e-5, atol=1e-5)


SAGE_WORKER = textwrap.dedent("""
    import sys
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dgl1_tpu.parallel.dist_context import initialize
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=nproc, process_id=pid, timeout_s=120)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import NeighborSampler
    from dgl1_tpu.parallel.dist_dataloader import DistNodeDataLoader
    from dgl1_tpu.parallel.dist_graph import DistGraph

    # Each process owns ONE partition: loads the replicated structure +
    # the mmap feature store; its seeds are its own partition's nodes.
    dist_g = DistGraph.from_partition(outdir, "mpsage", pid)
    train_ids = dist_g.book.partid2nids(pid)
    loader = DistNodeDataLoader(
        dist_g, train_ids, NeighborSampler([3, 3]), feat_name="feat",
        batch_size=16, shuffle=True, seed=pid, drop_last=True, prefetch=0,
    )
    steps = min(len(dist_g.book.partid2nids(p)) // 16
                for p in range(nproc))
    labels = dist_g.ndata["label"]

    rng = jax.random.PRNGKey(0)  # identical init on every process
    k1, k2 = jax.random.split(rng)
    params = {
        "W1": jax.random.normal(k1, (8, 16)) * 0.3,
        "W2": jax.random.normal(k2, (16, 4)) * 0.3,
    }
    import optax
    opt = optax.adam(5e-2)
    opt_state = opt.init(params)

    @jax.jit
    def loss_grads(params, blocks, x, y):
        def loss_fn(p):
            h = dgl.ops.gspmm(blocks[0], "copy_lhs", "mean", x, None)
            h = jax.nn.relu(h @ p["W1"])
            h = dgl.ops.gspmm(blocks[1], "copy_lhs", "mean",
                              h[: blocks[1].num_src_nodes()], None)
            logits = h @ p["W2"]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return ls.mean()
        return jax.value_and_grad(loss_fn)(params)

    losses = []
    for epoch in range(3):
        it = iter(loader)
        tot = 0.0
        for _ in range(steps):
            inp, out, blocks, mask, x = next(it)
            y = jnp.asarray(labels[np.asarray(out)].reshape(-1))
            loss, grads = loss_grads(params, blocks, jnp.asarray(x), y)
            # DDP-style grad all-reduce across the process mesh.
            grads = jax.tree.map(
                lambda a: jnp.mean(multihost_utils.process_allgather(a),
                                   axis=0), grads)
            upd, opt_state = opt.update(grads, opt_state)
            import optax as _o
            params = _o.apply_updates(params, upd)
            tot += float(loss)
        losses.append(tot / steps)
    flat = np.concatenate([np.asarray(v).ravel()
                           for v in jax.tree.leaves(params)])
    np.save(f"/tmp/mp_sage_params_{pid}.npy", flat)
    np.save(f"/tmp/mp_sage_losses_{pid}.npy", np.asarray(losses))
    print("WORKER_OK", pid, flush=True)
""")


def test_multiprocess_sampled_sage_training(tmp_path):
    """2 processes, each owning one partition, train a sampled GraphSAGE:
    features come from the replicated mmap store, grads all-reduce across
    the process mesh; params must stay bit-identical across hosts and the
    loss must decrease."""
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.parallel.partition import partition_graph

    g = dgl.data.synthetic_classification_graph(
        num_nodes=120, num_classes=4, feat_dim=8, avg_degree=6.0, seed=2)
    g.ndata["label"] = jnp.asarray(
        np.asarray(g.ndata["label"]).astype(np.int32))
    g.ndata.pop("train_mask"), g.ndata.pop("val_mask")
    g.ndata.pop("test_mask")
    partition_graph(g, "mpsage", 2, str(tmp_path / "parts"))

    worker = tmp_path / "sage_worker.py"
    worker.write_text(SAGE_WORKER)
    _run_workers(worker, 2, port="12471",
                 extra_args=[str(tmp_path / "parts")])

    p0 = np.load("/tmp/mp_sage_params_0.npy")
    p1 = np.load("/tmp/mp_sage_params_1.npy")
    np.testing.assert_array_equal(p0, p1)  # DDP sync held exactly
    for pid in range(2):
        losses = np.load(f"/tmp/mp_sage_losses_{pid}.npy")
        assert losses[-1] < losses[0], losses


TIMEOUT_WORKER = textwrap.dedent("""
    import sys
    port = sys.argv[3]
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dgl1_tpu.parallel.dist_context import initialize
    try:
        # Expect 2 processes but only this one exists: must FAIL within
        # the deadline, not hang (the runtime may abort fatally with
        # DEADLINE_EXCEEDED instead of raising — both are fail-fast).
        initialize(coordinator_address=f"127.0.0.1:{port}",
                   num_processes=2, process_id=0, timeout_s=8)
    except RuntimeError as e:
        print("TIMEOUT_RAISED", flush=True)
        sys.exit(3)
    print("NO TIMEOUT", flush=True)
    sys.exit(1)
""")


def test_distributed_initialize_times_out_on_missing_peer(tmp_path):
    """A missing peer must produce a bounded-time failure (raised
    RuntimeError or a DEADLINE_EXCEEDED runtime abort), never a hang —
    the reference's dead-server behavior is an indefinite blocking read."""
    import time

    worker = tmp_path / "timeout_worker.py"
    worker.write_text(TIMEOUT_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    p = subprocess.Popen(
        [sys.executable, str(worker), "0", "1", "12482"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env,
    )
    out = p.communicate(timeout=90)[0]
    dt = time.perf_counter() - t0
    assert dt < 80, f"initialize hung for {dt:.0f}s"
    assert p.returncode != 0
    assert ("TIMEOUT_RAISED" in out or "DEADLINE_EXCEEDED" in out
            or "Deadline Exceeded" in out), out
