"""Multi-process loopback cluster test (parity: ``tests/distributed`` in
the reference — multi-node simulated by processes + loopback TCP).

Two processes join a jax.distributed coordinator on 127.0.0.1, form a
2-device global CPU mesh, and run the partitioned halo-exchange GCN
matvec; the result must match the single-process engine.
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
    # Each process saves ITS addressable shard (squeezed to (n_loc, F)).
    local = np.asarray([s.data for s in y.addressable_shards][0])[0]
    np.save(f"/tmp/mp_gcn_out_{pid}.npy", local)
    print("WORKER_OK", pid, flush=True)
""")


@pytest.mark.parametrize("nproc", [2])
def test_multiprocess_partitioned_matvec(tmp_path, nproc):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = "12411"
    env = dict(os.environ)
    # One CPU device per process (conftest's 8-device flag would leak in).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    # Workers must import the package even when it isn't pip-installed.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(nproc), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o}"
        assert "WORKER_OK" in o

    # Single-process reference.
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from jax.sharding import PartitionSpec as P

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
    ref = np.asarray(mv(pg.shard_node_data(jnp.asarray(feat))))

    for i in range(nproc):
        got = np.load(f"/tmp/mp_gcn_out_{i}.npy")
        np.testing.assert_allclose(got, ref[i], rtol=1e-5, atol=1e-5)
