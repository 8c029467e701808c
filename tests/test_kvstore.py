"""KVStore-parity sharded feature store (parallel/kvstore.py).

Parity role: ``python/dgl/distributed/kvstore.py`` pull tests — split
ids by partition book, remote rows served by the owning process. The
multi-process test asserts that NO process ever opens more than its own
partition's shard (the property the replicated-mmap store cannot give:
features larger than one host's storage).
"""

import json
import multiprocessing as mp
import os
from pathlib import Path

import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.parallel import ShardedFeatureStore
from dgl1_tpu.parallel.partition import partition_graph

PORT_BASE = 47310


def _mk(tmp_path, num_parts=4, n=200, f=8):
    rng = np.random.default_rng(0)
    g = dgl.rand_graph(n, 5 * n, seed=1)
    import jax.numpy as jnp

    feat = rng.normal(size=(n, f)).astype(np.float32)
    g.ndata["feat"] = jnp.asarray(feat)
    g.ndata["label"] = jnp.asarray(rng.integers(0, 7, n).astype(np.int32))
    part = partition_graph(g, "kv", num_parts, str(tmp_path),
                           part_method="random")
    return g, part, feat


def test_sharded_store_local_only(tmp_path):
    g, part, feat = _mk(tmp_path)
    st = ShardedFeatureStore(tmp_path, "kv", 0, part, addrs=None,
                             serve=False)
    own = np.nonzero(part == 0)[0]
    # Structural no-full-matrix property: the process maps ONLY its own
    # partition's rows.
    assert st.local_rows == len(own) < g.num_nodes()
    got = st.pull("feat", own[:13])
    np.testing.assert_allclose(got, feat[own[:13]])
    with pytest.raises(ValueError):
        st.pull("feat", np.array([int(np.nonzero(part != 0)[0][0])]))


def _worker(kv_path, out_path, part_id, num_parts, port_base, result_q,
            barrier, query_ids):
    """Run in a SPAWNED process with no jax: load kvstore.py standalone
    (the feature service deliberately depends only on numpy + sockets),
    serve the local shard, pull a mixed id batch, report results."""
    import importlib.util

    import numpy as np

    spec = importlib.util.spec_from_file_location("kvstore_standalone",
                                                  kv_path)
    kv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kv)

    part = np.load(Path(out_path) / "node_part.npy")
    addrs = [("127.0.0.1", port_base + p) for p in range(num_parts)]
    st = kv.ShardedFeatureStore(out_path, "kv", part_id, part,
                                addrs=addrs, serve=True)
    barrier.wait(timeout=60)  # all servers up
    got = st.pull("feat", np.asarray(query_ids))
    stats = st.stats()
    barrier.wait(timeout=60)  # all pulls done before servers die
    st.close()
    result_q.put((part_id, st.local_rows, got, stats))


def test_sharded_store_multiprocess_pull(tmp_path):
    num_parts = 4
    g, part, feat = _mk(tmp_path, num_parts=num_parts)
    n = g.num_nodes()
    rng = np.random.default_rng(3)
    query = rng.integers(0, n, size=64)

    ctx = mp.get_context("spawn")
    result_q = ctx.Queue()
    barrier = ctx.Barrier(num_parts)
    import dgl1_tpu.parallel.kvstore as kvmod

    procs = [
        ctx.Process(target=_worker,
                    args=(kvmod.__file__, str(tmp_path), p, num_parts,
                          PORT_BASE, result_q, barrier, query.tolist()))
        for p in range(num_parts)
    ]
    for p in procs:
        p.start()
    results = {}
    try:
        for _ in range(num_parts):
            pid, local_rows, got, stats = result_q.get(timeout=120)
            results[pid] = (local_rows, got, stats)
    finally:
        for p in procs:
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()

    assert set(results) == set(range(num_parts))
    total_local = sum(r[0] for r in results.values())
    assert total_local == n  # shards tile the matrix exactly
    for pid, (local_rows, got, stats) in results.items():
        # NO process holds the full matrix.
        assert local_rows < n
        # Every process got the SAME correct rows for the global query.
        np.testing.assert_allclose(got, feat[query], rtol=0, atol=0)
        # Remote rows actually crossed the socket (query spans parts).
        expect_remote = int((part[query] != pid).sum())
        assert stats["remote_rows"] == expect_remote
        assert stats["local_rows"] == len(query) - expect_remote
