"""Host feature store (parity role: DistDGL KVStore local pull path +
feature slicing in the sampling pipeline)."""

import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu.data import HostFeatureStore, prefetch_to_device


def test_pull_ram_and_mmap(tmp_path):
    rng = np.random.default_rng(0)
    feat = rng.normal(size=(500, 16)).astype(np.float32)
    store = HostFeatureStore(feat)
    ids = rng.integers(0, 500, size=200)
    np.testing.assert_array_equal(store.pull(ids), feat[ids])

    saved = HostFeatureStore.save(tmp_path / "feat.bin", feat)
    np.testing.assert_array_equal(saved.pull(ids), feat[ids])
    loaded = HostFeatureStore.load(tmp_path / "feat.bin")
    assert loaded.shape == (500, 16)
    np.testing.assert_array_equal(loaded.pull(ids), feat[ids])


def test_pull_to_device():
    feat = np.arange(40, dtype=np.float32).reshape(10, 4)
    store = HostFeatureStore(feat)
    x = store.pull_to_device([3, 1])
    np.testing.assert_array_equal(np.asarray(x), feat[[3, 1]])


def test_prefetch_pipeline():
    from dgl1_tpu.dataloading import MultiLayerNeighborSampler, NodeDataLoader

    rng = np.random.default_rng(1)
    g = dgl.rand_graph(200, 2000, seed=2)
    feat = rng.normal(size=(200, 8)).astype(np.float32)
    labels = rng.integers(0, 3, size=200).astype(np.int32)
    store = HostFeatureStore(feat)
    sampler = MultiLayerNeighborSampler([4, 4])
    loader = NodeDataLoader(g, np.arange(200), sampler, batch_size=64,
                            shuffle=False, seed=0)
    seen = 0
    for item in prefetch_to_device(loader, store, labels=labels):
        input_nodes, output_nodes, blocks, mask, x, y = item
        x = np.asarray(x)
        np.testing.assert_array_equal(x, feat[np.asarray(input_nodes)])
        np.testing.assert_array_equal(
            np.asarray(y), labels[np.asarray(output_nodes)])
        seen += int(np.asarray(mask).sum())
    assert seen == 200


def test_prefetch_propagates_errors():
    class Bad:
        def __iter__(self):
            raise RuntimeError("boom")

    store = HostFeatureStore(np.zeros((4, 2), np.float32))
    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(Bad(), store))
