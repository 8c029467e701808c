"""Host-resident feature store for graphs whose features exceed HBM.

Parity role: the feature side of DistDGL's KVStore
(``python/dgl/distributed/kvstore.py`` — local shared-memory fast path +
remote pull) and the ``dgl.contrib.graph_store`` host store, re-designed
for TPU hosts: at ogbn-papers100M scale (111M nodes x 128 feats ≈ 57 GB
f32) node features cannot live in 16 GB HBM, so they stay in host RAM or
on disk (np.memmap) and mini-batches gather just the rows a sampled block
needs, overlapping the host gather + H2D copy of batch k+1 with device
compute of batch k.

TPU-native design points:
- the gather is a threaded C++ row-memcpy (``_native.gather_rows``) —
  numpy fancy indexing is page-fault bound on these hosts;
- the device side sees only static-shape (padded) row blocks, so the
  training step compiles once;
- no RPC: one process per host owns its shard; cross-host feature
  exchange at training time is the halo ``all_to_all`` in
  ``parallel/sharded_ops.py``, not a pull protocol.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterable, Optional, Union

import numpy as np

from dgl1_tpu import _native

__all__ = ["HostFeatureStore", "prefetch_to_device"]


class HostFeatureStore:
    """(N, ...) feature matrix in host RAM or on disk, with fast row pull.

    Construct from an ndarray, or from a ``.bin``/``.npy`` path with
    ``mmap=True`` to stream features that exceed host RAM as well.
    """

    def __init__(self, data: Union[np.ndarray, str, Path],
                 shape=None, dtype=None, mmap: bool = False,
                 num_threads: int = 8):
        if isinstance(data, (str, Path)):
            path = Path(data)
            if path.suffix == ".npy":
                self._data = np.load(path, mmap_mode="r" if mmap else None)
            else:
                if shape is None or dtype is None:
                    raise ValueError(".bin stores need shape= and dtype=")
                self._data = np.memmap(path, dtype=dtype, mode="r",
                                       shape=tuple(shape))
        else:
            self._data = np.asarray(data)
        self.num_threads = num_threads

    @property
    def shape(self):
        return self._data.shape

    @property
    def dtype(self):
        return self._data.dtype

    def __len__(self):
        return self._data.shape[0]

    def pull(self, ids) -> np.ndarray:
        """Gather rows by global id on the host (threaded memcpy)."""
        ids = np.asarray(ids, dtype=np.int64)
        return _native.gather_rows(self._data, ids,
                                   num_threads=self.num_threads)

    def pull_to_device(self, ids, device=None):
        """Gather + H2D transfer; returns a jax.Array."""
        import jax

        rows = self.pull(ids)
        return jax.device_put(rows, device)

    @staticmethod
    def save(path: Union[str, Path], array: np.ndarray) -> "HostFeatureStore":
        """Persist an array as a raw ``.bin`` next to a ``.meta.npz``
        header; returns a mmap-backed store over it."""
        path = Path(path)
        mm = np.memmap(path, dtype=array.dtype, mode="w+",
                       shape=array.shape)
        mm[:] = array
        mm.flush()
        np.savez(path.with_suffix(".meta.npz"), shape=np.asarray(array.shape),
                 dtype=str(array.dtype))
        return HostFeatureStore(path, shape=array.shape, dtype=array.dtype,
                                mmap=True)

    @staticmethod
    def load(path: Union[str, Path]) -> "HostFeatureStore":
        """Open a store persisted by :meth:`save`."""
        path = Path(path)
        meta = np.load(path.with_suffix(".meta.npz"))
        return HostFeatureStore(path, shape=tuple(meta["shape"]),
                                dtype=np.dtype(str(meta["dtype"])),
                                mmap=True)


def prefetch_to_device(loader: Iterable, store: HostFeatureStore,
                       labels: Optional[np.ndarray] = None,
                       depth: int = 2):
    """Wrap a NodeDataLoader: a background thread pulls each batch's input
    features from the store and stages blocks+features on device, ``depth``
    batches ahead of the consumer (double buffering H2D against compute).

    Yields ``(input_nodes, output_nodes, blocks, mask, x [, y])``.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in loader:
                input_nodes, output_nodes, blocks, mask = item
                x = store.pull_to_device(np.asarray(input_nodes))
                blocks_d = jax.device_put(blocks)
                out = [input_nodes, output_nodes, blocks_d,
                       jax.device_put(np.asarray(mask)), x]
                if labels is not None:
                    out.append(jax.device_put(
                        _native.gather_rows(
                            labels.reshape(len(labels), -1),
                            np.asarray(output_nodes, dtype=np.int64),
                        ).reshape((len(output_nodes),) + labels.shape[1:])
                    ))
                q.put(tuple(out))
        except BaseException as exc:  # surface worker errors to consumer
            q.put(exc)
            return
        q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
    t.join()
