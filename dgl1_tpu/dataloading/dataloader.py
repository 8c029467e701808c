"""Node dataloader: seed batching + block sampling + prefetch.

Parity: ``python/dgl/dataloading/dataloader.py`` (``NodeDataLoader`` /
``NodeCollator`` wrapping torch DataLoader workers). TPU-native: the
sampler runs on host CPU in a background prefetch thread (double
buffering), producing static-shape padded batches so the device-side train
step compiles exactly once; the last partial batch is padded to full size
and carries a seed mask for the loss.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from dgl1_tpu import random as dgl_random

from dgl1_tpu.graph import Graph

__all__ = ["NodeCollator", "NodeDataLoader", "DataLoader"]


class NodeCollator:
    """Collate a batch of seed nodes into (input_nodes, output_nodes,
    blocks, seed_mask)."""

    def __init__(self, g: Graph, sampler,
                 rng: Optional[np.random.Generator] = None):
        self.g = g
        self.sampler = sampler
        self.rng = rng or dgl_random.default_rng()

    def collate(self, seeds: np.ndarray, batch_size: int,
                ntype: Optional[str] = None):
        seeds = np.asarray(seeds, dtype=np.int64)
        n_real = len(seeds)
        if n_real < batch_size:
            pad = np.full((batch_size - n_real,), seeds[-1], dtype=np.int64)
            seeds = np.concatenate([seeds, pad])
        mask = np.zeros((batch_size,), dtype=bool)
        mask[:n_real] = True
        input_nodes, output_nodes, blocks = self.sampler.sample_blocks(
            self.g, seeds if ntype is None else {ntype: seeds}, rng=self.rng,
            num_real=n_real,
        )
        return input_nodes, output_nodes, blocks, mask


class NodeDataLoader:
    """Iterates mini-batches of blocks for the given seed node set.

    ``prefetch`` > 0 runs the sampler in a background thread with a bounded
    queue (the TPU-native analog of the reference's num_workers dataloader
    processes; sampling is numpy so threads release the GIL on the hot ops).
    """

    def __init__(self, g, nids, sampler, batch_size: int = 1024,
                 shuffle: bool = True, drop_last: bool = False,
                 prefetch: int = 2, seed: Optional[int] = None,
                 num_workers: int = 1, pull_features=None):
        self.g = g
        # Heterograph seeds: a {ntype: ids} dict with one seed node type
        # (parity: dgl.dataloading.DataLoader on heterographs; multi-ntype
        # seed batching is not supported).
        self.seed_ntype = None
        if isinstance(nids, dict):
            if len(nids) != 1:
                raise ValueError(
                    "hetero NodeDataLoader takes one seed node type")
            self.seed_ntype, nids = next(iter(nids.items()))
        self.nids = np.asarray(nids, dtype=np.int64)
        self.sampler = sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(int(num_workers), 1)
        # Worker-side feature prefetch (DistDGL parity: the reference's
        # dataloader workers pull features alongside sampling): a
        # callable (input_nodes) -> features executed INSIDE the
        # prefetch threads, overlapping the host feature-store pull
        # with both sampling and device compute. When set, iteration
        # yields (inp, out, blocks, mask, feats) 5-tuples.
        self.pull_features = pull_features
        self.collator = NodeCollator(g, sampler, rng=self.rng)

    def __len__(self):
        n = len(self.nids)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        order = (
            self.rng.permutation(len(self.nids)) if self.shuffle
            else np.arange(len(self.nids))
        )
        nids = self.nids[order]
        nb = len(self)
        for i in range(nb):
            yield nids[i * self.batch_size:(i + 1) * self.batch_size]

    def __iter__(self) -> Iterator:
        if self.prefetch <= 0:
            for seeds in self._batches():
                item = self.collator.collate(seeds, self.batch_size,
                                             ntype=self.seed_ntype)
                yield (item + (self.pull_features(item[0]),)
                       if self.pull_features is not None else item)
            return

        # num_workers > 1: strided workers with per-worker bounded queues,
        # consumed round-robin — deterministic batch order, and the C++
        # sampler releases the GIL so workers overlap (the TPU-native
        # analog of the reference dataloader's num_workers processes).
        batches = list(self._batches())
        n_w = min(self.num_workers, max(len(batches), 1))
        # Independent, deterministic RNG stream per batch index.
        seeds_ss = np.random.SeedSequence(
            self.seed if self.seed is not None
            else int(self.rng.integers(1 << 62))
        ).spawn(len(batches))
        stop = object()
        qs = [queue.Queue(maxsize=max(self.prefetch, 1)) for _ in range(n_w)]
        err: list = []

        cancel = threading.Event()

        def put(w, item) -> bool:
            while not cancel.is_set():
                try:
                    qs[w].put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer(w: int):
            try:
                coll = NodeCollator(self.g, self.sampler)
                for i in range(w, len(batches), n_w):
                    if cancel.is_set():
                        return
                    coll.rng = np.random.default_rng(seeds_ss[i])
                    item = coll.collate(batches[i], self.batch_size,
                                        ntype=self.seed_ntype)
                    if self.pull_features is not None:
                        item = item + (self.pull_features(item[0]),)
                    if not put(w, item):
                        return
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                put(w, stop)

        threads = [threading.Thread(target=producer, args=(w,), daemon=True)
                   for w in range(n_w)]
        for t in threads:
            t.start()
        try:
            done = [False] * n_w
            i = 0
            while not all(done):
                w = i % n_w
                i += 1
                if done[w]:
                    continue
                item = qs[w].get()
                if item is stop:
                    done[w] = True
                    continue
                yield item
            if err:
                raise err[0]
        finally:
            # Abandoned mid-iteration (e.g. the consumer breaks): unblock
            # and reap the producers instead of leaking them on a full
            # queue. Swallow interpreter-shutdown join errors.
            cancel.set()
            try:
                for q_ in qs:
                    while not q_.empty():
                        q_.get_nowait()
                for t in threads:
                    t.join(timeout=1.0)
            except Exception:
                pass


# DGL >=0.8 exposes a unified DataLoader name.
DataLoader = NodeDataLoader
