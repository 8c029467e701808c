"""SST (Stanford Sentiment Treebank) — offline synthetic fallback.

Parity: ``python/dgl/data/tree.py :: SSTDataset`` (constituency trees,
edges child -> parent, per-node 5-class sentiment labels, leaf nodes carry
word ids, ``mask`` marks leaves). No network access here, so trees are
generated synthetically with the same schema and a learnable signal: each
vocabulary word carries a latent polarity; an interior node's sentiment is
a noisy bounded sum of its children's — the compositional structure a
Tree-LSTM exploits and a bag-of-words baseline cannot fully.
"""

from __future__ import annotations

from typing import List

import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["SSTDataset"]

PAD_WORD = -1


class SSTDataset:
    """Each item is a tree ``Graph`` with ``ndata['x']`` (int word id,
    0 for interior nodes), ``ndata['y']`` (int sentiment class) and
    ``ndata['mask']`` (1.0 for leaves)."""

    num_classes = 5

    def __init__(self, mode: str = "train", vocab_size: int = 1000,
                 num_trees: int = None, seed: int = 0):
        self.mode = mode
        self.vocab_size = vocab_size
        if num_trees is None:
            num_trees = {"train": 800, "dev": 100, "test": 100}.get(mode, 100)
        rng = np.random.default_rng(
            seed + {"train": 0, "dev": 1, "test": 2}.get(mode, 3))
        # Latent word polarity in [-1, 1]; shared across splits via seed.
        pol_rng = np.random.default_rng(seed + 1234)
        self._polarity = pol_rng.uniform(-1.0, 1.0, size=vocab_size)
        self.trees: List[Graph] = []
        for _ in range(num_trees):
            self.trees.append(self._gen_tree(rng))

    @property
    def vocab(self):
        return {f"w{i}": i for i in range(self.vocab_size)}

    def _gen_tree(self, rng) -> Graph:
        n_leaves = int(rng.integers(3, 12))
        # Random binary merge order (constituency-style): repeatedly merge
        # two adjacent spans until one root remains.
        nodes = []  # (score,) per node id
        tokens = []
        spans = []
        for _ in range(n_leaves):
            t = int(rng.integers(0, self.vocab_size))
            tokens.append(t)
            nodes.append(self._polarity[t])
            spans.append(len(nodes) - 1)
        src, dst = [], []
        while len(spans) > 1:
            i = int(rng.integers(0, len(spans) - 1))
            a, b = spans[i], spans[i + 1]
            score = np.tanh(nodes[a] + nodes[b]
                            + rng.normal(0, 0.1))
            parent = len(nodes)
            nodes.append(score)
            tokens.append(0)
            src += [a, b]
            dst += [parent, parent]
            spans[i:i + 2] = [parent]
        n = len(nodes)
        g = graph((np.asarray(src), np.asarray(dst)), num_nodes=n)
        import jax.numpy as jnp

        scores = np.asarray(nodes)
        # 5-way bucketize, SST-style.
        y = np.digitize(scores, [-0.6, -0.2, 0.2, 0.6]).astype(np.int32)
        is_leaf = np.zeros(n, np.float32)
        is_leaf[:0] = 0
        leaf_ids = np.setdiff1d(np.arange(n), np.asarray(dst))
        is_leaf[leaf_ids] = 1.0
        g.ndata["x"] = jnp.asarray(np.asarray(tokens, np.int32))
        g.ndata["y"] = jnp.asarray(y)
        g.ndata["mask"] = jnp.asarray(is_leaf)
        return g

    def __len__(self):
        return len(self.trees)

    def __getitem__(self, i):
        return self.trees[i]
