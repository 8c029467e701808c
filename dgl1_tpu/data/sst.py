"""SST (Stanford Sentiment Treebank).

Parity: ``python/dgl/data/tree.py :: SSTDataset`` (constituency trees,
edges child -> parent, per-node 5-class sentiment labels, leaf nodes carry
word ids, ``mask`` marks leaves). Real PTB tree files
(``{train,dev,test}.txt``) in ``raw_dir`` are parsed when present;
otherwise trees are generated synthetically (``is_synthetic=True``) with
the same schema and a learnable signal: each vocabulary word carries a
latent polarity; an interior node's sentiment is a noisy bounded sum of
its children's — the compositional structure a Tree-LSTM exploits and a
bag-of-words baseline cannot fully.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["SSTDataset"]

PAD_WORD = -1


def _parse_ptb_tree(line: str):
    """One PTB s-expression ``(3 (2 It) (4 ...))`` -> (parents, labels,
    words): node ids in first-open-paren order; ``words[i]`` is None for
    interior nodes."""
    parents, labels, words = [], [], []
    stack = []  # open node ids
    tok = ""
    i = 0
    n = len(line)
    while i < n:
        ch = line[i]
        if ch == "(":
            # New node: its label is the next whitespace-delimited token.
            j = i + 1
            while j < n and not line[j].isspace():
                j += 1
            nid = len(parents)
            parents.append(stack[-1] if stack else -1)
            labels.append(int(line[i + 1: j]))
            words.append(None)
            stack.append(nid)
            i = j
        elif ch == ")":
            if tok:
                words[stack[-1]] = tok
                tok = ""
            stack.pop()
            i += 1
        elif ch.isspace():
            if tok:
                words[stack[-1]] = tok
                tok = ""
            i += 1
        else:
            tok += ch
            i += 1
    return parents, labels, words


def load_sst_raw(raw_dir, mode: str,
                 vocab: Optional[Dict[str, int]] = None):
    """Parse ``{mode}.txt`` PTB trees (parity: the reference's
    ``trees/{train,dev,test}.txt`` layout). ``vocab``: word -> id; built
    from this file when absent (token order of first appearance;
    reference uses ``vocab.txt`` when shipped). Returns (trees, vocab)
    with the reference schema: ``x`` word id (PAD for interior), ``y``
    label, ``mask`` 1.0 for leaves, edges child -> parent."""
    import jax.numpy as jnp

    raw_dir = Path(raw_dir)
    vocab_file = raw_dir / "vocab.txt"
    frozen = vocab is not None and len(vocab) > 0
    if vocab is None:
        if vocab_file.exists():
            vocab = {}
            with open(vocab_file) as f:
                for line in f:
                    w = line.strip()
                    if w:
                        vocab[w] = len(vocab)
            frozen = True  # the shipped vocab covers every split
        else:
            vocab = {}
    trees = []
    with open(raw_dir / f"{mode}.txt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parents, labels, words = _parse_ptb_tree(line)
            n = len(parents)
            src = [i for i in range(n) if parents[i] >= 0]
            dst = [parents[i] for i in src]
            g = graph((np.asarray(src, np.int64),
                       np.asarray(dst, np.int64)), num_nodes=n)
            x = np.full(n, 0, np.int32)
            mask = np.zeros(n, np.float32)
            for i, w in enumerate(words):
                if w is not None:
                    if w not in vocab:
                        if frozen:
                            # OOV under a shared/shipped vocab folds to id
                            # 0 (UNK) instead of growing past the train
                            # vocab (embedding tables are sized from it).
                            x[i] = 0
                            mask[i] = 1.0
                            continue
                        vocab[w] = len(vocab)
                    x[i] = vocab[w]
                    mask[i] = 1.0
            g.ndata["x"] = jnp.asarray(x)
            g.ndata["y"] = jnp.asarray(np.asarray(labels, np.int32))
            g.ndata["mask"] = jnp.asarray(mask)
            trees.append(g)
    return trees, vocab


class SSTDataset:
    """Each item is a tree ``Graph`` with ``ndata['x']`` (int word id,
    0 for interior nodes), ``ndata['y']`` (int sentiment class) and
    ``ndata['mask']`` (1.0 for leaves)."""

    num_classes = 5

    def __init__(self, mode: str = "train", vocab_size: int = 1000,
                 num_trees: int = None, seed: int = 0,
                 raw_dir: Optional[str] = None,
                 vocab: Optional[Dict[str, int]] = None):
        from dgl1_tpu.data.base import data_dir

        self.mode = mode
        rd = Path(raw_dir) if raw_dir else data_dir() / "sst"
        if (rd / f"{mode}.txt").exists():
            self.is_synthetic = False
            if (vocab is None and mode != "train"
                    and not (rd / "vocab.txt").exists()
                    and (rd / "train.txt").exists()):
                # Auto-share the train split's vocab: per-split
                # first-appearance maps disagree across files, and test
                # ids could exceed the train vocab size (ADVICE r3).
                _, vocab = load_sst_raw(rd, "train")
            self.trees, self._vocab = load_sst_raw(rd, mode, vocab=vocab)
            self.vocab_size = len(self._vocab)
            return
        self.is_synthetic = True
        self._vocab = None
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
        if self._vocab is not None:
            return self._vocab
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
