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


def load_qm7b_raw(path, num_molecules=None):
    """Parse the ``qm7b.mat`` layout (parity: ``python/dgl/data/qm7b.py``):
    ``X`` (M, 23, 23) Coulomb matrices, ``T`` (M, 14) targets. Edges =
    nonzero off-diagonal Coulomb entries (weight in ``edata['w']``);
    diagonal 0.5*Z^2.4 recovers the charge node feature; zero-padded
    rows are absent atoms."""
    import jax.numpy as jnp
    from scipy.io import loadmat

    from dgl1_tpu.graph import graph as _graph

    mat = loadmat(path)
    X = np.asarray(mat["X"], np.float32)
    T = np.asarray(mat["T"], np.float32)
    m = len(X) if num_molecules is None else min(len(X), num_molecules)
    graphs = []
    for i in range(m):
        cm = X[i]
        diag = np.diag(cm)
        n = int(np.count_nonzero(diag))
        cm = cm[:n, :n]
        z = (2.0 * diag[:n]) ** (1.0 / 2.4)
        s, d = np.nonzero(cm - np.diag(np.diag(cm)))
        g = _graph((s.astype(np.int64), d.astype(np.int64)), num_nodes=n)
        g.ndata["charge"] = jnp.asarray(z.astype(np.float32)[:, None])
        g.edata["w"] = jnp.asarray(cm[s, d][:, None])
        graphs.append(g)
    return graphs, T[:m]


class QM7bDataset:
    """Coulomb-matrix molecule regression, 14 targets (parity:
    ``dgl.data.QM7bDataset``). A real ``qm7b.mat`` in ``raw_dir`` is
    parsed when present; otherwise a synthetic fallback
    (``is_synthetic=True``)."""

    num_tasks = 14

    def __init__(self, num_molecules: int = 512, seed: int = 0,
                 raw_dir=None):
        from pathlib import Path

        from dgl1_tpu.data.base import data_dir

        rd = Path(raw_dir) if raw_dir else data_dir() / "qm7b"
        if (rd / "qm7b.mat").exists():
            self.is_synthetic = False
            self.graphs, self.labels = load_qm7b_raw(
                rd / "qm7b.mat", num_molecules=num_molecules)
            return
        self.is_synthetic = True
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


def load_qm9_raw(path, label_keys: Sequence[str], cutoff: float = 5.0,
                 num_molecules=None):
    """Parse the ``qm9_eV.npz`` layout (parity: ``python/dgl/data/qm9.py``
    download): keys ``N`` (atoms per molecule), ``R`` (sum(N), 3)
    positions, ``Z`` (sum(N),) atomic numbers, plus one (M,) array per
    property. Graphs are complete within ``cutoff`` distance (the
    reference's edge rule), with ``pos``/``charge`` node data and
    ``dist`` edge data."""
    import jax.numpy as jnp

    from dgl1_tpu.graph import graph as _graph

    with np.load(path) as z:
        counts = z["N"].astype(np.int64)
        R = z["R"].astype(np.float32)
        Z = z["Z"].astype(np.float32)
        targets = np.stack([z[k].astype(np.float32) for k in label_keys],
                           axis=1)
    offsets = np.zeros(len(counts) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    m = len(counts) if num_molecules is None else min(
        len(counts), num_molecules)
    graphs, labels = [], []
    for i in range(m):
        lo, n = offsets[i], int(counts[i])
        pos = R[lo: lo + n]
        zch = Z[lo: lo + n]
        us, vs = np.meshgrid(np.arange(n), np.arange(n))
        mask = us != vs
        s, d = us[mask].astype(np.int64), vs[mask].astype(np.int64)
        r = np.linalg.norm(pos[s] - pos[d], axis=1)
        keep = r < cutoff
        s, d, r = s[keep], d[keep], r[keep]
        g = _graph((s, d), num_nodes=n)
        g.ndata["pos"] = jnp.asarray(pos)
        g.ndata["charge"] = jnp.asarray(zch[:, None])
        g.edata["dist"] = jnp.asarray(r.astype(np.float32)[:, None])
        graphs.append(g)
        labels.append(targets[i])
    return graphs, np.asarray(labels, np.float32)


class QM9Dataset:
    """QM9 molecule regression (parity: ``dgl.data.QM9Dataset``): select
    targets via ``label_keys`` from the standard 12. A real
    ``qm9_eV.npz`` in ``raw_dir`` is parsed when present; otherwise a
    synthetic fallback (``is_synthetic=True``)."""

    def __init__(self, label_keys: Sequence[str] = ("mu",),
                 num_molecules: int = 512, cutoff: float = 5.0,
                 seed: int = 0, raw_dir=None):
        from pathlib import Path

        from dgl1_tpu.data.base import data_dir

        unknown = set(label_keys) - set(_QM9_KEYS)
        if unknown:
            raise ValueError(f"unknown QM9 label keys {sorted(unknown)}")
        self.label_keys = list(label_keys)
        rd = Path(raw_dir) if raw_dir else data_dir() / "qm9"
        if (rd / "qm9_eV.npz").exists():
            self.is_synthetic = False
            self.graphs, self.labels = load_qm9_raw(
                rd / "qm9_eV.npz", self.label_keys, cutoff=cutoff,
                num_molecules=num_molecules)
            return
        self.is_synthetic = True
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
