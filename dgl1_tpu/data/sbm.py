"""Stochastic-block-model mixture dataset (community detection).

Parity: ``python/dgl/data/sbm.py :: SBMMixtureDataset`` — the LGNN
example's training data. Fully synthetic upstream too (graphs are drawn
from an SBM on the fly), so this is exact-parity offline. Each item is
``(graph, line_graph, pm_pd)`` like the reference: the graph, its line
graph (edge adjacency, no backtracking), and the (N, 2E) incidence
factor ``Pm+Pd`` LGNN uses to lift node signals onto edges.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from dgl1_tpu.graph import Graph, graph
from dgl1_tpu.transform import line_graph

__all__ = ["SBMMixtureDataset"]


def _sbm_graph(n_nodes: int, n_communities: int, p: float, q: float, rng):
    """Draw an undirected SBM with intra-prob p, inter-prob q."""
    comm = np.repeat(np.arange(n_communities),
                     n_nodes // n_communities)[:n_nodes]
    if comm.shape[0] < n_nodes:
        comm = np.concatenate(
            [comm, rng.integers(0, n_communities, n_nodes - comm.shape[0])])
    us, vs = np.triu_indices(n_nodes, k=1)
    prob = np.where(comm[us] == comm[vs], p, q)
    keep = rng.random(us.shape[0]) < prob
    s, d = us[keep], vs[keep]
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    return src, dst, comm


class SBMMixtureDataset:
    """``SBMMixtureDataset(n_graphs, n_nodes, n_communities)`` (parity:
    ``dgl.data.SBMMixtureDataset``). ``avg_deg`` controls p/q via the
    standard (c + lambda*sqrt(c), c - lambda*sqrt(c)) mixture."""

    def __init__(self, n_graphs: int, n_nodes: int, n_communities: int,
                 avg_deg: float = 3.0, pq="Appendix_C",
                 pad_multiple: int = 256, seed: int = 0):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        self.graphs: List[Graph] = []
        self.line_graphs: List[Graph] = []
        self.pm_pds: List[np.ndarray] = []
        self.labels: List[np.ndarray] = []
        for _ in range(n_graphs):
            # pq: "Appendix_C" draws the SNR lambda per graph like the
            # reference; a number fixes lambda directly.
            lam = (rng.uniform(0.5, 2.0) if pq == "Appendix_C"
                   else float(pq))
            c = avg_deg
            p = min((c + lam * np.sqrt(c)) / n_nodes * n_communities, 1.0)
            q = max((c - lam * np.sqrt(c)) / n_nodes * n_communities, 0.0)
            src, dst, comm = _sbm_graph(n_nodes, n_communities, p, q, rng)
            # Pad graph and line graph to bucketed static sizes so one
            # compiled train step serves the whole mixture (the reference
            # re-traces per graph; XLA must not).
            def _round(x, m):
                return max((int(x) + m - 1) // m * m, m)

            e = int(src.shape[0])
            e_pad = _round(e, pad_multiple)
            g_real = graph((src, dst), num_nodes=n_nodes)
            g = graph((src, dst), num_nodes=n_nodes, pad_edges_to=e_pad)
            lg_real = line_graph(g_real, backtracking=False)
            le = lg_real.num_edges()
            ls = np.asarray(lg_real.src)[:le]
            ld = np.asarray(lg_real.dst)[:le]
            # Line-graph edge counts spread ~degree^2: bucket 4x coarser
            # so the whole mixture shares a handful of compiled shapes.
            lg = graph((ls, ld), num_nodes=e_pad,
                       pad_edges_to=_round(le, 4 * pad_multiple))
            # pm_pd: (N, E_pad) incidence with +1 at src, +1 at dst per
            # edge column (Pm + Pd), stored dense (zero for padding) —
            # LGNN multiplies it once per layer: a plain MXU matmul.
            pm_pd = np.zeros((n_nodes, e_pad), np.float32)
            pm_pd[np.asarray(src), np.arange(e)] += 1.0
            pm_pd[np.asarray(dst), np.arange(e)] += 1.0
            self.graphs.append(g)
            self.line_graphs.append(lg)
            self.pm_pds.append(jnp.asarray(pm_pd))
            self.labels.append(comm)

    def __len__(self):
        return len(self.graphs)

    def __getitem__(self, i) -> Tuple[Graph, Graph, object]:
        return self.graphs[i], self.line_graphs[i], self.pm_pds[i]
