"""Graph traversal frontiers (parity: ``src/graph/traversal.cc`` +
``python/dgl/traversal.py``). Host-side numpy; returns per-level frontiers
like the reference's generators."""

from __future__ import annotations

from typing import List

import numpy as np

from dgl1_tpu.graph import Graph

__all__ = ["bfs_nodes_generator", "bfs_edges_generator",
           "topological_nodes_generator", "dfs_edges_generator"]


def _csr(g: Graph):
    return np.asarray(g.csr_indptr), np.asarray(g.csr_dst)


def bfs_nodes_generator(g: Graph, source) -> List[np.ndarray]:
    """BFS node frontiers from ``source`` (parity:
    ``dgl.bfs_nodes_generator``)."""
    indptr, nbr = _csr(g)
    visited = np.zeros(g.num_nodes(), dtype=bool)
    frontier = np.unique(np.atleast_1d(np.asarray(source, dtype=np.int64)))
    visited[frontier] = True
    out = []
    while len(frontier):
        out.append(frontier)
        nxt = []
        for u in frontier:
            nxt.append(nbr[indptr[u]:indptr[u + 1]])
        nxt = np.unique(np.concatenate(nxt)) if nxt else np.array([], np.int64)
        nxt = nxt[~visited[nxt]]
        visited[nxt] = True
        frontier = nxt
    return out


def bfs_edges_generator(g: Graph, source) -> List[np.ndarray]:
    """BFS edge frontiers: edges that first reach each level."""
    indptr, nbr = _csr(g)
    eids_sorted = np.asarray(g.csr_eid)
    visited = np.zeros(g.num_nodes(), dtype=bool)
    frontier = np.unique(np.atleast_1d(np.asarray(source, dtype=np.int64)))
    visited[frontier] = True
    out = []
    while len(frontier):
        lvl_edges = []
        nxt_nodes = []
        for u in frontier:
            lo, hi = indptr[u], indptr[u + 1]
            for j in range(lo, hi):
                v = nbr[j]
                if not visited[v]:
                    visited[v] = True
                    lvl_edges.append(eids_sorted[j])
                    nxt_nodes.append(v)
        if lvl_edges:
            out.append(np.asarray(lvl_edges, dtype=np.int64))
        frontier = np.asarray(nxt_nodes, dtype=np.int64)
    return out


def topological_nodes_generator(g: Graph) -> List[np.ndarray]:
    """Topological frontiers (Kahn's algorithm) — parity:
    ``dgl.topological_nodes_generator``."""
    indptr, nbr = _csr(g)
    indeg = np.asarray(g.in_degrees()).copy()
    frontier = np.nonzero(indeg == 0)[0]
    out = []
    seen = 0
    while len(frontier):
        out.append(frontier)
        seen += len(frontier)
        nxt = []
        for u in frontier:
            for v in nbr[indptr[u]:indptr[u + 1]]:
                indeg[v] -= 1
                if indeg[v] == 0:
                    nxt.append(v)
        frontier = np.unique(np.asarray(nxt, dtype=np.int64)) if nxt else (
            np.array([], np.int64))
    if seen != g.num_nodes():
        raise ValueError("graph has a cycle")
    return out


def dfs_edges_generator(g: Graph, source) -> List[np.ndarray]:
    """DFS edge order from source (one edge per step, parity-lite)."""
    indptr, nbr = _csr(g)
    eids_sorted = np.asarray(g.csr_eid)
    visited = np.zeros(g.num_nodes(), dtype=bool)
    stack = [int(s) for s in np.atleast_1d(np.asarray(source))][::-1]
    for s in stack:
        visited[s] = True
    order = []
    while stack:
        u = stack.pop()
        for j in range(indptr[u + 1] - 1, indptr[u] - 1, -1):
            v = nbr[j]
            if not visited[v]:
                visited[v] = True
                order.append(eids_sorted[j])
                stack.append(v)
    return [np.asarray([e], dtype=np.int64) for e in order]
