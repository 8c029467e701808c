"""DistGraph / DistTensor facade.

Parity: ``python/dgl/distributed/dist_graph.py`` / ``dist_tensor.py`` —
but with no servers and no RPC. On a TPU pod each host process owns its
partitions' shards directly; global-id reads are local numpy gathers
against the partition layout, and device-side access goes through
:class:`~dgl1_tpu.parallel.halo.PartitionedGraph`'s static halo plan
instead of KVStore pulls. (The socket-RPC sampler service of DistDGL is
replaced by each host sampling its own partition — see
``models/train_dist.py``.)
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dgl1_tpu.graph import Graph
from dgl1_tpu.parallel.graph_partition_book import GraphPartitionBook
from dgl1_tpu.parallel.halo import PartitionedGraph, build_partitioned_graph

__all__ = ["DistGraph", "DistTensor"]


class DistTensor:
    """Global-indexed view over per-partition shards (host side)."""

    def __init__(self, book: GraphPartitionBook, shards: Dict[int, np.ndarray],
                 name: str = ""):
        self.book = book
        self.shards = {p: np.asarray(v) for p, v in shards.items()}
        self.name = name

    @property
    def shape(self):
        first = next(iter(self.shards.values()))
        return (self.book.num_nodes(),) + first.shape[1:]

    def __getitem__(self, nids) -> np.ndarray:
        nids = np.asarray(nids)
        parts = self.book.nid2partid(nids)
        local = self.book.nid2localnid(nids)
        first = next(iter(self.shards.values()))
        out = np.zeros((len(nids),) + first.shape[1:], dtype=first.dtype)
        for p in np.unique(parts):
            m = parts == p
            out[m] = self.shards[int(p)][local[m]]
        return out

    def __setitem__(self, nids, value):
        nids = np.asarray(nids)
        value = np.asarray(value)
        parts = self.book.nid2partid(nids)
        local = self.book.nid2localnid(nids)
        for p in np.unique(parts):
            m = parts == p
            self.shards[int(p)][local[m]] = value[m]


class DistGraph:
    """Partitioned-graph facade with DGL-like accessors.

    Construct from a full graph + partition count (single-process pod
    view), or from ``load_partition`` artifacts per host.
    """

    def __init__(self, g: Graph, num_parts: int,
                 part: Optional[np.ndarray] = None,
                 part_method: str = "greedy"):
        from dgl1_tpu.parallel.partition import (
            greedy_partition_assignment,
            random_partition_assignment,
        )

        if part is None:
            if part_method == "random":
                part = random_partition_assignment(g, num_parts)
            else:
                part = greedy_partition_assignment(g, num_parts)
        self.g = g
        self.book = GraphPartitionBook(part, num_parts)
        self.part = np.asarray(part)
        self.num_parts = num_parts
        self._pg: Optional[PartitionedGraph] = None
        self.ndata: Dict[str, DistTensor] = {}
        for k, v in g.ndata.items():
            arr = np.asarray(v)
            shards = {
                p: arr[self.book.partid2nids(p)] for p in range(num_parts)
            }
            self.ndata[k] = DistTensor(self.book, shards, name=k)

    def num_nodes(self) -> int:
        return self.g.num_nodes()

    def num_edges(self) -> int:
        return self.g.num_edges()

    def get_partition_book(self) -> GraphPartitionBook:
        return self.book

    def partitioned(self, **kw) -> PartitionedGraph:
        """Device-resident halo-plan structure (cached)."""
        if self._pg is None:
            self._pg = build_partitioned_graph(
                self.g, self.part, self.num_parts, **kw
            )
        return self._pg

    def local_graph(self, part_id: int) -> Graph:
        """The destination-owned subgraph of one partition, in global ids."""
        from dgl1_tpu.transform import edge_subgraph

        e = self.g.num_edges()
        dst = np.asarray(self.g.dst)[:e]
        eids = np.nonzero(self.part[dst] == part_id)[0]
        return edge_subgraph(self.g, eids, relabel_nodes=False)
