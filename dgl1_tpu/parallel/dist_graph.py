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
    """Global-indexed view over distributed node features (host side).

    Two backings, same ``tensor[nids]`` surface (parity:
    ``dgl.distributed.DistTensor`` / the KVStore pull):

    * ``shards`` — per-partition in-process arrays (single-process pod
      view, or a host that deliberately gathered every shard);
    * ``store`` — a replicated mmap :class:`HostFeatureStore` opened via
      :func:`dgl1_tpu.parallel.partition.load_global_feats`: every host
      pulls ANY node's rows locally (page-cache served), which is how a
      sampler on host A reads features of nodes owned by host B without
      an RPC protocol.
    """

    def __init__(self, book: GraphPartitionBook,
                 shards: Optional[Dict[int, np.ndarray]] = None,
                 name: str = "", store=None):
        if (shards is None) == (store is None):
            raise ValueError("DistTensor takes exactly one of shards/store")
        self.book = book
        self.shards = (None if shards is None else
                       {p: np.asarray(v) for p, v in shards.items()})
        self.store = store
        self.name = name

    @property
    def shape(self):
        if self.store is not None:
            return tuple(self.store.shape)
        first = next(iter(self.shards.values()))
        return (self.book.num_nodes(),) + first.shape[1:]

    def __getitem__(self, nids) -> np.ndarray:
        nids = np.asarray(nids)
        if self.store is not None:
            return self.store.pull(nids)
        parts = self.book.nid2partid(nids)
        local = self.book.nid2localnid(nids)
        first = next(iter(self.shards.values()))
        out = np.zeros((len(nids),) + first.shape[1:], dtype=first.dtype)
        for p in np.unique(parts):
            m = parts == p
            out[m] = self.shards[int(p)][local[m]]
        return out

    def __setitem__(self, nids, value):
        if self.store is not None:
            raise TypeError(
                "store-backed DistTensor is read-only (the replicated mmap "
                "is shared across hosts); write via the partition artifacts")
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

    def __init__(self, g, num_parts: int,
                 part: Optional[np.ndarray] = None,
                 part_method: Optional[str] = None):
        from dgl1_tpu.heterograph import HeteroGraph
        from dgl1_tpu.parallel.partition import (
            greedy_partition_assignment,
            random_partition_assignment,
        )

        if isinstance(g, HeteroGraph):
            # Typed facade (parity: DistGraph over a DGLHeteroGraph):
            # per-ntype books + DistTensors; partitioned() returns the
            # typed halo plan.
            from dgl1_tpu.parallel.hetero import (
                hetero_partition_assignment)

            if part is None:
                # None = per-facade default ('metis' for hetero, 'greedy'
                # for homo); an EXPLICIT method is honored as given.
                part = hetero_partition_assignment(
                    g, num_parts,
                    part_method=part_method or "metis")
            self.g = g
            self.hetero = True
            self.part = part
            self.num_parts = num_parts
            self.part_id = None
            self._pg = None
            self.books = {nt: GraphPartitionBook(part[nt], num_parts)
                          for nt in g.ntypes}
            self.book = None
            self.ndata = {}
            for nt in g.ntypes:
                for k, v in g.nframes[nt].items():
                    arr = np.asarray(v)
                    shards = {p: arr[self.books[nt].partid2nids(p)]
                              for p in range(num_parts)}
                    self.ndata.setdefault(nt, {})[k] = DistTensor(
                        self.books[nt], shards, name=f"{nt}/{k}")
            return
        self.hetero = False
        if part is None:
            if part_method == "random":
                part = random_partition_assignment(g, num_parts)
            elif part_method == "metis":
                from dgl1_tpu.parallel.partition import (
                    metis_partition_assignment)

                part = metis_partition_assignment(g, num_parts)
            elif part_method in (None, "greedy"):
                part = greedy_partition_assignment(g, num_parts)
            else:
                raise ValueError(f"unknown part_method {part_method!r}")
        self.g = g
        self.book = GraphPartitionBook(part, num_parts)
        self.part = np.asarray(part)
        self.num_parts = num_parts
        self.part_id: Optional[int] = None
        self._pg: Optional[PartitionedGraph] = None
        self.ndata: Dict[str, DistTensor] = {}
        for k, v in g.ndata.items():
            arr = np.asarray(v)
            shards = {
                p: arr[self.book.partid2nids(p)] for p in range(num_parts)
            }
            self.ndata[k] = DistTensor(self.book, shards, name=k)

    @classmethod
    def from_partition(cls, out_path: str, graph_name: str, part_id: int,
                       formats=("csc",)) -> "DistGraph":
        """Per-host view from :func:`partition_graph` artifacts: the full
        structure (replicated — ~2 int32/edge) for sampling any seed, the
        partition book, and ndata as read-only replicated-mmap
        DistTensors (the KVStore-pull replacement). ``part_id`` is this
        host's partition; its train shard is
        ``book.partid2nids(part_id)``."""
        import json as _json
        from pathlib import Path

        from dgl1_tpu.graph import graph as make_graph
        from dgl1_tpu.parallel.partition import load_global_feats

        out = Path(out_path)
        with open(out / f"{graph_name}.json") as f:
            meta = _json.load(f)
        with np.load(out / f"{graph_name}_structure.npz") as z:
            g = make_graph((z["src"], z["dst"]),
                           num_nodes=int(z["num_nodes"][0]),
                           formats=formats)
        part = np.load(out / "node_part.npy")
        obj = cls.__new__(cls)
        obj.hetero = False
        obj.g = g
        obj.book = GraphPartitionBook(part, int(meta["num_parts"]))
        obj.part = part
        obj.num_parts = int(meta["num_parts"])
        obj.part_id = int(part_id)
        obj._pg = None
        obj.ndata = {
            k: DistTensor(obj.book, store=st, name=k)
            for k, st in load_global_feats(out_path, graph_name).items()
        }
        return obj

    @classmethod
    def from_hetero_partition(cls, out_path: str, graph_name: str,
                              part_id: int) -> "DistGraph":
        """Per-host typed view from :func:`partition_hetero_graph`
        artifacts: the local [owned | halo] heterograph, per-ntype books
        from the saved assignment, and per-ntype feature shards (owned
        rows of this part). ``part_id`` is this host's partition."""
        from dgl1_tpu.parallel.hetero import load_hetero_partition

        lg, feats, book = load_hetero_partition(out_path, graph_name,
                                                part_id)
        part = book["part_assignment"]
        num_parts = int(book["num_parts"])
        obj = cls.__new__(cls)
        obj.hetero = True
        obj.g = lg
        obj.part = part
        obj.num_parts = num_parts
        obj.part_id = int(part_id)
        obj._pg = None
        obj.books = {nt: GraphPartitionBook(part[nt], num_parts)
                     for nt in book["ntypes"]}
        obj.book = None
        obj._global_num_nodes = dict(book["num_nodes"])
        obj._global_num_edges = dict(book["num_edges"])
        obj.ndata = {}
        for nt, frame in feats.items():
            for k, v in frame.items():
                obj.ndata.setdefault(nt, {})[k] = DistTensor(
                    obj.books[nt], {part_id: np.asarray(v)},
                    name=f"{nt}/{k}")
        return obj

    def num_nodes(self, ntype: Optional[str] = None) -> int:
        if getattr(self, "hetero", False):
            counts = getattr(self, "_global_num_nodes", None)
            if counts is not None:  # per-host view: local g != global
                if ntype is None:
                    return sum(counts.values())
                return counts[ntype]
            return self.g.num_nodes(ntype)
        return self.g.num_nodes()

    def num_edges(self, etype=None) -> int:
        """Global edge totals — same scope as :meth:`num_nodes` (a
        per-host hetero view reports the GLOBAL counts persisted in the
        partition book, not the local [owned|halo] graph's)."""
        counts = getattr(self, "_global_num_edges", None)
        if counts is not None:
            if etype is None:
                return sum(counts.values())
            if isinstance(etype, tuple):
                etype = "/".join(etype)
            if etype in counts:
                return counts[etype]
            # Bare relation name: match the middle component.
            hits = [v for k, v in counts.items()
                    if k.split("/")[1] == etype]
            if len(hits) != 1:
                raise KeyError(f"etype {etype!r} is absent or ambiguous")
            return hits[0]
        if etype is not None and getattr(self, "hetero", False):
            return self.g[etype].num_edges()
        return self.g.num_edges()

    def get_partition_book(self, ntype: Optional[str] = None):
        if getattr(self, "hetero", False):
            if ntype is None:
                return self.books
            return self.books[ntype]
        return self.book

    def partitioned(self, **kw):
        """Device-resident halo-plan structure (cached); typed plan
        (:class:`PartitionedHeteroGraph`) for hetero facades."""
        if self._pg is None:
            if getattr(self, "hetero", False):
                if getattr(self, "_global_num_nodes", None) is not None:
                    raise ValueError(
                        "partitioned() needs the full heterograph; this "
                        "is a per-host view (from_hetero_partition). "
                        "Build the plan once from the full graph and "
                        "ship it, or construct DistGraph(hg, k) in the "
                        "pod-view process.")
                from dgl1_tpu.parallel.hetero import (
                    build_partitioned_hetero)

                self._pg = build_partitioned_hetero(
                    self.g, self.part, self.num_parts, **kw)
            else:
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
