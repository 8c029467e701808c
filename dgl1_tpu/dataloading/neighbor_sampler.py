"""Multi-layer neighbor samplers producing static-shape padded blocks.

Parity: ``python/dgl/dataloading/neighbor.py :: MultiLayerNeighborSampler``
(per layer: ``sample_neighbors`` + ``to_block``, innermost layer first).

TPU-native: every block is padded to a deterministic bound derived from
(batch_size, fanouts) — src count <= dst*(fanout+1), edge count <=
dst*fanout — so every mini-batch of an epoch compiles to ONE XLA program
(the reference's blocks are dynamically sized; XLA would recompile per
batch). This is SURVEY.md §7 design stance #2.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from dgl1_tpu.graph import Graph
from dgl1_tpu.sampling.fused import sample_block_fused, supports_fused
from dgl1_tpu.sampling.neighbor import _etype_fanout, sample_neighbors
from dgl1_tpu.transform import to_block

__all__ = [
    "NeighborSampler",
    "MultiLayerNeighborSampler",
    "MultiLayerFullNeighborSampler",
]


class NeighborSampler:
    """Samples ``len(fanouts)`` layers of blocks for a seed batch."""

    def __init__(self, fanouts: Sequence[int], replace: bool = False,
                 prob: Optional[str] = None, static_shapes: bool = True):
        self.fanouts = list(fanouts)
        self.replace = replace
        self.prob = prob
        self.static_shapes = static_shapes

    def _layer_bounds(self, batch_size: int) -> List[dict]:
        """Deterministic (src, edge) bounds per layer, outermost first."""
        bounds = []
        dst = batch_size
        # Walk outward from the seeds (last fanout is nearest the output).
        for fanout in reversed(self.fanouts):
            if fanout < 0:
                bounds.append(None)  # full neighborhood: no static bound
                dst = None
            elif dst is None:
                bounds.append(None)
            else:
                src = dst * (fanout + 1)
                bounds.append({"src": src, "edges": dst * fanout})
                dst = src
        return list(reversed(bounds))

    def _layer_bounds_hetero(self, g, seed_counts: dict) -> List[dict]:
        """Deterministic per-layer (src-per-ntype, edges-per-etype) bounds
        for the hetero pipeline, outermost first. ``seed_counts``:
        {ntype: padded seed count} of the output layer."""
        bounds = []
        dst = dict(seed_counts)
        for fanout in reversed(self.fanouts):
            edges = {}
            ks = {}
            src = dict(dst)  # dst nodes are included on the src side
            for c in g.canonical_etypes:
                st, _, dt = c
                k = _etype_fanout(fanout, c)
                if k < 0:
                    raise ValueError(
                        "full-neighborhood fanout has no static bound; use "
                        "static_shapes=False")
                e = dst.get(dt, 0) * k
                edges[c] = e
                ks[c] = k
                src[st] = src.get(st, 0) + e
            bounds.append({"src": src, "edges": edges, "k": ks})
            dst = src
        return list(reversed(bounds))

    @staticmethod
    def _filter_hetero_frontier(frontier, exclude_eids):
        """Drop excluded edge ids from a hetero frontier (link-prediction
        leakage guard). ``exclude_eids`` is a per-etype dict keyed by
        canonical etype or etype name (a bare array applies to every
        relation)."""
        from dgl1_tpu.graph import block as _block
        from dgl1_tpu.heterograph import HeteroGraph

        rels = {}
        for c, fr in frontier.rel_graphs.items():
            if isinstance(exclude_eids, dict):
                exc = exclude_eids.get(c, exclude_eids.get(c[1]))
            else:
                exc = exclude_eids
            fe = fr.num_edges()
            if exc is None or fe == 0:
                rels[c] = fr
                continue
            feid = np.asarray(fr.edata["_ID"])[:fe]
            keep = ~np.isin(feid, np.asarray(exc))
            nf = _block(
                (np.asarray(fr.src)[:fe][keep],
                 np.asarray(fr.dst)[:fe][keep]),
                num_src_nodes=fr.num_src_nodes(),
                num_dst_nodes=fr.num_dst_nodes(), formats=("coo",),
            )
            nf.edata["_ID"] = feid[keep].astype(np.int32)
            rels[c] = nf
        return HeteroGraph(rels, dict(frontier._num_nodes))

    def sample_blocks_hetero(self, g, seed_nodes: dict,
                             rng: Optional[np.random.Generator] = None,
                             num_real: Optional[dict] = None,
                             exclude_eids=None):
        """Hetero analog of :meth:`sample_blocks`: ``seed_nodes`` is a
        ``{ntype: ids}`` dict; fanouts entries may be per-etype dicts.
        Returns (input_nodes_dict, output_nodes_dict, blocks) with blocks
        input-side first. Parity: ``MultiLayerNeighborSampler`` on
        heterographs (``python/dgl/dataloading/neighbor.py``).

        ``num_real``: per-ntype count of REAL seeds — entries beyond it
        are static-shape padding (e.g. the collator repeats the last seed
        to fill a partial batch) and are never sampled or relabeled."""
        seed_nodes = {nt: np.asarray(v, dtype=np.int64)
                      for nt, v in seed_nodes.items()}
        bounds = (
            self._layer_bounds_hetero(
                g, {nt: len(v) for nt, v in seed_nodes.items()})
            if self.static_shapes else [None] * len(self.fanouts)
        )
        blocks = []
        seeds = dict(seed_nodes)
        num_real = ({nt: len(v) for nt, v in seeds.items()}
                    if num_real is None else dict(num_real))
        for layer in reversed(range(len(self.fanouts))):
            b = bounds[layer]
            frontier = sample_neighbors(
                g, {nt: v[: num_real[nt]] for nt, v in seeds.items()},
                self.fanouts[layer], prob=self.prob, replace=self.replace,
                rng=rng, formats=("coo",),
            )
            if exclude_eids is not None:
                frontier = self._filter_hetero_frontier(frontier,
                                                        exclude_eids)
            blk = to_block(
                frontier, seeds, num_real_dst=num_real,
                pad_src_to=(b["src"] if b else None),
                pad_edges_to=(b["edges"] if b else None),
                uniform_k=(b["k"] if b else None),
            )
            blocks.insert(0, blk)
            seeds = {nt: np.asarray(blk.srcframes[nt]["_ID"]).astype(
                np.int64) for nt in blk.srctypes}
            num_real = dict(blk.meta["num_real_src"])
        return seeds, seed_nodes, blocks

    def sample_blocks(self, g, seed_nodes,
                      rng: Optional[np.random.Generator] = None,
                      exclude_eids=None, num_real: Optional[int] = None):
        """Returns (input_nodes, output_nodes, blocks) with blocks ordered
        input-side first (parity with the reference).

        ``exclude_eids``: edge ids never sampled into any block (the
        link-prediction leakage guard — parity:
        ``EdgeCollator(exclude=...)``). Exclusion filters the frontier
        edge list, so it takes the numpy sampling path (the fused C++
        sampler has no exclusion).

        ``num_real``: number of REAL seeds; the tail beyond it is
        static-shape padding (a partial batch filled by the collator) and
        is never sampled — repeated pad ids would otherwise alias onto one
        relabeled dst row and corrupt the real seeds' aggregation."""
        from dgl1_tpu.heterograph import HeteroGraph

        if isinstance(g, HeteroGraph):
            nr = None
            if num_real is not None:
                nr = {nt: num_real for nt in seed_nodes}
            return self.sample_blocks_hetero(g, seed_nodes, rng=rng,
                                             num_real=nr,
                                             exclude_eids=exclude_eids)
        seed_nodes = np.asarray(seed_nodes, dtype=np.int64)
        bounds = (
            self._layer_bounds(len(seed_nodes)) if self.static_shapes else
            [None] * len(self.fanouts)
        )
        blocks = []
        # Invariant: ``seeds`` is the (possibly padded) dst array of the
        # block being built; only ``num_real`` prefix entries are real.
        seeds = seed_nodes
        num_real = len(seed_nodes) if num_real is None else int(num_real)
        for layer in reversed(range(len(self.fanouts))):
            fanout = self.fanouts[layer]
            b = bounds[layer]
            if (b is not None and exclude_eids is None
                    and supports_fused(g, fanout, self.prob,
                                       self.replace)):
                # One native pass: sample + relabel + padded block with
                # both ELL directions (sampling/fused.py) — ~10x the
                # numpy pipeline at products scale.
                blk = sample_block_fused(
                    g, seeds, num_real, fanout,
                    pad_src_to=b["src"], pad_edges_to=b["edges"], rng=rng,
                )
                blocks.insert(0, blk)
                seeds = np.asarray(blk.srcdata["_ID"])
                num_real = blk.meta["num_real_src"]
                continue
            # Minimal layouts: the frontier is consumed as an edge list by
            # to_block (COO only); blocks skip the tile descriptors (the
            # device engines for blocks use ELL). Halves host sampling
            # cost per batch (profiled 2026-08-19).
            frontier = sample_neighbors(
                g, seeds[:num_real], fanout, prob=self.prob,
                replace=self.replace, rng=rng, formats=("coo",),
            )
            if exclude_eids is not None and "_ID" in frontier.edata:
                from dgl1_tpu.graph import graph as _graph

                fe = frontier.num_edges()
                feid = np.asarray(frontier.edata["_ID"])[:fe]
                keep = ~np.isin(feid, exclude_eids)
                fsrc = np.asarray(frontier.src)[:fe][keep]
                fdst = np.asarray(frontier.dst)[:fe][keep]
                frontier = _graph((fsrc, fdst),
                                  num_nodes=frontier.num_nodes(),
                                  formats=("coo",))
                import jax.numpy as _jnp

                frontier.edata["_ID"] = _jnp.asarray(
                    feid[keep].astype(np.int32))
            blk = to_block(
                frontier,
                seeds,
                num_real_dst=num_real,
                pad_src_to=(b["src"] if b else None),
                pad_edges_to=(b["edges"] if b else None),
                formats=None if b else ("ell",),
                uniform_k=(fanout if b and fanout > 0 else None),
            )
            eid = frontier.edata.get("_ID")
            if eid is not None:
                eid = np.asarray(eid)[: frontier.num_edges()]
                pad_e = blk.num_edges_padded()
                if pad_e != len(eid):
                    eid = np.concatenate(
                        [eid, np.zeros((pad_e - len(eid),), eid.dtype)])
                blk.edata["_ID"] = eid
            blocks.insert(0, blk)
            seeds = np.asarray(blk.srcdata["_ID"])
            num_real = blk.meta["num_real_src"]
        input_nodes = seeds
        return input_nodes, seed_nodes, blocks


MultiLayerNeighborSampler = NeighborSampler


class MultiLayerFullNeighborSampler(NeighborSampler):
    """All neighbors at every layer (parity:
    ``dgl.dataloading.MultiLayerFullNeighborSampler``)."""

    def __init__(self, num_layers: int):
        super().__init__([-1] * num_layers, static_shapes=False)
