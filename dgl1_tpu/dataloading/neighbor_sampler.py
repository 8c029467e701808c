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
from dgl1_tpu.sampling.neighbor import sample_neighbors
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

    def sample_blocks(self, g: Graph, seed_nodes,
                      rng: Optional[np.random.Generator] = None,
                      exclude_eids=None):
        """Returns (input_nodes, output_nodes, blocks) with blocks ordered
        input-side first (parity with the reference).

        ``exclude_eids``: edge ids never sampled into any block (the
        link-prediction leakage guard — parity:
        ``EdgeCollator(exclude=...)``). Exclusion filters the frontier
        edge list, so it takes the numpy sampling path (the fused C++
        sampler has no exclusion)."""
        seed_nodes = np.asarray(seed_nodes, dtype=np.int64)
        bounds = (
            self._layer_bounds(len(seed_nodes)) if self.static_shapes else
            [None] * len(self.fanouts)
        )
        blocks = []
        # Invariant: ``seeds`` is the (possibly padded) dst array of the
        # block being built; only ``num_real`` prefix entries are real.
        seeds = seed_nodes
        num_real = len(seed_nodes)
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
                formats=("ell",),
            )
            eid = frontier.edata.get("_ID")
            if eid is not None:
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
