"""DistDataLoader: sampled mini-batch loading against a DistGraph.

Parity: ``python/dgl/distributed/dist_dataloader.py``. The reference
forwards sampling RPCs to graph servers; here each host holds the full
structure (structure is ~2 int32/edge — features dominate memory) and
samples locally, while FEATURES stay sharded in the DistTensor layout and
are gathered per batch. The network hop of DistDGL's KVStore pull becomes
a local shard gather (single host) or an all_to_all at the device level.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from dgl1_tpu.dataloading.dataloader import NodeDataLoader
from dgl1_tpu.parallel.dist_graph import DistGraph

__all__ = ["DistDataLoader", "DistNodeDataLoader"]


class DistNodeDataLoader:
    """Yields (input_nodes, output_nodes, blocks, mask, feats) where feats
    are gathered from the distributed feature shards."""

    def __init__(self, dist_g: DistGraph, nids, sampler, feat_name="feat",
                 batch_size: int = 1024, shuffle: bool = True,
                 seed: Optional[int] = None, **kw):
        self.dist_g = dist_g
        self.feat_name = feat_name
        self.loader = NodeDataLoader(
            dist_g.g, nids, sampler, batch_size=batch_size, shuffle=shuffle,
            seed=seed, **kw,
        )

    def __len__(self):
        return len(self.loader)

    def __iter__(self) -> Iterator:
        feat = self.dist_g.ndata[self.feat_name]
        for inp, out, blocks, mask in self.loader:
            x = feat[np.asarray(inp)]
            yield inp, out, blocks, mask, x


DistDataLoader = DistNodeDataLoader
