"""GraphPartitionBook: global-id <-> (partition, local-id) mapping.

Parity: ``python/dgl/distributed/graph_partition_book.py``. The reference
uses contiguous id ranges after reshuffling; here the assignment array is
kept explicitly (simpler, no reshuffle) with O(1) vectorized lookups.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["GraphPartitionBook"]


class GraphPartitionBook:
    def __init__(self, part_assignment: np.ndarray, num_parts: int):
        self.part = np.asarray(part_assignment).astype(np.int32)
        self.num_parts = int(num_parts)
        # local id = rank of the node among its part's nodes (sorted order).
        order = np.argsort(self.part, kind="stable")
        self._local = np.zeros_like(self.part, dtype=np.int64)
        counts = np.bincount(self.part, minlength=num_parts)
        starts = np.zeros(num_parts, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        self._local[order] = np.arange(len(self.part)) - starts[self.part[order]]
        self._part_nodes = [order[starts[p]:starts[p] + counts[p]]
                            for p in range(num_parts)]

    def nid2partid(self, nids) -> np.ndarray:
        return self.part[np.asarray(nids)]

    def nid2localnid(self, nids) -> np.ndarray:
        return self._local[np.asarray(nids)]

    def partid2nids(self, part_id: int) -> np.ndarray:
        return self._part_nodes[part_id]

    def num_nodes(self, part_id: int = None) -> int:
        if part_id is None:
            return len(self.part)
        return len(self._part_nodes[part_id])

    def map_to_global(self, part_id: int, local_ids) -> np.ndarray:
        return self._part_nodes[part_id][np.asarray(local_ids)]
