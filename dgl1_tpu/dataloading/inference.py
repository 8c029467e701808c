"""Layer-wise offline inference for sampled-trained models.

Parity: the ``inference()`` method of the reference's GraphSAGE example
(``examples/pytorch/graphsage/train_sampling.py``): instead of sampling
(which biases predictions), compute each layer for ALL nodes in node
batches using 1-layer full-neighbor blocks, then move to the next layer.
Memory stays O(batch * fanout-free frontier) per step while every edge is
used exactly once per layer.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from dgl1_tpu.graph import Graph
from dgl1_tpu.sampling.neighbor import sample_neighbors
from dgl1_tpu.transform import to_block

__all__ = ["layerwise_inference"]

def layerwise_inference(
    g: Graph,
    feat,
    layer_fns: Sequence[Callable],
    batch_size: int = 4096,
):
    """Apply ``layer_fns[l](block, h_src)`` for every layer over all nodes.

    ``layer_fns`` are per-layer callables (e.g. partial-applied flax
    modules) taking (block, features-on-src) and returning features on the
    block's dst nodes.
    """
    import jax.numpy as jnp

    h = feat
    n = g.num_nodes()
    for fn in layer_fns:
        outs = []
        for lo in range(0, n, batch_size):
            seeds = np.arange(lo, min(lo + batch_size, n))
            frontier = sample_neighbors(g, seeds, fanout=-1)
            blk = to_block(frontier, seeds)
            h_src = jnp.take(h, jnp.asarray(np.asarray(blk.srcdata["_ID"])),
                             axis=0, mode="clip")
            outs.append(fn(blk, h_src))
        h = jnp.concatenate(outs, axis=0)
    return h
