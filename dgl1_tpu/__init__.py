"""dgl1_tpu — a TPU-native graph neural network framework.

A from-scratch rebuild of the capabilities of GaiYu0/dgl-1 (a fork of
dmlc/dgl) designed for TPU hardware: graphs are immutable pytrees of
static-shape arrays (COO + CSR + CSC), message passing lowers builtin
message/reduce functions to fused g-SpMM / g-SDDMM computations (Pallas
kernels on TPU with an XLA segment-op engine as oracle/fallback), neighbor
sampling emits degree-bucketed padded blocks XLA can compile once, and
multi-host scaling uses edge partitioning with halo exchange as collectives
over ICI inside ``shard_map`` instead of RPC.

Reference parity map (see SURVEY.md):
  - ``python/dgl/heterograph.py :: DGLHeteroGraph``  -> :mod:`dgl1_tpu.graph`
  - ``python/dgl/function``                          -> :mod:`dgl1_tpu.function`
  - ``python/dgl/core.py``                           -> :mod:`dgl1_tpu.core`
  - ``python/dgl/ops``                               -> :mod:`dgl1_tpu.ops`
  - ``python/dgl/nn/pytorch``                        -> :mod:`dgl1_tpu.nn`
  - ``python/dgl/sampling``, ``python/dgl/dataloading`` -> :mod:`dgl1_tpu.sampling`,
    :mod:`dgl1_tpu.dataloading`
  - ``python/dgl/distributed`` (DistDGL)             -> :mod:`dgl1_tpu.parallel`
  - ``python/dgl/data``                              -> :mod:`dgl1_tpu.data`
"""

def _tune_host_allocator():
    """Keep large freed buffers in the heap instead of munmap'ing them.

    Sandboxed TPU hosts often have very slow first-touch page faults
    (measured ~8 MB/s here vs ~7 GB/s for warm pages); glibc releases
    >128KB allocations back to the OS on free, so every large numpy array
    re-faults. Raising the mmap/trim thresholds makes the host-side graph
    builder and sampler allocation-bound paths ~100x faster after warmup.
    """
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_MMAP_THRESHOLD, M_TRIM_THRESHOLD = -3, -1
        one_gb = 1 << 30
        libc.mallopt(M_MMAP_THRESHOLD, one_gb)
        libc.mallopt(M_TRIM_THRESHOLD, one_gb)
    except Exception:
        pass


_tune_host_allocator()

from dgl1_tpu.graph import (
    Graph,
    graph,
    block,
    rand_graph,
    rand_bipartite,
    from_scipy,
    from_networkx,
    to_networkx,
    create_block,
)
from dgl1_tpu.heterograph import (
    HeteroGraph,
    heterograph,
    node_type_subgraph,
    edge_type_subgraph,
)
from dgl1_tpu import random
from dgl1_tpu.random import seed
from dgl1_tpu.data.serialize import save_graphs, load_graphs

# Reference-name aliases (``dgl.DGLGraph`` / ``dgl.DGLHeteroGraph``).
DGLGraph = Graph
DGLHeteroGraph = HeteroGraph
from dgl1_tpu.batch import batch, unbatch, batch_num_nodes, batch_num_edges
from dgl1_tpu.readout import (
    readout_nodes,
    readout_edges,
    sum_nodes,
    sum_edges,
    mean_nodes,
    mean_edges,
    max_nodes,
    max_edges,
    softmax_nodes,
    softmax_edges,
    broadcast_nodes,
    broadcast_edges,
    topk_nodes,
    topk_edges,
)
from dgl1_tpu import function
from dgl1_tpu import ops
from dgl1_tpu import transform
# Later-reference alias: ``dgl.transforms`` (the 0.9-era module rename).
from dgl1_tpu import transform as transforms
from dgl1_tpu.hub_format import hub_order
from dgl1_tpu.transform import (
    add_self_loop,
    remove_self_loop,
    reverse,
    add_reverse_edges,
    to_bidirected,
    khop_graph,
    node_subgraph,
    edge_subgraph,
    typed_subgraphs,
    typed_union_graph,
    to_simple,
    line_graph,
    to_block,
    compact_graphs,
    in_subgraph,
    out_subgraph,
    knn_graph,
    segmented_knn_graph,
    metapath_reachable_graph,
    laplacian_lambda_max,
    to_homogeneous,
    to_heterogeneous,
    add_edges,
    remove_edges,
    add_nodes,
    remove_nodes,
    reorder_graph,
    rcm_order,
    laplacian_pe,
    random_walk_pe,
)
from dgl1_tpu.ops.edge_softmax import edge_softmax
from dgl1_tpu import sampling
from dgl1_tpu import dataloading
from dgl1_tpu import data
from dgl1_tpu import nn
from dgl1_tpu import parallel
from dgl1_tpu.parallel import metis_partition, metis_partition_assignment
from dgl1_tpu import models
from dgl1_tpu import utils
from dgl1_tpu import udf
from dgl1_tpu import geometry
from dgl1_tpu.nn.explain import khop_in_subgraph


class DGLError(Exception):
    """Framework error type (parity: ``dgl.DGLError``)."""

from dgl1_tpu.core import (
    filter_nodes,
    filter_edges,
    prop_nodes,
    prop_edges,
    prop_nodes_topo,
    prop_nodes_topo_compiled,
    topo_schedule,
    prop_nodes_bfs,
    prop_edges_dfs,
    pull,
    push,
)

# Reserved field names (parity: ``dgl.NID`` / ``dgl.EID`` / ``dgl.NTYPE`` /
# ``dgl.ETYPE`` from ``python/dgl/base.py``).
NID = "_ID"
EID = "_ID"
NTYPE = "_TYPE"
ETYPE = "_TYPE"
from dgl1_tpu import optim
from dgl1_tpu import traversal
from dgl1_tpu.traversal import (
    bfs_nodes_generator,
    bfs_edges_generator,
    topological_nodes_generator,
    dfs_edges_generator,
)

# DistDGL-parity alias: `dgl.distributed` -> parallel package (also
# registered in sys.modules so `import dgl1_tpu.distributed` works).
import sys as _sys

distributed = parallel
_sys.modules[__name__ + ".distributed"] = parallel

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "graph",
    "block",
    "rand_graph",
    "rand_bipartite",
    "from_scipy",
    "from_networkx",
    "to_networkx",
    "create_block",
    "HeteroGraph",
    "heterograph",
    "node_type_subgraph",
    "edge_type_subgraph",
    "DGLGraph",
    "DGLHeteroGraph",
    "random",
    "seed",
    "save_graphs",
    "load_graphs",
    "batch",
    "unbatch",
    "function",
    "ops",
    "transform",
    "add_self_loop",
    "remove_self_loop",
    "reverse",
    "add_reverse_edges",
    "to_bidirected",
    "khop_graph",
    "node_subgraph",
    "edge_subgraph",
    "typed_subgraphs",
    "typed_union_graph",
    "to_simple",
    "line_graph",
    "to_block",
    "compact_graphs",
    "add_edges",
    "remove_edges",
    "add_nodes",
    "remove_nodes",
    "reorder_graph",
    "rcm_order",
    "hub_order",
    "laplacian_pe",
    "random_walk_pe",
    "geometry",
    "khop_in_subgraph",
    "in_subgraph",
    "out_subgraph",
    "knn_graph",
    "segmented_knn_graph",
    "metapath_reachable_graph",
    "laplacian_lambda_max",
    "edge_softmax",
    "sampling",
    "dataloading",
    "data",
    "nn",
    "parallel",
    "distributed",
]

from dgl1_tpu.transform import merge, shortest_dist  # noqa: E402


def apply_each(data, fn, *args, **kwargs):
    """Apply ``fn`` to every value of a dict, or to a bare value
    (parity: ``dgl.apply_each`` — the hetero-convenience map for
    ``{ntype: tensor}`` dicts)."""
    if isinstance(data, dict):
        return {k: fn(v, *args, **kwargs) for k, v in data.items()}
    return fn(data, *args, **kwargs)


__all__ += ["merge", "shortest_dist", "apply_each"]
