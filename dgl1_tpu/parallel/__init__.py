"""Multi-chip / multi-host parallel layer (parity: DistDGL,
``python/dgl/distributed``).

TPU-native replacement for the reference's RPC/KVStore pull architecture
(SURVEY.md §2.3): the graph is edge-partitioned by destination owner, halo
(boundary) source features are exchanged per layer with ``all_to_all`` over
ICI inside ``shard_map``, and gradients of replicated parameters are
reduced by the ``shard_map`` transpose automatically.
"""

from dgl1_tpu.parallel.partition import (
    partition_graph,
    load_partition,
    metis_partition_assignment,
    metis_partition,
    multilevel_partition_assignment,
    greedy_partition_assignment,
    random_partition_assignment,
    edge_cut_fraction,
)
from dgl1_tpu.parallel.graph_partition_book import (GraphPartitionBook,
                                                    edge_split, node_split)
from dgl1_tpu.parallel.halo import (PartitionedGraph,
                                    build_partitioned_graph,
                                    vertex_cut_edge_owner)
from dgl1_tpu.parallel.sharded_ops import (
    sharded_gspmm,
    sharded_gat_attention,
    make_sharded_gat_layer,
    halo_exchange,
)
from dgl1_tpu.parallel.hetero import (
    PartitionedHeteroGraph,
    make_sharded_hetero_attention,
    sharded_typed_attention,
    build_partitioned_hetero,
    hetero_partition_assignment,
    hetero_edge_cut_fraction,
    load_hetero_partition,
    make_sharded_rgcn_layer,
    partition_hetero_graph,
    sharded_typed_gspmm,
)
from dgl1_tpu.parallel.dist_graph import DistGraph, DistTensor
from dgl1_tpu.parallel.dist_dataloader import DistDataLoader, DistNodeDataLoader
from dgl1_tpu.parallel.dist_context import initialize, exit_client
# DistDGL-name parity: DistEmbedding is the row-sparse NodeEmbedding +
# sparse optimizer pair in dgl1_tpu.optim.
from dgl1_tpu.optim import NodeEmbedding as DistEmbedding

__all__ = [
    "partition_graph",
    "load_partition",
    "metis_partition_assignment",
    "metis_partition",
    "multilevel_partition_assignment",
    "greedy_partition_assignment",
    "random_partition_assignment",
    "edge_cut_fraction",
    "GraphPartitionBook",
    "PartitionedGraph",
    "build_partitioned_graph",
    "sharded_gspmm",
    "sharded_gat_attention",
    "make_sharded_gat_layer",
    "halo_exchange",
    "vertex_cut_edge_owner",
    "DistGraph",
    "DistTensor",
    "DistDataLoader",
    "DistNodeDataLoader",
    "initialize",
    "exit_client",
    "DistEmbedding",
    "PartitionedHeteroGraph",
    "build_partitioned_hetero",
    "hetero_partition_assignment",
    "hetero_edge_cut_fraction",
    "load_hetero_partition",
    "make_sharded_rgcn_layer",
    "partition_hetero_graph",
    "sharded_typed_gspmm",
    "sharded_typed_attention",
    "make_sharded_hetero_attention",
    "ShardedFeatureStore",
]
from dgl1_tpu.parallel.tp import make_tp_gcn_layer, shard_params_tp
from dgl1_tpu.parallel.kvstore import ShardedFeatureStore  # noqa: E402
