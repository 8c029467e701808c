"""Mini-batch sampling pipeline (parity: ``python/dgl/dataloading``)."""

from dgl1_tpu.dataloading.neighbor_sampler import (
    NeighborSampler,
    MultiLayerNeighborSampler,
    MultiLayerFullNeighborSampler,
)
from dgl1_tpu.dataloading.dataloader import (
    NodeDataLoader,
    DataLoader,
    NodeCollator,
)
from dgl1_tpu.dataloading.edge_dataloader import (
    EdgeDataLoader,
    as_edge_prediction_sampler,
)
from dgl1_tpu.dataloading import negative_sampler
from dgl1_tpu.dataloading.inference import layerwise_inference
from dgl1_tpu.dataloading.cluster import ClusterGCNDataLoader
from dgl1_tpu.dataloading.graph_dataloader import GraphDataLoader
from dgl1_tpu.dataloading.saint import SAINTSampler

__all__ = [
    "NeighborSampler",
    "MultiLayerNeighborSampler",
    "MultiLayerFullNeighborSampler",
    "NodeDataLoader",
    "DataLoader",
    "NodeCollator",
    "EdgeDataLoader",
    "as_edge_prediction_sampler",
    "negative_sampler",
    "layerwise_inference",
    "ClusterGCNDataLoader",
    "GraphDataLoader",
    "SAINTSampler",
]
