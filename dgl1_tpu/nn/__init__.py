"""NN modules (flax.linen) — parity: ``python/dgl/nn/pytorch``.

Every conv takes ``(graph, feat)`` functionally (the reference modules use
``g.local_scope()`` + ndata mutation; here the graph is read-only and the
features flow through the module), and lowers to the same fused-op calls.
"""

from dgl1_tpu.nn.conv import (
    GraphConv,
    GATConv,
    DotGatConv,
    SAGEConv,
    RelGraphConv,
    GINConv,
    SGConv,
    APPNPConv,
    TAGConv,
    ChebConv,
    EdgeConv,
    GatedGraphConv,
    AGNNConv,
    NNConv,
    DenseGraphConv,
    DenseSAGEConv,
    DenseChebConv,
    CFConv,
    AtomicConv,
    GATv2Conv,
    EGATConv,
    EdgeGATConv,
    GCN2Conv,
    PNAConv,
    HGTConv,
    EdgeWeightNorm,
)
from dgl1_tpu.nn.linear import TypedLinear, HeteroLinear, HeteroEmbedding
from dgl1_tpu.nn.explain import GNNExplainer
from dgl1_tpu.nn.glob import (
    SumPooling,
    AvgPooling,
    MaxPooling,
    SortPooling,
    GlobalAttentionPooling,
    Set2Set,
    WeightAndSum,
    SetTransformerEncoder,
    SetTransformerDecoder,
)
from dgl1_tpu.nn.hetero import HeteroGraphConv
from dgl1_tpu.nn.factory import KNNGraph, SegmentedKNNGraph
from dgl1_tpu.nn.utils import (WeightBasis, Sequential, JumpingKnowledge,
                               LabelPropagation)
from dgl1_tpu.nn.softmax import edge_softmax

__all__ = [
    "GraphConv",
    "GATConv",
    "DotGatConv",
    "SAGEConv",
    "RelGraphConv",
    "GINConv",
    "SGConv",
    "APPNPConv",
    "TAGConv",
    "ChebConv",
    "EdgeConv",
    "GatedGraphConv",
    "AGNNConv",
    "NNConv",
    "DenseGraphConv",
    "DenseSAGEConv",
    "DenseChebConv",
    "CFConv",
    "AtomicConv",
    "SumPooling",
    "AvgPooling",
    "MaxPooling",
    "SortPooling",
    "GlobalAttentionPooling",
    "Set2Set",
    "HeteroGraphConv",
    "edge_softmax",
    "WeightAndSum",
    "KNNGraph",
    "SegmentedKNNGraph",
    "WeightBasis",
    "Sequential",
    "SetTransformerEncoder",
    "SetTransformerDecoder",
    "GATv2Conv",
    "EGATConv",
    "EdgeGATConv",
    "GCN2Conv",
    "PNAConv",
    "JumpingKnowledge",
    "LabelPropagation",
    "HGTConv",
    "TypedLinear",
    "HeteroLinear",
    "HeteroEmbedding",
    "GNNExplainer",
]

from dgl1_tpu.nn.conv import GMMConv  # noqa: E402

__all__.append("GMMConv")
