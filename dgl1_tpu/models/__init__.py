"""Reference model zoo (parity: ``examples/pytorch/{gcn,gat,graphsage,rgcn}``
model definitions, as reusable flax modules)."""

from dgl1_tpu.models.gcn import GCN
from dgl1_tpu.models.gat import GAT
from dgl1_tpu.models.graphsage import GraphSAGE
from dgl1_tpu.models.rgcn import RGCN
from dgl1_tpu.models.han import HAN, HANLayer, SemanticAttention
from dgl1_tpu.models.gin import GIN
from dgl1_tpu.models.lgnn import LGNN, LGNNLayer, LGNNCore
from dgl1_tpu.models.dgi import DGI, DGIEncoder
from dgl1_tpu.models.treelstm import (TreeLSTM, ChildSumTreeLSTMCell,
                                      NAryTreeLSTMCell)

__all__ = ["GCN", "GAT", "GraphSAGE", "RGCN", "HAN", "HANLayer",
           "SemanticAttention", "GIN", "LGNN", "LGNNLayer", "LGNNCore",
           "DGI", "DGIEncoder", "TreeLSTM", "ChildSumTreeLSTMCell",
           "NAryTreeLSTMCell"]
