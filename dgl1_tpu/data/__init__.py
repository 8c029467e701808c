"""Datasets (parity: ``python/dgl/data``).

Offline environment: each dataset first looks for raw/processed files under
``DGL1_TPU_DATA_DIR`` (default ``~/.dgl1_tpu``); when absent it falls back
to a deterministic synthetic graph with the same schema and shape
statistics (clearly flagged via ``dataset.is_synthetic``). See
:mod:`dgl1_tpu.data.synthetic`.
"""

from dgl1_tpu.data.serialize import save_graphs, load_graphs
from dgl1_tpu.data.synthetic import (
    synthetic_classification_graph,
    powerlaw_graph,
)
from dgl1_tpu.data.citation import (
    CoraGraphDataset,
    CiteseerGraphDataset,
    PubmedGraphDataset,
)
from dgl1_tpu.data.reddit import RedditDataset
from dgl1_tpu.data.knowledge import FB15k237Dataset, WN18Dataset, AIFBDataset
from dgl1_tpu.data.ogb import OGBDataset
from dgl1_tpu.data.minigc import MiniGCDataset
from dgl1_tpu.data.csv_dataset import CSVDataset
from dgl1_tpu.data.ppi_tu import PPIDataset, TUDataset, GINDataset
from dgl1_tpu.data.feature_store import HostFeatureStore, prefetch_to_device
from dgl1_tpu.data.gnn_benchmark import (
    CoraFullDataset,
    CoauthorCSDataset,
    CoauthorPhysicsDataset,
    AmazonCoBuyComputerDataset,
    AmazonCoBuyPhotoDataset,
    KarateClubDataset,
)
from dgl1_tpu.data.sbm import SBMMixtureDataset
from dgl1_tpu.data.sst import SSTDataset
from dgl1_tpu.data.qm import QM7bDataset, QM9Dataset
from dgl1_tpu.data.utils import Subset, split_dataset

__all__ = [
    "save_graphs",
    "load_graphs",
    "synthetic_classification_graph",
    "powerlaw_graph",
    "CoraGraphDataset",
    "CiteseerGraphDataset",
    "PubmedGraphDataset",
    "RedditDataset",
    "FB15k237Dataset",
    "WN18Dataset",
    "AIFBDataset",
    "OGBDataset",
    "MiniGCDataset",
    "CSVDataset",
    "PPIDataset",
    "TUDataset",
    "HostFeatureStore",
    "prefetch_to_device",
    "GINDataset",
    "CoraFullDataset",
    "CoauthorCSDataset",
    "CoauthorPhysicsDataset",
    "AmazonCoBuyComputerDataset",
    "AmazonCoBuyPhotoDataset",
    "KarateClubDataset",
    "SBMMixtureDataset",
    "SSTDataset",
    "QM7bDataset",
    "QM9Dataset",
    "Subset",
    "split_dataset",
]
