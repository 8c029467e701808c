"""Re-export of edge_softmax under ``dgl1_tpu.nn`` (parity:
``python/dgl/nn/pytorch/softmax.py``)."""

from dgl1_tpu.ops.edge_softmax import edge_softmax

__all__ = ["edge_softmax"]
