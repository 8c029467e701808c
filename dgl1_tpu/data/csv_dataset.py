"""CSV dataset (parity: ``dgl.data.CSVDataset``): build a graph from
``nodes.csv`` (node_id, feat..., label?) and ``edges.csv``
(src_id, dst_id, feat...)."""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from dgl1_tpu.graph import Graph, graph

__all__ = ["CSVDataset"]


def _read_csv(path):
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        rows = [r for r in reader]
    return header, rows


class CSVDataset:
    """``CSVDataset(dir)`` expects ``dir/nodes.csv`` and ``dir/edges.csv``.

    Column conventions (matching the reference's simple mode):
      nodes.csv: ``node_id`` [, ``feat`` (comma-free float list split on
      ';')] [, ``label``]
      edges.csv: ``src_id, dst_id`` [, ``feat``] [, ``label``]
    """

    def __init__(self, data_path: str):
        import jax.numpy as jnp

        d = Path(data_path)
        nh, nrows = _read_csv(d / "nodes.csv")
        eh, erows = _read_csv(d / "edges.csv")
        nid_col = nh.index("node_id")
        nids = np.asarray([int(r[nid_col]) for r in nrows])
        order = np.argsort(nids)
        n = len(nids)

        src_col, dst_col = eh.index("src_id"), eh.index("dst_id")
        src = np.asarray([int(r[src_col]) for r in erows])
        dst = np.asarray([int(r[dst_col]) for r in erows])
        g = graph((src, dst), num_nodes=n)

        def parse_feat(rows, col):
            return np.asarray(
                [[float(x) for x in r[col].split(";")] for r in rows],
                dtype=np.float32,
            )

        if "feat" in nh:
            feats = parse_feat(nrows, nh.index("feat"))
            if not np.array_equal(nids, np.arange(n)):
                feats = feats[np.argsort(nids)]  # row-per-node-id order
            g.ndata["feat"] = jnp.asarray(feats)
        if "label" in nh:
            g.ndata["label"] = jnp.asarray(
                np.asarray([int(r[nh.index("label")]) for r in nrows],
                           dtype=np.int32)
            )
        if "feat" in eh:
            g.edata["feat"] = jnp.asarray(parse_feat(erows, eh.index("feat")))
        if "label" in eh:
            g.edata["label"] = jnp.asarray(
                np.asarray([int(r[eh.index("label")]) for r in erows],
                           dtype=np.int32)
            )
        self.graphs = [g]

    def __len__(self):
        return 1

    def __getitem__(self, i) -> Graph:
        return self.graphs[i]
