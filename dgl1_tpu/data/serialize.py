"""Graph (de)serialization: npz container + json header.

Parity: ``src/graph/serialize/graph_serialize.cc`` +
``python/dgl/data/graph_serialize.py`` (``save_graphs`` / ``load_graphs``).
TPU-native: the container is a plain ``.npz`` (named numpy arrays) with a
JSON metadata entry — no custom binary format, mmap-friendly via numpy.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from dgl1_tpu.graph import Graph, graph, block

__all__ = ["save_graphs", "load_graphs"]


def _pack(g: Graph, idx: int, arrays: Dict[str, np.ndarray], headers: list):
    e = g.num_edges()
    arrays[f"g{idx}/src"] = np.asarray(g.src)[:e]
    arrays[f"g{idx}/dst"] = np.asarray(g.dst)[:e]
    hdr = {
        "num_src_nodes": g.num_src_nodes(),
        "num_dst_nodes": g.num_dst_nodes(),
        "is_block": g.is_block,
        "ndata": list(g.ndata.keys()),
        "edata": list(g.edata.keys()),
    }
    for k, v in g.ndata.items():
        arrays[f"g{idx}/ndata/{k}"] = np.asarray(v)
    for k, v in g.edata.items():
        arrays[f"g{idx}/edata/{k}"] = np.asarray(v)[:e]
    if g.is_block:
        hdr["srcdata"] = list(g.srcdata.keys())
        hdr["dstdata"] = list(g.dstdata.keys())
        for k, v in g.srcdata.items():
            arrays[f"g{idx}/srcdata/{k}"] = np.asarray(v)
        for k, v in g.dstdata.items():
            arrays[f"g{idx}/dstdata/{k}"] = np.asarray(v)
    headers.append(hdr)


def _pack_hetero(hg, idx: int, arrays: Dict[str, np.ndarray],
                 headers: list) -> None:
    if hg.is_block:
        raise ValueError("save_graphs does not serialize hetero BLOCKS; "
                         "save the parent heterograph instead")
    rels = []
    for r, (c, rel) in enumerate(sorted(hg.rel_graphs.items())):
        e = rel.num_edges()
        arrays[f"g{idx}/rel{r}/src"] = np.asarray(rel.src)[:e]
        arrays[f"g{idx}/rel{r}/dst"] = np.asarray(rel.dst)[:e]
        for k, v in rel.edata.items():
            arrays[f"g{idx}/rel{r}/edata/{k}"] = np.asarray(v)[:e]
        rels.append({"canonical": list(c),
                     "edata": list(rel.edata.keys())})
    for nt, frame in hg.nframes.items():
        for k, v in frame.items():
            arrays[f"g{idx}/nframes/{nt}/{k}"] = np.asarray(v)
    headers.append({
        "hetero": True,
        "num_nodes": dict(hg._num_nodes),
        "rels": rels,
        "nframes": {nt: list(f.keys()) for nt, f in hg.nframes.items()},
    })


def save_graphs(path: str, graphs, labels: Optional[Dict] = None) -> None:
    """Save one or more (hetero)graphs (+optional label dict of arrays) to
    ``path``. Heterographs round-trip with their relation edge order,
    per-ntype node frames, and per-etype edge frames."""
    from dgl1_tpu.heterograph import HeteroGraph

    if isinstance(graphs, (Graph, HeteroGraph)):
        graphs = [graphs]
    arrays: Dict[str, np.ndarray] = {}
    headers: list = []
    for i, g in enumerate(graphs):
        if isinstance(g, HeteroGraph):
            _pack_hetero(g, i, arrays, headers)
            continue
        _pack(g, i, arrays, headers)
    meta = {"num_graphs": len(graphs), "headers": headers,
            "labels": list(labels.keys()) if labels else []}
    if labels:
        for k, v in labels.items():
            arrays[f"labels/{k}"] = np.asarray(v)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_graphs(path: str) -> Tuple[List[Graph], Dict]:
    """Load graphs saved by :func:`save_graphs`."""
    import jax.numpy as jnp

    with np.load(path if str(path).endswith(".npz") else path + ".npz",
                 allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode("utf-8"))
        out = []
        for i, hdr in enumerate(meta["headers"]):
            if hdr.get("hetero"):
                from dgl1_tpu.heterograph import heterograph

                data = {}
                for r, rel_hdr in enumerate(hdr["rels"]):
                    c = tuple(rel_hdr["canonical"])
                    data[c] = (z[f"g{i}/rel{r}/src"], z[f"g{i}/rel{r}/dst"])
                hg = heterograph(data, num_nodes_dict=hdr["num_nodes"])
                for r, rel_hdr in enumerate(hdr["rels"]):
                    c = tuple(rel_hdr["canonical"])
                    for k in rel_hdr["edata"]:
                        hg.rel_graphs[c].edata[k] = jnp.asarray(
                            z[f"g{i}/rel{r}/edata/{k}"])
                for nt, keys in hdr["nframes"].items():
                    for k in keys:
                        hg.nframes[nt][k] = jnp.asarray(
                            z[f"g{i}/nframes/{nt}/{k}"])
                out.append(hg)
                continue
            src = z[f"g{i}/src"]
            dst = z[f"g{i}/dst"]
            if hdr["is_block"]:
                g = block((src, dst), num_src_nodes=hdr["num_src_nodes"],
                          num_dst_nodes=hdr["num_dst_nodes"])
                for k in hdr.get("srcdata", []):
                    g.srcdata[k] = jnp.asarray(z[f"g{i}/srcdata/{k}"])
                for k in hdr.get("dstdata", []):
                    g.dstdata[k] = jnp.asarray(z[f"g{i}/dstdata/{k}"])
            else:
                g = graph((src, dst), num_nodes=hdr["num_src_nodes"])
            for k in hdr["ndata"]:
                g.ndata[k] = jnp.asarray(z[f"g{i}/ndata/{k}"])
            for k in hdr["edata"]:
                g.edata[k] = jnp.asarray(z[f"g{i}/edata/{k}"])
            out.append(g)
        labels = {k: jnp.asarray(z[f"labels/{k}"]) for k in meta["labels"]}
    return out, labels
