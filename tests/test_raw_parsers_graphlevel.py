"""Raw-file parsers for the graph-level dataset families, pinned against
tiny hand-built fixtures in the exact on-disk formats (same pattern as
``test_raw_parsers.py``): TU dortmund text files, PPI json+npy, the GIN
text format, qm9_eV.npz, qm7b.mat, SST PTB trees. Format parity anchors:
``python/dgl/data/tu.py``, ``ppi.py``, ``gindt.py``, ``qm9.py``,
``qm7b.py``, ``tree.py``.
"""

import json

import numpy as np
import pytest


def test_tu_parser(tmp_path):
    from dgl1_tpu.data.ppi_tu import TUDataset

    # 2 graphs: a triangle (label 7) and a 2-path (label 9).
    (tmp_path / "TOY_A.txt").write_text(
        "1, 2\n2, 3\n3, 1\n4, 5\n5, 6\n")
    (tmp_path / "TOY_graph_indicator.txt").write_text(
        "1\n1\n1\n2\n2\n2\n")
    (tmp_path / "TOY_graph_labels.txt").write_text("7\n9\n")
    (tmp_path / "TOY_node_labels.txt").write_text("2\n3\n2\n3\n2\n3\n")
    (tmp_path / "TOY_node_attributes.txt").write_text(
        "0.5, 1.0\n0.25, 2.0\n0.125, 3.0\n"
        "1.5, 4.0\n2.5, 5.0\n3.5, 6.0\n")

    ds = TUDataset("TOY", raw_dir=str(tmp_path))
    assert not ds.is_synthetic
    assert len(ds) == 2
    assert ds.num_classes == 2
    g0, y0 = ds[0]
    g1, y1 = ds[1]
    assert (y0, y1) == (0, 1)  # labels remapped sorted -> 0..C-1
    assert g0.num_nodes() == 3 and g0.num_edges() == 3
    assert g1.num_nodes() == 3 and g1.num_edges() == 2
    e = g1.num_edges()
    # Second graph's edges relabeled to its own 0-based ids: 0->1, 1->2.
    np.testing.assert_array_equal(np.asarray(g1.src)[:e], [0, 1])
    np.testing.assert_array_equal(np.asarray(g1.dst)[:e], [1, 2])
    np.testing.assert_allclose(
        np.asarray(g1.ndata["node_attr"]),
        [[1.5, 4.0], [2.5, 5.0], [3.5, 6.0]])
    np.testing.assert_array_equal(
        np.asarray(g0.ndata["node_labels"]), [0, 1, 0])


def test_ppi_parser(tmp_path):
    from dgl1_tpu.data.ppi_tu import PPIDataset

    rng = np.random.default_rng(0)
    n = 8
    gid = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    links = [
        {"source": 0, "target": 1}, {"source": 2, "target": 3},
        {"source": 4, "target": 5}, {"source": 6, "target": 7},
        {"source": 5, "target": 6},
    ]
    with open(tmp_path / "valid_graph.json", "w") as f:
        json.dump({"nodes": [{"id": i} for i in range(n)],
                   "links": links}, f)
    feats = rng.normal(size=(n, 5)).astype(np.float32)
    labels = (rng.random((n, 3)) < 0.5).astype(np.float32)
    np.save(tmp_path / "valid_feats.npy", feats)
    np.save(tmp_path / "valid_labels.npy", labels)
    np.save(tmp_path / "valid_graph_id.npy", gid)

    ds = PPIDataset(mode="valid", raw_dir=str(tmp_path))
    assert not ds.is_synthetic
    assert len(ds) == 2
    g0, g1 = ds[0], ds[1]
    assert g0.num_nodes() == 4 and g1.num_nodes() == 4
    # Edge (5, 6) is within graph 1, relabeled to (1, 2).
    e = g1.num_edges()
    pairs = set(zip(np.asarray(g1.src)[:e].tolist(),
                    np.asarray(g1.dst)[:e].tolist()))
    assert (1, 2) in pairs
    np.testing.assert_allclose(np.asarray(g1.ndata["feat"]), feats[4:])
    np.testing.assert_allclose(np.asarray(g0.ndata["label"]), labels[:4])


def test_gin_parser(tmp_path):
    from dgl1_tpu.data.ppi_tu import GINDataset

    # 2 graphs in the GIN text format: "n label", then per node
    # "tag num_nbrs nbrs...".
    (tmp_path / "TOYGIN.txt").write_text(
        "2\n"
        "3 0\n"
        "0 2 1 2\n"
        "1 1 0\n"
        "1 1 0\n"
        "2 1\n"
        "2 1 1\n"
        "0 1 0\n")
    ds = GINDataset("TOYGIN", raw_dir=str(tmp_path),
                    degree_as_nlabel=False)
    assert not ds.is_synthetic
    assert len(ds) == 2
    assert ds.gclasses == 2
    g0, y0 = ds[0]
    g1, y1 = ds[1]
    assert (y0, y1) == (0, 1)
    assert g0.num_nodes() == 3 and g0.num_edges() == 4
    # attr one-hot over node tags (max tag 2 -> dim 3).
    assert ds.dim_nfeats == 3
    np.testing.assert_array_equal(
        np.asarray(g0.ndata["attr"]),
        [[1, 0, 0], [0, 1, 0], [0, 1, 0]])
    np.testing.assert_array_equal(
        np.asarray(g1.ndata["attr"]), [[0, 0, 1], [1, 0, 0]])


def test_qm9_parser(tmp_path):
    from dgl1_tpu.data.qm import QM9Dataset, _QM9_KEYS

    rng = np.random.default_rng(1)
    counts = np.array([3, 2])
    R = rng.normal(size=(5, 3)).astype(np.float32)
    # Put molecule 2's atoms far apart so the cutoff drops its edge.
    R[3] = [0, 0, 0]
    R[4] = [10, 0, 0]
    Z = np.array([6, 1, 1, 8, 1], np.float32)
    arrays = {"N": counts, "R": R, "Z": Z}
    for k in _QM9_KEYS:
        arrays[k] = rng.normal(size=2).astype(np.float32)
    np.savez(tmp_path / "qm9_eV.npz", **arrays)

    ds = QM9Dataset(label_keys=("mu", "gap"), raw_dir=str(tmp_path),
                    cutoff=5.0)
    assert not ds.is_synthetic
    assert len(ds) == 2
    g0, y0 = ds[0]
    g1, y1 = ds[1]
    assert g0.num_nodes() == 3 and g0.num_edges() == 6  # complete
    assert g1.num_nodes() == 2 and g1.num_edges() == 0  # cut off
    np.testing.assert_allclose(np.asarray(g0.ndata["pos"]), R[:3])
    np.testing.assert_allclose(
        y0, [arrays["mu"][0], arrays["gap"][0]])
    # Edge distances match the positions.
    e = g0.num_edges()
    s = np.asarray(g0.src)[:e]
    d = np.asarray(g0.dst)[:e]
    np.testing.assert_allclose(
        np.asarray(g0.edata["dist"])[:, 0],
        np.linalg.norm(R[s] - R[d], axis=1), rtol=1e-5)


def test_qm7b_parser(tmp_path):
    from scipy.io import savemat

    from dgl1_tpu.data.qm import QM7bDataset

    # 2 molecules inside 4x4 Coulomb frames (second has 3 atoms).
    X = np.zeros((2, 4, 4), np.float32)
    z0 = np.array([6.0, 1.0])
    X[0, :2, :2] = [[0.5 * 6 ** 2.4, 3.0], [3.0, 0.5 * 1 ** 2.4]]
    X[1, :3, :3] = [[0.5 * 8 ** 2.4, 2.0, 0.0],
                    [2.0, 0.5 * 1 ** 2.4, 1.0],
                    [0.0, 1.0, 0.5 * 1 ** 2.4]]
    T = np.arange(28, dtype=np.float32).reshape(2, 14)
    savemat(tmp_path / "qm7b.mat", {"X": X, "T": T})

    ds = QM7bDataset(raw_dir=str(tmp_path))
    assert not ds.is_synthetic
    g0, y0 = ds[0]
    g1, y1 = ds[1]
    assert g0.num_nodes() == 2 and g0.num_edges() == 2
    assert g1.num_nodes() == 3 and g1.num_edges() == 4  # (0,1),(1,2) x2
    np.testing.assert_allclose(
        np.asarray(g0.ndata["charge"])[:, 0], z0, rtol=1e-5)
    np.testing.assert_allclose(y1, T[1])


def test_sst_ptb_parser(tmp_path):
    from dgl1_tpu.data.sst import SSTDataset

    (tmp_path / "train.txt").write_text(
        "(3 (2 It) (4 (2 's) (4 great)))\n"
        "(1 (2 not) (1 good))\n")
    (tmp_path / "dev.txt").write_text("(2 (2 It) (2 's))\n")

    ds = SSTDataset(mode="train", raw_dir=str(tmp_path))
    assert not ds.is_synthetic
    assert len(ds) == 2
    t0 = ds[0]
    # Tree 0: 5 nodes (root, It, inner, 's, great), 4 child->parent edges.
    assert t0.num_nodes() == 5 and t0.num_edges() == 4
    y = np.asarray(t0.ndata["y"])
    np.testing.assert_array_equal(y, [3, 2, 4, 2, 4])
    mask = np.asarray(t0.ndata["mask"])
    np.testing.assert_array_equal(mask, [0, 1, 0, 1, 1])
    x = np.asarray(t0.ndata["x"])
    vocab = ds.vocab
    assert x[1] == vocab["It"] and x[3] == vocab["'s"]
    assert x[4] == vocab["great"]
    e = t0.num_edges()
    src = np.asarray(t0.src)[:e]
    dst = np.asarray(t0.dst)[:e]
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (1, 0) in pairs and (2, 0) in pairs  # children -> root
    assert (3, 2) in pairs and (4, 2) in pairs

    # Dev split reuses the train vocab when passed through.
    ds_dev = SSTDataset(mode="dev", raw_dir=str(tmp_path),
                        vocab=ds.vocab)
    assert np.asarray(ds_dev[0].ndata["x"])[1] == vocab["It"]
