"""Raw-file dataset parsers against tiny hand-built fixtures.

The real datasets cannot be downloaded in this environment; these tests
pin the PARSERS (planetoid pickles, Reddit npz pair, OGB node-prop
directory, knowledge-graph triple files) against miniature files in the
exact on-disk formats, so dropping the real files in simply works.
Format parity anchors: ``python/dgl/data/citation_graph.py``,
``python/dgl/data/reddit.py``, the ``ogb`` package directory layout,
``python/dgl/data/knowledge_graph.py``.
"""

import gzip
import pickle

import numpy as np
import pytest
from scipy import sparse as sp


def _write_planetoid(tmp, name, gap=False):
    """Tiny planetoid set: 4 allx nodes + 3 test nodes (ids 4..6; with
    ``gap`` the test ids are 4 and 6 — citeseer-style isolated node 5)."""
    rng = np.random.default_rng(0)
    d, c = 5, 2
    n_allx = 4
    test_ids_sorted = np.array([4, 6]) if gap else np.array([4, 5, 6])
    n = 7
    # tx rows are stored in test.index FILE order (a permutation).
    file_order = test_ids_sorted[::-1].copy()

    allx = sp.csr_matrix(rng.normal(size=(n_allx, d)).astype(np.float32))
    # Canonical planetoid layout: tx/ty rows are in test.index FILE order
    # (tx row j belongs to node file_order[j]). Feature of node v = v in
    # column 0 so the reassembly is easy to verify.
    tx_dense = np.zeros((len(file_order), d), np.float32)
    tx_dense[:, 0] = file_order
    tx = sp.csr_matrix(tx_dense)

    y = np.eye(c, dtype=np.int32)[[0, 1]]  # 2 train nodes
    ally_lab = rng.integers(0, c, n_allx)
    ally = np.eye(c, dtype=np.int32)[ally_lab]
    ty = np.eye(c, dtype=np.int32)[file_order % c]  # label of node v = v%c
    ty_lab = test_ids_sorted % c

    x = allx[:2]
    adj = {0: [1, 4], 1: [0], 4: [0], 6: [1]}

    for suf, obj in (("x", x), ("y", y), ("tx", tx), ("ty", ty),
                     ("allx", allx), ("ally", ally), ("graph", adj)):
        with open(tmp / f"ind.{name}.{suf}", "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(tmp / f"ind.{name}.test.index", file_order, fmt="%d")
    return test_ids_sorted, ty_lab


@pytest.mark.parametrize("gap", [False, True])
def test_planetoid_parser(tmp_path, gap):
    from dgl1_tpu.data.citation import CoraGraphDataset

    test_sorted, ty_lab = _write_planetoid(tmp_path, "cora", gap=gap)
    ds = CoraGraphDataset(raw_dir=str(tmp_path), force_reload=True)
    assert not ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == 7
    feat = np.asarray(g.ndata["feat"])
    # Reassembly invariant: test node v carries feature v in column 0.
    for v in test_sorted:
        assert feat[v, 0] == v
    lab = np.asarray(g.ndata["label"])
    assert np.array_equal(lab[test_sorted], ty_lab)
    tm = np.asarray(g.ndata["train_mask"])
    assert tm[:2].all() and not tm[2:].any()
    assert np.asarray(g.ndata["test_mask"])[test_sorted].all()
    # Graph is bidirected: edge (0,4) implies (4,0).
    e = g.num_edges()
    src, dst = np.asarray(g.src)[:e], np.asarray(g.dst)[:e]
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert (0, 4) in pairs and (4, 0) in pairs


def test_reddit_parser(tmp_path):
    from dgl1_tpu.data.reddit import RedditDataset

    rng = np.random.default_rng(1)
    n, d = 12, 6
    feature = rng.normal(size=(n, d)).astype(np.float32)
    label = rng.integers(0, 3, n)
    node_types = np.array([1] * 6 + [2] * 3 + [3] * 3)
    np.savez(tmp_path / "reddit_data.npz", feature=feature, label=label,
             node_types=node_types, node_ids=np.arange(n))
    adj = sp.random(n, n, density=0.3, random_state=2, format="csr")
    sp.save_npz(tmp_path / "reddit_graph.npz", adj)

    ds = RedditDataset(raw_dir=str(tmp_path), force_reload=True)
    assert not ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == n
    assert g.num_edges() == adj.nnz
    assert np.allclose(np.asarray(g.ndata["feat"]), feature)
    assert np.asarray(g.ndata["train_mask"]).sum() == 6
    assert np.asarray(g.ndata["val_mask"]).sum() == 3
    assert np.asarray(g.ndata["test_mask"]).sum() == 3


def test_ogb_parser(tmp_path):
    from dgl1_tpu.data.ogb import OGBDataset

    raw = tmp_path / "raw"
    raw.mkdir(parents=True)
    n, d = 10, 4
    rng = np.random.default_rng(3)
    edges = np.stack([rng.integers(0, n, 30), rng.integers(0, n, 30)], 1)
    feat = rng.normal(size=(n, d)).astype(np.float32)
    label = rng.integers(0, 5, n)

    def gz(path, arr, fmt):
        with gzip.open(path, "wt") as f:
            np.savetxt(f, arr, delimiter=",", fmt=fmt)

    gz(raw / "edge.csv.gz", edges, "%d")
    gz(raw / "node-feat.csv.gz", feat, "%.6f")
    gz(raw / "node-label.csv.gz", label[:, None], "%d")
    gz(raw / "num-node-list.csv.gz", np.array([[n]]), "%d")
    split = tmp_path / "split" / "time"
    split.mkdir(parents=True)
    gz(split / "train.csv.gz", np.arange(6)[:, None], "%d")
    gz(split / "valid.csv.gz", np.arange(6, 8)[:, None], "%d")
    gz(split / "test.csv.gz", np.arange(8, 10)[:, None], "%d")

    ds = OGBDataset("ogbn-arxiv", raw_dir=str(tmp_path), force_reload=True)
    assert not ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == n and g.num_edges() == 30
    assert np.allclose(np.asarray(g.ndata["feat"]), feat, atol=1e-5)
    assert np.array_equal(np.asarray(g.ndata["label"]), label)
    assert np.asarray(g.ndata["train_mask"]).sum() == 6
    assert np.asarray(g.ndata["val_mask"]).sum() == 2
    assert np.asarray(g.ndata["test_mask"]).sum() == 2
    e = g.num_edges()
    assert np.array_equal(np.asarray(g.src)[:e], edges[:, 0])


def test_knowledge_triples_parser(tmp_path):
    from dgl1_tpu.data.knowledge import FB15k237Dataset

    triples = {
        "train": [("a", "r1", "b"), ("b", "r2", "c"), ("a", "r1", "c")],
        "valid": [("c", "r2", "a")],
        "test": [("b", "r1", "a"), ("c", "r1", "b")],
    }
    for part, rows in triples.items():
        with open(tmp_path / f"{part}.txt", "w") as f:
            for h, r, t in rows:
                f.write(f"{h}\t{r}\t{t}\n")

    ds = FB15k237Dataset(raw_dir=str(tmp_path), force_reload=True)
    assert not ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == 3  # a, b, c
    assert g.num_edges() == 6
    assert ds.num_rels == 2
    et = np.asarray(g.edata["etype"])
    assert set(et.tolist()) == {0, 1}
    assert np.asarray(g.edata["train_mask"]).sum() == 3
    assert np.asarray(g.edata["val_mask"]).sum() == 1
    assert np.asarray(g.edata["test_mask"]).sum() == 2
    # entity interning is consistent: first triple is (a -> b) with r1.
    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    assert src[0] == 0 and dst[0] == 1 and et[0] == 0


def test_knowledge_dict_files_honored(tmp_path):
    from dgl1_tpu.data.knowledge import load_triples

    with open(tmp_path / "entities.dict", "w") as f:
        f.write("0\tc\n1\tb\n2\ta\n")
    with open(tmp_path / "relations.dict", "w") as f:
        f.write("0\tr2\n1\tr1\n")
    for part, rows in (("train", [("a", "r1", "b")]),
                       ("valid", [("b", "r2", "c")]),
                       ("test", [("c", "r1", "a")])):
        with open(tmp_path / f"{part}.txt", "w") as f:
            for h, r, t in rows:
                f.write(f"{h}\t{r}\t{t}\n")
    g = load_triples(tmp_path)
    src = np.asarray(g.src)
    et = np.asarray(g.edata["etype"])
    assert src[0] == 2 and et[0] == 1  # 'a' -> 2, 'r1' -> 1 per the dicts
