"""Dataset breadth tests (parity role: ``tests/compute/test_data.py``):
gnn-benchmark family, KarateClub, SBM mixture, QM7b/QM9, GINDataset,
split_dataset."""

import numpy as np
import pytest

import dgl1_tpu as dgl
from dgl1_tpu import data


def test_karate_club():
    ds = data.KarateClubDataset()
    g = ds[0]
    assert g.num_nodes() == 34
    assert g.num_edges() == 156  # 78 undirected edges, both directions
    labels = np.asarray(g.ndata["label"])
    assert set(labels.tolist()) == {0, 1}
    # Symmetric adjacency.
    src = np.asarray(g.src)[: g.num_edges()]
    dst = np.asarray(g.dst)[: g.num_edges()]
    fwd = set(zip(src.tolist(), dst.tolist()))
    assert all((d, s) in fwd for s, d in fwd)


def test_gnn_benchmark_synthetic(tmp_path):
    ds = data.AmazonCoBuyPhotoDataset(raw_dir=str(tmp_path / "photo"))
    assert ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == 7650
    assert g.ndata["feat"].shape[1] == 512  # synthetic fallback caps width
    assert ds.num_classes == 8
    assert int(np.asarray(g.ndata["label"]).max()) == 7


def test_gnn_benchmark_raw_npz(tmp_path):
    # Build a tiny file in the shchur/gnn-benchmark CSR layout and check
    # the raw parser path.
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 30
    adj = sp.random(n, n, density=0.1, random_state=0, format="csr")
    attr = rng.normal(size=(n, 5)).astype(np.float32)
    raw_dir = tmp_path / "coauthor_cs"
    raw_dir.mkdir(parents=True)
    np.savez(raw_dir / "coauthor_cs.npz",
             adj_data=adj.data, adj_indices=adj.indices,
             adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
             attr_matrix=attr,
             labels=rng.integers(0, 3, n))
    ds = data.CoauthorCSDataset(raw_dir=str(raw_dir))
    assert not ds.is_synthetic
    g = ds[0]
    assert g.num_nodes() == n
    assert g.ndata["feat"].shape == (n, 5)


def test_sbm_mixture():
    ds = data.SBMMixtureDataset(n_graphs=3, n_nodes=40, n_communities=2,
                                pad_multiple=64, seed=1)
    assert len(ds) == 3
    g, lg, pm_pd = ds[0]
    e, e_pad = g.num_edges(), g.num_edges_padded()
    assert e_pad % 64 == 0
    assert lg.num_nodes() == e_pad
    assert pm_pd.shape == (40, e_pad)
    # Every real edge column touches exactly its two endpoints; padded
    # columns are zero.
    col = np.asarray(pm_pd).sum(0)
    np.testing.assert_allclose(col[:e], 2.0)
    np.testing.assert_allclose(col[e:], 0.0)
    # Labels cover both communities.
    assert set(np.asarray(ds.labels[0]).tolist()) == {0, 1}
    # Every graph's padded sizes land on the bucket grid (few distinct
    # compiled shapes across the mixture).
    for i in range(3):
        gi, lgi, _ = ds[i]
        assert gi.num_edges_padded() % 64 == 0
        assert lgi.num_edges_padded() % 64 == 0


def test_qm7b():
    ds = data.QM7bDataset(num_molecules=4, seed=3)
    assert len(ds) == 4
    g, y = ds[0]
    assert y.shape == (14,)
    n = g.num_nodes()
    assert g.num_edges() == n * (n - 1)  # complete graph
    assert g.edata["w"].shape == (g.num_edges(), 1)


def test_qm9():
    ds = data.QM9Dataset(label_keys=["mu", "gap"], num_molecules=4, seed=3)
    g, y = ds[1]
    assert y.shape == (2,)
    assert g.ndata["pos"].shape == (g.num_nodes(), 3)
    with pytest.raises(ValueError):
        data.QM9Dataset(label_keys=["nope"])


def test_gin_dataset():
    ds = data.GINDataset("IMDBBINARY", self_loop=True, max_graphs=6, seed=2)
    assert len(ds) == 6
    g, label = ds[0]
    assert 0 <= label < ds.gclasses
    attr = np.asarray(g.ndata["attr"])
    assert attr.shape[1] == ds.dim_nfeats
    np.testing.assert_allclose(attr.sum(1), 1.0)  # one-hot rows
    with pytest.raises(ValueError):
        data.GINDataset("NOPE")


def test_split_dataset():
    ds = data.MiniGCDataset(20, 8, 12, seed=0)
    tr, va, te = data.split_dataset(ds, (0.7, 0.2, 0.1), shuffle=True,
                                    random_state=1)
    assert (len(tr), len(va), len(te)) == (14, 4, 2)
    g, lbl = tr[0]
    assert g.num_nodes() >= 8
    all_idx = sorted(tr.indices + va.indices + te.indices)
    assert all_idx == list(range(20))
    with pytest.raises(ValueError):
        data.split_dataset(ds, (0.5, 0.2))
