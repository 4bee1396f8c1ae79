"""Katz / eigenvector / HITS vs dense oracles; RMAT determinism + skew."""

import numpy as np
import pytest
import ray.data as rd

from raygraph import generators
from raygraph.algos.centrality import eigenvector_centrality, hits, katz_centrality
from raygraph.graph import Graph

from tests import fixtures


def _dense_adj(df, V):
    A = np.zeros((V, V))
    for u, v, w in zip(df["src"], df["dst"], df["weight"]):
        A[u, v] += w
    return A


@pytest.fixture(scope="module")
def karate(tmp_path_factory):
    d = tmp_path_factory.mktemp("cg")
    return Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(d / "g"),
    )


def _sym_df():
    df = fixtures.karate_df()
    import pandas as pd

    rev = df.rename(columns={"src": "dst", "dst": "src"})
    return pd.concat([df, rev[["src", "dst", "weight"]]], ignore_index=True)


def test_katz_matches_dense(karate):
    V = fixtures.KARATE_V
    A = _dense_adj(_sym_df(), V)
    alpha, beta, tol = 0.05, 1.0, 1e-8
    x = np.zeros(V)
    for _ in range(200):
        xn = alpha * (A.T @ x) + beta
        if np.abs(xn - x).sum() < tol:
            x = xn
            break
        x = xn
    want = x / np.linalg.norm(x)
    got = (
        katz_centrality(karate, alpha=alpha, beta=beta, tol=tol, max_iter=200)
        .to_pandas().sort_values("vertex")["katz_centrality"].to_numpy()
    )
    assert np.allclose(got, want, atol=1e-6)


def test_eigenvector_matches_dense(karate):
    V = fixtures.KARATE_V
    A = _dense_adj(_sym_df(), V)
    x = np.full(V, 1.0 / np.sqrt(V))
    for _ in range(200):
        y = A.T @ x
        y /= np.linalg.norm(y)
        x = y
    got = (
        eigenvector_centrality(karate, tol=1e-9, max_iter=500)
        .to_pandas().sort_values("vertex")["eigenvector_centrality"].to_numpy()
    )
    assert np.allclose(np.abs(got), np.abs(x), atol=1e-4)


def test_hits_matches_dense(karate):
    V = fixtures.KARATE_V
    A = _dense_adj(_sym_df(), V)
    h = np.full(V, 1.0 / V)
    for _ in range(100):
        a = A.T @ h
        a /= a.sum()
        h2 = A @ a
        h2 /= h2.sum()
        if np.abs(h2 - h).sum() < 1e-10:
            h = h2
            break
        h = h2
    got = hits(karate, tol=1e-10, max_iter=100).to_pandas().sort_values("vertex")
    assert np.allclose(got["hubs"].to_numpy(), h, atol=1e-5)
    assert np.allclose(got["authorities"].to_numpy(), a, atol=1e-5)


def test_rmat_deterministic_and_skewed():
    a = generators.rmat_batch(np.arange(1000), scale=8, seed=42)
    b1 = generators.rmat_batch(np.arange(500), scale=8, seed=42)
    b2 = generators.rmat_batch(np.arange(500, 1000), scale=8, seed=42)
    import pyarrow as pa

    assert a.equals(pa.concat_tables([b1, b2]))
    src = a.column("src").to_numpy()
    assert src.max() < 256 and src.min() >= 0
    # power-law-ish: top vertex owns far more than uniform share
    _, counts = np.unique(src, return_counts=True)
    assert counts.max() > 5 * counts.mean()
    w = a.column("weight").to_numpy()
    assert (w >= 0).all() and (w < 1).all()


def test_rmat_dataset_matches_batch():
    ds = generators.rmat_dataset(scale=6, edgefactor=4, seed=7)
    got = ds.to_pandas().sort_values(["src", "dst", "weight"]).reset_index(drop=True)
    want = (
        generators.rmat_batch(np.arange(4 * 64), scale=6, seed=7)
        .to_pandas().sort_values(["src", "dst", "weight"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_path_and_er_generators():
    p = generators.path_graph_dataset(5).to_pandas().sort_values("src")
    assert list(p["src"]) == [0, 1, 2, 3]
    er = generators.erdos_renyi_dataset(20, 0.3, seed=1).to_pandas()
    assert (er["src"] != er["dst"]).all()
    er2 = generators.erdos_renyi_dataset(20, 0.3, seed=1).to_pandas()
    assert len(er) == len(er2)


def test_mesh_generator():
    from raygraph.generators import mesh_graph_dataset

    df = mesh_graph_dataset(3, 4).to_pandas()
    # 3x4 mesh: right edges 3*3=9, down edges 2*4=8
    assert len(df) == 17
    assert df["dst"].max() == 11
    pairs = set(zip(df["src"], df["dst"]))
    assert (0, 1) in pairs and (0, 4) in pairs and (0, 5) not in pairs


def test_complete_generator():
    from raygraph.generators import complete_graph_dataset

    df = complete_graph_dataset(5).to_pandas()
    assert len(df) == 20  # n*(n-1) ordered pairs
    assert not (df["src"] == df["dst"]).any()


def test_degree_centrality_karate(karate):
    from raygraph.algos.centrality import degree_centrality

    src, dst, _ = fixtures.karate_sym_arrays()
    V = fixtures.KARATE_V
    # stored-edge-list degree: both directions count (cuGraph G.degree())
    deg = np.bincount(src, minlength=V) + np.bincount(dst, minlength=V)
    out = degree_centrality(karate).to_pandas().sort_values("vertex")
    np.testing.assert_allclose(
        out["degree_centrality"].to_numpy(), deg / (V - 1), atol=1e-12
    )
    raw = degree_centrality(karate, normalized=False).to_pandas()
    raw = raw.sort_values("vertex")
    np.testing.assert_allclose(raw["degree_centrality"].to_numpy(), deg)
