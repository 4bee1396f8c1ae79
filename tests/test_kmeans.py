"""Tests: distributed Lloyd's k-means vs an exact numpy oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from raygraph.data.kmeans import kmeans


def _numpy_lloyd(X: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Same spec: init = k smallest ids, argmin-L2 with lowest-cid ties,
    empty clusters keep their centroid."""
    order = np.argsort(ids)
    C = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1), C


def _planted(n_per=40, k=4, d=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, size=(k, d))
    X = np.concatenate(
        [centers[i] + rng.normal(0, 0.3, size=(n_per, d)) for i in range(k)]
    )
    ids = rng.permutation(len(X)).astype(np.int64)
    labels = np.repeat(np.arange(k), n_per)
    return X, ids, labels


def test_kmeans_matches_numpy_oracle():
    X, ids, _ = _planted()
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X.astype(np.float32))})
    ds = rd.from_pandas(df).repartition(6)
    assign, C = kmeans(ds, k=4, iters=5)
    got = assign.to_pandas().sort_values("vec_id").reset_index(drop=True)
    want_a, want_C = _numpy_lloyd(X.astype(np.float32).astype(np.float64),
                                  ids, k=4, iters=5)
    want = (
        pd.DataFrame({"vec_id": ids, "cluster": want_a.astype(np.int64)})
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    np.testing.assert_allclose(C, want_C, rtol=1e-9)


def test_kmeans_recovers_planted_clusters():
    X, ids, labels = _planted()
    # smallest-id init is intentionally naive (deterministic, no RNG) —
    # recovery is only guaranteed when the k seed ids land one per blob,
    # so place ids 0..3 on one member of each planted cluster
    ids = ids + 4
    for c in range(4):
        ids[np.flatnonzero(labels == c)[0]] = c
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X.astype(np.float32))})
    assign, _ = kmeans(rd.from_pandas(df), k=4, iters=5)
    got = assign.to_pandas()
    m = pd.DataFrame({"vec_id": ids, "label": labels}).merge(got, on="vec_id")
    # each planted cluster maps to exactly one kmeans cluster and vice versa
    tab = m.groupby(["label", "cluster"]).size().unstack(fill_value=0)
    assert (tab.gt(0).sum(axis=1) == 1).all()
    assert (tab.gt(0).sum(axis=0) == 1).all()


def test_kmeans_partition_invariance():
    X, ids, _ = _planted(seed=9)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(X.astype(np.float32))})
    a = kmeans(rd.from_pandas(df).repartition(2), k=4, iters=3)[0].to_pandas()
    b = kmeans(rd.from_pandas(df).repartition(11), k=4, iters=3)[0].to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("vec_id").reset_index(drop=True),
        b.sort_values("vec_id").reset_index(drop=True),
    )
