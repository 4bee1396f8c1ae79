"""Tests for the Count-Min sketch."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from raygraph.data import cms


def _exact_table(values, depth, width):
    """Sequential oracle: dense counter matrix built row-by-row."""
    mat = np.zeros((depth, width), dtype=np.int64)
    for v in values:
        for j in range(depth):
            h = int.from_bytes(
                hashlib.md5(f"{j}:{v}".encode()).digest()[:4], "big"
            ) % width
            mat[j, h] += 1
    return mat


def test_cms_table_matches_sequential_oracle():
    rng = np.random.default_rng(7)
    values = rng.integers(0, 50, size=2000)
    ds = rd.from_pandas(pd.DataFrame({"k": values})).repartition(8)
    got = cms.cms_table(ds, "k", depth=3, width=64).to_pandas()
    want = _exact_table(values, 3, 64)
    mat = np.zeros_like(want)
    mat[got["row"].to_numpy(), got["col"].to_numpy()] = got["cnt"].to_numpy()
    assert np.array_equal(mat, want)
    # total mass per row == N (each item increments one counter per row)
    assert (mat.sum(axis=1) == len(values)).all()


def test_cms_query_overestimates_and_is_exact_without_collisions():
    rng = np.random.default_rng(11)
    values = np.concatenate(
        [rng.integers(0, 500, size=5000), np.full(300, 999_999)]
    )
    true = pd.Series(values).value_counts()
    ds = rd.from_pandas(pd.DataFrame({"k": values})).repartition(4)
    tbl = cms.cms_table(ds, "k", depth=4, width=2048).to_pandas()
    qv = true.index.to_numpy()
    est = cms.cms_query(tbl, qv, depth=4, width=2048)
    assert (est >= true.to_numpy()).all()  # CMS never underestimates
    # width 2048 >> 501 distinct values: error bound eN/width tiny; the
    # planted heavy hitter must be within the standard guarantee
    hh = est[qv == 999_999][0]
    assert true[999_999] <= hh <= true[999_999] + int(
        np.e * len(values) / 2048
    ) + 1


def test_cms_weighted_counts():
    df = pd.DataFrame({"k": ["a", "b", "a"], "w": [2, 5, 3]})
    tbl = cms.cms_table(
        rd.from_pandas(df), "k", depth=2, width=32, weight_col="w"
    ).to_pandas()
    est = cms.cms_query(tbl, ["a", "b", "zzz"], depth=2, width=32)
    assert est[0] >= 5 and est[1] >= 5
    assert est[0] + est[1] <= 10 + 10  # sanity: bounded by total mass
    # a value never inserted can only collide, never exceed total mass
    assert est[2] <= 10


def test_cms_parallelism_invariance():
    values = np.arange(1000) % 37
    df = pd.DataFrame({"k": values})
    t1 = (
        cms.cms_table(rd.from_pandas(df), "k", depth=3, width=128)
        .to_pandas().sort_values(["row", "col"]).reset_index(drop=True)
    )
    t8 = (
        cms.cms_table(rd.from_pandas(df).repartition(8), "k", depth=3,
                      width=128)
        .to_pandas().sort_values(["row", "col"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(t1, t8)


def test_heavy_hitters_candidate_free():
    values = np.concatenate([np.arange(2000) % 400, np.full(500, 7)])
    ds = rd.from_pandas(pd.DataFrame({"k": values})).repartition(4)
    out = cms.heavy_hitters(ds, "k", threshold=100, depth=4, width=4096)
    out = out.to_pandas()
    assert 7 in set(out["value"].astype(int))
    # nothing with a true count far below the threshold sneaks in at
    # width 4096 (error bound << threshold-margin)
    true = pd.Series(values).value_counts()
    for v in out["value"]:
        assert true[int(v)] >= 100 - int(np.e * len(values) / 4096) - 1
