"""Tests: distributed as-of join vs a pandas merge_asof oracle."""

import numpy as np
import pytest
import pandas as pd
import ray.data as rd

from raygraph.joins import asof_join


def _frames(seed=5, n_left=300, n_right=200, users=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {"lid": np.arange(n_left, dtype=np.int64),
         "user": rng.integers(0, users, n_left).astype(np.int64),
         "t": rng.integers(0, 10_000, n_left).astype(np.int64)}
    )
    right = pd.DataFrame(
        {"user": rng.integers(0, users, n_right).astype(np.int64),
         "t": rng.integers(0, 10_000, n_right).astype(np.int64),
         "px": rng.normal(size=n_right).round(4)}
    )
    # unique per (user, t) — the operator's determinism contract
    right = right.drop_duplicates(["user", "t"]).reset_index(drop=True)
    return left, right


def _oracle(left, right):
    out = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="user", direction="backward",
    )
    return (
        out[out["px"].notna()]
        .sort_values("lid")
        .reset_index(drop=True)[["lid", "user", "t", "px"]]
    )


def test_asof_join_matches_pandas_oracle():
    left, right = _frames()
    got = (
        asof_join(
            rd.from_pandas(left).repartition(5),
            rd.from_pandas(right).repartition(3),
            on="t", by="user", num_buckets=7,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)[["lid", "user", "t", "px"]]
    )
    pd.testing.assert_frame_equal(got, _oracle(left, right))


def test_asof_join_exact_match_included_and_no_future_rows():
    left = pd.DataFrame({"lid": [0, 1, 2], "user": [1, 1, 1],
                         "t": np.array([5, 10, 3], dtype=np.int64)})
    right = pd.DataFrame({"user": [1, 1], "t": np.array([5, 8], np.int64),
                          "px": [1.5, 2.5]})
    got = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right),
                  on="t", by="user")
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    # t=5 matches the t=5 row exactly; t=10 takes t=8; t=3 has no match
    assert got["lid"].tolist() == [0, 1]
    assert got["px"].tolist() == [1.5, 2.5]


def test_asof_join_user_isolation():
    # a user with only-right rows must never leak into another user's left
    left = pd.DataFrame({"lid": [0], "user": [1],
                         "t": np.array([100], np.int64)})
    right = pd.DataFrame({"user": [2], "t": np.array([50], np.int64),
                          "px": [9.9]})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="t", by="user").to_pandas()
    assert len(got) == 0


def test_semi_anti_join_matches_pandas_oracle():
    from raygraph.joins import semi_join, anti_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame({
        "k": rng.randint(0, 50, 500),
        "payload": rng.randn(500),
    })
    right = pd.DataFrame({"k": rng.choice(50, 20, replace=False),
                          "other": np.arange(20)})
    present = set(right["k"])
    want_semi = left[left["k"].isin(present)].reset_index(drop=True)
    want_anti = left[~left["k"].isin(present)].reset_index(drop=True)

    for forced_dist in (False, True):
        kw = dict(broadcast_limit=0) if forced_dist else {}
        got_s = (semi_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", **kw)
                 .to_pandas().sort_values(["k", "payload"])
                 .reset_index(drop=True))
        got_a = (anti_join(rd.from_pandas(left), rd.from_pandas(right),
                           on="k", **kw)
                 .to_pandas().sort_values(["k", "payload"])
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got_s, want_semi.sort_values(["k", "payload"])
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got_a, want_anti.sort_values(["k", "payload"])
            .reset_index(drop=True))


def test_semi_join_multi_key_and_dtypes():
    from raygraph.joins import semi_join

    left = pd.DataFrame({
        "a": np.array([1, 1, 2, 2, 3], np.int64),
        "b": ["x", "y", "x", "z", "x"],
        "v": np.arange(5, dtype=np.float64),
    })
    right = pd.DataFrame({"a": np.array([1, 2], np.int64),
                          "b": ["y", "x"]})
    want = left.iloc[[1, 2]].reset_index(drop=True)
    for forced_dist in (False, True):
        kw = dict(broadcast_limit=0) if forced_dist else {}
        got = (semi_join(rd.from_pandas(left), rd.from_pandas(right),
                         on=["a", "b"], **kw)
               .to_pandas().sort_values("v").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)
        assert got["a"].dtype == np.int64 and got["v"].dtype == np.float64


def test_semi_join_distributed_string_columns_one_sided_buckets():
    # empty-bucket dtype flap regression: with many buckets and few keys,
    # most buckets hold rows of only one side; string payload columns must
    # come back object-dtype, not NaN-padded float64
    from raygraph.joins import semi_join

    left = pd.DataFrame({
        "k": np.array([1, 2, 3, 4], np.int64),
        "s": ["aa", "bb", "cc", "dd"],
    })
    right = pd.DataFrame({"k": np.array([2, 4], np.int64)})
    got = (
        semi_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                  broadcast_limit=0, num_buckets=32)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = left[left["k"].isin([2, 4])].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["s"].dtype == object


def test_lookup_broadcast_empty_map():
    from raygraph.joins import lookup_broadcast

    karr = np.empty(0, dtype=np.int64)
    varr = np.empty(0, dtype=np.float64)
    vals, found = lookup_broadcast(
        np.array([1, 2, 3], np.int64), (karr, varr), missing="mask"
    )
    assert not found.any() and len(vals) == 3
    with pytest.raises(KeyError):
        lookup_broadcast(np.array([1], np.int64), (karr, varr))
    # empty keys against empty map: fine either way
    out = lookup_broadcast(np.empty(0, np.int64), (karr, varr))
    assert len(out) == 0
