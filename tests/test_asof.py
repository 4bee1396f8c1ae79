"""Tests: distributed as-of join vs a pandas merge_asof oracle."""

import numpy as np
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
