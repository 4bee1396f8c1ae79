"""hash_aggregate / distinct / bucketed_map_groups vs pandas ground truth."""

import numpy as np
import pandas as pd
import ray.data as rd

from raygraph.agg import bucketed_map_groups, distinct, hash_aggregate


def _df(n=10_000, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "k1": rng.randint(0, 50, n),
            "k2": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.uniform(0, 10, n),
        }
    )


def test_hash_aggregate_matches_pandas():
    df = _df()
    out = (
        hash_aggregate(
            rd.from_pandas(df),
            ["k1", "k2"],
            {"n": (None, "count"), "s": ("v", "sum"), "mn": ("v", "min"),
             "mx": ("v", "max")},
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"], as_index=False)
        .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"), mx=("v", "max"))
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    assert np.array_equal(out["n"].to_numpy(), want["n"].to_numpy())
    assert np.allclose(out["s"].to_numpy(), want["s"].to_numpy())
    assert np.allclose(out["mn"].to_numpy(), want["mn"].to_numpy())
    assert np.allclose(out["mx"].to_numpy(), want["mx"].to_numpy())


def test_distinct():
    df = _df(5000)
    out = distinct(rd.from_pandas(df), ["k1"]).to_pandas()
    assert sorted(out["k1"]) == sorted(df["k1"].unique())


def test_min_on_strings():
    df = pd.DataFrame({"g": [1, 1, 2], "s": ["zebra", "apple", "kiwi"]})
    out = hash_aggregate(rd.from_pandas(df), ["g"], {"m": ("s", "min")}).to_pandas()
    m = out.set_index("g")["m"]
    assert m[1] == "apple" and m[2] == "kiwi"


def test_bucketed_map_groups_sees_complete_groups():
    df = _df(4000)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k1": [g["k1"].iloc[0]], "total": [g["v"].sum()]})

    out = bucketed_map_groups(rd.from_pandas(df), ["k1"], fn).to_pandas()
    want = df.groupby("k1")["v"].sum()
    assert len(out) == len(want)
    m = out.set_index("k1")["total"]
    for k, v in want.items():
        assert abs(m[k] - v) < 1e-9


def test_grouped_topk_matches_pandas():
    from raygraph.agg import grouped_topk

    df = _df(6000)
    df["rid"] = np.arange(len(df))  # total-order tiebreak
    out = grouped_topk(
        rd.from_pandas(df), ["k1"], ["v", "rid"], k=3
    ).to_pandas()
    want = (
        df.sort_values(["k1", "v", "rid"], ascending=[True, False, False])
        .groupby("k1", sort=False)
        .head(3)
    )
    key = ["k1", "rid"]
    a = out.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)[a.columns]
    assert a.equals(b)


def test_grouped_topk_ascending_bottom_k():
    from raygraph.agg import grouped_topk

    df = _df(2000)
    df["rid"] = np.arange(len(df))
    out = grouped_topk(
        rd.from_pandas(df), ["k2"], ["v", "rid"], k=2, ascending=True
    ).to_pandas()
    want = (
        df.sort_values(["k2", "v", "rid"], ascending=[True, True, True])
        .groupby("k2", sort=False)
        .head(2)
    )
    assert len(out) == len(want)
    assert set(map(tuple, out[["k2", "rid"]].to_numpy())) == set(
        map(tuple, want[["k2", "rid"]].to_numpy())
    )
