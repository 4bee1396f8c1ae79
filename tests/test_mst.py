"""Tests: minimum/maximum spanning forest vs a Kruskal oracle.

The Borůvka implementation breaks ties by the strict total order
(weight, a, b) over canonical internal edges, which makes the MSF unique
— so Kruskal under the same order must produce the identical edge set.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raygraph.algos.mst import maximum_spanning_tree, minimum_spanning_tree
from raygraph.graph import Graph

from tests import fixtures


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    a = np.minimum(df["src"], df["dst"]).to_numpy(np.int64)
    b = np.maximum(df["src"], df["dst"]).to_numpy(np.int64)
    w = df["weight"].to_numpy(np.float64)
    out = pd.DataFrame({"a": a, "b": b, "w": w})
    out = out[out.a != out.b]
    return out.groupby(["a", "b"], as_index=False)["w"].min()


def _kruskal(df: pd.DataFrame) -> pd.DataFrame:
    """Exact MSF under the (w, a, b) total order; union-find oracle."""
    e = _canon(df).sort_values(["w", "a", "b"]).to_numpy()
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    rows = []
    for a, b, w in e:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
            rows.append((int(a), int(b), float(w)))
    return pd.DataFrame(rows, columns=["src", "dst", "weight"])


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["src", "dst"]).reset_index(drop=True)


def _build(df: pd.DataFrame, tmp_path, parts=4) -> Graph:
    return Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=parts,
        out_dir=str(tmp_path / "g"),
    )


def test_mst_karate_matches_kruskal(tmp_path):
    # karate weights are all 1.0 — a full-tie stress of the total order
    df = fixtures.karate_df()
    g = _build(df, tmp_path)
    got = _sorted(minimum_spanning_tree(g).to_pandas())
    want = _sorted(_kruskal(df))
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == fixtures.KARATE_V - 1  # connected → spanning tree


def test_mst_random_weights_and_forest(tmp_path):
    rng = np.random.default_rng(7)
    # two disjoint ER blocks + isolated vertex 99 → a 3-component forest
    rows = []
    for lo, n in ((0, 40), (50, 30)):
        for _ in range(n * 4):
            u, v = rng.integers(lo, lo + n, size=2)
            rows.append((u, v, float(rng.integers(1, 20))))  # repeated ties
    df = pd.DataFrame(rows, columns=["src", "dst", "weight"])
    df = pd.concat(
        [df, pd.DataFrame({"src": [99], "dst": [99], "weight": [1.0]})]
    )
    g = _build(df, tmp_path)
    got = _sorted(minimum_spanning_tree(g).to_pandas())
    want = _sorted(_kruskal(df))
    pd.testing.assert_frame_equal(got, want)
    # the two blocks never merge and the self-loop vertex contributes nothing
    assert not ((got.src < 50) & (got.dst >= 50)).any()
    assert 99 not in set(got.src) | set(got.dst)


def test_mst_partition_count_invariance(tmp_path):
    df = fixtures.karate_df()
    a = _sorted(
        minimum_spanning_tree(_build(df, tmp_path / "p2", parts=2)).to_pandas()
    )
    b = _sorted(
        minimum_spanning_tree(_build(df, tmp_path / "p7", parts=7)).to_pandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_mst_forced_distributed_path_matches(tmp_path):
    # local_edge_limit=0 + driver_limit=0 force the pointer-doubling
    # scale path; the default (local) run must match it exactly
    df = fixtures.karate_df()
    g = _build(df, tmp_path)
    dist = _sorted(minimum_spanning_tree(g, driver_limit=0,
                                         local_edge_limit=0).to_pandas())
    want = _sorted(_kruskal(df))
    pd.testing.assert_frame_equal(dist, want)
    loc = _sorted(minimum_spanning_tree(g).to_pandas())
    pd.testing.assert_frame_equal(loc, dist)


def test_maximum_spanning_tree(tmp_path):
    rng = np.random.default_rng(11)
    u = rng.integers(0, 25, size=120)
    v = rng.integers(0, 25, size=120)
    df = pd.DataFrame(
        {"src": u, "dst": v,
         "weight": rng.integers(1, 9, size=120).astype(float)}
    )
    g = _build(df, tmp_path)
    got = _sorted(maximum_spanning_tree(g).to_pandas())
    # the undirected build min-dedups parallel edges BEFORE the negate —
    # the oracle must apply the same stored-graph rule
    canon = _canon(df).rename(columns={"a": "src", "b": "dst", "w": "weight"})
    want = _kruskal(canon.assign(weight=-canon.weight)).assign(
        weight=lambda d: -d.weight
    )
    pd.testing.assert_frame_equal(got, _sorted(want))
    # max-forest total weight ≥ min-forest total weight
    mn = minimum_spanning_tree(g).to_pandas()
    assert got.weight.sum() >= mn.weight.sum()
