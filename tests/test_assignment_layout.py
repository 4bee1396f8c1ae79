"""Hungarian linear assignment (vs brute force) + Force Atlas 2 layout
structure/determinism.  Reference: linear_assignment/lap.py,
layout/force_atlas2.py."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raygraph.algos.assignment import (
    batched_dense_hungarian,
    dense_hungarian,
    hungarian,
)
from raygraph.graph import Graph


def brute_cost(C):
    n, m = C.shape
    best = np.inf
    for perm in itertools.permutations(range(m), n):
        best = min(best, C[np.arange(n), list(perm)].sum())
    return best


def test_dense_hungarian_square_vs_bruteforce():
    rng = np.random.RandomState(3)
    for _ in range(20):
        C = rng.rand(5, 5) * 10
        cost, assign = dense_hungarian(C.ravel(), 5, 5)
        assert sorted(assign) == list(range(5))  # a permutation
        assert np.isclose(cost, C[np.arange(5), assign].sum())
        assert np.isclose(cost, brute_cost(C))


def test_dense_hungarian_rectangular():
    rng = np.random.RandomState(4)
    # wide: every row assigned
    C = rng.rand(3, 6)
    cost, assign = dense_hungarian(C.ravel(), 3, 6)
    assert len(set(assign)) == 3 and (assign >= 0).all()
    assert np.isclose(cost, brute_cost(C))
    # tall: only num_columns rows assigned, rest -1
    C = rng.rand(6, 3)
    cost, assign = dense_hungarian(C.ravel(), 6, 3)
    assert (assign >= 0).sum() == 3
    assert np.isclose(cost, brute_cost(C.T))


def test_hungarian_bipartite_graph(tmp_path):
    # workers 0-2, jobs 10-12, complete bipartite with known optimum
    costs = {(0, 10): 4, (0, 11): 1, (0, 12): 3,
             (1, 10): 2, (1, 11): 0, (1, 12): 5,
             (2, 10): 3, (2, 11): 2, (2, 12): 2}
    df = pd.DataFrame(
        {"src": [k[0] for k in costs], "dst": [k[1] for k in costs],
         "weight": [float(v) for v in costs.values()]}
    )
    g = Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=True, renumber=False, num_partitions=2,
        out_dir=str(tmp_path / "bip"),
    )
    cost, out = hungarian(g, [0, 1, 2])
    # optimum: 0→11(1), 1→10(2), 2→12(2) = 5
    assert np.isclose(cost, 5.0)
    got = dict(zip(out["vertex"], out["assignment"]))
    assert got == {0: 11, 1: 10, 2: 12}


def test_batched_hungarian_matches_single():
    rng = np.random.RandomState(5)
    rows = []
    want = {}
    for pid in range(6):
        C = rng.rand(4, 4)
        want[pid], _ = dense_hungarian(C.ravel(), 4, 4)
        for i in range(4):
            for j in range(4):
                rows.append({"problem": pid, "row": i, "col": j,
                             "cost": float(C[i, j])})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = batched_dense_hungarian(ds).to_pandas()
    for pid in range(6):
        sub = out[out["problem"] == pid]
        assert len(sub) == 4
        assert sorted(sub["row"]) == list(range(4))
        assert sorted(sub["col"]) == list(range(4))
        assert np.isclose(sub["cost"].sum(), want[pid])


# ------------------------------------------------------------------- FA2


def _two_cliques_graph(tmp_path, name):
    n = 8
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)]
    edges += [(a, b) for a in range(n, 2 * n) for b in range(a + 1, 2 * n)]
    edges += [(0, n)]
    df = pd.DataFrame(
        {"src": [u for u, _ in edges], "dst": [v for _, v in edges],
         "weight": np.ones(len(edges))}
    )
    return Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(tmp_path / name),
    )


def test_force_atlas2_separates_cliques(tmp_path):
    from raygraph.algos.layout import force_atlas2

    g = _two_cliques_graph(tmp_path, "fa2")
    pos = force_atlas2(g, max_iter=60, num_workers=4).to_pandas()
    pos = pos.sort_values("vertex")
    xy = pos[["x", "y"]].to_numpy()
    assert len(pos) == 16 and np.isfinite(xy).all()
    c0 = xy[:8].mean(axis=0)
    c1 = xy[8:].mean(axis=0)
    # mean intra-clique spread < inter-centroid distance (clusters separate)
    spread0 = np.linalg.norm(xy[:8] - c0, axis=1).mean()
    spread1 = np.linalg.norm(xy[8:] - c1, axis=1).mean()
    gap = np.linalg.norm(c0 - c1)
    assert gap > max(spread0, spread1)


def test_force_atlas2_deterministic(tmp_path):
    from raygraph.algos.layout import force_atlas2

    g = _two_cliques_graph(tmp_path, "fa2d")
    a = force_atlas2(g, max_iter=20, num_workers=4).to_pandas().sort_values("vertex")
    b = force_atlas2(g, max_iter=20, num_workers=4).to_pandas().sort_values("vertex")
    assert np.allclose(a[["x", "y"]].to_numpy(), b[["x", "y"]].to_numpy())


def test_force_atlas2_unsupported_knobs(tmp_path):
    from raygraph.algos.layout import force_atlas2

    g = _two_cliques_graph(tmp_path, "fa2u")
    with pytest.raises(NotImplementedError):
        force_atlas2(g, pos_list=pd.DataFrame())
    with pytest.raises(NotImplementedError):
        force_atlas2(g, lin_log_mode=True)
