"""Sources/sinks + prim-layer wrappers + RMAT skew stress."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from raygraph import generators, ops, sources
from raygraph.graph import Graph

from tests import fixtures


def test_read_edges_csv_headerless(tmp_path):
    p = tmp_path / "edges.csv"
    p.write_text("0 1 2.5\n1 2 1.0\n2 0 3.0\n")
    ds = sources.read_edges_csv(
        str(p), column_names=["src", "dst", "weight"], weight="weight"
    )
    df = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(df["weight"]) == [2.5, 1.0, 3.0]
    assert df["weight"].dtype == np.float64


def test_pandas_roundtrip_and_numpy(tmp_path):
    g = Graph.from_edges(
        sources.from_pandas_edgelist(fixtures.karate_df(), weight="weight"),
        src="src", dst="dst", weight="weight",
        directed=True, renumber=False, num_partitions=2,
        out_dir=str(tmp_path / "g"),
    )
    df = sources.to_pandas_edgelist(g)
    assert len(df) == len(fixtures.KARATE_EDGES)
    A = sources.to_numpy_array(g)
    assert A.sum() == len(fixtures.KARATE_EDGES)
    assert A[0, 1] == 1.0 and A[1, 0] == 0.0


def test_prim_wrappers(tmp_path):
    g = Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=True, renumber=False, num_partitions=2,
        out_dir=str(tmp_path / "p"),
    )
    # transform_reduce_e: total weight
    tot = ops.transform_reduce_e(
        g, lambda t: pa.table({"value": t.column("weight")})
    )
    assert tot == len(fixtures.KARATE_EDGES)
    # count_if_e: edges out of vertex 0
    n0 = ops.count_if_e(g, lambda t: t.column("src").to_numpy() == 0)
    assert n0 == 16
    ex = ops.extract_if_e(g, lambda t: t.column("src").to_numpy() == 0).to_pandas()
    assert len(ex) == 16
    vds = rd.from_pandas(pd.DataFrame({"vertex": np.arange(5), "value": np.ones(5)}))
    assert ops.reduce_v(vds) == 5.0
    assert ops.count_if_v(vds, lambda t: t.column("vertex").to_numpy() >= 3) == 2


def test_pagerank_on_rmat_skewed(tmp_path):
    """M7 stress: power-law RMAT graph through the full stack; worker-count
    invariance under heavy hub skew (Graph500 a/b/c, seed 42)."""
    from raygraph.algos import pagerank

    edges = generators.rmat_dataset(scale=10, edgefactor=8, seed=42)
    g = Graph.from_edges(
        edges, src="src", dst="dst", weight="weight",
        directed=True, renumber=False, dedup="sum", num_partitions=8,
        out_dir=str(tmp_path / "rmat"),
    )
    a = pagerank(g, tol=1e-6, max_iter=300, num_workers=1).to_pandas()
    b = pagerank(g, tol=1e-6, max_iter=300, num_workers=4).to_pandas()
    a = a.sort_values("vertex")["pagerank"].to_numpy()
    b = b.sort_values("vertex")["pagerank"].to_numpy()
    assert np.allclose(a, b, atol=1e-10)
    assert abs(a.sum() - 1.0) < 1e-8
    # hubs exist and get large mass (skew actually present)
    assert a.max() > 20 * np.median(a[a > 0])


def test_lpt_assignment_balances_hot_partitions(tmp_path):
    """M7: a hot-src partition must not stack with siblings on one worker."""
    import pandas as pd

    from raygraph.superstep import SuperstepEngine

    # one vertex with 8000 out-edges (one hot partition), plus a light ring
    hot = pd.DataFrame({"src": np.zeros(8000, np.int64),
                        "dst": np.arange(1, 8001), "weight": np.ones(8000)})
    ring = pd.DataFrame({"src": np.arange(1, 8001),
                         "dst": np.roll(np.arange(1, 8001), 1),
                         "weight": np.ones(8000)})
    df = pd.concat([hot, ring], ignore_index=True)
    g = Graph.from_edges(
        rd.from_pandas(df), src="src", dst="dst", weight="weight",
        directed=True, renumber=False, num_partitions=8,
        out_dir=str(tmp_path / "hotg"),
    )
    import ray

    eng = SuperstepEngine(g, num_workers=4)
    try:
        infos = ray.get([w.info.remote() for w in eng.workers])
        loads = sorted(i["edges"] for i in infos)
        # the heaviest worker carries the hot partition but not much more;
        # round-robin (p % W) would give ~8000 + 2000 to one worker
        assert loads[-1] <= 8000 + 2500
        assert sum(loads) == g.num_edges
        # correctness unchanged under the balanced assignment
        from raygraph.algos import pagerank as _pr  # noqa: F401
    finally:
        eng.shutdown()

    from raygraph.algos import pagerank

    a = pagerank(g, tol=1e-8, max_iter=200, num_workers=4).to_pandas()
    b = pagerank(g, tol=1e-8, max_iter=200, num_workers=2).to_pandas()
    av = a.sort_values("vertex")["pagerank"].to_numpy()
    bv = b.sort_values("vertex")["pagerank"].to_numpy()
    assert np.allclose(av, bv, atol=1e-10)


# ----------------------------------------------------------------- MTX


def test_read_edges_mtx_general_and_symmetric(tmp_path):
    from raygraph.sources import read_edges_mtx
    from raygraph.graph import Graph

    gen = tmp_path / "g.mtx"
    gen.write_text(
        "%%MatrixMarket matrix coordinate real general\n"
        "% a comment\n"
        "4 4 3\n"
        "1 2 1.5\n"
        "2 3 2.0\n"
        "4 1 0.5\n"
    )
    edges, meta = read_edges_mtx(str(gen))
    df = edges.to_pandas().sort_values(["src_key", "dst_key"]).reset_index(drop=True)
    assert meta == {"rows": 4, "cols": 4, "nnz": 3, "symmetric": False,
                    "pattern": False}
    assert df["src_key"].tolist() == [0, 1, 3]
    assert df["dst_key"].tolist() == [1, 2, 0]
    assert df["weight"].tolist() == [1.5, 2.0, 0.5]

    sym = tmp_path / "s.mtx"
    sym.write_text(
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "3 3 2\n"
        "2 1\n"
        "3 1\n"
    )
    edges, meta = read_edges_mtx(str(sym))
    assert meta["symmetric"] and meta["pattern"]
    df = edges.to_pandas().sort_values(["src_key", "dst_key"]).reset_index(drop=True)
    # both directions, weight 1.0
    assert list(zip(df["src_key"], df["dst_key"])) == [
        (0, 1), (0, 2), (1, 0), (2, 0)
    ]
    assert (df["weight"] == 1.0).all()

    # feeds Graph.from_edges directly (canonical src_key/dst_key schema)
    g = Graph.from_edges(edges, directed=True, renumber=False,
                         num_partitions=2, out_dir=str(tmp_path / "gmtx"))
    assert g.num_edges == 4


def test_read_parquet_dir_flat_and_hive(tmp_path):
    # flat engine-result layout -> read_parquet_bulk fast path (no remote
    # metadata/sampling tasks at handle creation); hive layout -> stock
    # read_parquet so key=value path segments come back as columns.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raygraph.sources import read_parquet_dir

    flat = tmp_path / "flat"
    flat.mkdir()
    for p in range(3):
        pq.write_table(
            pa.table({"vertex": [p * 10, p * 10 + 1], "pr": [0.1, 0.2]}),
            str(flat / f"part-{p:05d}.parquet"),
        )
    ds = read_parquet_dir(str(flat))
    df = ds.to_pandas().sort_values("vertex").reset_index(drop=True)
    assert list(df.columns) == ["vertex", "pr"]
    assert df["vertex"].tolist() == [0, 1, 10, 11, 20, 21]

    # column pruning works on the fast path
    assert read_parquet_dir(str(flat), columns=["vertex"]).schema().names == [
        "vertex"
    ]

    hive = tmp_path / "hive"
    for p in range(2):
        d = hive / f"part={p}"
        d.mkdir(parents=True)
        pq.write_table(pa.table({"src": [p], "dst": [p + 1]}),
                       str(d / "f.parquet"))
    hdf = read_parquet_dir(str(hive)).to_pandas().sort_values("src")
    assert "part" in hdf.columns  # hive partition column preserved
    assert sorted(hdf["part"].astype(int).tolist()) == [0, 1]

    # past the driver-files cap the stock reader handles flat dirs too
    big = read_parquet_dir(str(flat), max_driver_files=2)
    assert big.count() == 6


def test_networkx_interop_roundtrip(tmp_path):
    """nx_factory.py parity: nx → Graph → algorithms → dict helpers →
    back to nx."""
    nx = pytest.importorskip("networkx")
    from raygraph import nx_interop
    from raygraph.algos.pagerank import pagerank

    G = nx.karate_club_graph()
    g = nx_interop.from_networkx(G, num_partitions=4,
                                 out_dir=str(tmp_path / "nxg"))
    assert not g.directed
    assert g.num_vertices == 34
    assert g.num_edges == 2 * G.number_of_edges()

    pr = pagerank(g, tol=1e-8).to_pandas()
    pr = g.unrenumber(
        __import__("ray").data.from_pandas(pr), "vertex"
    ).to_pandas()
    d = nx_interop.df_score_to_dictionary(pr, "pagerank")
    # numpy power-iteration oracle (nx.pagerank needs scipy, absent here)
    A = np.zeros((34, 34))
    for a, b, attrs in G.edges(data=True):
        A[a, b] = A[b, a] = float(attrs.get("weight", 1.0))
    deg = A.sum(axis=1)
    x = np.full(34, 1 / 34)
    for _ in range(500):
        x = 0.15 / 34 + 0.85 * (A.T / deg).dot(x)
    for v in range(34):
        key = v if v in d else str(v)
        assert abs(d[key] - x[v]) < 1e-4

    back = nx_interop.to_networkx(g)
    # renumbered graphs come back with their external (string) keys
    assert back.number_of_nodes() == 34
    assert back.number_of_edges() == G.number_of_edges()
    assert {tuple(sorted((int(a), int(b)))) for a, b in back.edges()} == {
        tuple(sorted(e)) for e in G.edges()
    }

    # weighted DiGraph direction + weight attr
    D = nx.DiGraph()
    D.add_edge(1, 2, weight=3.0)
    D.add_edge(2, 3, weight=0.5)
    gd = nx_interop.from_networkx(D, renumber=False, num_partitions=2,
                                  out_dir=str(tmp_path / "nxd"))
    assert gd.directed and gd.num_edges == 2
    e = gd.edges_dataset(columns=["src", "dst", "weight"]).to_pandas()
    assert nx_interop.df_edge_score_to_dictionary(e, "weight") == {
        (1, 2): 3.0, (2, 3): 0.5
    }
