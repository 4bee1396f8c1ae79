"""Tests for the ``python -m raygraph`` job entry point (in-process:
the conftest session fixture owns Ray, so ``_ray_up`` is a no-op)."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from raygraph.__main__ import main


def _edges_parquet(tmp_path):
    d = tmp_path / "edges"
    d.mkdir()
    df = pd.DataFrame(
        {
            "src_key": ["a", "b", "c", "d", "a"],
            "dst_key": ["b", "c", "a", "a", "c"],
            "weight": [1.0, 1.0, 1.0, 1.0, 1.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), d / "part0.parquet")
    return str(d)


def test_cli_build_then_pagerank(tmp_path, capsys):
    edges = _edges_parquet(tmp_path)
    gdir = str(tmp_path / "graph")
    assert main(["build", "--edges-parquet", edges, "--out", gdir,
                 "--directed"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["vertices"] == 4 and meta["edges"] == 5

    out = str(tmp_path / "pr")
    assert main(["pagerank", "--graph", gdir, "--out", out]) == 0
    res = rd.read_parquet(out).to_pandas()
    assert len(res) == 4
    assert abs(res["pagerank"].sum() - 1.0) < 1e-9
    assert set(res["vertex"]) == {"a", "b", "c", "d"}  # unrenumbered keys


def test_cli_derive_and_query(tmp_path, capsys):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    df = pd.DataFrame(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["x.py", "y.py", "z.py"],
            "commit": ["c"] * 3,
            "lang": ["py"] * 3,
            "content": ["import os\n", "import sys\nimport os\n", "pass\n"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), corpus / "p.parquet")
    out = str(tmp_path / "edges_out")
    assert main(["derive", "--corpus", str(corpus), "--out", out]) == 0
    edges = rd.read_parquet(out).to_pandas()
    # 3 membership + 3 import edges (y.py imports two modules)
    assert (edges["src_key"].str.startswith("repo::")).sum() == 3
    assert (edges["dst_key"].str.startswith("mod::")).sum() == 3

    qout = str(tmp_path / "q")
    assert main(["query", "--name", "token_count",
                 "--sf-dir", "/root/testdata/sf0.001", "--out", qout]) == 0
    q = rd.read_parquet(qout).to_pandas()
    assert len(q) > 0 and "n_tokens" in q.columns

    assert main(["query", "--name", "zzz-nope",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--out", qout]) == 2
