"""Checkpoint / lineage / mid-algorithm resume (north rule requirement).

Pattern from SURVEY.md §5.2.6: interrupt after superstep k, resume, compare
to the uninterrupted run.
"""

import json

import numpy as np
import pytest
import ray.data as rd

from raygraph.algos import ConvergenceError, pagerank, weakly_connected_components
from raygraph.graph import Graph

from tests import fixtures


def _build(tmp_path, name, directed=False):
    return Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=directed, renumber=False, num_partitions=4,
        out_dir=str(tmp_path / name),
    )


def _vec(ds, col):
    return ds.to_pandas().sort_values("vertex")[col].to_numpy()


def test_pagerank_resume_matches_uninterrupted(tmp_path):
    g = _build(tmp_path, "g")
    full = _vec(pagerank(g, tol=1e-8, max_iter=300), "pagerank")

    ckpt = str(tmp_path / "ckpt")
    # interrupted run: dies (raises) after 5 supersteps, checkpoints kept
    with pytest.raises(ConvergenceError):
        pagerank(g, tol=1e-8, max_iter=5, checkpoint_dir=ckpt)

    lineage = [json.loads(l) for l in open(tmp_path / "ckpt" / "lineage.jsonl")]
    assert [r["iteration"] for r in lineage] == [0, 1, 2, 3, 4]
    rec = lineage[-1]
    # per-partition lineage metadata per north rule
    assert {p["partition_id"] for p in rec["partitions"]} == {0, 1, 2, 3}
    assert rec["rows_in"] > 0 and rec["rows_out"] > 0 and rec["shuffle_bytes"] > 0
    assert rec["complete"]

    resumed = _vec(
        pagerank(g, tol=1e-8, max_iter=300, checkpoint_dir=ckpt, resume=True),
        "pagerank",
    )
    assert np.allclose(full, resumed, atol=1e-12)
    # resume actually skipped work: lineage continues from iteration 5
    lineage2 = [json.loads(l) for l in open(tmp_path / "ckpt" / "lineage.jsonl")]
    assert lineage2[5]["iteration"] == 5


def test_pagerank_resume_different_worker_count(tmp_path):
    # state files are keyed by graph partition, not worker — resume with
    # a different parallelism must give the same answer
    g = _build(tmp_path, "g2")
    full = _vec(pagerank(g, tol=1e-8, max_iter=300, num_workers=2), "pagerank")
    ckpt = str(tmp_path / "ckpt2")
    with pytest.raises(ConvergenceError):
        pagerank(g, tol=1e-8, max_iter=4, checkpoint_dir=ckpt, num_workers=4)
    resumed = _vec(
        pagerank(g, tol=1e-8, max_iter=300, checkpoint_dir=ckpt, resume=True,
                 num_workers=2),
        "pagerank",
    )
    assert np.allclose(full, resumed, atol=1e-10)


def test_wcc_resume(tmp_path):
    g = _build(tmp_path, "g3")
    full = _vec(weakly_connected_components(g), "labels")
    ckpt = str(tmp_path / "ckpt3")
    with pytest.raises(RuntimeError):
        weakly_connected_components(g, max_iter=2, checkpoint_dir=ckpt)
    resumed = _vec(
        weakly_connected_components(g, checkpoint_dir=ckpt, resume=True), "labels"
    )
    assert np.array_equal(full, resumed)


def test_checkpoint_every_sparse_cadence(tmp_path):
    """checkpoint_every=3 writes every 3rd superstep; resume starts from the
    latest complete one and still converges to the same scores."""
    g = _build(tmp_path, "g4")
    full = _vec(pagerank(g, tol=1e-8, max_iter=300), "pagerank")
    ckpt = str(tmp_path / "ckpt4")
    with pytest.raises(ConvergenceError):
        pagerank(g, tol=1e-8, max_iter=8, checkpoint_dir=ckpt, checkpoint_every=3)
    lineage = [json.loads(l) for l in open(tmp_path / "ckpt4" / "lineage.jsonl")]
    assert [r["iteration"] for r in lineage] == [0, 3, 6]
    resumed = _vec(
        pagerank(g, tol=1e-8, max_iter=300, checkpoint_dir=ckpt, resume=True,
                 checkpoint_every=3),
        "pagerank",
    )
    assert np.allclose(full, resumed, atol=1e-10)


def test_bfs_sssp_resume_matches_uninterrupted(tmp_path):
    import pandas as pd
    import ray.data as rd

    from raygraph.algos.traversal import bfs, sssp
    from raygraph.graph import Graph

    from tests import fixtures

    g = Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(tmp_path / "g"),
    )
    full_b = bfs(g, 0).to_pandas().sort_values("vertex")
    full_s = sssp(g, 0).to_pandas().sort_values("vertex")

    # interrupt bfs after 1 superstep, then resume from checkpoint
    ckpt_b = str(tmp_path / "ckb")
    try:
        bfs(g, 0, max_iter=1, checkpoint_dir=ckpt_b)
    except RuntimeError:
        pass  # frontier not settled — expected interruption
    res_b = (
        bfs(g, 0, checkpoint_dir=ckpt_b, resume=True)
        .to_pandas().sort_values("vertex")
    )
    assert np.array_equal(full_b["distance"].to_numpy(), res_b["distance"].to_numpy())
    assert np.array_equal(
        full_b["predecessor"].to_numpy(), res_b["predecessor"].to_numpy()
    )

    ckpt_s = str(tmp_path / "cks")
    try:
        sssp(g, 0, max_iter=1, checkpoint_dir=ckpt_s)
    except RuntimeError:
        pass
    res_s = (
        sssp(g, 0, checkpoint_dir=ckpt_s, resume=True, num_workers=2)
        .to_pandas().sort_values("vertex")
    )
    assert np.allclose(full_s["distance"].to_numpy(), res_s["distance"].to_numpy())


def test_katz_eigenvector_resume(tmp_path):
    import ray.data as rd

    from raygraph.algos.centrality import eigenvector_centrality, katz_centrality
    from raygraph.graph import Graph

    from tests import fixtures

    g = Graph.from_edges(
        rd.from_pandas(fixtures.karate_df()),
        src="src", dst="dst", weight="weight",
        directed=False, renumber=False, num_partitions=4,
        out_dir=str(tmp_path / "gk"),
    )
    full = (
        katz_centrality(g, alpha=0.01, tol=1e-9, max_iter=200)
        .to_pandas().sort_values("vertex")["katz_centrality"].to_numpy()
    )
    ck = str(tmp_path / "ckk")
    try:
        katz_centrality(g, alpha=0.01, tol=1e-9, max_iter=3, checkpoint_dir=ck)
    except Exception:
        pass  # ConvergenceError — interrupted on purpose
    res = (
        katz_centrality(g, alpha=0.01, tol=1e-9, max_iter=200,
                        checkpoint_dir=ck, resume=True)
        .to_pandas().sort_values("vertex")["katz_centrality"].to_numpy()
    )
    assert np.allclose(full, res, atol=1e-9)

    full_e = (
        eigenvector_centrality(g, tol=1e-9, max_iter=300)
        .to_pandas().sort_values("vertex")["eigenvector_centrality"].to_numpy()
    )
    ce = str(tmp_path / "cke")
    try:
        eigenvector_centrality(g, tol=1e-9, max_iter=3, checkpoint_dir=ce)
    except Exception:
        pass
    res_e = (
        eigenvector_centrality(g, tol=1e-9, max_iter=300,
                               checkpoint_dir=ce, resume=True, num_workers=2)
        .to_pandas().sort_values("vertex")["eigenvector_centrality"].to_numpy()
    )
    assert np.allclose(full_e, res_e, atol=1e-8)
