"""Weakly connected components — min-label propagation to fixpoint.

Semantics: the reference's legacy WCC fixpoint
(``cpp/src/components/legacy/weak_cc.cuh:60-130``): init ``label[v]=v``,
iterate ``label[v] = min(label[v], min_{u∈N(v)} label[u])`` until no label
changes.  Output contract (``components/connectivity.py:152-159``;
exactness up to bijection per
``cpp/tests/components/weakly_connected_components_test.cpp:178-190``):
Dataset ``(vertex:int64, labels:int64)``.  Our labels are canonical — the
minimum vertex id in each component — so output is bitwise deterministic
(stronger than the reference, SURVEY.md §5.2.4).

The frontier optimization of the modern impl
(``weakly_connected_components_impl.cuh:520`` "iterate till every vertex
gets visited") appears here as the ``active`` mask: only vertices whose
label changed last superstep re-emit.
"""

from __future__ import annotations

from typing import Optional

import ray

from raygraph.superstep import SuperstepEngine


def weakly_connected_components(
    graph,
    max_iter: int = 1000,
    num_workers: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    out_dir: Optional[str] = None,
):
    """Min-label propagation; requires a symmetrized (undirected) graph.

    Weak connectivity is defined on the underlying undirected graph; build
    with ``directed=False`` (the reference symmetrizes on construction,
    ``simpleGraph.py:215-229``).
    """
    if graph.directed:
        raise ValueError(
            "weakly_connected_components requires a symmetrized graph; "
            "build with directed=False"
        )
    engine = SuperstepEngine(
        graph, num_workers=num_workers,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
    )
    try:
        return _run(engine, max_iter, checkpoint_dir, resume, out_dir)
    finally:
        engine.shutdown()


def _run(engine, max_iter, checkpoint_dir, resume, out_dir):
    ray.get([w.cc_init.remote() for w in engine.workers])

    start_iter = 0
    if resume and checkpoint_dir:
        latest = engine.latest_complete_iteration("wcc")
        if latest is not None:
            engine._restore("wcc", latest, ["labels", "active"])
            start_iter = latest + 1

    import time

    done = False
    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        scatter_stats, update_stats = engine._exchange("cc_scatter", "cc_update")
        changed = sum(s["changed"] for s in update_stats)
        wall = time.perf_counter() - t0
        if checkpoint_dir and (it % engine.checkpoint_every == 0 or changed == 0):
            engine._checkpoint(
                "wcc", it, ["labels", "active"],
                {
                    "changed": changed,
                    "wall_sec": wall,
                    "rows_out": sum(s["rows_out"] for s in scatter_stats),
                    "rows_in": sum(s["rows_in"] for s in update_stats),
                    "shuffle_bytes": sum(s["bytes_out"] for s in scatter_stats),
                },
            )
        if changed == 0:
            done = True
            break
    if not done:
        raise RuntimeError(f"WCC did not reach fixpoint in {max_iter} supersteps")

    import pyarrow as pa

    ds = engine.result_dataset(["labels"], out_dir=out_dir)
    return ds.map_batches(
        lambda t: pa.table({"vertex": t.column("vertex"), "labels": t.column("labels")}),
        batch_format="pyarrow",
    )
