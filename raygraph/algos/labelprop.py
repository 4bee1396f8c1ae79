"""Label propagation (community LPA) — synchronous weighted-majority variant.

Absent from the reference (SURVEY.md §2.4); contract adopted from
Raghavan et al. 2007, made deterministic:

* init ``label[v] = v``
* per superstep, every vertex simultaneously takes the label with the
  maximum total incident edge weight among its neighbors; ties broken by the
  **minimum** label; vertices with no neighbors keep their label.
* stop when no label changes, or after ``max_iter`` supersteps (synchronous
  LPA can 2-cycle on bipartite structures, so hitting max_iter is NOT an
  error — the labels at max_iter are returned; with a fixed superstep count
  and tie rule the output is exactly reproducible, which is the
  "exact up to label canonicalization" test contract).

Nearest reference kin: the min-label fixpoint (``weak_cc.cuh:60-130``) and
Louvain's assign-to-best-cluster step (``louvain_impl.cuh:119-139``); the
(dst, label) two-level aggregation in the scatter is the same shape as
``per_v_transform_reduce_dst_key_aggregated_outgoing_e.cuh`` (the Louvain
prim built to tame high-degree vertices).

Output: Dataset ``(vertex:int64, label:int64)``.
"""

from __future__ import annotations

from typing import Optional

import ray

from raygraph.superstep import SuperstepEngine


def _lpa_local(graph, max_iter, out_dir):
    """Driver-local synchronous LPA for small graphs — identical
    decisions to the engine rounds (argmax incident label weight, ties
    to the MIN label; sums are exact for integral weights, where the
    contract is bit-reproducible)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    V = graph.num_vertices
    df = graph.edges_dataset(columns=["src", "dst", "weight"]).to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    w = df["weight"].to_numpy(np.float64)
    lab = np.arange(V, dtype=np.int64)
    for _ in range(max_iter):
        key = dst * V + lab[src]
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=w)
        d_of, l_of = uk // V, uk % V
        starts = np.flatnonzero(np.r_[True, d_of[1:] != d_of[:-1]])
        sizes = np.diff(np.r_[starts, len(uk)])
        maxs = np.maximum.reduceat(s, starts)
        grp = np.repeat(np.arange(len(starts)), sizes)
        cand = np.flatnonzero(s == maxs[grp])
        # uk ascending ⇒ labels ascend within a dst group; the first
        # max-weight candidate per group IS the min-label tie-break
        _, firstpos = np.unique(grp[cand], return_index=True)
        pick = cand[firstpos]
        new = lab.copy()
        new[d_of[pick]] = l_of[pick]
        if (new == lab).all():
            lab = new
            break
        lab = new
    out = rd.from_pandas(
        pd.DataFrame({"vertex": np.arange(V, dtype=np.int64), "label": lab})
    )
    if out_dir is not None:
        out.write_parquet(out_dir)
        out = rd.read_parquet(out_dir)
    return out


def label_propagation(
    graph,
    max_iter: int = 30,
    num_workers: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1,
    resume: bool = False,
    out_dir: Optional[str] = None,
    engine: Optional[SuperstepEngine] = None,
    local_edge_limit: int = 500_000,
):
    if graph.directed:
        raise ValueError(
            "label_propagation requires a symmetrized graph; build with directed=False"
        )
    # explicit num_workers / engine / checkpointing pins the engine path
    # (tests + resume flows); the default small-graph call runs local
    if (engine is None and num_workers is None and checkpoint_dir is None
            and not resume and graph.num_edges <= local_edge_limit
            and graph.num_vertices <= 2_000_000):
        return _lpa_local(graph, max_iter, out_dir)
    own_engine = engine is None
    if own_engine:
        engine = SuperstepEngine(
            graph, num_workers=num_workers,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        )
    else:
        # engine reuse: same-graph check + state reset (caller owns shutdown)
        if engine.graph is not graph and engine.graph.base_dir != graph.base_dir:
            raise ValueError("engine= was built over a different graph")
        engine._keep_alive = True  # result is a lazy handle; caller shuts down
        engine.reset()
    try:
        return _run(engine, max_iter, checkpoint_dir, resume, out_dir)
    finally:
        if own_engine:
            engine.shutdown()


def _run(engine, max_iter, checkpoint_dir, resume, out_dir):
    engine.wire_mirrors()
    ray.get([w.lpa_init.remote() for w in engine.workers])

    start_iter = 0
    if resume and checkpoint_dir:
        latest = engine.latest_complete_iteration("lpa")
        if latest is not None:
            engine._restore("lpa", latest, ["labels"])
            start_iter = latest + 1

    import time

    for it in range(start_iter, max_iter):
        t0 = time.perf_counter()
        scatter_stats, update_stats = engine._exchange(
            "lpa_scatter", "lpa_update", mirror_names=("labels",)
        )
        changed = sum(s["changed"] for s in update_stats)
        wall = time.perf_counter() - t0
        if checkpoint_dir and (it % engine.checkpoint_every == 0 or changed == 0):
            engine._checkpoint(
                "lpa", it, ["labels"],
                {
                    "changed": changed,
                    "wall_sec": wall,
                    "rows_out": sum(s["rows_out"] for s in scatter_stats),
                    "rows_in": sum(s["rows_in"] for s in update_stats),
                    "shuffle_bytes": sum(s["bytes_out"] for s in scatter_stats),
                },
            )
        if changed == 0:
            break

    import pyarrow as pa

    ds = engine.result_dataset(["labels"], out_dir=out_dir)
    return ds.map_batches(
        lambda t: pa.table({"vertex": t.column("vertex"), "label": t.column("labels")}),
        batch_format="pyarrow",
    )
