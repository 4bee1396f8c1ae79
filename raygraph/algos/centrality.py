"""Katz / eigenvector centrality and HITS — linear-algebra supersteps.

Same skeleton as PageRank (SURVEY.md §2.4 "same superstep skeleton"):

* **Katz** (``cpp/src/centrality/katz_centrality_impl.cuh``):
  ``x' = α·Aᵀx + β`` from x=0, converge on L1 < tol, raise past max_iter;
  optional final L2 normalization.
* **Eigenvector** (``eigenvector_centrality_impl.cuh``): power iteration
  ``x' = Aᵀx / ‖Aᵀx‖₂`` from uniform x, converge on L1 of the normalized
  iterate.
* **HITS** (``link_analysis/hits_impl.cuh``): authorities ``a = Aᵀh``
  (scatter+gather), hubs ``h[u] = Σ_{(u,v)} a[v]`` computed locally after a
  dst-property exchange (the ``update_edge_dst_property`` analogue:
  authority values are served from their owners to every worker whose CSR
  block references them); both L1-normalized per iteration.
"""

from __future__ import annotations

import math
from typing import Optional

import ray

from raygraph.algos.pagerank import ConvergenceError
from raygraph.superstep import SuperstepEngine


def _result(engine, src_name, out_name, out_dir=None):
    import pyarrow as pa

    ds = engine.result_dataset([src_name], out_dir=out_dir)
    return ds.map_batches(
        lambda t: pa.table({"vertex": t.column("vertex"), out_name: t.column(src_name)}),
        batch_format="pyarrow",
    )


def _spmv_round(engine, name):
    """Returns (per-receiver msg ref lists indexed by receiver, stats) —
    mode-aware (packed: every receiver shares the same W refs; sliced:
    receiver q gets only its own per-sender slices)."""
    return engine.spmv_round_refs(name)


def katz_centrality(graph, alpha: float = 0.1, beta: float = 1.0,
                    tol: float = 1e-6, max_iter: int = 100,
                    normalized: bool = True,
                    num_workers: Optional[int] = None, out_dir=None):
    engine = SuperstepEngine(graph, num_workers=num_workers)
    try:
        ray.get([w.set_state.remote("x", 0.0) for w in engine.workers])
        for it in range(max_iter):
            per_recv, _ = _spmv_round(engine, "x")
            upd = ray.get(
                [
                    engine.workers[q].gather_into.remote(
                        "x", per_recv[q], alpha=alpha, beta=beta
                    )
                    for q in range(engine.W)
                ]
            )
            l1 = sum(u["l1"] for u in upd)
            if l1 < tol:
                if normalized:
                    sq = sum(u["local_sq"] for u in upd)
                    inv = 1.0 / math.sqrt(sq) if sq > 0 else 1.0
                    ray.get([w.scale_state.remote("x", inv) for w in engine.workers])
                return _result(engine, "x", "katz_centrality", out_dir)
        raise ConvergenceError(f"Katz failed to converge in {max_iter} iterations")
    finally:
        engine.shutdown()


def eigenvector_centrality(graph, tol: float = 1e-6, max_iter: int = 100,
                           num_workers: Optional[int] = None, out_dir=None):
    engine = SuperstepEngine(graph, num_workers=num_workers)
    V = graph.num_vertices
    try:
        ray.get([w.set_state.remote("x", 1.0 / math.sqrt(V)) for w in engine.workers])
        for it in range(max_iter):
            per_recv, _ = _spmv_round(engine, "x")
            upd = ray.get(
                [
                    engine.workers[q].gather_into.remote("y", per_recv[q])
                    for q in range(engine.W)
                ]
            )
            sq = sum(u["local_sq"] for u in upd)
            if sq == 0:
                raise ConvergenceError("eigenvector: zero iterate (no edges?)")
            inv = 1.0 / math.sqrt(sq)
            # commit x ← ŷ and measure ‖ŷ − x_prev‖₁ (true normalized diff)
            diffs = ray.get(
                [w.commit_scaled_diff.remote("y", "x", inv) for w in engine.workers]
            )
            l1 = sum(d["l1"] for d in diffs)
            if l1 < tol * V:
                return _result(engine, "x", "eigenvector_centrality", out_dir)
        raise ConvergenceError(f"eigenvector failed to converge in {max_iter} iters")
    finally:
        engine.shutdown()


def hits(graph, tol: float = 1e-5, max_iter: int = 100,
         num_workers: Optional[int] = None, out_dir=None):
    """Returns Dataset (vertex, hubs, authorities), L1-normalized."""
    import pyarrow as pa

    engine = SuperstepEngine(graph, num_workers=num_workers)
    V = graph.num_vertices
    W = engine.W
    try:
        # one-time dst-property exchange wiring (update_edge_dst_property)
        needed = ray.get([w.needed_dst_ids.remote() for w in engine.workers])
        ray.get(
            [
                engine.workers[p].register_requests.remote(
                    [needed[q][p] for q in range(W)]
                )
                for p in range(W)
            ]
        )
        ray.get([w.set_state.remote("h", 1.0 / V) for w in engine.workers])
        for it in range(max_iter):
            # authorities: a = Aᵀ h, L1-normalized
            per_recv, _ = _spmv_round(engine, "h")
            upd = ray.get(
                [
                    engine.workers[q].gather_into.remote("a", per_recv[q])
                    for q in range(W)
                ]
            )
            s = sum(u["local_sum"] for u in upd)
            if s > 0:
                ray.get([w.scale_state.remote("a", 1.0 / s) for w in engine.workers])
            # serve authority values to the workers whose blocks need them
            served = [
                w.serve_dst_values.options(num_returns=W).remote("a")
                for w in engine.workers
            ]
            ray.get(
                [
                    engine.workers[q].apply_dst_values.remote(
                        "a", [served[p][q] for p in range(W)]
                    )
                    for q in range(W)
                ]
            )
            # hubs: h[u] = Σ w·a[v] over out-edges, L1-normalized
            upd2 = ray.get(
                [w.out_accumulate.remote("h_raw", "a") for w in engine.workers]
            )
            s2 = sum(u["local_sum"] for u in upd2)
            diffs = ray.get(
                [
                    w.commit_scaled_diff.remote("h_raw", "h", 1.0 / s2 if s2 > 0 else 1.0)
                    for w in engine.workers
                ]
            )
            l1 = sum(d["l1"] for d in diffs)
            if l1 < tol:
                break
        ds = engine.result_dataset(["h", "a"], out_dir=out_dir)
        return ds.map_batches(
            lambda t: pa.table(
                {
                    "vertex": t.column("vertex"),
                    "hubs": t.column("h"),
                    "authorities": t.column("a"),
                }
            ),
            batch_format="pyarrow",
        )
    finally:
        engine.shutdown()
