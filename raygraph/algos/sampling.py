"""Sampling: uniform neighbor sampling and random walks.

Reference: ``cpp/src/sampling/uniform_neighbor_sampling_impl.hpp`` /
``random_walks_impl.cuh`` (441); prim kin
``per_v_random_select_transform_outgoing_e.cuh`` — sample k outgoing edges
per frontier vertex with a per-vertex seeded RNG.

Determinism: draws come from splitmix64(seed, vertex/walker, hop) — a pure
counter stream, so results are identical at any parallelism (the same
discipline as the corpus/RMAT generators).  Per-vertex work runs inside
bucketed group tasks (`agg.bucketed_map_groups` pattern), frontiers hop via
broadcast membership filters.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from raygraph.hashing import hash_int64, splitmix64


def _seeded_uniform(seed: int, ids: np.ndarray, hop: int, n: int = 1):
    """(len(ids), n) uniforms in [0,1), pure function of (seed, id, hop, j)."""
    base = splitmix64(
        ids.astype(np.uint64)
        ^ np.uint64((seed * 0x9E3779B97F4A7C15 + hop * 0xD1B54A32D192ED03) % 2**64)
    )
    cols = [
        (splitmix64(base + np.uint64(j + 1)) >> np.uint64(11)).astype(np.float64)
        * (1.0 / (1 << 53))
        for j in range(n)
    ]
    return np.stack(cols, axis=1)


def uniform_neighbor_sample(graph, start_vertices, fanouts, seed: int = 42):
    """Multi-hop frontier sampling; returns Dataset
    (hop:int32, src:int64, dst:int64) of sampled edges.

    ``fanouts``: list of per-hop fanouts (cuGraph's fanout_vals). Sampling is
    without replacement per vertex (min(fanout, degree) neighbors), ranked by
    a seeded uniform per edge — deterministic and parallelism-independent.
    """
    import ray
    import ray.data as rd

    from raygraph.agg import bucketed_map_groups

    frontier = np.unique(np.asarray(list(start_vertices), dtype=np.int64))
    out_frames = []
    edges = graph.edges_dataset(columns=["src", "dst"])
    for hop, fanout in enumerate(fanouts):
        if len(frontier) == 0:
            break
        fref = ray.put(np.sort(frontier))

        def on_frontier(df: pd.DataFrame) -> pd.DataFrame:
            fs = ray.get(fref)
            m = np.isin(df["src"].to_numpy(np.int64), fs)
            return df[m]

        cand = edges.map_batches(on_frontier, batch_format="pandas")

        def sample(g: pd.DataFrame, hop=hop, fanout=fanout) -> pd.DataFrame:
            v = np.int64(g["src"].iloc[0])
            ds_ = np.sort(g["dst"].to_numpy(np.int64))
            if len(ds_) > fanout:
                u = _seeded_uniform(seed, ds_ ^ (v << np.int64(1)), hop)[:, 0]
                pick = np.argsort(u, kind="stable")[:fanout]
                ds_ = ds_[pick]
            return pd.DataFrame(
                {
                    "hop": np.full(len(ds_), hop, dtype=np.int32),
                    "src": np.full(len(ds_), v),
                    "dst": ds_,
                }
            )

        sampled = bucketed_map_groups(cand, ["src"], sample).to_pandas()
        out_frames.append(sampled)
        frontier = np.unique(sampled["dst"].to_numpy(np.int64)) if len(sampled) else np.empty(0, np.int64)

    result = (
        pd.concat(out_frames, ignore_index=True)
        if out_frames
        else pd.DataFrame({"hop": [], "src": [], "dst": []})
    )
    return rd.from_pandas(result)


def _run_walks(graph, start_vertices, max_length: int, seed: int,
               p=None, q=None, biased=False, num_workers=None, out_dir=None):
    """Shared walker-routing driver loop on the superstep engine.

    The adjacency stays resident per worker (built once); per step only
    O(active walkers) rows cross the wire, routed to owner(cur) — replacing
    the r2 per-step full-edge hash_join + driver round-trip.  Outputs are
    written per-worker as parquet and read back as a Dataset (the driver
    never holds the O(walkers × length) result).  Draws use the
    (seed, walker, step) counter stream → bit-identical at any parallelism.
    """
    import tempfile
    import uuid

    import ray
    import ray.data as rd

    from raygraph.superstep import SuperstepEngine

    starts = np.asarray(list(start_vertices), dtype=np.int64)
    ids = np.arange(len(starts), dtype=np.int64)
    if out_dir is None:
        out_dir = os.path.join(
            tempfile.gettempdir(), "raygraph", f"walks-{uuid.uuid4().hex[:12]}"
        )
    # walk messages use their own packed layout (concatenated arrays +
    # per-receiver offsets); volume is O(active walkers), far below the
    # spmv exchanges, so the sliced multi-node layout buys nothing here
    engine = SuperstepEngine(graph, num_workers=num_workers,
                             exchange_mode="packed")
    try:
        ray.get([w.walk_build.remote(biased) for w in engine.workers])
        ray.get(
            [
                w.walk_init.remote(ids, starts, seed, p, q, biased)
                for w in engine.workers
            ]
        )
        for step in range(1, max_length):
            if p is None:
                _, upd = engine._exchange(
                    "walk_step_scatter", "walk_step_update",
                    scatter_args=(step,),
                )
            else:
                engine._exchange(
                    "n2v_query_scatter", "n2v_query_receive",
                    scatter_args=(step,),
                )
                engine._exchange("n2v_flag_scatter", "n2v_flag_update")
                _, upd = engine._exchange(
                    "n2v_move_scatter", "walk_step_update",
                    scatter_args=(step,),
                )
            if sum(u["active"] for u in upd) == 0:
                break
        ray.get([w.walk_write.remote(out_dir) for w in engine.workers])
    finally:
        engine.shutdown()
    return rd.read_parquet(out_dir)


def node2vec_walks(graph, start_vertices, max_length: int,
                   p: float = 1.0, q: float = 1.0, seed: int = 42,
                   num_workers=None, out_dir=None):
    """node2vec biased walks (Grover & Leskovec 2016) — the reference's
    ``random_walks_impl.cuh`` biased variant / ``sampling/node2vec.py``.

    Per step from ``cur`` with previous vertex ``prev``, candidate x is
    weighted ``w(cur,x)·α`` with α = 1/p if x==prev, 1 if (prev,x)∈E,
    else 1/q.  Runs on the superstep engine: the (prev,x) adjacency test is
    a membership query routed to owner(prev) and answered by searchsorted
    against its resident sorted CSR row (3 exchanges per step, message
    volume O(Σ deg(cur) over active walkers) — never the edge list).
    Deterministic: the pick uses the (seed, walker, step) counter stream.
    Returns Dataset (walker:int64, step:int32, vertex:int64).
    """
    return _run_walks(graph, start_vertices, max_length, seed, p=p, q=q,
                      num_workers=num_workers, out_dir=out_dir)


def random_walks(graph, start_vertices, max_length: int, seed: int = 42,
                 num_workers=None, out_dir=None):
    """Uniform random walks; returns Dataset
    (walker:int64, step:int32, vertex:int64) — walk prefix per walker,
    stopping early at sinks (``random_walks_impl.cuh`` uniform variant).
    Runs on the superstep engine: one walker-routing exchange per step,
    adjacency resident per worker.
    """
    return _run_walks(graph, start_vertices, max_length, seed,
                      num_workers=num_workers, out_dir=out_dir)


def biased_random_walks(graph, start_vertices, max_length: int,
                        seed: int = 42, num_workers=None, out_dir=None):
    """Edge-weight-biased random walks: the next hop is drawn with
    probability proportional to the outgoing edge weight
    (``random_walks_impl.cuh`` biased variant / ``sampling/random_walks.py``
    ``biased_random_walks``).  Weights must be non-negative; a vertex whose
    outgoing weights sum to zero is treated as a sink (walk stops there).
    Same engine and determinism contract as :func:`random_walks` — the
    draw is an inverse-CDF lookup in the resident row's weight cumsum,
    one vectorized ``searchsorted`` per worker per step.
    Returns Dataset (walker:int64, step:int32, vertex:int64)."""
    return _run_walks(graph, start_vertices, max_length, seed, biased=True,
                      num_workers=num_workers, out_dir=out_dir)
