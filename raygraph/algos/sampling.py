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


def node2vec_walks(graph, start_vertices, max_length: int,
                   p: float = 1.0, q: float = 1.0, seed: int = 42):
    """node2vec biased walks (Grover & Leskovec 2016) — the reference's
    ``random_walks_impl.cuh`` biased variant / ``sampling/node2vec.py``.

    Per step from ``cur`` with previous vertex ``prev``, candidate x is
    weighted ``w(cur,x)·α`` with α = 1/p if x==prev, 1 if (prev,x)∈E,
    else 1/q.  The (prev,x) adjacency test is a bucketed left join of the
    candidate rows against the edge list — no per-worker adjacency index.
    Deterministic: the pick uses the (seed, walker, step) counter stream.
    Returns Dataset (walker:int64, step:int32, vertex:int64).
    """
    import ray.data as rd

    from raygraph import joins
    from raygraph.agg import bucketed_map_groups

    starts = np.asarray(list(start_vertices), dtype=np.int64)
    walkers = pd.DataFrame(
        {
            "walker": np.arange(len(starts), dtype=np.int64),
            "prev": np.full(len(starts), -1, dtype=np.int64),
            "cur": starts,
        }
    )
    rows = [
        pd.DataFrame(
            {"walker": walkers["walker"], "step": np.int32(0), "vertex": walkers["cur"]}
        )
    ]
    edges = graph.edges_dataset(columns=["src", "dst", "weight"])
    adj = edges.map_batches(
        lambda df: pd.DataFrame(
            {
                "__pa": df["src"].to_numpy(np.int64),
                "__pb": df["dst"].to_numpy(np.int64),
                "__adj": np.ones(len(df)),
            }
        ),
        batch_format="pandas",
    )
    for step in range(1, max_length):
        if not len(walkers):
            break
        wds = rd.from_pandas(walkers.rename(columns={"cur": "src"}))
        cand = joins.hash_join(wds, edges, on="src", num_buckets=16)
        flagged = joins.hash_join(
            cand.map_batches(
                lambda df: df.assign(
                    __pa=df["prev"].to_numpy(np.int64),
                    __pb=df["dst"].to_numpy(np.int64),
                ),
                batch_format="pandas",
            ),
            adj,
            on=["__pa", "__pb"],
            how="left",
            num_buckets=16,
        )

        def pick(g: pd.DataFrame, step=step) -> pd.DataFrame:
            wid = np.int64(g["walker"].iloc[0])
            prev = np.int64(g["prev"].iloc[0])
            order = np.argsort(g["dst"].to_numpy(np.int64), kind="stable")
            cands = g["dst"].to_numpy(np.int64)[order]
            w = g["weight"].to_numpy(np.float64)[order]
            is_adj = g["__adj"].to_numpy()[order] == 1.0
            alpha = np.where(
                cands == prev, 1.0 / p, np.where(is_adj, 1.0, 1.0 / q)
            )
            wt = w * alpha
            cum = np.cumsum(wt)
            u = _seeded_uniform(seed, np.array([wid], dtype=np.int64), step)[0, 0]
            i = int(np.searchsorted(cum, u * cum[-1], side="right"))
            nxt = cands[min(i, len(cands) - 1)]
            return pd.DataFrame(
                {"walker": [wid], "prev": [np.int64(g["src"].iloc[0])],
                 "cur": [nxt]}
            )

        moved = bucketed_map_groups(flagged, ["walker"], pick, num_buckets=16)
        walkers = moved.to_pandas()
        if not len(walkers):
            break
        rows.append(
            pd.DataFrame(
                {
                    "walker": walkers["walker"].to_numpy(np.int64),
                    "step": np.full(len(walkers), step, dtype=np.int32),
                    "vertex": walkers["cur"].to_numpy(np.int64),
                }
            )
        )
    return rd.from_pandas(pd.concat(rows, ignore_index=True))


def random_walks(graph, start_vertices, max_length: int, seed: int = 42):
    """Uniform random walks; returns Dataset
    (walker:int64, step:int32, vertex:int64) — walk prefix per walker,
    stopping early at sinks (``random_walks_impl.cuh`` uniform variant).
    """
    import ray
    import ray.data as rd

    from raygraph import joins
    from raygraph.agg import bucketed_map_groups

    starts = np.asarray(list(start_vertices), dtype=np.int64)
    walkers = pd.DataFrame(
        {"walker": np.arange(len(starts), dtype=np.int64), "cur": starts}
    )
    rows = [
        pd.DataFrame(
            {"walker": walkers["walker"], "step": np.int32(0), "vertex": walkers["cur"]}
        )
    ]
    edges = graph.edges_dataset(columns=["src", "dst"])
    for step in range(1, max_length):
        if not len(walkers):
            break
        wds = rd.from_pandas(walkers.rename(columns={"cur": "src"}))
        joined = joins.hash_join(wds, edges, on="src", num_buckets=16)

        def pick(g: pd.DataFrame, step=step) -> pd.DataFrame:
            wid = np.int64(g["walker"].iloc[0])
            ds_ = np.sort(g["dst"].to_numpy(np.int64))
            u = _seeded_uniform(seed, np.array([wid], dtype=np.int64), step)[0, 0]
            nxt = ds_[int(u * len(ds_)) % len(ds_)]
            return pd.DataFrame({"walker": [wid], "cur": [nxt]})

        moved = bucketed_map_groups(joined, ["walker"], pick, num_buckets=16)
        walkers = moved.to_pandas()
        if not len(walkers):
            break
        rows.append(
            pd.DataFrame(
                {
                    "walker": walkers["walker"].to_numpy(np.int64),
                    "step": np.full(len(walkers), step, dtype=np.int32),
                    "vertex": walkers["cur"].to_numpy(np.int64),
                }
            )
        )
    return rd.from_pandas(pd.concat(rows, ignore_index=True))
