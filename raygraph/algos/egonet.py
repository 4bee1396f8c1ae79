"""Batched ego graphs — k-hop induced neighborhoods around seed vertices.

Reference: ``python/cugraph/cugraph/community/egonet.py`` (batched_ego_graphs)
/ ``cpp/src/community/legacy/egonet.cu``: for each seed, the subgraph induced
on all vertices within ``radius`` hops.

Shape here: one depth-capped BFS per seed on the BSP engine (distances past
``radius`` are never labeled, so the reachable set falls out of the BFS
result with no post-filter scan), then an induced-subgraph semi-join of the
edge table against that seed's reachable set.  Ego sets are radius-bounded
and small by contract, so the semi-join broadcasts the vertex set
(``ops.induced_subgraph``); callers with huge ego sets can lower
``broadcast_limit`` to force the bucketed two-sided ``hash_join`` path
instead (same scale story as ``cores.k_core``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def batched_ego_graphs(graph, seeds: Sequence[int], radius: int = 1,
                       num_workers=None, broadcast_limit: int = 20_000_000):
    """Edges ``(seed, src, dst, weight)`` of each seed's radius-hop egonet.

    Returns one Dataset with a ``seed`` column (the reference's batched
    contract), unioned across seeds.
    """
    import ray.data  # noqa: F401  (Dataset union)

    from raygraph import joins, ops
    from raygraph.algos.traversal import bfs

    outs = []
    for seed in seeds:
        res = bfs(graph, int(seed), num_workers=num_workers,
                  max_depth=radius)
        reach = res.map_batches(
            lambda df: df.loc[df["distance"] >= 0, ["vertex"]],
            batch_format="pandas",
        )
        if graph.num_vertices <= broadcast_limit:
            verts = reach.to_pandas()["vertex"].to_numpy(np.int64)
            edges = ops.induced_subgraph(graph, verts)
        else:
            e = graph.edges_dataset(columns=["src", "dst", "weight"])
            on_src = reach.map_batches(
                lambda df: df.rename(columns={"vertex": "src"}),
                batch_format="pandas",
            )
            on_dst = reach.map_batches(
                lambda df: df.rename(columns={"vertex": "dst"}),
                batch_format="pandas",
            )
            edges = joins.hash_join(
                joins.hash_join(e, on_src, on="src"), on_dst, on="dst"
            )
        outs.append(
            edges.map_batches(
                lambda df, s=int(seed): df.assign(
                    seed=np.int64(s))[["seed", "src", "dst", "weight"]],
                batch_format="pandas",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
