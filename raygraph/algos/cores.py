"""Core number / k-core — degeneracy peeling.

Reference: ``cpp/src/cores/core_number_impl.cuh`` (328) /
``k_core_impl.cuh``; contract: core_number(v) = largest k with v in the
k-core of the undirected simple graph; k_core(G, k) = induced subgraph on
{v : core(v) ≥ k}.

The peeling recurrence is inherently sequential in k; levels are computed
with the standard O(E) bucket peeling over driver-resident arrays (same
broadcast-limit trade as Louvain's level state — the edge list streams in
once via the Dataset, only V-sized arrays live on the driver).  The
Dataset-expressed alternative (iterate: degrees → filter) costs one shuffle
per peel round and is strictly worse below the broadcast limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def core_number(graph, broadcast_limit: int = 20_000_000):
    """Returns Dataset (vertex, core_number) — exact."""
    import ray.data as rd

    if graph.directed:
        raise ValueError("core_number requires an undirected graph")
    V = graph.num_vertices
    if V > broadcast_limit:
        raise NotImplementedError("dataset peeling path not wired; V too large")
    df = graph.edges_dataset(columns=["src", "dst"]).to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]

    deg = np.bincount(src, minlength=V)
    # CSR for peeling
    order = np.argsort(src, kind="stable")
    adj_dst = dst[order]
    offsets = np.zeros(V + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=V), out=offsets[1:])

    # O(E) bucket peeling (Batagelj–Zaveršnik)
    core = deg.copy()
    md = int(deg.max()) if V else 0
    bin_start = np.zeros(md + 2, dtype=np.int64)
    np.cumsum(np.bincount(deg, minlength=md + 1), out=bin_start[1:])
    pos = np.argsort(deg, kind="stable")
    vert = pos.copy()
    loc = np.empty(V, dtype=np.int64)
    loc[vert] = np.arange(V)
    bin_ptr = bin_start.copy()

    d = core.copy()
    for i in range(V):
        v = vert[i]
        dv = d[v]
        core[v] = dv
        for j in range(offsets[v], offsets[v + 1]):
            u = adj_dst[j]
            if d[u] > dv:
                du = d[u]
                pu = loc[u]
                pw = bin_ptr[du]
                wv = vert[pw]
                if u != wv:
                    vert[pu], vert[pw] = wv, u
                    loc[u], loc[wv] = pw, pu
                bin_ptr[du] += 1
                d[u] -= 1
    return rd.from_pandas(
        pd.DataFrame({"vertex": np.arange(V, dtype=np.int64),
                      "core_number": core.astype(np.int64)})
    )


def k_core(graph, k: int, core_numbers=None):
    """Edges of the k-core (both endpoints core ≥ k) — ``k_core_impl.cuh``."""
    import numpy as np
    import ray

    from raygraph import ops

    cn = (core_numbers if core_numbers is not None else core_number(graph)).to_pandas()
    keep = cn.loc[cn["core_number"] >= k, "vertex"].to_numpy(np.int64)
    return ops.induced_subgraph(graph, keep)
