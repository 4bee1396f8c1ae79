"""Structural graph operators — the Dataset-level prim/utility layer.

Covers the reference's structural surface (SURVEY.md §2.2): degrees,
self-loop / multi-edge counts, two-hop neighbors, induced subgraph, relabel,
coarsen, adjacency-list build.  Every operator is a Dataset pipeline
(map_batches + groupby); none materializes the full input on the driver.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raygraph import joins


def _rd():
    import ray.data as rd

    return rd


def _vertex_zero_fill(partial_ds, V: int, value_cols: Sequence[str]):
    """Union (vertex, 0...) for all vertices, then bucketed sum → dense result."""
    rd = _rd()

    from raygraph.agg import hash_aggregate

    def zeros(t: pa.Table) -> pa.Table:
        cols = {"vertex": t.column("id").cast(pa.int64())}
        for c in value_cols:
            cols[c] = pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64())
        return pa.table(cols)

    base = rd.range(V).map_batches(zeros, batch_format="pyarrow")
    return hash_aggregate(
        base.union(partial_ds), ["vertex"], {c: (c, "sum") for c in value_cols}
    )


def degrees(graph):
    """(vertex, in_degree, out_degree, degree) — ``simpleGraph.py:619-805``.

    Zero-filled for vertices with no edges. For undirected graphs each stored
    direction counts once (cuGraph counts the symmetrized edge list, so an
    undirected edge contributes 1 to both endpoints' in and out degrees).
    """
    edges = graph.edges_dataset(columns=["src", "dst"])

    def partials(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        sv, sc = np.unique(src, return_counts=True)
        dv, dc = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "vertex": np.concatenate([sv, dv]),
                "out_degree": np.concatenate([sc, np.zeros(len(dv), np.int64)]),
                "in_degree": np.concatenate([np.zeros(len(sv), np.int64), dc]),
            }
        )

    p = edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    out = _vertex_zero_fill(p, graph.num_vertices, ["out_degree", "in_degree"])
    return out.map_batches(
        lambda t: t.append_column(
            "degree",
            pc.add(t.column("in_degree"), t.column("out_degree")),
        ),
        batch_format="pyarrow",
    )


def out_weight_sums(graph):
    """(vertex, out_wsum) — ``graph_view.hpp:671-683`` compute_out_weight_sums."""
    edges = graph.edges_dataset(columns=["src", "weight"])

    def partials(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        w = t.column("weight").to_numpy()
        sv, inv = np.unique(src, return_inverse=True)
        s = np.bincount(inv, weights=w, minlength=len(sv))
        return pa.table({"vertex": sv, "out_wsum": s})

    from raygraph.agg import hash_aggregate

    p = edges.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    return hash_aggregate(p, ["vertex"], {"out_wsum": ("out_wsum", "sum")})


def count_self_loops(graph) -> int:
    """``graph_view.hpp:685`` count_self_loops."""
    edges = graph.edges_dataset(columns=["src", "dst"])
    return edges.map_batches(
        lambda t: pa.table(
            {"n": pa.array([pc.sum(pc.equal(t.column("src"), t.column("dst"))).as_py() or 0])}
        ),
        batch_format="pyarrow",
    ).sum("n")


def count_multi_edges(graph) -> int:
    """Number of surplus parallel edges — ``graph_view.hpp:686``."""
    from raygraph.agg import hash_aggregate

    edges = graph.edges_dataset(columns=["src", "dst"])
    grouped = hash_aggregate(edges, ["src", "dst"], {"n": (None, "count")})
    return grouped.map_batches(
        lambda df: pd.DataFrame({"n": [int((df["n"] - 1).sum())]}),
        batch_format="pandas",
    ).sum("n")


def _two_hop_local(src, dst) -> pd.DataFrame:
    """Vectorized in×out wedge enumeration on driver arrays → distinct
    ordered (first, second) pairs, first ≠ second.  For each mid, pairs
    are in-neighbors(mid) × out-neighbors(mid) — the same semantics as
    the self-join formulation, minus two bucketed exchanges."""
    empty = pd.DataFrame(
        {"first": pd.Series(dtype=np.int64),
         "second": pd.Series(dtype=np.int64)}
    )
    if not len(src):
        return empty
    oi = np.argsort(dst, kind="stable")
    in_mid, in_first = dst[oi], src[oi]
    oo = np.argsort(src, kind="stable")
    out_mid, out_second = src[oo], dst[oo]
    um_in, in_start = np.unique(in_mid, return_index=True)
    um_out, out_start = np.unique(out_mid, return_index=True)
    p_all = np.diff(np.r_[in_start, len(in_mid)])
    q_all = np.diff(np.r_[out_start, len(out_mid)])
    _, ii, io = np.intersect1d(um_in, um_out, return_indices=True)
    p, q = p_all[ii], q_all[io]
    ins, outs = in_start[ii], out_start[io]
    total = int((p.astype(np.int64) * q).sum())
    if total == 0:
        return empty
    # one block per (mid, in-element); block length = q of its mid
    sp = int(p.sum())
    in_el = np.repeat(ins, p) + (
        np.arange(sp) - np.repeat(np.cumsum(p) - p, p)
    )
    firsts_per_block = in_first[in_el]
    blk_out_start = np.repeat(outs, p)
    blk_q = np.repeat(q, p)
    first_idx = np.repeat(np.arange(sp, dtype=np.int64), blk_q)
    off = np.arange(total) - np.repeat(np.cumsum(blk_q) - blk_q, blk_q)
    first = firsts_per_block[first_idx]
    second = out_second[blk_out_start[first_idx] + off]
    m = first != second
    first, second = first[m], second[m]
    if not len(first):
        return empty
    C = np.int64(max(int(first.max()), int(second.max())) + 1)
    pk = np.unique(first * C + second)
    return pd.DataFrame({"first": pk // C, "second": pk % C})


def two_hop_pairs(edges_ds, num_edges=None, local_edge_limit: int = 500_000,
                  local_pair_limit: int = 50_000_000):
    """Distinct 2-path (first, second) pairs over an (src, dst) edge
    Dataset.  Small inputs (≤ ``local_edge_limit`` edges, nonnegative
    ids, expanded wedge volume ≤ ``local_pair_limit``) enumerate on the
    driver; otherwise the bucketed self-join + distinct pipeline runs.
    """
    from raygraph.agg import distinct

    if num_edges is None:
        edges_ds = edges_ds.materialize()
        num_edges = edges_ds.count()
    if num_edges <= local_edge_limit:
        import ray.data as rd

        df = edges_ds.to_pandas()
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        # wedge volume Σ indeg·outdeg (hub-blowup guard) + nonneg check
        if len(src) == 0 or (src.min() >= 0 and dst.min() >= 0):
            _, ic = np.unique(dst, return_counts=True)
            um_out, ocnt = np.unique(src, return_counts=True)
            _, ii, io = np.intersect1d(
                np.unique(dst), um_out, return_indices=True
            )
            vol = int((ic[ii].astype(np.int64) * ocnt[io]).sum())
            if vol <= local_pair_limit:
                return rd.from_pandas(_two_hop_local(src, dst))
    a = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "first", "dst": "mid"}),
        batch_format="pandas",
    )
    b = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "mid", "dst": "second"}),
        batch_format="pandas",
    )
    joined = joins.hash_join(a, b, on="mid")
    pairs = joined.map_batches(
        lambda df: df.loc[df["first"] != df["second"], ["first", "second"]],
        batch_format="pandas",
    )
    return distinct(pairs, ["first", "second"])


def two_hop_neighbors(graph, local_edge_limit: int = 500_000):
    """Distinct (first, second) pairs connected by a path of exactly 2 edges,
    excluding trivial first==second pairs — ``traversal/two_hop_neighbors.cu``,
    ``simpleGraph.py:544-566``.  Small graphs enumerate wedges on the
    driver (pass ``local_edge_limit=0`` to force the join pipeline).
    """
    return two_hop_pairs(
        graph.edges_dataset(columns=["src", "dst"]),
        num_edges=graph.num_edges, local_edge_limit=local_edge_limit,
    )


def induced_subgraph(graph, vertices):
    """Edges with both endpoints in the vertex set (broadcast semi-join) —
    ``cpp/src/structure/induced_subgraph_impl.cuh``."""
    import ray

    vset = np.sort(np.asarray(list(vertices), dtype=np.int64))
    ref = ray.put(vset)
    edges = graph.edges_dataset(columns=["src", "dst", "weight"])

    def fn(t: pa.Table) -> pa.Table:
        vs = ray.get(ref)
        src = t.column("src").to_numpy()
        dst = t.column("dst").to_numpy()
        mask = np.isin(src, vs) & np.isin(dst, vs)
        return t.filter(pa.array(mask))

    return edges.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def relabel(ds, col: str, mapping_df: pd.DataFrame, old="old", new="new"):
    """Apply an (old→new) pair map to a vertex column —
    ``cpp/src/structure/relabel_impl.cuh`` (broadcast lookup form)."""
    ref = joins.broadcast_map_ref(mapping_df, old, new)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        kv = ray.get(ref)
        df = df.copy()
        df[col] = joins.lookup_broadcast(df[col].to_numpy(), kv)
        return df

    return ds.map_batches(fn, batch_format="pandas")


def coarsen(edges_ds, labels_df: pd.DataFrame, self_loops: bool = True):
    """Contract vertices by label; combine parallel edges summing weights —
    ``cpp/src/structure/coarsen_graph_impl.cuh`` (Louvain's level step).

    ``labels_df``: (vertex, label). Returns Dataset (src, dst, weight) over
    label ids.
    """
    from raygraph.agg import hash_aggregate

    ref = joins.broadcast_map_ref(labels_df, "vertex", "label")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        kv = ray.get(ref)
        out = pd.DataFrame(
            {
                "src": joins.lookup_broadcast(df["src"].to_numpy(), kv),
                "dst": joins.lookup_broadcast(df["dst"].to_numpy(), kv),
                "weight": df["weight"].to_numpy(),
            }
        )
        if not self_loops:
            out = out[out["src"] != out["dst"]]
        return out

    relabeled = edges_ds.map_batches(fn, batch_format="pandas")
    return hash_aggregate(relabeled, ["src", "dst"], {"weight": ("weight", "sum")})


# ---------------------------------------------------------------------------
# prim-layer wrappers (SURVEY.md §2.3) — the public compute-model contract.
# Each maps a cpp/src/prims/ primitive to its Dataset form; algorithms are
# compositions of these plus the superstep engine.


def transform_reduce_v(vertex_ds, fn, reduce: str = "sum", column: str = "value"):
    """Map over vertex values then global reduce — ``prims/transform_reduce_v.cuh``.

    ``fn``: vectorized batch → batch with ``column``.
    """
    mapped = vertex_ds.map_batches(fn, batch_format="pyarrow")
    return getattr(mapped, reduce)(column)


def reduce_v(vertex_ds, reduce: str = "sum", column: str = "value"):
    """Global reduce of a vertex column — ``prims/reduce_v.cuh``."""
    return getattr(vertex_ds, reduce)(column)


def count_if_v(vertex_ds, predicate):
    """Count vertices satisfying a vectorized predicate — ``prims/count_if_v.cuh``."""
    return vertex_ds.map_batches(
        lambda t: pa.table({"n": pa.array([int(np.count_nonzero(predicate(t)))])}),
        batch_format="pyarrow",
    ).sum("n")


def transform_reduce_e(graph, fn, reduce: str = "sum", column: str = "value"):
    """Map over all edges then global reduce — ``prims/transform_reduce_e.cuh``."""
    mapped = graph.edges_dataset().map_batches(fn, batch_format="pyarrow")
    return getattr(mapped, reduce)(column)


def count_if_e(graph, predicate):
    """Count edges satisfying a predicate — ``prims/count_if_e.cuh``."""
    return graph.edges_dataset().map_batches(
        lambda t: pa.table({"n": pa.array([int(np.count_nonzero(predicate(t)))])}),
        batch_format="pyarrow",
    ).sum("n")


def extract_if_e(graph, predicate):
    """Filter edges, return the surviving edge list — ``prims/extract_if_e.cuh``."""
    return graph.edges_dataset().map_batches(
        lambda t: t.filter(pa.array(np.asarray(predicate(t), dtype=bool))),
        batch_format="pyarrow",
    )


def adjacency_lists(edges_ds, key: str = "src", nbr: str = "dst"):
    """(vertex, nbrs: sorted int64 list) per vertex — bucketed build.

    The Dataset analogue of the CSR rows the prims intersect
    (``per_v_pair_transform_dst_nbr_intersection.cuh``).  Uses a hash-bucket
    group (not per-vertex map_groups) and emits Python-list cells; keep the
    result in pandas/object form — do not route it through Arrow tensor
    conversion.
    """
    from raygraph.agg import bucketed_map_groups

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "vertex": [g[key].iloc[0]],
                "nbrs": [np.sort(g[nbr].to_numpy(dtype=np.int64)).tolist()],
            }
        )

    return bucketed_map_groups(edges_ds, [key], collect)
