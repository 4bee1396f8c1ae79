"""Vertex-pair similarity: Jaccard / Sørensen / Overlap coefficients.

Reference: ``cpp/src/link_prediction/{jaccard,sorensen,overlap}_impl.cuh``
(+ ``similarity_impl.cuh``) — neighbor-set intersection per vertex pair via
``per_v_pair_transform_dst_nbr_intersection.cuh``.

Two APIs, mirroring the reference:

* :func:`pair_similarity` — coefficients over **caller-provided pairs**
  (the reference's primary API shape: ``link_prediction/jaccard.py``
  computes over ``vertex_pair``).  Work is Σ_pairs deg(a) — no wedge
  explosion regardless of skew.
* :func:`pairwise_similarity` — all (a<b) pairs with ≥1 common neighbor.
  The self-join on the shared endpoint w emits |N(w)|² wedge rows, so a
  single hub vertex lands its full quadratic expansion in one bucket
  task; ``max_wedge_degree`` caps it by excluding shared endpoints above
  the threshold (documented approximation — pairs connected ONLY through
  capped hubs are dropped / undercounted; the exact answer for specific
  pairs is :func:`pair_similarity`).

Relational mapping (no list columns): common-neighbor counts by
self-joining the symmetrized edge list on the shared endpoint, degrees
from a groupby, coefficients from exact integer counts:

* jaccard  = |N(a)∩N(b)| / |N(a)∪N(b)|
* sorensen = 2·|N(a)∩N(b)| / (|N(a)|+|N(b)|)
* overlap  = |N(a)∩N(b)| / min(|N(a)|,|N(b)|)

**Weighted variants** (reference: ``link_prediction/wjaccard.py`` jaccard_w,
``woverlap.py``, ``wsorensen.py`` — per-vertex weights w(v) generalize set
size to volume vol(S) = Σ_{v∈S} w(v)): pass ``vertex_weights`` (a
(vertex, weight) Dataset) to either API; ``common`` becomes
vol(N(a)∩N(b)) and degrees become neighborhood volumes, so e.g.
weighted jaccard = vol(N(a)∩N(b)) / vol(N(a)∪N(b)).  Plumbing is one
extra bucketed join attaching w to the shared endpoint + weighted sums
in place of counts — same shuffle count as unweighted.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from raygraph import joins


def _coeff_frame(df: pd.DataFrame, kind: str, weighted: bool) -> pd.DataFrame:
    c = df["common"].to_numpy(np.float64)
    da = df["deg_a"].to_numpy(np.float64)
    db = df["deg_b"].to_numpy(np.float64)
    if kind == "jaccard":
        v = c / (da + db - c)
    elif kind == "sorensen":
        v = 2.0 * c / (da + db)
    elif kind == "overlap":
        v = c / np.minimum(da, db)
    else:
        raise ValueError(kind)
    out = df[["a", "b"]].copy()
    out["common"] = (
        df["common"].to_numpy(np.float64) if weighted
        else df["common"].to_numpy(np.int64)
    )
    out["coeff"] = v
    return out


def _attach_coeff(common, deg, kind: str, num_buckets: int,
                  weighted: bool = False):
    """Join per-pair common counts with both endpoint degrees and compute
    the coefficient. Returns (a, b, common, coeff)."""
    deg = deg.materialize()  # consumed by BOTH endpoint joins below —
    # without this the whole degree lineage (and its upstream edge
    # pipeline) executes twice
    dega = deg.map_batches(
        lambda df: df.rename(columns={"src": "a", "deg": "deg_a"}),
        batch_format="pandas",
    )
    degb = deg.map_batches(
        lambda df: df.rename(columns={"src": "b", "deg": "deg_b"}),
        batch_format="pandas",
    )
    j1 = joins.hash_join(common, dega, on="a", num_buckets=num_buckets)
    j2 = joins.hash_join(j1, degb, on="b", num_buckets=num_buckets)
    return j2.map_batches(
        lambda df: _coeff_frame(df, kind, weighted), batch_format="pandas"
    )


def _endpoint_weights(vertex_weights, num_buckets: int):
    """(vertex, weight) Dataset → (w, __wt) frame for joining on the
    shared wedge endpoint column."""
    return vertex_weights.map_batches(
        lambda df: pd.DataFrame(
            {"w": df["vertex"], "__wt": df["weight"].to_numpy(np.float64)}
        ),
        batch_format="pandas",
    )


def _weights_kv_ref(vertex_weights, broadcast_limit: int):
    """Materialized (vertex, weight) Dataset → broadcast (karr, varr)
    object ref when the table fits the gate, else None (join fallback).
    One ``ray.put``; every map task reads it zero-copy from plasma."""
    if vertex_weights.count() > broadcast_limit:
        return None
    return joins.broadcast_map_ref(
        vertex_weights.to_pandas(), "vertex", "weight"
    )


def _attach_wt_bc(df: pd.DataFrame, kv_ref, key_col: str) -> pd.DataFrame:
    """Map-side weight attach replicating the inner join: look up
    ``key_col`` in the broadcast map, drop rows whose key is absent."""
    import ray

    vals, found = joins.lookup_broadcast(
        df[key_col].to_numpy(), ray.get(kv_ref), missing="mask"
    )
    out = df.loc[found].copy()
    out["__wt"] = np.asarray(vals, dtype=np.float64)[found]
    return out


def _volumes(edges_ds, vertex_weights, num_buckets: int, kv_ref=None):
    """Neighborhood volume per vertex: vol(v) = Σ_{u∈N(v)} w(u).
    Returns (src, deg) with deg = weighted volume.  With a broadcast
    weight map (``kv_ref``) the attach is map-only; otherwise one
    bucketed join on the neighbor endpoint.  Either way the sum is the
    same map-combined aggregate."""
    from raygraph.agg import hash_aggregate

    if kv_ref is not None:
        ew = edges_ds.map_batches(
            lambda df, kv=kv_ref: _attach_wt_bc(
                df.rename(columns={"dst": "w"})[["src", "w"]], kv, "w"
            ),
            batch_format="pandas",
        )
    else:
        ew = joins.hash_join(
            edges_ds.map_batches(
                lambda df: df.rename(columns={"dst": "w"})[["src", "w"]],
                batch_format="pandas",
            ),
            _endpoint_weights(vertex_weights, num_buckets),
            on="w",
            num_buckets=num_buckets,
        )
    return hash_aggregate(ew, ["src"], {"deg": ("__wt", "sum")})


def pairwise_similarity(
    edges_ds,
    kind: str = "jaccard",
    num_buckets: int = 64,
    max_wedge_degree: Optional[int] = None,
    vertex_weights=None,
    broadcast_limit: int = 20_000_000,
):
    """edges_ds: symmetrized simple (src,dst) Dataset. Returns
    (a, b, common, deg_a, deg_b, coeff) for a<b pairs with common>0.

    ``max_wedge_degree``: skip shared endpoints with degree above this —
    bounds per-task wedge rows to max_wedge_degree² under hub skew (the
    same hot-key guard as the LSH bucket cap, ``dedup.py``).  None = exact.

    ``vertex_weights``: optional (vertex, weight) Dataset → weighted
    coefficients (``wjaccard.py`` semantics); ``common`` becomes the
    weighted intersection volume (float64).
    """
    from raygraph.agg import hash_aggregate

    # the edge list feeds the degree aggregate AND both wedge sides (and
    # the weight table when weighted) — pin it once so the caller's
    # upstream pipeline (distinct/symmetrize exchanges) runs once, not
    # once per consumer
    edges_ds = edges_ds.materialize()
    weighted = vertex_weights is not None
    kv_ref = None
    if weighted:
        vertex_weights = vertex_weights.materialize()  # 2 consumers
        # weight table ≤ broadcast_limit rows: ship it once via ray.put
        # and attach map-side — saves the two weight-attach exchanges
        # (volume join + wedge-side join); past the gate, bucketed joins
        kv_ref = _weights_kv_ref(vertex_weights, broadcast_limit)
        deg = _volumes(edges_ds, vertex_weights, num_buckets, kv_ref=kv_ref)
    else:
        deg = hash_aggregate(edges_ds, ["src"], {"deg": (None, "count")})

    if max_wedge_degree is not None:
        # attach deg(w) once (one bucketed join), drop hub-mediated wedges;
        # the cap always reasons about RAW degree (wedge fan-out), even
        # when the coefficient itself is weighted
        rawdeg = (
            hash_aggregate(edges_ds, ["src"], {"deg": (None, "count")})
            if weighted else deg
        )
        degw = rawdeg.map_batches(
            lambda df: df.rename(columns={"src": "w", "deg": "deg_w"}),
            batch_format="pandas",
        )
        base = joins.hash_join(
            edges_ds.map_batches(
                lambda df: df.rename(columns={"src": "x", "dst": "w"})[["x", "w"]],
                batch_format="pandas",
            ),
            degw,
            on="w",
            num_buckets=num_buckets,
        ).map_batches(
            lambda df, cap=max_wedge_degree: df.loc[
                df["deg_w"] <= cap, ["x", "w"]
            ],
            batch_format="pandas",
        ).materialize()  # consumed by both wedge sides
        left = base.map_batches(
            lambda df: df.rename(columns={"x": "a"}), batch_format="pandas"
        )
        right = base.map_batches(
            lambda df: df.rename(columns={"x": "b"}), batch_format="pandas"
        )
    else:
        left = edges_ds.map_batches(
            lambda df: df.rename(columns={"src": "a", "dst": "w"})[["a", "w"]],
            batch_format="pandas",
        )
        right = edges_ds.map_batches(
            lambda df: df.rename(columns={"src": "b", "dst": "w"})[["b", "w"]],
            batch_format="pandas",
        )
    if weighted:
        # carry w's weight through the wedge: attach once to the left side
        if kv_ref is not None:
            left = left.map_batches(
                lambda df, kv=kv_ref: _attach_wt_bc(df, kv, "w"),
                batch_format="pandas",
            )
        else:
            left = joins.hash_join(
                left, _endpoint_weights(vertex_weights, num_buckets),
                on="w", num_buckets=num_buckets,
            )
    wedge = joins.hash_join(left, right, on="w", num_buckets=num_buckets)
    keep = ["a", "b", "__wt"] if weighted else ["a", "b"]
    pairs = wedge.map_batches(
        lambda df, keep=keep: df.loc[df["a"] < df["b"], keep],
        batch_format="pandas",
    )
    common = hash_aggregate(
        pairs, ["a", "b"],
        {"common": ("__wt", "sum") if weighted else (None, "count")},
    )
    return _attach_coeff(common, deg, kind, num_buckets, weighted=weighted)


def pair_similarity(
    edges_ds,
    pairs_ds,
    kind: str = "jaccard",
    num_buckets: int = 64,
    vertex_weights=None,
    broadcast_limit: int = 20_000_000,
):
    """Similarity coefficients over caller-provided (a, b) pairs — the
    reference's primary API (``link_prediction/jaccard.py`` computes over
    ``vertex_pair``; ``similarity_impl.cuh`` intersects the two adjacency
    lists per given pair).

    Work: join pairs to N(a) (Σ deg(a) rows), keep the rows whose wedge
    endpoint is also in N(b) (one more bucketed join), count per pair.
    No quadratic expansion under any skew.  Pairs with no common neighbor
    are returned with common=0 / coeff=0.
    Returns (a, b, common, coeff).

    ``vertex_weights``: optional (vertex, weight) Dataset → weighted
    coefficients (``wjaccard.py`` jaccard_w over caller pairs); ``common``
    becomes the weighted intersection volume (float64).
    """
    from raygraph.agg import hash_aggregate

    weighted = vertex_weights is not None
    edges_ds = edges_ds.materialize()  # deg + both adjacency probes
    pairs_ds = pairs_ds.materialize()  # candidate join + zero-fill join
    kv_ref = None
    if weighted:
        vertex_weights = vertex_weights.materialize()
        kv_ref = _weights_kv_ref(vertex_weights, broadcast_limit)
        deg = _volumes(edges_ds, vertex_weights, num_buckets, kv_ref=kv_ref)
    else:
        deg = hash_aggregate(edges_ds, ["src"], {"deg": (None, "count")})
    ea = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "a", "dst": "w"})[["a", "w"]],
        batch_format="pandas",
    )
    eb = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "b", "dst": "w"})[["b", "w"]],
        batch_format="pandas",
    )
    cand = joins.hash_join(pairs_ds, ea, on="a", num_buckets=num_buckets)
    hit = joins.hash_join(cand, eb, on=["b", "w"], num_buckets=num_buckets)
    if weighted:
        if kv_ref is not None:
            hit = hit.map_batches(
                lambda df, kv=kv_ref: _attach_wt_bc(df, kv, "w"),
                batch_format="pandas",
            )
        else:
            hit = joins.hash_join(
                hit, _endpoint_weights(vertex_weights, num_buckets),
                on="w", num_buckets=num_buckets,
            )
    counted = hash_aggregate(
        hit, ["a", "b"],
        {"common": ("__wt", "sum") if weighted else (None, "count")},
    )
    # left-join back so zero-common pairs keep a row (reference contract)
    cast = np.float64 if weighted else np.int64
    common = joins.hash_join(
        pairs_ds, counted, on=["a", "b"], how="left", num_buckets=num_buckets
    ).map_batches(
        lambda df, cast=cast: pd.DataFrame(
            {
                "a": df["a"].to_numpy(np.int64),
                "b": df["b"].to_numpy(np.int64),
                "common": df["common"].fillna(0).to_numpy(cast),
            }
        ),
        batch_format="pandas",
    )
    return _attach_coeff(common, deg, kind, num_buckets, weighted=weighted)
