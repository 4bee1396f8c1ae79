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


def _ragged_triu_chunks(seg_sizes: np.ndarray, chunk: int):
    """Yield (row_idx, off_in_row) index chunks enumerating, for every
    segment of a sorted array, all within-segment (i<j) pairs — fully
    vectorized (no Python loop over segments), emitted in chunks of at
    most ``chunk`` pairs so a hub segment never materializes its full
    C(d,2) expansion at once.  ``row_idx`` indexes the flat sorted array
    (the pair's first element); the second element is
    ``row_idx + off_in_row + 1``."""
    rep = np.repeat(seg_sizes, seg_sizes) - 1 - (
        np.arange(int(seg_sizes.sum()))
        - np.repeat(np.cumsum(seg_sizes) - seg_sizes, seg_sizes)
    )  # per-row count of pairs where this row is the first element
    tot = int(rep.sum())
    if tot == 0:
        return
    cum = np.cumsum(rep)
    for c0 in range(0, tot, chunk):
        c1 = min(c0 + chunk, tot)
        r0 = int(np.searchsorted(cum, c0, side="right"))
        r1 = int(np.searchsorted(cum, c1 - 1, side="right")) + 1
        starts_r = cum[r0:r1] - rep[r0:r1]
        lo = np.maximum(starts_r, c0)
        hi = np.minimum(cum[r0:r1], c1)
        cnt = hi - lo
        row_idx = np.repeat(np.arange(r0, r1, dtype=np.int64), cnt)
        base = np.repeat(lo - starts_r, cnt)
        off = base + (np.arange(c1 - c0) - np.repeat(np.cumsum(cnt) - cnt, cnt))
        yield row_idx, off


def pairwise_similarity(
    edges_ds,
    kind: str = "jaccard",
    num_buckets: int = 64,
    max_wedge_degree: Optional[int] = None,
    vertex_weights=None,
    broadcast_limit: int = 20_000_000,
    shared_state: Optional[dict] = None,
    local_edge_limit: int = 500_000,
):
    """edges_ds: symmetrized simple (src,dst) Dataset. Returns
    (a, b, common, coeff) for a<b pairs with common>0.  Edge sets under
    ``local_edge_limit`` run the identical expansion on driver arrays
    (pass 0 to force the distributed resident/join paths).

    ``shared_state``: optional caller-owned dict memoizing the resident
    path's kind-independent core (the materialized per-pair ``common``
    table + degree/dictionary broadcasts) — pass the SAME dict across
    jaccard/sorensen/overlap calls over the SAME edge set and only the
    finalize map re-runs per kind.

    Fast path (V ≤ ``broadcast_limit``): vertices are renumbered to dense
    ints via one broadcast dictionary (sorted, so int order ≡ key order),
    wedges are expanded from RESIDENT per-apex adjacency inside a single
    ``groupby(hash(apex)).map_groups`` — vectorized ragged-triu in bounded
    chunks, pair counts combined locally before the one (a,b)-keyed
    exchange — and degrees attach map-side from a broadcast array (the
    triangles intersection shape, ``algos/triangles.py``: task input is
    Σ deg, never Σ deg² shuffled wedge rows, so no hub cap is needed for
    exactness).  Past the gate, the bucketed-join formulation
    (:func:`_pairwise_similarity_join`) takes over.

    ``max_wedge_degree``: optionally skip shared endpoints with degree
    above this (documented approximation — pairs connected ONLY through
    capped hubs are dropped / undercounted).  None = exact.

    ``vertex_weights``: optional (vertex, weight) Dataset → weighted
    coefficients (``wjaccard.py`` semantics); ``common`` becomes the
    weighted intersection volume (float64).
    """
    import ray

    from raygraph.agg import hash_aggregate
    from raygraph.hashing import hash_int64

    weighted = vertex_weights is not None
    ck = ("resident_core", weighted)
    core = shared_state.get(ck) if shared_state is not None else None
    if core is not None:
        common_c, dref_c, vref_c, V_c = core
        return _resident_fin(
            common_c, dref_c, vref_c, V_c, kind,
            np.float64 if weighted else np.int64,
        )
    lk = ("local_core", weighted)
    lcore = shared_state.get(lk) if shared_state is not None else None
    if lcore is not None:
        return _similarity_fin_local(*lcore, kind, weighted)

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= local_edge_limit:
        lcore = _similarity_core_local(
            edges_ds, max_wedge_degree, vertex_weights)
        if shared_state is not None:
            shared_state[lk] = lcore
        return _similarity_fin_local(*lcore, kind, weighted)

    verts = hash_aggregate(
        edges_ds.map_batches(
            lambda df: df[["src"]], batch_format="pandas"
        ),
        ["src"], None, num_buckets=num_buckets,
    ).materialize()
    V = verts.count()
    if V > broadcast_limit or V * V > np.iinfo(np.int64).max:
        return _pairwise_similarity_join(
            edges_ds, kind, num_buckets, max_wedge_degree, vertex_weights,
            broadcast_limit,
        )
    varr = np.sort(verts.to_pandas()["src"].to_numpy())
    vref = ray.put((varr, np.arange(V, dtype=np.int64)))

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        kv = ray.get(vref)
        return pd.DataFrame(
            {
                "s": joins.lookup_broadcast(df["src"].to_numpy(), kv),
                "d": joins.lookup_broadcast(df["dst"].to_numpy(), kv),
            }
        )

    int_edges = edges_ds.map_batches(to_int, batch_format="pandas")

    # per-vertex degree (weighted: neighborhood volume) → broadcast array
    if weighted:
        wdf = vertex_weights.to_pandas()
        widx = pd.Index(varr).get_indexer(wdf["vertex"].to_numpy())
        wt = np.zeros(V, dtype=np.float64)
        ok = widx >= 0
        wt[widx[ok]] = wdf["weight"].to_numpy(np.float64)[ok]
        wtref = ray.put(wt)
        volsrc = int_edges.map_batches(
            lambda df: pd.DataFrame(
                {"s": df["s"], "w": ray.get(wtref)[df["d"].to_numpy()]}
            ),
            batch_format="pandas",
        )
        degdf = hash_aggregate(
            volsrc, ["s"], {"deg": ("w", "sum")}, num_buckets=num_buckets
        ).to_pandas()
    else:
        wtref = None
        degdf = hash_aggregate(
            int_edges, ["s"], {"deg": (None, "count")}, num_buckets=num_buckets
        ).to_pandas()
    deg_arr = np.zeros(V, dtype=np.float64)
    deg_arr[degdf["s"].to_numpy(np.int64)] = degdf["deg"].to_numpy(np.float64)
    dref = ray.put(deg_arr)

    WEDGE_BUCKETS = num_buckets

    def add_wb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["wb"] = (
            hash_int64(df["s"].to_numpy(np.int64)) % np.uint64(WEDGE_BUCKETS)
        ).astype(np.int32)
        return df

    cnt_dtype = np.float64 if weighted else np.int64
    cnt_col = "ws" if weighted else "cnt"

    def expand(g: pd.DataFrame, cap=max_wedge_degree, chunk=1 << 22
               ) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"pk": pd.Series(dtype=np.int64),
             cnt_col: pd.Series(dtype=cnt_dtype)}
        )
        if not len(g):
            return empty
        s = g["s"].to_numpy(np.int64)
        d = g["d"].to_numpy(np.int64)
        order = np.lexsort((d, s))  # apex-major, neighbors ascending
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.r_[starts, len(s)])
        if cap is not None:
            keep = np.repeat(sizes <= cap, sizes)
            s, d = s[keep], d[keep]
            if not len(s):
                return empty
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            sizes = np.diff(np.r_[starts, len(s)])
        wts = ray.get(wtref) if weighted else None
        frames = []
        for row_idx, off in _ragged_triu_chunks(sizes, chunk):
            # neighbors sorted within each apex segment → d[i] < d[j]
            pk = d[row_idx] * V + d[row_idx + off + 1]
            if weighted:
                upk, inv = np.unique(pk, return_inverse=True)
                ws = np.bincount(inv, weights=wts[s[row_idx]])
                frames.append(pd.DataFrame({"pk": upk, cnt_col: ws}))
            else:
                upk, cnt = np.unique(pk, return_counts=True)
                frames.append(
                    pd.DataFrame({"pk": upk, cnt_col: cnt.astype(np.int64)})
                )
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    parts = (
        int_edges.map_batches(add_wb, batch_format="pandas")
        .groupby("wb")
        .map_groups(expand, batch_format="pandas")
    )
    common = hash_aggregate(
        parts, ["pk"], {"common": (cnt_col, "sum")}, num_buckets=num_buckets
    )
    if shared_state is not None:
        common = common.materialize()
        shared_state[ck] = (common, dref, vref, V)
    return _resident_fin(common, dref, vref, V, kind, cnt_dtype)


def _similarity_core_local(edges_ds, max_wedge_degree, vertex_weights):
    """Driver-local kind-independent similarity core for small edge sets:
    the SAME per-apex ragged-triu expansion and degree math as the
    resident path, on numpy arrays.  Returns (upk, common, deg, varr, V)
    — common counts are exact sums, so the single-division coefficients
    match the distributed path bit-for-bit."""
    df = edges_ds.to_pandas()
    varr = np.unique(df["src"].to_numpy())
    V = len(varr)
    s = np.searchsorted(varr, df["src"].to_numpy())
    d = np.searchsorted(varr, df["dst"].to_numpy())
    weighted = vertex_weights is not None
    if weighted:
        wdf = vertex_weights.to_pandas()
        widx = pd.Index(varr).get_indexer(wdf["vertex"].to_numpy())
        wt = np.zeros(V, dtype=np.float64)
        ok = widx >= 0
        wt[widx[ok]] = wdf["weight"].to_numpy(np.float64)[ok]
        deg = np.bincount(s, weights=wt[d], minlength=V)
    else:
        wt = None
        deg = np.bincount(s, minlength=V).astype(np.float64)
    order = np.lexsort((d, s))  # apex-major, neighbors ascending
    s, d = s[order], d[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    sizes = np.diff(np.r_[starts, len(s)])
    if max_wedge_degree is not None:
        keep = np.repeat(sizes <= max_wedge_degree, sizes)
        s, d = s[keep], d[keep]
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        sizes = np.diff(np.r_[starts, len(s)])
    pks, cnts = [], []
    for row_idx, off in _ragged_triu_chunks(sizes, 1 << 22):
        pk = d[row_idx] * V + d[row_idx + off + 1]
        upk, inv = np.unique(pk, return_inverse=True)
        pks.append(upk)
        if weighted:
            cnts.append(np.bincount(inv, weights=wt[s[row_idx]]))
        else:
            cnts.append(np.bincount(inv).astype(np.float64))
    if pks:
        allpk = np.concatenate(pks)
        allc = np.concatenate(cnts)
        upk, inv = np.unique(allpk, return_inverse=True)
        common = np.bincount(inv, weights=allc)
    else:
        upk = np.empty(0, np.int64)
        common = np.empty(0, np.float64)
    return upk, common, deg, varr, V


def _similarity_fin_local(upk, common, deg, varr, V, kind, weighted):
    import ray.data as rd

    ai, bi = upk // V, upk % V
    c = common.astype(np.float64)
    da, db = deg[ai], deg[bi]
    if kind == "jaccard":
        v = c / (da + db - c)
    elif kind == "sorensen":
        v = 2.0 * c / (da + db)
    elif kind == "overlap":
        v = c / np.minimum(da, db)
    else:
        raise ValueError(kind)
    return rd.from_pandas(
        pd.DataFrame(
            {
                "a": varr[ai],
                "b": varr[bi],
                "common": common.astype(
                    np.float64 if weighted else np.int64),
                "coeff": v,
            }
        )
    )


def _resident_fin(common, dref, vref, V, kind, cnt_dtype):
    """Kind-specific finalize over the resident path's per-pair common
    table (broadcast degree + dictionary lookups; the only stage that
    differs between jaccard / sorensen / overlap)."""
    import ray

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        deg = ray.get(dref)
        va = ray.get(vref)[0]
        pk = df["pk"].to_numpy(np.int64)
        ai, bi = pk // V, pk % V
        c = df["common"].to_numpy(np.float64)
        da, db = deg[ai], deg[bi]
        if kind == "jaccard":
            v = c / (da + db - c)
        elif kind == "sorensen":
            v = 2.0 * c / (da + db)
        elif kind == "overlap":
            v = c / np.minimum(da, db)
        else:
            raise ValueError(kind)
        return pd.DataFrame(
            {
                "a": va[ai],
                "b": va[bi],
                "common": df["common"].to_numpy(cnt_dtype),
                "coeff": v,
            }
        )

    return common.map_batches(fin, batch_format="pandas")


def _pairwise_similarity_join(
    edges_ds,
    kind: str = "jaccard",
    num_buckets: int = 64,
    max_wedge_degree: Optional[int] = None,
    vertex_weights=None,
    broadcast_limit: int = 20_000_000,
):
    """Bucketed-join formulation of :func:`pairwise_similarity` — the
    scale fallback when the vertex dictionary exceeds the broadcast gate.
    Exact unless ``max_wedge_degree`` caps hub-mediated wedges; the
    self-join on the shared endpoint emits |N(w)|² wedge rows per shared
    endpoint, so prefer the resident fast path whenever V fits."""
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
