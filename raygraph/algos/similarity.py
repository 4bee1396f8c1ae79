"""Vertex-pair similarity: Jaccard / Sørensen / Overlap coefficients.

Reference: ``cpp/src/link_prediction/{jaccard,sorensen,overlap}_impl.cuh``
(+ ``similarity_impl.cuh``) — neighbor-set intersection per vertex pair via
``per_v_pair_transform_dst_nbr_intersection.cuh``.

Relational mapping (no list columns): common-neighbor counts by self-joining
the symmetrized edge list on the shared endpoint (``groupby`` wedge count),
degrees from a groupby, coefficients from exact integer counts:

* jaccard  = |N(a)∩N(b)| / |N(a)∪N(b)|
* sorensen = 2·|N(a)∩N(b)| / (|N(a)|+|N(b)|)
* overlap  = |N(a)∩N(b)| / min(|N(a)|,|N(b)|)

Pairs returned are all (a < b) with ≥1 common neighbor (the reference
computes over caller-provided pairs; pass ``pairs_filter`` to restrict).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from raygraph import joins


def pairwise_similarity(
    edges_ds,
    kind: str = "jaccard",
    num_buckets: int = 64,
):
    """edges_ds: symmetrized simple (src,dst) Dataset. Returns
    (a, b, common, deg_a, deg_b, coeff) for a<b pairs with common>0."""
    from raygraph.agg import hash_aggregate

    deg = hash_aggregate(edges_ds, ["src"], {"deg": (None, "count")})

    left = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "a", "dst": "w"})[["a", "w"]],
        batch_format="pandas",
    )
    right = edges_ds.map_batches(
        lambda df: df.rename(columns={"src": "b", "dst": "w"})[["b", "w"]],
        batch_format="pandas",
    )
    wedge = joins.hash_join(left, right, on="w", num_buckets=num_buckets)
    pairs = wedge.map_batches(
        lambda df: df.loc[df["a"] < df["b"], ["a", "b"]], batch_format="pandas"
    )
    common = hash_aggregate(pairs, ["a", "b"], {"common": (None, "count")})

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

    def coeff(df: pd.DataFrame) -> pd.DataFrame:
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
        out["common"] = df["common"].to_numpy(np.int64)
        out["coeff"] = v
        return out

    return j2.map_batches(coeff, batch_format="pandas")
