"""Exact distributed order statistics over bounded-cardinality columns.

``quantiles_disc`` computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: the value at 1-based rank
``max(1, ceil(q·n))`` of the sorted column) from a value-count
aggregate: one combiner shuffle produces (value, count) rows, the
driver holds only the distinct values and reads the answer off the
cumulative counts.

Scale contract: the column's DISTINCT value count must be bounded
(integer codes, enum-ish measures, fixed-precision decimals) — the
aggregate output, not the data, must fit on the driver.  For unbounded
float columns use a sketch (t-digest-style) instead; the HLL module
shows the sketch pattern.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def quantiles_disc(ds, col: str, qs: Sequence[float], num_buckets: int = 64):
    """pandas DataFrame (q, value): exact discrete quantiles of ``col``."""
    from raygraph.agg import hash_aggregate

    qs = list(qs)
    if not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return df[[col]]

    counts = (
        hash_aggregate(
            ds.map_batches(project, batch_format="pandas"),
            [col], {"n": (None, "count")}, num_buckets=num_buckets,
        )
        .to_pandas()  # one row per DISTINCT value — bounded by contract
        .sort_values(col)
    )
    if not len(counts):
        return pd.DataFrame({"q": qs, "value": [np.nan] * len(qs)})
    cum = counts["n"].to_numpy(np.int64).cumsum()
    vals = counts[col].to_numpy()
    n = int(cum[-1])
    ranks = np.maximum(np.ceil(np.asarray(qs, np.float64) * n), 1).astype(np.int64)
    pos = np.searchsorted(cum, ranks, side="left")
    return pd.DataFrame({"q": np.asarray(qs, np.float64), "value": vals[pos]})
