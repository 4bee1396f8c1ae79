"""Exact distributed order statistics.

``quantiles_disc`` computes exact discrete quantiles (DuckDB
``quantile_disc`` semantics: the value at 1-based rank
``max(1, ceil(q·n))`` of the sorted column) from a value-count
aggregate: one combiner shuffle produces (value, count) rows, the
driver holds only the distinct values and reads the answer off the
cumulative counts.  Scale contract: the column's DISTINCT value count
must be bounded (integer codes, enum-ish measures, fixed-precision
decimals) — the aggregate output, not the data, must fit on the driver.

``quantiles_cont`` lifts that restriction for arbitrary float64
columns: a multi-level radix refinement over the order-preserving
IEEE-754 bit image of the values.  Each level histograms the active
candidate key ranges into 2^16 bins (a map-only filter + one tiny
count aggregate — never a global sort), narrows every target rank to
one bin, and either pulls the few surviving values exactly or, after
at most four levels, has resolved all 64 bits so the answer falls out
of the counts alone.  Exact at any scale, no all-to-all: the dataset
is scanned at most 4 times (1-2 in practice) and only O(2^16 · #active
prefixes) count rows ever reach the driver.
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


# ---------------------------------------------------------------------------
# exact quantiles over unbounded float columns

def _float_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving bijection float64 → uint64.

    Standard IEEE trick: flip all bits of negatives, flip only the sign
    bit of non-negatives; the unsigned keys then sort exactly like the
    floats (−0.0 lands immediately below +0.0 — both read back as 0.0).
    """
    u = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    mask = np.where(
        (u >> np.uint64(63)).astype(bool),
        np.uint64(0xFFFFFFFFFFFFFFFF),
        np.uint64(0x8000000000000000),
    )
    return u ^ mask


def _key_float(k: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_float_key`."""
    k = np.asarray(k, dtype=np.uint64)
    mask = np.where(
        (k >> np.uint64(63)).astype(bool),
        np.uint64(0x8000000000000000),
        np.uint64(0xFFFFFFFFFFFFFFFF),
    )
    return (k ^ mask).view(np.float64)


def quantiles_cont(ds, col: str, qs: Sequence[float],
                   num_buckets: int = 64, pull_limit: int = 1_000_000):
    """pandas DataFrame (q, value): EXACT quantiles of an unbounded
    float64 column (``quantile_disc`` rank semantics — the value at
    1-based rank ``max(1, ceil(q·n))``; NULL/NaN rows are ignored, as in
    SQL).

    Level ``l`` histograms keys by their top ``16·(l+1)`` bits, but only
    for rows whose top ``16·l`` bits match one of the still-active
    prefixes (a broadcast set of ≤ len(qs) values) — a map-only filter
    feeding a bounded count aggregate.  When the total population of the
    candidate bins drops under ``pull_limit`` the surviving keys are
    pulled and indexed exactly; otherwise level 3 resolves all 64 bits
    and the answer is read off the counts.  The input is scanned once
    per level (pass a column-pruned Dataset); nothing is globally sorted
    and nothing unbounded reaches the driver.
    """
    from raygraph.agg import hash_aggregate

    qs = list(qs)
    if not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError("quantiles must be in [0, 1]")

    def _level(active_prefixes, shift_prev, shift_cur):
        """(prefix, count) aggregate at the new resolution."""
        pref = np.sort(np.asarray(list(active_prefixes), dtype=np.uint64))

        def bincounts(df: pd.DataFrame) -> pd.DataFrame:
            v = df[col].to_numpy()
            v = v[~np.isnan(v)] if v.dtype.kind == "f" else v.astype(np.float64)
            k = _float_key(v)
            if shift_prev < 64:
                m = np.isin(k >> np.uint64(shift_prev), pref)
                k = k[m]
            b = k >> np.uint64(shift_cur) if shift_cur else k
            ub, cnt = np.unique(b, return_counts=True)
            return pd.DataFrame({"__pfx": ub.astype(np.int64),
                                 "n": cnt.astype(np.int64)})

        agg = hash_aggregate(
            ds.map_batches(bincounts, batch_format="pandas"),
            ["__pfx"], {"n": ("n", "sum")}, num_buckets=num_buckets,
        ).to_pandas()
        # sort in UNSIGNED key order — at the final level the full
        # 64-bit keys wrap negative as int64, so a signed sort would
        # put positive floats (top bit set) first
        b = agg["__pfx"].to_numpy().astype(np.uint64)
        order = np.argsort(b)
        return b[order], agg["n"].to_numpy(np.int64)[order]

    # level 0: histogram everything by the top 16 bits
    bins, cnts = _level({np.uint64(0)}, 64, 48)
    n = int(cnts.sum())
    if n == 0:
        return pd.DataFrame({"q": np.asarray(qs, np.float64),
                             "value": [np.nan] * len(qs)})
    ranks = np.maximum(
        np.ceil(np.asarray(qs, np.float64) * n), 1
    ).astype(np.int64)

    # targets: global rank -> (containing prefix, 1-based rank within it)
    targets = {int(r): (np.uint64(0), int(r)) for r in ranks}
    shift = 48
    resolved: dict[int, float] = {}
    while True:
        # narrow each rank to its bin at the current resolution;
        # within one prefix the bins are contiguous in key order, and
        # across prefixes bin values are globally ordered, so one pass
        # over the (sorted) aggregate works for all targets: restrict
        # the cumsum to each target's own prefix range
        new_targets = {}
        for r, (pfx, r_in) in targets.items():
            if shift == 48:
                sel = slice(None)  # level 0: single implicit prefix
            else:
                m = (bins >> np.uint64(16)) == pfx
                sel = m
            b, c = bins[sel], cnts[sel]
            cum = np.cumsum(c)
            i = int(np.searchsorted(cum, r_in, side="left"))
            new_targets[r] = (b[i], int(r_in - (cum[i - 1] if i else 0)))
        targets = new_targets
        if shift == 0:
            for r, (pfx, _) in targets.items():
                resolved[r] = float(_key_float(np.array([pfx]))[0])
            break
        # early exit: pull the surviving candidate keys if few enough
        active = {p for p, _ in targets.values()}
        pop = int(cnts[np.isin(bins, np.sort(np.asarray(list(active),
                                                        np.uint64)))].sum())
        if pop <= pull_limit:
            pref = np.sort(np.asarray(list(active), dtype=np.uint64))
            sh = np.uint64(shift)

            def pull(df: pd.DataFrame) -> pd.DataFrame:
                v = df[col].to_numpy()
                v = (v[~np.isnan(v)] if v.dtype.kind == "f"
                     else v.astype(np.float64))
                k = _float_key(v)
                k = k[np.isin(k >> sh, pref)]
                return pd.DataFrame({"__k": k.astype(np.int64)})

            keys = (
                ds.map_batches(pull, batch_format="pandas")
                .to_pandas()["__k"].to_numpy().astype(np.uint64)
            )
            keys.sort()
            starts = {p: np.searchsorted(keys >> sh, p, side="left")
                      for p in pref}
            for r, (pfx, r_in) in targets.items():
                resolved[r] = float(
                    _key_float(keys[starts[pfx] + r_in - 1: starts[pfx]
                                    + r_in])[0]
                )
            break
        shift -= 16
        bins, cnts = _level(active, shift + 16, shift)

    return pd.DataFrame({
        "q": np.asarray(qs, np.float64),
        "value": np.asarray([resolved[int(r)] for r in ranks], np.float64),
    })
