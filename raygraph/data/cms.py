"""Count-Min sketch — approximate frequencies / heavy hitters.

The other sketch staple for 100 TB pipelines (Cormode & Muthukrishnan
2005): a ``depth × width`` counter matrix; item ``v`` increments one
counter per row at column ``hash_j(v) % width``; a point query reads
the **min** over the ``depth`` counters — always an overestimate, with
error ≤ εN (ε = e/width) at probability 1−δ (δ = e^−depth).

Distribution shape mirrors :mod:`raygraph.data.sketch` (HLL): one map
pass produces per-batch partial counters (≤ depth·width rows leave any
block regardless of block size — the combiner IS the sketch), then one
tiny bucketed sum-aggregate over ≤ depth·width keys.  No driver pass
over data; the finished sketch is ≤ depth·width rows.

Determinism: ``hash_j(v)`` is the 32-bit big-endian prefix of
``md5(f"{j}:{v}")`` mod width — a pure function of (row, value), so the
counter table is identical at any parallelism and exactly reproducible
in SQL (``CAST('0x' || substr(md5(j || ':' || v), 1, 8) AS UBIGINT) %
width``), which is how the driver oracle checks the sketch hash-exact.
Per-batch the md5 is paid once per *distinct* value (value_counts
first), not per row.

Reference analogue: cuGraph has no sketches; this follows the published
CMS construction, expressed Ray-Data-first.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _hash_cols(vals, depth: int, width: int) -> np.ndarray:
    """(depth, len(vals)) int64 column indices; md5 paid once per value
    per row index."""
    out = np.empty((depth, len(vals)), dtype=np.int64)
    for j in range(depth):
        pre = f"{j}:".encode()
        out[j] = [
            int.from_bytes(
                hashlib.md5(pre + str(v).encode()).digest()[:4], "big"
            )
            % width
            for v in vals
        ]
    return out


def cms_table(ds, col: str, depth: int = 4, width: int = 1024,
              weight_col: str | None = None):
    """Dataset ``(row, col, cnt)`` — the nonzero Count-Min counters of
    ``ds[col]`` (weighted by ``weight_col`` if given, else 1 per row).
    Missing (row, col) pairs are zero counters.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"bad sketch shape depth={depth} width={width}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"row": pd.Series(dtype=np.int64),
                 "col": pd.Series(dtype=np.int64),
                 "cnt": pd.Series(dtype=np.int64)}
            )
        if weight_col is None:
            vc = df[col].value_counts()
            vals, wts = vc.index.to_numpy(), vc.to_numpy(np.int64)
        else:
            g = df.groupby(col, sort=False)[weight_col].sum()
            vals, wts = g.index.to_numpy(), g.to_numpy(np.int64)
        cols = _hash_cols(vals, depth, width)
        rows_, cols_, cnts_ = [], [], []
        for j in range(depth):
            acc = np.bincount(cols[j], weights=wts, minlength=width)
            nz = np.flatnonzero(acc)
            rows_.append(np.full(len(nz), j, dtype=np.int64))
            cols_.append(nz.astype(np.int64))
            cnts_.append(acc[nz].astype(np.int64))
        return pd.DataFrame(
            {"row": np.concatenate(rows_), "col": np.concatenate(cols_),
             "cnt": np.concatenate(cnts_)}
        )

    from raygraph.agg import hash_aggregate

    parts = ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(parts, ["row", "col"], {"cnt": ("cnt", "sum")})


def cms_query(table: pd.DataFrame, values, depth: int = 4,
              width: int = 1024) -> np.ndarray:
    """Point-query frequencies of ``values`` from a finished counter
    table (pandas; ≤ depth·width rows): min over the depth rows.
    Always ≥ the true count; == for items whose counters saw no
    collisions."""
    mat = np.zeros((depth, width), dtype=np.int64)
    if len(table):
        mat[table["row"].to_numpy(np.int64),
            table["col"].to_numpy(np.int64)] = table["cnt"].to_numpy(np.int64)
    vals = np.asarray(list(values), dtype=object)
    cols = _hash_cols(vals, depth, width)
    return mat[np.arange(depth)[:, None], cols].min(axis=0)


def heavy_hitters(ds, col: str, threshold: int, depth: int = 4,
                  width: int = 1024, candidates=None):
    """(value, est) for candidate values whose CMS estimate ≥ threshold.

    CMS answers point queries, so heavy-hitter extraction needs a
    candidate stream; by default the distinct values of one hash
    partition-sized sample is NOT sound, so ``candidates=None`` streams
    *all* distinct values through a second pass (bounded: distinct
    values per batch, deduped by the same bucketed aggregate) — still
    sketch-cheap because the filter is the tiny broadcast counter table,
    not a count per value.
    """
    tbl = cms_table(ds, col, depth=depth, width=width).to_pandas()
    if candidates is not None:
        vals = np.asarray(list(candidates), dtype=object)
        est = cms_query(tbl, vals, depth=depth, width=width)
        keep = est >= threshold
        return pd.DataFrame({"value": vals[keep], "est": est[keep]})

    import ray

    tref = ray.put(tbl)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tref)
        vals = pd.unique(df[col])
        est = cms_query(t, vals, depth=depth, width=width)
        keep = est >= threshold
        return pd.DataFrame({"value": vals[keep], "est": est[keep]})

    from raygraph.agg import hash_aggregate

    hits = ds.map_batches(probe, batch_format="pandas")
    # distinct (value, est) — est is a pure function of value
    return hash_aggregate(hits, ["value"], {"est": ("est", "max")})
