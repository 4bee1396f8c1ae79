"""Deterministic content-keyed sampling / dataset splitting.

The training-data staples: downsample a corpus to a rate, or assign
stable train/val/test splits, such that membership depends only on the
row's id (never on placement, parallelism, or row order) and survives
re-runs and resumes.  The decision hash is md5 of the salted id string —
cheap, endianness-free, and exactly reproducible in SQL
(``CAST('0x' || substr(md5(id), 1, 8) AS UBIGINT)``), so both operators
carry exact DuckDB oracles.

Reference analogue: cuGraph's datasets module exposes sampled subsets
(python/cugraph/cugraph/datasets) and the MG test harness downsamples
inputs per-rank deterministically; the md5-threshold formulation here is
the standard content-hash split used by large-scale corpus pipelines.
"""

from __future__ import annotations

import hashlib
from typing import Dict

import numpy as np
import pandas as pd

_SCALE = 2 ** 32


def _prefix32(ids: pd.Series, salt: str) -> np.ndarray:
    """32-bit big-endian prefix of md5(salt + str(id)) per row.

    md5 is per-item by nature (no vectorized kernel exists); the loop runs
    over one batch and is the same pattern as the sha256 ingest stage.
    """
    pre = salt.encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(pre + s.encode()).digest()[:4], "big")
            for s in ids.astype(str)
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def hash_sample(ds, id_col: str, rate: float, salt: str = ""):
    """Keep rows whose md5-prefix bucket falls below ``rate`` — a
    deterministic, placement-independent Bernoulli(rate) sample keyed on
    the id.  Map-only (no shuffle); re-running or resuming selects the
    exact same rows.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = np.uint64(int(rate * _SCALE))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[_prefix32(df[id_col], salt) < threshold]

    return ds.map_batches(keep, batch_format="pandas")


def hash_split(ds, id_col: str, splits: Dict[str, float], salt: str = "",
               out_col: str = "split"):
    """Assign each row a stable split label: the [0, 1) hash point of the
    id falls into consecutive half-open intervals sized by ``splits``
    (insertion order; weights must sum to 1).  Map-only; the same id
    always lands in the same split, at any parallelism, across re-runs.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    names = list(splits.keys())
    # upper bound of each interval in 32-bit hash space; the last one
    # covers the full remainder so rounding can never drop a row
    bounds = (np.cumsum([splits[n] for n in names]) * _SCALE).astype(np.uint64)
    bounds[-1] = np.uint64(_SCALE)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = _prefix32(df[id_col], salt)
        idx = np.searchsorted(bounds, h, side="right")
        out = df.copy()
        out[out_col] = np.asarray(names, dtype=object)[idx]
        return out

    return ds.map_batches(assign, batch_format="pandas")


def stratified_sample(ds, group_col: str, id_col: str, n_per_group: int,
                      salt: str = ""):
    """Deterministic fixed-size per-group sample: within each
    ``group_col`` value keep the ``n_per_group`` rows ranked first by
    md5-hash of the id (id ascending as the total-order tiebreak).

    The training-data staple "take N documents per language / per
    source": hash-ranking makes the pick uniform over the group and —
    like :func:`hash_sample` — independent of placement, parallelism,
    row order, and resume.  Built on ``grouped_topk``'s combinable
    two-phase top-k, so the shuffle carries ≤ ``n_per_group`` rows per
    group per block regardless of group sizes (no skew blowup on hot
    groups).
    """
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")
    from raygraph.agg import grouped_topk

    def add_h(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__h"] = _prefix32(df[id_col], salt).astype(np.int64)
        return out

    tagged = ds.map_batches(add_h, batch_format="pandas")
    out = grouped_topk(tagged, [group_col], ["__h", id_col], n_per_group,
                       ascending=True)
    return out.drop_columns(["__h"])
