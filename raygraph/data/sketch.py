"""HyperLogLog distinct-count sketch.

The approximate-distinct staple for 100 TB pipelines: one map pass
producing per-batch partial registers (2^b buckets, each holding the max
leading-zero rank seen), one tiny groupby-max over ≤ 2^b rows, and an
O(1) driver-side estimate (Flajolet et al. 2007, with the standard
small- and large-range corrections for a 32-bit hash).

Determinism: the item hash is the 32-bit big-endian prefix of
md5(str(value)) — a pure function of the value, so the register table
(and therefore the estimate) is identical at any parallelism and exactly
reproducible in SQL (``CAST('0x' || substr(md5(v), 1, 8) AS UBIGINT)``),
which is how the driver oracle checks it hash-exact.  All tail values
fit well under 2^53, so the numpy and SQL ``floor(log2(...))`` agree
exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_HASH_BITS = 32


def _hash32(vals: pd.Series) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(v).encode()).digest()[:4], "big")
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def hll_registers(ds, col: str, b: int = 10):
    """(bucket, maxrank) register table: bucket = top ``b`` hash bits,
    rank = 1 + leading zeros of the remaining ``32-b`` bits (capped at
    ``32-b+1`` for an all-zero tail).  Per-batch partial max (map-side
    combine — at most 2^b rows leave any block), then one tiny
    bucket-max aggregate.  Missing buckets mean "never seen" (rank-0
    registers are omitted; the estimator treats them as zero).
    """
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    tail_bits = _HASH_BITS - b

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"bucket": pd.Series(dtype=np.int64),
                 "maxrank": pd.Series(dtype=np.int64)}
            )
        h = _hash32(df[col])
        bucket = (h >> np.uint64(tail_bits)).astype(np.int64)
        tail = h & ((np.uint64(1) << np.uint64(tail_bits)) - np.uint64(1))
        # bit_length(0) := 0 → rank = tail_bits + 1 (the cap), as required;
        # tails are < 2^28 so the float64 log2 floor is exact
        blen = np.zeros(len(tail), dtype=np.int64)
        nz = tail > 0
        blen[nz] = np.floor(
            np.log2(tail[nz].astype(np.float64))
        ).astype(np.int64) + 1
        rank = tail_bits - blen + 1
        out = pd.DataFrame({"bucket": bucket, "maxrank": rank})
        return out.groupby("bucket", as_index=False)["maxrank"].max()

    from raygraph.agg import hash_aggregate

    parts = ds.map_batches(partial, batch_format="pandas")
    return hash_aggregate(parts, ["bucket"], {"maxrank": ("maxrank", "max")})


def hll_estimate(registers: pd.DataFrame, b: int = 10) -> float:
    """Distinct-count estimate from a register table (pandas; ≤ 2^b rows).

    Standard 32-bit HLL: linear counting below 2.5·m, the
    ``-2^32·ln(1 − E/2^32)`` correction above 2^32/30.
    """
    m = 1 << b
    reg = np.zeros(m, dtype=np.int64)
    if len(registers):
        reg[registers["bucket"].to_numpy(np.int64)] = (
            registers["maxrank"].to_numpy(np.int64)
        )
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int((reg == 0).sum())
    two32 = float(1 << _HASH_BITS)
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting (small range)
    elif est > two32 / 30.0:
        est = -two32 * np.log(1.0 - est / two32)  # large range
    return float(est)


def approx_distinct(ds, col: str, b: int = 10) -> float:
    """One-call approximate distinct count of ``ds[col]``."""
    regs = hll_registers(ds, col, b=b).to_pandas()
    return hll_estimate(regs, b=b)
