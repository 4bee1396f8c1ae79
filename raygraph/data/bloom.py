"""Bloom filter — shuffle-free approximate semi-joins.

The classic 100 TB join-avoidance primitive: build a bit array from the
small side's join keys (k md5-derived hash functions over m bits), then
filter the big side with a pure ``map_batches`` probe — no all-to-all
exchange of the big table.  False positives pass the filter (rate
≈ (1 − e^{−kn/m})^k); false negatives are impossible, so composing
``bloom_semi_join`` with an exact join on the (much smaller) survivor
set gives exact semantics at a fraction of the shuffle volume.

Distribution shape mirrors the repo's other sketches (:mod:`cms`,
:mod:`sketch`): one map pass emits per-batch distinct bit indices
(≤ m per block — the combiner IS the sketch), one tiny bucketed
distinct over ≤ m rows, and the finished filter is a packed bitmap
broadcast once via ``ray.put`` and read zero-copy by every probe task.

Determinism: ``hash_i(v)`` is the 32-bit big-endian prefix of
``md5(f"{i}:{v}")`` mod m — a pure function of (i, value), so the bit
table is identical at any parallelism and exactly reproducible in SQL,
which is how the driver oracle checks it hash-exact.

Sizing: m = 2³³ bits is a 1 GiB bitmap ≈ 860 M keys at 1% fp (k=7) —
at the edge of comfortable broadcast; past that, partition the build by
key-hash and probe against the matching slice instead of one bitmap.

Reference analogue: cuGraph has no sketches; standard construction
(Bloom 1970), expressed Ray-Data-first.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _bit_positions(vals, k: int, m_bits: int) -> np.ndarray:
    """(k, len(vals)) int64 bit indices; md5 paid once per value per i."""
    out = np.empty((k, len(vals)), dtype=np.int64)
    for i in range(k):
        pre = f"{i}:".encode()
        out[i] = [
            int.from_bytes(
                hashlib.md5(pre + str(v).encode()).digest()[:4], "big"
            )
            % m_bits
            for v in vals
        ]
    return out


def bloom_bits(ds, col: str, m_bits: int = 1 << 20, k: int = 3):
    """Dataset ``(bit,)`` — the distinct set bit indices of the filter
    over ``ds[col]`` (the sparse, SQL-checkable form of the bitmap)."""
    if k < 1 or m_bits < 2:
        raise ValueError(f"bad filter shape m_bits={m_bits} k={k}")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"bit": pd.Series(dtype=np.int64)})
        vals = pd.unique(df[col])
        bits = np.unique(_bit_positions(vals, k, m_bits))
        return pd.DataFrame({"bit": bits})

    from raygraph.agg import distinct

    return distinct(ds.map_batches(partial, batch_format="pandas"), ["bit"])


def bloom_build(ds, col: str, m_bits: int = 1 << 20, k: int = 3):
    """Build the packed bitmap and place it in the object store once.

    Returns ``(bits_ref, m_bits, k)`` — pass to :func:`bloom_semi_join` /
    :func:`bloom_probe`.  The bitmap is ``m_bits/8`` bytes regardless of
    key count (see module docstring for broadcast sizing)."""
    idx = bloom_bits(ds, col, m_bits=m_bits, k=k).to_pandas()
    bitmap = np.zeros(m_bits, dtype=bool)
    if len(idx):  # empty build → all-zero filter (column absent on empty)
        bitmap[idx["bit"].to_numpy(np.int64)] = True
    import ray

    return ray.put(np.packbits(bitmap)), m_bits, k


def _probe_packed(packed: np.ndarray, vals, k: int, m_bits: int) -> np.ndarray:
    pos = _bit_positions(vals, k, m_bits)
    hit = (packed[pos >> 3] >> (np.uint8(7) - (pos & 7).astype(np.uint8))) & 1
    return hit.all(axis=0).astype(bool)


def bloom_probe(bloom, values) -> np.ndarray:
    """Vectorized might-contain over a values array (driver-side)."""
    import ray

    bits_ref, m_bits, k = bloom
    packed = ray.get(bits_ref)
    vals = np.asarray(list(values), dtype=object)
    if not len(vals):
        return np.zeros(0, dtype=bool)
    return _probe_packed(packed, vals, k, m_bits)


def bloom_semi_join(ds, bloom, col: str, exact_with=None, on=None):
    """Rows of ``ds`` whose ``col`` might be in the filter — map-only,
    no shuffle of ``ds``.  False positives survive (bounded by the
    filter's fp rate); pass ``exact_with=<small-side Dataset>`` (and
    ``on``, default ``col``) to follow with an exact inner join on the
    survivor set for exact semi-join semantics."""
    import ray

    bits_ref, m_bits, k = bloom

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        packed = ray.get(bits_ref)
        vals = pd.unique(df[col])
        ok = _probe_packed(packed, vals, k, m_bits)
        good = set(vals[ok])
        return df[df[col].isin(good)]

    out = ds.map_batches(fn, batch_format="pandas")
    if exact_with is not None:
        from raygraph import joins

        keys = exact_with.map_batches(
            lambda df: df[[on or col]].drop_duplicates(),
            batch_format="pandas",
        )
        out = joins.hash_join(out, keys, on=on or col)
    return out
