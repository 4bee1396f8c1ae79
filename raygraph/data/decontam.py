"""Benchmark decontamination: flag/remove documents sharing word
n-grams with an evaluation ("benchmark") set.

The standard pretraining hygiene step (GPT-3 appendix C, Gopher §A1.2):
a training document is *contaminated* if any of its word n-grams also
appears in a held-out benchmark document (13-grams in the papers; the
``n`` here is a parameter).  The benchmark side is small by nature (an
eval suite is at most ~10^5 documents), so it is collected once on the
driver, compiled into a vectorized membership structure, and broadcast
via ``ray.put`` — every map task reads the same object-store copy; the
corpus side streams through a pure ``map_batches`` with no shuffle.

Membership structure: the distinct benchmark n-grams sorted by their
64-bit SipHash (``pd.util.hash_array``, the deterministic vectorized
hash the repo's key hashing already uses), with the gram strings kept
aligned for an exact string confirm — a doc gram counts as a hit only
when the *string* matches, so results are exactly the SQL join
semantics regardless of hash collisions (a duplicate-hash range is
rescanned with a tiny loop).  At 10^7 benchmark grams the structure is
two arrays of ~80 MB + strings — broadcastable; numpy columns come out
of the object store zero-copy.

Tokenizer: the shared ``raygraph.data.text._WORD`` (lowercase ``\\w+``)
used by every text operator and oracle; grams are space-joined token
windows, deduplicated per document (a doc repeating one contaminated
gram counts it once — matching the DISTINCT join oracle).

Reference analogue: cuGraph has no corpus ops; this follows the
published decontamination recipes cited above, expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

from raygraph.data.text import _WORD


def _doc_grams(text: str, n: int) -> np.ndarray:
    """Distinct space-joined word n-grams of one document (object array)."""
    ws = _WORD.findall(text.lower())
    if len(ws) < n:
        return np.empty(0, dtype=object)
    grams = [" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)]
    return np.unique(np.array(grams, dtype=object))


def build_benchmark(texts, n: int):
    """Compile benchmark texts into a broadcastable membership structure.

    ``texts`` is an iterable of benchmark document strings (driver-side —
    eval suites are small by contract; for a benchmark too big for one
    heap, shard it and union the reports).  Returns a ``ray.ObjectRef``
    to ``(sorted_hashes, grams_sorted_by_hash, n)``.
    """
    all_grams = set()
    for t in texts:
        all_grams.update(_doc_grams(str(t), n))
    grams = np.array(sorted(all_grams), dtype=object)
    h = pd.util.hash_array(grams) if len(grams) else np.empty(0, np.uint64)
    order = np.argsort(h, kind="stable")
    return ray.put((h[order], grams[order], n))


def _member(bench_h: np.ndarray, bench_g: np.ndarray, qg: np.ndarray) -> np.ndarray:
    """Exact membership of query grams ``qg`` in the benchmark set.

    Vectorized hash searchsorted + aligned string confirm; the rare
    duplicate-hash range (different strings, equal SipHash) is rescanned
    row-by-row so the result is string-exact.
    """
    if len(bench_h) == 0 or len(qg) == 0:
        return np.zeros(len(qg), dtype=bool)
    qh = pd.util.hash_array(qg)
    pos = np.searchsorted(bench_h, qh)
    pos = np.minimum(pos, len(bench_h) - 1)
    hash_hit = bench_h[pos] == qh
    ok = hash_hit & (bench_g[pos] == qg)
    for i in np.flatnonzero(hash_hit & ~ok):
        p = pos[i] + 1
        while p < len(bench_h) and bench_h[p] == qh[i]:
            if bench_g[p] == qg[i]:
                ok[i] = True
                break
            p += 1
    return ok


def contamination_report(ds, bench_ref, text_col="text", id_col="doc_id"):
    """(id, n_hit_grams) for every document with ≥1 distinct n-gram also
    present in the benchmark set.  Map-only: the benchmark structure is
    read from the object store once per task; the corpus streams.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bench_h, bench_g, n = ray.get(bench_ref)
        ids, counts = [], []
        for id_, t in zip(df[id_col], df[text_col].astype(str)):
            grams = _doc_grams(t, n)
            c = int(_member(bench_h, bench_g, grams).sum())
            if c:
                ids.append(id_)
                counts.append(c)
        return pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype=df[id_col].dtype),
                "n_hit_grams": pd.Series(counts, dtype=np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")


def decontaminate(ds, bench_ref, text_col="text", id_col="doc_id"):
    """Drop contaminated documents (any distinct benchmark n-gram hit);
    documents shorter than ``n`` tokens are always kept.  Map-only filter
    preserving all input columns.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bench_h, bench_g, n = ray.get(bench_ref)
        keep = np.ones(len(df), dtype=bool)
        for i, t in enumerate(df[text_col].astype(str)):
            grams = _doc_grams(t, n)
            if len(grams) and _member(bench_h, bench_g, grams).any():
                keep[i] = False
        return df[keep]

    return ds.map_batches(fn, batch_format="pandas")
