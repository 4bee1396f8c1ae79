"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Exact dedup is the reference's edge-dedup shape (hash-partition +
per-group min, ``structure/symmetrize.py:92``) applied to content hashes.
Near-dup follows the standard MinHash-LSH construction (Broder 1997;
Leskovec-Rajaraman-Ullman ch.3): shingle → minhash signature → band →
bucket groupby → candidate pairs → Jaccard verify → connected components
via the same min-label propagation used for WCC.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from raygraph.hashing import splitmix64


def _md5_hex(values) -> list[str]:
    return [hashlib.md5(v.encode("utf-8")).hexdigest() for v in values]


def with_content_hash(ds, col: str = "text", out: str = "content_md5"):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df[out] = _md5_hex(df[col].astype(str).tolist())
        return df

    return ds.map_batches(fn, batch_format="pandas")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum-id row per distinct content hash.

    Returns (kept id, n_copies) — hash-partitioned bucketed aggregate.
    """
    from raygraph.agg import hash_aggregate

    hashed = with_content_hash(ds, col)
    out = hash_aggregate(
        hashed,
        ["content_md5"],
        {id_col: (id_col, "min"), "n_copies": (None, "count")},
    )
    return out.select_columns([id_col, "n_copies"])


# ---------------------------------------------------------------------------
# MinHash + LSH


def _shingles(text: str, k: int) -> np.ndarray:
    t = text.encode("utf-8", "ignore")
    if len(t) < k:
        # stable (process-independent) hash of the whole short text
        h = int.from_bytes(hashlib.md5(t).digest()[:8], "little") & 0x7FFFFFFFFFFFFFFF
        return np.array([h], dtype=np.uint64)
    # rolling byte k-grams hashed via numpy view tricks
    arr = np.frombuffer(t, dtype=np.uint8)
    n = len(arr) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    for i in range(k):  # k is small (default 5): vectorized over n
        out = out * np.uint64(257) + arr[i : i + n]
    return np.unique(out)


class MinHasher:
    """Actor-pool stage: text → minhash signature columns.

    Permutation parameters generated once per actor (deterministic seed).
    """

    def __init__(self, text_col="text", id_col="doc_id", num_perm=64,
                 shingle_k=5, seed=42):
        self.text_col = text_col
        self.id_col = id_col
        self.k = shingle_k
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, 2**61 - 1, size=num_perm).astype(np.uint64)
        self.p = np.uint64(2**61 - 1)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        # (a*x + b) mod p per permutation; min over shingles
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % self.p
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack(
            [self.signature(t) for t in df[self.text_col].astype(str)], axis=0
        )
        out = pd.DataFrame({self.id_col: df[self.id_col].to_numpy()})
        # store the signature matrix as flat int64 columns (no ragged cols)
        for j in range(sigs.shape[1]):
            out[f"mh{j}"] = sigs[:, j].astype(np.int64)
        return out


def minhash_signatures(ds, text_col="text", id_col="doc_id", num_perm=64,
                       shingle_k=5, seed=42, concurrency=(1, 4)):
    return ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_perm=num_perm,
            shingle_k=shingle_k, seed=seed,
        ),
        batch_format="pandas",
        concurrency=concurrency,
    )


def lsh_candidate_pairs(sig_ds, id_col="doc_id", num_perm=64, bands=16):
    """Band the signatures, bucket-group, emit candidate pairs (a < b).

    One (band_id, band_hash) groupby — the all-to-all step; everything else
    is map-side. Oversized buckets are truncated pairwise-adjacently to
    avoid quadratic blowup on degenerate buckets (documented cap).
    """
    rows_per_band = num_perm // bands

    def band_rows(df: pd.DataFrame) -> pa.Table:
        ids = df[id_col].to_numpy(np.int64)
        sig = np.stack(
            [df[f"mh{j}"].to_numpy(np.uint64) for j in range(num_perm)], axis=1
        )
        out_band, out_hash, out_id = [], [], []
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = np.zeros(len(ids), dtype=np.uint64)
            for c in range(chunk.shape[1]):
                h = splitmix64(h ^ chunk[:, c])
            out_band.append(np.full(len(ids), b, dtype=np.int64))
            out_hash.append(h.view(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band": np.concatenate(out_band),
                "bhash": np.concatenate(out_hash),
                id_col: np.concatenate(out_id),
            }
        )

    banded = sig_ds.map_batches(band_rows, batch_format="pandas")

    MAX_BUCKET = 64

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy(np.int64))
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64)})
        if len(ids) > MAX_BUCKET:
            # degenerate bucket: chain adjacent ids (connectivity preserved
            # for dedup-component purposes, avoids |bucket|^2 pairs)
            a, b = ids[:-1], ids[1:]
        else:
            i, j = np.triu_indices(len(ids), k=1)
            a, b = ids[i], ids[j]
        return pd.DataFrame({"a": a, "b": b})

    from raygraph.agg import bucketed_map_groups, distinct

    cand = bucketed_map_groups(banded, ["band", "bhash"], pairs)
    if cand.count() == 0:
        return cand
    return distinct(cand, ["a", "b"])


def verify_jaccard_pairs(ds, pairs_ds, text_col="text", id_col="doc_id",
                         shingle_k=5, threshold=0.8):
    """Exact shingle-Jaccard for candidate pairs (broadcast shingle sets).

    Candidate sets are tiny relative to the corpus; docs involved in pairs
    are collected once and broadcast. At 100 TB scale this becomes a join of
    pairs against the doc table — the broadcast guard raises if abused.
    """
    import ray

    pairs = pairs_ds.to_pandas()
    if not len(pairs):
        pairs["jaccard"] = pd.Series(dtype=float)
        return pairs
    needed = np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
    if len(needed) > 2_000_000:
        raise NotImplementedError("candidate set too large for broadcast verify")
    nref = ray.put(np.sort(needed))

    def collect(df: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(nref)
        m = df[np.isin(df[id_col].to_numpy(), ns)]
        return m[[id_col, text_col]]

    docs = ds.map_batches(collect, batch_format="pandas").to_pandas()
    sh = {
        int(r[id_col]): set(_shingles(str(r[text_col]), shingle_k).tolist())
        for _, r in docs.iterrows()
    }
    jac = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = sh.get(int(a), set()), sh.get(int(b), set())
        inter = len(sa & sb)
        union = len(sa | sb)
        jac.append(inter / union if union else 0.0)
    pairs = pairs.copy()
    pairs["jaccard"] = jac
    return pairs[pairs["jaccard"] >= threshold].reset_index(drop=True)


def near_dedup_minhash(ds, text_col="text", id_col="doc_id", num_perm=64,
                       bands=16, shingle_k=5, threshold=0.8, seed=42):
    """Full near-dup pipeline → (doc_id, dup_group) for docs in dup groups.

    Components over verified pairs are computed with union-find on the
    verified pair list (pairs ≪ corpus; for pathological pair volumes the
    WCC superstep engine over the pair graph is the scale path).
    """
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle_k, seed)
    cand = lsh_candidate_pairs(sigs, id_col, num_perm, bands)
    verified = verify_jaccard_pairs(ds, cand, text_col, id_col, shingle_k, threshold)
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(verified["a"], verified["b"]):
        a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = sorted({int(x) for x in verified[["a", "b"]].to_numpy().ravel()})
    return pd.DataFrame(
        {"doc_id": members, "dup_group": [find(m) for m in members]}
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHasher:
    """64-bit SimHash over word tokens (Charikar 2002)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.tok = re.compile(r"\w+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df[self.text_col].astype(str):
            words = self.tok.findall(t.lower())
            if not words:
                out.append(0)
                continue
            hs = np.array(
                [int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                 for w in words],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            sim = np.uint64(0)
            for i in range(64):
                if vote[i] > 0:
                    sim |= np.uint64(1) << np.uint64(i)
            out.append(int(sim.view(np.int64) if hasattr(sim, "view") else sim))
        return pd.DataFrame(
            {self.id_col: df[self.id_col].to_numpy(),
             "simhash": np.array(out, dtype=np.int64)}
        )


def simhash_signatures(ds, text_col="text", id_col="doc_id", concurrency=(1, 4)):
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )


def ngram_jaccard_pairs(ds, pairs: pd.DataFrame, text_col="text",
                        id_col="doc_id", n: int = 3):
    """Exact character-n-gram Jaccard for explicit id pairs."""
    return verify_jaccard_pairs(ds, _as_ds(pairs), text_col, id_col,
                                shingle_k=n, threshold=0.0)


def _as_ds(df: pd.DataFrame):
    import ray.data as rd

    return rd.from_pandas(df)
