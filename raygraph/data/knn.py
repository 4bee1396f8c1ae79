"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the baseline: the query matrix is broadcast via
``ray.put`` once, each batch does one float64 matmul against it and emits a
per-batch top-k partial; the driver merges partials (k×Q rows — tiny).
The IVF variant is the scale path: coarse k-means centroids (trained on a
sample, broadcast), batches route vectors to their nearest centroid
(assignment stage), and queries probe only ``nprobe`` inverted lists.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def _emb_matrix(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df[col]], axis=0)


def knn_bruteforce(ds, queries: np.ndarray, query_ids, k: int = 10,
                   emb_col: str = "embedding", id_col: str = "vec_id",
                   exclude_ids: bool = True, num_buckets: int = 16):
    """Exact cosine top-k of each query against the whole embedding Dataset.

    ``queries``: (Q, d) float array; broadcast once. Returns a pandas frame
    (query_id, neighbor_id, rank, score) with rank 1..k by
    (score desc, neighbor_id asc); scores rounded to 6 decimals before
    ranking so ordering is reproducible across float reduction orders.

    Scale path: each block emits its per-query top-k (one argpartition
    over the whole (Q, B) sim matrix — no per-query Python loop), the
    partials re-combine through ``agg.grouped_topk`` (map-side top-k
    combine + one bucket shuffle), so the driver sees ≤ Q×k rows no
    matter how many blocks the dataset has.
    """
    import ray

    from raygraph.agg import grouped_topk

    qm = _norm_rows(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((qm, qids))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qm, qids = ray.get(qref)
        emb = _norm_rows(_emb_matrix(df, emb_col))
        ids = df[id_col].to_numpy(np.int64)
        sims = qm @ emb.T  # (Q, B)
        if exclude_ids:
            sims[ids[None, :] == qids[:, None]] = -np.inf
        B = sims.shape[1]
        kk = min(k, B)
        if kk < B:
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        else:
            idx = np.broadcast_to(np.arange(B), (len(qids), B))
        scores = np.take_along_axis(sims, idx, axis=1).ravel()
        out = pd.DataFrame(
            {
                "query_id": np.repeat(qids, idx.shape[1]),
                "neighbor_id": ids[idx.ravel()],
                "score": np.round(scores, 6),
            }
        )
        return out[np.isfinite(scores)]

    partials = ds.map_batches(partial_topk, batch_format="pandas")
    top = grouped_topk(
        partials, ["query_id"], ["score", "neighbor_id"], k,
        ascending=[False, True], num_buckets=num_buckets,
    ).to_pandas()  # ≤ Q×k rows by construction
    top = top.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rank", "score"]]


def train_ivf_centroids(ds, num_centroids: int = 16, emb_col: str = "embedding",
                        sample_rows: int = 10_000, iters: int = 10, seed: int = 42,
                        id_col: str = "vec_id"):
    """Spherical k-means on a deterministic hash-stride sample (Lloyd's).

    The sample keeps rows with ``splitmix64(id) % stride == 0`` — unbiased
    w.r.t. storage order (``ds.limit`` would train on the FIRST rows, which
    is skewed on sorted inputs), deterministic across runs/parallelism.
    Init = the vectors of the ``num_centroids`` smallest sampled ids
    (fully deterministic and SQL-replayable —
    ``pipelines._ivf_knn_oracle_sql`` replays the whole training loop;
    ``seed`` is kept for API compatibility and no longer consumed)."""
    from raygraph.hashing import hash_int64

    n = ds.count()
    stride = max(1, n // max(1, sample_rows))

    def take(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_int64(df[id_col].to_numpy(np.int64))
        return df[h % np.uint64(stride) == 0]

    sample = ds.map_batches(take, batch_format="pandas").to_pandas()
    sample = sample.sort_values(id_col).reset_index(drop=True)
    X = _norm_rows(_emb_matrix(sample, emb_col))
    C = X[: min(num_centroids, len(X))].copy()
    for _ in range(iters):
        # round before argmax: insulates the assignment (and the SQL
        # oracle's replay) from summation-order ulp noise in the dot
        # products — a near-tie flipping in any iteration cascades
        assign = np.argmax(np.round(X @ C.T, 9), axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def ivf_assign(ds, centroids: np.ndarray, emb_col="embedding", id_col="vec_id"):
    """Add a ``list_id`` column: nearest centroid per vector (broadcast)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        C = ray.get(cref)
        emb = _norm_rows(_emb_matrix(df, emb_col))
        out = df.copy()
        # rounded argmax: same ulp insulation as the training loop
        out["list_id"] = np.argmax(np.round(emb @ C.T, 9), axis=1).astype(
            np.int64)
        return out

    return ds.map_batches(fn, batch_format="pandas")


class IvfIndex:
    """Persisted IVF index: centroids + vectors partitioned by inverted
    list on disk (hive ``list_id=`` dirs), so a probe reads ONLY the probed
    partitions — the assignment is paid once at build, not per query (the
    r1 version re-assigned the whole dataset on every call)."""

    def __init__(self, base_dir: str, centroids: np.ndarray,
                 emb_col: str = "embedding", id_col: str = "vec_id"):
        self.base_dir = base_dir
        self.centroids = centroids
        self.emb_col = emb_col
        self.id_col = id_col

    @staticmethod
    def build(ds, num_centroids: int = 16, out_dir: Optional[str] = None,
              emb_col: str = "embedding", id_col: str = "vec_id",
              sample_rows: int = 10_000, seed: int = 42) -> "IvfIndex":
        import os
        import tempfile
        import uuid

        if out_dir is None:
            out_dir = os.path.join(
                tempfile.gettempdir(), "raygraph", f"ivf-{uuid.uuid4().hex[:10]}"
            )
        os.makedirs(out_dir, exist_ok=True)
        C = train_ivf_centroids(
            ds, num_centroids, emb_col, sample_rows=sample_rows, seed=seed,
            id_col=id_col,
        )
        assigned = ivf_assign(ds, C, emb_col, id_col)
        assigned.write_parquet(
            os.path.join(out_dir, "lists"), partition_cols=["list_id"]
        )
        np.save(os.path.join(out_dir, "centroids.npy"), C)
        return IvfIndex(out_dir, C, emb_col, id_col)

    @staticmethod
    def load(base_dir: str, emb_col: str = "embedding",
             id_col: str = "vec_id") -> "IvfIndex":
        import os

        C = np.load(os.path.join(base_dir, "centroids.npy"))
        return IvfIndex(base_dir, C, emb_col, id_col)

    def query(self, queries: np.ndarray, query_ids, k: int = 10,
              nprobe: int = 4, exclude_ids: bool = True):
        import os

        import ray.data as rd

        qm = _norm_rows(np.asarray(queries, dtype=np.float64))
        probe = np.argsort(-np.round(qm @ self.centroids.T, 9),
                           axis=1, kind="stable")[:, :nprobe]
        import glob

        files = []
        for c in np.unique(probe):
            d = os.path.join(self.base_dir, "lists", f"list_id={c}")
            files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        probed = rd.read_parquet(files)  # partition pruning at the read
        return knn_bruteforce(
            probed, queries, query_ids, k, self.emb_col, self.id_col,
            exclude_ids=exclude_ids,
        )


def knn_ivf(ds, queries: np.ndarray, query_ids, k: int = 10, nprobe: int = 4,
            num_centroids: int = 16, emb_col="embedding", id_col="vec_id",
            centroids: Optional[np.ndarray] = None, exclude_ids: bool = True):
    """Approximate cosine top-k: probe the ``nprobe`` nearest inverted lists.

    The filter keeps only vectors whose list is probed by ≥1 query, then the
    exact kernel runs on the reduced set — at scale the assignment is
    precomputed/partitioned and the probe prunes whole partitions.
    """
    if centroids is None:
        centroids = train_ivf_centroids(ds, num_centroids, emb_col, id_col=id_col)
    qm = _norm_rows(np.asarray(queries, dtype=np.float64))
    # stable sort on ROUNDED sims: centroid-similarity ties resolve to the
    # lowest list id (deterministic, matching the SQL oracle's ROW_NUMBER
    # tie-break) and one-ulp dot-product noise can't reorder the probes
    probe = np.argsort(-np.round(qm @ centroids.T, 9),
                       axis=1, kind="stable")[:, :nprobe]
    probed_lists = np.unique(probe)
    assigned = ivf_assign(ds, centroids, emb_col, id_col)
    probed = assigned.map_batches(
        lambda df: df[df["list_id"].isin(probed_lists)].drop(columns=["list_id"]),
        batch_format="pandas",
    )
    return knn_bruteforce(probed, queries, query_ids, k, emb_col, id_col,
                          exclude_ids=exclude_ids)
