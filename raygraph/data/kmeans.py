"""Distributed Lloyd's k-means over an embedding column.

A first-class clustering operator for training-data pipelines (corpus
bucketing, IVF coarse quantizers, near-dup blocking).  Scale shape: the
only state is the k×d centroid matrix — broadcast via ``ray.put`` each
iteration — and each iteration is ONE streaming pass of ``map_batches``
emitting ≤k per-batch partial (n, Σx) rows, reduced worker-side through
``agg.hash_aggregate`` (sum+sum is combinable) so the driver pulls
exactly k rows per iteration regardless of block count.

Determinism: init is the embeddings of the k smallest ids (no RNG);
assignment ties break to the lowest centroid id (``np.argmin``), so the
fixed-iteration run is exactly reproducible and SQL-checkable (the
driver oracle unrolls the same Lloyd iterations as chained CTEs).

Related: ``knn.train_ivf_centroids`` trains on a driver-side sample for
speed (cosine metric); this operator is the full-data L2 path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _emb_matrix(df: pd.DataFrame, emb_col: str) -> np.ndarray:
    return np.stack(df[emb_col].to_numpy()).astype(np.float64)


def _init_centroids(ds, k: int, emb_col: str, id_col: str) -> np.ndarray:
    """Embeddings of the k smallest ids — per-batch partial top-k, tiny
    driver merge (never materializes the dataset)."""
    part = ds.map_batches(
        lambda df: df.sort_values(id_col).head(k), batch_format="pandas"
    ).to_pandas()
    part = part.sort_values(id_col).head(k)
    return _emb_matrix(part, emb_col)


def kmeans(ds, k: int = 8, emb_col: str = "embedding",
           id_col: str = "vec_id", iters: int = 5):
    """Fixed-iteration Lloyd's k-means (L2).

    Returns ``(assignments, centroids)``: a Dataset (id_col, cluster)
    and the final k×d centroid ndarray.  Empty clusters keep their
    previous centroid (no re-seeding — keeps the run deterministic)."""
    import ray

    C = _init_centroids(ds, k, emb_col, id_col)
    k = len(C)  # fewer rows than k degrades gracefully

    from raygraph.agg import hash_aggregate

    d = C.shape[1]
    scols = [f"s{i}" for i in range(d)]

    for _ in range(iters):
        cref = ray.put(C)

        def partials(df: pd.DataFrame, k=k) -> pd.DataFrame:
            Cm = ray.get(cref)
            X = _emb_matrix(df, emb_col)
            # argmin ||x-c||² = argmin(c·c − 2x·c); np.argmin takes the
            # lowest cid on ties (mirrors the SQL ORDER BY d2, cid)
            d2 = (
                (Cm * Cm).sum(axis=1)[None, :]
                - 2.0 * (X @ Cm.T)
                + (X * X).sum(axis=1)[:, None]
            )
            a = np.argmin(d2, axis=1)
            # vectorized per-centroid sums: one (k,d) scatter-add per batch
            n = np.bincount(a, minlength=k).astype(np.int64)
            S = np.zeros((k, X.shape[1]))
            np.add.at(S, a, X)
            live = n > 0
            out = pd.DataFrame(S[live], columns=scols)
            out.insert(0, "cid", np.arange(k, dtype=np.int64)[live])
            out.insert(1, "n", n[live])
            return out

        # combinable (sum,sum…) partials: the bucketed aggregate reduces
        # blocks×k rows worker-side; the driver pulls exactly k rows/iter
        # (block-count invariant — see test_kmeans block-invariance test)
        part = hash_aggregate(
            ds.map_batches(partials, batch_format="pandas"),
            ["cid"],
            {"n": ("n", "sum"), **{c: (c, "sum") for c in scols}},
            num_buckets=min(16, k),
        ).to_pandas()
        nxt = C.copy()
        if len(part):
            cids = part["cid"].to_numpy(np.int64)
            nxt[cids] = (
                part[scols].to_numpy()
                / part["n"].to_numpy(np.float64)[:, None]
            )
        C = nxt

    cref = ray.put(C)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        Cm = ray.get(cref)
        X = _emb_matrix(df, emb_col)
        d2 = (
            (Cm * Cm).sum(axis=1)[None, :]
            - 2.0 * (X @ Cm.T)
            + (X * X).sum(axis=1)[:, None]
        )
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(np.int64),
             "cluster": np.argmin(d2, axis=1).astype(np.int64)}
        )

    return ds.map_batches(assign, batch_format="pandas"), C
