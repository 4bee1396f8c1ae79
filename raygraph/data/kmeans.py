"""Distributed Lloyd's k-means over an embedding column.

A first-class clustering operator for training-data pipelines (corpus
bucketing, IVF coarse quantizers, near-dup blocking).  Scale shape: the
only state is the k×d centroid matrix — broadcast via ``ray.put`` each
iteration — and each iteration is ONE streaming pass of ``map_batches``
emitting k×(d+1) per-batch partial sums; the driver reduces partials
(k×d doubles, independent of N).  No shuffle anywhere.

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
            rows = []
            for c in range(k):
                m = a == c
                if m.any():
                    rows.append(
                        {"cid": c, "n": int(m.sum()),
                         "s": X[m].sum(axis=0).tolist()}
                    )
            return pd.DataFrame(rows, columns=["cid", "n", "s"])

        part = ds.map_batches(partials, batch_format="pandas").to_pandas()
        nxt = C.copy()
        for c in range(k):
            rows = part[part["cid"] == c]
            if len(rows):
                tot = np.sum(np.stack(rows["s"].to_numpy()), axis=0)
                nxt[c] = tot / rows["n"].sum()
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
