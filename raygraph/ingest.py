"""Ingest stage: read the corpus, fingerprint content, project metadata.

M0 of the build plan (SURVEY.md §7.1): ``read_parquet`` → ``map_batches``
(zero-copy Arrow) computing ``content_sha256`` → project.  The driver-checked
per-row invariant is sha256(content) equality vs the reference input
(BASELINE.json ``input_hint``), so the sha256 column is computed here, in the
first stage that touches ``content``, and ``content`` is dropped immediately
after (SURVEY.md §7.3.6 — wide string columns must not flow further than
needed).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def sha256_batch(batch: pa.Table, keep_content: bool = False) -> pa.Table:
    """Append ``content_sha256`` (hex); drop ``content`` unless asked to keep.

    Hashing is inherently per-row C work (hashlib releases the GIL per call);
    the stage is parallelized across blocks by Ray Data.
    """
    col = batch.column("content").to_pylist()
    shas = [hashlib.sha256(s.encode("utf-8")).hexdigest() for s in col]
    out = batch.append_column("content_sha256", pa.array(shas, pa.string()))
    if not keep_content:
        out = out.drop_columns(["content"])
    return out


def ingest(corpus_ds, keep_content: bool = False):
    """corpus Dataset → Dataset with ``content_sha256``, content dropped.

    Row count and per-row sha256 are invariants the driver verifies.
    """
    return corpus_ds.map_batches(
        lambda b: sha256_batch(b, keep_content=keep_content),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_corpus(path: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(path, columns=columns)
