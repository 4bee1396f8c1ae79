"""Sequence packing: global token offsets via a distributed prefix scan.

The pretraining data-prep step after tokenization: documents are
concatenated in a fixed order and the token stream is cut into
fixed-length training sequences, so each document needs its *global
start offset* — an ordered prefix sum over the whole corpus.  Prefix
sums are the textbook case the Dataset API has no primitive for; the
scan here is the classic three-phase distributed formulation:

1. tag every row with a RANGE bucket of the order key (``order //
   step`` — order-preserving, no sampling pass; the order key is a
   non-negative int id by contract),
2. one tiny aggregate (bucket → count sum, B rows) feeds the driver an
   exclusive scan over the ordered buckets → per-bucket base offsets
   (broadcast via the closure; B ints),
3. one bucketed ``groupby.map_groups`` computes each bucket's local
   cumsum on top of its base.

Two passes over two int columns + an O(B) driver scan — no global
sort, no driver materialization of the data.  The per-bucket work is a
vectorized cumsum; ``num_buckets`` is the knob that bounds a bucket's
rows to a task heap.

Output per row: ``start_offset`` (exclusive prefix sum), ``first_seq``
/ ``last_seq`` (the fixed-length sequence indices the document's tokens
land in).  Deterministic and placement-independent: the result is a
pure function of (order key, count).

Reference analogue: cuGraph has no corpus ops; offsets-from-counts is
the same exclusive-scan shape its CSR builders use per partition
(cpp/src/structure/graph_impl.cuh), here distributed over range
buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sequence_offsets(
    ds,
    count_col: str,
    order_col: str,
    seq_len: int,
    order_max: int | None = None,
    num_buckets: int = 64,
):
    """(order_col, count_col, start_offset, first_seq, last_seq) — the
    exclusive prefix sum of ``count_col`` in ``order_col`` order, plus
    the [first, last] sequence indices under packing into ``seq_len``-
    token sequences.

    ``order_col`` must be a unique non-negative integer key.  Pass
    ``order_max`` when known to skip the max() pass.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if order_max is None:
        order_max = ds.max(order_col)
    step = max(1, (int(order_max) + num_buckets) // num_buckets)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[order_col, count_col]].copy()
        df["__rb"] = (df[order_col].to_numpy() // step).astype(np.int32)
        return df

    tagged = ds.map_batches(tag, batch_format="pandas")

    # phase 1-2: per-bucket token totals -> driver exclusive scan (B rows)
    totals = tagged.groupby("__rb").sum(count_col).to_pandas()
    totals = totals.sort_values("__rb")
    sums = totals[f"sum({count_col})"].to_numpy(np.int64)
    bases = dict(
        zip(
            totals["__rb"].to_numpy(),
            np.concatenate(([0], np.cumsum(sums)[:-1])),
        )
    )

    # phase 3: per-bucket local scan on its base
    def scan(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(order_col)
        counts = group[count_col].to_numpy(np.int64)
        start = bases[int(group["__rb"].iloc[0])] + np.concatenate(
            ([0], np.cumsum(counts)[:-1])
        )
        last_tok = start + np.maximum(counts - 1, 0)
        return pd.DataFrame(
            {
                order_col: group[order_col].to_numpy(),
                count_col: counts,
                "start_offset": start,
                "first_seq": start // seq_len,
                "last_seq": last_tok // seq_len,
            }
        )

    return tagged.groupby("__rb").map_groups(scan, batch_format="pandas")
