"""Windowed aggregates over an event table (streaming-shaped workload).

Ray Data is a batch engine (the reference has no streaming either —
SURVEY.md §2.10); windows are computed as groupby over (key, window_start)
with the window id derived in a vectorized map stage.  Ordering within a
window is irrelevant for the commutative aggregates exposed here; session
windows sort per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling_window(ds, ts_col="ts", key_col="user_id", value_col="value",
                    width_sec: int = 300):
    """(key, window_start, n_events, sum_value) per tumbling window."""
    from raygraph.agg import hash_aggregate

    width = np.int64(width_sec * 1_000_000)  # microseconds

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype(np.int64)
        return pd.DataFrame(
            {
                key_col: df[key_col].to_numpy(),
                "window_start": (us // width) * width,
                value_col: df[value_col].to_numpy(),
            }
        )

    w = ds.map_batches(assign, batch_format="pandas")
    return hash_aggregate(
        w,
        [key_col, "window_start"],
        {"n_events": (None, "count"), "sum_value": (value_col, "sum")},
    )


def session_windows(ds, ts_col="ts", key_col="user_id", gap_sec: int = 1800):
    """Per-key session windows: events closer than ``gap_sec`` chain together.

    Bucketed per-key grouping (hash of key → bucket, pandas groupby inside)
    with a per-group sort — the documented partitioning assumption is that
    one key's events fit in a task.
    """
    from raygraph.agg import bucketed_map_groups

    gap = np.int64(gap_sec * 1_000_000)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        us = g[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        new = np.ones(len(us), dtype=bool)
        new[1:] = (us[1:] - us[:-1]) > gap
        sid = np.cumsum(new) - 1
        out = []
        for s in np.unique(sid):
            m = sid == s
            out.append(
                {
                    key_col: g[key_col].iloc[0],
                    "session_start": us[m].min(),
                    "session_end": us[m].max(),
                    "n_events": int(m.sum()),
                }
            )
        return pd.DataFrame(out)

    return bucketed_map_groups(ds, [key_col], sessions)
