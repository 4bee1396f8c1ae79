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


def hopping_window(ds, ts_col="ts", key_col="user_id", value_col="value",
                   width_sec: int = 300, slide_sec: int = 60):
    """(key, window_start, n_events, sum_value) per hopping (sliding)
    window: windows of ``width_sec`` starting every ``slide_sec`` — each
    event lands in ``ceil(width/slide)`` overlapping windows.

    Vectorized multi-assignment (one repeat per candidate window start in
    a map stage, no per-row loop) followed by the same combiner aggregate
    tumbling uses; output volume is width/slide × the input, which is the
    operator's intrinsic cost at any scale.
    """
    from raygraph.agg import hash_aggregate

    width = np.int64(width_sec * 1_000_000)
    slide = np.int64(slide_sec * 1_000_000)
    k = int((width + slide - 1) // slide)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        us = df[ts_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        last = (us // slide) * slide  # latest window start containing t
        starts = last[:, None] - (np.arange(k, dtype=np.int64) * slide)[None, :]
        valid = starts > (us[:, None] - width)  # w + width > t
        reps = valid.sum(axis=1)
        return pd.DataFrame(
            {
                key_col: np.repeat(df[key_col].to_numpy(), reps),
                "window_start": starts[valid],
                value_col: np.repeat(df[value_col].to_numpy(), reps),
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
        if len(us) == 0:
            # typed empty frame: a columnless one would diverge from the
            # non-empty blocks' schema (Ray RefBundle schema warnings)
            return pd.DataFrame(
                {
                    key_col: g[key_col].iloc[:0],
                    "session_start": pd.Series(dtype=np.int64),
                    "session_end": pd.Series(dtype=np.int64),
                    "n_events": pd.Series(dtype=np.int64),
                }
            )
        # vectorized run detection on the sorted timestamps: a session
        # starts wherever the gap to the previous event exceeds ``gap``
        new = np.ones(len(us), dtype=bool)
        new[1:] = (us[1:] - us[:-1]) > gap
        sid = np.cumsum(new) - 1
        starts_idx = np.flatnonzero(new)
        ends_idx = np.append(starts_idx[1:] - 1, len(us) - 1)
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[:1].to_numpy(),
                                   len(starts_idx)),
                "session_start": us[starts_idx],
                "session_end": us[ends_idx],
                "n_events": np.bincount(sid).astype(np.int64),
            }
        )

    return bucketed_map_groups(ds, [key_col], sessions)
