"""Semi-structured (JSON string column) extraction.

A standard training-data-pipeline stage: event/metadata tables carry a
JSON payload column; downstream transforms need one field of it as a
typed column without materializing a parsed object per row.

Vectorization strategy: scalar fields of FLAT JSON objects are pulled
with one compiled regex via pandas ``.str.extract`` (C-level over the
whole batch); rows the regex misses (nested/escaped payloads) fall back
to ``json.loads`` individually — correctness is full-JSON, the regex is
only a fast path, and on flat payloads the fallback never fires.
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd


def _field_patterns(field: str):
    f = re.escape(field)
    num = re.compile(
        rf'"{f}"\s*:\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)'
    )
    # simple strings only (no backslash escapes) — escaped strings take
    # the json.loads fallback
    s = re.compile(rf'"{f}"\s*:\s*"([^"\\]*)"')
    return num, s


def extract_json_field(ds, field: str, col: str = "props",
                       out: str | None = None, as_type: str = "int64"):
    """Add column ``out`` (default: ``field``) = JSON field ``field`` of
    the string column ``col``.

    ``as_type``: ``int64`` / ``float64`` (nullable; absent fields → NaN /
    pandas NA) or ``string``.  Full-JSON semantics: the compiled-regex
    fast path only short-circuits rows it can prove (flat object, scalar
    value, unescaped string); anything else is parsed with ``json.loads``.
    """
    out = out or field
    num_re, str_re = _field_patterns(field)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        raw = df[col].astype(str)
        if as_type == "string":
            vals = raw.str.extract(str_re, expand=False)
        else:
            vals = raw.str.extract(num_re, expand=False)
        # the regex is only trustworthy on PROVABLY flat payloads: a
        # nested object/array could carry the same field name, and
        # backslash escapes defeat the simple-string pattern — anything
        # with a second brace, a bracket, or an escape goes to json.loads
        flat = (raw.str.count(r"\{") <= 1) & ~raw.str.contains(
            r"[\[\\]", regex=True
        )
        vals = vals.where(flat)
        # fallback: rows where the fast path missed but the payload is
        # valid JSON (nested objects, escaped strings, null, bools)
        miss = vals.isna()
        if miss.any():
            fixed = {}
            for i in np.flatnonzero(miss.to_numpy()):
                try:
                    v = json.loads(raw.iloc[i]).get(field)
                except (ValueError, AttributeError):
                    v = None
                if v is not None and not isinstance(v, (dict, list)):
                    fixed[i] = v
            if fixed:
                vals = vals.copy()
                for i, v in fixed.items():
                    vals.iloc[i] = v
        if as_type == "int64":
            num = pd.to_numeric(vals, errors="coerce")
            # non-integral payloads truncate toward zero (C-cast rule)
            df[out] = np.trunc(num.astype(np.float64)).astype("Int64")
        elif as_type == "float64":
            df[out] = pd.to_numeric(vals, errors="coerce").astype(np.float64)
        else:
            df[out] = vals
        return df

    return ds.map_batches(fn, batch_format="pandas")
