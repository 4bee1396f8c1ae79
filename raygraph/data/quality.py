"""Repetition-based document quality signals (Gopher/C4-style filters).

The standard pretraining-corpus heuristics that complement
``raygraph.data.text.quality_scores``: repeated-line fraction and
most-common-bigram dominance.  Pure map stage — one pass, no shuffle —
and every signal is an exact rational of in-document counts, so the
whole table is reproducible in SQL (the driver oracle checks it
hash-exact after the shared ROUND(…, 6)).

Rules follow Rae et al. 2021 (Gopher), §A1.1: documents dominated by
duplicate lines or by a single repeated n-gram are low quality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raygraph.data.text import _WORD


def repetition_scores(ds, text_col="text", id_col="doc_id"):
    """(id, n_lines, dup_line_frac, top_bigram_frac):

    * ``dup_line_frac`` — 1 − distinct_lines / total_lines (0 for a
      single-line document; newline-split, no trimming).
    * ``top_bigram_frac`` — occurrences of the most frequent word bigram
      ÷ total bigrams (0 when the document has fewer than 2 tokens);
      tokens are lowercase ``\\w+``, the same tokenizer every text op
      and oracle uses.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        n_lines = np.zeros(len(df), np.int64)
        dup_frac = np.zeros(len(df), np.float64)
        bigram_frac = np.zeros(len(df), np.float64)
        for i, t in enumerate(df[text_col].astype(str)):
            lines = t.split("\n")
            n_lines[i] = len(lines)
            dup_frac[i] = 1.0 - len(set(lines)) / len(lines)
            ws = _WORD.findall(t.lower())
            if len(ws) >= 2:
                grams = [ws[j] + " " + ws[j + 1] for j in range(len(ws) - 1)]
                _, counts = np.unique(grams, return_counts=True)
                bigram_frac[i] = counts.max() / len(grams)
        return pd.DataFrame(
            {
                id_col: ids,
                "n_lines": n_lines,
                "dup_line_frac": np.round(dup_frac, 6),
                "top_bigram_frac": np.round(bigram_frac, 6),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")
