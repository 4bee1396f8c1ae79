"""Hypergraph transform: build a graph FROM a generic table.

Reference: ``structure/hypergraph.py:42-177`` — one node per row-entity and
one node per unique column value; ``direct=False`` emits bipartite
row↔value edges (``_create_hyper_edges``, :358), ``direct=True`` connects
the value nodes of the same row pairwise (``_create_direct_edges``, :420).
Node keys are category-qualified with the ``::`` delimiter
(``hypergraph.py:53,510-527`` _prepend_str).

This is the generalized "edges by grouping rows on shared keys" operator
that derive.py instantiates for the source-code corpus.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Sequence

import numpy as np
import pandas as pd


def hypergraph_edges(
    ds,
    value_cols: Sequence[str],
    row_key_col: Optional[str] = None,
    direct: bool = False,
    delim: str = "::",
):
    """Table Dataset → string-keyed edge Dataset (src_key, dst_key, weight).

    ``direct=False``: row node ``row::<row_key>`` → value node ``<col>::<val>``
    for every value column (requires ``row_key_col``).
    ``direct=True``: value nodes of each row connected pairwise
    (col_i::v_i → col_j::v_j for i<j in ``value_cols`` order); no row nodes.
    """
    if not direct and row_key_col is None:
        raise ValueError("row_key_col is required when direct=False")
    cols = list(value_cols)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        srcs: list[pd.Series] = []
        dsts: list[pd.Series] = []
        if direct:
            for a, b in combinations(cols, 2):
                srcs.append(a + delim + df[a].astype(str))
                dsts.append(b + delim + df[b].astype(str))
        else:
            row = "row" + delim + df[row_key_col].astype(str)
            for c in cols:
                srcs.append(row)
                dsts.append(c + delim + df[c].astype(str))
        src = pd.concat(srcs, ignore_index=True)
        dst = pd.concat(dsts, ignore_index=True)
        return pd.DataFrame(
            {"src_key": src, "dst_key": dst, "weight": np.ones(len(src))}
        )

    return ds.map_batches(fn, batch_format="pandas")
