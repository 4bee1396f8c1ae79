"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Implementations live in :mod:`raygraph.pipelines`; this module is the thin
contract surface.  No ``ray.init``/``ray.shutdown`` here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on sf0.001: PageRank over the part–supplier graph
    derived from lineitem (string-keyed, renumbered, superstep engine)."""
    from raygraph.pipelines import q_pagerank

    return q_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from raygraph.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; iterative /
    sketch-based queries (pagerank, lpa, minhash, simhash, lang_id, ivf_knn,
    corpus pipelines) are intentionally absent → rows-only driver check."""
    from raygraph.pipelines import ORACLES

    return dict(ORACLES)
