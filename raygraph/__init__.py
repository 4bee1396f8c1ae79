"""raygraph — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the core capabilities of the reference
(RAPIDS cuGraph fork, surveyed in SURVEY.md): graph construction
(normalize / symmetrize / renumber / partition / CSR blocks), PageRank,
weakly connected components, label propagation, triangle counting, plus
the data-pipeline operators a 100 TB training-data pipeline needs
(dedup, text analysis, similarity search, windowed aggregates).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, ``groupby`` aggregates for the
wide steps, and stateful actor workers only for the iterative superstep
engine (per-partition CSR blocks + vertex state held across iterations).

No code is copied from the reference; citations in docstrings are
``file:line`` pointers into ``/root/reference`` for semantic parity only.
"""

from raygraph.graph import Graph  # noqa: F401

__version__ = "0.1.0"
