"""PropertyGraph: typed vertex/edge property tables + subgraph extraction.

Reference: ``python/cugraph/cugraph/structure/property_graph.py:56-1383`` —
``add_vertex_data`` (:328) / ``add_edge_data`` (:525) accumulate typed
property tables; ``select_vertices``/``select_edges`` (:780) evaluate a
selection expression against them; ``extract_subgraph`` (:871) projects the
selected edges to a plain Graph.

Ray mapping: one Dataset per (kind, type_name); selections are vectorized
``map_batches`` filters over pandas batches (the reference eval()s python
expressions against property DataFrames — same contract, batch-wise);
extraction concatenates the selected edge Datasets, normalizes to
``(src, dst, weight)`` and hands off to ``Graph.from_edges``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import numpy as np
import pandas as pd

Selector = Union[str, Callable[[pd.DataFrame], "pd.Series"]]


def _filter_ds(ds, selector: Optional[Selector]):
    if selector is None:
        return ds
    if callable(selector):
        return ds.map_batches(
            lambda df: df[np.asarray(selector(df), dtype=bool)],
            batch_format="pandas",
        )
    expr = selector
    return ds.map_batches(
        lambda df: df[df.eval(expr).astype(bool)], batch_format="pandas"
    )


class PropertyGraph:
    """Typed property tables over Datasets; no data leaves the cluster."""

    def __init__(self):
        self._vertex: Dict[str, dict] = {}
        self._edge: Dict[str, dict] = {}

    # -- ingest -----------------------------------------------------------
    def add_vertex_data(self, ds, vertex_col: str, type_name: str):
        """``property_graph.py:328`` — one Dataset of vertex rows per type."""
        self._vertex[type_name] = {"ds": ds, "vertex_col": vertex_col}
        return self

    def add_edge_data(self, ds, src_col: str, dst_col: str, type_name: str,
                      weight_col: Optional[str] = None):
        """``property_graph.py:525`` — one Dataset of edge rows per type."""
        self._edge[type_name] = {
            "ds": ds, "src_col": src_col, "dst_col": dst_col,
            "weight_col": weight_col,
        }
        return self

    @property
    def vertex_types(self):
        return sorted(self._vertex)

    @property
    def edge_types(self):
        return sorted(self._edge)

    # -- selection --------------------------------------------------------
    def select_vertices(self, selector: Optional[Selector] = None,
                        type_name: Optional[str] = None):
        """Filtered vertex rows (one type, or all types concatenated when
        schemas allow) — ``property_graph.py:780``."""
        names = [type_name] if type_name else self.vertex_types
        out = None
        for n in names:
            d = _filter_ds(self._vertex[n]["ds"], selector)
            out = d if out is None else out.union(d)
        return out

    def select_edges(self, selector: Optional[Selector] = None,
                     type_name: Optional[str] = None):
        names = [type_name] if type_name else self.edge_types
        out = None
        for n in names:
            d = _filter_ds(self._edge[n]["ds"], selector)
            out = d if out is None else out.union(d)
        return out

    # -- extraction -------------------------------------------------------
    def extract_subgraph(self, edge_selector: Optional[Selector] = None,
                         edge_types: Optional[list] = None,
                         directed: bool = True,
                         renumber: bool = True,
                         num_partitions: int = 8,
                         out_dir: Optional[str] = None,
                         **graph_kwargs):
        """Project selected edges to a plain Graph —
        ``property_graph.py:871`` extract_subgraph."""
        from raygraph.graph import Graph

        names = edge_types or self.edge_types
        parts = []
        for n in names:
            meta = self._edge[n]
            d = _filter_ds(meta["ds"], edge_selector)

            def project(df: pd.DataFrame, meta=meta) -> pd.DataFrame:
                w = (
                    df[meta["weight_col"]].to_numpy(np.float64)
                    if meta["weight_col"]
                    else np.ones(len(df))
                )
                return pd.DataFrame(
                    {
                        "src_key": df[meta["src_col"]].astype(str),
                        "dst_key": df[meta["dst_col"]].astype(str),
                        "weight": w,
                    }
                )

            parts.append(d.map_batches(project, batch_format="pandas"))
        edges = parts[0]
        for p in parts[1:]:
            edges = edges.union(p)
        return Graph.from_edges(
            edges, src="src_key", dst="dst_key", weight="weight",
            directed=directed, renumber=renumber,
            num_partitions=num_partitions, out_dir=out_dir, **graph_kwargs,
        )
