"""GNN graph/feature store: the DGL-shaped facade over PropertyGraph.

Reference: ``python/cugraph/cugraph/gnn/graph_store.py:39-140``
(``CuGraphStore`` / ``CuFeatureStorage``) — a wrapper around a property
graph adding the DGL GraphStorage duck-type: ``add_node_data`` /
``add_edge_data`` register typed feature tables, ``get_node_storage`` /
``get_edge_storage`` return fetch-by-id feature storages, ``num_nodes``
/ ``num_edges`` / ``ntypes`` / ``etypes`` describe the graph, and
``sample_neighbors`` runs uniform neighbor sampling for mini-batch
training.

Torch-free Ray mapping: feature tables are Datasets (or pandas frames,
wrapped); ``FeatureStorage.fetch`` returns **numpy** arrays (the
reference returns dlpack capsules for torch/tf — numpy is the
container-honest equivalent and zero-copies into torch when present).
Feature gathers broadcast the id→row mapping once per storage via
``ray.put`` when the table fits ``broadcast_limit``; bigger tables fall
back to a bucketed semi-join + driver gather of just the requested rows.
Sampling runs :func:`raygraph.algos.sampling.uniform_neighbor_sample`
over a Graph extracted (and cached) per direction, mirroring
``extracted_subgraph`` / ``extracted_reverse_subgraph``.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def _to_dataset(obj):
    import ray.data as rd

    if isinstance(obj, pd.DataFrame):
        return rd.from_pandas(obj)
    return obj


class FeatureStorage:
    """Fetch-by-id feature storage (``CuFeatureStorage`` analogue,
    ``gnn/graph_store.py:402-462``) — DGL duck-types this: only
    ``fetch(indices)`` is required."""

    def __init__(self, ds, id_col: str, columns: List[str],
                 broadcast_limit: int = 20_000_000):
        self._ds = ds
        self._id_col = id_col
        self.columns = list(columns)
        self._limit = broadcast_limit
        self._cache = None  # (pd.Index over ids, feature ndarray)

    def _load(self):
        if self._cache is None:
            n = self._ds.count()
            if n > self._limit:
                return None
            df = self._ds.to_pandas()
            mat = df[self.columns].to_numpy()
            self._cache = (pd.Index(df[self._id_col].to_numpy()), mat)
        return self._cache

    def fetch(self, indices, device=None, pin_memory=False, **kwargs):
        """Features of the given node/edge ids → numpy array of shape
        (len(indices), len(columns)).  Raises KeyError on unknown ids."""
        idx = np.asarray(indices)
        loaded = self._load()
        if loaded is not None:
            index, mat = loaded
            pos = index.get_indexer(idx)
            if (pos < 0).any():
                raise KeyError(
                    f"ids not in feature table: {idx[pos < 0][:5]!r}"
                )
            return mat[pos]
        # large table: filter distributed, gather only the requested rows
        import ray

        ref = ray.put(np.unique(idx))

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            want = ray.get(ref)
            return df[np.isin(df[self._id_col].to_numpy(), want)]

        sub = self._ds.map_batches(filt, batch_format="pandas").to_pandas()
        index = pd.Index(sub[self._id_col].to_numpy())
        pos = index.get_indexer(idx)
        if (pos < 0).any():
            raise KeyError(f"ids not in feature table: {idx[pos < 0][:5]!r}")
        return sub[self.columns].to_numpy()[pos]


class GraphStore:
    """DGL-shaped store over :class:`raygraph.property_graph.PropertyGraph`
    (``CuGraphStore``, ``gnn/graph_store.py:39-140``)."""

    def __init__(self, pg=None, num_partitions: int = 8):
        from raygraph.property_graph import PropertyGraph

        self.gdata = pg if pg is not None else PropertyGraph()
        self.ndata_feat_col_d: Dict[str, List[str]] = defaultdict(list)
        self.edata_feat_col_d: Dict[str, List[str]] = defaultdict(list)
        self._node_tables: Dict[str, dict] = {}
        self._edge_tables: Dict[str, dict] = {}
        self._eid_base = 0
        self._num_partitions = num_partitions
        self._subgraph_cache: Dict[str, object] = {}

    # -- ingest (graph_store.py:54-68) ---------------------------------
    def add_node_data(self, df, node_col_name: str, feat_name: str,
                      ntype: Optional[str] = None):
        ntype = ntype or "_N"
        ds = _to_dataset(df)
        self.gdata.add_vertex_data(ds, vertex_col=node_col_name,
                                   type_name=ntype)
        cols = [c for c in _columns(df) if c != node_col_name]
        self.ndata_feat_col_d[feat_name] = cols
        self._node_tables[ntype] = {"ds": ds, "id_col": node_col_name}
        return self

    def add_edge_data(self, df, vertex_col_names, feat_name: str,
                      etype: Optional[str] = None,
                      eid_col: Optional[str] = None):
        """``vertex_col_names``: (src_col, dst_col).  Edge ids: pandas
        input is assigned sequential ids automatically (the reference's
        implicit row ids); Dataset input must bring its own ``eid_col``
        (sequential assignment over a distributed table would need a
        global order)."""
        etype = etype or "_E"
        src_col, dst_col = vertex_col_names
        if eid_col is None:
            if not isinstance(df, pd.DataFrame):
                raise ValueError(
                    "Dataset edge tables need an explicit eid_col; pandas "
                    "frames get sequential ids automatically"
                )
            df = df.copy()
            df["__eid"] = np.arange(len(df), dtype=np.int64) + self._eid_base
            self._eid_base += len(df)
            eid_col = "__eid"
        ds = _to_dataset(df)
        self.gdata.add_edge_data(ds, src_col=src_col, dst_col=dst_col,
                                 type_name=etype)
        cols = [
            c for c in _columns(df)
            if c not in (src_col, dst_col, eid_col)
        ]
        self.edata_feat_col_d[feat_name] = cols
        self._edge_tables[etype] = {
            "ds": ds, "src_col": src_col, "dst_col": dst_col,
            "eid_col": eid_col,
        }
        self._subgraph_cache.clear()
        return self

    # -- feature storages (graph_store.py:70-122) ----------------------
    def _single_type(self, types, given, kind):
        if given is not None:
            return given
        if len(types) > 1:
            raise ValueError(
                f"{kind} type name must be specified if there are more "
                f"than one {kind} types."
            )
        return types[0]

    def get_node_storage(self, feat_name: str,
                         ntype: Optional[str] = None) -> FeatureStorage:
        ntype = self._single_type(self.ntypes, ntype, "node")
        if feat_name not in self.ndata_feat_col_d:
            raise ValueError(
                f"feat_name {feat_name} not found in GraphStore node "
                f"features {list(self.ndata_feat_col_d)}"
            )
        t = self._node_tables[ntype]
        return FeatureStorage(t["ds"], t["id_col"],
                              self.ndata_feat_col_d[feat_name])

    def get_edge_storage(self, feat_name: str,
                         etype: Optional[str] = None) -> FeatureStorage:
        etype = self._single_type(self.etypes, etype, "edge")
        if feat_name not in self.edata_feat_col_d:
            raise ValueError(
                f"feat_name {feat_name} not found in GraphStore edge "
                f"features {list(self.edata_feat_col_d)}"
            )
        t = self._edge_tables[etype]
        return FeatureStorage(t["ds"], t["eid_col"],
                              self.edata_feat_col_d[feat_name])

    # -- shape (graph_store.py:124-145) --------------------------------
    def num_nodes(self, ntype: Optional[str] = None) -> int:
        from raygraph.agg import distinct

        types = [ntype] if ntype else self.ntypes
        total = 0
        for n in types:
            t = self._node_tables[n]
            total += distinct(
                t["ds"].map_batches(
                    lambda df, c=t["id_col"]: df[[c]], batch_format="pandas"
                ),
                [t["id_col"]],
            ).count()
        return total

    def num_edges(self, etype: Optional[str] = None) -> int:
        types = [etype] if etype else self.etypes
        return sum(self._edge_tables[t]["ds"].count() for t in types)

    @property
    def ntypes(self):
        return sorted(self._node_tables)

    @property
    def etypes(self):
        return sorted(self._edge_tables)

    @property
    def has_multiple_etypes(self):
        return len(self.etypes) > 1

    @property
    def num_nodes_dict(self):
        return {n: self.num_nodes(n) for n in self.ntypes}

    @property
    def num_edges_dict(self):
        return {e: self.num_edges(e) for e in self.etypes}

    # -- sampling (graph_store.py:155-258) ------------------------------
    def _edges_frame(self, etype, reverse: bool):
        t = self._edge_tables[etype]

        def project(df: pd.DataFrame, t=t, rev=reverse) -> pd.DataFrame:
            s = df[t["src_col"]].to_numpy(np.int64)
            d = df[t["dst_col"]].to_numpy(np.int64)
            if rev:
                s, d = d, s
            return pd.DataFrame(
                {"src": s, "dst": d,
                 "eid": df[t["eid_col"]].to_numpy(np.int64),
                 "weight": np.ones(len(df))}
            )

        return t["ds"].map_batches(project, batch_format="pandas")

    def _subgraph(self, etype, reverse: bool):
        """Cached per-(etype, direction) Graph — the reference's
        ``extracted_subgraph`` / ``extracted_reverse_subgraph``."""
        key = f"{etype}:{'rev' if reverse else 'fwd'}"
        g = self._subgraph_cache.get(key)
        if g is None:
            from raygraph.graph import Graph

            g = Graph.from_edges(
                self._edges_frame(etype, reverse),
                src="src", dst="dst", weight="weight",
                directed=True, renumber=False,
                num_partitions=self._num_partitions,
            )
            self._subgraph_cache[key] = g
        return g

    def sample_neighbors(self, nodes, fanout: int = -1,
                         edge_dir: str = "in", prob=None,
                         replace: bool = False, seed: int = 42):
        """Uniform neighbor sampling for the given seed nodes.

        Returns ``(src, dst, eid)`` int64 numpy arrays of the sampled
        bipartite edges per etype — a dict keyed by etype when the store
        is heterogeneous, a single tuple otherwise.  ``fanout=-1`` keeps
        every neighboring edge.  ``prob``/``replace=True`` are honestly
        unimplemented (the underlying sampler is uniform without
        replacement, like the reference's default path).
        """
        if edge_dir not in ("in", "out"):
            raise ValueError(
                f"edge_dir must be either 'in' or 'out' got {edge_dir}"
            )
        if prob is not None or replace:
            raise NotImplementedError(
                "prob-weighted / with-replacement sampling not supported"
            )
        if isinstance(nodes, dict):
            nodes = np.concatenate(
                [np.asarray(v, dtype=np.int64) for v in nodes.values()]
            )
        nodes = np.asarray(nodes, dtype=np.int64)
        fan = int(fanout) if fanout != -1 else 2**31 - 1
        out = {}
        for etype in self.etypes:
            out[etype] = self._sample_one(etype, nodes, fan, edge_dir, seed)
        if not self.has_multiple_etypes:
            return out[self.etypes[0]]
        return out

    def _sample_one(self, etype, nodes, fan, edge_dir, seed):
        from raygraph import joins
        from raygraph.algos.sampling import uniform_neighbor_sample

        reverse = edge_dir == "in"
        g = self._subgraph(etype, reverse)
        sampled = uniform_neighbor_sample(g, nodes, [fan], seed=seed)
        sampled = sampled.materialize()
        if sampled.count() == 0:
            z = np.empty(0, np.int64)
            return z, z.copy(), z.copy()
        # recover eids: join the sampled (src, dst) pairs back onto the
        # typed edge table (direction-corrected)
        ef = self._edges_frame(etype, reverse)
        hit = joins.hash_join(
            sampled.map_batches(
                lambda df: df[["src", "dst"]], batch_format="pandas"
            ),
            ef.map_batches(
                lambda df: df[["src", "dst", "eid"]], batch_format="pandas"
            ),
            on=["src", "dst"],
        ).to_pandas()
        s = hit["src"].to_numpy(np.int64)
        d = hit["dst"].to_numpy(np.int64)
        if reverse:
            # we sampled on the reversed graph; swap back so src→dst is
            # the stored direction (graph_store.py:233-241)
            s, d = d, s
        return s, d, hit["eid"].to_numpy(np.int64)


def _columns(obj) -> List[str]:
    if isinstance(obj, pd.DataFrame):
        return list(obj.columns)
    return list(obj.columns())
