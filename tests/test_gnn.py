"""GNN graph/feature store facade (gnn/graph_store.py:39-140 parity)."""

import numpy as np
import pandas as pd
import pytest

from raygraph.gnn import GraphStore

from tests import fixtures


def _store():
    st = GraphStore()
    edges = fixtures.karate_df()[["src", "dst"]].copy()
    edges["eweight"] = np.arange(len(edges), dtype=np.float64)
    st.add_edge_data(edges, ("src", "dst"), feat_name="eweight")
    nodes = pd.DataFrame(
        {
            "nid": np.arange(34, dtype=np.int64),
            "f0": np.arange(34, dtype=np.float64) * 2.0,
            "f1": np.arange(34, dtype=np.float64) + 0.5,
        }
    )
    st.add_node_data(nodes, "nid", feat_name="feat")
    return st


def test_graph_store_shapes_and_storages():
    st = _store()
    assert st.ntypes == ["_N"] and st.etypes == ["_E"]
    assert st.num_nodes() == 34
    assert st.num_edges() == len(fixtures.karate_df())
    assert st.num_nodes_dict == {"_N": 34}
    assert not st.has_multiple_etypes

    nstore = st.get_node_storage("feat")
    got = nstore.fetch(np.array([3, 0, 10]))
    np.testing.assert_allclose(got, [[6.0, 3.5], [0.0, 0.5], [20.0, 10.5]])
    estore = st.get_edge_storage("eweight")
    got = estore.fetch(np.array([5, 1]))
    np.testing.assert_allclose(got, [[5.0], [1.0]])
    with pytest.raises(ValueError):
        st.get_node_storage("nope")
    with pytest.raises(KeyError):
        nstore.fetch(np.array([999]))


def test_graph_store_sample_neighbors():
    st = _store()
    edges = fixtures.karate_df()

    # out-direction, all neighbors: exactly vertex 0's out-edges
    s, d, eid = st.sample_neighbors(np.array([0]), fanout=-1, edge_dir="out")
    want = edges[edges["src"] == 0]
    assert sorted(d) == sorted(want["dst"])
    assert (s == 0).all()
    # eids point back to the right rows
    estore = st.get_edge_storage("eweight")
    np.testing.assert_allclose(estore.fetch(eid)[:, 0], eid.astype(float))

    # in-direction: edges whose dst is the seed, returned in stored
    # direction (src → dst)
    s, d, eid = st.sample_neighbors(np.array([33]), fanout=-1, edge_dir="in")
    want = edges[edges["dst"] == 33]
    assert sorted(s) == sorted(want["src"])
    assert (d == 33).all()

    # fanout bounds per-seed edges and is deterministic
    s1, d1, e1 = st.sample_neighbors(np.array([0, 33]), fanout=2,
                                     edge_dir="out")
    assert (pd.Series(s1).value_counts() <= 2).all()
    s2, d2, e2 = st.sample_neighbors(np.array([0, 33]), fanout=2,
                                     edge_dir="out")
    assert np.array_equal(np.sort(e1), np.sort(e2))

    with pytest.raises(NotImplementedError):
        st.sample_neighbors(np.array([0]), fanout=2, replace=True)
    with pytest.raises(ValueError):
        st.sample_neighbors(np.array([0]), edge_dir="sideways")


def test_graph_store_heterogeneous():
    st = GraphStore()
    e1 = pd.DataFrame({"s": [0, 0, 1], "d": [1, 2, 2],
                       "w": [1.0, 2.0, 3.0]})
    e2 = pd.DataFrame({"s": [2, 2], "d": [0, 1], "w": [9.0, 8.0]})
    st.add_edge_data(e1, ("s", "d"), feat_name="w", etype="follows")
    st.add_edge_data(e2, ("s", "d"), feat_name="w", etype="likes")
    st.add_node_data(
        pd.DataFrame({"nid": [0, 1, 2], "x": [1.0, 2.0, 3.0]}),
        "nid", feat_name="x", ntype="user",
    )
    assert st.etypes == ["follows", "likes"]
    assert st.has_multiple_etypes
    assert st.num_edges_dict == {"follows": 3, "likes": 2}
    # eids are globally sequential across add_edge_data calls
    ew = st.get_edge_storage("w", etype="likes")
    np.testing.assert_allclose(ew.fetch(np.array([3, 4]))[:, 0], [9.0, 8.0])
    # heterogeneous sampling returns a dict per etype
    out = st.sample_neighbors(np.array([2]), fanout=-1, edge_dir="out")
    assert set(out) == {"follows", "likes"}
    s, d, eid = out["likes"]
    assert sorted(d) == [0, 1] and (s == 2).all()
    assert len(out["follows"][0]) == 0
    # type must be named when ambiguous
    with pytest.raises(ValueError):
        st.get_edge_storage("w")
