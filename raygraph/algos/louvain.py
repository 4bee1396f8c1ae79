"""Louvain community detection — modularity-maximizing hierarchy.

Reference: ``cpp/src/community/louvain_impl.cuh:46-303`` (python API
``community/louvain.py:23``): per level, iterate an assign-to-best-cluster
sweep, then contract the graph by cluster (``coarsen_graph``) and recurse;
returns ``(df[vertex, partition], modularity)``.

Ray mapping (the Louvain prim
``per_v_transform_reduce_dst_key_aggregated_outgoing_e.cuh`` is a two-level
reduction — exactly our combiner + bucketed aggregate):

* per sweep: edges ⋈ broadcast community map → hash_aggregate by
  (src, community(dst)) → per-src vectorized argmax of the modularity gain
  (no per-vertex Python) → synchronous accepted moves.
* Monotonicity guard: a sweep that does not improve global modularity is
  reverted and ends the level (synchronous parallel sweeps can oscillate;
  the reference's sequential-consistency is recovered by this check).
* coarsen: relabel + combine parallel edges summing weights
  (``coarsen_graph_impl.cuh`` semantics via ops.coarsen's pattern).

Scale contract: the driver (and each broadcast) holds only **V-sized**
state — community array, weighted degrees, community totals, the contract
relabel map.  Edge-sized data never leaves the cluster on the distributed
path: weighted degrees come from per-batch compact partials streamed into a
V-sized accumulator, and modularity is a distributed scalar sum (per-batch
internal-weight partials) plus a V-sized driver reduction for the Σ_tot²
term.  Levels with ≤ ``local_edge_limit`` edges (default 5M) drop to a
driver-local numpy fast path — identical math, just fewer Ray rounds; pass
``local_edge_limit=0`` to force the distributed path everywhere.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from raygraph.lineage import cut_stats_lineage


def _edge_arrays(edges_ds):
    df = edges_ds.to_pandas()
    return (
        df["src"].to_numpy(np.int64),
        df["dst"].to_numpy(np.int64),
        df["weight"].to_numpy(np.float64),
    )


def _modularity_local(src, dst, w, comm, k, m2, resolution):
    internal = w[comm[src] == comm[dst]].sum()  # both directions counted
    sig = np.bincount(comm, weights=k, minlength=int(comm.max()) + 1)
    return internal / m2 - resolution * float((sig / m2) @ (sig / m2))


def _distributed_degrees(edges_ds, V: int) -> np.ndarray:
    """Weighted out-degrees as a V-sized array: per-batch compact
    (vertex, k) partials streamed into a driver accumulator — the edge list
    itself never lands on the driver."""
    def partials(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy()
        w = t.column("weight").to_numpy()
        uv, inv = np.unique(s, return_inverse=True)
        return pa.table({"vertex": uv, "k": np.bincount(inv, weights=w)})

    k = np.zeros(V, dtype=np.float64)
    p = edges_ds.map_batches(partials, batch_format="pyarrow")
    for b in p.iter_batches(batch_format="pyarrow"):
        np.add.at(k, b.column("vertex").to_numpy(), b.column("k").to_numpy())
    return k


def _distributed_modularity(edges_ds, comm_ref, comm, k, m2, resolution):
    """Q = internal/m2 − res·Σ(Σ_tot/m2)²; internal is a distributed scalar
    sum (per-batch partials), Σ_tot a V-sized driver bincount."""
    import ray

    def internal_partial(t: pa.Table) -> pa.Table:
        c = ray.get(comm_ref)
        s = t.column("src").to_numpy()
        d = t.column("dst").to_numpy()
        w = t.column("weight").to_numpy()
        return pa.table({"internal": [float(w[c[s] == c[d]].sum())]})

    internal = float(
        edges_ds.map_batches(internal_partial, batch_format="pyarrow").sum("internal")
    )
    sig = np.bincount(comm, weights=k, minlength=int(comm.max()) + 1)
    return internal / m2 - resolution * float((sig / m2) @ (sig / m2))


def _move_phase(level_edges, V, k, m2, comm, q_cur, resolution, max_inner,
                min_gain, parity_salt, local, src, dst, w,
                restrict_parent=None, singleton_only=False):
    """The Louvain local-moving sweep loop, shared with Leiden.

    ``restrict_parent``: only consider target communities whose parent
    (the array's value at both endpoints) matches — the Leiden refinement
    constraint (moves stay inside the phase-1 community).
    ``singleton_only``: only vertices currently alone in their community
    may move (the Leiden refinement merge rule).
    Returns (comm, q_cur, improved).
    """
    import ray

    from raygraph.agg import hash_aggregate
    from raygraph.hashing import hash_int64
    from raygraph.joins import _key_hash

    improved = False
    for sweep in range(max_inner):
        sig = np.bincount(comm, weights=k, minlength=V)
        cref = ray.put(comm)
        kref = ray.put(k)
        sref = ray.put(sig)
        pref = ray.put(restrict_parent) if restrict_parent is not None else None

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            s = df["src"].to_numpy(np.int64)
            d = df["dst"].to_numpy(np.int64)
            keep = s != d
            if pref is not None:
                par = ray.get(pref)
                keep &= par[s] == par[d]
            return pd.DataFrame(
                {
                    "src": s[keep],
                    "cdst": c[d[keep]],
                    "weight": df["weight"].to_numpy()[keep],
                }
            )

        if local:
            keep = src != dst
            if restrict_parent is not None:
                keep &= restrict_parent[src] == restrict_parent[dst]
            sl, cdl, wl = src[keep], comm[dst[keep]], w[keep]
            key = (sl.astype(np.int64) << np.int64(32)) | cdl
            uk, inv = np.unique(key, return_inverse=True)
            wv_l = np.bincount(inv, weights=wl, minlength=len(uk))
            agg_df = pd.DataFrame(
                {
                    "src": (uk >> np.int64(32)).astype(np.int64),
                    "cdst": (uk & np.int64(0xFFFFFFFF)).astype(np.int64),
                    "w": wv_l,
                }
            )
        else:
            linked = level_edges.map_batches(attach, batch_format="pandas")
            agg = hash_aggregate(linked, ["src", "cdst"], {"w": ("weight", "sum")})

        def best_move(df: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cref)
            kk = ray.get(kref)
            ss = ray.get(sref)
            s = df["src"].to_numpy(np.int64)
            cd = df["cdst"].to_numpy(np.int64)
            wv = df["w"].to_numpy(np.float64)
            # gain score for i joining community cd (i's own mass removed
            # from Σ_tot): score = w_{i→c} − res·k_i·Σ_tot*(c)/m2
            sig_star = ss[cd] - np.where(c[s] == cd, kk[s], 0.0)
            score = wv - resolution * kk[s] * sig_star / m2
            # per src: argmax score, ties → min community id
            order = np.lexsort((cd, -score, s))
            s_s, cd_s, sc_s = s[order], cd[order], score[order]
            first = np.ones(len(s_s), dtype=bool)
            first[1:] = s_s[1:] != s_s[:-1]
            vbest = s_s[first]
            cbest = cd_s[first]
            sbest = sc_s[first]
            # score of STAYING: the row with cd == current community, or
            # (no internal links) −res·k_i·(Σ_tot(c_i)−k_i)/m2
            stay = -resolution * kk[vbest] * (ss[c[vbest]] - kk[vbest]) / m2
            in_own = cd == c[s]
            if in_own.any():
                # (src, cdst) rows are unique post-aggregation, so each
                # src has at most one in-own row — sorted searchsorted
                # replaces the per-vertex dict loop
                s_own = s[in_own]
                sc_own = score[in_own]
                o = np.argsort(s_own, kind="stable")
                s_own, sc_own = s_own[o], sc_own[o]
                pos = np.searchsorted(s_own, vbest)
                safe = np.minimum(pos, len(s_own) - 1)
                hit = s_own[safe] == vbest
                stay[hit] = sc_own[safe[hit]]
            keep = sbest > stay + 1e-12
            return pd.DataFrame(
                {"vertex": vbest[keep], "best": cbest[keep]}
            )

        # co-locate rows of each src, then vectorized per-bucket argmax
        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bk"] = (
                _key_hash(df, ["src"]) % np.uint64(32)
            ).astype(np.int32)
            return df

        if local:
            picked = best_move(agg_df)
        else:
            picked = (
                agg.map_batches(tag, batch_format="pandas")
                .groupby("__bk")
                .map_groups(
                    lambda g: best_move(g.drop(columns="__bk")),
                    batch_format="pandas",
                )
                .to_pandas()  # ≤ V rows (one candidate move per vertex)
            )

        if len(picked) == 0 or "vertex" not in picked.columns:
            break  # no vertex gains from moving → level converged
        if singleton_only:
            counts = np.bincount(comm, minlength=V)
            picked = picked[
                counts[comm[picked["vertex"].to_numpy(np.int64)]] == 1
            ]
            if len(picked) == 0:
                break
        movers = picked["vertex"].to_numpy(np.int64)
        # alternate hash-parity half-sweeps: simultaneous pairwise swaps
        # (the synchronous-Louvain oscillation) cannot happen inside one
        # parity class, and the modularity guard below stays a backstop
        # parity_salt varies the half-sweep schedule — the ECG ensemble
        # uses it the way the reference permutes vertex order per member
        parity = (
            hash_int64(movers ^ np.int64(parity_salt)) % np.uint64(2)
        ).astype(np.int64)
        sel = parity == (sweep % 2)
        if not sel.any():
            continue
        new_comm = comm.copy()
        new_comm[movers[sel]] = picked["best"].to_numpy(np.int64)[sel]
        if np.array_equal(new_comm, comm):
            break
        if local:
            q_new = _modularity_local(src, dst, w, new_comm, k, m2, resolution)
        else:
            q_new = _distributed_modularity(
                level_edges, ray.put(new_comm), new_comm, k, m2, resolution
            )
        if q_new <= q_cur + min_gain:
            if sweep % 2 == 1:
                break  # both parity classes exhausted
            continue
        comm = new_comm
        q_cur = q_new
        improved = True
    return comm, q_cur, improved


def louvain(graph, max_levels: int = 10, max_inner: int = 20,
            resolution: float = 1.0, min_gain: float = 1e-9,
            local_edge_limit: int = 5_000_000, parity_salt: int = 0):
    """Returns (Dataset (vertex, partition), modularity: float).

    Requires an undirected (symmetrized) simple graph, like the reference
    (``louvain.py`` asserts undirected input).  Driver memory is O(V)
    (community / degree / relabel arrays); edge-sized data stays
    distributed unless a level has ≤ ``local_edge_limit`` edges.
    """
    import ray
    import ray.data as rd

    from raygraph.agg import hash_aggregate

    if graph.directed:
        raise ValueError("louvain requires an undirected graph (directed=False)")
    V0 = graph.num_vertices

    edges_ds = graph.edges_dataset(columns=["src", "dst", "weight"])
    assign0 = np.arange(V0, dtype=np.int64)  # original vertex → current comm
    level_edges = edges_ds
    E_level = graph.num_edges
    V = V0

    # m2 = Σ_directed w = 2m (graph stores both directions)
    m2 = float(level_edges.sum("weight"))
    if m2 == 0:
        return rd.from_pandas(
            pd.DataFrame({"vertex": np.arange(V0), "partition": assign0})
        ), 0.0

    final_modularity = 0.0
    for level in range(max_levels):
        local = E_level <= local_edge_limit
        if local:
            src, dst, w = _edge_arrays(level_edges)
            k = np.bincount(src, weights=w, minlength=V)
        else:
            src = dst = w = None
            k = _distributed_degrees(level_edges, V)
        comm = np.arange(V, dtype=np.int64)
        if local:
            q_cur = _modularity_local(src, dst, w, comm, k, m2, resolution)
        else:
            q_cur = _distributed_modularity(
                level_edges, ray.put(comm), comm, k, m2, resolution
            )

        comm, q_cur, improved_level = _move_phase(
            level_edges, V, k, m2, comm, q_cur, resolution, max_inner,
            min_gain, parity_salt, local, src, dst, w,
        )

        final_modularity = q_cur
        if not improved_level:
            break

        # contract: dense-relabel communities, coarsen edges, recurse
        # dense[v] = compact community id of current-level vertex v;
        # assign0 holds current-level vertex ids for the original vertices
        uniq, dense = np.unique(comm, return_inverse=True)
        assign0 = dense[assign0]
        Vc = len(uniq)
        dref = ray.put(dense)

        def contract(df: pd.DataFrame) -> pd.DataFrame:
            dn = ray.get(dref)
            return pd.DataFrame(
                {
                    "src": dn[df["src"].to_numpy(np.int64)],
                    "dst": dn[df["dst"].to_numpy(np.int64)],
                    "weight": df["weight"].to_numpy(),
                }
            )

        if local:
            cs, cd = dense[src], dense[dst]
            key = (cs.astype(np.int64) << np.int64(32)) | cd
            uk, inv = np.unique(key, return_inverse=True)
            wsum = np.bincount(inv, weights=w, minlength=len(uk))
            level_edges = rd.from_pandas(
                pd.DataFrame(
                    {
                        "src": (uk >> np.int64(32)).astype(np.int64),
                        "dst": (uk & np.int64(0xFFFFFFFF)).astype(np.int64),
                        "weight": wsum,
                    }
                )
            )
            E_level = len(uk)
        else:
            level_edges = cut_stats_lineage(hash_aggregate(
                level_edges.map_batches(contract, batch_format="pandas"),
                ["src", "dst"],
                {"weight": ("weight", "sum")},
            ).materialize())
            E_level = level_edges.count()  # materialized → metadata only
        if Vc == V:
            break
        V = Vc

    out = rd.from_pandas(
        pd.DataFrame(
            {"vertex": np.arange(V0, dtype=np.int64), "partition": assign0}
        )
    )
    return out, float(final_modularity)


def leiden(graph, max_levels: int = 10, max_inner: int = 20,
           resolution: float = 1.0, min_gain: float = 1e-9,
           local_edge_limit: int = 5_000_000, parity_salt: int = 0,
           refine_inner: int = 10):
    """Leiden community detection (Traag, Waltman & van Eck 2019) —
    reference ``community/leiden.py`` / ``cpp/src/community/legacy/
    leiden.cu`` + ``leiden.cuh``.

    Louvain plus a **refinement phase** before each contraction: within
    every phase-1 community, vertices restart as singletons and greedily
    re-merge — but only with targets *inside their own community*, and
    only while they are *alone* in their refined community (the Leiden
    merge rule).  The graph is contracted by the REFINED partition, and
    the next level starts from the phase-1 communities (not singletons),
    so a badly-connected community is split at contraction instead of
    being frozen into one node — the Louvain pathology Leiden fixes.

    Same scale contract as :func:`louvain`: O(V) driver state, distributed
    sweeps/aggregates past ``local_edge_limit``.
    Returns (Dataset (vertex, partition), modularity).
    """
    import ray
    import ray.data as rd

    from raygraph.agg import hash_aggregate

    if graph.directed:
        raise ValueError("leiden requires an undirected graph (directed=False)")
    V0 = graph.num_vertices

    edges_ds = graph.edges_dataset(columns=["src", "dst", "weight"])
    assign0 = np.arange(V0, dtype=np.int64)  # original → current-level vertex
    level_edges = edges_ds
    E_level = graph.num_edges
    V = V0
    comm_init = np.arange(V0, dtype=np.int64)

    m2 = float(level_edges.sum("weight"))
    if m2 == 0:
        return rd.from_pandas(
            pd.DataFrame({"vertex": np.arange(V0), "partition": assign0})
        ), 0.0

    final_modularity = 0.0
    partition_out = comm_init[assign0]
    for level in range(max_levels):
        local = E_level <= local_edge_limit
        if local:
            src, dst, w = _edge_arrays(level_edges)
            k = np.bincount(src, weights=w, minlength=V)
        else:
            src = dst = w = None
            k = _distributed_degrees(level_edges, V)
        comm = comm_init.copy()
        if local:
            q_cur = _modularity_local(src, dst, w, comm, k, m2, resolution)
        else:
            q_cur = _distributed_modularity(
                level_edges, ray.put(comm), comm, k, m2, resolution
            )

        # phase 1: unconstrained local moves (Louvain sweep)
        comm, q_cur, improved_level = _move_phase(
            level_edges, V, k, m2, comm, q_cur, resolution, max_inner,
            min_gain, parity_salt, local, src, dst, w,
        )
        final_modularity = q_cur
        partition_out = comm[assign0]
        if not improved_level:
            break

        # phase 2: refinement — singleton restart constrained to the
        # phase-1 communities; merging only while alone in the refined
        # community.  The refined partition's own modularity guards the
        # sweep (it rises as fragments merge; it may sit below phase 1's
        # q — that is the point: contraction keeps the splits).
        rcomm = np.arange(V, dtype=np.int64)
        if local:
            q_ref = _modularity_local(src, dst, w, rcomm, k, m2, resolution)
        else:
            q_ref = _distributed_modularity(
                level_edges, ray.put(rcomm), rcomm, k, m2, resolution
            )
        rcomm, q_ref, _ = _move_phase(
            level_edges, V, k, m2, rcomm, q_ref, resolution, refine_inner,
            min_gain, parity_salt, local, src, dst, w,
            restrict_parent=comm, singleton_only=True,
        )

        # contract by the refined partition; next level starts from the
        # phase-1 communities of the refined groups
        uniq, dense = np.unique(rcomm, return_inverse=True)
        assign0 = dense[assign0]
        parent = np.zeros(len(uniq), dtype=np.int64)
        parent[dense] = comm  # constant within each refined community
        _, comm_next = np.unique(parent, return_inverse=True)
        dref = ray.put(dense)

        def contract(df: pd.DataFrame) -> pd.DataFrame:
            dn = ray.get(dref)
            return pd.DataFrame(
                {
                    "src": dn[df["src"].to_numpy(np.int64)],
                    "dst": dn[df["dst"].to_numpy(np.int64)],
                    "weight": df["weight"].to_numpy(),
                }
            )

        if local:
            cs, cd = dense[src], dense[dst]
            key = (cs.astype(np.int64) << np.int64(32)) | cd
            uk, inv = np.unique(key, return_inverse=True)
            wsum = np.bincount(inv, weights=w, minlength=len(uk))
            level_edges = rd.from_pandas(
                pd.DataFrame(
                    {
                        "src": (uk >> np.int64(32)).astype(np.int64),
                        "dst": (uk & np.int64(0xFFFFFFFF)).astype(np.int64),
                        "weight": wsum,
                    }
                )
            )
            E_level = len(uk)
        else:
            level_edges = cut_stats_lineage(hash_aggregate(
                level_edges.map_batches(contract, batch_format="pandas"),
                ["src", "dst"],
                {"weight": ("weight", "sum")},
            ).materialize())
            E_level = level_edges.count()
        if len(uniq) == V:
            break
        V = len(uniq)
        comm_init = comm_next.astype(np.int64)

    _, compact = np.unique(partition_out, return_inverse=True)
    out = rd.from_pandas(
        pd.DataFrame(
            {"vertex": np.arange(V0, dtype=np.int64),
             "partition": compact.astype(np.int64)}
        )
    )
    return out, float(final_modularity)


def ecg(graph, min_weight: float = 0.05, ensemble_size: int = 16,
        seed: int = 42, broadcast_limit: Optional[int] = None,
        **louvain_kwargs):
    """Ensemble Clustering for Graphs (Poulin & Théberge 2018) —
    ``cpp/src/community/legacy/ecg.cu`` / ``community/ecg.py:41``.

    1. Run ``ensemble_size`` single-level Louvain passes, each with a
       different move schedule (``parity_salt`` — the analogue of the
       reference's per-member vertex permutation).
    2. Reweight every edge: ``w' = min_weight + (1−min_weight)·
       (co-membership count / ensemble_size)`` (``ecg.cu:186``).
    3. Full Louvain on the reweighted graph.

    Scale contract: the driver never holds more than ONE member's V-sized
    label array at a time (transiently, to broadcast it); the ensemble
    co-membership counts accumulate inside one streamed pass over the
    edges reading the per-member broadcasts.  Past ``broadcast_limit``
    vertices the members stay Datasets and co-membership is computed by
    two bucketed hash joins of the (vertex, member, label) union onto the
    edge endpoints plus one aggregate — no V-sized driver or plasma array
    at all.

    Returns (Dataset (vertex, partition), modularity of the final
    partition on the REWEIGHTED graph).
    """
    import ray
    import ray.data as rd

    from raygraph.graph import DEFAULT_BROADCAST_LIMIT, Graph
    from raygraph.hashing import hash_int64

    if broadcast_limit is None:
        broadcast_limit = DEFAULT_BROADCAST_LIMIT
    # the ensemble passes pin max_levels=1 and their own parity_salt; a
    # caller-supplied value of either applies only to the final full pass
    ensemble_kwargs = {
        k: v for k, v in louvain_kwargs.items()
        if k not in ("max_levels", "parity_salt")
    }
    V = graph.num_vertices
    member_ds = []
    for i in range(ensemble_size):
        # int() BEFORE the mask: uint64 & python-int silently promotes to
        # float64 (the Graph.neighbors gotcha)
        salt = int(hash_int64(np.array([seed * 1_000_003 + i]))[0]) & 0x7FFFFFFF
        res, _q = louvain(graph, max_levels=1, parity_salt=salt,
                          **ensemble_kwargs)
        member_ds.append(res)

    edges = graph.edges_dataset(columns=["src", "dst"])
    if V <= broadcast_limit:
        # one member at a time: V-sized transient on the driver, broadcast
        # once, read zero-copy by every edge batch
        refs = []
        for res in member_ds:
            df = res.to_pandas()
            arr = np.empty(V, dtype=np.int64)
            arr[df["vertex"].to_numpy(np.int64)] = (
                df["partition"].to_numpy(np.int64)
            )
            refs.append(ray.put(arr))
            del df, arr

        def reweight(df: pd.DataFrame) -> pd.DataFrame:
            s = df["src"].to_numpy(np.int64)
            d = df["dst"].to_numpy(np.int64)
            same = np.zeros(len(df), dtype=np.int64)
            for r in refs:
                lab = ray.get(r)
                same += lab[s] == lab[d]
            return pd.DataFrame(
                {
                    "src": s,
                    "dst": d,
                    "weight": min_weight
                    + (1.0 - min_weight) * same / ensemble_size,
                }
            )

        rw = edges.map_batches(reweight, batch_format="pandas")
    else:
        from raygraph.agg import hash_aggregate
        from raygraph.joins import hash_join

        def tag_member(i):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "vertex": df["vertex"].to_numpy(np.int64),
                        "member": np.full(len(df), i, dtype=np.int32),
                        "label": df["partition"].to_numpy(np.int64),
                    }
                )

            return fn

        labels = member_ds[0].map_batches(tag_member(0), batch_format="pandas")
        for i in range(1, ensemble_size):
            labels = labels.union(
                member_ds[i].map_batches(tag_member(i), batch_format="pandas")
            )
        lab_s = labels.map_batches(
            lambda df: df.rename(columns={"vertex": "src", "label": "lab_s"}),
            batch_format="pandas",
        )
        lab_d = labels.map_batches(
            lambda df: df.rename(columns={"vertex": "dst", "label": "lab_d"}),
            batch_format="pandas",
        )
        j1 = hash_join(edges, lab_s, on="src")
        j2 = hash_join(j1, lab_d, on=["dst", "member"])
        sames = j2.map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": df["src"].to_numpy(np.int64),
                    "dst": df["dst"].to_numpy(np.int64),
                    "same": (
                        df["lab_s"].to_numpy(np.int64)
                        == df["lab_d"].to_numpy(np.int64)
                    ).astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
        agg = hash_aggregate(sames, ["src", "dst"], {"same": ("same", "sum")})
        rw = agg.map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": df["src"].to_numpy(np.int64),
                    "dst": df["dst"].to_numpy(np.int64),
                    "weight": min_weight
                    + (1.0 - min_weight)
                    * df["same"].to_numpy(np.float64) / ensemble_size,
                }
            ),
            batch_format="pandas",
        )
    g2 = Graph.from_edges(
        rw, src="src", dst="dst", weight="weight",
        directed=True, renumber=False,
        num_partitions=graph.num_partitions,
    )
    # the reweighted graph keeps both stored directions, so Louvain's
    # undirected contract holds; flip the flag AND re-persist the meta so a
    # later Graph.load(out_dir) sees the same undirected handle
    g2.meta["directed"] = False
    g2._save_meta()
    return louvain(g2, **louvain_kwargs)
