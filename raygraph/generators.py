"""Synthetic graph generators — RMAT and friends.

Reference: ``cpp/include/cugraph/graph_generators.hpp:28-116`` /
``cpp/src/generators/generate_rmat_edgelist.cu``; benchmark parameters
(Graph500 a=0.57 b=0.19 c=0.19, seed 42, edgefactor 16, weights U[0,1))
from ``benchmarks/python_e2e/cugraph_dask_funcs.py:31-70``.

Generation is a pure function of (edge_index, seed): each of the ``scale``
recursion levels consumes one uniform drawn from a splitmix64 counter
stream, so the edge list is identical at any parallelism — generated
distributed via ``ray.data.range(n).map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raygraph.hashing import splitmix64


def _u01(x: np.ndarray) -> np.ndarray:
    return (x >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def rmat_batch(indices: np.ndarray, scale: int, a=0.57, b=0.19, c=0.19,
               seed: int = 42, weighted: bool = True) -> pa.Table:
    idx = np.asarray(indices, dtype=np.int64).view(np.uint64)
    n = len(idx)
    src = np.zeros(n, dtype=np.int64)
    dst = np.zeros(n, dtype=np.int64)
    base = splitmix64(idx ^ np.uint64(seed * 0x9E3779B97F4A7C15 & (2**64 - 1)))
    for level in range(scale):
        r = _u01(splitmix64(base + np.uint64(level + 1)))
        src_bit = (r >= a + b).astype(np.int64)
        dst_bit = (((r >= a) & (r < a + b)) | (r >= a + b + c)).astype(np.int64)
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    cols = {"src": src, "dst": dst}
    if weighted:
        cols["weight"] = _u01(splitmix64(base ^ np.uint64(0xDEADBEEF)))
    return pa.table(cols)


def rmat_dataset(scale: int, edgefactor: int = 16, a=0.57, b=0.19, c=0.19,
                 seed: int = 42, weighted: bool = True):
    """Distributed RMAT edge Dataset: 2^scale vertices, edgefactor·2^scale edges."""
    import ray.data as rd

    n_edges = edgefactor * (1 << scale)
    ds = rd.range(n_edges)

    def gen(t: pa.Table) -> pa.Table:
        return rmat_batch(t.column("id").to_numpy(), scale, a, b, c, seed, weighted)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=65536)


def path_graph_dataset(n: int):
    """0→1→…→n-1 — ``graph_generators.hpp:128`` path generator analogue."""
    import ray.data as rd

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy()
        keep = i < n - 1
        i = i[keep]
        return pa.table(
            {"src": i, "dst": i + 1, "weight": np.ones(len(i), np.float64)}
        )

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def erdos_renyi_dataset(num_vertices: int, p: float, seed: int = 42):
    """G(n,p) by per-candidate-edge coin flip (vectorized, deterministic).

    ``graph_generators.hpp:262`` analogue; O(n²) candidates — test scale only.
    """
    import ray.data as rd

    n2 = num_vertices * num_vertices

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().view(np.uint64)
        r = _u01(splitmix64(i ^ np.uint64(seed)))
        keep = r < p
        i = i[keep].astype(np.int64)
        src = i // num_vertices
        dst = i % num_vertices
        m = src != dst
        return pa.table(
            {"src": src[m], "dst": dst[m],
             "weight": np.ones(int(m.sum()), np.float64)}
        )

    return rd.range(n2).map_batches(gen, batch_format="pyarrow", batch_size=1 << 20)


def mesh_graph_dataset(rows: int, cols: int):
    """2D 4-neighbor mesh — ``graph_generators.hpp:160`` generate_2d_mesh
    analogue.  Vertex (r, c) = r*cols + c; right + down edges emitted
    (symmetrize at build for the undirected mesh)."""
    import ray.data as rd

    n = rows * cols

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        r, c = i // cols, i % cols
        right = i[c < cols - 1]
        down = i[r < rows - 1]
        src = np.concatenate([right, down])
        dst = np.concatenate([right + 1, down + cols])
        return pa.table(
            {"src": src, "dst": dst, "weight": np.ones(len(src), np.float64)}
        )

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def complete_graph_dataset(num_vertices: int):
    """K_n (all ordered pairs, no self loops) —
    ``graph_generators.hpp:279`` generate_complete_graph analogue.
    O(n²) rows; generated from a flat pair index so it streams."""
    import ray.data as rd

    n2 = num_vertices * num_vertices

    def gen(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy().astype(np.int64)
        src = i // num_vertices
        dst = i % num_vertices
        m = src != dst
        return pa.table(
            {"src": src[m], "dst": dst[m],
             "weight": np.ones(int(m.sum()), np.float64)}
        )

    return rd.range(n2).map_batches(gen, batch_format="pyarrow", batch_size=1 << 20)
