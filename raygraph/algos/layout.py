"""Force Atlas 2 layout on the superstep engine.

Reference semantics: ``python/cugraph/cugraph/layout/force_atlas2.py`` /
``cpp/src/layout/force_atlas2.cuh`` (linear attraction along edges,
degree-weighted n-body repulsion, gravity, adaptive global speed,
Barnes-Hut far-field approximation).

Ray-native shape: positions are two per-worker state columns; attraction
is the engine's generic spmv (Σ_nbr w·pos, one exchange per axis per
iteration); repulsion uses a PARTICLE-MESH grid in place of the
reference's shared quadtree — each worker bins its owned vertices into a
global G×G grid, the driver reduces the tiny (mass, centroid) cell table
and broadcasts it back, and each worker computes far-field repulsion
against cell centroids (same O(V·cells) far-field role as Barnes-Hut,
but partition-friendly: no shared mutable tree).  The speed adaptation
is a simplified global damping schedule (the reference's swing/traction
controller is a per-vertex heuristic tuned for GPUs); layout QUALITY
contracts (cluster separation, determinism) are what tests pin.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import ray

from raygraph.superstep import SuperstepEngine


def force_atlas2(
    graph,
    max_iter: int = 100,
    pos_list=None,
    outbound_attraction_distribution: bool = True,
    lin_log_mode: bool = False,
    edge_weight_influence: float = 1.0,
    jitter_tolerance: float = 1.0,
    scaling_ratio: float = 2.0,
    strong_gravity_mode: bool = False,
    gravity: float = 1.0,
    grid_size: int = 32,
    num_workers: Optional[int] = None,
    out_dir=None,
):
    """Dataset (vertex, x, y) after ``max_iter`` FA2 iterations.

    Unsupported knobs of the reference API raise explicitly:
    ``pos_list`` (warm start), ``lin_log_mode``, and
    ``edge_weight_influence != 1`` (edge weights enter attraction as
    stored).
    """
    if pos_list is not None:
        raise NotImplementedError("force_atlas2: pos_list warm start")
    if lin_log_mode:
        raise NotImplementedError("force_atlas2: lin_log_mode")
    if edge_weight_influence != 1.0:
        raise NotImplementedError("force_atlas2: edge_weight_influence != 1")
    engine = SuperstepEngine(graph, num_workers=num_workers)
    try:
        W = engine.W
        ray.get([w.set_degree_state.remote("sdeg") for w in engine.workers])
        # Σ_nbr w per vertex (attraction normalizer): spmv of ones
        ray.get([w.set_state.remote("_one", 1.0) for w in engine.workers])
        per_recv, _ = engine.spmv_round_refs("_one")
        ray.get([engine.workers[q].gather_into.remote("swsum", per_recv[q])
                 for q in range(W)])
        # deterministic init in [-100, 100) (placement-independent)
        ray.get([w.set_state_hash.remote("fx", 101) for w in engine.workers])
        ray.get([w.set_state_hash.remote("fy", 102) for w in engine.workers])
        ray.get([w.scale_state.remote("fx", 200.0) for w in engine.workers])
        ray.get([w.scale_state.remote("fy", 200.0) for w in engine.workers])

        bounds = (-100.0, 100.0, -100.0, 100.0)
        speed = float(jitter_tolerance)
        prev_disp = np.inf
        for _ in range(max_iter):
            x0, x1, y0, y1 = bounds
            extent = max(x1 - x0, y1 - y0, 1e-6)
            inv_cell = grid_size / (extent * (1 + 1e-9))
            # grid cells are anchored at the bounding box min corner
            parts = ray.get(
                [w.fa2_grid.remote(x0, y0, inv_cell, grid_size)
                 for w in engine.workers]
            )
            cell_mass = np.sum([p[0] for p in parts], axis=0)
            cell_cx = np.sum([p[1] for p in parts], axis=0)
            cell_cy = np.sum([p[2] for p in parts], axis=0)
            for axis in ("fx", "fy"):
                per_recv, _ = engine.spmv_round_refs(axis)
                ray.get(
                    [engine.workers[q].gather_into.remote(
                        "_ax" if axis == "fx" else "_ay", per_recv[q])
                     for q in range(W)]
                )
            outs = ray.get(
                [w.fa2_apply.remote(cell_mass, cell_cx, cell_cy,
                                    scaling_ratio, gravity,
                                    strong_gravity_mode, speed,
                                    outbound_attraction_distribution)
                 for w in engine.workers]
            )
            disp = sum(o[0] for o in outs)
            bs = [o[1] for o in outs]
            bounds = (min(b[0] for b in bs), max(b[1] for b in bs),
                      min(b[2] for b in bs), max(b[3] for b in bs))
            # simplified global speed controller: damp when total
            # displacement grows (swinging), accelerate when it shrinks
            if disp > prev_disp:
                speed *= 0.9
            else:
                speed = min(speed * 1.05, 10.0 * jitter_tolerance)
            prev_disp = disp

        import pyarrow as pa

        ds = engine.result_dataset(["fx", "fy"], out_dir=out_dir)
        return ds.map_batches(
            lambda t: pa.table({"vertex": t.column("vertex"),
                                "x": t.column("fx"), "y": t.column("fy")}),
            batch_format="pyarrow",
        )
    finally:
        engine.shutdown()
