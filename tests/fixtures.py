"""Golden small graphs (FIXTURES.md §F3) — embedded literal edge lists.

``karate`` is Zachary's karate club (public domain, the reference's primary
test dataset: ``datasets/README.md``), 0-indexed, 78 undirected edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# fmt: off
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32),
    (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16),
    (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
# fmt: on

KARATE_V = 34


def karate_df(weight: float = 1.0) -> pd.DataFrame:
    src = [u for u, _ in KARATE_EDGES]
    dst = [v for _, v in KARATE_EDGES]
    return pd.DataFrame(
        {"src": src, "dst": dst, "weight": np.full(len(src), weight)}
    )


def karate_sym_arrays():
    """Symmetrized (both directions) src/dst/w arrays for the oracles."""
    df = karate_df()
    src = np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
    dst = np.concatenate([df["dst"].to_numpy(), df["src"].to_numpy()])
    w = np.ones(len(src))
    return src, dst, w


def two_components_df() -> pd.DataFrame:
    """Two disjoint blobs + a 2-cycle pair: vids 0-4 path, 10-13 clique, 20-21."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges += [(20, 21)]
    return pd.DataFrame(
        {
            "src": [u for u, _ in edges],
            "dst": [v for _, v in edges],
            "weight": np.ones(len(edges)),
        }
    )


def line_df(n=10) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "src": np.arange(n - 1),
            "dst": np.arange(1, n),
            "weight": np.ones(n - 1),
        }
    )
