"""Point-in-polygon kernels: vectorized crossing-number (even-odd) test.

The reference's own PIP kernel is `pnpoly` inside the healpix projection
(src/projections/healpix.cpp:132-165): classic even-odd crossing-number over
a vertex ring. This module re-expresses it columnar over numpy int64
coordinate arrays in fixed-point 1e-5-degree units, so every comparison is
exact integer arithmetic (products stay < 2^53, bit-identical across
engines) — the SURVEY.md §7.3 requirement that "join rows … match exactly".

Holes are handled by parity: a polygon's rings (outer + holes) all
contribute crossings; a point is inside iff the total crossing count over
all rings is odd (even-odd rule, same semantics the SQL oracle uses).
"""

from __future__ import annotations

import numpy as np


def crossings(px, py, x1, y1, x2, y2):
    """Count ray crossings for each point against ALL edges (broadcast).

    px, py: (N,) int64 point coords (scaled 1e5).
    x1, y1, x2, y2: (E,) int64 edge endpoint arrays.
    Returns (N,) int64 crossing counts.

    Edge rule (half-open in y, reference healpix.cpp:150-156): the edge is
    crossed iff (y1 > py) != (y2 > py) and the point is strictly left of the
    intersection. The divide-free form cross-multiplies by (y2-y1) with a
    sign-aware flip so all arithmetic stays in exact integer doubles.
    """
    px = np.asarray(px, dtype=np.int64)[:, None]
    py = np.asarray(py, dtype=np.int64)[:, None]
    x1 = np.asarray(x1, dtype=np.int64)[None, :]
    y1 = np.asarray(y1, dtype=np.int64)[None, :]
    x2 = np.asarray(x2, dtype=np.int64)[None, :]
    y2 = np.asarray(y2, dtype=np.int64)[None, :]
    straddle = (y1 > py) != (y2 > py)
    lhs = (px - x1) * (y2 - y1)
    rhs = (x2 - x1) * (py - y1)
    left = np.where(y2 > y1, lhs < rhs, lhs > rhs)
    return np.sum(straddle & left, axis=1)


def points_in_polygon(px, py, edges) -> np.ndarray:
    """Boolean inside-mask for points vs one polygon's edge arrays.

    ``edges`` is a tuple (x1, y1, x2, y2) covering all rings (outer +
    holes); parity of total crossings decides containment.
    """
    n = np.asarray(px).shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    # chunk points to bound the (N, E) broadcast temp
    out = np.empty(n, dtype=bool)
    x1, y1, x2, y2 = edges
    step = max(1, 4_000_000 // max(1, len(x1)))
    for i in range(0, n, step):
        c = crossings(px[i:i + step], py[i:i + step], x1, y1, x2, y2)
        out[i:i + step] = (c % 2) == 1
    return out
