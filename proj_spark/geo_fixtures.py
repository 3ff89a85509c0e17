"""Deterministic admin-polygon fixture for the spatial-join layer.

Synthesizes the FIXTURES.md §2 `admin_polygons` table with pure integer
arithmetic (fixed-point 1e-5-degree vertices) so the Spark build side and the
DuckDB oracle see bit-identical geometry. Shapes exercise the join paths the
north rule grades: convex + concave rings, holes (even-odd parity), one huge
"ocean" band creating hot-cell skew, and an antimeridian-crossing polygon
pre-split into two rings the way the reference splits extents that cross
±180° (src/4D_api.cpp:2023-2040).

Coordinate domain matches the point fixtures: lon_i ∈ [-1.8e7, 1.8e7),
lat_i ∈ [-8.5e6, 8.5e6), both int64 scaled by 1e5.
"""

from __future__ import annotations

from functools import lru_cache

SCALE = 100_000  # 1e-5 deg fixed point

# convex octagon offsets (unit radius r, h = 0.7 r) — integer-safe
_OCT = [(1, 0), (0.7, 0.7), (0, 1), (-0.7, 0.7), (-1, 0), (-0.7, -0.7),
        (0, -1), (0.7, -0.7)]
# concave 8-point star: alternate radius r and r/3
_STAR = [(1, 0), (0.24, 0.24), (0, 1), (-0.24, 0.24), (-1, 0),
         (-0.24, -0.24), (0, -1), (0.24, -0.24)]


def _ring(cx: int, cy: int, r: int, shape) -> list[tuple[int, int]]:
    pts = [(cx + int(r * dx), cy + int(r * dy)) for dx, dy in shape]
    return pts + [pts[0]]  # closed: first == last


@lru_cache(maxsize=1)
def polygons() -> list[dict]:
    """List of {polygon_id, name, rings}; rings = [outer, hole, ...], each a
    closed list of (x_i, y_i) int vertices."""
    out = []
    # 24 convex octagons: centers on a deterministic low-discrepancy walk,
    # radii 0.5°..8° (mixed sizes -> mixed cover-cell fanout)
    for k in range(24):
        cx = ((k * 7919 + 131) % 320 - 160) * SCALE
        cy = ((k * 4409 + 59) % 150 - 75) * SCALE
        r = (50 + (k * 1723) % 750) * SCALE // 100
        out.append({"polygon_id": f"oct{k:02d}", "name": f"octagon-{k}",
                    "rings": [_ring(cx, cy, r, _OCT)]})
    # 8 concave stars
    for k in range(8):
        cx = ((k * 104729 + 17) % 300 - 150) * SCALE
        cy = ((k * 15485863 + 23) % 140 - 70) * SCALE
        r = (100 + (k * 911) % 900) * SCALE // 100
        out.append({"polygon_id": f"star{k}", "name": f"star-{k}",
                    "rings": [_ring(cx, cy, r, _STAR)]})
    # 2 octagons with square holes (even-odd parity path)
    for k in range(2):
        cx = (40 + 60 * k) * SCALE
        cy = (30 - 65 * k) * SCALE
        r = 6 * SCALE
        h = 2 * SCALE
        hole = [(cx + h, cy + h), (cx - h, cy + h), (cx - h, cy - h),
                (cx + h, cy - h), (cx + h, cy + h)]
        out.append({"polygon_id": f"holed{k}", "name": f"holed-{k}",
                    "rings": [_ring(cx, cy, r, _OCT), hole]})
    # the "ocean": a huge southern band -> severe build-side skew
    ocean = [(-170 * SCALE, -84 * SCALE), (170 * SCALE, -84 * SCALE),
             (170 * SCALE, -60 * SCALE), (-170 * SCALE, -60 * SCALE),
             (-170 * SCALE, -84 * SCALE)]
    out.append({"polygon_id": "ocean", "name": "southern-ocean",
                "rings": [ocean]})
    # antimeridian polygon 172..188°E × 10..25°N, split into two rings at
    # ±180 (reference extent-split behavior, 4D_api.cpp:2023-2040)
    east = [(172 * SCALE, 10 * SCALE), (180 * SCALE, 10 * SCALE),
            (180 * SCALE, 25 * SCALE), (172 * SCALE, 25 * SCALE),
            (172 * SCALE, 10 * SCALE)]
    west = [(-180 * SCALE, 10 * SCALE), (-172 * SCALE, 10 * SCALE),
            (-172 * SCALE, 25 * SCALE), (-180 * SCALE, 25 * SCALE),
            (-180 * SCALE, 10 * SCALE)]
    out.append({"polygon_id": "xmeridian", "name": "antimeridian-block",
                "rings": [east, west]})
    return out


def edges() -> list[tuple[str, int, int, int, int]]:
    """Flat (polygon_id, x1, y1, x2, y2) edge list over all rings."""
    rows = []
    for p in polygons():
        for ring in p["rings"]:
            for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
                rows.append((p["polygon_id"], x1, y1, x2, y2))
    return rows


def bbox(p: dict) -> tuple[int, int, int, int]:
    xs = [v[0] for ring in p["rings"] for v in ring]
    ys = [v[1] for ring in p["rings"] for v in ring]
    return min(xs), min(ys), max(xs), max(ys)


def cover_cells(p: dict, cell_i: int) -> list[tuple[int, int]]:
    """Grid-cell cover (superset) of the polygon: every (cx, cy) cell of
    width ``cell_i`` (scaled units) intersecting the bbox. This is the
    build-side key set for the cell-prefix hash join; correctness only needs
    cover ⊇ polygon, tightness only affects candidate fanout."""
    x0, y0, x1, y1 = bbox(p)
    out = []
    for cx in range(x0 // cell_i, x1 // cell_i + 1):
        for cy in range(y0 // cell_i, y1 // cell_i + 1):
            out.append((cx, cy))
    return out


def edges_sql_values() -> str:
    """DuckDB/Spark-portable VALUES list of the edge table."""
    rows = ",\n    ".join(
        f"('{pid}', {x1}, {y1}, {x2}, {y2})"
        for pid, x1, y1, x2, y2 in edges())
    return ("(VALUES\n    " + rows +
            ") AS edges(polygon_id, ex1, ey1, ex2, ey2)")
