"""Geodesic polygon perimeter/area vs the reference's planimeter fixtures
(GeographicLib test set embedded in src/tests/geodtest.c: Planimeter0,
Planimeter5, Planimeter6, Planimeter12/13 analogues, geod_polygonarea
triangle from Planimeter15) plus sphere sanity."""

import numpy as np
import pytest

from proj_spark.geodesy import (
    ellipsoid_area,
    polygon_perimeter_area,
    polyline_length,
)
from proj_spark.kernels.core import Ellipsoid

WGS84 = Ellipsoid(6378137.0, 6378137.0 * (1 - 1 / 298.257223563))
D = np.radians

# (name, lons, lats, perimeter_exp (or None), area_exp, area_tol)
CASES = [
    ("pole_square_n", [0, 90, 180, 270], [89] * 4,
     631819.8745, 24952305678.0, 1.0),
    ("pole_square_s", [0, 90, 180, 270], [-89] * 4,
     631819.8745, -24952305678.0, 1.0),
    ("equator_diamond", [-1, 0, 1, 0], [0, -1, 0, 1],
     627598.2731, 24619419146.0, 1.0),
    ("octant_with_pole", [0, 0, 90], [90, 0, 0],
     30022685, 63758202715511.0, 1.0),
    ("small_triangle", [1, 2, 3], [2, 1, 3],
     None, 18454562325.45119, 0.5),
    ("pole_encircle_twice", [-360, -240, -120, 0, 120, 240], [89] * 6,
     1160741, 32415230256.0, 1.0),
    ("pole_crossing_edge", [0.1, 90.1, -179.9], [89] * 3,
     539297, 12476152838.5, 1.0),
    ("lon12_rounding_a", [-1e-14, 180, 0], [9, 9, 9],
     36026861, 0.0, 1.0),
    ("lon12_rounding_b", [1e-14, 0, 180], [9, 9, 9],
     36026861, 0.0, 1.0),
]


@pytest.mark.parametrize("name,lons,lats,pexp,aexp,atol", CASES)
def test_planimeter(name, lons, lats, pexp, aexp, atol):
    p, a = polygon_perimeter_area(WGS84, D(lons), D(lats))
    assert a == pytest.approx(aexp, abs=atol)
    if pexp is not None:
        assert p == pytest.approx(pexp, abs=1.0)


def test_total_area():
    assert ellipsoid_area(WGS84) == pytest.approx(510065621724088.5093,
                                                  rel=1e-15)


def test_polyline():
    assert polyline_length(WGS84, D([0, 0, 90]), D([90, 0, 0])) == \
        pytest.approx(20020719, abs=1.0)


def test_sphere_matches_spherical_excess():
    R = 6370997.0
    sph = Ellipsoid(R, R)
    # spherical cap square at lat 60: area = independent SLERP Green truth
    p, a = polygon_perimeter_area(sph, D([0, 90, 180, 270]), D([60] * 4))
    # exact: 4 identical great-circle arcs; verify vs dense slerp integral
    def xyz(lo, la):
        return np.array([np.cos(la) * np.cos(lo), np.cos(la) * np.sin(lo),
                         np.sin(la)])
    total = 0.0
    for i in range(4):
        p1 = xyz(D(90 * i), D(60))
        p2 = xyz(D(90 * (i + 1)), D(60))
        om = np.arccos(np.dot(p1, p2))
        t = np.linspace(0, 1, 200001)
        pts = (np.sin((1 - t)[:, None] * om) * p1 +
               np.sin(t[:, None] * om) * p2) / np.sin(om)
        lam = np.unwrap(np.arctan2(pts[:, 1], pts[:, 0]))
        Af = R * R * pts[:, 2]
        total += np.sum(0.5 * (Af[1:] + Af[:-1]) * np.diff(lam))
    truth = 2 * np.pi * R * R - total
    assert a == pytest.approx(truth, abs=1000.0)  # truth itself is O(h^2) trapezoid


def test_series_matches_quadrature():
    """The C4-series area path (reference geodesic.c:958-1014) against the
    independent Green's-theorem quadrature of the lune-area function —
    two disjoint formulations of the same integral (the quadrature knows
    nothing of the C4 expansion)."""
    from proj_spark.geodesy import (_polygon_perimeter_area_quadrature,
                                    rings_perimeter_area)
    rng = np.random.default_rng(7)
    for _ in range(12):
        k = int(rng.integers(3, 7))
        clon = rng.uniform(-170, 170)
        clat = rng.uniform(-60, 60)
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.2, 3.0)
        lons = D(clon + rad * np.cos(ang))
        lats = D(clat + rad * np.sin(ang))
        p1, a1 = polygon_perimeter_area(WGS84, lons, lats)
        p2, a2 = _polygon_perimeter_area_quadrature(WGS84, lons, lats)
        assert p1 == pytest.approx(p2, abs=1e-3)
        assert a1 == pytest.approx(a2, abs=max(1.0, abs(a2) * 1e-9))
    # batched rings agree with the scalar path
    lons = np.stack([D([1, 2, 3]), D([10, 11, 12])])
    lats = np.stack([D([2, 1, 3]), D([12, 11, 13])])
    p, a = rings_perimeter_area(WGS84, lons, lats)
    for i in range(2):
        ps, as_ = polygon_perimeter_area(WGS84, lons[i], lats[i])
        assert p[i] == pytest.approx(ps, abs=1e-6)
        assert a[i] == pytest.approx(as_, abs=1e-3)
