"""Property tests for the S2 cell-id kernel (proj_spark.kernels.s2cell).

No external S2 library exists in this environment, so correctness rests on
structural properties of the Hilbert cell-id scheme + the reference's own
face/ST math (src/projections/s2.cpp:126-239):
- from_face_ij / to_face_ij are mutual inverses over random 30-bit ij
- lonlat -> cell -> center roundtrip stays inside the cell (re-assigning the
  center at the same level returns the same cell)
- parent/child containment: parent(leaf, L) is a prefix of leaf
- neighbors at a level partition points: two points < cell-diagonal apart
  share a parent at a coarser level
"""

from __future__ import annotations

import numpy as np

from proj_spark.kernels import s2cell as s2


def test_face_ij_roundtrip():
    rng = np.random.RandomState(42)
    n = 20000
    face = rng.randint(0, 6, n).astype(np.int64)
    i = rng.randint(0, 1 << 30, n).astype(np.int64)
    j = rng.randint(0, 1 << 30, n).astype(np.int64)
    ids = s2.from_face_ij(face, i, j)
    f2, i2, j2 = s2.to_face_ij(ids)
    assert (f2 == face).all()
    assert (i2 == i).all()
    assert (j2 == j).all()


def test_leaf_ids_unique_and_sentinel():
    rng = np.random.RandomState(1)
    n = 5000
    face = rng.randint(0, 6, n).astype(np.int64)
    i = rng.randint(0, 1 << 30, n).astype(np.int64)
    j = rng.randint(0, 1 << 30, n).astype(np.int64)
    ids = s2.from_face_ij(face, i, j)
    assert (ids & 1 == 1).all()
    assert len(np.unique(ids)) == len(np.unique(np.stack([face, i, j], 1), axis=0))


def test_lonlat_cell_center_stability():
    rng = np.random.RandomState(7)
    n = 20000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-89.9, 89.9, n)
    for level in (4, 10, 16, 24):
        cells = s2.lonlat_to_cell(lon, lat, level)
        clon, clat = s2.cell_center_lonlat(cells)
        cells2 = s2.lonlat_to_cell(clon, clat, level)
        assert (cells == cells2).all(), f"center escaped its cell at level {level}"


def test_parent_prefix_property():
    rng = np.random.RandomState(3)
    n = 10000
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    leaf = s2.lonlat_to_cell(lon, lat, 30)
    for level in (2, 8, 14, 20):
        par = s2.parent(leaf, level)
        # parent of parent's children: re-deriving from the same point at the
        # same level must equal parent(leaf)
        direct = s2.lonlat_to_cell(lon, lat, level)
        assert (par == direct).all()
        # level encoding is consistent
        assert (s2.cell_level(par) == level).all()


def test_poles_and_antimeridian():
    lon = np.array([0.0, 180.0, -180.0, 45.0, -45.0])
    lat = np.array([90.0, 0.0, 0.0, -90.0, 0.0])
    cells = s2.lonlat_to_cell(lon, lat, 12)
    assert (cells != 0).all()
    # +-180 map to the same cell
    assert cells[1] == cells[2]


def test_nan_maps_to_invalid():
    cells = s2.lonlat_to_cell(np.array([np.nan, 10.0]), np.array([10.0, np.nan]), 12)
    assert (cells == 0).all()


def test_locality_same_parent():
    # two points ~100 m apart share a level-10 parent almost always; verify
    # on a deterministic sample away from cell boundaries via center nudging
    rng = np.random.RandomState(11)
    lon = rng.uniform(-170, 170, 2000)
    lat = rng.uniform(-80, 80, 2000)
    c = s2.lonlat_to_cell(lon, lat, 10)
    clon, clat = s2.cell_center_lonlat(c)
    c2 = s2.lonlat_to_cell(clon + 1e-7, clat + 1e-7, 10)
    assert (c == c2).all()
