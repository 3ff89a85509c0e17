"""Vertical/compound CRS->CRS planning (r3 VERDICT item 2): the
'EPSG:hhhh+vvvv' compound syntax composes a geoid vgridshift leg around
the horizontal plan, mirroring the reference's generated
`+proj=vgridshift +grids=us_nga_egm96_15.tif +multiplier=1` pipelines
(coordinateoperationfactory.cpp compound handling;
test/unit/test_operationfactory.cpp compoundCRS_to_* cases).
"""

import os

import numpy as np
import pytest

import proj_spark
from proj_spark.crs import (VERTICAL_CRS, _split_compound,
                            create_crs_to_crs)
from proj_spark.gridfiles import register_grid_file

D = np.pi / 180.0
GTX = "/root/reference/data/tests/egm96_15_downsampled.gtx"

pytestmark = pytest.mark.skipif(not os.path.isfile(GTX),
                                reason="egm96 test grid not present")


@pytest.fixture(autouse=True)
def _register_egm96():
    register_grid_file("egm96_15.gtx", GTX)


def test_split_compound_syntax():
    assert _split_compound("EPSG:4326+5773") == (4326, 5773)
    assert _split_compound("epsg:4258+5773") == (4258, 5773)
    assert _split_compound("EPSG:4326") is None
    assert _split_compound("+proj=longlat") is None


def test_compound_to_3d_plan_shape():
    """4326+5773 -> 4979: horizontal is identity (4979 demotes to 4326),
    so the plan is exactly one forward vgridshift (the reference pipeline
    minus axisswap/unitconvert, which our lon/lat-radian convention
    absorbs)."""
    p = create_crs_to_crs("EPSG:4326+5773", "EPSG:4979")
    assert len(p.steps) == 1
    op, d = p.steps[0]
    assert op.name == "vgridshift" and d == "forward"
    assert op.multiplier == 1.0


def test_3d_to_compound_plan_is_inverse_leg():
    p = create_crs_to_crs("EPSG:4979", "EPSG:4326+5773")
    assert len(p.steps) == 1
    op, d = p.steps[0]
    assert op.name == "vgridshift" and d == "inverse"


def test_geoid_values_and_roundtrip():
    lon = np.array([12.0, -70.0, 100.0]) * D
    lat = np.array([55.0, -30.0, 10.0]) * D
    H = np.array([100.0, 0.0, -25.0])
    t = np.zeros(3)
    p = create_crs_to_crs("EPSG:4326+5773", "EPSG:4979")
    x, y, z, _ = p.apply("forward", lon, lat, H, t)
    N = z - H
    # EGM96 undulation is globally within [-110, +90] m and nonzero
    assert np.all(np.abs(N) < 110) and np.all(np.abs(N) > 1e-3)
    # horizontal untouched
    assert np.allclose(x, lon) and np.allclose(y, lat)
    xi, yi, zi, _ = p.apply("inverse", x, y, z, t)
    assert np.allclose(zi, H, atol=1e-9)


def test_same_vertical_both_sides_is_noop():
    p = create_crs_to_crs("EPSG:4326+5773", "EPSG:4326+5773")
    lon, lat = np.array([12.0 * D]), np.array([55.0 * D])
    H, t = np.array([123.0]), np.zeros(1)
    _, _, z, _ = p.apply("forward", lon, lat, H, t)
    assert z[0] == 123.0


def test_compound_with_datum_shift_composes_horizontal_leg():
    """ED50+EGM96 -> WGS84 3D: geoid leg FIRST (at source position), then
    the ED50->WGS84 datum legs — the reference's compound-to-geog3D
    ordering."""
    p = create_crs_to_crs("EPSG:4230+5773", "EPSG:4979")
    names = [op.name for op, _ in p.steps]
    assert names[0] == "vgridshift"
    assert "helmert" in names
    lon, lat = np.array([12.0 * D]), np.array([48.0 * D])
    H, t = np.array([500.0]), np.zeros(1)
    x, y, z, _ = p.apply("forward", lon, lat, H, t)
    # ED50->WGS84 moves the horizontal by ~100-200 m
    d_m = np.hypot((x - lon) * 6.4e6 * np.cos(lat), (y - lat) * 6.4e6)
    assert 50 < d_m[0] < 300
    assert abs((z[0] - H[0])) < 110  # geoid component bounded


def test_unsupported_vertical_code_raises():
    with pytest.raises(KeyError):
        create_crs_to_crs("EPSG:4326+9999", "EPSG:4979")


def test_unresolvable_geoid_grid_raises():
    # NAVD88 is in the table but its grid is not shipped/registered
    assert 5703 in VERTICAL_CRS
    with pytest.raises(KeyError, match="no geoid grid"):
        create_crs_to_crs("EPSG:4326+5703", "EPSG:4979")


def test_public_api_entry():
    # the package-level create_crs_to_crs routes compound too
    p = proj_spark.create_crs_to_crs("EPSG:4326+5773", "EPSG:4979")
    assert p.has_inverse
