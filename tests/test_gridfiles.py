"""Real grid-file readers (NTv2 / GTX / CTable2) against the reference's
shipped test grids (reference data/tests/*; formats per src/grids.cpp)."""

import os

import numpy as np
import pytest

from proj_spark.gridfiles import (FileGrid, GridSet, load_grid_file,
                                  parse_ctable2, parse_gtx, parse_ntv2)

REF = "/root/reference/data/tests"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference test grids unavailable")


def _read(name):
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


def test_ntv2_endianness_equivalence():
    """The same raster shipped little- and big-endian must parse
    identically (reference NTv2 endianness sniff, grids.cpp:2200)."""
    le = parse_ntv2(_read("test_hgrid_little_endian.gsb"), "le")
    be = parse_ntv2(_read("test_hgrid_big_endian.gsb"), "be")
    gl, gb = le.grids[0], be.grids[0]
    assert gl.width == gb.width and gl.height == gb.height
    np.testing.assert_array_equal(gl.dlon_as, gb.dlon_as)
    np.testing.assert_array_equal(gl.dlat_as, gb.dlat_as)


def test_ntv2_subgrid_priority():
    """ntv2_0_downsampled has nested subgrids; children are probed first
    (reference picks the deepest matching subgrid)."""
    gs = parse_ntv2(_read("ntv2_0_downsampled.gsb"), "ntv2_0")
    assert isinstance(gs, GridSet) and len(gs.grids) == 7
    spans = [g.dlon * (g.width - 1) * g.dlat * (g.height - 1)
             for g in gs.grids]
    # ntv2_0 = 3 nested children + 4 regional parents (CAeast/west/
    # north/arctic); every child must be probed before any parent
    assert max(spans[:3]) < min(spans[3:])
    # a point inside the ONwinsor child resolves to the child, not CAeast
    assert gs.grids[0].contains(-82.5, 42.0)


def test_gtx_header_and_values():
    g = parse_gtx(_read("egm96_15_downsampled.gtx"), "egm96")
    assert (g.width, g.height) == (360, 180)
    assert g.global_lon
    # gie more_builtins.gie:242-254: N(12.5,55.5) = 36.394090697
    _, _, dz = g.interp(np.array([12.5]), np.array([55.5]))
    assert abs(dz[0] - 36.394090697) < 1e-6
    # antimeridian wrap: -180.1 == 179.9
    _, _, a = g.interp(np.array([-180.1]), np.array([0.0]))
    _, _, b = g.interp(np.array([179.9]), np.array([0.0]))
    assert a[0] == b[0]


def test_ctable2_parse():
    g = load_grid_file("conus") if os.environ.get("PROJ_SPARK_GRID_PATH") \
        else parse_ctable2(_read("conus"), "conus")
    if isinstance(g, GridSet):
        g = g.grids[0]
    assert isinstance(g, FileGrid)
    # conus: NAD27->NAD83, coverage of the lower 48
    assert g.lon0 < -124 and g.lat0 < 25
    dlon, dlat, _ = g.interp(np.array([-100.0]), np.array([40.0]))
    # shifts are sub-arcsecond-to-arcsecond scale over conus
    assert np.isfinite(dlon[0]) and abs(dlon[0]) < 10 and abs(dlat[0]) < 10


def test_nodata_renormalized_bilinear():
    """Nodata corners excluded + weights renormalized (grids.cpp
    read_vgrid_value:3687-3745; gie 4D-API_cs2cs-style.gie:446-462)."""
    g = parse_gtx(_read("test_nodata.gtx"), "nodata")
    _, _, dz = g.interp(np.array([4.05]), np.array([52.1]))
    assert abs(dz[0] - 10.0) < 1e-12
    # fully-nodata neighborhood -> NaN
    _, _, dz = g.interp(np.array([4.01]), np.array([52.31]))
    assert np.isnan(dz[0])


def test_grid_set_first_match_wins():
    a = FileGrid("a", 0, 0, 1, 1, 3, 3,
                 dz_m=np.full((3, 3), 5.0))
    b = FileGrid("b", -10, -10, 10, 10, 3, 3,
                 dz_m=np.full((3, 3), 9.0))
    gs = GridSet("ab", [a, b])
    _, _, dz = gs.interp(np.array([1.0, -5.0]), np.array([1.0, -5.0]))
    assert dz[0] == 5.0 and dz[1] == 9.0


def test_empty_grid_set_is_passthrough():
    import proj_spark
    op = proj_spark.create(
        "+proj=hgridshift +grids=@no_such_a.gsb,@no_such_b.gsb")
    x, y, z, t = op.apply("forward", np.array([0.1]), np.array([0.5]),
                          np.array([7.0]), np.array([np.nan]))
    assert x[0] == 0.1 and y[0] == 0.5 and z[0] == 7.0


def test_missing_required_grid_raises():
    # grids open eagerly at construction like proj_create without
    # defer_grid_opening (hgridshift.cpp:185-206)
    import proj_spark
    from proj_spark.errors import errno_of_exception
    with pytest.raises((KeyError, ValueError)) as ei:
        proj_spark.create("+proj=hgridshift +grids=no_such.gsb")
    assert errno_of_exception(ei.value) == \
        "invalid_op_file_not_found_or_invalid"


def test_ntv1_matches_reference_cs2cs_golden():
    """ntv1_can.dat through the NAD27 grid list reproduces the reference's
    own cs2cs golden outputs (test/cli/test_cs2cs_datumfile.yaml:8-15):
    44N routes through ntv1 (it covers Canada+border), 39N through conus."""
    import proj_spark
    if not os.path.isfile(
            "/root/reference/data/tests/ntv1_can.dat"):  # pragma: no cover
        pytest.skip("reference data not present")
    op = proj_spark.create("+proj=hgridshift +grids=ntv1_can.dat,conus")
    d = np.pi / 180.0
    x = np.array([-111.0, -111.0]) * d
    y = np.array([44.0, 39.0]) * d
    gx, gy, _, _ = op.fwd(x, y)
    want = np.array([
        [-(111 + 3.208 / 3600.0), 43 + 59 / 60.0 + 59.732 / 3600.0],
        [-(111 + 2.604 / 3600.0), 38 + 59 / 60.0 + 59.912 / 3600.0],
    ]) * d
    # cs2cs prints 0.001" resolution -> half-ulp 0.0005" (~1.5 cm);
    # allow 0.0015" for rounding across the chain
    tol = 0.0015 / 3600.0 * d
    assert np.allclose(gx, want[:, 0], atol=tol)
    assert np.allclose(gy, want[:, 1], atol=tol)
