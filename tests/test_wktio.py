"""WKT2/WKT1/PROJJSON io (proj_spark/wktio.py; reference
src/iso19111/io.cpp WKTFormatter/WKTParser/JSONFormatter subset).

Checks three layers:
 1. round-trip: proj-string -> WKT2/PROJJSON -> proj-string gives a
    NUMERICALLY identical operator (same fwd output, not just same text);
 2. parsing PROJ-canonical external WKT (WKT1 GDAL and WKT2 fixtures from
    the reference's own unit tests, test_crs.cpp) including unit and
    datum-shift semantics;
 3. integration: create() / create_crs_to_crs() accept WKT and PROJJSON
    directly.
"""

import json

import numpy as np
import pytest

import proj_spark
from proj_spark import wktio
from proj_spark.crs import create_crs_to_crs

ROUNDTRIP_DEFS = [
    "+proj=longlat +ellps=GRS80",
    "+proj=longlat +ellps=bessel +pm=paris",
    "+proj=utm +zone=32 +ellps=WGS84",
    "+proj=utm +zone=33 +south +ellps=WGS84",
    "+proj=merc +lat_ts=20 +ellps=WGS84",
    "+proj=webmerc +ellps=WGS84",
    "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
    "+y_0=6600000 +ellps=GRS80",
    "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +ellps=GRS80",
    "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
    "+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84",
    "+proj=stere +lat_0=90 +lat_ts=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
    "+ellps=WGS84",
    "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
    "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
    "+proj=eqc +lat_ts=30 +ellps=WGS84",
    "+proj=cass +lat_0=4 +lon_0=102 +ellps=evrst30",
    "+proj=moll +lon_0=10 +ellps=WGS84",
    "+proj=robin +lon_0=0 +ellps=WGS84",
    "+proj=poly +lat_0=30 +lon_0=-80 +ellps=clrk66",
    "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
    "+y_0=-100000 +ellps=airy "
    "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894",
    "+proj=longlat +ellps=GRS80 +towgs84=1,2,3",
]


def _same_fwd(d1: str, d2: str, geographic: bool):
    """Operators from both definitions produce identical coordinates."""
    op1, op2 = proj_spark.create(d1), proj_spark.create(d2)
    lam = np.radians(np.array([-20.0, 3.0, 15.5, 101.0]))
    phi = np.radians(np.array([-35.0, 12.25, 47.0, 5.0]))
    r1 = op1.fwd(lam.copy(), phi.copy())
    r2 = op2.fwd(lam.copy(), phi.copy())
    # rtol covers evaluation-order noise between equivalent operator
    # paths (e.g. +proj=utm vs its expanded tmerc parameters): ~2e-15
    # relative at y_0 = 10^7 m is ~2e-9 m absolute
    for a, b in zip(r1[:2], r2[:2]):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("defn", ROUNDTRIP_DEFS)
def test_wkt2_roundtrip_numeric(defn):
    rt = wktio.from_wkt(wktio.to_wkt2(defn))
    _same_fwd(defn, rt, "longlat" in defn)


@pytest.mark.parametrize("defn", ROUNDTRIP_DEFS)
def test_projjson_roundtrip_numeric(defn):
    j = wktio.to_projjson(defn)
    json.dumps(j)  # must be serializable
    if "towgs84" in defn and "longlat" not in defn or "towgs84" in defn:
        rt = wktio.from_projjson(json.dumps(j))
    else:
        rt = wktio.from_projjson(j)
    _same_fwd(defn, rt, "longlat" in defn)


def test_towgs84_survives_wkt2():
    d = ("+proj=longlat +ellps=airy "
         "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    rt = wktio.from_wkt(wktio.to_wkt2(d))
    assert "towgs84=" in rt
    vals = [float(v) for v in rt.split("towgs84=")[1].split()[0].split(",")]
    np.testing.assert_allclose(
        vals, [446.448, -125.157, 542.06, 0.1502, 0.247, 0.8421, -20.4894],
        atol=1e-6)


# PROJ-canonical WKT1 (GDAL flavor) from the reference's unit tests
# (test/unit/test_crs.cpp:1078 — NAD83 / Arizona East (ft), EPSG:2222)
_WKT1_AZ_EAST_FT = """PROJCS["NAD83 / Arizona East (ft)",
    GEOGCS["NAD83",
        DATUM["North_American_Datum_1983",
            SPHEROID["GRS 1980",6378137,298.257222101]],
        PRIMEM["Greenwich",0, AUTHORITY["EPSG","8901"]],
        UNIT["degree",0.0174532925199433, AUTHORITY["EPSG","9122"]]],
    PROJECTION["Transverse_Mercator"],
    PARAMETER["latitude_of_origin",31],
    PARAMETER["central_meridian",-110.166666666667],
    PARAMETER["scale_factor",0.9999],
    PARAMETER["false_easting",700000],
    PARAMETER["false_northing",0],
    UNIT["foot",0.3048],
    AXIS["Easting",EAST],
    AXIS["Northing",NORTH],
    AUTHORITY["EPSG","2222"]]"""


def test_wkt1_gdal_parse_units():
    p = wktio.from_wkt(_WKT1_AZ_EAST_FT)
    # false easting is in the PROJCS unit (foot): 700000 ft = 213360 m
    assert "+x_0=213360" in p
    assert "+units=ft" in p
    assert "+proj=tmerc" in p and "+ellps=GRS80" in p


def test_wkt2_cs_unit_differs_from_param_unit():
    # reference test_crs.cpp "projected_with_parameter_unit_different_
    # than_cs_unit_as_WKT1": metre parameters, US-survey-foot CS
    wkt = """PROJCRS["unknown",
        BASEGEODCRS["unknown",
            DATUM["Unknown based on GRS80 ellipsoid",
                ELLIPSOID["GRS 1980",6378137,298.257222101,
                    LENGTHUNIT["metre",1]]],
            PRIMEM["Greenwich",0]],
        CONVERSION["UTM zone 32N",
            METHOD["Transverse Mercator"],
            PARAMETER["Latitude of natural origin",0],
            PARAMETER["Longitude of natural origin",9],
            PARAMETER["Scale factor at natural origin",0.9996],
            PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],
            PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],
        CS[Cartesian,2],
            AXIS["(E)",east],
            AXIS["(N)",north],
        LENGTHUNIT["US survey foot",0.304800609601219]]"""
    p = wktio.from_wkt(wkt)
    assert "+x_0=500000" in p          # explicit metre unit wins
    assert "+units=us-ft" in p


def test_create_accepts_wkt_and_projjson():
    wkt = wktio.to_wkt2("+proj=utm +zone=32 +ellps=WGS84")
    pj = json.dumps(wktio.to_projjson("+proj=utm +zone=32 +ellps=WGS84"))
    lam = np.radians(np.array([12.0]))
    phi = np.radians(np.array([55.0]))
    ref = proj_spark.create("+proj=utm +zone=32 +ellps=WGS84").fwd(
        lam.copy(), phi.copy())
    for d in (wkt, pj):
        got = proj_spark.create(d).fwd(lam.copy(), phi.copy())
        np.testing.assert_allclose(got[0], ref[0], atol=1e-9)
        np.testing.assert_allclose(got[1], ref[1], atol=1e-9)


def test_crs_to_crs_accepts_wkt():
    # OSGB36 via WKT (with towgs84 in a BOUNDCRS) -> WGS84 UTM
    wkt = wktio.to_wkt2(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
        "+y_0=-100000 +ellps=airy "
        "+towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    p_wkt = create_crs_to_crs(wkt, "EPSG:4326")
    p_str = create_crs_to_crs("EPSG:27700", "EPSG:4326")
    x = np.array([400000.0])
    y = np.array([-100000.0])
    r1 = p_wkt.fwd(x.copy(), y.copy())
    r2 = p_str.fwd(x.copy(), y.copy())
    np.testing.assert_allclose(r1[0], r2[0], atol=1e-12)
    np.testing.assert_allclose(r1[1], r2[1], atol=1e-12)


def test_epsg_export_matches_code():
    # EPSG:32632 exported to WKT2 and re-imported == the original op
    wkt = wktio.to_wkt2("EPSG:32632")
    _same_fwd("EPSG:32632", wktio.from_wkt(wkt), False)
    j = wktio.to_projjson("EPSG:2154")
    _same_fwd("EPSG:2154", wktio.from_projjson(j), False)


def test_wkt_parse_tolerates_id_usage_noise():
    wkt = ('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
           'ELLIPSOID["WGS 84",6378137,298.257223563,'
           'LENGTHUNIT["metre",1]]],'
           'PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],'
           'CS[ellipsoidal,2],'
           'AXIS["geodetic latitude (Lat)",north,ORDER[1],'
           'ANGLEUNIT["degree",0.0174532925199433]],'
           'AXIS["geodetic longitude (Lon)",east,ORDER[2],'
           'ANGLEUNIT["degree",0.0174532925199433]],'
           'USAGE[SCOPE["Horizontal component of 3D system."],'
           'AREA["World."],BBOX[-90,-180,90,180]],ID["EPSG",4326]]')
    p = wktio.from_wkt(wkt)
    assert "+proj=longlat" in p and "+ellps=WGS84" in p


# --- ESRI WKT1 dialect + compound CRS (round-3: SURVEY §2 "WKT breadth") ---

_ESRI_WEBMERC = (
    'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Mercator_Auxiliary_Sphere"],'
    'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
    'PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",0.0],'
    'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]')

_ESRI_UTM = (
    'PROJCS["WGS_1984_UTM_Zone_32N",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
    'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",9.0],'
    'PARAMETER["Scale_Factor",0.9996],PARAMETER["Latitude_Of_Origin",0.0],'
    'UNIT["Meter",1.0]]')

_COMPD = (
    'COMPD_CS["OSGB + ODN",PROJCS["British National Grid",'
    'GEOGCS["OSGB 1936",DATUM["OSGB_1936",'
    'SPHEROID["Airy 1830",6377563.396,299.3249646]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],'
    'PARAMETER["scale_factor",0.9996012717],'
    'PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],'
    'UNIT["metre",1]],VERT_CS["ODN height",'
    'VERT_DATUM["Ordnance Datum Newlyn",2005],UNIT["metre",1]]]')


def test_esri_webmerc_parses_and_projects():
    """ESRI's Mercator_Auxiliary_Sphere is spherical web mercator
    (io.cpp ESRI method mapping); Standard_Parallel_1 maps to lat_ts and
    the Auxiliary_Sphere_Type marker parameter is dropped."""
    import proj_spark
    s = wktio.from_wkt(_ESRI_WEBMERC)
    assert s.startswith("+proj=webmerc")
    op = proj_spark.create(_ESRI_WEBMERC)
    x, y, _, _ = op.fwd(np.radians([12.0]), np.radians([55.0]))
    assert abs(x[0] - 1335833.8895) < 1e-3
    assert abs(y[0] - 7361866.1131) < 1e-3


def test_esri_utm_matches_plain_utm():
    import proj_spark
    esri = proj_spark.create(_ESRI_UTM)
    plain = proj_spark.create("+proj=utm +zone=32 +ellps=WGS84")
    lam = np.radians([9.5, 7.0])
    phi = np.radians([55.0, 48.0])
    xe, ye, _, _ = esri.fwd(lam, phi)
    xp, yp, _, _ = plain.fwd(lam, phi)
    assert np.allclose(xe, xp, atol=1e-6) and np.allclose(ye, yp, atol=1e-6)


def test_compound_crs_takes_horizontal_member():
    import proj_spark
    s = wktio.from_wkt(_COMPD)
    assert s.startswith("+proj=tmerc")
    op = proj_spark.create(_COMPD)
    x, y, _, _ = op.fwd(np.radians([-2.0]), np.radians([53.0]))
    assert abs(x[0] - 400000.0) < 1e-6  # central meridian
    assert 340000 < y[0] < 350000
