"""WKT2 / WKT1 / PROJJSON import-export for CRS definitions.

A pragmatic re-expression of the reference's io layer
(src/iso19111/io.cpp — WKTFormatter/WKTParser/JSONFormatter, 12.8k LoC):
the subset every interop user hits — geographic and projected CRS over the
common conversion methods, ball-park datum shifts via BOUNDCRS/TOWGS84 —
mapped to/from the engine's proj-string params. Grammar reference:
OGC 18-010r7 (WKT2:2019) and the WKT1 (ESRI/GDAL) legacy keywords.

Exports are WKT2:2019; the parser accepts WKT2:2015/2019 and classic WKT1
(GEOGCS/PROJCS/SPHEROID/TOWGS84), matching parameters by EPSG code when an
ID node is present, else by normalized name.
"""

from __future__ import annotations

import json
import re

from .kernels.core import _ELLPS_TABLE

_DEG = 0.0174532925199433  # degree -> radian (WKT2 canonical literal)

# ---------------------------------------------------------------------------
# method / parameter tables
# ---------------------------------------------------------------------------

# EPSG parameter ids
_P_LAT_NAT = ("Latitude of natural origin", 8801, "angle", "lat_0")
_P_LON_NAT = ("Longitude of natural origin", 8802, "angle", "lon_0")
_P_K_NAT = ("Scale factor at natural origin", 8805, "scale", "k")
_P_FE = ("False easting", 8806, "length", "x_0")
_P_FN = ("False northing", 8807, "length", "y_0")
_P_LAT_FO = ("Latitude of false origin", 8821, "angle", "lat_0")
_P_LON_FO = ("Longitude of false origin", 8822, "angle", "lon_0")
_P_SP1 = ("Latitude of 1st standard parallel", 8823, "angle", "lat_1")
_P_SP2 = ("Latitude of 2nd standard parallel", 8824, "angle", "lat_2")
_P_FE_FO = ("Easting at false origin", 8826, "length", "x_0")
_P_FN_FO = ("Northing at false origin", 8827, "length", "y_0")
_P_LAT_TS = ("Latitude of 1st standard parallel", 8823, "angle", "lat_ts")
_P_LAT_PC = ("Latitude of projection centre", 8811, "angle", "lat_0")
_P_LON_PC = ("Longitude of projection centre", 8812, "angle", "lonc")
_P_AZI = ("Azimuth at projection centre", 8813, "angle", "alpha")
_P_GAMMA = ("Angle from Rectified to Skew Grid", 8814, "angle", "gamma")
_P_K_PC = ("Scale factor at projection centre", 8815, "scale", "k")
_P_LAT_PS = ("Latitude of pseudo standard parallel", 8818, "angle", "lat_ts")
_P_COLAT = ("Co-latitude of cone axis", 1036, "angle", "alpha")

# proj name -> (WKT2 method name, EPSG method code, param specs)
METHODS = {
    "tmerc": ("Transverse Mercator", 9807,
              [_P_LAT_NAT, _P_LON_NAT, _P_K_NAT, _P_FE, _P_FN]),
    "merc": ("Mercator (variant B)", 9805,
             [_P_LAT_TS, _P_LON_NAT, _P_FE, _P_FN]),
    "webmerc": ("Popular Visualisation Pseudo Mercator", 1024,
                [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "lcc": ("Lambert Conic Conformal (2SP)", 9802,
            [_P_LAT_FO, _P_LON_FO, _P_SP1, _P_SP2, _P_FE_FO, _P_FN_FO]),
    "aea": ("Albers Equal Area", 9822,
            [_P_LAT_FO, _P_LON_FO, _P_SP1, _P_SP2, _P_FE_FO, _P_FN_FO]),
    "laea": ("Lambert Azimuthal Equal Area", 9820,
             [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "aeqd": ("Azimuthal Equidistant", 1125,
             [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "stere": ("Polar Stereographic (variant A)", 9810,
              [_P_LAT_NAT, _P_LON_NAT, _P_K_NAT, _P_FE, _P_FN]),
    "sterea": ("Oblique Stereographic", 9809,
               [_P_LAT_NAT, _P_LON_NAT, _P_K_NAT, _P_FE, _P_FN]),
    "eqc": ("Equidistant Cylindrical", 1028,
            [_P_LAT_TS, _P_LON_NAT, _P_FE, _P_FN]),
    "cass": ("Cassini-Soldner", 9806,
             [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "omerc": ("Hotine Oblique Mercator (variant B)", 9815,
              [_P_LAT_PC, _P_LON_PC, _P_AZI, _P_GAMMA, _P_K_PC,
               _P_FE_FO, _P_FN_FO]),
    "krovak": ("Krovak", 9819,
               [_P_LAT_PC, ("Longitude of origin", 8833, "angle", "lon_0"),
                _P_COLAT, _P_LAT_PS,
                ("Scale factor on pseudo standard parallel", 8819, "scale",
                 "k"), _P_FE, _P_FN]),
    # methods without EPSG codes: exported by name only
    "moll": ("Mollweide", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "robin": ("Robinson", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "sinu": ("Sinusoidal", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "eck4": ("Eckert IV", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "mill": ("Miller Cylindrical", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "vandg": ("Van Der Grinten", None, [_P_LON_NAT, _P_FE, _P_FN]),
    "gnom": ("Gnomonic", None, [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "ortho": ("Orthographic", 9840, [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "poly": ("American Polyconic", 9818,
             [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
    "nzmg": ("New Zealand Map Grid", 9811,
             [_P_LAT_NAT, _P_LON_NAT, _P_FE, _P_FN]),
}

# WKT1 / ESRI-style projection names -> proj name
_WKT1_PROJECTIONS = {
    "transversemercator": "tmerc",
    "mercator": "merc", "mercator1sp": "merc", "mercator2sp": "merc",
    "lambertconformalconic": "lcc", "lambertconformalconic2sp": "lcc",
    "lambertconformalconic1sp": "lcc",
    "albers": "aea", "albersconicequalarea": "aea",
    "lambertazimuthalequalarea": "laea",
    "azimuthalequidistant": "aeqd",
    "polarstereographic": "stere", "stereographic": "stere",
    "obliquestereographic": "sterea",
    "equirectangular": "eqc", "equidistantcylindrical": "eqc",
    "cassinisoldner": "cass", "cassini": "cass",
    "hotineobliquemercator": "omerc",
    "krovak": "krovak", "mollweide": "moll", "robinson": "robin",
    "sinusoidal": "sinu", "orthographic": "ortho", "polyconic": "poly",
    "newzealandmapgrid": "nzmg", "gnomonic": "gnom",
    "millercylindrical": "mill", "vandergrinten": "vandg",
    # ESRI WKT1 dialect method names (io.cpp esriToWkt2 mappings)
    "mercatorauxiliarysphere": "webmerc",
    "gausskruger": "tmerc",
    "platecarree": "eqc",
    "equidistantconic": "eqdc",
    "winkeltripel": "wintri",
    "eckertiv": "eck4", "eckertvi": "eck6",
    "gallstereographic": "gall",
    "bonne": "bonne",
    "twopointequidistant": "tpeqd",
    "cylindricalequalarea": "cea",
    "lambertazimuthalequalarea": "laea",
    "aitoff": "aitoff", "hammeraitoff": "hammer",
    "quarticauthalic": "qua_aut",
    "loximuthal": "loxim", "craster": "crast",
}

# WKT1 parameter names -> canonical proj param (method-independent)
_WKT1_PARAMS = {
    "latitudeoforigin": "lat_0", "centralmeridian": "lon_0",
    "scalefactor": "k", "falseeasting": "x_0", "falsenorthing": "y_0",
    "standardparallel1": "lat_1", "standardparallel2": "lat_2",
    "longitudeofcenter": "lonc", "latitudeofcenter": "lat_0",
    "azimuth": "alpha", "rectifiedgridangle": "gamma",
    "pseudostandardparallel1": "lat_ts",
}

_DATUM_NAMES = {
    "WGS84": "World Geodetic System 1984",
    "GGRS87": "Greek Geodetic Reference System 1987",
    "NAD83": "North American Datum 1983",
    "NAD27": "North American Datum 1927",
    "potsdam": "Deutsches Hauptdreiecksnetz",
    "carthage": "Carthage",
    "hermannskogel": "Militar-Geographische Institut",
    "ire65": "TM65",
    "nzgd49": "New Zealand Geodetic Datum 1949",
    "OSGB36": "Ordnance Survey of Great Britain 1936",
}

_LENGTH_UNITS = {"m": ("metre", 1.0), "ft": ("foot", 0.3048),
                 "us-ft": ("US survey foot", 0.304800609601219),
                 "km": ("kilometre", 1000.0)}


def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]", "", name.lower())


def _num(v: float) -> str:
    """Shortest exact decimal for a float (WKT number formatting)."""
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _resolve_ell_name(p: dict):
    """(display_name, a, rf, ellps_key) from proj params."""
    from .kernels.core import DATUM_TABLE
    ellps = p.get("ellps")
    if ellps is None and "datum" in p and p["datum"] in DATUM_TABLE:
        ellps = DATUM_TABLE[p["datum"]][0]
    if "a" in p:
        a = float(p["a"])
        if "rf" in p:
            rf = float(p["rf"])
        elif "b" in p:
            b = float(p["b"])
            rf = a / (a - b) if a != b else 0.0
        elif "f" in p:
            rf = 1.0 / float(p["f"]) if float(p["f"]) else 0.0
        else:
            rf = 0.0
        return ("unknown", a, rf, None)
    if "R" in p:
        return ("unknown", float(p["R"]), 0.0, None)
    ellps = str(ellps or "WGS84")
    row = _ELLPS_TABLE[ellps]
    a = row[0]
    rf = row[1] if row[1] else (a / (a - row[2]) if row[2] and row[2] != a
                                else 0.0)
    return (ellps, a, rf, ellps)


def _ellipsoid_wkt(p: dict) -> str:
    name, a, rf, _ = _resolve_ell_name(p)
    disp = {"WGS84": "WGS 84", "GRS80": "GRS 1980", "intl": "International "
            "1924", "bessel": "Bessel 1841", "clrk66": "Clarke 1866",
            "airy": "Airy 1830", "krass": "Krassowsky 1940"}.get(name, name)
    return (f'ELLIPSOID["{disp}",{_num(a)},{_num(rf)},'
            f'LENGTHUNIT["metre",1]]')


def _datum_wkt(p: dict) -> str:
    dn = p.get("datum")
    name = _DATUM_NAMES.get(str(dn), None) if dn else None
    if name is None:
        ell = _resolve_ell_name(p)[0]
        name = f"Unknown based on {ell} ellipsoid" if ell != "unknown" \
            else "unknown"
    return f'DATUM["{name}",{_ellipsoid_wkt(p)}]'


def _primem_wkt(p: dict) -> str:
    pm = p.get("pm")
    if pm is None:
        return f'PRIMEM["Greenwich",0,ANGLEUNIT["degree",{_DEG}]]'
    from .ops import PRIME_MERIDIANS, parse_angle
    name = str(pm)
    if name in PRIME_MERIDIANS:
        deg = parse_angle(PRIME_MERIDIANS[name])
        disp = name.capitalize()
    else:
        deg = parse_angle(name)
        disp = "unknown"
    return f'PRIMEM["{disp}",{_num(deg)},ANGLEUNIT["degree",{_DEG}]]'


def _geog_cs_wkt() -> str:
    return (f'CS[ellipsoidal,2],'
            f'AXIS["geodetic latitude (Lat)",north,ORDER[1],'
            f'ANGLEUNIT["degree",{_DEG}]],'
            f'AXIS["geodetic longitude (Lon)",east,ORDER[2],'
            f'ANGLEUNIT["degree",{_DEG}]]')


def _geogcrs_wkt(p: dict, name: str, keyword: str = "GEOGCRS") -> str:
    return (f'{keyword}["{name}",{_datum_wkt(p)},{_primem_wkt(p)},'
            f'{_geog_cs_wkt()}]')


def _expand_utm(p: dict) -> dict:
    q = {k: v for k, v in p.items() if k not in ("zone", "south")}
    q["proj"] = "tmerc"
    q.setdefault("lat_0", 0)
    q["lon_0"] = int(p["zone"]) * 6 - 183
    q.setdefault("k", 0.9996)
    q["x_0"] = 500000
    q["y_0"] = 10000000 if "south" in p else 0
    return q


def _angle_value(p: dict, key) -> float:
    from .ops import parse_angle
    return parse_angle(p.get(key, 0))


def _conversion_wkt(p: dict) -> str:
    proj = str(p["proj"])
    mname, mcode, specs = METHODS[proj]
    mid = f',ID["EPSG",{mcode}]' if mcode else ""
    parts = [f'CONVERSION["unknown",METHOD["{mname}"{mid}]']
    for wname, wcode, kind, pkey in specs:
        if kind == "angle":
            v = _angle_value(p, pkey)
            unit = f'ANGLEUNIT["degree",{_DEG}]'
        elif kind == "scale":
            v = float(p.get(pkey, p.get("k_0", 1.0)))
            unit = 'SCALEUNIT["unity",1]'
        else:
            v = float(p.get(pkey, 0))
            unit = 'LENGTHUNIT["metre",1]'
        pid = f',ID["EPSG",{wcode}]' if wcode else ""
        parts.append(f'PARAMETER["{wname}",{_num(v)},{unit}{pid}]')
    return ",".join(parts) + "]"


def _proj_cs_wkt(p: dict) -> str:
    u = str(p.get("units", "m"))
    uname, ufac = _LENGTH_UNITS.get(u, ("metre", 1.0))
    if "to_meter" in p:
        uname, ufac = "unknown", float(p["to_meter"])
    unit = f'LENGTHUNIT["{uname}",{_num(ufac)}]'
    return (f'CS[Cartesian,2],'
            f'AXIS["(E)",east,ORDER[1],{unit}],'
            f'AXIS["(N)",north,ORDER[2],{unit}]')


def _towgs84_wkt(inner: str, tw: tuple, name: str) -> str:
    vals = list(tw) + [0.0] * (7 - len(tw))
    params = [
        ("X-axis translation", vals[0], 'LENGTHUNIT["metre",1]', 8605),
        ("Y-axis translation", vals[1], 'LENGTHUNIT["metre",1]', 8606),
        ("Z-axis translation", vals[2], 'LENGTHUNIT["metre",1]', 8607),
    ]
    if len(tw) > 3:
        params += [
            ("X-axis rotation", vals[3], f'ANGLEUNIT["arc-second",'
             f'{_DEG / 3600}]', 8608),
            ("Y-axis rotation", vals[4], f'ANGLEUNIT["arc-second",'
             f'{_DEG / 3600}]', 8609),
            ("Z-axis rotation", vals[5], f'ANGLEUNIT["arc-second",'
             f'{_DEG / 3600}]', 8610),
            # abridged form: scale difference carried as the M ratio
            ("Scale difference", 1.0 + vals[6] * 1e-6,
             'SCALEUNIT["unity",1]', 8611),
        ]
        method = 'METHOD["Position Vector transformation (geog2D domain)"' \
                 ',ID["EPSG",9606]]'
    else:
        method = 'METHOD["Geocentric translations (geog2D domain)"' \
                 ',ID["EPSG",9603]]'
    ps = ",".join(f'PARAMETER["{n}",{_num(v)},{u},ID["EPSG",{c}]]'
                  for n, v, u, c in params)
    wgs = ('GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
           'ELLIPSOID["WGS 84",6378137,298.257223563,'
           'LENGTHUNIT["metre",1]]],'
           f'PRIMEM["Greenwich",0,ANGLEUNIT["degree",{_DEG}]],'
           f'{_geog_cs_wkt()}]')
    return (f'BOUNDCRS[SOURCECRS[{inner}],TARGETCRS[{wgs}],'
            f'ABRIDGEDTRANSFORMATION["Transformation from {name} to WGS84",'
            f'{method},{ps}]]')


def to_wkt2(defn: str, name: str | None = None) -> str:
    """proj-string (or EPSG:xxxx) -> WKT2:2019 string.

    Single-step CRS-style definitions only (longlat family or a projection
    with a registered method); +towgs84 wraps the result in a BOUNDCRS the
    way the reference exports cs2cs-style datum info (io.cpp
    WKTFormatter::setUseBoundCRS)."""
    from .crs import parse_proj_params, epsg_to_proj
    defn = defn.strip()
    crs_name = name or "unknown"
    if defn.upper().startswith("EPSG:"):
        code = int(defn.split(":")[1])
        defn = epsg_to_proj(code)
        crs_name = name or f"EPSG:{code}"
    steps = parse_proj_params(defn)
    if len(steps) != 1:
        raise ValueError("pipelines have no single-CRS WKT form")
    p = dict(steps[0])
    tw = None
    if "towgs84" in p:
        vals = tuple(float(v) for v in str(p.pop("towgs84")).split(","))
        if any(vals):
            tw = vals
    proj = str(p.get("proj"))
    if proj in ("longlat", "latlong", "lonlat", "latlon"):
        w = _geogcrs_wkt(p, crs_name)
    else:
        if proj == "utm":
            p = _expand_utm(p)
            proj = "tmerc"
        if proj not in METHODS:
            raise ValueError(f"no WKT2 method mapping for +proj={proj}")
        base = _geogcrs_wkt(p, "unknown", "BASEGEOGCRS")
        w = (f'PROJCRS["{crs_name}",{base},{_conversion_wkt(p)},'
             f'{_proj_cs_wkt(p)}]')
    if tw:
        w = _towgs84_wkt(w, tw, crs_name)
    return w


# ---------------------------------------------------------------------------
# WKT parsing (WKT2 + WKT1)
# ---------------------------------------------------------------------------

class _Node:
    __slots__ = ("kw", "vals")

    def __init__(self, kw, vals):
        self.kw = kw
        self.vals = vals

    def children(self, kw):
        k = kw.lower()
        return [v for v in self.vals
                if isinstance(v, _Node) and v.kw.lower() == k]

    def child(self, *kws):
        for kw in kws:
            c = self.children(kw)
            if c:
                return c[0]
        return None

    def strs(self):
        return [v for v in self.vals if isinstance(v, str)]

    def nums(self):
        return [v for v in self.vals if isinstance(v, float)]


_TOKEN_RE = re.compile(
    r'\s*(?:"((?:[^"]|"")*)"|([A-Za-z_][A-Za-z_0-9]*)\s*(?=[\[\(])'
    r'|([-+0-9][-+0-9.eEdD]*)|([\[\]\(\),])|([A-Za-z_][A-Za-z_0-9]*))')


def _parse_wkt_tree(s: str) -> _Node:
    pos = 0
    n = len(s)

    def parse_node():
        nonlocal pos
        m = _TOKEN_RE.match(s, pos)
        if not m or m.group(2) is None:
            raise ValueError(f"WKT: expected keyword at {pos}")
        kw = m.group(2)
        pos = m.end()
        m = _TOKEN_RE.match(s, pos)
        if not m or m.group(4) not in ("[", "("):
            raise ValueError(f"WKT: expected [ after {kw}")
        pos = m.end()
        vals = []
        while pos < n:
            m = _TOKEN_RE.match(s, pos)
            if not m:
                raise ValueError(f"WKT: bad token at {pos}")
            if m.group(1) is not None:          # quoted string
                vals.append(m.group(1).replace('""', '"'))
                pos = m.end()
            elif m.group(2) is not None:        # nested node
                vals.append(parse_node())
            elif m.group(3) is not None:        # number
                vals.append(float(m.group(3).replace("D", "E")
                                  .replace("d", "e")))
                pos = m.end()
            elif m.group(4) in ("]", ")"):
                pos = m.end()
                return _Node(kw, vals)
            elif m.group(4) == ",":
                pos = m.end()
            else:                                # bare enum word (north...)
                vals.append(m.group(5))
                pos = m.end()
        raise ValueError("WKT: unterminated node")

    node = parse_node()
    return node


def _unit_factor(node: _Node, kind: str) -> float:
    """Conversion factor to (degree | metre | unity) from a UNIT-ish node
    attached to `node`; defaults when absent."""
    u = node.child("ANGLEUNIT", "LENGTHUNIT", "SCALEUNIT", "UNIT")
    if u is None:
        return 1.0
    nums = u.nums()
    fac = nums[0] if nums else 1.0
    if kind == "angle":
        return fac / _DEG          # radians-per-unit -> degrees
    return fac                     # metres / unity


def _ell_params_from(ell: _Node) -> dict:
    nums = ell.nums()
    a, rf = nums[0], nums[1]
    # match against the table -> +ellps name
    for name, row in _ELLPS_TABLE.items():
        ta = row[0]
        trf = row[1] if row[1] else (ta / (ta - row[2])
                                     if row[2] and row[2] != ta else 0.0)
        if abs(ta - a) < 1e-4 and abs(trf - rf) < 1e-7:
            return {"ellps": name}
    if rf == 0:
        return {"a": a, "b": a}
    return {"a": a, "rf": rf}


def _geog_params(node: _Node) -> dict:
    p = {"proj": "longlat"}
    datum = node.child("DATUM", "TRF", "ENSEMBLE")
    if datum is not None:
        ell = datum.child("ELLIPSOID", "SPHEROID", "MEMBER")
        if ell is not None and ell.kw.lower() == "member":
            ell = datum.child("ELLIPSOID", "SPHEROID")
        if ell is not None:
            p.update(_ell_params_from(ell))
        tow = datum.child("TOWGS84")  # WKT1 style
        if tow is not None:
            p["towgs84"] = ",".join(_num(v) for v in tow.nums())
    pm = node.child("PRIMEM")
    if pm is not None:
        nums = pm.nums()
        if nums and nums[0] != 0:
            deg = nums[0] * _unit_factor(pm, "angle")
            p["pm"] = _num(deg)
    tow = node.child("TOWGS84")       # some WKT1 variants put it here
    if tow is not None:
        p["towgs84"] = ",".join(_num(v) for v in tow.nums())
    return p


def _param_lookup(specs, name: str, code):
    nn = _norm(name)
    for wname, wcode, kind, pkey in specs:
        if code is not None and wcode == code:
            return kind, pkey
        if _norm(wname) == nn:
            return kind, pkey
    return None, None


def _proj_params_from_conversion(conv: _Node, p: dict,
                                 default_len: float = 1.0):
    meth = conv.child("METHOD", "PROJECTION")
    mname = meth.strs()[0]
    mid = meth.child("ID", "AUTHORITY")
    mcode = None
    if mid is not None:
        nums = mid.nums()
        strs = mid.strs()
        mcode = int(nums[0]) if nums else (int(strs[1]) if len(strs) > 1
                                           else None)
    proj = None
    for pname, (wname, wcode, _specs) in METHODS.items():
        if mcode is not None and wcode == mcode:
            proj = pname
            break
        if _norm(wname) == _norm(mname):
            proj = pname
            break
    if proj is None:
        proj = _WKT1_PROJECTIONS.get(_norm(mname))
    if proj is None:
        raise ValueError(f"unsupported WKT conversion method {mname!r}")
    p["proj"] = proj
    specs = METHODS[proj][2]
    for prm in conv.children("PARAMETER"):
        name = prm.strs()[0]
        val = prm.nums()[0]
        pid = prm.child("ID", "AUTHORITY")
        code = None
        if pid is not None:
            nums = pid.nums()
            strs = pid.strs()
            code = int(nums[0]) if nums else (int(strs[1])
                                              if len(strs) > 1 else None)
        kind, pkey = _param_lookup(specs, name, code)
        if pkey is None:
            pkey = _WKT1_PARAMS.get(_norm(name))
            kind = ("angle" if pkey in ("lat_0", "lon_0", "lat_1", "lat_2",
                                        "lat_ts", "lonc", "alpha", "gamma")
                    else "scale" if pkey == "k" else "length")
        if pkey is None:
            continue  # unknown parameter: ignore (io.cpp tolerant parse)
        if kind == "angle":
            p[pkey] = val * _unit_factor(prm, "angle")
        elif kind == "scale":
            v = val * _unit_factor(prm, "scale")
            p[pkey] = v
        else:
            u = prm.child("LENGTHUNIT", "UNIT")
            # WKT1 carries false easting/northing in the PROJCS UNIT;
            # WKT2 parameters default to metre unless they declare one
            fac = (u.nums()[0] if u is not None and u.nums()
                   else default_len)
            p[pkey] = val * fac
    return p


def _wkt_node_to_params(node: _Node) -> dict:
    kw = node.kw.upper()
    if kw in ("GEOGCRS", "GEODCRS", "GEOGCS", "GEODETICCRS",
              "GEOGRAPHICCRS", "BASEGEOGCRS", "BASEGEODCRS"):
        return _geog_params(node)
    if kw in ("PROJCRS", "PROJCS", "PROJECTEDCRS"):
        base = node.child("BASEGEOGCRS", "BASEGEODCRS", "GEOGCS")
        p = _geog_params(base) if base is not None else {}
        p.pop("proj", None)
        # CS length unit first (WKT1 parameter values depend on it)
        ax = node.child("CS")
        unit = None
        for cand in node.children("AXIS") + ([ax] if ax else []):
            u = cand.child("LENGTHUNIT", "UNIT") if cand else None
            if u is not None:
                unit = u
                break
        if unit is None:
            unit = node.child("LENGTHUNIT", "UNIT")
        cs_fac = (unit.nums()[0] if unit is not None and unit.nums()
                  else 1.0)
        conv = node.child("CONVERSION")
        if conv is not None:
            _proj_params_from_conversion(conv, p)
        else:  # WKT1: PROJECTION + PARAMETERs directly under PROJCS,
            # false easting/northing expressed in the PROJCS UNIT
            _proj_params_from_conversion(node, p, default_len=cs_fac)
        # WKT1/ESRI Mercator carries the true-scale latitude as
        # "Standard_Parallel_1" (io.cpp Mercator_2SP handling); the proj
        # merc operator reads +lat_ts
        if p.get("proj") in ("merc", "webmerc") and "lat_1" in p:
            p["lat_ts"] = p.pop("lat_1")
        # ESRI webmerc: Auxiliary_Sphere_Type 0 is the spherical-formula
        # web mercator; the marker parameter itself is not a proj param
        p.pop("auxiliary_sphere_type", None)
        if abs(cs_fac - 1.0) > 1e-12:
            for k, (nm, f) in _LENGTH_UNITS.items():
                if abs(f - cs_fac) < 1e-9:
                    p["units"] = k
                    break
            else:
                p["to_meter"] = cs_fac
        return p
    if kw == "BOUNDCRS":
        src = node.child("SOURCECRS")
        inner = next(v for v in src.vals if isinstance(v, _Node))
        p = _wkt_node_to_params(inner)
        tr = node.child("ABRIDGEDTRANSFORMATION", "TRANSFORMATION")
        if tr is not None:
            vals = {8605: 0.0, 8606: 0.0, 8607: 0.0, 8608: 0.0,
                    8609: 0.0, 8610: 0.0, 8611: None}
            names = {"xaxistranslation": 8605, "yaxistranslation": 8606,
                     "zaxistranslation": 8607, "xaxisrotation": 8608,
                     "yaxisrotation": 8609, "zaxisrotation": 8610,
                     "scaledifference": 8611}
            for prm in tr.children("PARAMETER"):
                nm = _norm(prm.strs()[0])
                code = names.get(nm)
                pid = prm.child("ID", "AUTHORITY")
                if code is None and pid is not None and pid.nums():
                    code = int(pid.nums()[0])
                if code in vals:
                    vals[code] = prm.nums()[0]
            tw = [vals[8605], vals[8606], vals[8607]]
            if any(vals[c] for c in (8608, 8609, 8610)) \
                    or vals[8611] is not None:
                ppm = 0.0 if vals[8611] is None else (vals[8611] - 1.0) * 1e6
                # ABRIDGEDTRANSFORMATION carries M = 1 + ds*1e-6; a plain
                # TRANSFORMATION carries ds in ppm directly
                if tr.kw.upper() == "TRANSFORMATION" \
                        and vals[8611] is not None:
                    ppm = vals[8611]
                tw += [vals[8608], vals[8609], vals[8610], ppm]
            p["towgs84"] = ",".join(_num(round(v, 10)) for v in tw)
        return p
    if kw in ("COMPD_CS", "COMPOUNDCRS"):
        # compound horizontal+vertical: take the horizontal member; a
        # non-metre vertical UNIT becomes +vto_meter (io.cpp
        # CompoundCRS::create path, vertical handled as units only)
        members = [v for v in node.vals if isinstance(v, _Node)]
        horiz = next((m for m in members if m.kw.upper() in
                      ("PROJCRS", "PROJCS", "PROJECTEDCRS", "GEOGCRS",
                       "GEOGCS", "GEODCRS", "BOUNDCRS")), None)
        if horiz is None:
            raise ValueError("compound CRS without a horizontal member")
        p = _wkt_node_to_params(horiz)
        vert = next((m for m in members if m.kw.upper() in
                     ("VERT_CS", "VERTCRS", "VERTICALCRS")), None)
        if vert is not None:
            u = vert.child("LENGTHUNIT", "UNIT")
            if u is not None and u.nums() and abs(u.nums()[0] - 1.0) > 1e-12:
                p["vto_meter"] = u.nums()[0]
        return p
    raise ValueError(f"unsupported WKT root {node.kw!r}")


def from_wkt(wkt: str) -> str:
    """WKT (WKT2:2015/2019 or WKT1) -> proj-string."""
    node = _parse_wkt_tree(wkt.strip())
    p = _wkt_node_to_params(node)
    parts = [f"+proj={p.pop('proj')}"]
    for k, v in p.items():
        if isinstance(v, float):
            v = _num(v)
        parts.append(f"+{k}={v}")
    return " ".join(parts)


# ---------------------------------------------------------------------------
# PROJJSON
# ---------------------------------------------------------------------------

_SCHEMA = "https://proj.org/schemas/v0.7/projjson.schema.json"


def to_projjson(defn: str, name: str | None = None) -> dict:
    """proj-string (or EPSG:xxxx) -> PROJJSON dict (same coverage as
    to_wkt2; reference io.cpp JSONFormatter)."""
    from .crs import parse_proj_params, epsg_to_proj
    defn = defn.strip()
    crs_name = name or "unknown"
    if defn.upper().startswith("EPSG:"):
        code = int(defn.split(":")[1])
        defn = epsg_to_proj(code)
        crs_name = name or f"EPSG:{code}"
    p = dict(parse_proj_params(defn)[0])
    tw = None
    if "towgs84" in p:
        vals = tuple(float(v) for v in str(p.pop("towgs84")).split(","))
        if any(vals):
            tw = vals

    def ell_json(p):
        nm, a, rf, _ = _resolve_ell_name(p)
        e = {"name": nm, "semi_major_axis": a}
        if rf:
            e["inverse_flattening"] = rf
        else:
            e["semi_minor_axis"] = a
        return e

    def geog_json(p, nm):
        datum = {"type": "GeodeticReferenceFrame",
                 "name": _DATUM_NAMES.get(str(p.get("datum")), "unknown"),
                 "ellipsoid": ell_json(p)}
        if "pm" in p:
            from .ops import PRIME_MERIDIANS, parse_angle
            pmname = str(p["pm"])
            deg = parse_angle(PRIME_MERIDIANS.get(pmname, pmname))
            datum["prime_meridian"] = {
                "name": pmname.capitalize() if pmname in PRIME_MERIDIANS
                else "unknown",
                "longitude": deg}
        return {
            "type": "GeographicCRS", "name": nm,
            "datum": datum,
            "coordinate_system": {
                "subtype": "ellipsoidal",
                "axis": [
                    {"name": "Geodetic latitude", "abbreviation": "Lat",
                     "direction": "north", "unit": "degree"},
                    {"name": "Geodetic longitude", "abbreviation": "Lon",
                     "direction": "east", "unit": "degree"}]},
        }

    proj = str(p.get("proj"))
    if proj in ("longlat", "latlong", "lonlat", "latlon"):
        out = geog_json(p, crs_name)
    else:
        if proj == "utm":
            p = _expand_utm(p)
            proj = "tmerc"
        if proj not in METHODS:
            raise ValueError(f"no PROJJSON method mapping for +proj={proj}")
        mname, mcode, specs = METHODS[proj]
        method = {"name": mname}
        if mcode:
            method["id"] = {"authority": "EPSG", "code": mcode}
        params = []
        for wname, wcode, kind, pkey in specs:
            if kind == "angle":
                v, unit = _angle_value(p, pkey), "degree"
            elif kind == "scale":
                v, unit = float(p.get(pkey, p.get("k_0", 1.0))), "unity"
            else:
                v, unit = float(p.get(pkey, 0)), "metre"
            prm = {"name": wname, "value": v, "unit": unit}
            if wcode:
                prm["id"] = {"authority": "EPSG", "code": wcode}
            params.append(prm)
        out = {
            "type": "ProjectedCRS", "name": crs_name,
            "base_crs": geog_json(p, "unknown"),
            "conversion": {"name": "unknown", "method": method,
                           "parameters": params},
            "coordinate_system": {
                "subtype": "Cartesian",
                "axis": [
                    {"name": "Easting", "abbreviation": "E",
                     "direction": "east", "unit": "metre"},
                    {"name": "Northing", "abbreviation": "N",
                     "direction": "north", "unit": "metre"}]},
        }
    if tw:
        vals = list(tw) + [0.0] * (7 - len(tw))
        out = {
            "type": "BoundCRS", "source_crs": out,
            "target_crs": {"type": "GeographicCRS", "name": "WGS 84",
                           "datum": {"type": "GeodeticReferenceFrame",
                                     "name": "World Geodetic System 1984",
                                     "ellipsoid": {
                                         "name": "WGS 84",
                                         "semi_major_axis": 6378137,
                                         "inverse_flattening":
                                             298.257223563}},
                           "coordinate_system":
                               geog_json({}, "")["coordinate_system"]},
            "transformation": {
                "name": f"Transformation from {crs_name} to WGS84",
                "method": {"name": "Position Vector transformation "
                           "(geog2D domain)" if len(tw) > 3 else
                           "Geocentric translations (geog2D domain)"},
                "parameters": [
                    {"name": n, "value": v, "unit": u}
                    for n, v, u in [
                        ("X-axis translation", vals[0], "metre"),
                        ("Y-axis translation", vals[1], "metre"),
                        ("Z-axis translation", vals[2], "metre"),
                    ] + ([
                        ("X-axis rotation", vals[3], "arc-second"),
                        ("Y-axis rotation", vals[4], "arc-second"),
                        ("Z-axis rotation", vals[5], "arc-second"),
                        ("Scale difference", vals[6],
                         "parts per million"),
                    ] if len(tw) > 3 else [])]},
        }
    out["$schema"] = _SCHEMA
    return out


def from_projjson(obj) -> str:
    """PROJJSON dict or string -> proj-string."""
    if isinstance(obj, str):
        obj = json.loads(obj)
    t = obj.get("type")
    if t == "BoundCRS":
        base = from_projjson(obj["source_crs"])
        tr = obj.get("transformation", {})
        vals = {"X-axis translation": 0.0, "Y-axis translation": 0.0,
                "Z-axis translation": 0.0, "X-axis rotation": 0.0,
                "Y-axis rotation": 0.0, "Z-axis rotation": 0.0,
                "Scale difference": None}
        for prm in tr.get("parameters", []):
            if prm["name"] in vals:
                vals[prm["name"]] = float(prm["value"])
        tw = [vals["X-axis translation"], vals["Y-axis translation"],
              vals["Z-axis translation"]]
        if vals["Scale difference"] is not None \
                or any(vals[f"{a}-axis rotation"] for a in "XYZ"):
            sd = vals["Scale difference"] or 0.0
            tw += [vals["X-axis rotation"], vals["Y-axis rotation"],
                   vals["Z-axis rotation"], sd]
        return base + " +towgs84=" + ",".join(_num(v) for v in tw)
    if t == "GeographicCRS":
        p = {"proj": "longlat"}
        p.update(_ell_from_json(obj))
        pm = obj.get("datum", {}).get("prime_meridian")
        if pm and float(pm.get("longitude", 0)):
            p["pm"] = _num(float(pm["longitude"]))
        return _params_to_str(p)
    if t == "ProjectedCRS":
        p = _ell_from_json(obj.get("base_crs", {}))
        conv = obj["conversion"]
        mname = conv["method"]["name"]
        mcode = conv["method"].get("id", {}).get("code")
        proj = None
        for pname, (wname, wcode, _s) in METHODS.items():
            if (mcode is not None and wcode == mcode) \
                    or _norm(wname) == _norm(mname):
                proj = pname
                break
        if proj is None:
            raise ValueError(f"unsupported PROJJSON method {mname!r}")
        p["proj"] = proj
        specs = METHODS[proj][2]
        for prm in conv.get("parameters", []):
            kind, pkey = _param_lookup(specs, prm["name"],
                                       prm.get("id", {}).get("code"))
            if pkey is not None:
                p[pkey] = float(prm["value"])
        return _params_to_str(p)
    raise ValueError(f"unsupported PROJJSON type {t!r}")


def _ell_from_json(crs: dict) -> dict:
    ell = crs.get("datum", crs.get("datum_ensemble", {})) \
             .get("ellipsoid", {})
    if not ell:
        return {}
    a = float(ell.get("semi_major_axis", 6378137.0))
    if "inverse_flattening" in ell:
        rf = float(ell["inverse_flattening"])
    elif "semi_minor_axis" in ell:
        b = float(ell["semi_minor_axis"])
        rf = a / (a - b) if a != b else 0.0
    else:
        rf = 0.0
    fake = _Node("ELLIPSOID", [ell.get("name", ""), a, rf])
    return _ell_params_from(fake)


def _params_to_str(p: dict) -> str:
    parts = [f"+proj={p.pop('proj')}"]
    for k, v in p.items():
        if isinstance(v, float):
            v = _num(v)
        parts.append(f"+{k}={v}")
    return " ".join(parts)
