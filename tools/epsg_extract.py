"""Compile the reference's EPSG SQL registry into a static proj-string table.

The reference builds proj.db from ``data/sql/*.sql`` and resolves codes
through its C++ factory (src/iso19111/factory.cpp). This engine instead
compiles the same published EPSG data ONCE, offline, into
``proj_spark/data/epsg.json.gz`` mapping ``code -> proj string``, loaded
lazily by ``proj_spark.crs``. Covered:

- geographic 2D CRS  -> +proj=longlat +a/+rf (+pm=, +datum= for the
  classic datums the engine's DATUM_TABLE knows)
- projected CRS for the common conversion methods (table below) ->
  full projection string + units/axis from the coordinate system

Unsupported methods (ignored): anything not in _METHODS.

    python tools/epsg_extract.py        # regenerates the table
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys

SQL_DIR = "/root/reference/data/sql"
OUT = os.path.join(os.path.dirname(__file__), "..", "proj_spark", "data",
                   "epsg.json.gz")

_row_re = re.compile(r"INSERT INTO \"(\w+)\" VALUES\((.*)\);\s*$")


def _split_values(s: str):
    """Split a VALUES(...) payload into python values ('' escapes inside
    quoted strings, bare numbers, NULL)."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == ",":
            i += 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if s[j] == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            out.append("".join(buf))
            i = j + 1
        else:
            j = s.find(",", i)
            if j == -1:
                j = n
            tok = s[i:j].strip()
            if tok == "NULL":
                out.append(None)
            else:
                try:
                    out.append(float(tok) if ("." in tok or "e" in tok
                                              or "E" in tok) else int(tok))
                except ValueError:
                    out.append(tok)
            i = j
    return out


def load_table(name: str):
    rows = []
    path = os.path.join(SQL_DIR, f"{name}.sql")
    with open(path, encoding="utf-8") as f:
        for line in f:
            m = _row_re.match(line)
            if not m or m.group(1) != name:
                continue
            rows.append(_split_values(m.group(2)))
    return rows


# named prime meridians: the reference's own DMS constants
# (src/datums.cpp pj_prime_meridians) take precedence over the EPSG
# grad-valued rows — gie expected values were produced with these
_PM_NAMED = {
    "8901": 0.0,
    "8902": -(9 + 7 / 60.0 + 54.862 / 3600.0),       # lisbon
    "8903": 2 + 20 / 60.0 + 14.025 / 3600.0,         # paris
    "8904": -(74 + 4 / 60.0 + 51.3 / 3600.0),        # bogota
    "8905": -(3 + 41 / 60.0 + 16.58 / 3600.0),       # madrid
    "8906": 12 + 27 / 60.0 + 8.4 / 3600.0,           # rome
    "8907": 7 + 26 / 60.0 + 22.5 / 3600.0,           # bern
    "8908": 106 + 48 / 60.0 + 27.79 / 3600.0,        # jakarta
    "8909": -(17 + 40 / 60.0),                       # ferro
    "8910": 4 + 22 / 60.0 + 4.71 / 3600.0,           # brussels
    "8911": 18 + 3 / 60.0 + 29.8 / 3600.0,           # stockholm
    "8912": 23 + 42 / 60.0 + 58.815 / 3600.0,        # athens
    "8913": 10 + 43 / 60.0 + 22.5 / 3600.0,          # oslo
}


def _ang(value, uom):
    """EPSG angle value -> decimal degrees (uom 9102 deg, 9110 sexagesimal
    DMS as DD.MMSSsss, 9105 grad, 9109 microradian... only the ones that
    appear in conversions)."""
    if value is None:
        return None
    if uom == "9102" or uom == "9122":
        return float(value)
    if uom == "9110":
        # DD.MMSSsss (sign applies to the whole)
        neg = value < 0
        v = abs(float(value))
        d = int(v)
        rem = round((v - d) * 100.0, 10)
        mnt = int(rem)
        sec = round((rem - mnt) * 100.0, 8)
        out = d + mnt / 60.0 + sec / 3600.0
        return -out if neg else out
    if uom == "9105":
        return float(value) * 0.9
    if uom == "9104":  # arc-second
        return float(value) / 3600.0
    if uom == "9101":  # radian
        import math
        return float(value) * 180.0 / math.pi
    raise KeyError(f"angle uom {uom}")


# datum code -> engine DATUM_TABLE name (crs.py handles the shift)
_DATUM_NAMES = {
    "6326": "WGS84", "6269": "NAD83", "6267": "NAD27", "6314": "potsdam",
    "6272": "nzgd49", "6277": "OSGB36", "6121": "GGRS87",
    "6299": "ire65", "6312": "hermannskogel", "6223": "carthage",
    "6230": "ED50", "6275": "NTF", "6807": "NTF", "6237": "HD72",
    "6284": "pulkovo42",
}

# (method code) -> (proj name, {param_code: proj key}); angle params
# converted to degrees, lengths to metres, scales as-is
_METHODS = {
    "9807": ("tmerc", {"8801": "lat_0", "8802": "lon_0", "8805": "k",
                       "8806": "x_0", "8807": "y_0"}),
    "9808": ("tmerc", {"8801": "lat_0", "8802": "lon_0", "8805": "k",
                       "8806": "x_0", "8807": "y_0"}),  # south: +axis below
    "9802": ("lcc", {"8821": "lat_0", "8822": "lon_0", "8823": "lat_1",
                     "8824": "lat_2", "8826": "x_0", "8827": "y_0"}),
    "9801": ("lcc", {"8801": "lat_1", "8802": "lon_0", "8805": "k",
                     "8806": "x_0", "8807": "y_0"}),  # 1SP: lat_0=lat_1
    "9820": ("laea", {"8801": "lat_0", "8802": "lon_0",
                      "8806": "x_0", "8807": "y_0"}),
    "9822": ("aea", {"8821": "lat_0", "8822": "lon_0", "8823": "lat_1",
                     "8824": "lat_2", "8826": "x_0", "8827": "y_0"}),
    "1024": ("webmerc", {"8801": "lat_0", "8802": "lon_0",
                         "8806": "x_0", "8807": "y_0"}),
    "9804": ("merc", {"8801": "lat_0", "8802": "lon_0", "8805": "k",
                      "8806": "x_0", "8807": "y_0"}),
    "9805": ("merc", {"8823": "lat_ts", "8802": "lon_0",
                      "8806": "x_0", "8807": "y_0"}),
    "9809": ("sterea", {"8801": "lat_0", "8802": "lon_0", "8805": "k",
                        "8806": "x_0", "8807": "y_0"}),
    "9810": ("stere", {"8801": "lat_0", "8802": "lon_0", "8805": "k",
                       "8806": "x_0", "8807": "y_0"}),
    "9829": ("stere", {"8832": "lat_ts", "8833": "lon_0",
                       "8806": "x_0", "8807": "y_0"}),  # polar B: lat_0 below
    "9806": ("cass", {"8801": "lat_0", "8802": "lon_0",
                      "8806": "x_0", "8807": "y_0"}),
    "9812": ("omerc", {"8811": "lat_0", "8812": "lonc", "8813": "alpha",
                       "8814": "gamma", "8815": "k",
                       "8806": "x_0", "8807": "y_0"}),  # variant A: no_uoff
    "9815": ("omerc", {"8811": "lat_0", "8812": "lonc", "8813": "alpha",
                       "8814": "gamma", "8815": "k",
                       "8816": "x_0", "8817": "y_0"}),
    "9811": ("nzmg", {"8801": "lat_0", "8802": "lon_0",
                      "8806": "x_0", "8807": "y_0"}),
    "9818": ("poly", {"8801": "lat_0", "8802": "lon_0",
                      "8806": "x_0", "8807": "y_0"}),
    "9819": ("krovak", {"8811": "lat_0", "8833": "lon_0", "1036": "alpha",
                        "8818": "lat_1", "8819": "k",
                        "8806": "x_0", "8807": "y_0"}),
    "9823": ("eqc", {"8823": "lat_ts", "8802": "lon_0",
                     "8806": "x_0", "8807": "y_0"}),  # spherical
    "1028": ("eqc", {"8823": "lat_ts", "8802": "lon_0",
                     "8806": "x_0", "8807": "y_0"}),
    "1029": ("eqc", {"8823": "lat_ts", "8802": "lon_0",
                     "8806": "x_0", "8807": "y_0"}),
    "9834": ("cea", {"8823": "lat_ts", "8802": "lon_0",
                     "8806": "x_0", "8807": "y_0"}),  # spherical
    "9835": ("cea", {"8823": "lat_ts", "8802": "lon_0",
                     "8806": "x_0", "8807": "y_0"}),
}

_ANGLE_PARAMS = {"8801", "8802", "8811", "8812", "8813", "8814", "8818",
                 "8821", "8822", "8823", "8824", "8832", "8833", "1036"}
_LENGTH_PARAMS = {"8806", "8807", "8816", "8817", "8826", "8827"}
_SCALE_PARAMS = {"8805", "8815", "8819"}


def _fmt(v: float) -> str:
    s = repr(float(v))
    if s.endswith(".0"):
        s = s[:-2]
    return s


def main():
    uom = {}
    for r in load_table("unit_of_measure"):
        uom[r[1]] = (r[3], r[4])  # type, factor

    ellps = {}
    for r in load_table("ellipsoid"):
        if r[11]:
            continue
        a = float(r[6])
        ua = uom[r[8]][1] or 1.0
        a = a * ua
        rf, b = r[9], r[10]
        ellps[r[1]] = (a, float(rf) if rf is not None else None,
                       float(b) * ua if b is not None else None)

    pm = {}
    for r in load_table("prime_meridian"):
        pm[r[1]] = _PM_NAMED.get(r[1], _ang(r[3], r[5]))

    datum = {}
    for r in load_table("geodetic_datum"):
        # auth, code, name, desc, ellps_auth, ellps_code, pm_auth, pm_code
        datum[r[1]] = (r[5], r[7])

    axis = {}
    for r in load_table("axis"):
        # auth, code, name, abbrev, orientation, cs_auth, cs_code, order,
        # uom_auth, uom_code
        cs = r[6]
        axis.setdefault(cs, []).append((int(r[7]), r[4], r[9]))

    def cs_info(cs_code):
        """(axis string or None, unit factor) for a 2-axis cartesian cs."""
        axes = sorted(axis.get(cs_code, []))
        if len(axes) < 2:
            return None, 1.0
        letter = {"east": "e", "west": "w", "north": "n", "south": "s"}
        try:
            ax = "".join(letter[a[1]] for a in axes[:2]) + "u"
        except KeyError:
            ax = None  # exotic ("North along 130°W" polar cases)
        factor = uom[axes[0][2]][1] or 1.0
        return ax, float(factor)

    geog = {}
    geog_datum = {}
    for r in load_table("geodetic_crs"):
        # auth,code,name,desc,type,cs_auth,cs_code,datum_auth,datum_code,...
        if r[9]:
            continue
        if r[4] not in ("geographic 2D", "geographic 3D"):
            continue
        d = datum.get(r[8])
        if d is None:
            continue
        e = ellps.get(d[0])
        if e is None:
            continue
        a, rf, b = e
        parts = ["+proj=longlat"]
        name = _DATUM_NAMES.get(r[8])
        if name:
            parts.append(f"+datum={name}")
        elif rf is not None:
            parts.append(f"+a={_fmt(a)} +rf={_fmt(rf)}")
        else:
            parts.append(f"+a={_fmt(a)} +b={_fmt(b)}")
        pmv = pm.get(d[1], 0.0)
        if pmv:
            parts.append(f"+pm={_fmt(pmv)}")
        geog[r[1]] = " ".join(parts)
        geog_datum[r[1]] = (r[8], a, rf, b, pmv)

    conv = {}
    for r in load_table("conversion"):
        # auth,code,name,desc, method(auth,code,name), then 7 x
        # (param_auth, param_code, param_name, value, uom_auth, uom_code)
        code, mcode = r[1], r[5]
        params = {}
        for i in range(7):
            base = 7 + i * 6
            if base + 5 >= len(r) or r[base + 1] is None:
                continue
            pcode, val, puom = r[base + 1], r[base + 3], r[base + 5]
            if val is None:
                continue
            params[str(pcode)] = (val, str(puom))
        conv[code] = (str(mcode), params)

    table = dict(geog)
    n_proj = 0
    skipped_methods = {}
    for r in load_table("projected_crs"):
        # auth,code,name,desc, cs(2), geod(2), conv(2), text_def, depr
        code, cs_code, geod_code, conv_code = r[1], r[5], r[7], r[9]
        if conv_code not in conv or geod_code not in geog_datum:
            continue
        mcode, params = conv[conv_code]
        if mcode not in _METHODS:
            skipped_methods[mcode] = skipped_methods.get(mcode, 0) + 1
            continue
        pname, pmap = _METHODS[mcode]
        raw = {str(pc): v for pc, (v, u) in params.items()}
        if mcode in ("9812", "9815") and raw.get("8813") == 90 \
                and raw.get("8814") == 90:
            # alpha = gamma = 90: Hotine degenerates to the Swiss oblique
            # mercator (the reference maps EOV et al. to somerc)
            pname, pmap = "somerc", {"8811": "lat_0", "8812": "lon_0",
                                     "8815": "k",
                                     ("8816" if mcode == "9815" else "8806"): "x_0",
                                     ("8817" if mcode == "9815" else "8807"): "y_0"}
        parts = [f"+proj={pname}"]
        if mcode == "9812" and pname == "omerc":
            parts.append("+no_uoff")
        vals = {}
        ok = True
        for pcode, (val, puom) in params.items():
            key = pmap.get(pcode)
            if key is None:
                continue
            try:
                if pcode in _ANGLE_PARAMS:
                    v = _ang(val, puom)
                elif pcode in _LENGTH_PARAMS:
                    v = float(val) * (uom[puom][1] or 1.0)
                else:
                    if puom == "9202":  # ppm offset scale
                        v = 1.0 + float(val) * 1e-6
                    else:
                        v = float(val)
            except KeyError:
                ok = False
                break
            vals[key] = v
        if not ok:
            continue
        if mcode == "9801":
            vals["lat_0"] = vals.get("lat_1", 0.0)
        if mcode == "9829":
            vals["lat_0"] = 90.0 if vals.get("lat_ts", 0) >= 0 else -90.0
        for k in ("lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "lonc",
                  "alpha", "gamma", "k", "x_0", "y_0"):
            if k in vals:
                parts.append(f"+{k}={_fmt(vals[k])}")
        dcode, a, rf, b, pmv = geog_datum[geod_code]
        name = _DATUM_NAMES.get(dcode)
        if name:
            parts.append(f"+datum={name}")
        elif rf is not None:
            parts.append(f"+a={_fmt(a)} +rf={_fmt(rf)}")
        else:
            parts.append(f"+a={_fmt(a)} +b={_fmt(b)}")
        if pmv:
            parts.append(f"+pm={_fmt(pmv)}")
        ax, factor = cs_info(cs_code)
        if mcode == "9808":
            ax = "wsu"  # TM south oriented
        if factor != 1.0:
            parts.append(f"+to_meter={_fmt(factor)}")
        else:
            parts.append("+units=m")
        if ax and ax != "enu":
            parts.append(f"+axis={ax}")
        table[code] = " ".join(parts)
        n_proj += 1

    out = os.path.abspath(OUT)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with gzip.open(out, "wt", encoding="utf-8") as f:
        json.dump(table, f, separators=(",", ":"), sort_keys=True)
    print(f"{len(geog)} geographic + {n_proj} projected CRS -> {out}")
    top = sorted(skipped_methods.items(), key=lambda kv: -kv[1])[:12]
    print("skipped methods:", top)


if __name__ == "__main__":
    sys.exit(main())
