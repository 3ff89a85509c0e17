"""Extract the EPSG coordinate-TRANSFORMATION registry (helmert + grid
rows, with per-row area-of-use bboxes and accuracies) from the reference's
published SQL into proj_spark/data/epsg_xforms.json.gz.

This is the planner-side complement of epsg_extract.py (which built the
CRS table): the reference's proj.db tables ``helmert_transformation`` /
``grid_transformation`` + ``usage`` + ``extent``
(data/sql/helmert_transformation.sql, grid_transformation.sql,
extent.sql; schema data/sql/proj_db_table_defs.sql:597-841), consumed by
coordinateoperationfactory.cpp when ranking candidate operations by
accuracy and area. Run:

    python tools/epsg_xform_extract.py
"""

from __future__ import annotations

import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(__file__))
from epsg_extract import SQL_DIR, _split_values, load_table  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "proj_spark", "data",
                   "epsg_xforms.json.gz")

_row_re = re.compile(r"INSERT INTO \"(\w+)\" VALUES\((.*)\);\s*$")

# helmert method code -> (n_params, convention)
# (EPSG Guidance 7-2; reference helmert.cpp method dispatch)
_HELMERT_METHODS = {
    # geocentric translations (geocentric / geog2D / geog3D domains)
    "1031": (3, None), "9603": (3, None), "1035": (3, None),
    # position vector 7-param
    "1033": (7, "position_vector"), "9606": (7, "position_vector"),
    "1037": (7, "position_vector"),
    # coordinate frame rotation 7-param
    "1032": (7, "coordinate_frame"), "9607": (7, "coordinate_frame"),
    "1038": (7, "coordinate_frame"),
    # time-dependent 15-param families
    "1053": (15, "position_vector"), "1054": (15, "position_vector"),
    "1055": (15, "position_vector"),
    "1056": (15, "coordinate_frame"), "1057": (15, "coordinate_frame"),
    "1058": (15, "coordinate_frame"),
    # Molodensky-Badekas (pivot point)
    "1034": (10, "coordinate_frame"), "9636": (10, "coordinate_frame"),
    "1061": (10, "position_vector"), "1062": (10, "position_vector"),
    "1063": (10, "coordinate_frame"),
}

# unit-of-measure code -> factor into (metre, arcsec, ppm)
_LIN_UOM = {"9001": 1.0, "1033": 0.01, "1025": 0.001}  # m, cm, mm
_ROT_UOM = {"9104": 1.0,                 # arc-second
            "9109": 0.001 * 206.264806247096355,  # microradian -> arcsec
            "1031": 0.001,               # milliarc-second
            # centesimal second = gon/10000 = 0.9 deg / 10000 = 0.324"
            # (reference unit_of_measure.sql 9113: 1.5707963e-06 rad)
            "9113": 0.9 / 10000.0 * 3600.0,
            }
_SCL_UOM = {"9202": 1.0, "1028": 1e-3, "9201": 1e6}  # ppm, ppb, unity


def scan_usage_extents(files):
    """usage rows for coordinate operations -> {(table, code): extent_code},
    plus the extent bbox table."""
    usage = {}
    for fn in files:
        path = os.path.join(SQL_DIR, fn)
        with open(path, encoding="utf-8") as f:
            for line in f:
                m = _row_re.match(line)
                if not m or m.group(1) != "usage":
                    continue
                v = _split_values(m.group(2))
                # auth, code, object_table, obj_auth, obj_code,
                # extent_auth, extent_code, scope_auth, scope_code
                usage[(v[2], str(v[4]))] = str(v[6])
    extents = {}
    for v in load_table("extent"):
        # auth, code, name, desc, south, north, west, east, deprecated
        if any(x is None for x in v[4:8]):
            continue  # a few rows have NULL bboxes (non-earth etc.)
        extents[str(v[1])] = (float(v[6]), float(v[4]),
                              float(v[7]), float(v[5]))  # (w, s, e, n)
    return usage, extents


def main():
    usage, extents = scan_usage_extents(
        ["helmert_transformation.sql", "grid_transformation.sql"])
    out = []

    for v in load_table("helmert_transformation"):
        (auth, code, name, _desc, _mauth, mcode, _mname,
         _sauth, scode, _tauth, tcode, accuracy) = v[:12]
        deprecated = v[47]
        if auth != "EPSG" or deprecated:
            continue  # PROJ-authored ensemble rows aren't EPSG ops
        meth = _HELMERT_METHODS.get(str(mcode))
        if meth is None:
            continue
        nparams, convention = meth
        lin = _LIN_UOM.get(str(v[16]))
        if lin is None:
            continue
        rec = {
            "code": int(code), "name": name, "src": int(scode),
            "dst": int(tcode),
            "acc": float(accuracy) if accuracy is not None else None,
            "kind": "helmert", "convention": convention,
            "x": v[12] * lin, "y": v[13] * lin, "z": v[14] * lin,
        }
        if nparams >= 7:
            rot = _ROT_UOM.get(str(v[21]))
            scl = _SCL_UOM.get(str(v[24]))
            if rot is None or scl is None:
                continue
            rec.update(rx=(v[17] or 0.0) * rot, ry=(v[18] or 0.0) * rot,
                       rz=(v[19] or 0.0) * rot, s=(v[22] or 0.0) * scl)
        if nparams == 15:
            rlin = _LIN_UOM.get(str(v[29]))
            rrot = _ROT_UOM.get(str(v[34]))
            rscl = _SCL_UOM.get(str(v[37]))
            if None in (rlin, rrot, rscl) or v[38] is None:
                continue
            rec.update(dx=(v[25] or 0.0) * rlin, dy=(v[26] or 0.0) * rlin,
                       dz=(v[27] or 0.0) * rlin, drx=(v[30] or 0.0) * rrot,
                       dry=(v[31] or 0.0) * rrot, drz=(v[32] or 0.0) * rrot,
                       ds=(v[35] or 0.0) * rscl, t_epoch=float(v[38]))
        if nparams == 10:
            plin = _LIN_UOM.get(str(v[44]))
            if plin is None or v[41] is None:
                continue
            rec.update(px=v[41] * plin, py=v[42] * plin, pz=v[43] * plin)
        ext = usage.get(("helmert_transformation", str(code)))
        rec["bbox"] = extents.get(ext) if ext else None
        out.append(rec)

    for v in load_table("grid_transformation"):
        (auth, code, name, _desc, _mauth, mcode, mname,
         _sauth, scode, _tauth, tcode, accuracy,
         _gp_auth, _gp_code, _gp_name, grid_name) = v[:16]
        deprecated = v[23]
        if auth != "EPSG" or deprecated:
            continue
        # only horizontal grid methods (NTv1/NTv2/NADCON/CTable-style)
        if str(mcode) not in ("9613", "9614", "9615", "1074", "1075"):
            continue
        ext = usage.get(("grid_transformation", str(code)))
        out.append({
            "code": int(code), "name": name, "src": int(scode),
            "dst": int(tcode),
            "acc": float(accuracy) if accuracy is not None else None,
            "kind": "grid", "grid": grid_name,
            "method": mname,
            "bbox": extents.get(ext) if ext else None,
        })

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with gzip.open(OUT, "wt") as f:
        json.dump(out, f, separators=(",", ":"))
    n_h = sum(1 for r in out if r["kind"] == "helmert")
    n_g = sum(1 for r in out if r["kind"] == "grid")
    print(f"extracted {len(out)} transformations "
          f"({n_h} helmert, {n_g} grid) -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
