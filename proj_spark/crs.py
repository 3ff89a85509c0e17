"""proj-string parsing, CRS registry, and the CRS->CRS mini-planner.

The parser mirrors the reference's free-format tokenizer
(src/4D_api.cpp:993-1041 pj_trim_argc/argv + src/init.cpp:482-538 paralist ->
constructor dispatch), restricted to the +key=value grammar. The CRS->CRS
planner is the driver-side replacement for proj_create_crs_to_crs
(src/4D_api.cpp:2072-2270): we support a static registry of CRS definitions
(the full EPSG SQLite database, src/iso19111/factory.cpp, is explicitly not
ported — SURVEY.md §7.4), and build a pipeline
``inv(src) -> [datum shift via cart/helmert] -> fwd(dst)`` the way the
reference's cs2cs emulation rewrites +towgs84 (src/4D_api.cpp:845-992).
"""

from __future__ import annotations

import re

from .ops import Operator, Pipeline, PushPop, create_operator
from .kernels import cyl, conic, cartgeo, datum, azimuthal, gridshift, pseudocyl, misc2, misc3, dgg, meta, interrupted, tail1, tail2, tail3, tail4, tail5, tail6, complexpoly, space, adams  # noqa: F401 (registration)


def parse_proj_params(s: str) -> list[dict]:
    """Tokenize a proj-string; returns one dict per step (a non-pipeline
    string yields a single-element list)."""
    # a standalone backslash is a gie-style line continuation and is
    # dropped; a backslash embedded in a token (e.g. a file-valued param
    # like +grids=dir\file.tif) must survive tokenization
    toks = [t for t in s.replace("\\\n", " ").replace("\n", " ").split()
            if t != "\\"]
    # merge free-format "key = value" / "key =value" / "key= value" triples
    # (reference pj_trim_argv tokenization, src/4D_api.cpp:993-1041)
    merged = []
    i = 0
    while i < len(toks):
        tok = toks[i]
        if tok == "=" and merged and i + 1 < len(toks):
            merged[-1] = merged[-1] + "=" + toks[i + 1]
            i += 2
            continue
        if tok.endswith("=") and i + 1 < len(toks) and "=" not in toks[i + 1]:
            merged.append(tok + toks[i + 1])
            i += 2
            continue
        if tok.startswith("=") and merged and "=" not in merged[-1]:
            merged[-1] = merged[-1] + tok
            i += 1
            continue
        # "towgs84=1, 2, 3" comma-continuation (pj_trim_argc list values)
        if merged and "=" in merged[-1] and merged[-1].endswith(","):
            merged[-1] = merged[-1] + tok
            i += 1
            continue
        merged.append(tok)
        i += 1
    toks = merged
    global_params: dict = {}
    steps: list[dict] = []
    cur: dict | None = None
    is_pipeline = False
    for tok in toks:
        tok = tok.lstrip("+")
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
        else:
            k, v = tok, True
        if k == "step":
            is_pipeline = True
            if cur is not None:
                steps.append(cur)
            cur = {}
            continue
        if k == "proj" and v == "pipeline":
            is_pipeline = True
            continue
        # first occurrence wins (reference paralist search order,
        # src/init.cpp:375-383: earlier params take precedence)
        if cur is None:
            global_params.setdefault(k, v)
        else:
            cur.setdefault(k, v)
    if cur is not None:
        steps.append(cur)
    if not is_pipeline:
        return [global_params]
    # pipeline global params (e.g. +ellps before first step) inherit into
    # steps; a global +inv inverts the PIPELINE, not each step
    # (pipeline.cpp runs the op inverted via P->inverted), handled in create()
    inherit = {k: v for k, v in global_params.items()
               if k not in ("proj", "inv")}
    out = []
    for st in steps:
        merged = dict(inherit)
        merged.update(st)
        out.append(merged)
    return out


_WKT_ROOTS = ("GEOGCRS", "GEODCRS", "GEOGCS", "GEODETICCRS", "PROJCRS",
              "PROJCS", "PROJECTEDCRS", "BOUNDCRS")


def normalize_crs_def(defn: str) -> str:
    """Accept proj-string / EPSG:code / WKT1 / WKT2 / PROJJSON, return a
    proj-string (reference proj_create's input dispatch,
    4D_api.cpp + io.cpp createFromUserInput)."""
    s = defn.strip()
    if s.startswith("{"):
        from .wktio import from_projjson
        return from_projjson(s)
    head = re.split(r"[\[\(]", s, 1)[0].strip().upper()
    if head in _WKT_ROOTS:
        from .wktio import from_wkt
        return from_wkt(s)
    # other WKT roots (COMPD_CS, GEOCCS, VERTCRS, ENGCRS, ...) must fail
    # cleanly as unsupported-CRS, not fall through to the proj-string
    # parser (reference io.cpp createFromUserInput raises ParsingException)
    if head and re.fullmatch(r"[A-Z_][A-Z0-9_]*", head) and ("[" in s or "(" in s):
        from .errors import INVALID_OP_WRONG_SYNTAX, ProjError
        raise ProjError(f"unsupported WKT CRS type: {head}",
                        INVALID_OP_WRONG_SYNTAX)
    return s


def create(defn: str):
    """proj-string / EPSG / WKT / PROJJSON -> Operator or Pipeline (the
    engine's proj_create)."""
    defn = normalize_crs_def(defn)
    if defn.upper().startswith("EPSG:"):
        defn = epsg_to_proj(int(defn.split(":")[1]))
    steps = parse_proj_params(defn)
    if len(steps) == 1 and "step" not in defn and "pipeline" not in defn:
        p = steps[0]
        op, direction = _create_step(p)
        if direction == "inverse":
            # +inv on a plain operator runs it inverted (P->inverted)
            return Pipeline([(op, "inverse")])
        return op
    head = []
    for tok in defn.replace("\n", " ").split():
        t = tok.lstrip("+")
        if t == "step":
            break
        head.append(t)
    # a second +proj= in the GLOBAL segment is malformed (reference: the
    # global args are appended to every step, and a duplicate +proj in
    # the pipeline's own args aborts creation)
    if sum(1 for t in head if t.startswith("proj=")) > 1:
        from .errors import INVALID_OP_WRONG_SYNTAX, ProjError
        raise ProjError("pipeline: duplicate +proj in global arguments",
                        INVALID_OP_WRONG_SYNTAX)
    # global +inv toggles each step's inversion, step order preserved;
    # +inv in BOTH global and step args means forward
    # (reference pipeline.cpp:516-523)
    if "inv" in head:
        for p in steps:
            if "inv" in p:
                p.pop("inv")
            else:
                p["inv"] = True
    ops = [_create_step(p) for p in steps]
    return Pipeline(ops)


def _create_step(p: dict):
    direction = "inverse" if "inv" in p else "forward"
    q = {k: v for k, v in p.items() if k != "inv"}
    if "init" in q:
        # +init= expansion (reference src/init.cpp:505-512); epsg: codes
        # resolve through the static registry, other init files through
        # _INIT_STATIC; explicit params take precedence
        target = str(q.pop("init")).lower()
        if target.startswith("epsg:"):
            defn = epsg_to_proj(int(target.split(":")[1]))
        elif target in _INIT_STATIC:
            defn = _INIT_STATIC[target]
        else:
            raise KeyError(f"unsupported init file {target}")
        expanded = parse_proj_params(defn)[0]
        # proj4 init rules (the reference's use_proj4_init_rules /
        # PROJ_USE_PROJ4_INIT_RULES): +init= CRS expansions keep the
        # traditional GIS axis order — drop a pure north/east ORDER swap
        # (neu) the registry carries, but keep genuine projection axis
        # conventions (wsu south-oriented TM etc.), which the legacy
        # proj4 init files also carried
        if str(expanded.get("axis", "")) == "neu":
            expanded.pop("axis")
        for k, v in expanded.items():
            q.setdefault(k, v)
    op = create_operator(q)
    # dead-step elision flags (reference src/conversions/pipeline.cpp:119-120)
    op._omit_fwd = "omit_fwd" in p
    op._omit_inv = "omit_inv" in p
    return (op, direction)


# init-file entries used by the reference test suite (data/nad27:579-582)
_INIT_STATIC = {
    "nad27:3901": "proj=lcc datum=NAD27 lon_0=-81 lat_1=34d58 lat_2=33d46 "
                  "lat_0=33 x_0=609601.2192024384 y_0=0",
}


# ---------------------------------------------------------------------------
# Static CRS registry (EPSG subset; replaces the 9,990-LoC SQLite factory)
# ---------------------------------------------------------------------------

_EPSG_STATIC = {
    4326: "+proj=longlat +ellps=WGS84",            # WGS84 geographic
    4258: "+proj=longlat +ellps=GRS80",            # ETRS89 geographic
    4269: "+proj=longlat +ellps=GRS80",            # NAD83 geographic
    4277: "+proj=longlat +ellps=airy +towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894",  # OSGB36
    4230: "+proj=longlat +datum=ED50",             # ED50
    3857: "+proj=webmerc +ellps=WGS84",            # Web Mercator
    4978: "+proj=geocent +ellps=WGS84",            # WGS84 geocentric
    2154: "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 +y_0=6600000 +ellps=GRS80",  # RGF93 / Lambert-93
    5070: "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 +x_0=0 +y_0=0 +ellps=GRS80",  # NAD83 / CONUS Albers
    27700: "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy "
           "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894",  # British National Grid
    25832: "+proj=utm +zone=32 +ellps=GRS80",      # ETRS89 / UTM 32N
    3035: "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",  # ETRS89-LAEA (needs laea op)
    32600: None,  # handled by pattern
}


_EPSG_GENERATED: dict | None = None


def _epsg_generated() -> dict:
    """Lazy-loaded table compiled from the reference's published EPSG SQL
    registry (tools/epsg_extract.py over data/sql/*.sql — 6,400+
    geographic and projected CRS). The handcrafted entries above take
    precedence (they carry curated towgs84 values)."""
    global _EPSG_GENERATED
    if _EPSG_GENERATED is None:
        import gzip
        import json
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "data", "epsg.json.gz")
        try:
            with gzip.open(path, "rt", encoding="utf-8") as f:
                _EPSG_GENERATED = json.load(f)
        except OSError:
            _EPSG_GENERATED = {}
    return _EPSG_GENERATED


def epsg_to_proj(code: int) -> str:
    """EPSG code -> proj-string (reference analogue: SQLite lookup in
    src/iso19111/factory.cpp; here a handcrafted core + a table compiled
    from the same published EPSG SQL, per SURVEY.md §1.3)."""
    if 32601 <= code <= 32660:  # WGS84 / UTM north
        return f"+proj=utm +zone={code - 32600} +ellps=WGS84"
    if 32701 <= code <= 32760:  # WGS84 / UTM south
        return f"+proj=utm +zone={code - 32700} +south +ellps=WGS84"
    if 25828 <= code <= 25838:  # ETRS89 / UTM
        return f"+proj=utm +zone={code - 25800} +ellps=GRS80"
    if 26901 <= code <= 26923:  # NAD83 / UTM
        return f"+proj=utm +zone={code - 26900} +ellps=GRS80"
    s = _EPSG_STATIC.get(code)
    if s:
        return s
    s = _epsg_generated().get(str(code))
    if not s:
        raise KeyError(f"EPSG:{code} not in static registry")
    return s


def _towgs84_of(params: dict):
    tw = params.get("towgs84")
    if tw is None:
        if "datum" in params:
            from .kernels.core import DATUM_TABLE
            shift = DATUM_TABLE[params["datum"]][1]
            if isinstance(shift, str):
                # grid-based datum sentinel (e.g. NAD27 "@grid:...") —
                # propagated so create_crs_to_crs can route via the grid
                # registry or raise, never a silent zero Helmert
                return shift
            return tuple(shift)
        return None
    vals = tuple(float(v) for v in str(tw).split(","))
    if all(v == 0 for v in vals):
        return None
    return vals


_GEOGRAPHIC_PROJS = ("longlat", "latlong", "lonlat", "latlon")


def crs_is_geographic(crs: str) -> bool:
    """True when the CRS's coordinates are lon/lat degrees (the reference's
    proj_angular_input/output distinction, src/4D_api.cpp:81-118)."""
    crs = normalize_crs_def(crs)
    d = epsg_to_proj(int(crs.split(":")[1])) if crs.upper().startswith("EPSG:") else crs
    steps = parse_proj_params(d)
    return steps[0].get("proj") in _GEOGRAPHIC_PROJS


def create_crs_to_crs(src: str, dst: str) -> Pipeline:
    """Build the cs2cs-equivalent pipeline src CRS -> dst CRS.

    Mirrors the reference's prepared-operation construction for the
    static-registry case (src/4D_api.cpp:845-992 cs2cs emulation):

      inv(src proj) -> [src towgs84: cart -> helmert -> cart^-1]
                    -> [dst towgs84: cart -> helmert^-1 -> cart^-1]
                    -> fwd(dst proj)

    Coordinates are (lon, lat) in degrees in, (x, y) CRS units out; the
    engine universally uses GIS (lon,lat) order (axis normalization the
    reference applies via proj_normalize_for_visualization).
    """
    src = normalize_crs_def(src)
    dst = normalize_crs_def(dst)
    src_def = epsg_to_proj(int(src.split(":")[1])) if src.upper().startswith("EPSG:") else src
    dst_def = epsg_to_proj(int(dst.split(":")[1])) if dst.upper().startswith("EPSG:") else dst
    src_steps = parse_proj_params(src_def)
    dst_steps = parse_proj_params(dst_def)
    if len(src_steps) != 1 or len(dst_steps) != 1:
        raise ValueError("crs_to_crs expects single-operator CRS definitions")
    sp, dp = src_steps[0], dst_steps[0]

    steps: list[tuple] = []
    # 1. into geodetic coordinates of the source datum. The step operators
    # are built with op-level datum handling disabled: this pipeline adds
    # the datum legs explicitly, so leaving +towgs84/+datum live on the
    # step would apply the shift twice.
    if sp.get("proj") not in ("longlat", "latlong", "lonlat", "latlon"):
        steps.append((create_operator({**sp, "_no_datum_shift": True}),
                      "inverse"))
    s_tw = _towgs84_of(sp)
    d_tw = _towgs84_of(dp)
    grid_steps_pre: list[tuple] = []
    grid_steps_post: list[tuple] = []
    if isinstance(s_tw, str) or isinstance(d_tw, str):
        # grid-based datum (NAD27/potsdam nadgrids): same datum on both
        # sides cancels; otherwise route through hgridshift — grid fwd is
        # local -> pivot (WGS84/NAD83), reference PJD_GRIDSHIFT semantics
        if s_tw == d_tw:
            s_tw = d_tw = None
        else:
            if isinstance(s_tw, str):
                grid_steps_pre.append(
                    (create_operator({"proj": "hgridshift", "grids": s_tw,
                                      "_no_datum_shift": True}), "forward"))
                s_tw = None
            if isinstance(d_tw, str):
                grid_steps_post.append(
                    (create_operator({"proj": "hgridshift", "grids": d_tw,
                                      "_no_datum_shift": True}), "inverse"))
                d_tw = None
    steps.extend(grid_steps_pre)
    if s_tw != d_tw:
        from .kernels.datum import Helmert
        from .kernels.cartgeo import Cart
        if s_tw is not None:
            ell_s = {k: sp[k] for k in ("ellps", "a", "b", "rf", "R", "datum") if k in sp}
            steps.append((Cart({"proj": "cart", **ell_s}), "forward"))
            steps.append((Helmert(_helmert_params(s_tw)), "forward"))
            steps.append((Cart({"proj": "cart", "ellps": "WGS84"}), "inverse"))
            cur_ell = {"ellps": "WGS84"}
        else:
            cur_ell = {k: sp[k] for k in ("ellps", "a", "b", "rf", "R", "datum") if k in sp}
        if d_tw is not None:
            ell_d = {k: dp[k] for k in ("ellps", "a", "b", "rf", "R", "datum") if k in dp}
            steps.append((Cart({"proj": "cart", **cur_ell}), "forward"))
            steps.append((Helmert(_helmert_params(d_tw)), "inverse"))
            steps.append((Cart({"proj": "cart", **ell_d}), "inverse"))
    steps.extend(grid_steps_post)
    # 2. into the destination CRS
    if dp.get("proj") not in ("longlat", "latlong", "lonlat", "latlon"):
        steps.append((create_operator(dp), "forward"))
    if not steps:
        steps.append((create_operator({"proj": "noop"}), "forward"))
    return Pipeline(steps)


def _helmert_params(tw: tuple) -> dict:
    p = {"proj": "helmert"}
    keys7 = ("x", "y", "z", "rx", "ry", "rz", "s")
    for k, v in zip(keys7, tw):
        p[k] = v
    if len(tw) > 3:
        p["convention"] = "position_vector"
    return p
