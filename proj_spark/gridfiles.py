"""Real grid-file readers: NTv2 (.gsb), GTX (.gtx), CTable2 (.ct2).

Parses the three classic PROJ datum-shift raster formats with numpy
``frombuffer`` — no external libs. Layouts follow the reference's readers
(src/grids.cpp: GTXVerticalShiftGrid::open :242-312, CTable2Grid::open
:1966-2021, NTv2GridSet::open :2174-2340, NTv2Grid::valueAt :2112-2165):

- **NTv2**: 11x16-byte overview header (endianness detected from
  NUM_OREC==11 at offset 8, grids.cpp:2200); per-subgrid 11x16-byte header
  (S_LAT/N_LAT/E_LONG/W_LONG/LAT_INC/LONG_INC doubles in arcsec at offsets
  72..152, GS_COUNT int32 at 168) followed by GS_COUNT nodes of 4 float32
  (lat shift, lon shift, lat err, lon err) in arcsec. Rows run south to
  north; columns run EAST to WEST (grids.cpp:2143 "NTv2 is organized from
  east to west"), and longitudes/shifts use the positive-WEST convention —
  both are normalized here (columns flipped, lon shift negated).
- **GTX**: 40-byte big-endian header (south double, west double, dlat,
  dlon, nrows int32, ncols int32), float32 geoid heights in metres,
  row-major from the south row. Official nodata -88.8888 (plus the
  |value| > 1000 heuristic, grids.cpp:355-360).
- **CTable2**: 160-byte little-endian header ("CTABLE V2" magic; west,
  south, resX, resY doubles in RADIANS at offset 96; width/height int32 at
  128); data from offset 160 as float32 (lon shift, lat shift) pairs in
  radians, row-major from the south row, lon positive-west (negated here).

All loaded grids expose the same ``interp(lon_deg, lat_deg) ->
(dlon_arcsec_east_positive, dlat_arcsec, dz_m)`` interface as the
synthetic registry grids, with NaN outside coverage, so every gridshift
operator works identically over synthetic and file-backed rasters.

Spark-side scale note: a parsed grid is a plain numpy array pytree —
broadcast once per job (SparkContext.broadcast or UDF closure capture);
the multi-GB continental grid sets the reference streams from a CDN are
out of scope (no external data), and would factor into the cell-keyed
join form instead (querylib.raster_join_shift).
"""

from __future__ import annotations

import os
import struct

import numpy as np

_SEC2DEG = 1.0 / 3600.0
_RAD2AS = 3600.0 * 180.0 / np.pi


class FileGrid:
    """One georeferenced shift raster, east-positive degrees.

    Bands are float64 2-D arrays [row, col], row 0 = south, col 0 = west.
    ``dlon_as``/``dlat_as`` in arcsec (east-positive), ``dz_m`` metres; a
    band may be None (horizontal-only / vertical-only grids).
    """

    def __init__(self, name, lon0, lat0, dlon, dlat, width, height,
                 dlon_as=None, dlat_as=None, dz_m=None):
        self.name = name
        self.lon0, self.lat0 = float(lon0), float(lat0)
        self.dlon, self.dlat = float(dlon), float(dlat)
        self.width, self.height = int(width), int(height)
        self.dlon_as = dlon_as
        self.dlat_as = dlat_as
        self.dz_m = dz_m
        # global-in-longitude raster: width cells span exactly 360 deg,
        # the seam column wraps back to column 0 (reference
        # grids.cpp fullWorldLongitude / pj_hgrid longitude wrap)
        self.global_lon = abs(self.dlon * self.width - 360.0) < 1e-8

    def _lon_rel(self, lon_deg):
        """Longitude -> grid-frame offset in [0, 360) degrees east of
        lon0. The modulo brings any ±n*360 alias into the grid frame
        (reference normalizes input longitude into the grid's extent)."""
        return (np.asarray(lon_deg, dtype=np.float64) - self.lon0) % 360.0

    def contains(self, lon_deg, lat_deg):
        eps = 1e-9
        lat_deg = np.asarray(lat_deg, dtype=np.float64)
        lat_in = ((lat_deg >= self.lat0 - eps)
                  & (lat_deg <= self.lat0 + self.dlat * (self.height - 1) + eps))
        if self.global_lon:
            return np.broadcast_to(lat_in, np.broadcast(
                np.asarray(lon_deg), lat_deg).shape).copy()
        rel = self._lon_rel(lon_deg)
        span = self.dlon * (self.width - 1)
        # a point epsilon west of lon0 aliases to rel ~ 360-eps: outside
        lon_in = (rel <= span + eps) | (rel >= 360.0 - eps)
        return lon_in & lat_in

    def interp(self, lon_deg, lat_deg):
        """Bilinear (dlon_as, dlat_as, dz_m); NaN outside coverage
        (reference bilinear: src/transformations/gridshift.cpp:337-356)."""
        lon_deg = np.asarray(lon_deg, dtype=np.float64)
        lat_deg = np.asarray(lat_deg, dtype=np.float64)
        rel = self._lon_rel(lon_deg)
        # NaN inputs are gated by `inside`; zero them so the int casts
        # below stay warning-free
        fx = np.nan_to_num(rel / self.dlon)
        fy = np.nan_to_num((lat_deg - self.lat0) / self.dlat)
        inside = self.contains(lon_deg, lat_deg) & np.isfinite(lon_deg) \
            & np.isfinite(lat_deg)
        if self.global_lon:
            base = np.floor(fx)
            c0 = base.astype(np.int64) % self.width
            c1 = (c0 + 1) % self.width
            wx = np.clip(fx - base, 0.0, 1.0)
        else:
            # rel ~ 360 (eps west of lon0) clamps to the first cell
            fx = np.where(fx > self.width - 1, 0.0, fx)
            c0 = np.clip(np.floor(fx), 0, self.width - 2).astype(np.int64)
            c1 = c0 + 1
            wx = np.clip(fx - c0, 0.0, 1.0)
        r0 = np.clip(np.floor(fy), 0, self.height - 2).astype(np.int64)
        c0 = np.where(inside, c0, 0)
        c1 = np.where(inside, c1, 0)
        r0 = np.where(inside, r0, 0)
        wx = np.where(inside, wx, 0.0)
        wy = np.clip(fy - r0, 0.0, 1.0)
        out = []
        for band in (self.dlon_as, self.dlat_as, self.dz_m):
            if band is None:
                out.append(np.where(inside, 0.0, np.nan))
                continue
            # nodata corners (NaN) are excluded and the remaining weights
            # renormalized; all-nodata -> NaN (reference grids.cpp
            # read_vgrid_value:3687-3745, fix for OSGeo/proj.4#1002)
            val = np.zeros(np.shape(wx))
            tot = np.zeros(np.shape(wx))
            for rr, cc, w in ((r0, c0, (1 - wx) * (1 - wy)),
                              (r0, c1, wx * (1 - wy)),
                              (r0 + 1, c0, (1 - wx) * wy),
                              (r0 + 1, c1, wx * wy)):
                v = band[rr, cc]
                ok = np.isfinite(v)
                val = val + np.where(ok, v * w, 0.0)
                tot = tot + np.where(ok, w, 0.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                v = np.where(tot > 0, val / tot, np.nan)
            out.append(np.where(inside, v, np.nan))
        return out


class GridSet:
    """Ordered collection of grids (NTv2 subgrids / +grids=a,b lists).

    ``interp`` resolves each point against the FIRST grid (in priority
    order, children/finer first) whose extent contains it — the
    reference's subgrid selection (grids.hpp gridAt / hgridshift grid
    iteration). Vectorized as masked fills, one pass per member grid.
    """

    def __init__(self, name, grids):
        self.name = name
        # may be EMPTY: all-optional (@grid) members missing. The gridshift
        # operators treat an empty set as pass-through, mirroring the
        # reference's "Only try the gridshift if at least one grid is
        # loaded" (hgridshift.cpp:39-43)
        self.grids = list(grids)

    def contains(self, lon_deg, lat_deg):
        shape = np.broadcast(np.asarray(lon_deg), np.asarray(lat_deg)).shape
        m = np.zeros(shape, dtype=bool)
        for g in self.grids:
            m = m | g.contains(lon_deg, lat_deg)
        return m

    def interp(self, lon_deg, lat_deg):
        lon_deg = np.asarray(lon_deg, dtype=np.float64)
        lat_deg = np.asarray(lat_deg, dtype=np.float64)
        shape = np.broadcast(lon_deg, lat_deg).shape
        outs = [np.full(shape, np.nan) for _ in range(3)]
        unresolved = np.ones(shape, dtype=bool)
        for g in self.grids:
            take = unresolved & g.contains(lon_deg, lat_deg)
            if not np.any(take):
                continue
            vals = g.interp(lon_deg, lat_deg)
            for o, v in zip(outs, vals):
                o[take] = np.broadcast_to(v, shape)[take]
            unresolved &= ~take
        return outs


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------


def parse_ntv2(data: bytes, name: str = "ntv2") -> GridSet:
    """NTv2 .gsb -> GridSet (reference NTv2GridSet::open grids.cpp:2174)."""
    if len(data) < 11 * 16:
        raise ValueError("NTv2 file too short")
    # endianness: NUM_OREC value (int32 at offset 8) is 11 in native order
    le = struct.unpack_from("<i", data, 8)[0] == 11
    bo = "<" if le else ">"
    if data[56:63] != b"SECONDS":
        raise ValueError("only GS_TYPE=SECONDS NTv2 files supported")
    num_sub = struct.unpack_from(bo + "i", data, 40)[0]
    f4 = np.dtype(bo + "f4")
    pos = 11 * 16
    grids = []
    for sub in range(num_sub):
        hdr = data[pos:pos + 11 * 16]
        if hdr[0:8] != b"SUB_NAME":
            raise ValueError("bad NTv2 subgrid header")
        sub_name = hdr[8:16].decode("ascii", "replace").strip()
        parent = hdr[24:32]
        s_lat, n_lat, e_lon, w_lon, lat_inc, lon_inc = (
            struct.unpack_from(bo + "d", hdr, 72 + 16 * i)[0]
            for i in range(6))
        gs_count = struct.unpack_from(bo + "i", hdr, 168)[0]
        # positive-west arcsec -> east-positive degrees
        west = -w_lon * _SEC2DEG
        east = -e_lon * _SEC2DEG
        south = s_lat * _SEC2DEG
        north = n_lat * _SEC2DEG
        cols = int(round((east - west) / (lon_inc * _SEC2DEG))) + 1
        rows = int(round((north - south) / (lat_inc * _SEC2DEG))) + 1
        if cols * rows != gs_count:
            raise ValueError(
                f"NTv2 GS_COUNT {gs_count} != {cols}x{rows}")
        pos += 11 * 16
        nodes = np.frombuffer(data, dtype=f4, count=gs_count * 4,
                              offset=pos).reshape(rows, cols, 4)
        pos += gs_count * 16
        # columns run east->west in the file: flip to west->east
        lat_as = nodes[:, ::-1, 0].astype(np.float64)
        lon_as = -nodes[:, ::-1, 1].astype(np.float64)  # west-positive -> east
        g = FileGrid(f"{name}:{sub_name}", west, south,
                     lon_inc * _SEC2DEG, lat_inc * _SEC2DEG, cols, rows,
                     dlon_as=lon_as, dlat_as=lat_as)
        is_child = parent.strip() not in (b"NONE", b"")
        grids.append((is_child, sub, g))
    # children (finer subgrids) are probed before top-level grids; file
    # order breaks ties (reference picks the deepest matching subgrid)
    grids.sort(key=lambda t: (not t[0], t[1]))
    return GridSet(name, [g for _, _, g in grids])


def parse_gtx(data: bytes, name: str = "gtx") -> FileGrid:
    """GTX .gtx -> vertical FileGrid (reference grids.cpp:242-312)."""
    if len(data) < 40:
        raise ValueError("GTX file too short")
    south, west, dlat, dlon = struct.unpack_from(">4d", data, 0)
    rows, cols = struct.unpack_from(">2i", data, 32)
    if cols <= 0 or rows <= 0 or not (-360 <= west <= 360) \
            or not (-90 <= south <= 90):
        raise ValueError("GTX header has invalid extents")
    if west >= 180.0:
        west -= 360.0
    vals = np.frombuffer(data, dtype=">f4", count=rows * cols,
                         offset=40).reshape(rows, cols).astype(np.float64)
    # nodata: official -88.8888 plus the big-value heuristic
    vals = np.where((np.abs(vals) > 1000.0)
                    | (np.abs(vals - (-88.8888)) < 1e-3), np.nan, vals)
    return FileGrid(name, west, south, dlon, dlat, cols, rows, dz_m=vals)


def parse_ctable2(data: bytes, name: str = "ct2") -> FileGrid:
    """CTable2 .ct2 -> horizontal FileGrid (reference grids.cpp:1966)."""
    if len(data) < 160 or not data.startswith(b"CTABLE V2"):
        raise ValueError("not a CTable2 file")
    west, south, res_x, res_y = struct.unpack_from("<4d", data, 96)
    width, height = struct.unpack_from("<2i", data, 128)
    if width <= 0 or height <= 0:
        raise ValueError("CTable2 header has invalid size")
    nodes = np.frombuffer(data, dtype="<f4", count=width * height * 2,
                          offset=160).reshape(height, width, 2)
    # radians, lon positive-west -> arcsec east-positive
    lon_as = -nodes[:, :, 0].astype(np.float64) * _RAD2AS
    lat_as = nodes[:, :, 1].astype(np.float64) * _RAD2AS
    deg = 180.0 / np.pi
    return FileGrid(name, west * deg, south * deg, res_x * deg, res_y * deg,
                    width, height, dlon_as=lon_as, dlat_as=lat_as)


# ---------------------------------------------------------------------------
# resolver
# ---------------------------------------------------------------------------

_FILE_GRID_CACHE: dict[str, object] = {}
_REGISTERED_PATHS: dict[str, str] = {}


def grid_search_path() -> list[str]:
    """Colon-separated PROJ_SPARK_GRID_PATH (the engine's PROJ_LIB)."""
    p = os.environ.get("PROJ_SPARK_GRID_PATH", "")
    return [d for d in p.split(":") if d]


def register_grid_file(name: str, path: str) -> None:
    """Pin a grid name to an explicit file path (takes precedence over the
    search path)."""
    _REGISTERED_PATHS[name] = path
    _FILE_GRID_CACHE.pop(name, None)


class NullGrid(FileGrid):
    """The built-in ``null`` grid: global coverage, zero shift (reference
    grids.cpp NullVerticalShiftGrid / the special "null" grid name)."""

    def __init__(self):
        super().__init__("null", -180.0, -90.0, 360.0, 180.0, 2, 2,
                         dz_m=np.zeros((2, 2)))

    def interp(self, lon_deg, lat_deg):
        shape = np.broadcast(np.asarray(lon_deg), np.asarray(lat_deg)).shape
        return [np.zeros(shape), np.zeros(shape), np.zeros(shape)]

    def contains(self, lon_deg, lat_deg):
        shape = np.broadcast(np.asarray(lon_deg), np.asarray(lat_deg)).shape
        return np.ones(shape, dtype=bool)


def load_grid_file(name: str):
    """Resolve + parse a grid file by name; cached per-process. The format
    is sniffed from content (magic/extension), mirroring the reference's
    open-by-signature dispatch (grids.cpp grid open functions)."""
    if name == "null":
        return NullGrid()
    if name in _FILE_GRID_CACHE:
        return _FILE_GRID_CACHE[name]
    path = _REGISTERED_PATHS.get(name)
    if path is None:
        base = os.path.basename(name)
        for d in grid_search_path():
            for cand in (os.path.join(d, name), os.path.join(d, base)):
                if os.path.isfile(cand):
                    path = cand
                    break
            if path:
                break
    if path is None or not os.path.isfile(path):
        raise KeyError(f"grid file {name!r} not found "
                       f"(search path {grid_search_path()})")
    with open(path, "rb") as f:
        data = f.read()
    if data.startswith(b"CTABLE V2"):
        g = parse_ctable2(data, name)
    elif data[0:8] == b"NUM_OREC":
        g = parse_ntv2(data, name)
    elif name.endswith(".gtx") or len(data) >= 40 and _looks_gtx(data):
        g = parse_gtx(data, name)
    else:
        raise ValueError(f"unrecognized grid format for {name!r}")
    _FILE_GRID_CACHE[name] = g
    return g


def _looks_gtx(data: bytes) -> bool:
    try:
        south, west, dlat, dlon = struct.unpack_from(">4d", data, 0)
        rows, cols = struct.unpack_from(">2i", data, 32)
    except struct.error:
        return False
    return (0 < rows < 100000 and 0 < cols < 100000
            and -90 <= south <= 90 and -360 <= west <= 360
            and 0 < dlat < 90 and 0 < dlon < 90
            and len(data) >= 40 + 4 * rows * cols)
