"""Final registry batch: sch, horner, unified gridshift, xyzgridshift,
deformation, tinshift.

Vectorized numpy reimplementations of:
- sch.cpp (JPL Spherical Cross-track Height for SAR: peg-point rotation to
  a local osculating sphere)
- transformations/horner.cpp (Poder/Engsager 2D Horner polynomials, real
  and complex, with explicit or iterative inverses)
- transformations/gridshift.cpp (unified n-band geographic grid shift:
  horizontal arcsec + vertical metres; iterative inverse, MAX_ITERATIONS
  10 :601)
- transformations/xyzgridshift.cpp (geocentric-domain translation grid)
- transformations/deformation.cpp (ENU velocity-grid integration
  X_out = X_in + dt * DX in cartesian space)
- transformations/tinshift.cpp (triangulated irregular network shift,
  barycentric interpolation)

Grid-backed operators read the engine's synthetic grid registry
(kernels/gridshift.py get_grid) — the reference's grid FILES (gsb/gtx/tif)
are external data and out of scope; TINs come from an embedded registry the
same way.
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    parse_angle,
    U_RADIANS,
    U_CLASSIC,
    U_CARTESIAN,
    U_WHATEVER,
)
from .core import DEG_TO_RAD, RAD_TO_DEG
from .gridshift import get_grid


@register
class Sch(Operator):
    """Spherical Cross-track Height (reference sch.cpp); +plat_0 +plon_0
    +phdg_0 [+h_0]."""

    name = "sch"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        from .cartgeo import Cart
        p = self.params
        for k in ("plat_0", "plon_0", "phdg_0"):
            if k not in p:
                raise ValueError(f"sch requires +{k}")
        self.plat = parse_angle(p["plat_0"]) * DEG_TO_RAD
        self.plon = parse_angle(p["plon_0"]) * DEG_TO_RAD
        self.phdg = parse_angle(p["phdg_0"]) * DEG_TO_RAD
        self.h0 = float(p.get("h_0", 0.0))
        ell_keys = ("ellps", "a", "b", "rf", "f", "es", "R", "datum")
        self.cart = Cart({"proj": "cart", "_no_datum_shift": True,
                          **{k: p[k] for k in ell_keys if k in p}})
        clt, slt = np.cos(self.plat), np.sin(self.plat)
        clo, slo = np.cos(self.plon), np.sin(self.plon)
        es, a = self.ell.es, self.ell.a
        temp = np.sqrt(1.0 - es * slt * slt)
        reast = a / temp
        rnorth = a * (1.0 - es) / temp ** 3
        chdg, shdg = np.cos(self.phdg), np.sin(self.phdg)
        self.rcurv = self.h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg)
        # rotation matrix (sch.cpp transMat)
        self.M = np.array([
            [clt * clo, -shdg * slo - slt * clo * chdg,
             slo * chdg - slt * clo * shdg],
            [clt * slo, clo * shdg - slt * slo * chdg,
             -clo * chdg - slt * slo * shdg],
            [slt, clt * chdg, clt * shdg]])
        X, Y, Z, _ = self.cart._fwd(np.array([self.plon]),
                                    np.array([self.plat]),
                                    np.array([self.h0]), np.zeros(1))
        self.off = np.array([float(X[0]) - self.rcurv * clt * clo,
                             float(Y[0]) - self.rcurv * clt * slo,
                             float(Z[0]) - self.rcurv * slt])

    def _fwd(self, lam, phi, z, t):
        X, Y, Z, _ = self.cart._fwd(lam, phi, z, t)
        X = X - self.off[0]
        Y = Y - self.off[1]
        Z = Z - self.off[2]
        M = self.M
        lx = M[0, 0] * X + M[1, 0] * Y + M[2, 0] * Z
        ly = M[0, 1] * X + M[1, 1] * Y + M[2, 1] * Z
        lz = M[0, 2] * X + M[1, 2] * Y + M[2, 2] * Z
        r = np.sqrt(lx * lx + ly * ly + lz * lz)
        lam_l = np.arctan2(ly, lx)
        phi_l = np.arcsin(np.clip(lz / r, -1.0, 1.0))
        h = r - self.rcurv
        scale = self.rcurv / self.ell.a
        return lam_l * scale, phi_l * scale, h, t

    def _inv(self, s, c, h, t):
        scale = self.ell.a / self.rcurv
        lam_l = s * scale
        phi_l = c * scale
        r = self.rcurv + h
        lx = r * np.cos(phi_l) * np.cos(lam_l)
        ly = r * np.cos(phi_l) * np.sin(lam_l)
        lz = r * np.sin(phi_l)
        M = self.M
        X = M[0, 0] * lx + M[0, 1] * ly + M[0, 2] * lz + self.off[0]
        Y = M[1, 0] * lx + M[1, 1] * ly + M[1, 2] * lz + self.off[1]
        Z = M[2, 0] * lx + M[2, 1] * ly + M[2, 2] * lz + self.off[2]
        lam, phi, z, _ = self.cart._inv(X, Y, Z, t)
        return lam, phi, z, t


def _horner_real_eval(order, cx, cy, e, n):
    """double_real_horner_eval (horner.cpp:118-145), vectorized over
    points; reverse summation for numerical stability."""
    sz = (order + 1) * (order + 2) // 2
    ix = sz
    iy = sz
    iy -= 1
    N = np.full_like(e, cy[iy])
    ix -= 1
    E = np.full_like(e, cx[ix])
    for r in range(order, 0, -1):
        iy -= 1
        u = np.full_like(e, cy[iy])
        ix -= 1
        v = np.full_like(e, cx[ix])
        for _c in range(order, r - 1, -1):
            iy -= 1
            u = n * u + cy[iy]
            ix -= 1
            v = e * v + cx[ix]
        N = e * N + u
        E = n * E + v
    return E, N

def _horner_real_eval_offset1(order, cx, cy, e, n):
    """order_offset=1 variant used by the iterative inverse Jacobian."""
    sz = (order + 1) * (order + 2) // 2
    ix = sz
    iy = sz
    iy -= 1
    N = np.full_like(e, cy[iy])
    ix -= 1
    E = np.full_like(e, cx[ix])
    for r in range(order, 1, -1):
        iy -= 1
        u = np.full_like(e, cy[iy])
        ix -= 1
        v = np.full_like(e, cx[ix])
        for _c in range(order, r - 1, -1):
            iy -= 1
            u = n * u + cy[iy]
            ix -= 1
            v = e * v + cx[ix]
        N = e * N + u
        E = n * E + v
    return E, N


def _horner_single_eval_offset1(order, cx, x):
    i = order + 1
    i -= 1
    u = np.full_like(x, cx[i])
    for _r in range(order, 1, -1):
        i -= 1
        u = x * u + cx[i]
    return u


def _complex_eval(order, c, e, n, offset=0):
    """complex_horner_eval (horner.cpp:149-165)."""
    sz = 2 * order + 2
    i = sz
    i -= 1
    E = np.full_like(e, c[i])
    i -= 1
    N = np.full_like(e, c[i])
    while i > offset * 2:
        i -= 1
        w = n * E + e * N + c[i]
        i -= 1
        N = n * N - e * E + c[i]
        E = w
    return E, N


@register
class Horner(Operator):
    """Poder/Engsager 2D Horner polynomial transformation (reference
    transformations/horner.cpp); +deg plus +fwd_u/+fwd_v/+inv_u/+inv_v (or
    complex +fwd_c/+inv_c with +uneg/+vneg), +fwd_origin/+inv_origin,
    +range (default 500000), +inv_tolerance (default 0.001)."""

    name = "horner"
    left = U_WHATEVER
    right = U_WHATEVER

    @staticmethod
    def _coefs(p, key, n):
        if key not in p:
            return None
        vals = [float(v) for v in str(p[key]).split(",")]
        if len(vals) != n:
            raise ValueError(f"horner +{key} needs {n} coefficients")
        return np.array(vals)

    def setup(self):
        p = self.params
        if "deg" not in p:
            raise ValueError("horner requires +deg")
        self.deg = int(p["deg"])
        if not 0 <= self.deg <= 10000:
            raise ValueError("horner +deg out of range")
        self.range = float(p.get("range", 500000.0))
        self.tol = float(p.get("inv_tolerance", 0.001))
        self.complex_poly = "fwd_c" in p or "inv_c" in p
        if self.complex_poly:
            n = 2 * self.deg + 2
            self.fwd_c = self._coefs(p, "fwd_c", n)
            self.inv_c = self._coefs(p, "inv_c", n)
            if self.fwd_c is None:
                raise ValueError("horner requires +fwd_c")
            self.uneg = "uneg" in p
            self.vneg = "vneg" in p
            self.explicit_inv = self.inv_c is not None or "inv_origin" in p
        else:
            n = (self.deg + 1) * (self.deg + 2) // 2
            self.fwd_u = self._coefs(p, "fwd_u", n)
            self.fwd_v = self._coefs(p, "fwd_v", n)
            self.inv_u = self._coefs(p, "inv_u", n)
            self.inv_v = self._coefs(p, "inv_v", n)
            if self.fwd_u is None or self.fwd_v is None:
                raise ValueError("horner requires +fwd_u and +fwd_v")
            self.explicit_inv = (self.inv_u is not None
                                 or self.inv_v is not None
                                 or "inv_origin" in p)
        self.fwd_origin = self._coefs(p, "fwd_origin", 2)
        if self.fwd_origin is None:
            self.fwd_origin = np.zeros(2)
        self.inv_origin = self._coefs(p, "inv_origin", 2)
        if self.inv_origin is None:
            self.inv_origin = np.zeros(2)

    def _range_guard(self, e, n, u, v):
        bad = (np.abs(n) > self.range) | (np.abs(e) > self.range)
        return np.where(bad, np.nan, u), np.where(bad, np.nan, v)

    def _fwd(self, x, y, z, t):
        e = x - self.fwd_origin[0]
        n = y - self.fwd_origin[1]
        if self.complex_poly:
            if self.uneg:
                e = -e
            if self.vneg:
                n = -n
            E, N = _complex_eval(self.deg, self.fwd_c, e, n)
        else:
            E, N = _horner_real_eval(self.deg, self.fwd_u, self.fwd_v, e, n)
        E, N = self._range_guard(e, n, E, N)
        return E, N, z, t

    def _inv(self, x, y, z, t):
        if self.explicit_inv:
            e = x - self.inv_origin[0]
            n = y - self.inv_origin[1]
            if self.complex_poly:
                if self.uneg:
                    e = -e
                if self.vneg:
                    n = -n
                E, N = _complex_eval(self.deg, self.inv_c, e, n)
            else:
                E, N = _horner_real_eval(self.deg, self.inv_u, self.inv_v,
                                         e, n)
            E, N = self._range_guard(e, n, E, N)
            return E, N, z, t
        # iterative inverse against the forward polynomial
        # (horner.cpp real_iterative_inverse_impl / complex variant)
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.complex_poly:
                dN = y - self.fwd_c[0]
                dE = x - self.fwd_c[1]
                w0r = np.zeros_like(x)  # N component
                w0i = np.zeros_like(x)  # E component
                for _ in range(32):
                    Ej, Nj = _complex_eval(self.deg, self.fwd_c, w0i, w0r,
                                           offset=1)
                    det2 = Nj * Nj + Ej * Ej
                    w1r = (dN * Nj + dE * Ej) / det2
                    w1i = (dE * Nj - dN * Ej) / det2
                    conv = (np.abs(w1r - w0r) < self.tol) & \
                        (np.abs(w1i - w0i) < self.tol)
                    w0r, w0i = w1r, w1i
                    if np.all(conv):
                        break
                E = np.where(self.uneg, -w0i, w0i) if self.uneg else w0i
                N = np.where(self.vneg, -w0r, w0r) if self.vneg else w0r
                return (E + self.fwd_origin[0], N + self.fwd_origin[1], z, t)
            de = x - self.fwd_u[0]
            dn = y - self.fwd_v[0]
            x0 = np.zeros_like(x)
            y0 = np.zeros_like(x)
            for _ in range(32):
                Mb, Mc = _horner_real_eval_offset1(self.deg, self.fwd_u,
                                                   self.fwd_v, x0, y0)
                Ma = _horner_single_eval_offset1(self.deg, self.fwd_u, x0)
                Md = _horner_single_eval_offset1(self.deg, self.fwd_v, y0)
                idet = 1.0 / (Ma * Md - Mb * Mc)
                x1 = idet * (Md * de - Mb * dn)
                y1 = idet * (Ma * dn - Mc * de)
                conv = (np.abs(x1 - x0) < self.tol) & \
                    (np.abs(y1 - y0) < self.tol)
                x0, y0 = x1, y1
                if np.all(conv):
                    break
            return (x0 + self.fwd_origin[0], y0 + self.fwd_origin[1], z, t)


@register
class GridshiftUnified(Operator):
    """Unified n-band grid shift (reference
    transformations/gridshift.cpp): horizontal offsets in arcsec +
    vertical offset in metres from one grid; iterative inverse
    (MAX_ITERATIONS 10, gridshift.cpp:601). Grids come from the synthetic
    registry; ``+no_z_transform`` limits to the horizontal bands."""

    name = "gridshift"
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        if "grids" not in self.params:
            from ..errors import missing_arg
            missing_arg("gridshift: +grids parameter missing")
        self.grid = get_grid(str(self.params["grids"]))
        self.no_z = "no_z_transform" in self.params
        self.multiplier = float(self.params.get("multiplier", 1.0))
        # projected-CRS grids (easting/northing offsets in metres): io
        # units become PROJECTED and interpolation runs in the raw x/y
        # frame (reference gridshift.cpp:1003-1004); the per-axis
        # constant_offset is added after the shift on fwd and removed
        # from the input on inv (gridshift.cpp:846-847, 863-864)
        members = getattr(self.grid, "grids", [self.grid])
        self.proj_grid = any(getattr(m, "projected", False) for m in members)
        self.const_xy = next((m.const_xy for m in members
                              if any(getattr(m, "const_xy", (0, 0)))),
                             (0.0, 0.0))
        if self.proj_grid:
            from ..ops import U_PROJECTED
            self.left = U_PROJECTED
            self.right = U_PROJECTED
        # method resolution (reference gridshift.cpp:337-341): explicit
        # +interpolation > the grid's own interpolation_method metadata >
        # bilinear. Synthetic registry grids have no metadata, keeping
        # their SQL-mirrored bilinear oracles.
        self.method = self.params.get("interpolation")
        if self.method is not None:
            self.method = str(self.method)
            if self.method not in ("bilinear", "biquadratic"):
                from ..errors import ProjError, INVALID_OP_ILLEGAL_ARG_VALUE
                raise ProjError("unsupported +interpolation",
                                INVALID_OP_ILLEGAL_ARG_VALUE)

    def _effective_method(self) -> str:
        if self.method:
            return self.method
        g = self.grid
        from ..gridfiles import GridSet
        if isinstance(g, GridSet):
            if any(getattr(m, "interp_default", "") == "biquadratic"
                   for m in g.grids):
                return "biquadratic"
            return "bilinear"
        return getattr(g, "interp_default", "") or "bilinear"

    def _interp(self, lam, phi):
        # projected grids interpolate in the raw x/y metre frame
        k = 1.0 if self.proj_grid else RAD_TO_DEG
        g = self.grid
        from ..gridfiles import GridSet
        if isinstance(g, GridSet):
            return g.interp(lam * k, phi * k, method=self.method)
        m = self.method or getattr(g, "interp_default", "") or "bilinear"
        if m == "biquadratic" and hasattr(g, "interp_bq"):
            return g.interp_bq(lam * k, phi * k)
        return g.interp(lam * k, phi * k)

    def _fwd(self, lam, phi, z, t):
        dlon_as, dlat_as, dz = self._interp(lam, phi)
        # geographic grids: arcsec -> radians; projected: metres, raw
        s = 1.0 if self.proj_grid else DEG_TO_RAD / 3600.0
        cx, cy = self.const_xy
        out_z = z if self.no_z else z + self.multiplier * dz
        return (lam + dlon_as * s + cx, phi + dlat_as * s + cy, out_z, t)

    def _inv(self, lam, phi, z, t):
        s = 1.0 if self.proj_grid else DEG_TO_RAD / 3600.0
        cx, cy = self.const_xy
        lam = lam - cx
        phi = phi - cy
        if self._effective_method() == "biquadratic":
            # reference gridshift.cpp:647-658 (NOAA NCAT convention): NO
            # iteration in the biquadratic reverse path — near cell /
            # half-cell boundaries the interpolation window changes and
            # the fixed point oscillates. One-shot: guess = in - shift(in)
            dlon_as, dlat_as, dz = self._interp(lam, phi)
            out_z = z if self.no_z else z - self.multiplier * dz
            return lam - dlon_as * s, phi - dlat_as * s, out_z, t
        lam_c, phi_c = lam.copy(), phi.copy()
        dz = np.zeros_like(z)
        for _ in range(10):
            dlon_as, dlat_as, dz = self._interp(lam_c, phi_c)
            lam_c = lam - dlon_as * s
            phi_c = phi - dlat_as * s
        out_z = z if self.no_z else z - self.multiplier * dz
        return lam_c, phi_c, out_z, t


@register
class Xyzgridshift(Operator):
    """Geocentric-domain grid shift (reference
    transformations/xyzgridshift.cpp): per-point (dx, dy, dz) metre
    translations looked up at the geodetic position; grid values come from
    the synthetic registry's three bands. ``+grid_ref=output_crs`` runs
    the iterative adjustment (xyzgridshift.cpp iterative_adjustment)."""

    name = "xyzgridshift"
    left = U_CARTESIAN
    right = U_CARTESIAN

    def setup(self):
        from .cartgeo import Cart
        p = self.params
        self.grid = get_grid(str(p.get("grids", "synthetic_world")))
        self.multiplier = float(p.get("multiplier", 1.0))
        self.grid_ref_output = str(p.get("grid_ref", "input_crs")) == \
            "output_crs"
        ell_keys = ("ellps", "a", "b", "rf", "f", "es", "R", "datum")
        self.cart = Cart({"proj": "cart", "_no_datum_shift": True,
                          **{k: p[k] for k in ell_keys if k in p}})

    def _delta(self, X, Y, Z, t):
        lam, phi, _, _ = self.cart._inv(X, Y, Z, t)
        dx, dy, dz = self.grid.interp(lam * RAD_TO_DEG, phi * RAD_TO_DEG)
        return (dx * self.multiplier, dy * self.multiplier,
                dz * self.multiplier)

    def _apply(self, X, Y, Z, t, factor):
        if not self.grid_ref_output:
            dx, dy, dz = self._delta(X, Y, Z, t)
            return X + factor * dx, Y + factor * dy, Z + factor * dz
        # lookup position is in the output frame: iterate
        oX, oY, oZ = X, Y, Z
        for _ in range(10):
            dx, dy, dz = self._delta(oX, oY, oZ, t)
            nX = X + factor * dx
            nY = Y + factor * dy
            nZ = Z + factor * dz
            err = (nX - oX) ** 2 + (nY - oY) ** 2 + (nZ - oZ) ** 2
            oX, oY, oZ = nX, nY, nZ
            if np.all(err[np.isfinite(err)] < 1e-10):
                break
        return oX, oY, oZ

    def _fwd(self, X, Y, Z, t):
        if self.grid_ref_output:
            oX, oY, oZ = self._apply(X, Y, Z, t, 1.0)
        else:
            dx, dy, dz = self._delta(X, Y, Z, t)
            oX, oY, oZ = X + dx, Y + dy, Z + dz
        return oX, oY, oZ, t

    def _inv(self, X, Y, Z, t):
        if not self.grid_ref_output:
            oX, oY, oZ = self._apply(X, Y, Z, t, -1.0)
        else:
            dx, dy, dz = self._delta(X, Y, Z, t)
            oX, oY, oZ = X - dx, Y - dy, Z - dz
        return oX, oY, oZ, t


@register
class Deformation(Operator):
    """Kinematic deformation-velocity shift (reference
    transformations/deformation.cpp): X_out = X_in + dt * V with V an ENU
    velocity field (synthetic registry bands read as mm/yr) rotated to
    cartesian; +dt or (+t_epoch and per-point t); inverse iterates
    (deformation.cpp:MAX_ITERATIONS 10)."""

    name = "deformation"
    left = U_CARTESIAN
    right = U_CARTESIAN

    def setup(self):
        from ..errors import INVALID_OP_MISSING_ARG, ProjError
        from .cartgeo import Cart
        p = self.params
        has_grids = "grids" in p
        has_xy = "xy_grids" in p
        has_z = "z_grids" in p
        if not has_grids and not (has_xy and has_z):
            # deformation.cpp:349-357
            raise ProjError("deformation: either +grids or (+xy_grids and "
                            "+z_grids) should be specified",
                            INVALID_OP_MISSING_ARG)
        if has_grids:
            # 3-band velocity grid: registry name or east/north/up_velocity
            # GeoTIFF (deformation.cpp:83-134), values mm/yr
            self.grid = get_grid(str(p["grids"]))
            self.hgrid = self.vgrid = None
        else:
            # split horizontal (ct2/gsb, values are the raw radian-domain
            # hgrid numbers reused as mm/yr — deformation.cpp:171-181:
            # shift.lp = pj_hgrid_value(...); /= 1000) + vertical (gtx)
            self.hgrid = get_grid(str(p["xy_grids"]))
            self.vgrid = get_grid(str(p["z_grids"]))
            self.grid = self.hgrid  # extent for errno classification
        # grid resolution precedes the dt check (deformation.cpp:360-390:
        # grid init errors win over the later +dt/+t_epoch validation)
        if "dt" not in p and "t_epoch" not in p:
            raise ValueError("deformation needs +dt or +t_epoch")
        self.dt = float(p["dt"]) if "dt" in p else None
        self.t_epoch = float(p["t_epoch"]) if "t_epoch" in p else None
        ell_keys = ("ellps", "a", "b", "rf", "f", "es", "R", "datum")
        self.cart = Cart({"proj": "cart", "_no_datum_shift": True,
                          **{k: p[k] for k in ell_keys if k in p}})

    def _dt_of(self, t):
        if self.dt is not None:
            return self.dt
        return t - self.t_epoch

    def _velocity(self, X, Y, Z, t):
        lam, phi, _, _ = self.cart._inv(X, Y, Z, t)
        if self.hgrid is not None:
            # the reference reads the RAW stored hgrid numbers
            # (pj_hgrid_value -> interpolate with
            # compensateNTConvention=false, grids.cpp:3535-3564) and reuses
            # them as mm/yr. Our parser stores arcsec east-positive (the
            # NT-compensated apply convention), so undo both the arcsec
            # scaling and the lon negation before /1000
            as2rad = DEG_TO_RAD / 3600.0
            ve_r, vn_r, _ = self.hgrid.interp(lam * RAD_TO_DEG,
                                              phi * RAD_TO_DEG)
            _, _, vu_m = self.vgrid.interp(lam * RAD_TO_DEG,
                                           phi * RAD_TO_DEG)
            ve = -ve_r * as2rad / 1000.0
            vn = vn_r * as2rad / 1000.0
            vu = vu_m / 1000.0
        else:
            ve, vn, vu = self.grid.interp(lam * RAD_TO_DEG, phi * RAD_TO_DEG)
            ve, vn, vu = ve / 1000.0, vn / 1000.0, vu / 1000.0  # mm -> m/yr
        sp, cp = np.sin(phi), np.cos(phi)
        sl, cl = np.sin(lam), np.cos(lam)
        # ENU -> XYZ (deformation.cpp:147-153)
        vx = -sp * cl * vn - sl * ve + cp * cl * vu
        vy = -sp * sl * vn + cl * ve + cp * sl * vu
        vz = cp * vn + sp * vu
        return vx, vy, vz

    def _fwd(self, X, Y, Z, t):
        dt = self._dt_of(t)
        vx, vy, vz = self._velocity(X, Y, Z, t)
        return X + dt * vx, Y + dt * vy, Z + dt * vz, t

    def _inv(self, X, Y, Z, t):
        dt = self._dt_of(t)
        vx, vy, vz = self._velocity(X, Y, Z, t)
        z0 = vz
        oX = X - dt * vx
        oY = Y - dt * vy
        oZ = Z + dt * vz
        for _ in range(10):
            vx, vy, vz = self._velocity(oX, oY, oZ, t)
            difx = oX + dt * vx - X
            dify = oY + dt * vy - Y
            difz = oZ - dt * vz - Z
            oX = oX + difx
            oY = oY + dify
            oZ = oZ + difz
            h = np.hypot(difx, dify)
            if np.all(h[np.isfinite(h)] <= 1e-8):
                break
        oZ = Z - dt * z0
        return oX, oY, oZ, t


# embedded synthetic triangulations (the reference's tinshift reads a JSON
# master file, src/transformations/tinshift.hpp; external files are out of
# scope so the registry carries the same structure inline)
_TINS = {
    "synthetic_tin": {
        # vertices: (lon_deg, lat_deg, dlon_deg, dlat_deg, dz_m)
        "vertices": [
            (0.0, 0.0, 1e-4, -2e-4, 0.5),
            (2.0, 0.0, 2e-4, 1e-4, 0.7),
            (2.0, 2.0, -1e-4, 2e-4, 0.2),
            (0.0, 2.0, 3e-4, -1e-4, -0.3),
            (1.0, 3.0, 0.0, 5e-4, 1.0),
        ],
        "triangles": [(0, 1, 2), (0, 2, 3), (3, 2, 4)],
    },
}


@register
class Tinshift(Operator):
    """Triangulated-network shift (reference
    transformations/tinshift.cpp/_impl.hpp): locate the triangle containing
    each point (the reference uses its quadtree, quadtree.hpp:85-123; the
    TINs here are small enough that a vectorized all-triangles barycentric
    sweep is the same math without the index — at the reference's largest
    real TIN, 115k triangles, the scale path is a uniform bucket grid over
    triangle AABBs, same pattern as the engine's S2 cell join), then
    barycentric-interpolate.

    Two modes: ``+file=<registry name>``/``+tins=`` uses the embedded
    synthetic registry (degree offsets, radians io); ``+file=<path.json>``
    loads a real triangulation file (tinshift_impl.hpp:60-358) and runs in
    raw source-CRS units (tinshift.cpp:132-133 PJ_IO_UNITS_WHATEVER):
    horizontal component maps source->target coordinates through the
    source-side triangle, vertical adds the interpolated z offset;
    ``fallback_strategy`` nearest_side / nearest_centroid picks the
    closest triangle for points outside the TIN (_impl.hpp:496-591)."""

    name = "tinshift"
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        from ..errors import INVALID_OP_MISSING_ARG, ProjError
        if "file" not in self.params and "tins" not in self.params:
            raise ProjError("tinshift: +file= should be specified",
                            INVALID_OP_MISSING_ARG)
        name = str(self.params.get("file", self.params.get("tins")))
        if name not in _TINS:
            from .jsonfiles import load_tinshift
            self.tin = load_tinshift(name)
            self.mode = "json"
            self.left = U_WHATEVER
            self.right = U_WHATEVER
            return
        self.mode = "registry"
        tin = _TINS[name]
        v = np.array(tin["vertices"], dtype=np.float64)
        self.vx = v[:, 0]
        self.vy = v[:, 1]
        self.dlon = v[:, 2]
        self.dlat = v[:, 3]
        self.dz = v[:, 4]
        self.tris = np.array(tin["triangles"], dtype=np.int64)

    # --- real-file mode (raw units) -------------------------------------
    def _find_json(self, x, y, use_target):
        """Per-point containing triangle + barycentric coords
        (tinshift_impl.hpp FindTriangle:453-591). Returns (l1, l2, l3,
        tri_idx) with tri_idx -1 where no triangle applies."""
        tin = self.tin
        px = tin["tx"] if use_target else tin["sx"]
        py = tin["ty"] if use_target else tin["sy"]
        tris = tin["tris"]
        n = x.shape[0]
        l1 = np.full(n, np.nan)
        l2 = np.full(n, np.nan)
        idx = np.full(n, -1, dtype=np.int64)
        eps = 1e-10
        for ti, (i, j, k) in enumerate(tris):
            x1, y1, x2, y2, x3, y3 = px[i], py[i], px[j], py[j], px[k], py[k]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            a = ((y2 - y3) * (x - x3) + (x3 - x2) * (y - y3)) / det
            b = ((y3 - y1) * (x - x3) + (x1 - x3) * (y - y3)) / det
            c = 1.0 - a - b
            hit = ((idx < 0) & (a >= -eps) & (a <= 1 + eps)
                   & (b >= -eps) & (b <= 1 + eps) & (c >= 0))
            if np.any(hit):
                l1 = np.where(hit, a, l1)
                l2 = np.where(hit, b, l2)
                idx = np.where(hit, ti, idx)
        miss = idx < 0
        if tin["fallback"] != "none" and np.any(miss):
            l1m, l2m, im = self._fallback_json(x[miss], y[miss], px, py)
            l1[miss] = l1m
            l2[miss] = l2m
            idx[miss] = im
        return l1, l2, 1.0 - l1 - l2, idx

    def _fallback_json(self, x, y, px, py):
        """Nearest triangle by side or centroid distance
        (tinshift_impl.hpp:499-591), vectorized across points."""
        tin = self.tin
        tris = tin["tris"]
        eps = 1e-10
        best = np.full(x.shape[0], np.inf)
        best_i = np.zeros(x.shape[0], dtype=np.int64)
        for ti, (i, j, k) in enumerate(tris):
            x1, y1, x2, y2, x3, y3 = px[i], py[i], px[j], py[j], px[k], py[k]
            d12 = (x1 - x2) ** 2 + (y1 - y2) ** 2
            d23 = (x2 - x3) ** 2 + (y2 - y3) ** 2
            d13 = (x1 - x3) ** 2 + (y1 - y3) ** 2
            if d12 < eps or d23 < eps or d13 < eps:
                continue  # degenerate triangle
            if tin["fallback"] == "nearest_side":
                d = np.minimum(
                    _seg_dist2(x, y, x1, y1, x2, y2, d12),
                    np.minimum(_seg_dist2(x, y, x2, y2, x3, y3, d23),
                               _seg_dist2(x, y, x1, y1, x3, y3, d13)))
            else:  # nearest_centroid
                cx = (x1 + x2 + x3) / 3.0
                cy = (y1 + y2 + y3) / 3.0
                d = (x - cx) ** 2 + (y - cy) ** 2
            win = d < best
            best = np.where(win, d, best)
            best_i = np.where(win, ti, best_i)
        l1 = np.full(x.shape[0], np.nan)
        l2 = np.full(x.shape[0], np.nan)
        out_i = np.full(x.shape[0], -1, dtype=np.int64)
        for ti in np.unique(best_i[np.isfinite(best)]):
            m = (best_i == ti) & np.isfinite(best)
            i, j, k = tris[ti]
            x1, y1, x2, y2, x3, y3 = px[i], py[i], px[j], py[j], px[k], py[k]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            if abs(det) < eps:
                continue  # nearest triangle degenerate -> no result
            l1[m] = ((y2 - y3) * (x[m] - x3) + (x3 - x2) * (y[m] - y3)) / det
            l2[m] = ((y3 - y1) * (x[m] - x3) + (x1 - x3) * (y[m] - y3)) / det
            out_i[m] = ti
        return l1, l2, out_i

    def _apply_json(self, x, y, z, forward):
        tin = self.tin
        tris = tin["tris"]
        # forward locates in source coords; inverse in target coords —
        # except vertical-only TINs, which always locate in source coords
        # (tinshift_impl.hpp:639-651)
        use_target = (not forward) and tin["horizontal"]
        l1, l2, l3, idx = self._find_json(x, y, use_target)
        ok = idx >= 0
        safe = np.where(ok, idx, 0)
        i1, i2, i3 = tris[safe, 0], tris[safe, 1], tris[safe, 2]
        if tin["horizontal"]:
            ox = tin["sx"] if not forward else tin["tx"]
            oy = tin["sy"] if not forward else tin["ty"]
            x_out = l1 * ox[i1] + l2 * ox[i2] + l3 * ox[i3]
            y_out = l1 * oy[i1] + l2 * oy[i2] + l3 * oy[i3]
        else:
            x_out, y_out = x.copy(), y.copy()
        z_out = z.copy()
        if tin["vertical"]:
            dz = l1 * tin["dz"][i1] + l2 * tin["dz"][i2] + l3 * tin["dz"][i3]
            z_out = z + (dz if forward else -dz)
        bad = ~ok
        x_out = np.where(bad, np.nan, x_out)
        y_out = np.where(bad, np.nan, y_out)
        z_out = np.where(bad, np.nan, z_out)
        return x_out, y_out, z_out

    def _interp(self, lon_deg, lat_deg):
        n = lon_deg.shape[0]
        out_dlon = np.full(n, np.nan)
        out_dlat = np.full(n, np.nan)
        out_dz = np.full(n, np.nan)
        found = np.zeros(n, dtype=bool)
        for i, j, k in self.tris:
            x1, y1 = self.vx[i], self.vy[i]
            x2, y2 = self.vx[j], self.vy[j]
            x3, y3 = self.vx[k], self.vy[k]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            l1 = ((y2 - y3) * (lon_deg - x3) + (x3 - x2) * (lat_deg - y3)) \
                / det
            l2 = ((y3 - y1) * (lon_deg - x3) + (x1 - x3) * (lat_deg - y3)) \
                / det
            l3 = 1.0 - l1 - l2
            eps = -1e-12
            inside = (~found) & (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
            if not np.any(inside):
                continue
            out_dlon = np.where(inside, l1 * self.dlon[i] + l2 * self.dlon[j]
                                + l3 * self.dlon[k], out_dlon)
            out_dlat = np.where(inside, l1 * self.dlat[i] + l2 * self.dlat[j]
                                + l3 * self.dlat[k], out_dlat)
            out_dz = np.where(inside, l1 * self.dz[i] + l2 * self.dz[j]
                              + l3 * self.dz[k], out_dz)
            found |= inside
        return out_dlon, out_dlat, out_dz

    def _fwd(self, lam, phi, z, t):
        if self.mode == "json":
            x, y, zz = self._apply_json(lam, phi, z, forward=True)
            return x, y, zz, t
        dlon, dlat, dz = self._interp(lam * RAD_TO_DEG, phi * RAD_TO_DEG)
        return (lam + dlon * DEG_TO_RAD, phi + dlat * DEG_TO_RAD,
                z + dz, t)

    def _inv(self, lam, phi, z, t):
        if self.mode == "json":
            x, y, zz = self._apply_json(lam, phi, z, forward=False)
            return x, y, zz, t
        lam_c, phi_c = lam.copy(), phi.copy()
        dz = np.zeros_like(z)
        for _ in range(10):
            dlon, dlat, dz = self._interp(lam_c * RAD_TO_DEG,
                                          phi_c * RAD_TO_DEG)
            lam_c = lam - dlon * DEG_TO_RAD
            phi_c = phi - dlat * DEG_TO_RAD
        return lam_c, phi_c, z - dz, t


def _seg_dist2(x, y, x1, y1, x2, y2, d12):
    """Squared distance from (x, y) to segment (x1,y1)-(x2,y2)
    (tinshift_impl.hpp:436-451), vectorized over points."""
    tt = np.clip(((x - x1) * (x2 - x1) + (y - y1) * (y2 - y1)) / d12, 0.0, 1.0)
    qx = x1 + tt * (x2 - x1)
    qy = y1 + tt * (y2 - y1)
    return (x - qx) ** 2 + (y - qy) ** 2


# embedded deformation models (the reference's defmodel reads a JSON
# master file, data/deformation_model.schema.json + defmodel.hpp; external
# files are out of scope so the registry carries the same structure)
_DEFMODELS = {
    "synthetic_model": {
        "horizontal_offset_unit": "metre",
        "vertical_offset_unit": "metre",
        "components": [
            {"grid": "synthetic_world",       # ENU mm/yr from the registry
             "displacement_type": "3d",
             "time_function": {"type": "velocity", "epoch": 2010.0}},
        ],
    },
}


def _bbox_check(x, y, for_inverse, minx, miny, maxx, maxy, eps, margin):
    """Vectorized defmodel bboxCheck (defmodel_impl.hpp:783-819): inside
    within eps, or — for the iterative inverse only — clamped to the edge
    when within `margin` outside. Returns (ok, x_adj, y_adj)."""
    in_x = (x >= minx - eps) & (x <= maxx + eps)
    in_y = (y >= miny - eps) & (y <= maxy + eps)
    if not for_inverse:
        return in_x & in_y, x, y
    lo_x = (x > minx - margin) & (x < minx)
    hi_x = (x < maxx + margin) & (x > maxx)
    lo_y = (y > miny - margin) & (y < miny)
    hi_y = (y < maxy + margin) & (y > maxy)
    x_adj = np.where(in_x, x, np.where(lo_x, minx, np.where(hi_x, maxx, x)))
    y_adj = np.where(in_y, y, np.where(lo_y, miny, np.where(hi_y, maxy, y)))
    return (in_x | lo_x | hi_x) & (in_y | lo_y | hi_y), x_adj, y_adj


@register
class Defmodel(Operator):
    """Deformation-model chain (reference transformations/defmodel.cpp +
    defmodel_impl.hpp + data/deformation_model.schema.json): per-component
    displacement grids scaled by a time function.

    ``+model=<registry name>`` keeps the embedded synthetic model
    (cartesian domain). ``+model=<path.json>`` loads a real master file:
    io-units follow the definition CRS (defmodel.cpp:429-435 — radians
    when geographic, projected metres otherwise), components interpolate
    east/north/vertical offset grids bilinearly (or geocentric-bilinear,
    defmodel_impl.hpp:98-167) with longitude wrap into the model extent
    (:836-847), and offsets apply per horizontal_offset_unit/method
    (:1150-1211): degree -> add radians; metre+addition -> ellipsoidal
    de/dn conversion (:708-720); metre+geocentric -> shift in geocentric
    space. Inverse is 10-iteration fixed point (:1222-1262)."""

    name = "defmodel"
    left = U_CARTESIAN
    right = U_CARTESIAN

    def setup(self):
        from ..errors import INVALID_OP_MISSING_ARG, ProjError
        from .cartgeo import Cart
        p = self.params
        if "model" not in p:
            raise ProjError("defmodel: +model= should be specified",
                            INVALID_OP_MISSING_ARG)
        name = str(p["model"])
        ell_keys = ("ellps", "a", "b", "rf", "f", "es", "R", "datum")
        self.cart = Cart({"proj": "cart", "_no_datum_shift": True,
                          **{k: p[k] for k in ell_keys if k in p}})
        if name in _DEFMODELS:
            self.mode = "registry"
            self.model = _DEFMODELS[name]
            return
        from .jsonfiles import load_defmodel
        self.mode = "json"
        self.dm = load_defmodel(name)
        if self.dm["is_geographic"]:
            self.left = self.right = U_RADIANS
        else:
            from ..ops import U_PROJECTED
            self.left = self.right = U_PROJECTED
        geo = self.dm["is_geographic"]
        to_rad = np.pi / 180.0
        # precompute per-grid lookup tables in model units
        for comp in self.dm["components"]:
            lut = []
            for g in comp["grids"]:
                scale = to_rad if geo else 1.0
                e = getattr(g, "dlon_as", None)
                n = getattr(g, "dlat_as", None)
                if e is not None and self.dm["hunit_degree"]:
                    # degree bands -> radians (defmodel.cpp:110-125
                    # getLongLatOffset)
                    e = e * to_rad
                    n = n * to_rad
                lut.append({
                    "minx": g.lon0 * scale, "miny": g.lat0 * scale,
                    "resx": g.dlon * scale, "resy": g.dlat * scale,
                    "w": g.width, "h": g.height,
                    "e": e, "n": n, "z": getattr(g, "dz_m", None),
                })
            comp["lut"] = lut

    def _shift(self, X, Y, Z, t):
        lam, phi, _, _ = self.cart._inv(X, Y, Z, t)
        ve_t = np.zeros_like(X)
        vn_t = np.zeros_like(X)
        vu_t = np.zeros_like(X)
        for comp in self.model["components"]:
            ve, vn, vu = get_grid(comp["grid"]).interp(lam * RAD_TO_DEG,
                                                       phi * RAD_TO_DEG)
            tf = comp["time_function"]
            if tf["type"] == "velocity":
                factor = t - tf["epoch"]
            elif tf["type"] == "constant":
                factor = np.ones_like(t)
            elif tf["type"] == "step":
                factor = (t >= tf["epoch"]).astype(np.float64)
            else:
                raise ValueError(f"unsupported time function {tf['type']}")
            ve_t = ve_t + factor * ve / 1000.0
            vn_t = vn_t + factor * vn / 1000.0
            if comp["displacement_type"] in ("3d", "vertical"):
                vu_t = vu_t + factor * vu / 1000.0
        sp, cp = np.sin(phi), np.cos(phi)
        sl, cl = np.sin(lam), np.cos(lam)
        dx = -sp * cl * vn_t - sl * ve_t + cp * cl * vu_t
        dy = -sp * sl * vn_t + cl * ve_t + cp * sl * vu_t
        dz = cp * vn_t + sp * vu_t
        return dx, dy, dz

    # --- real-file mode --------------------------------------------------
    def _forward_json(self, x, y, z, t, for_inverse):
        """Vectorized Evaluator::forward (defmodel_impl.hpp:822-1218).
        Returns (x_out, y_out, z_out) with NaN where the reference fails."""
        dm = self.dm
        geo = dm["is_geographic"]
        eps = 1e-10 if geo else 1e-5
        mnx, mny, mxx, mxy = dm["extent"]
        xw = x.copy()
        if geo:
            # wrap longitude into the model extent (:841-847): first raise
            # by whole turns to >= minx-eps, then lower to <= maxx+eps
            two_pi = 2.0 * np.pi
            k = np.maximum(np.ceil((mnx - eps - xw) / two_pi), 0.0)
            xw = xw + k * two_pi
            k = np.maximum(np.ceil((xw - (mxx + eps)) / two_pi), 0.0)
            xw = xw - k * two_pi
        margin = np.radians(0.1) if geo else 10000.0
        ok, xb, yb = _bbox_check(xw, y, for_inverse, mnx, mny, mxx, mxy,
                                 eps, margin)
        ok = ok & (t >= dm["time_first"]) & (t <= dm["time_last"])

        dlam = np.zeros_like(x)
        dphi = np.zeros_like(x)
        de = np.zeros_like(x)
        dn = np.zeros_like(x)
        dz = np.zeros_like(x)
        sinphi, cosphi = np.sin(y), np.cos(y)

        for comp in dm["components"]:
            if comp["disp"] == "none":
                continue
            cnx, cny, cxx, cxy = comp["extent"]
            okc, xc, yc = _bbox_check(xb, yb, for_inverse,
                                      cnx, cny, cxx, cxy, eps, 0.0)
            tfac = comp["tfunc"](t)
            active = ok & okc & (tfac != 0.0)
            if not np.any(active):
                continue
            xg = np.clip(xc, cnx, cxx)
            yg = np.clip(yc, cny, cxy)
            remaining = active.copy()
            for g in comp["lut"]:  # children-first grid order
                if g["w"] < 2 or g["h"] < 2:
                    ok = ok & ~remaining
                    break
                ix_d = (xg - g["minx"]) / g["resx"]
                iy_d = (yg - g["miny"]) / g["resy"]
                m = (remaining & (ix_d >= -eps) & (iy_d >= -eps)
                     & (ix_d + 1 < g["w"] + eps) & (iy_d + 1 < g["h"] + eps))
                if not np.any(m):
                    continue
                remaining = remaining & ~m
                ix0 = np.minimum(ix_d.astype(np.int64), g["w"] - 2)
                iy0 = np.minimum(iy_d.astype(np.int64), g["h"] - 2)
                ix0 = np.where(m, np.maximum(ix0, 0), 0)
                iy0 = np.where(m, np.maximum(iy0, 0), 0)
                fx = ix_d - ix0
                fy = iy_d - iy0
                m00 = (1 - fx) * (1 - fy)
                m10 = fx * (1 - fy)
                m01 = (1 - fx) * fy
                m11 = fx * fy

                def corners(band):
                    return (band[iy0, ix0], band[iy0 + 1, ix0],
                            band[iy0, ix0 + 1], band[iy0 + 1, ix0 + 1])

                def bil(band):
                    v00, v01, v10, v11 = corners(band)
                    return v00 * m00 + v01 * m01 + v10 * m10 + v11 * m11

                if comp["disp"] in ("vertical", "3d"):
                    if g["z"] is None:
                        ok = ok & ~m  # reference getZOffset fails
                    else:
                        dz = np.where(m, dz + tfac * bil(g["z"]), dz)
                if comp["disp"] in ("horizontal", "3d"):
                    if g["e"] is None:
                        ok = ok & ~m
                    elif dm["hunit_degree"]:
                        dlam = np.where(m, dlam + tfac * bil(g["e"]), dlam)
                        dphi = np.where(m, dphi + tfac * bil(g["n"]), dphi)
                    elif comp["bilinear"]:
                        de = np.where(m, de + tfac * bil(g["e"]), de)
                        dn = np.where(m, dn + tfac * bil(g["n"]), dn)
                    else:
                        # geocentric_bilinear (:98-167, 1080-1146): corner
                        # ENU -> geocentric deltas at the corner lat/lon
                        # (cell-relative lon: corners at ∓resx/2), bilinear
                        # in geocentric space, then back to ENU at the point
                        phi0 = g["miny"] + iy0 * g["resy"]
                        sp0, cp0 = np.sin(phi0), np.cos(phi0)
                        phi1 = phi0 + g["resy"]
                        sp1, cp1 = np.sin(phi1), np.cos(phi1)
                        sl = np.sin(g["resx"] / 2.0)
                        cl = np.cos(g["resx"] / 2.0)
                        e00, e01, e10, e11 = corners(g["e"])
                        n00, n01, n10, n11 = corners(g["n"])

                        def geoc(ei, ni, sli, spi, cpi):
                            nsp = ni * spi
                            return (-ei * sli - nsp * cl,
                                    ei * cl - nsp * sli,
                                    ni * cpi)
                        dX00, dY00, dZ00 = geoc(e00, n00, -sl, sp0, cp0)
                        dX01, dY01, dZ01 = geoc(e01, n01, -sl, sp1, cp1)
                        dX10, dY10, dZ10 = geoc(e10, n10, sl, sp0, cp0)
                        dX11, dY11, dZ11 = geoc(e11, n11, sl, sp1, cp1)
                        dX = dX00 * m00 + dX01 * m01 + dX10 * m10 + dX11 * m11
                        dY = dY00 * m00 + dY01 * m01 + dY10 * m10 + dY11 * m11
                        dZ = dZ00 * m00 + dZ01 * m01 + dZ10 * m10 + dZ11 * m11
                        lam_rel = (fx - 0.5) * g["resx"]
                        slp, clp = np.sin(lam_rel), np.cos(lam_rel)
                        de_i = -dX * slp + dY * clp
                        dn_i = (-dX * clp - dY * slp) * sinphi + dZ * cosphi
                        de = np.where(m, de + tfac * de_i, de)
                        dn = np.where(m, dn + tfac * dn_i, dn)

        # apply offsets (:1150-1211)
        if dm["hunit_degree"]:
            x_out = x + dlam
            y_out = y + dphi
        elif dm["is_addition"] and not geo:
            x_out = x + de
            y_out = y + dn
        elif dm["is_addition"]:
            # DeltaEastingNorthingToLongLat (:708-720)
            a, b = self.cart.ell.a, self.cart.ell.b
            es = self.cart.ell.es
            one_minus_x = es * (1.0 - cosphi * cosphi)
            big_x = 1.0 - one_minus_x
            sqrt_x = np.sqrt(big_x)
            x_out = x + de * sqrt_x / (a * cosphi)
            y_out = y + dn * a * sqrt_x * big_x / (b * b)
        else:
            # geocentric addition (:1176-1210): shift at h=0 in XYZ
            sinlam, coslam = np.sin(x), np.cos(x)
            dnsp = dn * sinphi
            dX = -de * sinlam - dnsp * coslam
            dY = de * coslam - dnsp * sinlam
            dZ = dn * cosphi
            gx, gy, gz, _ = self.cart._fwd(x, y, np.zeros_like(x), t)
            lam2, phi2, _, _ = self.cart._inv(gx + dX, gy + dY, gz + dZ, t)
            x_out, y_out = lam2, phi2
        z_out = z + dz
        bad = ~ok
        return (np.where(bad, np.nan, x_out), np.where(bad, np.nan, y_out),
                np.where(bad, np.nan, z_out))

    def _inverse_json(self, x, y, z, t):
        """10-iteration fixed point (defmodel_impl.hpp:1222-1262)."""
        ox, oy, oz = x.copy(), y.copy(), z.copy()
        done = np.zeros(x.shape, dtype=bool)
        for _ in range(10):
            nx, ny, nz = self._forward_json(ox, oy, oz, t, for_inverse=True)
            dx = nx - x
            dy = ny - y
            dzz = nz - z
            upd = ~done
            ox = np.where(upd, ox - dx, ox)
            oy = np.where(upd, oy - dy, oy)
            oz = np.where(upd, oz - dzz, oz)
            conv = (np.maximum(np.abs(dx), np.abs(dy)) < 1e-12) \
                & (np.abs(dzz) < 1e-3)
            done = done | conv
            failed = ~done & ~np.isfinite(nx)
            ox = np.where(failed, np.nan, ox)
            oy = np.where(failed, np.nan, oy)
            oz = np.where(failed, np.nan, oz)
            done = done | failed
            if np.all(done):
                break
        # not converged after 10 iterations -> failure (:1261)
        ox = np.where(done, ox, np.nan)
        oy = np.where(done, oy, np.nan)
        oz = np.where(done, oz, np.nan)
        return ox, oy, oz

    def _fwd(self, X, Y, Z, t):
        if self.mode == "json":
            x, y, z = self._forward_json(X, Y, Z, t, for_inverse=False)
            return x, y, z, t
        dx, dy, dz = self._shift(X, Y, Z, t)
        return X + dx, Y + dy, Z + dz, t

    def _inv(self, X, Y, Z, t):
        if self.mode == "json":
            x, y, z = self._inverse_json(X, Y, Z, t)
            return x, y, z, t
        oX, oY, oZ = X.copy(), Y.copy(), Z.copy()
        for _ in range(10):
            dx, dy, dz = self._shift(oX, oY, oZ, t)
            oX = X - dx
            oY = Y - dy
            oZ = Z - dz
        return oX, oY, oZ, t
