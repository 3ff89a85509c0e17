"""Breadth batch 4: national-grid / specialist operators.

Vectorized numpy reimplementations of:
- gstmerc.cpp (Gauss-Schreiber TM / Gauss-Laborde Reunion)
- lcca.cpp (Lambert Conformal Conic Alternative, French truncated cubic)
- ccon.cpp (Central Conic)
- rouss.cpp (Roussilhe Stereographic, series via proj_mdist.cpp)
- rpoly.cpp (Rectangular Polyconic)
- col_urban.cpp (Colombia Urban, EPSG guidance note 7-2)
- transformations/vertoffset.cpp (vertical offset + slope plane)
- conversions/topocentric.cpp (geocentric ECEF -> local ENU)
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
)
from .core import DEG_TO_RAD, HALF_PI, enfn, mlfn, inv_mlfn, phi2, tsfn


# --- proj_mdist.cpp: exact meridional distance helper --------------------

def mdist_ini(es: float):
    """proj_mdist_ini (proj_mdist.cpp:48-93): E constant + b_n series."""
    MAX_ITER = 20
    E = [1.0]
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = 1.0
    El = 1.0
    i = 1
    for i in range(1, MAX_ITER):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    nb = i - 1
    # second loop (proj_mdist.cpp:79-92): running value starts at 1-E
    b = [1.0 - Es]
    numf = denf = 1.0
    numfi, denfi = 2.0, 3.0
    Es_run = 1.0 - Es
    for j in range(1, i):
        Es_run -= E[j]
        numf *= numfi
        denf *= denfi
        b.append(Es_run * numf / denf)
        numfi += 2.0
        denfi += 2.0
    return {"nb": nb, "es": es, "E": Es, "b": np.array(b)}


def mdist(phi, sphi, cphi, md):
    """proj_mdist (proj_mdist.cpp:94-106)."""
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * md["E"] - md["es"] * sc / np.sqrt(1.0 - md["es"] * sphi2)
    b = md["b"]
    s = np.full_like(np.asarray(phi, dtype=np.float64), b[md["nb"]])
    for i in range(md["nb"] - 1, -1, -1):
        s = b[i] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, md):
    """proj_inv_mdist (proj_mdist.cpp:107-124): Newton."""
    k = 1.0 / (1.0 - md["es"])
    phi = np.asarray(dist, dtype=np.float64).copy()
    for _ in range(20):
        s = np.sin(phi)
        t = 1.0 - md["es"] * s * s
        step = (mdist(phi, s, np.cos(phi), md) - dist) * (t * np.sqrt(t)) * k
        phi = phi - step
        if np.all(np.abs(step[np.isfinite(step)]) < 1e-14):
            break
    return phi


@register
class Gstmerc(Operator):
    """Gauss-Schreiber Transverse Mercator (reference gstmerc.cpp)."""

    name = "gstmerc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        e, es, a = self.ell.e, self.ell.es, self.ell.a
        sp0 = np.sin(self.phi0)
        self.n1 = np.sqrt(1.0 + es * np.cos(self.phi0) ** 4 / (1.0 - es))
        self.phic = np.arcsin(sp0 / self.n1)
        self.c = np.log(tsfn(-self.phic, -sp0 / self.n1, 0.0)) \
            - self.n1 * np.log(tsfn(-self.phi0, -sp0, e))
        self.n2 = self.k0 * a * np.sqrt(1.0 - es) / (1.0 - es * sp0 * sp0)
        self.XS = 0.0
        self.YS = -self.n2 * self.phic

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        L = self.n1 * lam
        Ls = self.c + self.n1 * np.log(tsfn(-phi, -np.sin(phi), e))
        sinLs1 = np.sin(L) / np.cosh(Ls)
        Ls1 = np.log(tsfn(-np.arcsin(sinLs1), -sinLs1, 0.0))
        x = (self.XS + self.n2 * Ls1) * self.ell.ra
        y = (self.YS + self.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) \
            * self.ell.ra
        return x, y, z, t

    def _inv(self, x, y, z, t):
        a, e = self.ell.a, self.ell.e
        L = np.arctan(np.sinh((x * a - self.XS) / self.n2)
                      / np.cos((y * a - self.YS) / self.n2))
        sinC = np.sin((y * a - self.YS) / self.n2) \
            / np.cosh((x * a - self.XS) / self.n2)
        LC = np.log(tsfn(-np.arcsin(sinC), -sinC, 0.0))
        lam = L / self.n1
        phi = -phi2(np.exp((LC - self.c) / self.n1), e)
        return lam, phi, z, t


@register
class Lcca(Operator):
    """Lambert Conformal Conic Alternative (reference lcca.cpp)."""

    name = "lcca"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        if self.phi0 == 0.0:
            raise ValueError("lcca +lat_0 must be non-zero")
        self.en = enfn(self.ell.n)
        self.l = np.sin(self.phi0)
        self.M0 = mlfn(np.float64(self.phi0), self.l, np.cos(self.phi0),
                       self.en)
        s2p0 = self.l * self.l
        R0 = 1.0 / (1.0 - self.ell.es * s2p0)
        N0 = np.sqrt(R0)
        R0 *= self.ell.one_es * N0
        self.r0 = N0 / np.tan(self.phi0)
        self.C = 1.0 / (6.0 * R0 * N0)

    def _fwd(self, lam, phi, z, t):
        S = mlfn(phi, np.sin(phi), np.cos(phi), self.en) - self.M0
        dr = S * (1.0 + S * S * self.C)
        r = self.r0 - dr
        lam_l = lam * self.l
        x = self.k0 * r * np.sin(lam_l)
        y = self.k0 * (self.r0 - r * np.cos(lam_l))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        x = x / self.k0
        y = y / self.k0
        theta = np.arctan2(x, self.r0 - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / self.l
        S = dr.copy()
        conv = np.zeros(S.shape, dtype=bool)
        for _ in range(10):
            dif = (S * (1.0 + S * S * self.C) - dr) / (1.0 + 3.0 * S * S * self.C)
            S = np.where(conv, S, S - dif)
            conv |= np.abs(dif) < 1e-12
            if np.all(conv):
                break
        phi = inv_mlfn(S + self.M0, self.en)
        phi = np.where(conv, phi, np.nan)
        lam = np.where(conv, lam, np.nan)
        return lam, phi, z, t


@register
class Ccon(Operator):
    """Central Conic (reference ccon.cpp); +lat_1."""

    name = "ccon"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.phi1 = parse_angle(self.params.get("lat_1", 0.0)) * DEG_TO_RAD
        if abs(self.phi1) < 1e-10:
            raise ValueError("ccon requires non-zero +lat_1")
        self.sinphi1 = np.sin(self.phi1)
        self.ctgphi1 = np.cos(self.phi1) / self.sinphi1

    def _fwd(self, lam, phi, z, t):
        r = self.ctgphi1 - np.tan(phi - self.phi1)
        x = r * np.sin(lam * self.sinphi1)
        y = self.ctgphi1 - r * np.cos(lam * self.sinphi1)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        y2 = self.ctgphi1 - y
        phi = self.phi1 - np.arctan(np.hypot(x, y2) - self.ctgphi1)
        lam = np.arctan2(x, y2) / self.sinphi1
        return lam, phi, z, t


@register
class Rouss(Operator):
    """Roussilhe Stereographic (reference rouss.cpp)."""

    name = "rouss"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        es = self.ell.es
        self.md = mdist_ini(es)
        sp0 = np.sin(self.phi0)
        self.s0 = float(mdist(np.float64(self.phi0), sp0, np.cos(self.phi0),
                              self.md))
        es2 = es * sp0 * sp0
        t = 1.0 - es2
        N0 = 1.0 / np.sqrt(t)
        R_R0_2 = t * t / self.ell.one_es
        R_R0_4 = R_R0_2 * R_R0_2
        tt = np.tan(self.phi0)
        t2 = tt * tt
        self.A1 = self.C1 = R_R0_2 / 4.0
        self.A2 = self.C2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
        self.A3 = R_R0_2 * tt * (1.0 + 4.0 * t2) / (12.0 * N0)
        self.A4 = R_R0_4 / 24.0
        self.A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
        self.A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
        self.B1 = tt / (2.0 * N0)
        self.B2 = R_R0_2 / 12.0
        self.B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
        self.B4 = R_R0_2 * tt * (2.0 - t2) / (24.0 * N0)
        self.B5 = R_R0_2 * tt * (5.0 + 4.0 * t2) / (8.0 * N0)
        self.B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
        self.B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
        self.B8 = R_R0_4 / 120.0
        self.C3 = R_R0_2 * tt * (1.0 + t2) / (3.0 * N0)
        self.C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
        self.C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
        self.C6 = R_R0_4 / 16.0
        self.C7 = R_R0_4 * tt * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
        self.C8 = R_R0_4 * tt * (1.0 + t2 * 4.0) / (36.0 * N0)
        self.D1 = tt / (2.0 * N0)
        self.D2 = R_R0_2 / 12.0
        self.D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
        self.D4 = R_R0_2 * tt * (1.0 + t2) / (8.0 * N0)
        self.D5 = R_R0_2 * tt * (1.0 + t2 * 2.0) / (4.0 * N0)
        self.D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
        self.D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
        self.D8 = R_R0_4 / 80.0
        self.D9 = R_R0_4 * tt * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
        self.D10 = R_R0_4 * tt * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
        self.D11 = R_R0_4 * tt * (37.0 + t2 * 44.0) / (96.0 * N0)

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, self.md) - self.s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - es * sp * sp)
        al2 = al * al
        x = self.k0 * al * (1.0 + s2 * (self.A1 + s2 * self.A4)
                            - al2 * (self.A2 + s * self.A3 + s2 * self.A5
                                     + al2 * self.A6))
        y = self.k0 * (al2 * (self.B1 + al2 * self.B4)
                       + s * (1.0 + al2 * (self.B3 - al2 * self.B6)
                              + s2 * (self.B2 + s2 * self.B8)
                              + s * al2 * (self.B5 + s * self.B7)))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        x = x / self.k0
        y = y / self.k0
        x2 = x * x
        y2 = y * y
        al = x * (1.0 - self.C1 * y2
                  + x2 * (self.C2 + self.C3 * y - self.C4 * x2
                          + self.C5 * y2 - self.C7 * x2 * y)
                  + y2 * (self.C6 * y2 - self.C8 * x2 * y))
        s = self.s0 + y * (1.0 + y2 * (-self.D2 + self.D8 * y2)) \
            + x2 * (-self.D1
                    + y * (-self.D3 + y * (-self.D5 + y * (-self.D7
                                                           + y * self.D11)))
                    + x2 * (self.D4 + y * (self.D6 + y * self.D10)
                            - x2 * self.D9))
        phi = inv_mdist(s, self.md)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - es * sp * sp) / np.cos(phi)
        return lam, phi, z, t


@register
class Rpoly(Operator):
    """Rectangular Polyconic (reference rpoly.cpp); +lat_ts, no inverse."""

    name = "rpoly"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def setup(self):
        self.phi1 = abs(parse_angle(self.params.get("lat_ts", 0.0))
                        * DEG_TO_RAD)
        self.mode = self.phi1 > 1e-9
        if self.mode:
            self.fxb = 0.5 * np.sin(self.phi1)
            self.fxa = 0.5 / self.fxb

    def _fwd(self, lam, phi, z, t):
        if self.mode:
            fa = np.tan(lam * self.fxb) * self.fxa
        else:
            fa = 0.5 * lam
        eq = np.abs(phi) < 1e-9
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = 1.0 / np.tan(phi)
            fa2 = 2.0 * np.arctan(fa * np.sin(phi))
            x = np.where(eq, fa + fa, np.sin(fa2) * cot)
            y = np.where(eq, -self.phi0,
                         phi - self.phi0 + (1.0 - np.cos(fa2)) * cot)
        return x, y, z, t


@register
class ColUrban(Operator):
    """Colombia Urban (reference col_urban.cpp); +h_0."""

    name = "col_urban"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        es = self.ell.es
        self.h0 = float(self.params.get("h_0", 0.0)) / self.ell.a
        sinphi0 = np.sin(self.phi0)
        nu0 = 1.0 / np.sqrt(1.0 - es * sinphi0 * sinphi0)
        self.A = 1.0 + self.h0 / nu0
        self.rho0 = (1.0 - es) / (1.0 - es * sinphi0 * sinphi0) ** 1.5
        self.B = np.tan(self.phi0) / (2.0 * self.rho0 * nu0)
        self.C = 1.0 + self.h0
        self.D = self.rho0 * (1.0 + self.h0 / (1.0 - es))

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - es * sinphi * sinphi)
        lnc = lam * nu * cosphi
        x = self.A * lnc
        sinphi_m = np.sin(0.5 * (phi + self.phi0))
        rho_m = (1.0 - es) / (1.0 - es * sinphi_m * sinphi_m) ** 1.5
        G = 1.0 + self.h0 / rho_m
        y = G * self.rho0 * ((phi - self.phi0) + self.B * lnc * lnc)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        phi = self.phi0 + y / self.D - self.B * (x / self.C) ** 2
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1.0 - es * sinphi * sinphi)
        lam = x / (self.C * nu * np.cos(phi))
        return lam, phi, z, t


@register
class Vertoffset(Operator):
    """Vertical Offset and Slope (reference
    transformations/vertoffset.cpp); EPSG method 1046."""

    name = "vertoffset"
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        ARCSEC = DEG_TO_RAD / 3600.0
        p = self.params
        self.slope_lon = float(p.get("slope_lon", 0.0)) * ARCSEC
        self.slope_lat = float(p.get("slope_lat", 0.0)) * ARCSEC
        self.zoff = float(p.get("dh", 0.0))
        sinlat0 = np.sin(self.phi0)
        om = 1.0 - self.ell.es * sinlat0 * sinlat0
        self.rho0 = self.ell.a * (1.0 - self.ell.es) / (om * np.sqrt(om))
        self.nu0 = self.ell.a / np.sqrt(om)

    def _offset(self, phi, lam):
        return self.zoff + self.slope_lat * self.rho0 * (phi - self.phi0) \
            + self.slope_lon * self.nu0 * lam * np.cos(phi)

    def _fwd(self, lam, phi, z, t):
        # undo the generic lam0 subtraction (vertoffset.cpp:24-30 keeps
        # longitudes absolute; lam0 only anchors the slope plane)
        return lam + self.lam0, phi, z + self._offset(phi, lam), t

    def _inv(self, x, y, z, t):
        lam = x - self.lam0
        return lam, y, z - self._offset(y, lam), t


@register
class Topocentric(Operator):
    """Geocentric ECEF -> topocentric ENU (reference
    conversions/topocentric.cpp); origin via +X_0/+Y_0/+Z_0 or
    +lon_0/+lat_0/+h_0."""

    name = "topocentric"
    left = U_CARTESIAN
    right = U_CARTESIAN

    def setup(self):
        from .cartgeo import Cart
        p = self.params
        from ..errors import (INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS, ProjError,
                              missing_arg)
        has_xyz = "X_0" in p or "Y_0" in p or "Z_0" in p
        has_geo = "lon_0" in p or "lat_0" in p or "h_0" in p
        # reference conversions/topocentric.cpp origin validation: one
        # full origin is required; mixing the two origin styles is
        # mutually exclusive; a partial origin is a missing argument
        if has_xyz and has_geo:
            raise ProjError("topocentric: either (X_0, Y_0, Z_0) or "
                            "(lon_0, lat_0, h_0) should be specified",
                            INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS)
        if not has_xyz and not has_geo:
            missing_arg("topocentric: missing origin (X_0/Y_0/Z_0 or "
                        "lon_0/lat_0)")
        if has_xyz and not ("X_0" in p and "Y_0" in p and "Z_0" in p):
            missing_arg("topocentric: X_0, Y_0 and Z_0 are all required")
        if has_geo and not ("lon_0" in p and "lat_0" in p):
            missing_arg("topocentric: lon_0 and lat_0 are required")
        has_xyz = "X_0" in p
        has_geo = "lon_0" in p
        ell_keys = ("ellps", "a", "b", "rf", "f", "es", "R", "datum")
        cart = Cart({"proj": "cart", "_no_datum_shift": True,
                     **{k: p[k] for k in ell_keys if k in p}})
        if has_xyz:
            self.X0 = float(p["X_0"])
            self.Y0 = float(p["Y_0"])
            self.Z0 = float(p["Z_0"])
            lam, phi, _, _ = cart._inv(np.array([self.X0]),
                                       np.array([self.Y0]),
                                       np.array([self.Z0]), np.zeros(1))
            lam0, phi0 = float(lam[0]), float(phi[0])
        else:
            lam0, phi0 = self.lam0, self.phi0
            h0 = float(p.get("h_0", 0.0))
            X, Y, Z, _ = cart._fwd(np.array([lam0]), np.array([phi0]),
                                   np.array([h0]), np.zeros(1))
            self.X0, self.Y0, self.Z0 = float(X[0]), float(Y[0]), float(Z[0])
        self.sinphi0, self.cosphi0 = np.sin(phi0), np.cos(phi0)
        self.sinlam0, self.coslam0 = np.sin(lam0), np.cos(lam0)
        self.lam0 = 0.0  # cartesian io: no angular prepare applies

    def _fwd(self, x, y, z, t):
        dX = x - self.X0
        dY = y - self.Y0
        dZ = z - self.Z0
        e = -dX * self.sinlam0 + dY * self.coslam0
        n = -dX * self.sinphi0 * self.coslam0 \
            - dY * self.sinphi0 * self.sinlam0 + dZ * self.cosphi0
        u = dX * self.cosphi0 * self.coslam0 \
            + dY * self.cosphi0 * self.sinlam0 + dZ * self.sinphi0
        return e, n, u, t

    def _inv(self, x, y, z, t):
        X = self.X0 - x * self.sinlam0 - y * self.sinphi0 * self.coslam0 \
            + z * self.cosphi0 * self.coslam0
        Y = self.Y0 + x * self.coslam0 - y * self.sinphi0 * self.sinlam0 \
            + z * self.cosphi0 * self.sinlam0
        Z = self.Z0 + y * self.cosphi0 + z * self.sinphi0
        return X, Y, Z, t
