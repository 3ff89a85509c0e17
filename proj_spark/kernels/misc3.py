"""Third breadth batch: oblique Mercators, Krovak, polyconic, two-point
equidistant, geostationary view.

Vectorized numpy reimplementations of:
- omerc:  src/projections/omerc.cpp (Hotine; alpha/gamma/lonc or two-point)
- somerc: src/projections/somerc.cpp (Swiss oblique Mercator)
- krovak/mod_krovak: src/projections/krovak.cpp (Czech S-JTSK; Bessel fixed)
- poly:   src/projections/poly.cpp (American polyconic, Sph&Ell)
- tpeqd:  src/projections/tpeqd.cpp (two-point equidistant)
- geos:   src/projections/geos.cpp (geostationary satellite view)
"""

from __future__ import annotations

import numpy as np

from ..errors import illegal_arg

from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import (
    DEG_TO_RAD,
    FORT_PI,
    HALF_PI,
    Ellipsoid,
    aasin,
    aacos,
    adjlon,
    enfn,
    mlfn,
    msfn,
    phi2,
    tsfn,
)

_TOL = 1e-7
_EPS = 1e-10


@register
class Omerc(Operator):
    """Hotine Oblique Mercator (reference omerc.cpp)."""

    name = "omerc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        self.no_rot = "no_rot" in p
        alp = "alpha" in p
        gam = "gamma" in p
        alpha_c = parse_angle(p.get("alpha", 0.0)) * DEG_TO_RAD
        gamma = parse_angle(p.get("gamma", 0.0)) * DEG_TO_RAD
        no_off = ("no_off" in p) or ("no_uoff" in p)
        com = np.sqrt(one_es)
        if abs(self.phi0) > _EPS:
            sinph0, cosph0 = np.sin(self.phi0), np.cos(self.phi0)
            con = 1.0 - es * sinph0 ** 2
            B = cosph0 ** 2
            B = np.sqrt(1.0 + es * B * B / one_es)
            A = B * self.k0 * com / con
            D = B * com / (cosph0 * np.sqrt(con))
            F = D * D - 1.0
            F = 0.0 if F <= 0 else (np.sqrt(F) * (-1 if self.phi0 < 0 else 1))
            E = F = F + D
            E *= float(tsfn(np.float64(self.phi0), np.float64(sinph0), e)) ** B
        else:
            B = 1.0 / com
            A = self.k0
            E = D = F = 1.0
        _TOLV = 1e-7  # omerc.cpp:43
        if alp or gam:
            lamc = parse_angle(p.get("lonc", 0.0)) * DEG_TO_RAD
            if alp:
                gamma0 = float(aasin(np.sin(alpha_c) / D))
                if not gam:
                    gamma = alpha_c
            else:
                gamma0 = gamma
                alpha_c = float(aasin(D * np.sin(gamma0)))
                if not np.isfinite(alpha_c):
                    # omerc.cpp:229-240: |gamma| must be <= asin(1/D)
                    illegal_arg("omerc: invalid value for gamma given lat_0")
            if abs(abs(self.phi0) - HALF_PI) <= _TOLV:
                illegal_arg("omerc: |lat_0| should be < 90")
            self.lam0 = lamc - float(aasin(0.5 * (F - 1.0 / F) * np.tan(gamma0))) / B
        else:
            lam1 = parse_angle(p.get("lon_1", 0.0)) * DEG_TO_RAD
            phi1 = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
            lam2 = parse_angle(p.get("lon_2", 0.0)) * DEG_TO_RAD
            phi2_ = parse_angle(p.get("lat_2", 0.0)) * DEG_TO_RAD
            # omerc.cpp:158-192 two-point validation
            if abs(phi1) > HALF_PI - _TOLV:
                illegal_arg("omerc: |lat_1| should be < 90")
            if abs(phi2_) > HALF_PI - _TOLV:
                illegal_arg("omerc: |lat_2| should be < 90")
            if abs(phi1 - phi2_) <= _TOLV:
                illegal_arg("omerc: lat_1 should be different from lat_2")
            if abs(phi1) <= _TOLV:
                illegal_arg("omerc: lat_1 should be different from 0")
            if abs(abs(self.phi0) - HALF_PI) <= _TOLV:
                illegal_arg("omerc: |lat_0| should be < 90")
            H = float(tsfn(np.float64(phi1), np.sin(phi1), e)) ** B
            L = float(tsfn(np.float64(phi2_), np.sin(phi2_), e)) ** B
            F = E / H
            pp = (L - H) / (L + H)
            if pp == 0:
                illegal_arg("omerc: invalid value for eccentricity")
            J = E * E
            J = (J - L * H) / (J + L * H)
            con = lam1 - lam2
            if con < -np.pi:
                lam2 -= 2 * np.pi
            elif con > np.pi:
                lam2 += 2 * np.pi
            self.lam0 = float(adjlon(np.asarray(
                0.5 * (lam1 + lam2)
                - np.arctan(J * np.tan(0.5 * B * (lam1 - lam2)) / pp) / B)))
            denomv = F - 1.0 / F
            if denomv == 0:
                illegal_arg("omerc: invalid value for eccentricity")
            gamma0 = float(np.arctan(
                2.0 * np.sin(B * adjlon(np.asarray(lam1 - self.lam0)))
                / denomv))
            gamma = alpha_c = float(aasin(D * np.sin(gamma0)))
        self.singam, self.cosgam = np.sin(gamma0), np.cos(gamma0)
        self.sinrot, self.cosrot = np.sin(gamma), np.cos(gamma)
        self.B, self.A, self.E = float(B), float(A), float(E)
        self.rB = 1.0 / B
        self.ArB = A * self.rB
        self.BrA = 1.0 / self.ArB
        if no_off:
            self.u_0 = 0.0
        else:
            self.u_0 = abs(self.ArB * np.arctan(
                np.sqrt(max(D * D - 1.0, 0.0)) / np.cos(alpha_c)))
            if self.phi0 < 0:
                self.u_0 = -self.u_0
        Fh = 0.5 * gamma0
        self.v_pole_n = self.ArB * np.log(np.tan(FORT_PI - Fh))
        self.v_pole_s = self.ArB * np.log(np.tan(FORT_PI + Fh))

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        pole = np.abs(np.abs(phi) - HALF_PI) <= _EPS
        phis = np.where(pole, 0.0, phi)  # safe lanes
        W = self.E / tsfn(phis, np.sin(phis), e) ** self.B
        S = 0.5 * (W - 1.0 / W)
        T = 0.5 * (W + 1.0 / W)
        V = np.sin(self.B * lam)
        U = (S * self.singam - V * self.cosgam) / T
        bad = np.abs(np.abs(U) - 1.0) < _EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            v = 0.5 * self.ArB * np.log((1.0 - U) / (1.0 + U))
            temp = np.cos(self.B * lam)
            u = np.where(np.abs(temp) < _TOL, self.A * lam,
                         self.ArB * np.arctan2(S * self.cosgam + V * self.singam, temp))
        v = np.where(pole, np.where(phi > 0, self.v_pole_n, self.v_pole_s), v)
        u = np.where(pole, self.ArB * phi, u)
        v = np.where(bad & ~pole, np.nan, v)
        u = np.where(bad & ~pole, np.nan, u)
        if self.no_rot:
            return u, v, z, t
        u = u - self.u_0
        x = v * self.cosrot + u * self.sinrot
        y = u * self.cosrot - v * self.sinrot
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e = self.ell.e
        if self.no_rot:
            v, u = y, x
        else:
            v = x * self.cosrot - y * self.sinrot
            u = y * self.cosrot + x * self.sinrot + self.u_0
        Qp = np.exp(-self.BrA * v)
        Sp = 0.5 * (Qp - 1.0 / Qp)
        Tp = 0.5 * (Qp + 1.0 / Qp)
        Vp = np.sin(self.BrA * u)
        Up = (Vp * self.cosgam + Sp * self.singam) / Tp
        pole = np.abs(np.abs(Up) - 1.0) < _EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            ts_val = (self.E / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / self.B)
            ph = phi2(ts_val, e)
            lm = -self.rB * np.arctan2(Sp * self.cosgam - Vp * self.singam,
                                       np.cos(self.BrA * u))
        phi = np.where(pole, np.where(Up < 0, -HALF_PI, HALF_PI), ph)
        lam = np.where(pole, 0.0, lm)
        return lam, phi, z, t


@register
class Somerc(Operator):
    """Swiss Oblique Mercator (reference somerc.cpp)."""

    name = "somerc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        e, es = self.ell.e, self.ell.es
        rone_es = 1.0 / self.ell.one_es
        self.hlf_e = 0.5 * e
        cp = np.cos(self.phi0) ** 2
        self.c = np.sqrt(1.0 + es * cp * cp * rone_es)
        sp = np.sin(self.phi0)
        self.sinp0 = sp / self.c
        phip0 = float(aasin(self.sinp0))
        self.cosp0 = np.cos(phip0)
        spe = sp * e
        self.K = (np.log(np.tan(FORT_PI + 0.5 * phip0))
                  - self.c * (np.log(np.tan(FORT_PI + 0.5 * self.phi0))
                              - self.hlf_e * np.log((1.0 + spe) / (1.0 - spe))))
        self.kR = self.k0 * np.sqrt(self.ell.one_es) / (1.0 - spe * spe)
        self.rone_es = rone_es

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        sp = e * np.sin(phi)
        phip = 2.0 * np.arctan(np.exp(
            self.c * (np.log(np.tan(FORT_PI + 0.5 * phi))
                      - self.hlf_e * np.log((1.0 + sp) / (1.0 - sp)))
            + self.K)) - HALF_PI
        lamp = self.c * lam
        cp = np.cos(phip)
        phipp = aasin(np.clip(self.cosp0 * np.sin(phip)
                              - self.sinp0 * cp * np.cos(lamp), -1, 1))
        lampp = aasin(np.clip(cp * np.sin(lamp) / np.cos(phipp), -1, 1))
        x = self.kR * lampp
        y = self.kR * np.log(np.tan(FORT_PI + 0.5 * phipp))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e = self.ell.e
        phipp = 2.0 * (np.arctan(np.exp(y / self.kR)) - FORT_PI)
        lampp = x / self.kR
        cp = np.cos(phipp)
        phip = aasin(np.clip(self.cosp0 * np.sin(phipp)
                             + self.sinp0 * cp * np.cos(lampp), -1, 1))
        lamp = aasin(np.clip(cp * np.sin(lampp) / np.cos(phip), -1, 1))
        con = (self.K - np.log(np.tan(FORT_PI + 0.5 * phip))) / self.c
        for _ in range(8):
            esp = e * np.sin(phip)
            delp = ((con + np.log(np.tan(FORT_PI + 0.5 * phip))
                     - self.hlf_e * np.log((1.0 + esp) / (1.0 - esp)))
                    * (1.0 - esp * esp) * np.cos(phip) * self.rone_es)
            phip = phip - delp
        return lamp / self.c, phip, z, t


# Modified-Krovak correction polynomial constants (EPSG / CUZK publication)
_MK = dict(X0=1089000.0, Y0=654000.0,
           C1=2.946529277e-02, C2=2.515965696e-02, C3=1.193845912e-07,
           C4=-4.668270147e-07, C5=9.233980362e-12, C6=1.523735715e-12,
           C7=1.696780024e-18, C8=4.408314235e-18, C9=-8.331083518e-24,
           C10=-3.689471323e-24)


def _mod_krovak_dxdy(Xr, Yr):
    M = _MK
    Xr2, Yr2 = Xr * Xr, Yr * Yr
    Xr4, Yr4 = Xr2 * Xr2, Yr2 * Yr2
    dX = (M["C1"] + M["C3"] * Xr - M["C4"] * Yr - 2 * M["C6"] * Xr * Yr
          + M["C5"] * (Xr2 - Yr2) + M["C7"] * Xr * (Xr2 - 3 * Yr2)
          - M["C8"] * Yr * (3 * Xr2 - Yr2)
          + 4 * M["C9"] * Xr * Yr * (Xr2 - Yr2)
          + M["C10"] * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    dY = (M["C2"] + M["C3"] * Yr + M["C4"] * Xr + 2 * M["C5"] * Xr * Yr
          + M["C6"] * (Xr2 - Yr2) + M["C8"] * Xr * (Xr2 - 3 * Yr2)
          + M["C7"] * Yr * (3 * Xr2 - Yr2)
          - 4 * M["C10"] * Xr * Yr * (Xr2 - Yr2)
          + M["C9"] * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    return dX, dY


@register
class Krovak(Operator):
    """Krovak / S-JTSK (reference krovak.cpp; Bessel ellipsoid fixed)."""

    name = "krovak"
    modified = False
    left = U_RADIANS
    right = U_CLASSIC
    _UQ = 1.04216856380474
    _S0 = 1.37008346281555

    def setup(self):
        p = self.params
        # fixed Bessel ellipsoid (krovak.cpp:244-246)
        a = 6377397.155
        es = 0.006674372230614
        self.ell = Ellipsoid(a, a * np.sqrt(1.0 - es))
        if "lat_0" not in p:
            self.phi0 = 0.863937979737193
        if "lon_0" not in p:
            self.lam0 = 0.7417649320975901 - 0.308341501185665
        if "k" not in p and "k_0" not in p:
            self.k0 = 0.9999
        self.easting_northing = "czech" not in p
        e, es = self.ell.e, self.ell.es
        self.alpha = np.sqrt(1.0 + (es * np.cos(self.phi0) ** 4) / (1.0 - es))
        u0 = float(aasin(np.sin(self.phi0) / self.alpha))
        g = ((1.0 + e * np.sin(self.phi0)) / (1.0 - e * np.sin(self.phi0))) \
            ** (self.alpha * e / 2.0)
        tan_half = np.tan(self.phi0 / 2.0 + np.pi / 4)
        if tan_half == 0.0:
            # krovak.cpp:317-322
            illegal_arg("krovak: lat_0 + PI/4 should be different from 0")
        self.k_ = (np.tan(u0 / 2.0 + np.pi / 4) / tan_half ** self.alpha * g)
        n0 = np.sqrt(1.0 - es) / (1.0 - es * np.sin(self.phi0) ** 2)
        self.n = np.sin(self._S0)
        self.rho0 = self.k0 * n0 / np.tan(self._S0)
        self.ad = HALF_PI - self._UQ

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        gfi = ((1.0 + e * np.sin(phi)) / (1.0 - e * np.sin(phi))) \
            ** (self.alpha * e / 2.0)
        u = 2.0 * (np.arctan(self.k_ * np.tan(phi / 2.0 + np.pi / 4) ** self.alpha / gfi)
                   - np.pi / 4)
        deltav = -lam * self.alpha
        s = aasin(np.clip(np.cos(self.ad) * np.sin(u)
                          + np.sin(self.ad) * np.cos(u) * np.cos(deltav), -1, 1))
        cos_s = np.cos(s)
        degenerate = cos_s < 1e-12
        d = aasin(np.clip(np.cos(u) * np.sin(deltav) / np.where(degenerate, 1.0, cos_s), -1, 1))
        eps_ = self.n * d
        rho = (self.rho0 * np.tan(self._S0 / 2.0 + np.pi / 4) ** self.n
               / np.tan(s / 2.0 + np.pi / 4) ** self.n)
        X = rho * np.cos(eps_)
        Y = rho * np.sin(eps_)
        X = np.where(degenerate, 0.0, X)
        Y = np.where(degenerate, 0.0, Y)
        if self.modified:
            a = self.ell.a
            Xr = X * a - _MK["X0"]
            Yr = Y * a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            X = X - dX / a
            Y = Y - dY / a
        x, y = Y, X  # swap: southing/westing -> axis order
        if self.easting_northing:
            a = self.ell.a
            x = -x - 2 * self.x0 / a
            y = -y - 2 * self.y0 / a
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e = self.ell.e
        a = self.ell.a
        if self.easting_northing:
            y2 = -y - 2 * self.x0 / a
            x2 = -x - 2 * self.y0 / a
        else:
            x2, y2 = x, y
        X, Y = y2, x2  # unswap
        if self.modified:
            Xr = X * a - _MK["X0"]
            Yr = Y * a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            X = X + dX / a
            Y = Y + dY / a
        rho = np.hypot(X, Y)
        eps_ = np.arctan2(Y, X)
        d = eps_ / np.sin(self._S0)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(rho == 0, HALF_PI,
                         2.0 * (np.arctan((self.rho0 / np.where(rho == 0, 1.0, rho))
                                          ** (1.0 / self.n)
                                          * np.tan(self._S0 / 2.0 + np.pi / 4))
                                - np.pi / 4))
        u = aasin(np.clip(np.cos(self.ad) * np.sin(s)
                          - np.sin(self.ad) * np.cos(s) * np.cos(d), -1, 1))
        deltav = aasin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1, 1))
        lam = -deltav / self.alpha  # lam0 re-added by the generic finalize
        fi1 = u.copy()
        for _ in range(30):
            fi1 = 2.0 * (np.arctan(self.k_ ** (-1.0 / self.alpha)
                                   * np.tan(u / 2.0 + np.pi / 4) ** (1.0 / self.alpha)
                                   * ((1.0 + e * np.sin(fi1)) / (1.0 - e * np.sin(fi1)))
                                   ** (e / 2.0)) - np.pi / 4)
        # refine with Newton on the exact forward (the analytic chain above
        # is only a seed; far from the projection core its conditioning
        # drifts at the cm level)
        from ..ops import generic_inverse_2d
        lam, fi1 = generic_inverse_2d(self, x, y, lam, fi1)
        return lam, fi1, z, t


@register
class ModKrovak(Krovak):
    name = "mod_krovak"
    modified = True


@register
class Poly(Operator):
    """American Polyconic (reference poly.cpp, Sph&Ell)."""

    name = "poly"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        es = self.ell.es
        if es != 0.0:
            self.en = enfn(self.ell.n)
            self.ml0 = float(mlfn(np.float64(self.phi0), np.sin(self.phi0),
                                  np.cos(self.phi0), self.en))
        else:
            self.ml0 = -self.phi0

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        eq = np.abs(phi) <= 1e-10
        if es != 0.0:
            sp, cp = np.sin(phi), np.cos(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                ms = np.where(np.abs(cp) > 1e-10, msfn(sp, cp, es) / np.where(sp == 0, 1.0, sp), 0.0)
            E = lam * sp
            x = np.where(eq, lam, ms * np.sin(E))
            y = np.where(eq, -self.ml0,
                         (mlfn(phi, sp, cp, self.en) - self.ml0) + ms * (1.0 - np.cos(E)))
            return x, y, z, t
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = 1.0 / np.tan(np.where(eq, 1.0, phi))
        E = lam * np.sin(phi)
        x = np.where(eq, lam, np.sin(E) * cot)
        y = np.where(eq, self.ml0, phi - self.phi0 + cot * (1.0 - np.cos(E)))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        one_es = self.ell.one_es
        if es != 0.0:
            yy = y + self.ml0
            eq = np.abs(yy) <= 1e-10
            r = yy * yy + x * x
            phi = yy.copy()
            with np.errstate(divide="ignore", invalid="ignore"):
                for _ in range(20):
                    sp, cp = np.sin(phi), np.cos(phi)
                    s2ph = sp * cp
                    mlp = np.sqrt(1.0 - es * sp * sp)
                    c = sp * mlp / cp
                    ml = mlfn(phi, sp, cp, self.en)
                    mlb = ml * ml + r
                    mlp3 = one_es / (mlp * mlp * mlp)
                    dPhi = ((ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0))
                            / (es * s2ph * (mlb - 2.0 * yy * ml) / c
                               + 2.0 * (yy - ml) * (c * mlp3 - 1.0 / s2ph) - mlp3 - mlp3))
                    phi = phi + dPhi
                c2 = np.sin(phi)
                lam = aasin(np.clip(x * np.tan(phi) * np.sqrt(1.0 - es * c2 * c2), -1, 1)) \
                    / np.where(np.sin(phi) == 0, 1.0, np.sin(phi))
            lam = np.where(eq, x, lam)
            phi = np.where(eq, 0.0, phi)
            return lam, phi, z, t
        yy = self.phi0 + y
        eq = np.abs(yy) <= 1e-10
        B = x * x + yy * yy
        phi = yy.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(12):
                tp = np.tan(phi)
                dphi = ((yy * (phi * tp + 1.0) - phi - 0.5 * (phi * phi + B) * tp)
                        / ((phi - yy) / tp - 1.0))
                phi = phi - dphi
            lam = aasin(np.clip(x * np.tan(phi), -1, 1)) / np.where(np.sin(phi) == 0, 1.0, np.sin(phi))
        lam = np.where(eq, x, lam)
        phi = np.where(eq, 0.0, phi)
        return lam, phi, z, t


@register
class Tpeqd(Operator):
    """Two-point equidistant (reference tpeqd.cpp, spherical)."""

    name = "tpeqd"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        phi_1 = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
        lam_1 = parse_angle(p.get("lon_1", 0.0)) * DEG_TO_RAD
        phi_2 = parse_angle(p.get("lat_2", 0.0)) * DEG_TO_RAD
        lam_2 = parse_angle(p.get("lon_2", 0.0)) * DEG_TO_RAD
        if phi_1 == phi_2 and lam_1 == lam_2:
            illegal_arg("tpeqd: the 2 points should be distinct")
        if (abs(abs(phi_1) - HALF_PI) < 1e-12
                and abs(abs(phi_2) - HALF_PI) < 1e-12):
            # reference tpeqd.cpp:103-107 (z02 == 0 "actually happens when
            # both lat_1 = lat_2 and |lat_1| = 90")
            illegal_arg("tpeqd: |lat_1| and |lat_2| should be < 90")
        self.lam0 = float(adjlon(np.asarray(0.5 * (lam_1 + lam_2))))
        self.dlam2 = float(adjlon(np.asarray(lam_2 - lam_1)))
        self.cp1, self.cp2 = np.cos(phi_1), np.cos(phi_2)
        self.sp1, self.sp2 = np.sin(phi_1), np.sin(phi_2)
        self.cs = self.cp1 * self.sp2
        self.sc = self.sp1 * self.cp2
        self.ccs = self.cp1 * self.cp2 * np.sin(self.dlam2)
        csc = self.cs - self.sc * np.cos(self.dlam2)
        z02 = np.arctan2(np.hypot(self.cp2 * np.sin(self.dlam2), csc),
                         self.sp1 * self.sp2 + self.cp1 * self.cp2 * np.cos(self.dlam2))
        if z02 == 0.0:
            illegal_arg("tpeqd: |lat_1| and |lat_2| should be < 90")
        self.hz0 = 0.5 * z02
        A12 = np.arctan2(self.cp2 * np.sin(self.dlam2), csc)
        pp = float(aasin(self.cp1 * np.sin(A12)))
        self.ca, self.sa = np.cos(pp), np.sin(pp)
        self.lp = float(adjlon(np.asarray(
            np.arctan2(self.cp1 * np.cos(A12), self.sp1) - self.hz0)))
        self.dlam2 *= 0.5
        self.lamc = HALF_PI - np.arctan2(np.sin(A12) * self.sp1, np.cos(A12)) - self.dlam2
        self.thz0 = np.tan(self.hz0)
        self.rhshz0 = 0.5 / np.sin(self.hz0)
        self.r2z0 = 0.5 / z02
        self.z02 = z02 * z02

    def _fwd(self, lam, phi, z, t):
        sp, cp = np.sin(phi), np.cos(phi)
        dl1 = lam + self.dlam2
        dl2 = lam - self.dlam2
        z1 = aacos(np.clip(self.sp1 * sp + self.cp1 * cp * np.cos(dl1), -1, 1))
        z2 = aacos(np.clip(self.sp2 * sp + self.cp2 * cp * np.cos(dl2), -1, 1))
        z1 *= z1
        z2 *= z2
        tt = z1 - z2
        x = self.r2z0 * tt
        tt = self.z02 - tt
        y = self.r2z0 * np.sqrt(np.maximum(4.0 * self.z02 * z2 - tt * tt, 0.0))
        neg = (self.ccs * sp - cp * (self.cs * np.sin(dl1) - self.sc * np.sin(dl2))) < 0
        return x, np.where(neg, -y, y), z, t

    def _inv(self, x, y, z, t):
        cz1 = np.cos(np.hypot(y, x + self.hz0))
        cz2 = np.cos(np.hypot(y, x - self.hz0))
        s = cz1 + cz2
        d = cz1 - cz2
        lam = -np.arctan2(d, s * self.thz0)
        phi = aacos(np.clip(np.hypot(self.thz0 * s, d) * self.rhshz0, -1, 1))
        phi = np.where(y < 0, -phi, phi)
        sp, cp = np.sin(phi), np.cos(phi)
        lam = lam - self.lp
        s2 = np.cos(lam)
        phi2_ = aasin(np.clip(self.sa * sp + self.ca * cp * s2, -1, 1))
        lam2 = np.arctan2(cp * np.sin(lam), self.sa * cp * s2 - self.ca * sp) + self.lamc
        return lam2, phi2_, z, t


@register
class Geos(Operator):
    """Geostationary satellite view (reference geos.cpp, Sph&Ell)."""

    name = "geos"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        h = float(p["h"])
        sweep = str(p.get("sweep", "y"))
        if sweep not in ("x", "y"):
            illegal_arg("geos: invalid value for sweep (x or y)")
        self.flip_axis = sweep == "x"
        self.radius_g_1 = h / self.ell.a
        if self.radius_g_1 <= 0 or self.radius_g_1 > 1e10:
            # geos.cpp:218-224
            illegal_arg("geos: invalid value for h")
        self.radius_g = 1.0 + self.radius_g_1
        self.C = self.radius_g * self.radius_g - 1.0
        es = self.ell.es
        if es != 0.0:
            self.radius_p = np.sqrt(self.ell.one_es)
            self.radius_p2 = self.ell.one_es
            self.radius_p_inv2 = 1.0 / self.ell.one_es
        else:
            self.radius_p = self.radius_p2 = self.radius_p_inv2 = 1.0

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        if es != 0.0:
            phi = np.arctan(self.radius_p2 * np.tan(phi))
            r = self.radius_p / np.hypot(self.radius_p * np.cos(phi), np.sin(phi))
        else:
            r = 1.0
        cphi = np.cos(phi)
        Vx = r * np.cos(lam) * cphi
        Vy = r * np.sin(lam) * cphi
        Vz = r * np.sin(phi)
        bad = ((self.radius_g - Vx) * Vx - Vy * Vy
               - Vz * Vz * self.radius_p_inv2) < 0.0
        tmp = self.radius_g - Vx
        if self.flip_axis:
            x = self.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = self.radius_g_1 * np.arctan(Vz / tmp)
        else:
            x = self.radius_g_1 * np.arctan(Vy / tmp)
            y = self.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        Vx = -1.0
        if self.flip_axis:
            Vz = np.tan(y / self.radius_g_1)
            Vy = np.tan(x / self.radius_g_1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / self.radius_g_1)
            Vz = np.tan(y / self.radius_g_1) * np.hypot(1.0, Vy)
        if es != 0.0:
            a_ = Vz / self.radius_p
            a_ = Vy * Vy + a_ * a_ + Vx * Vx
        else:
            a_ = Vy * Vy + Vz * Vz + Vx * Vx
        b_ = 2.0 * self.radius_g * Vx
        det = b_ * b_ - 4.0 * a_ * self.C
        bad = det < 0.0
        k = (-b_ - np.sqrt(np.maximum(det, 0.0))) / (2.0 * a_)
        Vx2 = self.radius_g + k * Vx
        Vy2 = Vy * k
        Vz2 = Vz * k
        lam = np.arctan2(Vy2, Vx2)
        phi = np.arctan(Vz2 * np.cos(lam) / Vx2)
        if es != 0.0:
            phi = np.arctan(self.radius_p_inv2 * np.tan(phi))
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t
