"""Second breadth batch: Gauss-sphere stereographic, simple conics,
sine-tangent series, and misc spherical projections.

Vectorized numpy reimplementations of:
- sterea:  src/projections/sterea.cpp + src/gauss.cpp (Gauss sphere)
- euler/murd1/murd2/murd3/pconic/tissot/vitk1: src/projections/sconics.cpp
- kav5/qua_aut/fouc/mbt_s: src/projections/sts.cpp
- tobmerc:  src/projections/tobmerc.cpp
- vandg:    src/projections/vandg.cpp (Snyder 1987 p.241 cubic inverse)
- airy:     src/projections/airy.cpp (forward only, like the reference)
- nsper/tpers: src/projections/nsper.cpp
- ocea:     src/projections/ocea.cpp
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import DEG_TO_RAD, FORT_PI, HALF_PI, aasin

_EPS10 = 1e-10


# ---------------------------------------------------------------------------
# Gauss sphere (reference src/gauss.cpp)
# ---------------------------------------------------------------------------

class GaussSphere:
    def __init__(self, e: float, phi0: float):
        es = e * e
        self.e = e
        sphi = np.sin(phi0)
        cphi2 = np.cos(phi0) ** 2
        self.rc = np.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.C = np.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        if self.C == 0.0 or not np.isfinite(self.C):
            raise ValueError("gauss sphere: invalid C (eccentricity ~ 1)")
        self.chi0 = float(aasin(sphi / self.C))
        self.ratexp = 0.5 * self.C * e
        srat0 = self._srat(e * sphi, self.ratexp)
        if srat0 == 0.0 or not np.isfinite(srat0):
            # reference gauss.cpp:67-71: srat underflow (es ~ 1) aborts init
            raise ValueError("gauss sphere: srat underflow (eccentricity ~ 1)")
        if 0.5 * phi0 + FORT_PI < 1e-10:
            # south-polar origin (reference gauss.cpp:73-75)
            self.K = 1.0 / srat0
        else:
            self.K = (np.tan(0.5 * self.chi0 + FORT_PI)
                      / (np.tan(0.5 * phi0 + FORT_PI) ** self.C * srat0))

    @staticmethod
    def _srat(esinp, exp_):
        return ((1.0 - esinp) / (1.0 + esinp)) ** exp_

    def fwd(self, lam, phi):
        chi = 2.0 * np.arctan(self.K * np.tan(0.5 * phi + FORT_PI) ** self.C
                              * self._srat(self.e * np.sin(phi), self.ratexp)) - HALF_PI
        return self.C * lam, chi

    def inv(self, slam, schi):
        lam = slam / self.C
        num = (np.tan(0.5 * schi + FORT_PI) / self.K) ** (1.0 / self.C)
        phi = schi.copy()
        for _ in range(20):
            phi_new = 2.0 * np.arctan(
                num * self._srat(self.e * np.sin(phi), -0.5 * self.e)) - HALF_PI
            phi = phi_new
        return lam, phi


@register
class Sterea(Operator):
    """Oblique Stereographic Alternative (reference sterea.cpp): Gauss
    sphere conformal mapping + spherical stereographic."""

    name = "sterea"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.gauss = GaussSphere(self.ell.e, self.phi0)
        self.sinc0 = float(np.sin(self.gauss.chi0))
        self.cosc0 = float(np.cos(self.gauss.chi0))
        self.R2 = 2.0 * self.gauss.rc

    def _fwd(self, lam, phi, z, t):
        slam, schi = self.gauss.fwd(lam, phi)
        sinc, cosc = np.sin(schi), np.cos(schi)
        cosl = np.cos(slam)
        denom = 1.0 + self.sinc0 * sinc + self.cosc0 * cosc * cosl
        k = np.where(denom == 0, np.nan, self.k0 * self.R2 / denom)
        x = k * cosc * np.sin(slam)
        y = k * (self.cosc0 * sinc - self.sinc0 * cosc * cosl)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        xx = x / self.k0
        yy = y / self.k0
        rho = np.hypot(xx, yy)
        c = 2.0 * np.arctan2(rho, self.R2)
        sinc, cosc = np.sin(c), np.cos(c)
        safe = np.where(rho == 0, 1.0, rho)
        schi = np.where(rho == 0, self.gauss.chi0,
                        aasin(np.clip(cosc * self.sinc0 + yy * sinc * self.cosc0 / safe, -1, 1)))
        slam = np.where(rho == 0, 0.0,
                        np.arctan2(xx * sinc, rho * self.cosc0 * cosc - yy * self.sinc0 * sinc))
        lam, phi = self.gauss.inv(slam, schi)
        return lam, phi, z, t


# ---------------------------------------------------------------------------
# Simple conics (reference sconics.cpp)
# ---------------------------------------------------------------------------

class _Sconic(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    kind = "?"

    def setup(self):
        p = self.params
        phi1 = parse_angle(p["lat_1"]) * DEG_TO_RAD
        phi2 = parse_angle(p["lat_2"]) * DEG_TO_RAD
        delta = 0.5 * (phi2 - phi1)
        sig = 0.5 * (phi2 + phi1)
        if abs(delta) < _EPS10 or abs(sig) < _EPS10:
            raise ValueError("sconics: |lat_1 +- lat_2| must be > 0")
        self.sig = sig
        k = self.kind
        if k == "tissot":
            self.n = np.sin(sig)
            cs = np.cos(delta)
            self.rho_c = self.n / cs + cs / self.n
            self.rho_0 = np.sqrt((self.rho_c - 2.0 * np.sin(self.phi0)) / self.n)
        elif k == "murd1":
            self.rho_c = np.sin(delta) / (delta * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = np.sin(sig)
        elif k == "murd2":
            cs = np.sqrt(np.cos(delta))
            self.rho_c = cs / np.tan(sig)
            self.rho_0 = self.rho_c + np.tan(sig - self.phi0)
            self.n = np.sin(sig) * cs
        elif k == "murd3":
            self.rho_c = delta / (np.tan(sig) * np.tan(delta)) + sig
            self.rho_0 = self.rho_c - self.phi0
            self.n = np.sin(sig) * np.sin(delta) * np.tan(delta) / (delta * delta)
        elif k == "euler":
            self.n = np.sin(sig) * np.sin(delta) / delta
            delta *= 0.5
            self.rho_c = delta / (np.tan(delta) * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - self.phi0
        elif k == "pconic":
            self.n = np.sin(sig)
            self.c2 = np.cos(delta)
            self.c1 = 1.0 / np.tan(sig)
            d = self.phi0 - sig
            if abs(d) - _EPS10 >= HALF_PI:
                raise ValueError("pconic: |lat_0 - sig| must be < 90")
            self.rho_0 = self.c2 * (self.c1 - np.tan(d))
            self.rho_c = 0.0
        elif k == "vitk1":
            cs = np.tan(delta)
            self.n = cs * np.sin(sig) / delta
            self.rho_c = delta / (cs * np.tan(sig)) + sig
            self.rho_0 = self.rho_c - self.phi0
        self.n = float(self.n)

    def _fwd(self, lam, phi, z, t):
        if self.kind == "murd2":
            rho = self.rho_c + np.tan(self.sig - phi)
        elif self.kind == "pconic":
            rho = self.c2 * (self.c1 - np.tan(phi - self.sig))
        else:
            rho = self.rho_c - phi
        ln = lam * self.n
        return rho * np.sin(ln), self.rho_0 - rho * np.cos(ln), z, t

    def _inv(self, x, y, z, t):
        yy = self.rho_0 - y
        rho = np.hypot(x, yy)
        xs = np.where(self.n < 0, -x, x)
        ys = np.where(self.n < 0, -yy, yy)
        rho = np.where(self.n < 0, -rho, rho)
        lam = np.arctan2(xs, ys) / self.n
        if self.kind == "pconic":
            phi = np.arctan(self.c1 - rho / self.c2) + self.sig
        elif self.kind == "murd2":
            phi = self.sig - np.arctan(rho - self.rho_c)
        else:
            phi = self.rho_c - rho
        return lam, phi, z, t


for _kind in ("euler", "murd1", "murd2", "murd3", "pconic", "tissot", "vitk1"):
    cls = type(_kind.capitalize(), (_Sconic,), {"name": _kind, "kind": _kind})
    register(cls)
    globals()[_kind.capitalize()] = cls


# ---------------------------------------------------------------------------
# sine-tangent series (reference sts.cpp)
# ---------------------------------------------------------------------------

class _Sts(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    _p = _q = 1.0
    _tan_mode = False

    def setup(self):
        self.C_x = self._q / self._p
        self.C_y = self._p
        self.C_p = 1.0 / self._q

    def _fwd(self, lam, phi, z, t):
        x = self.C_x * lam * np.cos(phi)
        ph = phi * self.C_p
        c = np.cos(ph)
        if self._tan_mode:
            x = x * c * c
            y = self.C_y * np.tan(ph)
        else:
            x = x / c
            y = self.C_y * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        yy = y / self.C_y
        ph = np.arctan(yy) if self._tan_mode else aasin(yy)
        c = np.cos(ph)
        phi = ph / self.C_p
        lam = x / (self.C_x * np.cos(phi))
        lam = lam / (c * c) if self._tan_mode else lam * c
        return lam, phi, z, t


@register
class Fouc(_Sts):
    name = "fouc"
    _p, _q, _tan_mode = 2.0, 2.0, True


@register
class Kav5(_Sts):
    name = "kav5"
    _p, _q, _tan_mode = 1.50488, 1.35439, False


@register
class QuaAut(_Sts):
    name = "qua_aut"
    _p, _q, _tan_mode = 2.0, 2.0, False


@register
class MbtS(_Sts):
    name = "mbt_s"
    _p, _q, _tan_mode = 1.48875, 1.36509, False


# ---------------------------------------------------------------------------


@register
class Tobmerc(Operator):
    """Tobler-Mercator (reference tobmerc.cpp)."""

    name = "tobmerc"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        bad = np.abs(phi) >= HALF_PI
        c = np.cos(phi)
        x = self.k0 * lam * c * c
        y = self.k0 * np.arcsinh(np.tan(phi))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        phi = np.arctan(np.sinh(y / self.k0))
        c = np.cos(phi)
        return x / self.k0 / (c * c), phi, z, t


@register
class Vandg(Operator):
    """van der Grinten I (reference vandg.cpp; Snyder 1987 eqs. 29-1..29-18)."""

    name = "vandg"
    left = U_RADIANS
    right = U_CLASSIC
    _TOL = 1e-10

    def _fwd(self, lam, phi, z, t):
        p2 = np.abs(phi / HALF_PI)
        bad = (p2 - self._TOL) > 1.0
        p2 = np.minimum(p2, 1.0)
        eq = np.abs(phi) <= self._TOL
        merid = (np.abs(lam) <= self._TOL) | (np.abs(p2 - 1.0) < self._TOL)
        sign = np.where(self.over & (np.abs(lam) > np.pi), -1.0, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            al = 0.5 * sign * np.abs(np.pi / np.where(lam == 0, 1.0, lam)
                                     - np.where(lam == 0, 1.0, lam) / np.pi)
            al2 = al * al
            g = np.sqrt(np.maximum(1.0 - p2 * p2, 0.0))
            g = g / np.where(p2 + g - 1.0 == 0, np.nan, p2 + g - 1.0)
            g2 = g * g
            P = g * (2.0 / np.where(p2 == 0, np.nan, p2) - 1.0)
            P2 = P * P
            xa = g - P2
            gg = P2 + al2
            x = np.pi * np.abs(al * xa + np.sqrt(np.maximum(
                al2 * xa * xa - gg * (g2 - P2), 0.0))) / gg
            x = np.where(lam < 0, -x, x)
            ya = np.abs(x / np.pi)
            y2v = 1.0 - ya * (ya + 2.0 * al)
            ybad = y2v < -self._TOL
            y = np.sqrt(np.maximum(y2v, 0.0)) * np.where(phi < 0, -np.pi, np.pi)
        x = np.where(eq, lam, np.where(merid, 0.0, x))
        ym = np.pi * np.tan(0.5 * aasin(p2))
        ym = np.where(phi < 0, -ym, ym)
        y = np.where(eq, 0.0, np.where(merid, ym, y))
        bad = bad | (~eq & ~merid & ybad)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        THIRD = 1.0 / 3.0
        C2_27 = 2.0 / 27.0
        PI4_3 = 4.18879020478639098458
        PISQ = np.pi * np.pi
        TPISQ = 2.0 * PISQ
        HPISQ = 0.5 * PISQ
        x2 = x * x
        ay = np.abs(y)
        on_eq = ay < self._TOL
        with np.errstate(invalid="ignore", divide="ignore"):
            t_eq = x2 * x2 + TPISQ * (x2 + HPISQ)
            lam_eq = np.where(np.abs(x) <= self._TOL, 0.0,
                              0.5 * (x2 - PISQ + np.sqrt(t_eq)) / np.where(x == 0, 1.0, x))
            y2 = y * y
            r = x2 + y2
            r2 = r * r
            c1 = -np.pi * ay * (r + PISQ)
            c3 = r2 + 2.0 * np.pi * (ay * r + np.pi * (y2 + np.pi * (ay + HALF_PI)))
            c2 = c1 + PISQ * (r - 3.0 * y2)
            c0 = np.pi * ay
            c2 = c2 / c3
            al = c1 / c3 - THIRD * c2 * c2
            m = 2.0 * np.sqrt(np.maximum(-THIRD * al, 0.0))
            d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
            alm = al * m
            degenerate = np.abs(alm) < 1e-16
            d = 3.0 * d / np.where(degenerate, np.nan, alm)
            td = np.abs(d)
            bad = (td - self._TOL) > 1.0
            d = np.where(td > 1.0, np.where(d > 0, 0.0, np.pi), np.arccos(np.clip(d, -1, 1)))
            d = np.where(r > PISQ, 2.0 * np.pi - d, d)
            phi = np.pi * (m * np.cos(d * THIRD + PI4_3) - THIRD * c2)
            phi = np.where(y < 0, -phi, phi)
            tl = r2 + TPISQ * (x2 - y2 + HPISQ)
            lam = np.where(np.abs(x) <= self._TOL, 0.0,
                           0.5 * (r - PISQ + np.sqrt(np.maximum(tl, 0.0)))
                           / np.where(x == 0, 1.0, x))
        phi = np.where(on_eq, 0.0, phi)
        lam = np.where(on_eq, lam_eq, lam)
        bad = ~on_eq & (bad | degenerate)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Airy(Operator):
    """Airy minimum-error azimuthal (reference airy.cpp; forward only,
    like the reference)."""

    name = "airy"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def setup(self):
        p = self.params
        self.no_cut = "no_cut" in p
        beta = 0.5 * (HALF_PI - parse_angle(p.get("lat_b", 0.0)) * DEG_TO_RAD)
        if abs(beta) < _EPS10:
            self.Cb = -0.5
        else:
            cb = 1.0 / np.tan(beta)
            self.Cb = cb * cb * np.log(np.cos(beta))
        t = abs(self.phi0)
        if abs(t - HALF_PI) < _EPS10:
            self.mode = "s_pole" if self.phi0 < 0 else "n_pole"
            self.p_halfpi = -HALF_PI if self.phi0 < 0 else HALF_PI
        elif t < _EPS10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi, z, t):
        sinlam, coslam = np.sin(lam), np.cos(lam)
        if self.mode in ("equit", "obliq"):
            sinphi, cosphi = np.sin(phi), np.cos(phi)
            cosz = cosphi * coslam
            if self.mode == "obliq":
                cosz = self.sinph0 * sinphi + self.cosph0 * cosz
            bad = (~np.full_like(cosz, self.no_cut, dtype=bool)) & (cosz < -_EPS10)
            s = 1.0 - cosz
            tt = 0.5 * (1.0 + cosz)
            with np.errstate(divide="ignore", invalid="ignore"):
                Krho = np.where(np.abs(s) > _EPS10,
                                -np.log(np.where(tt <= 0, np.nan, tt)) / np.where(s == 0, 1.0, s)
                                - self.Cb / np.where(tt <= 0, np.nan, tt),
                                0.5 - self.Cb)
            x = Krho * cosphi * sinlam
            if self.mode == "obliq":
                y = Krho * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
            else:
                y = Krho * sinphi
            return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t
        ph = np.abs(self.p_halfpi - phi)
        bad = (~np.full_like(ph, self.no_cut, dtype=bool)) & ((ph - _EPS10) > HALF_PI)
        ph = ph * 0.5
        tt = np.tan(ph)
        with np.errstate(divide="ignore", invalid="ignore"):
            Krho = np.where(ph > _EPS10,
                            -2.0 * (np.log(np.cos(ph)) / np.where(tt == 0, 1.0, tt)
                                    + tt * self.Cb),
                            0.0)
        x = Krho * sinlam
        y = Krho * coslam
        if self.mode == "n_pole":
            y = -y
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        raise NotImplementedError("airy has no inverse (reference parity)")


@register
class Nsper(Operator):
    """Near-sided / tilted perspective (reference nsper.cpp)."""

    name = "nsper"
    left = U_RADIANS
    right = U_CLASSIC
    tilt = False

    def setup(self):
        p = self.params
        height = float(p["h"])
        t = abs(self.phi0)
        if abs(t - HALF_PI) < _EPS10:
            self.mode = "s_pole" if self.phi0 < 0 else "n_pole"
        elif t < _EPS10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.pn1 = height / self.ell.a
        if self.pn1 <= 0 or self.pn1 > 1e10:
            from ..errors import illegal_arg
            illegal_arg("nsper: invalid value for h")
        self.p = 1.0 + self.pn1
        self.rp = 1.0 / self.p
        self.h_ = 1.0 / self.pn1
        self.pfact = (self.p + 1.0) * self.h_
        if self.tilt:
            omega = parse_angle(p.get("tilt", 0.0)) * DEG_TO_RAD
            gamma = parse_angle(p.get("azi", 0.0)) * DEG_TO_RAD
            self.cg, self.sg = np.cos(gamma), np.sin(gamma)
            self.cw, self.sw = np.cos(omega), np.sin(omega)

    def _fwd(self, lam, phi, z, t):
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == "obliq":
            cosz = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == "equit":
            cosz = cosphi * coslam
        elif self.mode == "s_pole":
            cosz = -sinphi
        else:
            cosz = sinphi
        bad = cosz < self.rp
        yk = self.pn1 / (self.p - cosz)
        x = yk * cosphi * np.sin(lam)
        if self.mode == "obliq":
            y = yk * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        elif self.mode == "equit":
            y = yk * sinphi
        elif self.mode == "n_pole":
            y = yk * cosphi * (-coslam)
        else:
            y = yk * cosphi * coslam
        if self.tilt:
            yt = y * self.cg + x * self.sg
            ba = 1.0 / (yt * self.sw * self.h_ + self.cw)
            x, y = (x * self.cg - y * self.sg) * self.cw * ba, yt * ba
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        if self.tilt:
            yt = 1.0 / (self.pn1 - y * self.sw)
            bm = self.pn1 * x * yt
            bq = self.pn1 * y * self.cw * yt
            x = bm * self.cg + bq * self.sg
            y = bq * self.cg - bm * self.sg
        rh = np.hypot(x, y)
        center = np.abs(rh) <= _EPS10
        sinz = 1.0 - rh * rh * self.pfact
        bad = sinz < 0
        safe_rh = np.where(rh == 0, 1.0, rh)
        sinz = (self.p - np.sqrt(np.maximum(sinz, 0.0))) / (self.pn1 / safe_rh + safe_rh / self.pn1)
        cosz = np.sqrt(np.maximum(1.0 - sinz * sinz, 0.0))
        if self.mode == "obliq":
            phi = aasin(np.clip(cosz * self.sinph0 + y * sinz * self.cosph0 / safe_rh, -1, 1))
            yy = (cosz - self.sinph0 * np.sin(phi)) * rh
            xx = x * sinz * self.cosph0
        elif self.mode == "equit":
            phi = aasin(np.clip(y * sinz / safe_rh, -1, 1))
            yy = cosz * rh
            xx = x * sinz
        elif self.mode == "n_pole":
            phi = aasin(np.clip(cosz, -1, 1))
            yy = -y
            xx = x
        else:
            phi = -aasin(np.clip(cosz, -1, 1))
            yy = y
            xx = x
        lam = np.arctan2(xx, yy)
        phi = np.where(center, self.phi0, phi)
        lam = np.where(center, 0.0, lam)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Tpers(Nsper):
    name = "tpers"
    tilt = True


@register
class Ocea(Operator):
    """Oblique Cylindrical Equal Area (reference ocea.cpp)."""

    name = "ocea"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        self.rok = 1.0 / self.k0
        self.rtk = self.k0
        if "alpha" in p:
            alpha = np.pi + parse_angle(p["alpha"]) * DEG_TO_RAD
            lonz = parse_angle(p.get("lonc", 0.0)) * DEG_TO_RAD
            lam_p = np.arctan2(-np.cos(alpha), -np.sin(self.phi0) * np.sin(alpha)) + lonz
            phi_p = aasin(np.cos(self.phi0) * np.sin(alpha))
        else:
            phi_1 = parse_angle(p["lat_1"]) * DEG_TO_RAD
            phi_2 = parse_angle(p["lat_2"]) * DEG_TO_RAD
            lam_1 = parse_angle(p.get("lon_1", 0.0)) * DEG_TO_RAD
            lam_2 = parse_angle(p.get("lon_2", 0.0)) * DEG_TO_RAD
            lam_p = np.arctan2(
                np.cos(phi_1) * np.sin(phi_2) * np.cos(lam_1)
                - np.sin(phi_1) * np.cos(phi_2) * np.cos(lam_2),
                np.sin(phi_1) * np.cos(phi_2) * np.sin(lam_2)
                - np.cos(phi_1) * np.sin(phi_2) * np.sin(lam_1))
            if lam_1 == -HALF_PI:
                lam_p = -lam_p
            tp1 = np.tan(phi_1)
            if tp1 == 0.0:
                phi_p = -HALF_PI if np.cos(lam_p - lam_1) >= 0 else HALF_PI
            else:
                phi_p = np.arctan(-np.cos(lam_p - lam_1) / tp1)
        self.lam0 = float(lam_p + HALF_PI)
        self.cosphi = float(np.cos(phi_p))
        self.sinphi = float(np.sin(phi_p))

    def _fwd(self, lam, phi, z, t):
        s = np.sin(lam)
        tl = np.cos(lam)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.arctan((np.tan(phi) * self.cosphi + self.sinphi * s) / tl)
        x = np.where(tl < 0, x + np.pi, x) * self.rtk
        y = self.rok * (self.sinphi * np.sin(phi) - self.cosphi * np.cos(phi) * s)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        yy = y / self.rok
        xx = x / self.rtk
        tl = np.sqrt(np.maximum(1.0 - yy * yy, 0.0))
        s = np.sin(xx)
        phi = aasin(np.clip(yy * self.sinphi + tl * self.cosphi * s, -1, 1))
        lam = np.arctan2(tl * self.sinphi * s - yy * self.cosphi, tl * np.cos(xx))
        return lam, phi, z, t
