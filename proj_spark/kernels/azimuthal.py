"""Azimuthal projections: stere/ups, laea, aeqd, ortho, gnom.

Vectorized numpy reimplementations of:
- stere/ups: reference src/projections/stere.cpp (e/s fwd+inv, setup :232-325)
- laea:      reference src/projections/laea.cpp (authalic-lat formulation)
- aeqd:      reference src/projections/aeqd.cpp (ellipsoidal path delegates
             to the geodesic kernel, aeqd.cpp:280 geod_init; spherical closed
             form :125-185)
- ortho:     reference src/projections/ortho.cpp (spherical + EPSG §3.3.5
             ellipsoidal)
- gnom:      reference src/projections/gnom.cpp (spherical)

All operators follow the same Mode = {N_POLE, S_POLE, EQUIT, OBLIQ} dispatch
the reference uses; modes are resolved at setup so the per-batch kernel is
branch-free for the common single-mode case.
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import EPS_LAT, FORT_PI, HALF_PI, aasin, authalic_phi1, qsfn, tsfn
from . import geodesic

_EPS10 = 1e-10

N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


def _mode(phi0: float) -> int:
    t = abs(phi0)
    if abs(t - HALF_PI) < _EPS10:
        return S_POLE if phi0 < 0 else N_POLE
    return OBLIQ if t > _EPS10 else EQUIT


def _ssfn(phi, sinphi, e):
    sinphi = sinphi * e
    return np.tan(0.5 * (HALF_PI + phi)) * ((1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * e)


@register
class Stere(Operator):
    """Stereographic (reference src/projections/stere.cpp)."""

    name = "stere"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        self.phits = abs(parse_angle(p["lat_ts"]) * np.pi / 180.0) if "lat_ts" in p else HALF_PI
        self.mode = _mode(self.phi0)
        e, es = self.ell.e, self.ell.es
        if es != 0.0:
            if self.mode in (N_POLE, S_POLE):
                if abs(self.phits - HALF_PI) < _EPS10:
                    self.akm1 = 2.0 * self.k0 / np.sqrt(
                        (1 + e) ** (1 + e) * (1 - e) ** (1 - e))
                else:
                    t = np.sin(self.phits)
                    self.akm1 = float(np.cos(self.phits)
                                      / tsfn(np.float64(self.phits), np.float64(t), e))
                    self.akm1 /= np.sqrt(1.0 - (t * e) ** 2)
            else:
                t = np.sin(self.phi0)
                X = 2.0 * np.arctan(_ssfn(np.float64(self.phi0), np.float64(t), e)) - HALF_PI
                self.akm1 = 2.0 * self.k0 * np.cos(self.phi0) / np.sqrt(1.0 - (t * e) ** 2)
                self.sinX1 = float(np.sin(X))
                self.cosX1 = float(np.cos(X))
        else:
            if self.mode in (N_POLE, S_POLE):
                self.akm1 = (np.cos(self.phits) / np.tan(FORT_PI - 0.5 * self.phits)
                             if abs(self.phits - HALF_PI) >= _EPS10 else 2.0 * self.k0)
            else:
                self.akm1 = 2.0 * self.k0
                self.sinX1 = float(np.sin(self.phi0))
                self.cosX1 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi, z, t):
        e, es = self.ell.e, self.ell.es
        coslam, sinlam = np.cos(lam), np.sin(lam)
        if es != 0.0:
            sinphi = np.sin(phi)
            if self.mode == OBLIQ:
                X = 2.0 * np.arctan(_ssfn(phi, sinphi, e)) - HALF_PI
                sinX, cosX = np.sin(X), np.cos(X)
                denom = self.cosX1 * (1.0 + self.sinX1 * sinX + self.cosX1 * cosX * coslam)
                A = np.where(denom != 0, self.akm1 / denom, np.nan)
                y = A * (self.cosX1 * sinX - self.sinX1 * cosX * coslam)
                x = A * cosX
            elif self.mode == EQUIT:
                X = 2.0 * np.arctan(_ssfn(phi, sinphi, e)) - HALF_PI
                sinX, cosX = np.sin(X), np.cos(X)
                denom = 1.0 + cosX * coslam
                A = np.where(denom != 0, self.akm1 / denom, np.nan)
                y = A * sinX
                x = A * cosX
            else:
                if self.mode == S_POLE:
                    phi, coslam, sinphi = -phi, -coslam, -sinphi
                x = np.where(np.abs(phi - HALF_PI) < 1e-15, 0.0,
                             self.akm1 * tsfn(phi, sinphi, e))
                y = -x * coslam
            return x * sinlam, y, z, t
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        if self.mode in (EQUIT, OBLIQ):
            if self.mode == EQUIT:
                den = 1.0 + cosphi * coslam
            else:
                den = 1.0 + self.sinX1 * sinphi + self.cosX1 * cosphi * coslam
            den = np.where(den <= _EPS10, np.nan, den)
            A = self.akm1 / den
            x = A * cosphi * sinlam
            y = A * (sinphi if self.mode == EQUIT
                     else self.cosX1 * sinphi - self.sinX1 * cosphi * coslam)
        else:
            if self.mode == N_POLE:
                coslam, phi = -coslam, -phi
            bad = np.abs(phi - HALF_PI) < 1e-8
            y0 = self.akm1 * np.tan(FORT_PI + 0.5 * phi)
            x = np.where(bad, np.nan, sinlam * y0)
            y = np.where(bad, np.nan, coslam * y0)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e, es = self.ell.e, self.ell.es
        rho = np.hypot(x, y)
        if es != 0.0:
            if self.mode in (OBLIQ, EQUIT):
                tp = 2.0 * np.arctan2(rho * self.cosX1, self.akm1)
                cosphi, sinphi = np.cos(tp), np.sin(tp)
                with np.errstate(invalid="ignore", divide="ignore"):
                    phi_l = np.where(
                        rho == 0.0, aasin(cosphi * self.sinX1),
                        aasin(cosphi * self.sinX1 + (y * sinphi * self.cosX1 / np.where(rho == 0, 1.0, rho))))
                tp2 = np.tan(0.5 * (HALF_PI + phi_l))
                xx = x * sinphi
                yy = rho * self.cosX1 * cosphi - y * self.sinX1 * sinphi
                halfpi, halfe = HALF_PI, 0.5 * e
            else:
                yy = -y if self.mode == N_POLE else y
                tp2 = -rho / self.akm1
                phi_l = HALF_PI - 2.0 * np.arctan(tp2)
                xx = x
                halfpi, halfe = -HALF_PI, -0.5 * e
            phi = phi_l
            for _ in range(10):
                sinphi = e * np.sin(phi)
                phi = 2.0 * np.arctan(tp2 * ((1.0 + sinphi) / (1.0 - sinphi)) ** halfe) - halfpi
            if self.mode == S_POLE:
                phi = -phi
            # (0, +-0) -> lam 0, matching the reference's explicit zero check
            # (stere.cpp:176-178) so the exact pole round-trips bit-clean
            lam = np.where((xx == 0) & (yy == 0), 0.0, np.arctan2(xx, yy))
            return lam, phi, z, t
        c = 2.0 * np.arctan(rho / self.akm1)
        sinc, cosc = np.sin(c), np.cos(c)
        safe_rho = np.where(rho == 0, 1.0, rho)
        if self.mode == EQUIT:
            phi = np.where(np.abs(rho) <= _EPS10, 0.0, aasin(y * sinc / safe_rho))
            lam = np.arctan2(x * sinc, cosc * rho)
        elif self.mode == OBLIQ:
            phi = np.where(np.abs(rho) <= _EPS10, self.phi0,
                           aasin(cosc * self.sinX1 + y * sinc * self.cosX1 / safe_rho))
            cc = cosc - self.sinX1 * np.sin(phi)
            lam = np.arctan2(x * sinc * self.cosX1, cc * rho)
        else:
            yy = -y if self.mode == N_POLE else y
            phi = np.where(np.abs(rho) <= _EPS10, self.phi0,
                           aasin(np.where(self.mode == S_POLE, -cosc, cosc)))
            lam = np.where((x == 0) & (yy == 0), 0.0, np.arctan2(x, yy))
        return lam, phi, z, t


@register
class Ups(Stere):
    """Universal Polar Stereographic (reference stere.cpp PJ_PROJECTION(ups))."""

    name = "ups"

    def __init__(self, params, invoked_name=None):
        p = dict(params)
        p["lat_0"] = -90 if "south" in p else 90
        p.setdefault("k", 0.994)
        p.setdefault("x_0", 2000000.0)
        p.setdefault("y_0", 2000000.0)
        p.setdefault("lon_0", 0.0)
        p.pop("lat_ts", None)
        super().__init__(p, invoked_name)
        if self.ell.es == 0.0:
            from ..errors import illegal_arg
            illegal_arg("ups: invalid use of +R / spherical ellipsoid "
                        "(stere.cpp ups setup requires es != 0)")


@register
class Laea(Operator):
    """Lambert Azimuthal Equal Area (reference src/projections/laea.cpp)."""

    name = "laea"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.mode = _mode(self.phi0)
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        if es != 0.0:
            self.qp = float(qsfn(np.float64(1.0), e, one_es))
            self.mmf = 0.5 / one_es
            if self.mode in (N_POLE, S_POLE):
                self.dd = 1.0
            elif self.mode == EQUIT:
                self.rq = np.sqrt(0.5 * self.qp)
                self.dd = 1.0 / self.rq
                self.xmf = 1.0
                self.ymf = 0.5 * self.qp
            else:
                self.rq = np.sqrt(0.5 * self.qp)
                sinphi = np.sin(self.phi0)
                self.sinb1 = float(qsfn(np.float64(sinphi), e, one_es)) / self.qp
                self.cosb1 = np.sqrt(1.0 - self.sinb1 ** 2)
                self.dd = (np.cos(self.phi0)
                           / (np.sqrt(1.0 - es * sinphi ** 2) * self.rq * self.cosb1))
                self.xmf = self.rq * self.dd
                self.ymf = self.rq / self.dd
        else:
            if self.mode == OBLIQ:
                self.sinb1 = float(np.sin(self.phi0))
                self.cosb1 = float(np.cos(self.phi0))

    def _fwd(self, lam, phi, z, t):
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        coslam, sinlam = np.cos(lam), np.sin(lam)
        if es != 0.0:
            sinphi = np.sin(phi)
            q = qsfn(sinphi, e, one_es)
            if self.mode in (OBLIQ, EQUIT):
                sinb = q / self.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.sqrt(np.maximum(cosb2, 0.0))
                if self.mode == OBLIQ:
                    b = 1.0 + self.sinb1 * sinb + self.cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                b = np.where(np.abs(b) < _EPS10, np.nan, b)
                b = np.sqrt(2.0 / b)
                if self.mode == OBLIQ:
                    y = self.ymf * b * (self.cosb1 * sinb - self.sinb1 * cosb * coslam)
                else:
                    y = self.ymf * b * sinb
                x = self.xmf * b * cosb * sinlam
            else:
                # opposite-pole domain check (reference laea.cpp:56-63)
                if self.mode == N_POLE:
                    bchk = HALF_PI + phi
                    q = self.qp - q
                else:
                    bchk = phi - HALF_PI
                    q = self.qp + q
                bad = np.abs(bchk) < _EPS10
                b = np.sqrt(np.maximum(q, 0.0))
                x = b * sinlam
                y = coslam * np.where(self.mode == S_POLE, b, -b)
                small = q < 1e-15
                x = np.where(small, 0.0, x)
                y = np.where(small, 0.0, y)
                x = np.where(bad | np.isnan(q), np.nan, x)
                y = np.where(bad | np.isnan(q), np.nan, y)
            return x, y, z, t
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        if self.mode in (EQUIT, OBLIQ):
            if self.mode == EQUIT:
                yb = 1.0 + cosphi * coslam
            else:
                yb = 1.0 + self.sinb1 * sinphi + self.cosb1 * cosphi * coslam
            yb = np.where(yb <= _EPS10, np.nan, np.sqrt(2.0 / yb))
            x = yb * cosphi * sinlam
            y = yb * (sinphi if self.mode == EQUIT
                      else self.cosb1 * sinphi - self.sinb1 * cosphi * coslam)
        else:
            coslam2 = -coslam if self.mode == N_POLE else coslam
            bad = np.abs(phi + self.phi0) < _EPS10
            yv = FORT_PI - phi * 0.5
            yv = 2.0 * (np.cos(yv) if self.mode == S_POLE else np.sin(yv))
            x = np.where(bad, np.nan, yv * sinlam)
            y = np.where(bad, np.nan, yv * coslam2)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        if es != 0.0:
            if self.mode in (EQUIT, OBLIQ):
                xs = x / self.dd
                ys = y * self.dd
                rho = np.hypot(xs, ys)
                arg = 0.5 * rho / self.rq
                arg = np.where(arg > 1.0, np.nan, arg)
                ce = 2.0 * aasin(arg)
                cCe, sCe = np.cos(ce), np.sin(ce)
                xs = xs * sCe
                safe = np.where(rho < _EPS10, 1.0, rho)
                if self.mode == OBLIQ:
                    ab = cCe * self.sinb1 + ys * sCe * self.cosb1 / safe
                    yy = rho * self.cosb1 * cCe - ys * self.sinb1 * sCe
                else:
                    ab = ys * sCe / safe
                    yy = rho * cCe
                lam = np.where(rho < _EPS10, 0.0, np.arctan2(xs, yy))
                phi = np.where(rho < _EPS10, self.phi0,
                               authalic_phi1_from_beta(ab, es))
                return lam, phi, z, t
            ys = -y if self.mode == N_POLE else y
            q = x * x + ys * ys
            ab = 1.0 - q / self.qp
            if self.mode == S_POLE:
                ab = -ab
            lam = np.where(q == 0.0, 0.0, np.arctan2(x, ys))
            phi = np.where(q == 0.0, self.phi0, authalic_phi1_from_beta(ab, es))
            return lam, phi, z, t
        rh = np.hypot(x, y)
        half = rh * 0.5
        half = np.where(half > 1.0, np.nan, half)
        cz = 2.0 * aasin(half)
        sinz, cosz = np.sin(cz), np.cos(cz)
        safe = np.where(np.abs(rh) <= _EPS10, 1.0, rh)
        if self.mode == EQUIT:
            phi = np.where(np.abs(rh) <= _EPS10, 0.0, aasin(y * sinz / safe))
            xx = x * sinz
            yy = cosz * rh
        elif self.mode == OBLIQ:
            phi = np.where(np.abs(rh) <= _EPS10, self.phi0,
                           aasin(cosz * self.sinb1 + y * sinz * self.cosb1 / safe))
            xx = x * sinz * self.cosb1
            yy = (cosz - np.sin(phi) * self.sinb1) * rh
        elif self.mode == N_POLE:
            phi = HALF_PI - cz
            xx, yy = x, -y
        else:
            phi = cz - HALF_PI
            xx, yy = x, y
        if self.mode in (EQUIT, OBLIQ):
            lam = np.where(yy == 0.0, 0.0, np.arctan2(xx, yy))
        else:
            lam = np.arctan2(xx, yy)
        return lam, phi, z, t


def authalic_phi1_from_beta(sin_beta, es):
    """beta (authalic lat) -> phi, via the qsfn-based Newton used across the
    engine (reference pj_authlat series equivalent)."""
    e = np.sqrt(es)
    one_es = 1.0 - es
    qp = qsfn(np.float64(1.0), e, one_es)
    return authalic_phi1(np.clip(sin_beta, -1.0, 1.0) * qp, e, one_es)


@register
class Aeqd(Operator):
    """Azimuthal Equidistant (reference src/projections/aeqd.cpp).

    Ellipsoidal oblique/equatorial delegates to the Karney geodesic kernel
    exactly like the reference (aeqd.cpp:107-119 calls geod_inverse); polar
    modes use the meridian-distance route; spherical modes use closed forms.
    """

    name = "aeqd"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.guam = "guam" in self.params
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        if self.ell.es != 0.0:
            self.geod = geodesic.GeodSolver(self.ell)
        if self.guam:
            from .core import enfn, mlfn
            self.en = enfn(self.ell.n)
            self.M1 = float(mlfn(np.float64(self.phi0), np.sin(self.phi0),
                                 np.cos(self.phi0), self.en))

    def _guam_fwd(self, lam, phi):
        """Guam elliptical variant (aeqd.cpp:69-83)."""
        from .core import mlfn
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        t = 1.0 / np.sqrt(1.0 - self.ell.es * sinphi * sinphi)
        x = lam * cosphi * t
        y = mlfn(phi, sinphi, cosphi, self.en) - self.M1 \
            + 0.5 * lam * lam * cosphi * sinphi * t
        return x, y

    def _guam_inv(self, x, y):
        """Guam elliptical inverse (aeqd.cpp:189-205)."""
        from .core import inv_mlfn
        x2 = 0.5 * x * x
        phi = np.full_like(x, self.phi0)
        t = np.zeros_like(x)
        for _ in range(3):
            t = self.ell.e * np.sin(phi)
            t = np.sqrt(1.0 - t * t)
            phi = inv_mlfn(self.M1 + y - x2 * np.tan(phi) * t, self.en)
        lam = x * t / np.cos(phi)
        return lam, phi

    def _fwd(self, lam, phi, z, t):
        if self.guam:
            x, y = self._guam_fwd(lam, phi)
            return x, y, z, t
        es = self.ell.es
        if es != 0.0:
            g = self.geod
            lat0 = np.full_like(phi, self.phi0)
            lon0 = np.zeros_like(lam)
            s12, azi1, _ = g.inverse(lon0, lat0, lam, phi)
            x = s12 * np.sin(azi1) / self.ell.a
            y = s12 * np.cos(azi1) / self.ell.a
            same = (np.abs(lam) < _EPS10) & (np.abs(phi - self.phi0) < _EPS10)
            return np.where(same, 0.0, x), np.where(same, 0.0, y), z, t
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam, sinlam = np.cos(lam), np.sin(lam)
        if self.mode in (EQUIT, OBLIQ):
            cosc = (cosphi * coslam if self.mode == EQUIT
                    else self.sinph0 * sinphi + self.cosph0 * cosphi * coslam)
            behind = cosc < -1.0 + 1e-14
            c = np.arccos(np.clip(cosc, -1.0, 1.0))
            sinc = np.sin(c)
            k = np.where(np.abs(sinc) < 1e-14, 1.0, c / np.where(sinc == 0, 1.0, sinc))
            x = k * cosphi * sinlam
            y = k * (sinphi if self.mode == EQUIT
                     else self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
            return np.where(behind, np.nan, x), np.where(behind, np.nan, y), z, t
        if self.mode == N_POLE:
            phi2_, coslam2 = -phi, -coslam
        else:
            phi2_, coslam2 = phi, coslam
        bad = np.abs(phi2_ - HALF_PI) < _EPS10
        yv = HALF_PI + phi2_
        x = np.where(bad, np.nan, yv * sinlam)
        y = np.where(bad, np.nan, yv * coslam2)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        if self.guam:
            lam, phi = self._guam_inv(x, y)
            return lam, phi, z, t
        es = self.ell.es
        if es != 0.0:
            g = self.geod
            s12 = np.hypot(x, y) * self.ell.a
            azi1 = np.arctan2(x, y)
            lat0 = np.full_like(x, self.phi0)
            lon0 = np.zeros_like(x)
            lam, phi, _ = g.direct(lon0, lat0, azi1, s12)
            zero = s12 == 0.0
            return (np.where(zero, 0.0, lam), np.where(zero, self.phi0, phi),
                    z, t)
        rh = np.hypot(x, y)
        c = rh
        bad = c - np.pi > _EPS10
        c = np.where(bad, np.nan, np.minimum(c, np.pi))
        sinc, cosc = np.sin(c), np.cos(c)
        safe = np.where(rh == 0, 1.0, rh)
        if self.mode in (EQUIT, OBLIQ):
            phi = np.where(
                rh == 0, self.phi0,
                aasin(cosc * self.sinph0 + y * sinc * self.cosph0 / safe))
            yy = (cosc - self.sinph0 * np.sin(phi)) * rh
            xx = x * sinc * self.cosph0
            lam = np.where(rh == 0, 0.0, np.arctan2(xx, yy))
        elif self.mode == N_POLE:
            phi = HALF_PI - c
            lam = np.arctan2(x, -y)
        else:
            phi = c - HALF_PI
            lam = np.arctan2(x, y)
        return lam, phi, z, t


@register
class Ortho(Operator):
    """Orthographic (reference src/projections/ortho.cpp; ellipsoidal per
    EPSG guidance note 7-2 §3.3.5)."""

    name = "ortho"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        es = self.ell.es
        if es != 0.0:
            self.nu0 = 1.0 / np.sqrt(1.0 - es * self.sinph0 ** 2)
            self.y_shift = (es * self.nu0 * self.sinph0 * self.cosph0)

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam, sinlam = np.cos(lam), np.sin(lam)
        cosc = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        behind = cosc < -_EPS10
        if es != 0.0:
            nu = 1.0 / np.sqrt(1.0 - es * sinphi * sinphi)
            x = nu * cosphi * sinlam
            y = (nu * (sinphi * self.cosph0 - cosphi * self.sinph0 * coslam)
                 + es * (self.nu0 * self.sinph0 - nu * sinphi) * self.cosph0)
        else:
            x = cosphi * sinlam
            if self.mode == EQUIT:
                y = sinphi
            elif self.mode == OBLIQ:
                y = self.cosph0 * sinphi - self.sinph0 * cosphi * coslam
            else:
                y = cosphi * (-coslam if self.mode == N_POLE else coslam)
        return np.where(behind, np.nan, x), np.where(behind, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        one_es = 1.0 - es
        if es == 0.0:
            lam, phi = self._sph_inv_guess(x, y)
            return lam, phi, z, t
        # reference ortho.cpp e_inverse: closed forms for polar/equatorial,
        # Newton (with pole reflection) for oblique, domain = recentered
        # unit ellipse
        if self.mode in (N_POLE, S_POLE):
            rh2 = x * x + y * y
            out = rh2 >= 1.0 - 1e-15
            bad = rh2 - 1.0 > _EPS10
            with np.errstate(invalid="ignore"):
                phi = np.arccos(np.sqrt(np.clip(rh2 * one_es / (1.0 - es * rh2), 0, 1)))
            phi = np.where(self.mode == N_POLE, phi, -phi)
            phi = np.where(out & ~bad, 0.0, phi)
            phi = np.where(bad, np.nan, phi)
            lam = np.arctan2(x, y * (-1.0 if self.mode == N_POLE else 1.0))
            return np.where(bad, np.nan, lam), phi, z, t
        if self.mode == EQUIT:
            b_over_a = np.sqrt(one_es)
            bad = x * x + (y / b_over_a) ** 2 > 1 + 1e-11
            with np.errstate(divide="ignore", invalid="ignore"):
                sinphi2 = np.where(y == 0, 0.0, 1.0 / ((one_es / np.where(y == 0, 1.0, y)) ** 2 + es))
            at_pole = sinphi2 > 1 - 1e-11
            phi = np.where(at_pole, np.where(y > 0, HALF_PI, -HALF_PI),
                           aasin(np.sqrt(np.clip(sinphi2, 0, 1))) * np.sign(y))
            with np.errstate(invalid="ignore", divide="ignore"):
                sinlam = x * np.sqrt((1.0 - es * sinphi2) / np.maximum(1.0 - sinphi2, 1e-300))
            lam = np.where(at_pole, 0.0,
                           np.where(np.abs(sinlam) - 1 > -1e-15,
                                    np.where(x > 0, HALF_PI, -HALF_PI),
                                    aasin(np.clip(sinlam, -1, 1))))
            phi = np.where(bad, np.nan, phi)
            lam = np.where(bad, np.nan, lam)
            return lam, phi, z, t
        # OBLIQ
        y_scale = 1.0 / np.sqrt(1.0 - es * self.cosph0 ** 2)
        y_shift = es * self.nu0 * self.sinph0 * self.cosph0
        yr = (y - y_shift) / y_scale
        bad = x * x + yr * yr > 1 + 1e-11
        lam, phi = self._sph_inv_guess(x, yr)
        dphi = dlam = np.full_like(x, np.inf)
        for _ in range(20):
            cosphi, sinphi = np.cos(phi), np.sin(phi)
            coslam, sinlam = np.cos(lam), np.sin(lam)
            ome = 1.0 - es * sinphi * sinphi
            nu = 1.0 / np.sqrt(ome)
            fx = nu * cosphi * sinlam
            fy = (nu * (sinphi * self.cosph0 - cosphi * self.sinph0 * coslam)
                  + es * (self.nu0 * self.sinph0 - nu * sinphi) * self.cosph0)
            rho_m = one_es * nu / ome
            J11 = -rho_m * sinphi * sinlam
            J12 = nu * cosphi * coslam
            J21 = rho_m * (cosphi * self.cosph0 + sinphi * self.sinph0 * coslam)
            J22 = nu * self.sinph0 * cosphi * sinlam
            D = J11 * J22 - J12 * J21
            D = np.where(np.abs(D) < 1e-300, np.nan, D)
            dx = x - fx
            dy = y - fy
            dphi = (J22 * dx - J12 * dy) / D
            dlam = (-J21 * dx + J11 * dy) / D
            phi = phi + dphi
            over = phi > HALF_PI
            under = phi < -HALF_PI
            phi = np.where(over, np.pi - phi, phi)
            phi = np.where(under, -np.pi - phi, phi)
            lam = np.where(over | under, lam + np.pi, lam) + dlam
        from .core import adjlon
        lam = adjlon(lam)
        # non-convergence after the fixed iteration budget = outside domain
        # (reference ortho.cpp:281-283)
        bad = bad | ~((np.abs(dphi) < 1e-11) & (np.abs(dlam) < 1e-11))
        phi = np.where(bad, np.nan, phi)
        lam = np.where(bad, np.nan, lam)
        return lam, phi, z, t

    def _sph_inv_guess(self, x, y):
        rh = np.hypot(x, y)
        sinc = np.where(rh > 1.0, np.where(rh - 1.0 > _EPS10, np.nan, 1.0), rh)
        cosc = np.sqrt(np.maximum(1.0 - sinc * sinc, 0.0))
        safe = np.where(np.abs(rh) <= _EPS10, 1.0, rh)
        phi = aasin(np.clip(cosc * self.sinph0 + y * sinc * self.cosph0 / safe, -1, 1))
        yy = (cosc - self.sinph0 * np.sin(phi)) * rh
        xx = x * sinc * self.cosph0
        lam = np.where(np.abs(rh) <= _EPS10, 0.0, np.arctan2(xx, yy))
        phi = np.where(np.abs(rh) <= _EPS10, self.phi0, phi)
        return lam, phi


@register
class Gnom(Operator):
    """Gnomonic (reference src/projections/gnom.cpp): spherical closed form;
    ellipsoidal = Karney's generalized gnomonic, rho = m12/M12 along the
    geodesic from the center (gnom.cpp:120-184)."""

    name = "gnom"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.mode = _mode(self.phi0)
        self.sinph0 = float(np.sin(self.phi0))
        self.cosph0 = float(np.cos(self.phi0))
        self.ellipsoidal = self.ell.es != 0.0
        if self.ellipsoidal:
            self.geod = geodesic.GeodSolver(self.ell)

    def _fwd(self, lam, phi, z, t):
        if self.ellipsoidal:
            g = self.geod
            lat0 = np.full_like(phi, self.phi0)
            lon0 = np.zeros_like(lam)
            _, azi1, _, m12, M12 = g.inverse(lon0, lat0, lam, phi,
                                             want_scale=True)
            bad = M12 <= 0
            with np.errstate(invalid="ignore", divide="ignore"):
                rho = m12 / (M12 * self.ell.a)
            x = np.where(bad, np.nan, rho * np.sin(azi1))
            y = np.where(bad, np.nan, rho * np.cos(azi1))
            return x, y, z, t
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        coslam, sinlam = np.cos(lam), np.sin(lam)
        cosc = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        bad = cosc <= _EPS10
        k = np.where(bad, np.nan, 1.0 / cosc)
        x = k * cosphi * sinlam
        y = k * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        if self.ellipsoidal:
            # solve rho(s) = rho by Newton along the fixed-azimuth geodesic
            # (reference gnom.cpp:141-184): drho/ds = 1/M^2 for rho<=1,
            # d(1/rho)/ds = -1/m^2 otherwise; all in unit-a lengths
            g = self.geod
            a = self.ell.a
            azi1 = np.arctan2(x, y)
            rho = np.hypot(x, y)
            little = rho <= 1.0
            with np.errstate(divide="ignore"):
                rho_it = np.where(little, rho, 1.0 / np.where(rho == 0, 1.0, rho))
            s = np.arctan(np.hypot(x, y))  # unit-a arc-length start
            lat0 = np.full_like(x, self.phi0)
            lon0 = np.zeros_like(x)
            lam = phi = np.full_like(x, np.nan)
            for _ in range(12):
                lam, phi, _, m, M = g.direct(lon0, lat0, azi1, s * a,
                                             want_scale=True)
                mu = m / a
                ds = np.where(little, (mu - rho_it * M) * M,
                              (rho_it * mu - M) * mu)
                s = s - ds
            lam, phi, _ = g.direct(lon0, lat0, azi1, s * a)
            return lam, phi, z, t
        rh = np.hypot(x, y)
        c = np.arctan(rh)
        sinc, cosc = np.sin(c), np.cos(c)
        safe = np.where(rh == 0, 1.0, rh)
        if self.mode == N_POLE:
            phi = HALF_PI - c
            lam = np.arctan2(x, -y)
        elif self.mode == S_POLE:
            phi = c - HALF_PI
            lam = np.arctan2(x, y)
        elif self.mode == EQUIT:
            phi = aasin(np.clip(y * sinc / safe, -1, 1))
            yy = cosc * rh
            xx = x * sinc
            lam = np.arctan2(xx, yy)
        else:
            phi = aasin(np.clip(cosc * self.sinph0 + y * sinc * self.cosph0 / safe, -1, 1))
            yy = (cosc - self.sinph0 * np.sin(phi)) * rh
            xx = x * sinc * self.cosph0
            lam = np.arctan2(xx, yy)
        phi = np.where(rh == 0, self.phi0, phi)
        lam = np.where(rh == 0, 0.0, lam)
        return lam, phi, z, t
