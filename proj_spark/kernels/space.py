"""Space Oblique Mercator family: som, misrsom, lsat.

Vectorized numpy reimplementation of src/projections/som.cpp (Snyder's
Space Oblique Mercator for orbital imaging swaths): Fourier coefficients by
Simpson integration (seraz0 :18-39), iterative forward with satellite-track
retry (:41-110), fixed-point inverse (:112-178), satellite presets for
MISR (:227-247) and LANDSAT 1-5 (:249-291).
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, parse_angle, U_RADIANS, U_CLASSIC
from .core import DEG_TO_RAD, FORT_PI, HALF_PI, aasin

_TOL = 1e-7
_PI_HALFPI = 4.71238898038468985769
_TWOPI = 2.0 * np.pi
_TWOPI_HALFPI = 7.85398163397448309616


@register
class Som(Operator):
    """Space Oblique Mercator (reference som.cpp); +inc_angle, +ps_rev,
    +asc_lon."""

    name = "som"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        self.lam0 = parse_angle(p.get("asc_lon", 0.0)) * DEG_TO_RAD
        if not -_TWOPI <= self.lam0 <= _TWOPI:
            raise ValueError("som +asc_lon must be in [-2pi, 2pi]")
        self.alf = parse_angle(p.get("inc_angle", 0.0)) * DEG_TO_RAD
        if not 0.0 <= self.alf <= np.pi:
            raise ValueError("som +inc_angle must be in [0, pi]")
        self.p22 = float(p.get("ps_rev", 0.0))
        if self.p22 < 0:
            raise ValueError("som +ps_rev must be >= 0")
        self.rlm = 0.0
        self._som_setup()

    def _som_setup(self):
        es, one_es = self.ell.es, self.ell.one_es
        rone_es = 1.0 / one_es
        self.sa = np.sin(self.alf)
        self.ca = np.cos(self.alf)
        if abs(self.ca) < 1e-9:
            self.ca = 1e-9
        esc = es * self.ca * self.ca
        ess = es * self.sa * self.sa
        self.w = ((1.0 - esc) * rone_es) ** 2 - 1.0
        self.q = ess * rone_es
        self.t = ess * (2.0 - es) * rone_es * rone_es
        self.u = esc * rone_es
        self.xj = one_es ** 3
        self.rlm2 = self.rlm + _TWOPI
        self.a2 = self.a4 = self.b = self.c1 = self.c3 = 0.0
        # Simpson-weights Fourier integration (som.cpp seraz0 calls)
        self._seraz0(0.0, 1.0)
        for lam in np.arange(9.0, 81.0001, 18.0):
            self._seraz0(lam, 4.0)
        for lam in np.arange(18.0, 72.0001, 18.0):
            self._seraz0(lam, 2.0)
        self._seraz0(90.0, 1.0)
        self.a2 /= 30.0
        self.a4 /= 60.0
        self.b /= 30.0
        self.c1 /= 15.0
        self.c3 /= 45.0

    def _seraz0(self, lam, mult):
        lam = lam * DEG_TO_RAD
        sd = np.sin(lam)
        sdsq = sd * sd
        s = self.p22 * self.sa * np.cos(lam) * np.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d1 = 1.0 + self.q * sdsq
        h = np.sqrt((1.0 + self.q * sdsq) / (1.0 + self.w * sdsq)) * (
            (1.0 + self.w * sdsq) / (d1 * d1) - self.p22 * self.ca)
        sq = np.sqrt(self.xj * self.xj + s * s)
        fc = mult * (h * self.xj - s * s) / sq
        self.b += fc
        self.a2 += fc * np.cos(lam + lam)
        self.a4 += fc * np.cos(lam * 4.0)
        fc = mult * s * (h + self.xj) / sq
        self.c1 += fc * np.cos(lam)
        self.c3 += fc * np.cos(lam * 3.0)

    def _track(self, lam, tanphi, lampp):
        """Inner fixed-point solve for the transformed longitude lamdp
        (som.cpp:52-71), vectorized with per-point freeze-on-convergence."""
        one_es = self.ell.one_es
        lamtp = lam + self.p22 * lampp
        cl = np.cos(lamtp)
        fac = np.where(cl < 0, lampp + np.sin(lampp) * HALF_PI,
                       lampp - np.sin(lampp) * HALF_PI)
        sav = lampp.copy()
        lamdp = lampp.copy()
        lamt = lam.copy()
        conv = np.zeros(lam.shape, dtype=bool)
        for _ in range(51):
            lamt_i = lam + self.p22 * sav
            c = np.cos(lamt_i)
            lamt_i = np.where(np.abs(c) < _TOL, lamt_i - _TOL, lamt_i)
            xlam = (one_es * tanphi * self.sa
                    + np.sin(lamt_i) * self.ca) / c
            lamdp_i = np.arctan(xlam) + fac
            lamt = np.where(conv, lamt, lamt_i)
            newly = np.abs(np.abs(sav) - np.abs(lamdp_i)) < _TOL
            lamdp = np.where(conv, lamdp, lamdp_i)
            conv |= newly
            if np.all(conv):
                break
            sav = np.where(conv, sav, lamdp_i)
        return lamdp, lamt

    def _fwd(self, lam, phi, z, t):
        es, one_es = self.ell.es, self.ell.one_es
        phi = np.clip(phi, -HALF_PI, HALF_PI)
        tanphi = np.tan(phi)
        lampp = np.where(phi >= 0.0, HALF_PI, _PI_HALFPI)
        lamdp, lamt = self._track(lam, tanphi, lampp)
        # satellite-track branch retry (som.cpp:72-77): only lsat has a
        # non-trivial rlm window
        for _ in range(2):
            bad = ~((lamdp > self.rlm) & (lamdp < self.rlm2))
            if not np.any(bad):
                break
            lampp = np.where(bad & (lamdp <= self.rlm), _TWOPI_HALFPI,
                             np.where(bad & (lamdp >= self.rlm2), HALF_PI,
                                      lampp))
            l2, t2 = self._track(lam, tanphi, lampp)
            lamdp = np.where(bad, l2, lamdp)
            lamt = np.where(bad, t2, lamt)
        sp = np.sin(phi)
        phidp = aasin((one_es * self.ca * sp
                       - self.sa * np.cos(phi) * np.sin(lamt))
                      / np.sqrt(1.0 - es * sp * sp))
        with np.errstate(divide="ignore", invalid="ignore"):
            tanph = np.log(np.tan(FORT_PI + 0.5 * phidp))
        sd = np.sin(lamdp)
        sdsq = sd * sd
        s = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d = np.sqrt(self.xj * self.xj + s * s)
        x = self.b * lamdp + self.a2 * np.sin(2.0 * lamdp) \
            + self.a4 * np.sin(lamdp * 4.0) - tanph * s / d
        y = self.c1 * sd + self.c3 * np.sin(lamdp * 3.0) \
            + tanph * self.xj / d
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es, one_es = self.ell.es, self.ell.one_es
        rone_es = 1.0 / one_es
        lamdp = x / self.b
        s = np.zeros_like(x)
        for _ in range(50):
            sav = lamdp
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
                (1.0 + self.t * sdsq)
                / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
            lamdp = (x + y * s / self.xj - self.a2 * np.sin(2.0 * lamdp)
                     - self.a4 * np.sin(lamdp * 4.0)
                     - s / self.xj * (self.c1 * np.sin(lamdp)
                                      + self.c3 * np.sin(lamdp * 3.0)))
            lamdp = lamdp / self.b
            if np.all(np.abs(lamdp - sav)[np.isfinite(lamdp)] < _TOL):
                break
        sl = np.sin(lamdp)
        fac = np.exp(np.sqrt(1.0 + s * s / self.xj / self.xj)
                     * (y - self.c1 * sl - self.c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - FORT_PI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < _TOL, lamdp - _TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        denom = 1.0 - sppsq * (1.0 + self.u)
        with np.errstate(divide="ignore", invalid="ignore"):
            lamt = np.arctan(
                ((1.0 - sppsq * rone_es) * np.tan(lamdp) * self.ca
                 - spp * self.sa * np.sqrt(np.clip(
                     (1.0 + self.q * dd) * (1.0 - sppsq) - sppsq * self.u,
                     0.0, None)) / np.cos(lamdp))
                / np.where(denom == 0.0, np.nan, denom))
        sl_sign = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - HALF_PI * (1.0 - scl) * sl_sign
        lam = lamt - self.p22 * lamdp
        if abs(self.sa) < _TOL:
            phi = aasin(spp / np.sqrt(one_es * one_es + es * sppsq))
        else:
            phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                             - self.ca * np.sin(lamt)) / (one_es * self.sa))
        return lam, phi, z, t


@register
class Misrsom(Som):
    """SOM preset for the MISR instrument (som.cpp:227-247); +path."""

    name = "misrsom"

    def setup(self):
        path = int(self.params.get("path", 0))
        if not 1 <= path <= 233:
            raise ValueError("misrsom +path must be in [1, 233]")
        self.lam0 = DEG_TO_RAD * 129.3056 - _TWOPI / 233.0 * path
        self.alf = 98.30382 * DEG_TO_RAD
        self.p22 = 98.88 / 1440.0
        self.rlm = 0.0
        self._som_setup()


@register
class Lsat(Som):
    """SOM preset for LANDSAT 1-5 (som.cpp:249-291); +lsat +path."""

    name = "lsat"

    def setup(self):
        land = int(self.params.get("lsat", 0))
        if not 1 <= land <= 5:
            raise ValueError("lsat +lsat must be in [1, 5]")
        path = int(self.params.get("path", 0))
        max_path = 251 if land <= 3 else 233
        if not 1 <= path <= max_path:
            raise ValueError(f"lsat +path must be in [1, {max_path}]")
        if land <= 3:
            self.lam0 = DEG_TO_RAD * 128.87 - _TWOPI / 251.0 * path
            self.p22 = 103.2669323
            self.alf = DEG_TO_RAD * 99.092
        else:
            self.lam0 = DEG_TO_RAD * 129.3 - _TWOPI / 233.0 * path
            self.p22 = 98.8841202
            self.alf = DEG_TO_RAD * 98.2
        self.p22 /= 1440.0
        self.rlm = np.pi * (1.0 / 248.0 + 0.5161290322580645)
        self._som_setup()
