"""Complex-polynomial modified projections.

Vectorized numpy reimplementations of:
- mod_ster.cpp: mil_os, lee_os, gs48, alsk, gs50 — oblique stereographic
  refined by a complex polynomial (US/Alaska national grids); fwd :20-49,
  complex-Newton inverse :51-103, per-variant coefficient tables :127-260.
- nzmg.cpp: New Zealand Map Grid — real psi series + 6th-order complex
  polynomial, fixed International ellipsoid/origin (:79-96).
- zpoly1.cpp: pj_zpoly1/pj_zpolyd1 complex Horner, expressed with numpy
  complex128 (f(z) = sum_k C[k] z^(k+1); derivative taken analytically).
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC
from .core import DEG_TO_RAD, HALF_PI, Ellipsoid, aasin

_EPSLN = 1e-12


def zpoly1(z, coefs):
    """f(z) = z * (C[0] + C[1] z + ... + C[n] z^n) (reference
    src/zpoly1.cpp:8-20)."""
    a = np.full_like(z, coefs[-1])
    for c in coefs[-2::-1]:
        a = c + z * a
    return z * a


def zpolyd1(z, coefs):
    """f(z) and f'(z); derivative of sum C[k] z^(k+1) is
    sum (k+1) C[k] z^k."""
    f = zpoly1(z, coefs)
    dcoefs = [(k + 1) * c for k, c in enumerate(coefs)]
    d = np.full_like(z, dcoefs[-1])
    for c in dcoefs[-2::-1]:
        d = c + z * d
    return f, d


class _ModSter(Operator):
    """Modified (oblated) stereographic base (reference mod_ster.cpp)."""

    left = U_RADIANS
    right = U_CLASSIC
    zcoeff: tuple = ()

    def setup(self):
        self._fix_params()
        e = self.ell.e
        if self.ell.es != 0.0:
            esphi = e * np.sin(self.phi0)
            chio = 2.0 * np.arctan(np.tan((HALF_PI + self.phi0) * 0.5)
                                   * ((1.0 - esphi) / (1.0 + esphi)) ** (e * 0.5)) \
                - HALF_PI
        else:
            chio = self.phi0
        self.schio = np.sin(chio)
        self.cchio = np.cos(chio)
        self.coefs = [complex(c) for c in self.zcoeff]

    def _fix_params(self):  # overridden per variant
        pass

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        sinlon = np.sin(lam)
        coslon = np.cos(lam)
        if self.ell.es != 0.0:
            esphi = e * np.sin(phi)
            chi = 2.0 * np.arctan(np.tan((HALF_PI + phi) * 0.5)
                                  * ((1.0 - esphi) / (1.0 + esphi)) ** (e * 0.5)) \
                - HALF_PI
        else:
            chi = phi
        schi = np.sin(chi)
        cchi = np.cos(chi)
        denom = 1.0 + self.schio * schi + self.cchio * cchi * coslon
        with np.errstate(divide="ignore", invalid="ignore"):
            s = 2.0 / np.where(denom == 0.0, np.nan, denom)
        p = (s * cchi * sinlon) + 1j * (s * (self.cchio * schi
                                             - self.schio * cchi * coslon))
        out = zpoly1(p, self.coefs)
        return out.real, out.imag, z, t

    def _inv(self, x, y, z, t):
        target = x + 1j * y
        p = target.copy().astype(np.complex128)
        conv = np.zeros(x.shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(20):
                f, fp = zpolyd1(p, self.coefs)
                dp = -(f - target) / fp
                p = np.where(conv, p, p + dp)
                conv |= (np.abs(dp.real) + np.abs(dp.imag)) <= _EPSLN
                if np.all(conv):
                    break
            rh = np.abs(p)
            zz = 2.0 * np.arctan(0.5 * rh)
            sinz = np.sin(zz)
            cosz = np.cos(zz)
            origin = np.abs(rh) <= _EPSLN
            chi = aasin(cosz * self.schio
                        + np.where(origin, 0.0, p.imag * sinz * self.cchio / rh))
            phi = chi.copy()
            if self.ell.es != 0.0:
                e = self.ell.e
                pconv = np.zeros(x.shape, dtype=bool)
                for _ in range(20):
                    esphi = e * np.sin(phi)
                    dphi = 2.0 * np.arctan(
                        np.tan((HALF_PI + chi) * 0.5)
                        * ((1.0 + esphi) / (1.0 - esphi)) ** (e * 0.5)) \
                        - HALF_PI - phi
                    phi = np.where(pconv, phi, phi + dphi)
                    pconv |= np.abs(dphi) <= _EPSLN
                    if np.all(pconv):
                        break
            lam = np.arctan2(p.real * sinz,
                             rh * self.cchio * cosz - p.imag * self.schio * sinz)
        phi = np.where(origin, self.phi0, np.where(conv, phi, np.nan))
        lam = np.where(origin, 0.0, np.where(conv, lam, np.nan))
        return lam, phi, z, t


@register
class MilOs(_ModSter):
    """Miller Oblated Stereographic (mod_ster.cpp:127-143)."""

    name = "mil_os"
    zcoeff = (0.924500, 0.0, 0.019430)

    def _fix_params(self):
        self.lam0 = 20.0 * DEG_TO_RAD
        self.phi0 = 18.0 * DEG_TO_RAD
        self.ell = Ellipsoid(self.ell.a, self.ell.a)  # forced sphere


@register
class LeeOs(_ModSter):
    """Lee Oblated Stereographic (mod_ster.cpp:145-161)."""

    name = "lee_os"
    zcoeff = (0.721316, 0.0, -0.0088162 - 0.00617325j)

    def _fix_params(self):
        self.lam0 = -165.0 * DEG_TO_RAD
        self.phi0 = -10.0 * DEG_TO_RAD
        self.ell = Ellipsoid(self.ell.a, self.ell.a)


@register
class Gs48(_ModSter):
    """Modified Stereographic of 48 U.S. (mod_ster.cpp:163-181)."""

    name = "gs48"
    zcoeff = (0.98879, 0.0, -0.050909, 0.0, 0.075528)

    def _fix_params(self):
        self.lam0 = -96.0 * DEG_TO_RAD
        self.phi0 = 39.0 * DEG_TO_RAD
        self.ell = Ellipsoid(6370997.0, 6370997.0)


class _FixedSphereOrClarke(_ModSter):
    """alsk/gs50 pick a fixed Clarke-1866-like ellipsoid or the authalic
    sphere depending on whether the user CRS is ellipsoidal
    (mod_ster.cpp:212-220,249-257)."""

    zcoeff_ell: tuple = ()
    zcoeff_sph: tuple = ()

    def _fix_params(self):
        if self.ell.es != 0.0:
            a = 6378206.4
            es = 0.00676866
            self.ell = Ellipsoid(a, a * np.sqrt(1.0 - es))
            self.zcoeff = self.zcoeff_ell
        else:
            self.ell = Ellipsoid(6370997.0, 6370997.0)
            self.zcoeff = self.zcoeff_sph


@register
class Alsk(_FixedSphereOrClarke):
    """Modified Stereographic of Alaska (mod_ster.cpp:183-222)."""

    name = "alsk"
    zcoeff_ell = (0.9945303, 0.0052083 - 0.0027404j, 0.0072721 + 0.0048181j,
                  -0.0151089 - 0.1932526j, 0.0642675 - 0.1381226j,
                  0.3582802 - 0.2884586j)
    zcoeff_sph = (0.9972523, 0.0052513 - 0.0041175j, 0.0074606 + 0.0048125j,
                  -0.0153783 - 0.1968253j, 0.0636871 - 0.1408027j,
                  0.3660976 - 0.2937382j)

    def _fix_params(self):
        self.lam0 = -152.0 * DEG_TO_RAD
        self.phi0 = 64.0 * DEG_TO_RAD
        super()._fix_params()


@register
class Gs50(_FixedSphereOrClarke):
    """Modified Stereographic of 50 U.S. (mod_ster.cpp:224-260)."""

    name = "gs50"
    zcoeff_ell = (0.9827497, 0.0210669 + 0.0053804j, -0.1031415 - 0.0571664j,
                  -0.0323337 - 0.0322847j, 0.0502303 + 0.1211983j,
                  0.0251805 + 0.0895678j, -0.0012315 - 0.1416121j,
                  0.0072202 - 0.1317091j, -0.0194029 + 0.0759677j,
                  -0.0210072 + 0.0834037j)
    zcoeff_sph = (0.9842990, 0.0211642 + 0.0037608j, -0.1036018 - 0.0575102j,
                  -0.0329095 - 0.0320119j, 0.0499471 + 0.1223335j,
                  0.0260460 + 0.0899805j, 0.0007388 - 0.1435792j,
                  0.0075848 - 0.1334108j, -0.0216473 + 0.0776645j,
                  -0.0225161 + 0.0853673j)

    def _fix_params(self):
        self.lam0 = -120.0 * DEG_TO_RAD
        self.phi0 = 45.0 * DEG_TO_RAD
        super()._fix_params()


@register
class Nzmg(Operator):
    """New Zealand Map Grid (reference nzmg.cpp): fixed International
    ellipsoid/origin, psi series + complex 6th-order polynomial."""

    name = "nzmg"
    left = U_RADIANS
    right = U_CLASSIC
    RAD_TO_SEC5 = 2.062648062470963551564733573
    SEC5_TO_RAD = 0.4848136811095359935899141023
    BF = (0.7557853228 + 0.0j, 0.249204646 + 0.003371507j,
          -0.001541739 + 0.041058560j, -0.10162907 + 0.01727609j,
          -0.26623489 - 0.36249218j, -0.6870983 - 1.1651967j)
    TPSI = (0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879,
            -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    TPHI = (1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594,
            0.007317, 0.01220, 0.00394, -0.0013)

    def setup(self):
        # forced parameters (nzmg.cpp:91-96)
        self.ell = Ellipsoid(6378388.0, 6378388.0 * (1.0 - 1.0 / 297.0))
        self.lam0 = 173.0 * DEG_TO_RAD
        self.phi0 = -41.0 * DEG_TO_RAD
        self.x0 = 2510000.0
        self.y0 = 6023150.0
        self.coefs = [complex(c) for c in self.BF]

    def _fwd(self, lam, phi, z, t):
        dphi = (phi - self.phi0) * self.RAD_TO_SEC5
        pr = np.full_like(dphi, self.TPSI[-1])
        for c in self.TPSI[-2::-1]:
            pr = c + dphi * pr
        pr = pr * dphi
        p = pr + 1j * lam
        out = zpoly1(p, self.coefs)
        return out.imag, out.real, z, t

    def _inv(self, x, y, z, t):
        target = y + 1j * x
        p = target.astype(np.complex128).copy()
        conv = np.zeros(x.shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(20):
                f, fp = zpolyd1(p, self.coefs)
                dp = -(f - target) / fp
                p = np.where(conv, p, p + dp)
                conv |= (np.abs(dp.real) + np.abs(dp.imag)) <= 1e-10
                if np.all(conv):
                    break
        lam = p.imag
        ph = np.full_like(x, self.TPHI[-1])
        for c in self.TPHI[-2::-1]:
            ph = c + p.real * ph
        phi = self.phi0 + p.real * ph * self.SEC5_TO_RAD
        lam = np.where(conv, lam, np.nan)
        phi = np.where(conv, phi, np.nan)
        return lam, phi, z, t
