"""Breadth batch: small spherical cylindrical/pseudocylindrical operators.

Vectorized numpy reimplementations of (src/projections/):
cc.cpp, tcc.cpp, times.cpp, patterson.cpp, comill.cpp, collg.cpp,
crast.cpp, denoy.cpp, fahey.cpp, fouc_s.cpp, gins8.cpp, larr.cpp,
lask.cpp, loxim.cpp. All are sphere-only in the reference (P->es = 0).
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import DEG_TO_RAD, FORT_PI, HALF_PI, aasin

_EPS10 = 1e-10


@register
class Cc(Operator):
    """Central Cylindrical (reference cc.cpp)."""

    name = "cc"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        bad = np.abs(np.abs(phi) - HALF_PI) <= _EPS10
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, np.tan(phi)), z, t

    def _inv(self, x, y, z, t):
        return x, np.arctan(y), z, t


@register
class Tcc(Operator):
    """Transverse Central Cylindrical (reference tcc.cpp); no inverse."""

    name = "tcc"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        b = np.cos(phi) * np.sin(lam)
        bt = 1.0 - b * b
        bad = bt < _EPS10
        with np.errstate(invalid="ignore", divide="ignore"):
            x = b / np.sqrt(bt)
        y = np.arctan2(np.tan(phi), np.cos(lam))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t


@register
class Times(Operator):
    """Times projection (reference times.cpp)."""

    name = "times"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        T = np.tan(phi / 2.0)
        S = np.sin(FORT_PI * T)
        x = lam * (0.74482 - 0.34588 * S * S)
        y = 1.70711 * T
        return x, y, z, t

    def _inv(self, x, y, z, t):
        T = y / 1.70711
        S = np.sin(FORT_PI * T)
        lam = x / (0.74482 - 0.34588 * S * S)
        phi = 2.0 * np.arctan(T)
        return lam, phi, z, t


def _newton_poly_lat(y, coefs_f, coefs_d, max_y, max_iter=100, tol=1e-11):
    """Shared Newton-Raphson latitude solve for polynomial pseudocylindrics
    (patterson.cpp:71-101, comill.cpp:79-105): y = phi * f(phi^2)."""
    y = np.clip(y, -max_y, max_y)
    yc = y.copy()
    for _ in range(max_iter):
        y2 = yc * yc
        f = yc * np.polyval(coefs_f, y2) - y
        fder = np.polyval(coefs_d, y2)
        step = f / fder
        yc = yc - step
        if np.all(np.abs(step[np.isfinite(step)]) < tol if step.size else True):
            break
    return yc


@register
class Patterson(Operator):
    """Patterson cylindrical (reference patterson.cpp)."""

    name = "patterson"
    left = U_RADIANS
    right = U_CLASSIC
    K = (0.02406, -0.14499, 0.23185, 0.0, 1.0148)       # phi-polynomial in phi^2
    KD = (9 * 0.02406, 7 * -0.14499, 5 * 0.23185, 0.0, 1.0148)

    def _fwd(self, lam, phi, z, t):
        p2 = phi * phi
        return lam, phi * np.polyval(self.K, p2), z, t

    def _inv(self, x, y, z, t):
        return x, _newton_poly_lat(y, self.K, self.KD, 1.790857183), z, t


@register
class Comill(Operator):
    """Compact Miller (reference comill.cpp)."""

    name = "comill"
    left = U_RADIANS
    right = U_CLASSIC
    K = (-0.03054, 0.1604, 0.9902)
    KD = (5 * -0.03054, 3 * 0.1604, 0.9902)

    def _fwd(self, lam, phi, z, t):
        p2 = phi * phi
        return lam, phi * np.polyval(self.K, p2), z, t

    def _inv(self, x, y, z, t):
        return x, _newton_poly_lat(y, self.K, self.KD,
                                   0.6000207669862655 * np.pi), z, t


@register
class Collg(Operator):
    """Collignon (reference collg.cpp)."""

    name = "collg"
    left = U_RADIANS
    right = U_CLASSIC
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729

    def _fwd(self, lam, phi, z, t):
        ys = np.sqrt(np.clip(1.0 - np.sin(phi), 0.0, None))
        x = self.FXC * lam * ys
        y = self.FYC * (1.0 - ys)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        s = y / self.FYC - 1.0
        s = 1.0 - s * s
        inside = np.abs(s) < 1.0
        edge = (np.abs(s) >= 1.0) & (np.abs(s) <= 1.0000001)
        phi = np.where(inside, np.arcsin(np.clip(s, -1, 1)),
                       np.where(edge, np.where(s < 0, -HALF_PI, HALF_PI),
                                np.nan))
        lam_den = np.clip(1.0 - np.sin(phi), 0.0, None)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(lam_den <= 0.0, 0.0,
                           x / (self.FXC * np.sqrt(lam_den)))
        return lam, phi, z, t


@register
class Crast(Operator):
    """Craster Parabolic / Putnins P4 (reference crast.cpp)."""

    name = "crast"
    left = U_RADIANS
    right = U_CLASSIC
    XM = 0.97720502380583984317
    RXM = 1.02332670794648848847
    YM = 3.06998012383946546542
    RYM = 0.32573500793527994772

    def _fwd(self, lam, phi, z, t):
        p3 = phi / 3.0
        x = self.XM * lam * (2.0 * np.cos(p3 + p3) - 1.0)
        y = self.YM * np.sin(p3)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        phi = 3.0 * np.arcsin(np.clip(y * self.RYM, -1, 1))
        lam = x * self.RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
        return lam, phi, z, t


@register
class Denoy(Operator):
    """Denoyer Semi-Elliptical (reference denoy.cpp); no inverse."""

    name = "denoy"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        C0, C1, C3 = 0.95, -1.0 / 12.0, 1.0 / 600.0
        D1, D5 = 0.9, 0.03
        al = np.abs(lam)
        x = lam * np.cos((C0 + al * (C1 + al * al * C3))
                         * (phi * (D1 + D5 * phi ** 4)))
        return x, phi, z, t


@register
class Fahey(Operator):
    """Fahey (reference fahey.cpp)."""

    name = "fahey"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        tt = np.tan(0.5 * phi)
        y = 1.819152 * tt
        with np.errstate(invalid="ignore"):
            x = 0.819152 * lam * np.sqrt(np.clip(1.0 - tt * tt, 0.0, None))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        yy = y / 1.819152
        phi = 2.0 * np.arctan(yy)
        d = 1.0 - yy * yy
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(np.abs(d) < 1e-6, 0.0,
                           x / (0.819152 * np.sqrt(np.abs(d))))
        return lam, phi, z, t


@register
class FoucS(Operator):
    """Foucaut Sinusoidal (reference fouc_s.cpp); blend weight +n."""

    name = "fouc_s"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.n = float(self.params.get("n", 0.0))
        if not 0.0 <= self.n <= 1.0:
            raise ValueError("fouc_s +n must be in [0,1]")
        self.n1 = 1.0 - self.n

    def _fwd(self, lam, phi, z, t):
        c = np.cos(phi)
        x = lam * c / (self.n + self.n1 * c)
        y = self.n * phi + self.n1 * np.sin(phi)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        if self.n != 0.0:
            phi = y.copy()
            for _ in range(10):
                V = (self.n * phi + self.n1 * np.sin(phi) - y) / \
                    (self.n + self.n1 * np.cos(phi))
                phi = phi - V
                if np.all(np.abs(V[np.isfinite(V)]) < 1e-7):
                    break
        else:
            phi = aasin(y)
        c = np.cos(phi)
        lam = x * (self.n + self.n1 * c) / c
        return lam, phi, z, t


@register
class Gins8(Operator):
    """Ginsburg VIII (reference gins8.cpp); no inverse."""

    name = "gins8"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        Cl, Cp, C12 = 0.000952426, 0.162388, 1.0 / 12.0
        tt = phi * phi
        y = phi * (1.0 + tt * C12)
        x = lam * (1.0 - Cp * tt)
        l2 = lam * lam
        x = x * (0.87 - Cl * l2 * l2)
        return x, y, z, t


@register
class Larr(Operator):
    """Larrivee (reference larr.cpp); no inverse."""

    name = "larr"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        x = 0.5 * lam * (1.0 + np.sqrt(np.cos(phi)))
        y = phi / (np.cos(0.5 * phi) * np.cos(lam / 6.0))
        return x, y, z, t


@register
class Lask(Operator):
    """Laskowski (reference lask.cpp); no inverse."""

    name = "lask"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        a10, a12, a32, a14 = 0.975534, -0.119161, -0.0143059, -0.0547009
        b01, b21, b03 = 1.00384, 0.0802894, 0.0998909
        b41, b23, b05 = 0.000199025, -0.0285500, -0.0491032
        l2 = lam * lam
        p2 = phi * phi
        x = lam * (a10 + p2 * (a12 + l2 * a32 + p2 * a14))
        y = phi * (b01 + l2 * (b21 + p2 * b23 + l2 * b41)
                   + p2 * (b03 + p2 * b05))
        return x, y, z, t


@register
class Loxim(Operator):
    """Loximuthal (reference loxim.cpp)."""

    name = "loxim"
    left = U_RADIANS
    right = U_CLASSIC
    EPS = 1e-8

    def setup(self):
        self.phi1 = parse_angle(self.params.get("lat_1", 0.0)) * DEG_TO_RAD
        self.cosphi1 = np.cos(self.phi1)
        if self.cosphi1 < self.EPS:
            raise ValueError("loxim |lat_1| should be < 90 deg")
        self.tanphi1 = np.tan(FORT_PI + 0.5 * self.phi1)

    def _fwd(self, lam, phi, z, t):
        y = phi - self.phi1
        eq = np.abs(y) < self.EPS
        xa = FORT_PI + 0.5 * phi
        deg = (np.abs(xa) < self.EPS) | (np.abs(np.abs(xa) - HALF_PI) < self.EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_gen = lam * y / np.log(np.tan(xa) / self.tanphi1)
        x = np.where(eq, lam * self.cosphi1, np.where(deg, 0.0, x_gen))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        phi = y + self.phi1
        eq = np.abs(y) < self.EPS
        la = FORT_PI + 0.5 * phi
        deg = (np.abs(la) < self.EPS) | (np.abs(np.abs(la) - HALF_PI) < self.EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            l_gen = x * np.log(np.tan(la) / self.tanphi1) / y
        lam = np.where(eq, x / self.cosphi1, np.where(deg, 0.0, l_gen))
        return lam, phi, z, t
