"""Breadth batch 2: miscellaneous spherical world projections.

Vectorized numpy reimplementations of (src/projections/):
lagrng.cpp, wink1.cpp, wink2.cpp, aitoff.cpp (aitoff + wintri),
hatano.cpp, natearth2.cpp, nell.cpp, nell_h.cpp, nicol.cpp, boggs.cpp,
august.cpp. All sphere-only in the reference (P->es = 0).
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    parse_angle,
    generic_inverse_2d,
    U_RADIANS,
    U_CLASSIC,
)
from .core import DEG_TO_RAD, FORT_PI, HALF_PI, aasin

_TOL = 1e-10


@register
class Lagrng(Operator):
    """Lagrange (reference lagrng.cpp); +W divisor, +lat_1 center."""

    name = "lagrng"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.w = float(self.params.get("W", 2.0))
        if self.w <= 0:
            from ..errors import illegal_arg
            illegal_arg("lagrng: invalid value for W: should be > 0")
        self.hw = 0.5 * self.w
        self.rw = 1.0 / self.w
        self.hrw = 0.5 * self.rw
        sin_phi1 = np.sin(parse_angle(self.params.get("lat_1", 0.0)) * DEG_TO_RAD)
        if abs(abs(sin_phi1) - 1.0) < _TOL:
            from ..errors import illegal_arg
            illegal_arg("lagrng: |lat_1| should be < 90")
        self.a1 = (1.0 - sin_phi1) / (1.0 + sin_phi1) ** 1.0
        self.a1 = ((1.0 - sin_phi1) / (1.0 + sin_phi1)) ** self.hrw
        self.a2 = self.a1 * self.a1

    def _fwd(self, lam, phi, z, t):
        sp = np.sin(phi)
        pole = np.abs(np.abs(sp) - 1.0) < _TOL
        with np.errstate(divide="ignore", invalid="ignore"):
            v = self.a1 * ((1.0 + sp) / (1.0 - sp)) ** self.hrw
            lam2 = lam * self.rw
            c = 0.5 * (v + 1.0 / v) + np.cos(lam2)
            x = np.where(c < _TOL, np.nan, 2.0 * np.sin(lam2) / c)
            y = np.where(c < _TOL, np.nan, (v - 1.0 / v) / c)
        x = np.where(pole, 0.0, x)
        y = np.where(pole, np.where(phi < 0, -2.0, 2.0), y)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        pole = np.abs(np.abs(y) - 2.0) < _TOL
        x2 = x * x
        y2p = 2.0 + y
        y2m = 2.0 - y
        c = y2p * y2m - x2
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = 2.0 * np.arctan(((y2p * y2p + x2)
                                   / (self.a2 * (y2m * y2m + x2))) ** self.hw) \
                - HALF_PI
            lam = self.w * np.arctan2(4.0 * x, c)
        bad = (~pole) & (np.abs(c) < _TOL)
        phi = np.where(pole, np.where(y < 0, -HALF_PI, HALF_PI),
                       np.where(bad, np.nan, phi))
        lam = np.where(pole, 0.0, np.where(bad, np.nan, lam))
        return lam, phi, z, t


@register
class Wink1(Operator):
    """Winkel I (reference wink1.cpp); +lat_ts."""

    name = "wink1"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.cosphi1 = np.cos(parse_angle(self.params.get("lat_ts", 0.0))
                              * DEG_TO_RAD)

    def _fwd(self, lam, phi, z, t):
        return 0.5 * lam * (self.cosphi1 + np.cos(phi)), phi, z, t

    def _inv(self, x, y, z, t):
        return 2.0 * x / (self.cosphi1 + np.cos(y)), y, z, t


@register
class Wink2(Operator):
    """Winkel II (reference wink2.cpp); inverse via the generic 2D Newton
    (wink2.cpp:72-78 -> pj_generic_inverse_2d)."""

    name = "wink2"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.cosphi1 = np.cos(parse_angle(self.params.get("lat_1", 0.0))
                              * DEG_TO_RAD)

    def _fwd(self, lam, phi, z, t):
        y0 = phi * 2.0 / np.pi
        k = np.pi * np.sin(phi)
        th = phi * 1.8
        conv = np.zeros(th.shape, dtype=bool)
        for _ in range(10):
            V = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - V
            conv |= np.abs(V) < 1e-7
            if np.all(conv):
                break
        # non-converged (near-pole) points clamp to the full pole value
        # (wink2.cpp:42-46: the 0.5 factor is skipped on that branch)
        th = np.where(conv, th * 0.5, np.where(th < 0.0, -HALF_PI, HALF_PI))
        x = 0.5 * lam * (np.cos(th) + self.cosphi1)
        y = FORT_PI * (np.sin(th) + y0)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        lam, phi = generic_inverse_2d(self, x, y, x, y, tol=1e-10)
        return lam, phi, z, t


class _AitoffBase(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    winkel = False

    def _fwd(self, lam, phi, z, t):
        c = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1.0, 1.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            inv_sd = 1.0 / np.sin(d)
            x = 2.0 * d * np.cos(phi) * np.sin(c) * inv_sd
            y = d * np.sin(phi) * inv_sd
        x = np.where(d == 0.0, 0.0, x)
        y = np.where(d == 0.0, 0.0, y)
        if self.winkel:
            x = (x + lam * self.cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y, z, t

    def _inv(self, x, y, z, t):
        """2D Newton with re-seeding rounds (aitoff.cpp:96-198),
        vectorized with per-point convergence masks."""
        EPS = 1e-12
        phi = y.copy()
        lam = x.copy()
        origin = (np.abs(x) < EPS) & (np.abs(y) < EPS)
        bad = np.zeros(x.shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _round in range(20):
                for _it in range(11):
                    sl = np.sin(lam * 0.5)
                    cl = np.cos(lam * 0.5)
                    sp = np.sin(phi)
                    cp = np.cos(phi)
                    D = cp * cl
                    C = 1.0 - D * D
                    denom = C ** 1.5
                    bad |= denom == 0
                    D = np.arccos(np.clip(D, -1.0, 1.0)) / np.where(denom == 0, np.nan, denom)
                    f1 = 2.0 * D * C * cp * sl
                    f2 = D * C * sp
                    f1p = 2.0 * (sl * cl * sp * cp / C - D * sp * sl)
                    f1l = cp * cp * sl * sl / C + D * cp * cl * sp * sp
                    f2p = sp * sp * cl / C + D * sl * sl * cp
                    f2l = 0.5 * (sp * cp * sl / C - D * sp * cp * cp * sl * cl)
                    if self.winkel:
                        f1 = 0.5 * (f1 + lam * self.cosphi1)
                        f2 = 0.5 * (f2 + phi)
                        f1p = f1p * 0.5
                        f1l = 0.5 * (f1l + self.cosphi1)
                        f2p = 0.5 * (f2p + 1.0)
                        f2l = f2l * 0.5
                    f1 = f1 - x
                    f2 = f2 - y
                    dp_den = f1p * f2l - f2p * f1l
                    dl = (f2 * f1p - f1 * f2p) / dp_den
                    dp = (f1 * f2l - f2 * f1l) / dp_den
                    dl = np.mod(dl + np.pi, 2 * np.pi) - np.pi
                    upd = (np.abs(dp) > EPS) | (np.abs(dl) > EPS)
                    phi = np.where(upd, phi - dp, phi)
                    lam = np.where(upd, lam - dl, lam)
                # fold symmetric solutions (aitoff.cpp:160-170)
                phi = np.where(phi > HALF_PI, phi - 2.0 * (phi - HALF_PI), phi)
                phi = np.where(phi < -HALF_PI, phi - 2.0 * (phi + HALF_PI), phi)
                if not self.winkel:
                    lam = np.where(np.abs(np.abs(phi) - HALF_PI) < EPS, 0.0, lam)
                # residual check against the forward
                fx, fy, _, _ = self._fwd(lam, phi, z, t)
                off = (np.abs(x - fx) > EPS) | (np.abs(y - fy) > EPS)
                if not np.any(off & ~bad):
                    break
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, 0.0, phi)
        lam = np.where(bad, np.nan, lam)
        phi = np.where(bad, np.nan, phi)
        return lam, phi, z, t


@register
class Aitoff(_AitoffBase):
    """Aitoff (reference aitoff.cpp)."""

    name = "aitoff"


@register
class Wintri(_AitoffBase):
    """Winkel Tripel (reference aitoff.cpp:207-229); +lat_1, default
    acos(2/pi)."""

    name = "wintri"
    winkel = True

    def setup(self):
        if "lat_1" in self.params:
            self.cosphi1 = float(np.cos(parse_angle(self.params["lat_1"])
                                        * DEG_TO_RAD))
            if self.cosphi1 == 0.0:
                raise ValueError("wintri |lat_1| should be < 90 deg")
        else:
            self.cosphi1 = 0.636619772367581343


@register
class Hatano(Operator):
    """Hatano Asymmetrical Equal Area (reference hatano.cpp)."""

    name = "hatano"
    left = U_RADIANS
    right = U_CLASSIC
    CN, CS = 2.67595, 2.43763
    RCN, RCS = 0.37369906014686373063, 0.41023453108141924738
    FYCN, FYCS = 1.75859, 1.93052
    RYCN, RYCS = 0.56863737426006061674, 0.51799515156538134803
    FXC, RXC = 0.85, 1.17647058823529411764

    def _fwd(self, lam, phi, z, t):
        c = np.sin(phi) * np.where(phi < 0.0, self.CS, self.CN)
        th = phi.copy()
        for _ in range(20):
            th1 = (th + np.sin(th) - c) / (1.0 + np.cos(th))
            th = th - th1
            if np.all(np.abs(th1[np.isfinite(th1)]) < 1e-7):
                break
        th = th * 0.5
        x = self.FXC * lam * np.cos(th)
        y = np.sin(th) * np.where(th < 0.0, self.FYCS, self.FYCN)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        ONETOL = 1.000001
        th = y * np.where(y < 0.0, self.RYCS, self.RYCN)
        over = np.abs(th) > 1.0
        bad = np.abs(th) > ONETOL
        th = np.where(over, np.where(th > 0, HALF_PI, -HALF_PI),
                      np.arcsin(np.clip(th, -1.0, 1.0)))
        lam = self.RXC * x / np.cos(th)
        th = th + th
        phi = (th + np.sin(th)) * np.where(y < 0.0, self.RCS, self.RCN)
        over2 = np.abs(phi) > 1.0
        bad |= np.abs(phi) > ONETOL
        phi = np.where(over2, np.where(phi > 0, HALF_PI, -HALF_PI),
                       np.arcsin(np.clip(phi, -1.0, 1.0)))
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Natearth2(Operator):
    """Natural Earth II (reference natearth2.cpp)."""

    name = "natearth2"
    left = U_RADIANS
    right = U_CLASSIC
    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * np.pi

    def _x_den(self, p2):
        A = self.A
        p4 = p2 * p2
        p6 = p2 * p4
        return A[0] + A[1] * p2 + p6 * p6 * (A[2] + A[3] * p2 + A[4] * p4
                                             + A[5] * p6)

    def _fwd(self, lam, phi, z, t):
        B = self.B
        p2 = phi * phi
        p4 = p2 * p2
        x = lam * self._x_den(p2)
        y = phi * (B[0] + p4 * p4 * (B[1] + B[2] * p2 + B[3] * p4))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        B = self.B
        C = (B[0], 9 * B[1], 11 * B[2], 13 * B[3])
        y = np.clip(y, -self.MAX_Y, self.MAX_Y)
        yc = y.copy()
        for _ in range(100):
            y2 = yc * yc
            y4 = y2 * y2
            f = yc * (B[0] + y4 * y4 * (B[1] + B[2] * y2 + B[3] * y4)) - y
            fder = C[0] + y4 * y4 * (C[1] + C[2] * y2 + C[3] * y4)
            step = f / fder
            yc = yc - step
            if np.all(np.abs(step[np.isfinite(step)]) < 1e-11):
                break
        lam = x / self._x_den(yc * yc)
        return lam, yc, z, t


@register
class Nell(Operator):
    """Nell (reference nell.cpp)."""

    name = "nell"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        k = 2.0 * np.sin(phi)
        p2 = phi * phi
        th = phi * (1.00371 + p2 * (-0.0935382 + p2 * -0.011412))
        for _ in range(10):
            V = (th + np.sin(th) - k) / (1.0 + np.cos(th))
            th = th - V
            if np.all(np.abs(V[np.isfinite(V)]) < 1e-7):
                break
        x = 0.5 * lam * (1.0 + np.cos(th))
        return x, th, z, t

    def _inv(self, x, y, z, t):
        lam = 2.0 * x / (1.0 + np.cos(y))
        phi = aasin(0.5 * (y + np.sin(y)))
        return lam, phi, z, t


@register
class NellH(Operator):
    """Nell-Hammer (reference nell_h.cpp)."""

    name = "nell_h"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        x = 0.5 * lam * (1.0 + np.cos(phi))
        y = 2.0 * (phi - np.tan(0.5 * phi))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        p = 0.5 * y
        phi = np.zeros_like(y)
        done = np.zeros(y.shape, dtype=bool)
        for _ in range(9):
            c = np.cos(0.5 * phi)
            V = (phi - np.tan(phi / 2.0) - p) / (1.0 - 0.5 / (c * c))
            phi = np.where(done, phi, phi - V)
            done |= np.abs(V) < 1e-7
        pole = ~done
        phi = np.where(pole, np.where(p < 0.0, -HALF_PI, HALF_PI), phi)
        lam = np.where(pole, 2.0 * x, 2.0 * x / (1.0 + np.cos(phi)))
        return lam, phi, z, t


@register
class Nicol(Operator):
    """Nicolosi Globular (reference nicol.cpp); no inverse."""

    name = "nicol"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        EPS = 1e-10
        sp = np.sin(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            tb = HALF_PI / lam - lam / HALF_PI
            c = phi / HALF_PI
            d = (1.0 - c * c) / (sp - c)
            r2 = (tb / d) ** 2
            m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            xg = np.sqrt(m * m + np.cos(phi) ** 2 / (1.0 + r2))
            xg = HALF_PI * (m + np.where(lam < 0.0, -xg, xg))
            yg = np.sqrt(n * n - (sp * sp / r2 + d * sp - 1.0)
                         / (1.0 + 1.0 / r2))
            yg = HALF_PI * (n + np.where(phi < 0.0, yg, -yg))
        x = np.select(
            [np.abs(lam) < EPS, np.abs(phi) < EPS,
             np.abs(np.abs(lam) - HALF_PI) < EPS,
             np.abs(np.abs(phi) - HALF_PI) < EPS],
            [0.0, lam, lam * np.cos(phi), 0.0], default=xg)
        y = np.select(
            [np.abs(lam) < EPS, np.abs(phi) < EPS,
             np.abs(np.abs(lam) - HALF_PI) < EPS,
             np.abs(np.abs(phi) - HALF_PI) < EPS],
            [phi, 0.0, HALF_PI * np.sin(phi), phi], default=yg)
        return x, y, z, t


@register
class Boggs(Operator):
    """Boggs Eumorphic (reference boggs.cpp); no inverse."""

    name = "boggs"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        FXC, FXC2, FYC = 2.00276, 1.11072, 0.49931
        EPS = 1e-7
        theta = phi.copy()
        c = np.sin(theta) * np.pi
        for _ in range(20):
            th1 = (theta + np.sin(theta) - c) / (1.0 + np.cos(theta))
            theta = theta - th1
            if np.all(np.abs(th1[np.isfinite(th1)]) < EPS):
                break
        theta = theta * 0.5
        pole = np.abs(np.abs(phi) - HALF_PI) < EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            x = FXC * lam / (1.0 / np.cos(phi) + FXC2 / np.cos(theta))
        x = np.where(pole, 0.0, x)
        y = FYC * (phi + np.sqrt(2.0) * np.sin(theta))
        return x, y, z, t


@register
class August(Operator):
    """August Epicycloidal (reference august.cpp); no inverse."""

    name = "august"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def _fwd(self, lam, phi, z, t):
        M = 4.0 / 3.0
        tt = np.tan(0.5 * phi)
        c1 = np.sqrt(np.clip(1.0 - tt * tt, 0.0, None))
        hl = lam * 0.5
        c = 1.0 + c1 * np.cos(hl)
        x1 = np.sin(hl) * c1 / c
        y1 = tt / c
        x12 = x1 * x1
        y12 = y1 * y1
        x = M * x1 * (3.0 + x12 - 3.0 * y12)
        y = M * y1 * (3.0 + 3.0 * x12 - y12)
        return x, y, z, t
