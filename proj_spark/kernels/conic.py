"""Conic projections: lcc (Lambert Conformal Conic) and aea/leac (Albers).

Vectorized numpy reimplementations of:
- lcc: reference src/projections/lcc.cpp:22-171
- aea/leac: reference src/projections/aea.cpp:97-255
"""

from __future__ import annotations

import numpy as np

from ..errors import illegal_arg
from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import (
    DEG_TO_RAD,
    FORT_PI,
    HALF_PI,
    authalic_phi1,
    msfn,
    phi2,
    qsfn,
    tsfn,
)

_EPS10 = 1e-10
_TOL7 = 1e-7


@register
class Lcc(Operator):
    """Lambert Conformal Conic, 1 or 2 standard parallels
    (reference src/projections/lcc.cpp)."""

    name = "lcc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        phi1 = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
        phi2_ = parse_angle(p["lat_2"]) * DEG_TO_RAD if "lat_2" in p else phi1
        if "lat_2" not in p and "lat_0" not in p:
            self.phi0 = phi1
        if abs(phi1 + phi2_) < _EPS10:
            illegal_arg("lcc: |lat_1 + lat_2| should be > 0")
        sinphi = np.sin(phi1)
        cosphi = np.cos(phi1)
        # reference lcc.cpp:107-115: BOTH parallels must be strictly
        # inside the poles
        if abs(cosphi) < _EPS10 or abs(phi1) >= HALF_PI:
            illegal_arg("lcc: |lat_1| should be < 90")
        if abs(np.cos(phi2_)) < _EPS10 or abs(phi2_) >= HALF_PI:
            illegal_arg("lcc: |lat_2| should be < 90")
        secant = abs(phi1 - phi2_) >= _EPS10
        n = sinphi
        ell = self.ell
        if not ell.is_sphere:
            m1 = float(msfn(sinphi, cosphi, ell.es))
            ml1 = float(tsfn(np.float64(phi1), np.float64(sinphi), ell.e))
            if secant:
                sinphi2 = np.sin(phi2_)
                n = float(np.log(m1 / msfn(sinphi2, np.cos(phi2_), ell.es)))
                ml2 = float(tsfn(np.float64(phi2_), np.float64(sinphi2), ell.e))
                denom = float(np.log(ml1 / ml2))
                if n == 0 or denom == 0:
                    illegal_arg("lcc: invalid value for eccentricity")
                n /= denom
            rho0 = m1 * ml1 ** (-n) / n
            self.c = rho0
            if abs(abs(self.phi0) - HALF_PI) < _EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 = rho0 * float(tsfn(np.float64(self.phi0), np.sin(self.phi0), ell.e)) ** n
        else:
            if secant:
                n = float(np.log(cosphi / np.cos(phi2_))
                          / np.log(np.tan(FORT_PI + 0.5 * phi2_) / np.tan(FORT_PI + 0.5 * phi1)))
            if n == 0:
                illegal_arg("lcc: |lat_1 + lat_2| should be > 0")
            self.c = float(cosphi * np.tan(FORT_PI + 0.5 * phi1) ** n / n)
            if abs(abs(self.phi0) - HALF_PI) < _EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 = self.c * np.tan(FORT_PI + 0.5 * self.phi0) ** (-n)
        self.n = float(n)

    def _fwd(self, lam, phi, z, t):
        ell = self.ell
        at_pole = np.abs(np.abs(phi) - HALF_PI) < _EPS10
        if not ell.is_sphere:
            rho = self.c * tsfn(phi, np.sin(phi), ell.e) ** self.n
        else:
            rho = self.c * np.tan(FORT_PI + 0.5 * phi) ** (-self.n)
        # pole on the cone's apex side -> rho 0; opposite pole -> poison
        bad_pole = at_pole & ((phi * self.n) <= 0)
        rho = np.where(at_pole, 0.0, rho)
        lamn = lam * self.n
        x = self.k0 * rho * np.sin(lamn)
        y = self.k0 * (self.rho0 - rho * np.cos(lamn))
        return np.where(bad_pole, np.nan, x), np.where(bad_pole, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        ell = self.ell
        x = x / self.k0
        y = self.rho0 - y / self.k0
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        nonzero = rho != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            if not ell.is_sphere:
                phi = phi2(np.abs(rho / self.c) ** (1.0 / self.n), ell.e)
            else:
                phi = 2.0 * np.arctan(np.abs(self.c / rho) ** (1.0 / self.n)) - HALF_PI
            lam = np.arctan2(x, y) / self.n
        phi = np.where(nonzero, phi, HALF_PI if self.n > 0 else -HALF_PI)
        lam = np.where(nonzero, lam, 0.0)
        return lam, phi, z, t


@register
class Aea(Operator):
    """Albers Equal Area conic (reference src/projections/aea.cpp).
    leac alias: lat_1 defaults to +/-90, lat_2 from +lat_1
    (reference aea.cpp PJ_PROJECTION(leac))."""

    name = "aea"
    aliases = ("leac",)
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        if self.invoked_name == "leac":
            phi2_ = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
            phi1 = -HALF_PI if "south" in p else HALF_PI
        else:
            phi1 = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
            phi2_ = parse_angle(p.get("lat_2", 0.0)) * DEG_TO_RAD
        if abs(phi1) > HALF_PI or abs(phi2_) > HALF_PI:
            illegal_arg("aea: |lat_1|/|lat_2| should be <= 90")
        if abs(phi1 + phi2_) < _EPS10:
            illegal_arg("aea: |lat_1 + lat_2| should be > 0")
        ell = self.ell
        sinphi = float(np.sin(phi1))
        cosphi = float(np.cos(phi1))
        secant = abs(phi1 - phi2_) >= _EPS10
        self.ellips = not ell.is_sphere
        n = sinphi
        if self.ellips:
            m1 = float(msfn(sinphi, cosphi, ell.es))
            ml1 = float(qsfn(np.float64(sinphi), ell.e, ell.one_es))
            if secant:
                sinphi2 = float(np.sin(phi2_))
                m2 = float(msfn(sinphi2, np.cos(phi2_), ell.es))
                ml2 = float(qsfn(np.float64(sinphi2), ell.e, ell.one_es))
                if ml2 == ml1:
                    illegal_arg("aea: eccentricity too close to 1")
                n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
                if n == 0:
                    illegal_arg("aea: invalid value for eccentricity")
            self.ec = 1.0 - 0.5 * ell.one_es * np.log((1.0 - ell.e) / (1.0 + ell.e)) / ell.e
            self.c = m1 * m1 + n * ml1
            self.dd = 1.0 / n
            self.rho0 = self.dd * np.sqrt(self.c - n * float(qsfn(np.sin(self.phi0), ell.e, ell.one_es)))
        else:
            if secant:
                n = 0.5 * (n + float(np.sin(phi2_)))
            self.n2 = n + n
            self.c = cosphi * cosphi + self.n2 * sinphi
            self.dd = 1.0 / n
            self.rho0 = self.dd * np.sqrt(self.c - self.n2 * np.sin(self.phi0))
        self.n = n

    def _fwd(self, lam, phi, z, t):
        ell = self.ell
        if self.ellips:
            rho2 = self.c - self.n * qsfn(np.sin(phi), ell.e, ell.one_es)
        else:
            rho2 = self.c - self.n2 * np.sin(phi)
        bad = rho2 < 0.0
        rho = self.dd * np.sqrt(np.where(bad, np.nan, rho2))
        lamn = lam * self.n
        x = rho * np.sin(lamn)
        y = self.rho0 - rho * np.cos(lamn)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        ell = self.ell
        y = self.rho0 - y
        rho = np.hypot(x, y)
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        nonzero = rho != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            r_dd = rho / self.dd
            if self.ellips:
                q = (self.c - r_dd * r_dd) / self.n
                at_edge = np.abs(self.ec - np.abs(q)) <= _TOL7
                too_far = (np.abs(q) > 2.0) & ~at_edge
                phi = authalic_phi1(q, ell.e, ell.one_es)
                phi = np.where(at_edge, np.where(q < 0, -HALF_PI, HALF_PI), phi)
                phi = np.where(too_far, np.nan, phi)
            else:
                s = (self.c - r_dd * r_dd) / self.n2
                phi = np.where(np.abs(s) <= 1.0, np.arcsin(np.clip(s, -1, 1)),
                               np.where(s < 0, -HALF_PI, HALF_PI))
            lam = np.arctan2(x, y) / self.n
        phi = np.where(nonzero, phi, HALF_PI if self.n > 0 else -HALF_PI)
        lam = np.where(nonzero, lam, 0.0)
        return lam, phi, z, t
