"""Adams/Guyou/Peirce conformal square projections.

Vectorized numpy reimplementation of src/projections/adams.cpp: guyou,
peirce_q (+shape=square|diamond|nhemisphere|shemisphere|horizontal|vertical,
+scrollx/+scrolly), adams_hemi, adams_ws1, adams_ws2. The incomplete
elliptic integral of the first kind with k^2 = 1/2 uses the same even
Chebyshev series (adams.cpp ell_int_5 :44-66). Inverses exist where the
reference has them: adams_ws2 and peirce_q square/diamond via the generic
2D Newton with the reference's seed heuristics (:228-320).
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    generic_inverse_2d,
    U_RADIANS,
    U_CLASSIC,
)
from .core import FORT_PI, HALF_PI, aasin, aacos

_TOL = 1e-9
_RSQRT2 = 0.7071067811865475244008443620
_SHD = 1.8540746773013719 * 2  # 2*K(1/2) (adams.cpp:155)


def ell_int_5(phi):
    """Incomplete elliptic integral F(phi | m=1/2), even Chebyshev series
    (adams.cpp:44-66)."""
    C0 = 2.19174570831038
    C = (-8.58691003636495e-07, 2.02692115653689e-07, 3.12960480765314e-05,
         5.30394739921063e-05, -0.0012804644680613, -0.00575574836830288,
         0.0914203033408211)
    y = phi * (2.0 / np.pi)
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = np.zeros_like(phi)
    d2 = np.zeros_like(phi)
    for c in C:
        d1, d2 = y2 * d1 - d2 + c, d1
    return phi * (y * d1 - d2 + 0.5 * C0)


class _AdamsBase(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False
    mode = "guyou"

    def setup(self):
        self._setup_shape()

    def _setup_shape(self):
        pass

    def _ab(self, lam, phi):
        """Per-mode (a, b, sm, sn, bad) (adams.cpp:68-140)."""
        mode = self.mode
        if mode == "guyou":
            bad = (np.abs(lam) - _TOL) > HALF_PI
            sl = np.sin(lam)
            sp = np.sin(phi)
            cp = np.cos(phi)
            a = aacos((cp * sl - sp) * _RSQRT2)
            b = aacos((cp * sl + sp) * _RSQRT2)
            return a, b, lam < 0.0, phi < 0.0, bad
        if mode == "peirce_q":
            bad = np.zeros(lam.shape, dtype=bool)
            if self.pqshape == "nhemisphere":
                bad |= phi < -_TOL
            if self.pqshape == "shemisphere":
                bad |= phi > -_TOL
            sl = np.sin(lam)
            cl = np.cos(lam)
            cp = np.cos(phi)
            a = aacos(cp * (sl + cl) * _RSQRT2)
            b = aacos(cp * (sl - cl) * _RSQRT2)
            return a, b, sl < 0.0, cl > 0.0, bad
        if mode == "adams_hemi":
            sp = np.sin(phi)
            bad = (np.abs(lam) - _TOL) > HALF_PI
            a0 = np.cos(phi) * np.sin(lam)
            sm = (sp + a0) < 0.0
            sn = (sp - a0) < 0.0
            a = aacos(a0)
            b = HALF_PI - phi
            return a, b, sm, sn, bad
        if mode == "adams_ws1":
            sp = np.tan(0.5 * phi)
            b0 = np.cos(aasin(sp)) * np.sin(0.5 * lam)
            a = aacos((b0 - sp) * _RSQRT2)
            b = aacos((b0 + sp) * _RSQRT2)
            return a, b, lam < 0.0, phi < 0.0, np.zeros(lam.shape, dtype=bool)
        # adams_ws2
        spp = np.tan(0.5 * phi)
        a0 = np.cos(aasin(spp)) * np.sin(0.5 * lam)
        sm = (spp + a0) < 0.0
        sn = (spp - a0) < 0.0
        b = aacos(spp)
        a = aacos(a0)
        return a, b, sm, sn, np.zeros(lam.shape, dtype=bool)

    def _fwd(self, lam, phi, z, t):
        a, b, sm, sn, bad = self._ab(lam, phi)
        m = aasin(np.sqrt(1.0 + np.minimum(0.0, np.cos(a + b))))
        m = np.where(sm, -m, m)
        n = aasin(np.sqrt(np.abs(1.0 - np.maximum(0.0, np.cos(a - b)))))
        n = np.where(sn, -n, n)
        x = ell_int_5(m)
        y = ell_int_5(n)

        if self.mode == "peirce_q":
            shape = self.pqshape
            if shape in ("square", "diamond"):
                # fold the southern hemisphere out into the quincunx
                # triangles (adams.cpp:157-177)
                s = phi < 0.0
                seg_tl = s & (lam < -0.75 * np.pi)
                seg_l = s & (lam >= -0.75 * np.pi) & (lam < -0.25 * np.pi)
                seg_b = s & (lam >= -0.25 * np.pi) & (lam < 0.25 * np.pi)
                seg_r = s & (lam >= 0.25 * np.pi) & (lam < 0.75 * np.pi)
                seg_tr = s & (lam >= 0.75 * np.pi)
                y = np.where(seg_tl | seg_tr, _SHD - y, y)
                x = np.where(seg_l, -_SHD - x, x)
                y = np.where(seg_b, -_SHD - y, y)
                x = np.where(seg_r, _SHD - x, x)
            if shape == "square":
                x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)
            if shape == "horizontal":
                x = np.where(phi < 0.0, _SHD - x, x) - _SHD / 2
                if self.scrollx != 0.0:
                    xscale, xthresh = 2.0, _SHD / 2
                    x = x + self.scrollx * (xthresh * 2 * xscale)
                    x = np.where(x >= xthresh * xscale, x - _SHD * xscale, x)
                    x = np.where(x < -(xthresh * xscale), x + _SHD * xscale, x)
            if shape == "vertical":
                y = np.where(phi < 0.0, _SHD - y, y) - _SHD / 2
                if self.scrolly != 0.0:
                    yscale, ythresh = 2.0, _SHD / 2
                    y = y + self.scrolly * (ythresh * 2 * yscale)
                    y = np.where(y >= ythresh * yscale, y - _SHD * yscale, y)
                    y = np.where(y < -(ythresh * yscale), y + _SHD * yscale, y)

        if self.mode in ("adams_hemi", "adams_ws2"):
            x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)

        if self.mode == "guyou":
            # exact pole (adams.cpp:75-79)
            pole = np.abs(np.abs(phi) - HALF_PI) < _TOL
            x = np.where(pole, 0.0, x)
            y = np.where(pole, np.where(phi < 0, -1.85407, 1.85407), y)
        x = np.where(bad, np.nan, x)
        y = np.where(bad, np.nan, y)
        return x, y, z, t


@register
class Guyou(_AdamsBase):
    """Guyou doubly-periodic (reference adams.cpp)."""

    name = "guyou"
    mode = "guyou"


@register
class PeirceQ(_AdamsBase):
    """Peirce Quincuncial (reference adams.cpp); +shape=, +scrollx/y."""

    name = "peirce_q"
    mode = "peirce_q"

    def _setup_shape(self):
        shape = str(self.params.get("shape", "diamond"))
        if shape not in ("square", "diamond", "nhemisphere", "shemisphere",
                         "horizontal", "vertical"):
            raise ValueError("peirce_q: invalid value for 'shape'")
        self.pqshape = shape
        self.scrollx = float(self.params.get("scrollx", 0.0))
        self.scrolly = float(self.params.get("scrolly", 0.0))
        if not -1.0 <= self.scrollx <= 1.0 or not -1.0 <= self.scrolly <= 1.0:
            raise ValueError("peirce_q |scrollx|,|scrolly| must be <= 1")
        self.has_inverse = shape in ("square", "diamond")

    def _inv(self, x, y, z, t):
        if self.pqshape == "square":
            lam, phi = self._inv_square_seed(x, y)
        elif self.pqshape == "diamond":
            lam, phi = self._inv_diamond_seed(x, y)
        else:
            raise NotImplementedError
        lam, phi = generic_inverse_2d(self, x, y, lam, phi, tol=1e-10)
        return lam, phi, z, t

    def _inv_square_seed(self, x, y):
        """Seed heuristics (adams.cpp peirce_q_square_inverse)."""
        K = 2.622057580396
        lam = np.select(
            [(x == 0) & (y < 0), (x > 0) & (np.abs(y) < 1e-7),
             (x < 0) & (np.abs(y) < 1e-7), (np.abs(x) < 1e-7) & (y > 0),
             (x >= 0) & (y <= 0), (x >= 0) & (y >= 0),
             (x <= 0) & (y >= 0) & (np.abs(x) < np.abs(y)),
             (x <= 0) & (y >= 0)],
            [-FORT_PI, FORT_PI, -3 * FORT_PI, 3 * FORT_PI, 0.0, HALF_PI,
             np.pi * 0.9, -np.pi * 0.9], default=-HALF_PI)
        phi = np.select(
            [(x == 0) & (y < 0) & (np.abs(y) < K),
             (x < 0) & (np.abs(y) < 1e-7),
             (x == 0) & (y == 0)],
            [FORT_PI, HALF_PI / 2.622057574224 * x + HALF_PI, HALF_PI],
            default=0.0)
        return lam, phi

    def _inv_diamond_seed(self, x, y):
        """Seed heuristics (adams.cpp peirce_q_diamond_inverse)."""
        lam = np.select(
            [(x >= 0) & (y <= 0) & (x > 0) & (y == 0),
             (x >= 0) & (y <= 0) & (x == 0),
             (x >= 0) & (y <= 0),
             (x >= 0) & (y >= 0),
             (x <= 0) & (y >= 0)],
            [HALF_PI, 0.0, FORT_PI, 3 * FORT_PI, -3 * FORT_PI],
            default=-FORT_PI)
        phi = np.select(
            [(x == 0) & (y == 0), (x == 0) & (y < 0)],
            [HALF_PI, FORT_PI], default=0.0)
        far = (np.abs(x) > _SHD / 2 + 1e-3) | (np.abs(y) > _SHD / 2 + 1e-3)
        phi = np.where(far, -FORT_PI, phi)
        return lam, phi


@register
class AdamsHemi(_AdamsBase):
    """Adams Hemisphere in a Square (reference adams.cpp)."""

    name = "adams_hemi"
    mode = "adams_hemi"


@register
class AdamsWs1(_AdamsBase):
    """Adams World in a Square I (reference adams.cpp)."""

    name = "adams_ws1"
    mode = "adams_ws1"


@register
class AdamsWs2(_AdamsBase):
    """Adams World in a Square II (reference adams.cpp); Newton inverse
    with the documented seed (adams.cpp:228-244)."""

    name = "adams_ws2"
    mode = "adams_ws2"
    has_inverse = True

    def _inv(self, x, y, z, t):
        phi = np.clip(y / 2.62181347, -1.0, 1.0) * HALF_PI
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = np.where(
                np.abs(phi) >= HALF_PI, 0.0,
                np.clip(x / 2.62205760 / np.cos(phi), -1.0, 1.0) * np.pi)
        lam, phi = generic_inverse_2d(self, x, y, lam, phi, tol=1e-10)
        return lam, phi, z, t
