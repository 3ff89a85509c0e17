"""Pseudocylindrical + misc cylindrical projections (breadth batch).

Vectorized numpy reimplementations of the reference's spherical and
ellipsoidal formulas:
- moll/wag4/wag5:          src/projections/moll.cpp (Newton for theta)
- sinu/gn_sinu/eck6/mbtfps src/projections/gn_sinu.cpp (mlfn ellipsoidal)
- eck1..eck5, putp1, wag6, kav7: src/projections/eck{1..5}.cpp
- eck4:                    src/projections/eck4.cpp
- robin:                   src/projections/robin.cpp (spline tables)
- natearth/natearth2:      src/projections/natearth.cpp
- eqearth:                 src/projections/eqearth.cpp (authalic ell.)
- hammer:                  src/projections/hammer.cpp
- mill/gall/cea/tcea:      src/projections/{mill,gall,cea,tcea}.cpp
- cass:                    src/projections/cass.cpp (ellipsoidal series)
- bonne:                   src/projections/bonne.cpp
- eqdc:                    src/projections/eqdc.cpp
- goode:                   src/projections/goode.cpp (sinu|moll composite)

All are double4 -> double4 numpy kernels with fixed-iteration Newton loops
where the reference iterates (convergence masks keep them branch-free).
"""

from __future__ import annotations

import numpy as np

from ..errors import illegal_arg
from ..ops import Operator, register, U_RADIANS, U_CLASSIC, parse_angle
from .core import (
    DEG_TO_RAD,
    FORT_PI,
    HALF_PI,
    aasin,
    authalic_phi1,
    enfn,
    inv_mlfn,
    mlfn,
    msfn,
    qsfn,
)

_EPS10 = 1e-10
TWO_PI = 2.0 * np.pi


class _MollBase(Operator):
    """Mollweide family (reference moll.cpp setup :58-72)."""

    left = U_RADIANS
    right = U_CLASSIC
    _p = HALF_PI

    def setup(self):
        p = self._p
        sp = np.sin(p)
        p2 = p + p
        r = np.sqrt(TWO_PI * sp / (p2 + np.sin(p2)))
        self.C_x = 2.0 * r / np.pi
        self.C_y = r / sp
        self.C_p = p2 + np.sin(p2)

    def _fwd(self, lam, phi, z, t):
        k = self.C_p * np.sin(phi)
        th = phi.copy()
        V = np.full_like(th, np.inf)
        with np.errstate(invalid="ignore", divide="ignore"):
            for _ in range(30):
                step = (th + np.sin(th) - k) / (1.0 + np.cos(th))
                # freeze converged/degenerate lanes (pole: denominator -> 0)
                step = np.where(np.isfinite(step), step, 0.0)
                th = th - step
                V = np.abs(step)
        # non-converged = at the pole (reference moll.cpp:33-37)
        pole = V >= 1e-7
        th = np.where(pole, np.where(th < 0, -HALF_PI, HALF_PI), th * 0.5)
        x = self.C_x * lam * np.cos(th)
        y = self.C_y * np.sin(th)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        th = aasin(y / self.C_y)
        with np.errstate(invalid="ignore", divide="ignore"):
            lam = x / (self.C_x * np.cos(th))
        th2 = th + th
        phi = aasin((th2 + np.sin(th2)) / self.C_p)
        bad = np.abs(lam) >= np.pi + _EPS10
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Moll(_MollBase):
    name = "moll"
    _p = HALF_PI


@register
class Wag4(_MollBase):
    name = "wag4"
    _p = np.pi / 3.0


@register
class Wag5(_MollBase):
    name = "wag5"

    def setup(self):
        self.C_x = 0.90977
        self.C_y = 1.65014
        self.C_p = 3.00896


class _GnSinuBase(Operator):
    """General sinusoidal series (reference gn_sinu.cpp)."""

    left = U_RADIANS
    right = U_CLASSIC
    _m = 0.0
    _n = 1.0
    ellipsoidal_ok = False

    def setup(self):
        self.m = self._m
        self.n_ = self._n
        self.use_ell = self.ellipsoidal_ok and self.ell.es != 0.0
        if self.use_ell:
            self.en = enfn(self.ell.n)
        else:
            self.C_y = np.sqrt((self.m + 1.0) / self.n_)
            self.C_x = self.C_y / (self.m + 1.0)

    def _fwd(self, lam, phi, z, t):
        if self.use_ell:
            s, c = np.sin(phi), np.cos(phi)
            y = mlfn(phi, s, c, self.en)
            x = lam * c / np.sqrt(1.0 - self.ell.es * s * s)
            return x, y, z, t
        if self.m == 0.0:
            ph = aasin(self.n_ * np.sin(phi)) if self.n_ != 1.0 else phi
        else:
            k = self.n_ * np.sin(phi)
            ph = phi.copy()
            for _ in range(10):
                V = (self.m * ph + np.sin(ph) - k) / (self.m + np.cos(ph))
                ph = ph - V
        x = self.C_x * lam * (self.m + np.cos(ph))
        y = self.C_y * ph
        return x, y, z, t

    def _inv(self, x, y, z, t):
        if self.use_ell:
            phi = inv_mlfn(y, self.en)
            s = np.sin(phi)
            with np.errstate(invalid="ignore", divide="ignore"):
                lam = x * np.sqrt(1.0 - self.ell.es * s * s) / np.cos(phi)
            pole = np.abs(np.abs(phi) - HALF_PI) < _EPS10
            lam = np.where(pole, 0.0, lam)
            bad = np.abs(phi) - _EPS10 > HALF_PI
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t
        yy = y / self.C_y
        if self.m != 0.0:
            phi = aasin((self.m * yy + np.sin(yy)) / self.n_)
        else:
            phi = aasin(np.sin(yy) / self.n_) if self.n_ != 1.0 else yy
        lam = x / (self.C_x * (self.m + np.cos(yy)))
        return lam, phi, z, t


@register
class Sinu(_GnSinuBase):
    name = "sinu"
    ellipsoidal_ok = True
    _m, _n = 0.0, 1.0


@register
class GnSinu(_GnSinuBase):
    name = "gn_sinu"

    def setup(self):
        self._m = float(self.params["m"])
        self._n = float(self.params["n"])
        super().setup()


@register
class Eck6(_GnSinuBase):
    name = "eck6"
    _m, _n = 1.0, 2.570796326794896619231321691


@register
class Mbtfps(_GnSinuBase):
    name = "mbtfps"
    _m, _n = 0.5, 1.785398163397448309615660845


@register
class Eck1(Operator):
    name = "eck1"
    left = U_RADIANS
    right = U_CLASSIC
    _FC = 0.92131773192356127802
    _RP = 0.31830988618379067154

    def _fwd(self, lam, phi, z, t):
        return (self._FC * lam * (1.0 - self._RP * np.abs(phi)),
                self._FC * phi, z, t)

    def _inv(self, x, y, z, t):
        phi = y / self._FC
        return x / (self._FC * (1.0 - self._RP * np.abs(phi))), phi, z, t


@register
class Eck2(Operator):
    name = "eck2"
    left = U_RADIANS
    right = U_CLASSIC
    _FXC = 0.46065886596178063902
    _FYC = 1.44720250911653531871

    def _fwd(self, lam, phi, z, t):
        w = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
        x = self._FXC * lam * w
        y = np.where(phi < 0, -1.0, 1.0) * self._FYC * (2.0 - w)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        w = 2.0 - np.abs(y) / self._FYC
        lam = x / (self._FXC * w)
        s = (4.0 - w * w) / 3.0
        bad = np.abs(s) > 1.0000001
        phi = aasin(np.clip(s, -1, 1))
        phi = np.where(y < 0, -phi, phi)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


class _Eck3Base(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    _C_x = _C_y = _A = _B = 0.0

    def _fwd(self, lam, phi, z, t):
        y = self._C_y * phi
        x = self._C_x * lam * (self._A + np.sqrt(np.maximum(1.0 - self._B * phi * phi, 0.0)))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        phi = y / self._C_y
        den = self._C_x * (self._A + np.sqrt(np.maximum(1.0 - self._B * phi * phi, 0.0)))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(den == 0, np.nan, x / den)
        return lam, phi, z, t


@register
class Eck3(_Eck3Base):
    name = "eck3"
    _C_x, _C_y = 0.42223820031577120149, 0.84447640063154240298
    _A, _B = 1.0, 0.4052847345693510857755


@register
class Kav7(_Eck3Base):
    name = "kav7"
    _C_x, _C_y = 0.8660254037844, 1.0
    _A, _B = 0.0, 0.30396355092701331433


@register
class Wag6(_Eck3Base):
    name = "wag6"
    _C_x = _C_y = 0.94745
    _A, _B = 0.0, 0.30396355092701331433


@register
class Putp1(_Eck3Base):
    name = "putp1"
    _C_x, _C_y = 1.89490, 0.94745
    _A, _B = -0.5, 0.30396355092701331433


@register
class Eck4(Operator):
    name = "eck4"
    left = U_RADIANS
    right = U_CLASSIC
    _C_x = 0.42223820031577120149
    _C_y = 1.32650042817700232218
    _C_p = 3.57079632679489661922

    def _fwd(self, lam, phi, z, t):
        p = self._C_p * np.sin(phi)
        V = phi * phi
        th = phi * (0.895168 + V * (0.0218849 + V * 0.00826809))
        Vlast = np.full_like(th, np.inf)
        with np.errstate(invalid="ignore", divide="ignore"):
            for _ in range(8):
                c, s = np.cos(th), np.sin(th)
                step = (th + s * (c + 2.0) - p) / (1.0 + c * (c + 2.0) - s * s)
                step = np.where(np.isfinite(step), step, 0.0)
                th = th - step
                Vlast = np.abs(step)
        # non-converged = pole shortcut (reference eck4.cpp:56-59)
        pole = Vlast >= 1e-7
        x = np.where(pole, self._C_x * lam,
                     self._C_x * lam * (1.0 + np.cos(th)))
        y = np.where(pole, np.where(th < 0, -self._C_y, self._C_y),
                     self._C_y * np.sin(th))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        s_th = y / self._C_y
        at_pole = (1.0 - np.abs(s_th) >= 0.0) & (1.0 - np.abs(s_th) <= 1e-12)
        th = aasin(s_th)  # beyond-domain |s|>1+1e-10 poisons (aasincos.cpp)
        c_th = np.cos(th)
        lam = np.where(at_pole, x / self._C_x, x / (self._C_x * (1.0 + c_th)))
        s_phi = (th + s_th * (c_th + 2.0)) / self._C_p
        phi = np.where(at_pole, np.where(s_th > 0, HALF_PI, -HALF_PI),
                       aasin(np.clip(s_phi, -1, 1)))
        bad = np.abs(lam) - np.pi > 1e-10
        return np.where(bad, np.nan, np.clip(lam, -np.pi, np.pi)), \
            np.where(bad, np.nan, phi), z, t


@register
class Eck5(Operator):
    name = "eck5"
    left = U_RADIANS
    right = U_CLASSIC
    _XF, _YF = 0.44101277172455148219, 0.88202554344910296438

    def _fwd(self, lam, phi, z, t):
        return self._XF * (1.0 + np.cos(phi)) * lam, self._YF * phi, z, t

    def _inv(self, x, y, z, t):
        phi = y / self._YF
        return x / (self._XF * (1.0 + np.cos(phi))), phi, z, t


# Robinson spline tables (reference robin.cpp:30-70; public Robinson 1974
# node values with the osgeo polynomial fit)
_ROBIN_X = np.array([
    [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06]], dtype=np.float32).astype(np.float64)
_ROBIN_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1.0, 0.00328947, -0.000319159, -4.2106e-06]], dtype=np.float32).astype(np.float64)


def _robin_V(tab, i, z):
    c0, c1, c2, c3 = tab[i, 0], tab[i, 1], tab[i, 2], tab[i, 3]
    return c0 + z * (c1 + z * (c2 + z * c3))


def _robin_DV(tab, i, z):
    c1, c2, c3 = tab[i, 1], tab[i, 2], tab[i, 3]
    return c1 + 2 * z * c2 + z * z * 3.0 * c3


@register
class Robin(Operator):
    """Robinson (reference robin.cpp)."""

    name = "robin"
    left = U_RADIANS
    right = U_CLASSIC
    _FXC, _FYC = 0.8487, 1.3523
    _C1 = 11.45915590261646417544
    _RC1 = 0.08726646259971647884
    _NODES = 18

    def _fwd(self, lam, phi, z, t):
        dphi = np.abs(phi)
        i = np.minimum(np.floor(dphi * self._C1 + 1e-15).astype(np.int64),
                       self._NODES)
        i = np.maximum(i, 0)
        dphi = (180.0 / np.pi) * (dphi - self._RC1 * i)
        x = _robin_V(_ROBIN_X, i, dphi) * self._FXC * lam
        y = np.sign(phi) * _robin_V(_ROBIN_Y, i, dphi) * self._FYC
        nanm = np.isnan(phi)
        return np.where(nanm, np.nan, x), np.where(nanm, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        lam = x / self._FXC
        yy = np.abs(y / self._FYC)
        # pathological top
        top = yy >= 1.0
        badtop = yy > 1.000001
        # locate node interval in Y space
        i = np.clip(np.floor(yy * self._NODES).astype(np.int64), 0, self._NODES - 1)
        for _ in range(3):  # node adjustment (reference walks +-1)
            go_down = _ROBIN_Y[i, 0] > yy
            go_up = (_ROBIN_Y[np.minimum(i + 1, self._NODES), 0] <= yy) & ~go_down
            i = np.clip(i + go_up.astype(np.int64) - go_down.astype(np.int64),
                        0, self._NODES - 1)
        t_ = 5.0 * (yy - _ROBIN_Y[i, 0]) / (_ROBIN_Y[np.minimum(i + 1, self._NODES), 0] - _ROBIN_Y[i, 0])
        for _ in range(30):
            t_ = t_ - (_robin_V(_ROBIN_Y, i, t_) - yy) / _robin_DV(_ROBIN_Y, i, t_)
        phi = (5.0 * i + t_) * DEG_TO_RAD
        phi = np.where(top, HALF_PI, phi)
        phi = np.where(y < 0, -phi, phi)
        lam = np.where(top, lam / _ROBIN_X[self._NODES, 0],
                       lam / _robin_V(_ROBIN_X, i, t_))
        bad = badtop | (np.abs(lam) > np.pi + 1e-9)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


class _NatearthBase(Operator):
    left = U_RADIANS
    right = U_CLASSIC
    # A: x-poly even coefficients; B: y-poly; set per class
    _A = ()
    _B = ()
    _MAX_Y = 0.0

    def _x_factor(self, p2):
        raise NotImplementedError

    def _y_of(self, phi):
        raise NotImplementedError

    def _dy_of(self, phi):
        raise NotImplementedError

    def _fwd(self, lam, phi, z, t):
        p2 = phi * phi
        return lam * self._x_factor(p2), self._y_of(phi), z, t

    def _inv(self, x, y, z, t):
        yc = np.clip(y, -self._MAX_Y, self._MAX_Y)
        target = yc.copy()
        for _ in range(25):
            yc = yc - (self._y_of(yc) - target) / self._dy_of(yc)
        phi = yc
        lam = x / self._x_factor(yc * yc)
        return lam, phi, z, t


@register
class Natearth(_NatearthBase):
    """Natural Earth (reference natearth.cpp)."""

    name = "natearth"
    _MAX_Y = 0.8707 * 0.52 * np.pi

    def _x_factor(self, p2):
        A0, A1, A2, A3, A4 = 0.8707, -0.131979, -0.013791, 0.003971, -0.001529
        return A0 + p2 * (A1 + p2 * (A2 + p2 * p2 * p2 * (A3 + p2 * A4)))

    def _y_of(self, phi):
        B0, B1, B2, B3, B4 = 1.007226, 0.015085, -0.044475, 0.028874, -0.005916
        p2 = phi * phi
        p4 = p2 * p2
        return phi * (B0 + p2 * (B1 + p4 * (B2 + B3 * p2 + B4 * p4)))

    def _dy_of(self, phi):
        B0, B1, B2, B3, B4 = 1.007226, 0.015085, -0.044475, 0.028874, -0.005916
        C0, C1, C2, C3, C4 = B0, 3 * B1, 7 * B2, 9 * B3, 11 * B4
        p2 = phi * phi
        p4 = p2 * p2
        return C0 + p2 * (C1 + p4 * (C2 + C3 * p2 + C4 * p4))


@register
class Eqearth(Operator):
    """Equal Earth (reference eqearth.cpp; Savric/Patterson/Jenny 2018)."""

    name = "eqearth"
    left = U_RADIANS
    right = U_CLASSIC
    _A1, _A2, _A3, _A4 = 1.340264, -0.081106, 0.000893, 0.003796
    _M = np.sqrt(3.0) / 2.0
    _MAX_Y = 1.3173627591574

    def setup(self):
        es = self.ell.es
        self.rqda = 1.0
        if es != 0.0:
            self.qp = float(qsfn(np.float64(1.0), self.ell.e, self.ell.one_es))
            self.rqda = np.sqrt(0.5 * self.qp)

    def _psi_y(self, psi):
        A1, A2, A3, A4 = self._A1, self._A2, self._A3, self._A4
        p2 = psi * psi
        p6 = p2 * p2 * p2
        return psi * (A1 + A2 * p2 + p6 * (A3 + A4 * p2))

    def _psi_dy(self, psi):
        A1, A2, A3, A4 = self._A1, self._A2, self._A3, self._A4
        p2 = psi * psi
        p6 = p2 * p2 * p2
        return A1 + 3 * A2 * p2 + p6 * (7 * A3 + 9 * A4 * p2)

    def _fwd(self, lam, phi, z, t):
        sbeta = np.sin(phi)
        if self.ell.es != 0.0:
            sbeta = np.clip(qsfn(sbeta, self.ell.e, self.ell.one_es) / self.qp, -1, 1)
        psi = aasin(self._M * sbeta)
        x = lam * np.cos(psi) / (self._M * self._psi_dy(psi))
        y = self._psi_y(psi)
        return x * self.rqda, y * self.rqda, z, t

    def _inv(self, x, y, z, t):
        xx = x / self.rqda
        yr = y / self.rqda
        at_pole = np.abs(yr) >= self._MAX_Y - 1e-12
        yc = np.clip(yr, -self._MAX_Y, self._MAX_Y)
        target = yc.copy()
        for _ in range(15):
            yc = yc - (self._psi_y(yc) - target) / self._psi_dy(yc)
        lam = self._M * xx * self._psi_dy(yc) / np.cos(yc)
        # the asin(sin(psi)/M) form amplifies the last-ulp Newton residual
        # near |psi| = pi/3 into ~1e-7 rad; inputs clamped at the projection
        # edge are exactly the poles, so snap them
        phi = np.where(at_pole, np.copysign(HALF_PI, yr),
                       aasin(np.clip(np.sin(yc) / self._M, -1, 1)))
        if self.ell.es != 0.0:
            from .azimuthal import authalic_phi1_from_beta
            phi = authalic_phi1_from_beta(np.sin(phi), self.ell.es)
        return lam, phi, z, t


@register
class Hammer(Operator):
    """Hammer & Eckert-Greifendorff (reference hammer.cpp)."""

    name = "hammer"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.w = abs(float(self.params.get("W", 0.5))) or 0.5
        m = abs(float(self.params.get("M", 1.0))) or 1.0
        self.rm = 1.0 / m
        self.m = m / self.w

    def _fwd(self, lam, phi, z, t):
        cosphi = np.cos(phi)
        lw = lam * self.w
        denom = 1.0 + cosphi * np.cos(lw)
        d = np.where(denom == 0, np.nan, np.sqrt(2.0 / np.where(denom == 0, 1.0, denom)))
        x = self.m * d * cosphi * np.sin(lw)
        y = self.rm * d * np.sin(phi)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        zz = np.sqrt(np.maximum(
            1.0 - 0.25 * self.w * self.w * x * x - 0.25 * y * y, 0.0))
        bad = np.abs(2.0 * zz * zz - 1.0) < 1e-10
        with np.errstate(invalid="ignore"):
            lam = np.arctan2(self.w * x * zz, 2.0 * zz * zz - 1.0) / self.w
            phi = aasin(np.clip(zz * y, -1, 1))
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Mill(Operator):
    name = "mill"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        return lam, np.log(np.tan(FORT_PI + phi * 0.4)) * 1.25, z, t

    def _inv(self, x, y, z, t):
        return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - FORT_PI), z, t


@register
class Gall(Operator):
    name = "gall"
    left = U_RADIANS
    right = U_CLASSIC
    _XF, _YF = 0.70710678118654752440, 1.70710678118654752440

    def _fwd(self, lam, phi, z, t):
        return self._XF * lam, self._YF * np.tan(0.5 * phi), z, t

    def _inv(self, x, y, z, t):
        return x / self._XF, 2.0 * np.arctan(y / self._YF), z, t


@register
class Cea(Operator):
    """Equal Area Cylindrical (reference cea.cpp, Sph&Ell)."""

    name = "cea"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        ts = parse_angle(p.get("lat_ts", 0.0)) * DEG_TO_RAD
        self.k0 = np.cos(ts)
        es = self.ell.es
        if es != 0.0:
            st = np.sin(ts)
            self.k0 /= np.sqrt(1.0 - es * st * st)
            self.qp = float(qsfn(np.float64(1.0), self.ell.e, self.ell.one_es))

    def _fwd(self, lam, phi, z, t):
        if self.ell.es != 0.0:
            return (self.k0 * lam,
                    0.5 * qsfn(np.sin(phi), self.ell.e, self.ell.one_es) / self.k0,
                    z, t)
        return self.k0 * lam, np.sin(phi) / self.k0, z, t

    def _inv(self, x, y, z, t):
        if self.ell.es != 0.0:
            phi = authalic_phi1(
                np.clip(2.0 * y * self.k0 / self.qp, -1, 1) * self.qp,
                self.ell.e, self.ell.one_es)
            return x / self.k0, phi, z, t
        yy = y * self.k0
        bad = np.abs(yy) - 1e-10 > 1.0
        phi = aasin(np.clip(yy, -1, 1))
        return np.where(bad, np.nan, x / self.k0), np.where(bad, np.nan, phi), z, t


@register
class Tcea(Operator):
    name = "tcea"
    left = U_RADIANS
    right = U_CLASSIC

    def _fwd(self, lam, phi, z, t):
        x = np.cos(phi) * np.sin(lam) / self.k0
        y = self.k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        yy = y / self.k0 + self.phi0
        xx = x * self.k0
        tt = np.sqrt(np.maximum(1.0 - xx * xx, 0.0))
        phi = aasin(np.clip(tt * np.sin(yy), -1, 1))
        lam = np.arctan2(xx, tt * np.cos(yy))
        return lam, phi, z, t


@register
class Cass(Operator):
    """Cassini (reference cass.cpp, Sph&Ell incl. +hyperbolic)."""

    name = "cass"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        if self.ell.es != 0.0:
            self.en = enfn(self.ell.n)
            self.m0 = float(mlfn(np.float64(self.phi0), np.sin(self.phi0),
                                 np.cos(self.phi0), self.en))
            self.hyperbolic = "hyperbolic" in self.params

    _C1, _C2, _C3 = 1.0 / 6, 1.0 / 120, 1.0 / 24
    _C4, _C5 = 1.0 / 3, 1.0 / 15

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        if es == 0.0:
            x = aasin(np.cos(phi) * np.sin(lam))
            y = np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0
            return x, y, z, t
        s, c = np.sin(phi), np.cos(phi)
        M = mlfn(phi, s, c, self.en)
        nu2 = 1.0 / (1.0 - es * s * s)
        nu = np.sqrt(nu2)
        tanphi = np.tan(phi)
        T = tanphi * tanphi
        A = lam * c
        C = es * (c * c) / (1.0 - es)
        A2 = A * A
        x = nu * A * (1.0 - A2 * T * (1.0 / 6 + (8.0 - T + 8.0 * C) * A2 / 120.0))
        y = M - self.m0 + nu * tanphi * A2 * (0.5 + (5.0 - T + 6.0 * C) * A2 / 24.0)
        if self.hyperbolic:
            rho = nu2 * (1.0 - es) * nu
            y = y - y * y * y / (6.0 * rho * nu)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        if es == 0.0:
            dd = y + self.phi0
            phi = aasin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
            lam = np.arctan2(np.tan(x), np.cos(dd))
            return lam, phi, z, t
        phi1 = inv_mlfn(self.m0 + y, self.en)
        s1 = np.sin(phi1)
        tn = np.tan(phi1)
        T = tn * tn
        nu2 = 1.0 / (1.0 - es * s1 * s1)
        nu = np.sqrt(nu2)
        rho = nu2 * (1.0 - es) * nu
        dd = x / nu
        D2 = dd * dd
        phi = phi1 - (nu * tn / rho) * D2 * (0.5 - (1.0 + 3.0 * T) * D2 / 24.0)
        lam = dd * (1.0 + T * D2 * (-1.0 / 3 + (1.0 + 3.0 * T) * D2 / 15.0)) / np.cos(phi1)
        pole = np.abs(np.abs(phi1) - HALF_PI) < _EPS10
        phi = np.where(pole, np.sign(phi1) * HALF_PI, phi)
        lam = np.where(pole, 0.0, lam)
        return lam, phi, z, t


@register
class Bonne(Operator):
    """Bonne (reference bonne.cpp, Sph&Ell)."""

    name = "bonne"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.phi1 = parse_angle(self.params["lat_1"]) * DEG_TO_RAD
        if abs(self.phi1) < _EPS10:
            raise ValueError("bonne: |lat_1| must be > 0")
        es = self.ell.es
        if es != 0.0:
            self.en = enfn(self.ell.n)
            s1, c1 = np.sin(self.phi1), np.cos(self.phi1)
            self.m1 = float(mlfn(np.float64(self.phi1), s1, c1, self.en))
            self.am1 = float(c1 / (np.sqrt(1.0 - es * s1 * s1) * s1))
        else:
            self.cphi1 = (0.0 if abs(self.phi1) + _EPS10 >= HALF_PI
                          else 1.0 / np.tan(self.phi1))

    def _fwd(self, lam, phi, z, t):
        es = self.ell.es
        if es != 0.0:
            E, c = np.sin(phi), np.cos(phi)
            rh = self.am1 + self.m1 - mlfn(phi, E, c, self.en)
            small = np.abs(rh) <= _EPS10
            rhs = np.where(small, 1.0, rh)
            E2 = c * lam / (rhs * np.sqrt(1.0 - es * E * E))
            x = np.where(small, 0.0, rh * np.sin(E2))
            y = np.where(small, 0.0, self.am1 - rh * np.cos(E2))
            return x, y, z, t
        rh = self.cphi1 + self.phi1 - phi
        small = np.abs(rh) <= _EPS10
        rhs = np.where(small, 1.0, rh)
        E = lam * np.cos(phi) / rhs
        x = np.where(small, 0.0, rh * np.sin(E))
        y = np.where(small, 0.0, self.cphi1 - rh * np.cos(E))
        return x, y, z, t

    def _inv(self, x, y, z, t):
        es = self.ell.es
        if es != 0.0:
            yy = self.am1 - y
            rh = np.copysign(np.hypot(x, yy), self.phi1)
            phi = inv_mlfn(self.am1 + self.m1 - rh, self.en)
            ap = np.abs(phi)
            s = np.sin(phi)
            with np.errstate(invalid="ignore", divide="ignore"):
                lm = rh * np.sqrt(1.0 - es * s * s) / np.cos(phi)
                lam = np.where(self.phi1 > 0, lm * np.arctan2(x, yy),
                               lm * np.arctan2(-x, -yy))
            lam = np.where(ap - HALF_PI <= _EPS10, np.where(ap >= HALF_PI, 0.0, lam), np.nan)
            phi = np.where(ap - _EPS10 > HALF_PI, np.nan, phi)
            return lam, phi, z, t
        yy = self.cphi1 - y
        rh = np.copysign(np.hypot(x, yy), self.phi1)
        phi = self.cphi1 + self.phi1 - rh
        bad = np.abs(phi) > HALF_PI
        pole = HALF_PI - np.abs(phi) <= _EPS10
        with np.errstate(invalid="ignore", divide="ignore"):
            lm = rh / np.cos(phi)
            lam = np.where(self.phi1 > 0, lm * np.arctan2(x, yy),
                           lm * np.arctan2(-x, -yy))
        lam = np.where(pole, 0.0, lam)
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi), z, t


@register
class Eqdc(Operator):
    """Equidistant Conic (reference eqdc.cpp, Sph&Ell)."""

    name = "eqdc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        phi1 = parse_angle(p.get("lat_1", 0.0)) * DEG_TO_RAD
        phi2 = parse_angle(p.get("lat_2", 0.0)) * DEG_TO_RAD  # ref: lat_2 defaults to 0, NOT lat_1
        # reference eqdc.cpp:87-101 validation order
        if abs(phi1) > HALF_PI:
            illegal_arg("eqdc: |lat_1| should be <= 90")
        if abs(phi2) > HALF_PI:
            illegal_arg("eqdc: |lat_2| should be <= 90")
        if abs(phi1 + phi2) < _EPS10:
            illegal_arg("eqdc: |lat_1 + lat_2| should be > 0")
        es = self.ell.es
        sinphi, cosphi = np.sin(phi1), np.cos(phi1)
        n = sinphi
        secant = abs(phi1 - phi2) >= _EPS10
        self.ellips = es > 0.0
        if self.ellips:
            self.en = enfn(self.ell.n)
            m1 = float(msfn(sinphi, cosphi, es))
            ml1 = float(mlfn(np.float64(phi1), sinphi, cosphi, self.en))
            if secant:
                s2, c2 = np.sin(phi2), np.cos(phi2)
                ml2 = float(mlfn(np.float64(phi2), s2, c2, self.en))
                if ml1 == ml2:
                    illegal_arg("eqdc: eccentricity too close to 1")
                n = (m1 - float(msfn(s2, c2, es))) / (ml2 - ml1)
            if n == 0:
                illegal_arg("eqdc: invalid value for eccentricity")
            self.c = ml1 + m1 / n
            self.rho0 = self.c - float(mlfn(np.float64(self.phi0), np.sin(self.phi0),
                                            np.cos(self.phi0), self.en))
        else:
            if secant:
                n = (cosphi - np.cos(phi2)) / (phi2 - phi1)
            if n == 0:
                illegal_arg("eqdc: lat_1 + lat_2 should be > 0")
            self.c = phi1 + np.cos(phi1) / n
            self.rho0 = self.c - self.phi0
        self.n = float(n)

    def _fwd(self, lam, phi, z, t):
        if self.ellips:
            rho = self.c - mlfn(phi, np.sin(phi), np.cos(phi), self.en)
        else:
            rho = self.c - phi
        ln = lam * self.n
        return rho * np.sin(ln), self.rho0 - rho * np.cos(ln), z, t

    def _inv(self, x, y, z, t):
        yy = self.rho0 - y
        rho = np.hypot(x, yy)
        xs = np.where(self.n < 0, -x, x)
        ys = np.where(self.n < 0, -yy, yy)
        rho = np.where(self.n < 0, -rho, rho)
        phi = self.c - rho
        if self.ellips:
            phi = inv_mlfn(phi, self.en)
        lam = np.arctan2(xs, ys) / self.n
        center = rho == 0.0
        phi = np.where(center, np.where(self.n > 0, HALF_PI, -HALF_PI), phi)
        lam = np.where(center, 0.0, lam)
        return lam, phi, z, t


@register
class Goode(Operator):
    """Goode Homolosine: sinusoidal below PHI_LIM, Mollweide above
    (reference goode.cpp)."""

    name = "goode"
    left = U_RADIANS
    right = U_CLASSIC
    _Y_COR = 0.05280
    _PHI_LIM = 0.71093078197902358062

    def setup(self):
        sphere = {"proj": "x", "R": str(self.ell.a), "_no_datum_shift": True}
        self._sinu = Sinu({**sphere, "proj": "sinu"})
        self._moll = Moll({**sphere, "proj": "moll"})

    def _fwd(self, lam, phi, z, t):
        xs, ys, _, _ = self._sinu._fwd(lam, phi, z, t)
        xm, ym, _, _ = self._moll._fwd(lam, phi, z, t)
        hi = np.abs(phi) > self._PHI_LIM
        x = np.where(hi, xm, xs)
        y = np.where(hi, ym - np.where(phi >= 0, self._Y_COR, -self._Y_COR), ys)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        hi = np.abs(y) > self._PHI_LIM
        ls, ps, _, _ = self._sinu._inv(x, y, z, t)
        ym = y + np.where(y >= 0, self._Y_COR, -self._Y_COR)
        lm, pm, _, _ = self._moll._inv(x, ym, z, t)
        return np.where(hi, lm, ls), np.where(hi, pm, ps), z, t


# Cass ellipsoidal inverse refinement: the series seed above is good to
# ~um; the reference follows it with pj_generic_inverse_2d Newton to pass
# the GIGS 5108 roundtrip bars (cass.cpp:93-96) — mirror that.
from ..ops import generic_inverse_2d  # noqa: E402

_cass_series_inv = Cass._inv


def _cass_inv_refined(self, x, y, z, t):
    lam, phi, z, t = _cass_series_inv(self, x, y, z, t)
    if self.ell.es != 0.0:
        lam, phi = generic_inverse_2d(self, x, y, lam, phi)
    return lam, phi, z, t


Cass._inv = _cass_inv_refined
