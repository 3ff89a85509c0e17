"""Breadth batch 5: remaining specialist projections.

Vectorized numpy reimplementations of (src/projections/):
- calcofi.cpp (CalCOFI oceanographic line/station grid)
- bipc.cpp (Bipolar Oblique Conic Conformal, western hemisphere)
- labrd.cpp (Laborde, Madagascar grid)
- chamb.cpp (Chamberlin Trimetric; no inverse)
- imw_p.cpp (International Map of the World Polyconic)
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    parse_angle,
    U_RADIANS,
    U_CLASSIC,
    U_PROJECTED,
)
from .core import (
    DEG_TO_RAD,
    RAD_TO_DEG,
    FORT_PI,
    HALF_PI,
    aacos,
    aasin,
    adjlon,
    enfn,
    mlfn,
    phi2,
    tsfn,
)

_EPS10 = 1e-10


@register
class Calcofi(Operator):
    """CalCOFI line/station pseudo-projection (reference calcofi.cpp).
    Outputs are line/station numbers (a forced to 1, calcofi.cpp:124-129)."""

    name = "calcofi"
    left = U_RADIANS
    right = U_PROJECTED  # already in line/station units; no a-scaling

    DEG_TO_LINE = 5.0
    DEG_TO_STATION = 15.0
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80.0
    PT_O_STATION = 60.0
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882

    def setup(self):
        self.lam0 = 0.0
        self.x0 = 0.0
        self.y0 = 0.0
        self.over = True

    def _merc_y(self, phi):
        if self.ell.es != 0.0:
            return -np.log(tsfn(phi, np.sin(phi), self.ell.e))
        return np.log(np.tan(FORT_PI + 0.5 * phi))

    def _inv_merc_y(self, y):
        if self.ell.es != 0.0:
            return phi2(np.exp(-y), self.ell.e)
        return HALF_PI - 2.0 * np.arctan(np.exp(-y))

    def _fwd(self, lam, phi, z, t):
        bad = np.abs(np.abs(phi) - HALF_PI) <= _EPS10
        ymerc = self._merc_y(phi)
        oy = self._merc_y(np.float64(self.PT_O_PHI))
        l1 = (ymerc - oy) * np.tan(self.ROT)
        l2 = -lam - l1 + self.PT_O_LAMBDA
        ry = l2 * np.cos(self.ROT) * np.sin(self.ROT) + ymerc
        ry = self._inv_merc_y(ry)
        x = self.PT_O_LINE - RAD_TO_DEG * (ry - self.PT_O_PHI) \
            * self.DEG_TO_LINE / np.cos(self.ROT)
        y = self.PT_O_STATION + RAD_TO_DEG * (ry - phi) \
            * self.DEG_TO_STATION / np.sin(self.ROT)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        ry = self.PT_O_PHI - self.LINE_TO_RAD * (x - self.PT_O_LINE) \
            * np.cos(self.ROT)
        phi = ry - self.STATION_TO_RAD * (y - self.PT_O_STATION) \
            * np.sin(self.ROT)
        oy = self._merc_y(np.float64(self.PT_O_PHI))
        rym = self._merc_y(ry)
        xym = self._merc_y(phi)
        l1 = (xym - oy) * np.tan(self.ROT)
        l2 = (rym - xym) / (np.cos(self.ROT) * np.sin(self.ROT))
        lam = self.PT_O_LAMBDA - (l1 + l2)
        return lam, phi, z, t


@register
class Bipc(Operator):
    """Bipolar Oblique Conic Conformal (reference bipc.cpp); +ns for the
    unskewed form."""

    name = "bipc"
    left = U_RADIANS
    right = U_CLASSIC

    lamB = -0.34894976726250681539
    n = 0.63055844881274687180
    F = 1.89724742567461030582
    Azab = 0.81650043674686363166
    Azba = 1.82261843856185925133
    T = 1.27246578267089012270
    rhoc = 1.20709121521568721927
    cAzc = 0.69691523038678375519
    sAzc = 0.71715351331143607555
    C45 = 0.70710678118654752469
    S45 = 0.70710678118654752410
    C20 = 0.93969262078590838411
    S20 = -0.34202014332566873287
    R110 = 1.91986217719376253360
    R104 = 1.81514242207410275904

    def setup(self):
        self.noskew = "ns" in self.params

    def _fwd(self, lam, phi, z, t):
        ONEEPS = 1.000000001
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        sdlam0 = self.lamB - lam
        cdlam = np.cos(sdlam0)
        sdlam = np.sin(sdlam0)
        pole = np.abs(np.abs(phi) - HALF_PI) < _EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            tphi = np.where(pole, np.inf, sphi / cphi)
            Az = np.where(pole, np.where(phi < 0.0, np.pi, 0.0),
                          np.arctan2(sdlam, self.C45 * (tphi - cdlam)))
            tag = Az > self.Azba
            # B-pole branch (bipc.cpp:63-86)
            sdlam_b = lam + self.R110
            cdlam_b = np.cos(sdlam_b)
            sdlam_b2 = np.sin(sdlam_b)
            zb = self.S20 * sphi + self.C20 * cphi * cdlam_b
            bad = np.abs(zb) > ONEEPS
            zb = np.arccos(np.clip(zb, -1.0, 1.0))
            Az_b = np.where(pole, Az,
                            np.arctan2(sdlam_b2,
                                       self.C20 * tphi - self.S20 * cdlam_b))
            # A-pole branch
            za = self.S45 * (sphi + cphi * cdlam)
            bad |= (~tag) & (np.abs(za) > ONEEPS)
            za = np.arccos(np.clip(za, -1.0, 1.0))

            zz = np.where(tag, zb, za)
            Az = np.where(tag, Az_b, Az)
            Av = np.where(tag, self.Azab, self.Azba)
            y0 = np.where(tag, self.rhoc, -self.rhoc)
            bad |= zz < 0.0
            tt = np.tan(0.5 * zz) ** self.n
            r = self.F * tt
            al = 0.5 * (self.R104 - zz)
            bad |= al < 0.0
            al = (tt + np.clip(al, 0.0, None) ** self.n) / self.T
            bad |= np.abs(al) > ONEEPS
            al = np.arccos(np.clip(al, -1.0, 1.0))
            tA = self.n * (Av - Az)
            r = np.where(np.abs(tA) < al,
                         r / np.cos(al + np.where(tag, tA, -tA)), r)
            x = r * np.sin(tA)
            y = y0 + np.where(tag, -r, r) * np.cos(tA)
            if self.noskew:
                x, y = (-x * self.cAzc - y * self.sAzc,
                        -y * self.cAzc + x * self.sAzc)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y), z, t

    def _inv(self, x, y, z, t):
        if self.noskew:
            x, y = (-x * self.cAzc + y * self.sAzc,
                    -y * self.cAzc - x * self.sAzc)
        neg = x < 0.0
        yy = np.where(neg, self.rhoc - y, y + self.rhoc)
        s = np.where(neg, self.S20, self.S45)
        c = np.where(neg, self.C20, self.C45)
        Av = np.where(neg, self.Azab, self.Azba)
        r = np.hypot(x, yy)
        rp = r.copy()
        rl = r.copy()
        Az = np.arctan2(x, yy)
        fAz = np.abs(Az)
        zz = np.zeros_like(x)
        conv = np.zeros(x.shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(10):
                zz_i = 2.0 * np.arctan((r / self.F) ** (1.0 / self.n))
                al = np.arccos(np.clip(
                    (np.tan(0.5 * zz_i) ** self.n
                     + np.tan(0.5 * (self.R104 - zz_i)) ** self.n) / self.T,
                    -1.0, 1.0))
                r_new = np.where(fAz < al,
                                 rp * np.cos(al + np.where(neg, Az, -Az)), r)
                zz = np.where(conv, zz, zz_i)
                newly = np.abs(rl - r_new) < 1e-10
                r = np.where(conv, r, r_new)
                rl = np.where(conv, rl, r_new)
                conv |= newly
                if np.all(conv):
                    break
            Az2 = Av - Az / self.n
            phi = np.arcsin(np.clip(s * np.cos(zz)
                                    + c * np.sin(zz) * np.cos(Az2), -1, 1))
            lam = np.arctan2(np.sin(Az2), c / np.tan(zz) - s * np.cos(Az2))
        lam = np.where(neg, lam - self.R110, self.lamB - lam)
        phi = np.where(conv, phi, np.nan)
        lam = np.where(conv, lam, np.nan)
        return lam, phi, z, t


@register
class Labrd(Operator):
    """Laborde (Madagascar) (reference labrd.cpp); +azi, +lat_0 != 0."""

    name = "labrd"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        if self.phi0 == 0.0:
            from ..errors import ProjError, INVALID_OP_ILLEGAL_ARG_VALUE
            raise ProjError("labrd +lat_0 must be non-zero",
                            INVALID_OP_ILLEGAL_ARG_VALUE)
        es, e, one_es = self.ell.es, self.ell.e, self.ell.one_es
        Az = parse_angle(self.params.get("azi", 0.0)) * DEG_TO_RAD
        sinp = np.sin(self.phi0)
        t = 1.0 - es * sinp * sinp
        N = 1.0 / np.sqrt(t)
        R = one_es * N / t
        self.kRg = self.k0 * np.sqrt(N * R)
        self.p0s = np.arctan(np.sqrt(R / N) * np.tan(self.phi0))
        self.A = sinp / np.sin(self.p0s)
        t = e * sinp
        self.C = 0.5 * e * self.A * np.log((1.0 + t) / (1.0 - t)) \
            - self.A * np.log(np.tan(FORT_PI + 0.5 * self.phi0)) \
            + np.log(np.tan(FORT_PI + 0.5 * self.p0s))
        t = Az + Az
        self.Cb = 1.0 / (12.0 * self.kRg * self.kRg)
        self.Ca = (1.0 - np.cos(t)) * self.Cb
        self.Cb = self.Cb * np.sin(t)
        self.Cc = 3.0 * (self.Ca * self.Ca - self.Cb * self.Cb)
        self.Cd = 6.0 * self.Ca * self.Cb

    def _fwd(self, lam, phi, z, t):
        e = self.ell.e
        V1 = self.A * np.log(np.tan(FORT_PI + 0.5 * phi))
        tt = e * np.sin(phi)
        V2 = 0.5 * e * self.A * np.log((1.0 + tt) / (1.0 - tt))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - FORT_PI)
        I1 = ps - self.p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = self.A * cosps
        I2 = 0.5 * self.A * I4 * sinps
        I3 = I2 * self.A * self.A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * self.A * self.A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * self.A * self.A * (
            5.0 * cosps2 * cosps2 + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0
        tt = lam * lam
        x = self.kRg * lam * (I4 + tt * (I5 + tt * I6))
        y = self.kRg * (I1 + tt * (I2 + tt * I3))
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        x = x + self.Ca * V1 + self.Cb * V2
        y = y + self.Ca * V2 - self.Cb * V1
        return x, y, z, t

    def _inv(self, x, y, z, t):
        e, es, one_es = self.ell.e, self.ell.es, self.ell.one_es
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        x = x - self.Ca * V1 - self.Cb * V2 + self.Cc * V3 + self.Cd * V4
        y = y + self.Cb * V1 - self.Ca * V2 - self.Cd * V3 + self.Cc * V4
        ps = self.p0s + y / self.kRg
        pe = ps + self.phi0 - self.p0s
        conv = np.zeros(x.shape, dtype=bool)
        for _ in range(20):
            V1 = self.A * np.log(np.tan(FORT_PI + 0.5 * pe))
            tpe = e * np.sin(pe)
            V2 = 0.5 * e * self.A * np.log((1.0 + tpe) / (1.0 - tpe))
            tt = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - FORT_PI)
            pe = np.where(conv, pe, pe + tt)
            conv |= np.abs(tt) < 1e-10
            if np.all(conv):
                break
        tt = e * np.sin(pe)
        tt = 1.0 - tt * tt
        Re = one_es / (tt * np.sqrt(tt))
        tt = np.tan(ps)
        t2 = tt * tt
        s = self.kRg * self.kRg
        d = Re * self.k0 * self.kRg
        I7 = tt / (2.0 * d)
        I8 = tt * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * self.kRg * self.A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = x * x
        phi = pe + x2 * (-I7 + I8 * x2)
        lam = x * (I9 + x2 * (-I10 + x2 * I11))
        return lam, phi, z, t


@register
class Chamb(Operator):
    """Chamberlin Trimetric (reference chamb.cpp); three control points
    +lat_1/+lon_1 .. +lat_3/+lon_3; no inverse."""

    name = "chamb"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False
    TOL = 1e-9

    @staticmethod
    def _vect(dphi, c1, s1, c2, s2, dlam):
        cdl = np.cos(dlam)
        big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
        dp = np.sin(0.5 * dphi)
        dl = np.sin(0.5 * dlam)
        r = np.where(big, aacos(s1 * s2 + c1 * c2 * cdl),
                     2.0 * aasin(np.sqrt(dp * dp + c1 * c2 * dl * dl)))
        az = np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl)
        small = np.abs(r) <= Chamb.TOL
        return np.where(small, 0.0, r), np.where(small, 0.0, az)

    @staticmethod
    def _lc(b, c, a):
        return aacos(0.5 * (b * b + c * c - a * a) / (b * c))

    def setup(self):
        p = self.params
        self.ctl = []
        for i in (1, 2, 3):
            # missing control params default to 0 (pj_param semantics)
            cphi = parse_angle(p.get(f"lat_{i}", 0.0)) * DEG_TO_RAD
            clam = float(adjlon(np.float64(
                parse_angle(p.get(f"lon_{i}", 0.0)) * DEG_TO_RAD - self.lam0)))
            self.ctl.append({"phi": cphi, "lam": clam,
                             "cosphi": np.cos(cphi), "sinphi": np.sin(cphi)})
        for i in range(3):
            j = (i + 1) % 3
            r, az = self._vect(
                np.float64(self.ctl[j]["phi"] - self.ctl[i]["phi"]),
                self.ctl[i]["cosphi"], self.ctl[i]["sinphi"],
                self.ctl[j]["cosphi"], self.ctl[j]["sinphi"],
                np.float64(self.ctl[j]["lam"] - self.ctl[i]["lam"]))
            if float(r) == 0.0:
                raise ValueError("chamb control points must be distinct")
            self.ctl[i]["vr"] = float(r)
            self.ctl[i]["vaz"] = float(az)
        self.beta0 = float(self._lc(self.ctl[0]["vr"], self.ctl[2]["vr"],
                                    self.ctl[1]["vr"]))
        self.beta1 = float(self._lc(self.ctl[0]["vr"], self.ctl[1]["vr"],
                                    self.ctl[2]["vr"]))
        self.beta2 = np.pi - self.beta0
        py = self.ctl[2]["vr"] * np.sin(self.beta0)
        self.ctl[0]["py"] = py
        self.ctl[1]["py"] = py
        self.ctl[2]["py"] = 0.0
        self.ctl[1]["px"] = 0.5 * self.ctl[0]["vr"]
        self.ctl[0]["px"] = -self.ctl[1]["px"]
        self.ctl[2]["px"] = self.ctl[0]["px"] \
            + self.ctl[2]["vr"] * np.cos(self.beta0)
        self.p_x = self.ctl[2]["px"]
        self.p_y = 2.0 * py

    def _fwd(self, lam, phi, z, t):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        vr = []
        vaz = []
        at_ctl = np.full(lam.shape, -1, dtype=np.int64)
        for i, c in enumerate(self.ctl):
            r, az = self._vect(phi - c["phi"], c["cosphi"], c["sinphi"],
                               cosphi, sinphi, lam - c["lam"])
            at_ctl = np.where((at_ctl < 0) & (r == 0.0), i, at_ctl)
            vr.append(r)
            vaz.append(adjlon(az - c["vaz"]))
        x = np.full_like(lam, self.p_x)
        y = np.full_like(lam, self.p_y)
        with np.errstate(invalid="ignore", divide="ignore"):
            for i in range(3):
                j = (i + 1) % 3
                a = self._lc(self.ctl[i]["vr"], vr[i], vr[j])
                a = np.where(vaz[i] < 0.0, -a, a)
                if i == 0:
                    x = x + vr[i] * np.cos(a)
                    y = y - vr[i] * np.sin(a)
                elif i == 1:
                    a = self.beta1 - a
                    x = x - vr[i] * np.cos(a)
                    y = y - vr[i] * np.sin(a)
                else:
                    a = self.beta2 - a
                    x = x + vr[i] * np.cos(a)
                    y = y + vr[i] * np.sin(a)
        x = x / 3.0
        y = y / 3.0
        for i, c in enumerate(self.ctl):
            x = np.where(at_ctl == i, c["px"], x)
            y = np.where(at_ctl == i, c["py"], y)
        return x, y, z, t


@register
class ImwP(Operator):
    """International Map of the World Polyconic (reference imw_p.cpp);
    +lat_1 +lat_2 [+lon_1]."""

    name = "imw_p"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        p = self.params
        if "lat_1" not in p or "lat_2" not in p:
            raise ValueError("imw_p requires +lat_1 and +lat_2")
        self.en = enfn(self.ell.n)
        phi1 = parse_angle(p["lat_1"]) * DEG_TO_RAD
        phi2_ = parse_angle(p["lat_2"]) * DEG_TO_RAD
        delta = 0.5 * (phi2_ - phi1)
        sig = 0.5 * (phi2_ + phi1)
        if abs(delta) < 1e-10 or abs(sig) < 1e-10:
            raise ValueError("imw_p |lat_1 - lat_2| and |lat_1 + lat_2| "
                             "must be > 0")
        if phi2_ < phi1:
            phi1, phi2_ = phi2_, phi1
        self.phi1, self.phi2 = phi1, phi2_
        if "lon_1" in p:
            self.lam1 = parse_angle(p["lon_1"]) * DEG_TO_RAD
        else:
            s = abs(sig * RAD_TO_DEG)
            self.lam1 = (2.0 if s <= 60 else (4.0 if s <= 76 else 8.0)) \
                * DEG_TO_RAD
        self.mode = 0
        if self.phi1 != 0.0:
            x1, y1, self.sphi1, self.R1 = self._xy(self.phi1)
        else:
            self.mode = 1
            self.sphi1 = 0.0
            self.R1 = 0.0
            y1, x1 = 0.0, self.lam1
        if self.phi2 != 0.0:
            x2, T2, self.sphi2, self.R2 = self._xy(self.phi2)
        else:
            self.mode = -1
            self.sphi2 = 0.0
            self.R2 = 0.0
            T2, x2 = 0.0, self.lam1
        m1 = float(mlfn(np.float64(self.phi1), np.sin(self.phi1),
                        np.cos(self.phi1), self.en))
        m2 = float(mlfn(np.float64(self.phi2), np.sin(self.phi2),
                        np.cos(self.phi2), self.en))
        tt = m2 - m1
        s = x2 - x1
        y2 = np.sqrt(tt * tt - s * s) + y1
        self.C2 = y2 - T2
        tt = 1.0 / tt
        self.P = (m2 * y1 - m1 * y2) * tt
        self.Q = (y2 - y1) * tt
        self.Pp = (m2 * x1 - m1 * x2) * tt
        self.Qp = (x2 - x1) * tt

    def _xy(self, phi):
        sp = np.sin(phi)
        R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - self.ell.es * sp * sp))
        F = self.lam1 * sp
        return float(R * np.sin(F)), float(R * (1.0 - np.cos(F))), \
            float(sp), float(R)

    def _loc_for(self, lam, phi):
        """loc_for (imw_p.cpp:46-96) vectorized; returns (x, y, yc)."""
        es = self.ell.es
        eq = phi == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            sp = np.sin(phi)
            m = mlfn(phi, sp, np.cos(phi), self.en)
            xa = self.Pp + self.Qp * m
            ya = self.P + self.Q * m
            R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - es * sp * sp))
            C = np.sqrt(np.clip(R * R - xa * xa, 0.0, None))
            C = np.where(phi < 0.0, -C, C)
            C = C + ya - R
            if self.mode == -1:
                xb = lam
                yb = np.full_like(lam, self.C2)
            else:
                tt = lam * self.sphi2
                xb = self.R2 * np.sin(tt)
                yb = self.C2 + self.R2 * (1.0 - np.cos(tt))
            if self.mode == 1:
                xc = lam
                yc = np.zeros_like(lam)
            else:
                tt = lam * self.sphi1
                xc = self.R1 * np.sin(tt)
                yc = self.R1 * (1.0 - np.cos(tt))
            D = (xb - xc) / (yb - yc)
            B = xc + D * (C + R - yc)
            xv = D * np.sqrt(np.clip(R * R * (1.0 + D * D) - B * B, 0.0, None))
            xv = np.where(phi > 0.0, -xv, xv)
            xv = (B + xv) / (1.0 + D * D)
            yv = np.sqrt(np.clip(R * R - xv * xv, 0.0, None))
            yv = np.where(phi > 0.0, -yv, yv)
            yv = yv + C + R
        x = np.where(eq, lam, xv)
        y = np.where(eq, 0.0, yv)
        yc = np.where(eq, 0.0, yc)
        return x, y, yc

    def _fwd(self, lam, phi, z, t):
        x, y, _ = self._loc_for(lam, phi)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        TOL = 1e-10
        phi = np.full_like(x, self.phi2)
        lam = x / np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(1000):
                tx, ty, yc = self._loc_for(lam, phi)
                denom = ty - yc
                upd_phi = (denom != 0) | (np.abs(ty - y) > TOL)
                phi = np.where(upd_phi & (denom != 0),
                               (phi - self.phi1) * (y - yc)
                               / np.where(denom == 0, np.nan, denom)
                               + self.phi1, phi)
                upd_lam = (tx != 0) & (np.abs(tx - x) > TOL)
                lam = np.where(upd_lam, lam * x / np.where(tx == 0, 1.0, tx),
                               lam)
                done = (np.abs(tx - x) <= TOL) & (np.abs(ty - y) <= TOL)
                if np.all(done | ~np.isfinite(phi)):
                    break
        return lam, phi, z, t
