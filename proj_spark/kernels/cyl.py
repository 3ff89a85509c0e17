"""Cylindrical projections: merc, webmerc, eqc, tmerc/etmerc/utm.

Vectorized numpy reimplementations of the reference math:
- merc/webmerc: src/projections/merc.cpp:11-84
- eqc:          src/projections/eqc.cpp
- etmerc (Poder/Engsager 6th-order Krüger): src/projections/tmerc.cpp:250-662
- utm zone/k0/false-offset policy: src/projections/tmerc.cpp:737-779

All kernels take/return dimensionless "classic" plane coordinates (x/a) with
geodetic input in radians; generic scaling is applied by the wrapper in
proj_spark.ops (matching the reference's PJ_IO_UNITS_CLASSIC finalize,
src/fwd.cpp:141-152).
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC
from .core import (
    DEG_TO_RAD,
    FORT_PI,
    HALF_PI,
    adjlon,
    clenshaw_complex,
    gatg,
    msfn,
    phi2,
    sinhpsi2tanphi,
    tsfn,
)


@register
class Merc(Operator):
    """Mercator (reference src/projections/merc.cpp).

    webmerc alias: spherical formulas with k0=1 on the ellipsoid's semimajor
    axis (reference merc.cpp:76-84 — EPSG:3857 semantics).
    """

    name = "merc"
    aliases = ("webmerc",)
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.spherical = self.ell.is_sphere
        if self.invoked_name == "webmerc":
            self.k0 = 1.0
            self.spherical = True  # spherical formulas on a (merc.cpp:76-84)
        elif "lat_ts" in self.params:
            phits = abs(float(self.params["lat_ts"])) * np.pi / 180.0
            if phits >= HALF_PI:
                raise ValueError("|lat_ts| must be < 90")
            if self.ell.is_sphere:
                self.k0 = float(np.cos(phits))
            else:
                self.k0 = float(msfn(np.sin(phits), np.cos(phits), self.ell.es))

    def _fwd(self, lam, phi, z, t):
        x = self.k0 * lam
        if self.spherical:
            y = self.k0 * np.arcsinh(np.tan(phi))
        else:
            sphi = np.sin(phi)
            cphi = np.cos(phi)
            y = self.k0 * (np.arcsinh(sphi / cphi) - self.ell.e * np.arctanh(self.ell.e * sphi))
        # poles diverge -> inf; poison like the reference's HUGE_VAL
        y = np.where(np.isinf(y), np.nan, y)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        lam = x / self.k0
        if self.spherical:
            phi = np.arctan(np.sinh(y / self.k0))
        else:
            phi = np.arctan(sinhpsi2tanphi(np.sinh(y / self.k0), self.ell.e))
        return lam, phi, z, t


@register
class Eqc(Operator):
    """Equidistant cylindrical / Plate Carree (reference
    src/projections/eqc.cpp): x = lam * cos(lat_ts), y = phi - phi0."""

    name = "eqc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        phits = float(self.params.get("lat_ts", 0.0)) * np.pi / 180.0
        self.rc = float(np.cos(phits))
        if self.rc <= 0.0:
            raise ValueError("|lat_ts| must be < 90")

    def _fwd(self, lam, phi, z, t):
        return self.rc * lam, phi - self.phi0, z, t

    def _inv(self, x, y, z, t):
        return x / self.rc, y + self.phi0, z, t


# 2.623395162778 rad = 150.3 deg: the reference's etmerc domain guard
_ETMERC_CE_LIMIT = 2.623395162778


class _KrugerConstants:
    """Precomputed Poder/Engsager series constants for one (ellipsoid, k0,
    phi0) triple (reference src/projections/tmerc.cpp:487-596 setup_exact).

    Coefficient polynomials in the third flattening n are mathematical
    constants from Engsager & Poder (ICC 2007) / Koenig & Weise (1951),
    transcribed from the reference at the lines cited inline.
    """

    def __init__(self, n: float, k0: float, phi0: float):
        # cgb: Gaussian->geodetic, cbg: geodetic->Gaussian (tmerc.cpp:499-538)
        self.cgb = np.array([
            n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (26 / 45.0 + n * (-2854 / 675.0)))))),
            n**2 * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (2704 / 315.0 + n * (2323 / 945.0))))),
            n**3 * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (73814 / 2835.0)))),
            n**4 * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0))),
            n**5 * (4174 / 315.0 + n * (-144838 / 6237.0)),
            n**6 * (601676 / 22275.0),
        ])
        self.cbg = np.array([
            n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (32 / 45.0 + n * (4642 / 4725.0)))))),
            n**2 * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (904 / 315.0 + n * (-1522 / 945.0))))),
            n**3 * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (-12686 / 2835.0)))),
            n**4 * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0))),
            n**5 * (-734 / 315.0 + n * (109598 / 31185.0)),
            n**6 * (444337 / 155925.0),
        ])
        # normalized meridian quadrant (tmerc.cpp:541-543)
        np2 = n * n
        self.qn = k0 / (1 + n) * (1 + np2 * (1 / 4.0 + np2 * (1 / 64.0 + np2 / 256.0)))
        # utg: ellipsoidal N,E -> spherical; gtu: the inverse (tmerc.cpp:546-580)
        self.utg = np.array([
            n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 + n * (81 / 512.0 + n * (-96199 / 604800.0)))))),
            n**2 * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (-46 / 105.0 + n * (1118711 / 3870720.0))))),
            n**3 * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (-5569 / 90720.0)))),
            n**4 * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0))),
            n**5 * (-4583 / 161280.0 + n * (108847 / 3991680.0)),
            n**6 * (-20648693 / 638668800.0),
        ])
        self.gtu = np.array([
            n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 + n * (-127 / 288.0 + n * (7891 / 37800.0)))))),
            n**2 * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (281 / 630.0 + n * (-1983433 / 1935360.0))))),
            n**3 * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (167603 / 181440.0)))),
            n**4 * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0))),
            n**5 * (34729 / 80640.0 + n * (-3418889 / 1995840.0)),
            n**6 * (212378941 / 319334400.0),
        ])
        # origin northing offset (tmerc.cpp:583-589)
        z0 = gatg(self.cbg, np.float64(phi0), np.cos(2 * phi0), np.sin(2 * phi0))
        from .core import clenshaw_real
        self.zb = -self.qn * (z0 + clenshaw_real(self.gtu, np.float64(2 * z0)))


@register
class Tmerc(Operator):
    """Transverse Mercator, exact (Poder/Engsager 6th-order Krüger).

    tmerc/etmerc on an ellipsoid use the exact algorithm (the reference's
    default, data/proj.ini tmerc_default_algo = poder_engsager); tmerc on a
    sphere uses the closed-form spherical TM (Snyder p.58, reference
    src/projections/tmerc.cpp approx_s_fwd).
    utm alias applies zone policy (tmerc.cpp:737-779): k0=0.9996,
    x0=500000, y0=1e7 if +south, lam0=(zone+0.5)*pi/30-pi.
    """

    name = "tmerc"
    aliases = ("etmerc", "utm")
    left = U_RADIANS
    right = U_CLASSIC

    def _resolve_algo(self) -> str:
        """+approx / +algo handling (tmerc.cpp:667-705): etmerc is always
        exact; tmerc/utm default to poder_engsager (data/proj.ini), +approx
        or +algo=evenden_snyder select the Snyder series, +algo=auto mixes
        with the |lam|>3deg / parabola-frontier switch (tmerc.cpp:598-615)
        unless es>0.1, phi0!=0 or |k0-1|>0.01 (tmerc.cpp:696-702)."""
        p = self.params
        if self.invoked_name == "etmerc":
            return "exact"
        if "approx" in p:
            return "approx"
        algo = str(p.get("algo", "poder_engsager"))
        if algo == "evenden_snyder":
            return "approx"
        if algo == "poder_engsager":
            return "exact"
        if algo != "auto":
            raise ValueError("unknown value for +algo")
        if self.ell.es > 0.1 or self.phi0 != 0 or abs(self.k0 - 1) > 0.01:
            return "exact"
        return "auto"

    def setup(self):
        if self.invoked_name == "utm":
            from ..errors import illegal_arg
            if self.ell.is_sphere:
                # tmerc.cpp utm setup: +R / spherical use is invalid
                illegal_arg("utm: invalid use of +R or spherical ellipsoid")
            self.y0 = 10000000.0 if "south" in self.params else 0.0
            self.x0 = 500000.0
            if "zone" in self.params:
                try:
                    zone = int(self.params["zone"])
                except (TypeError, ValueError):
                    illegal_arg("utm: invalid value for zone")
                if not 1 <= zone <= 60:
                    illegal_arg("utm: zone should be in [1, 60]")
                zone -= 1
            else:
                zone = int(np.floor((adjlon(np.float64(self.lam0)) + np.pi) * 30.0 / np.pi))
                zone = min(max(zone, 0), 59)
            self.lam0 = (zone + 0.5) * np.pi / 30.0 - np.pi
            self.zone = zone + 1
            self.k0 = 0.9996
            self.phi0 = 0.0
        if self.invoked_name == "etmerc" and self.ell.is_sphere:
            raise ValueError("etmerc requires an ellipsoid")
        self.spherical = self.ell.is_sphere
        if not self.spherical:
            self.algo = self._resolve_algo()
            if self.algo in ("exact", "auto"):
                self.kc = _KrugerConstants(self.ell.n, self.k0, self.phi0)
            if self.algo in ("approx", "auto"):
                # setup_approx (tmerc.cpp:237-252)
                from .core import enfn, mlfn
                self.en = enfn(self.ell.n)
                self.ml0 = mlfn(np.float64(self.phi0), np.sin(self.phi0),
                                np.cos(self.phi0), self.en)
                self.esp = self.ell.es / (1.0 - self.ell.es)
        else:
            self.algo = "approx"
            self.esp = self.k0
            self.ml0 = 0.5 * self.esp

    # --- exact ellipsoidal kernels (tmerc.cpp:328-480) ---
    def _fwd_e(self, lam, phi):
        kc = self.kc
        cn = gatg(kc.cbg, phi, np.cos(2 * phi), np.sin(2 * phi))
        sin_cn = np.sin(cn)
        cos_cn = np.cos(cn)
        sin_ce = np.sin(lam)
        cos_ce = np.cos(lam)
        cos_cn_cos_ce = cos_cn * cos_ce
        cn2 = np.arctan2(sin_cn, cos_cn_cos_ce)
        # sqrt(a*a + b*b) instead of np.hypot: both operands are sines/
        # cosines in [-1, 1], so hypot's overflow rescaling buys nothing
        # here and costs ~3x; difference is sub-ulp and far inside the
        # 0.1 mm gie tolerance
        inv_denom = 1.0 / np.sqrt(sin_cn * sin_cn
                                  + cos_cn_cos_ce * cos_cn_cos_ce)
        tan_ce = sin_ce * cos_cn * inv_denom
        ce = np.arcsinh(tan_ce)
        two_inv = 2.0 * inv_denom
        two_inv_sq = two_inv * inv_denom
        tmp_r = cos_cn_cos_ce * two_inv_sq
        sin_arg_r = sin_cn * tmp_r
        cos_arg_r = cos_cn_cos_ce * tmp_r - 1.0
        sinh_arg_i = tan_ce * two_inv
        cosh_arg_i = two_inv_sq - 1.0
        d_cn, d_ce = clenshaw_complex(kc.gtu, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        cn3 = cn2 + d_cn
        ce3 = ce + d_ce
        ok = np.abs(ce3) <= _ETMERC_CE_LIMIT
        x = np.where(ok, kc.qn * ce3, np.nan)
        y = np.where(ok, kc.qn * cn3 + kc.zb, np.nan)
        return x, y

    def _inv_e(self, x, y):
        kc = self.kc
        cn = (y - kc.zb) / kc.qn
        ce = x / kc.qn
        ok = np.abs(ce) <= _ETMERC_CE_LIMIT
        sin_arg_r = np.sin(2 * cn)
        cos_arg_r = np.cos(2 * cn)
        exp2ce = np.exp(2 * ce)
        half_inv = 0.5 / exp2ce
        sinh_arg_i = 0.5 * exp2ce - half_inv
        cosh_arg_i = 0.5 * exp2ce + half_inv
        _d_cn, d_ce = clenshaw_complex(kc.utg, sin_arg_r, cos_arg_r, sinh_arg_i, cosh_arg_i)
        cn = cn + _d_cn
        ce = ce + d_ce
        sin_cn = np.sin(cn)
        cos_cn = np.cos(cn)
        sinh_ce = np.sinh(ce)
        ce2 = np.arctan2(sinh_ce, cos_cn)
        # |sinh(ce)| is bounded by the ce-limit guard above; plain sqrt
        # beats hypot with sub-ulp difference (see _fwd_e)
        mod_ce = np.sqrt(sinh_ce * sinh_ce + cos_cn * cos_cn)
        cn2 = np.arctan2(sin_cn, mod_ce)
        tmp = 2.0 * mod_ce / (sinh_ce * sinh_ce + 1.0)
        sin_2cn = sin_cn * tmp
        cos_2cn = tmp * mod_ce - 1.0
        phi = gatg(kc.cgb, cn2, cos_2cn, sin_2cn)
        lam = ce2
        return np.where(ok, lam, np.nan), np.where(ok, phi, np.nan)

    # --- approx ellipsoidal kernels, Evenden/Snyder (tmerc.cpp:71-117,
    # 154-190): Snyder 1987 series eq. 8-9..8-17 ---
    def _fwd_a(self, lam, phi):
        from .core import mlfn
        FC1, FC2, FC3 = 1.0, 0.5, 0.16666666666666666666
        FC4, FC5 = 0.08333333333333333333, 0.05
        FC6, FC7, FC8 = 0.03333333333333333333, 0.02380952380952380952, \
            0.01785714285714285714
        bad = (lam < -HALF_PI) | (lam > HALF_PI)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        tt = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        tt = tt * tt
        al = cosphi * lam
        als = al * al
        al = al / np.sqrt(1.0 - self.ell.es * sinphi * sinphi)
        n = self.esp * cosphi * cosphi
        x = self.k0 * al * (
            FC1 + FC3 * als * (1.0 - tt + n + FC5 * als * (
                5.0 + tt * (tt - 18.0) + n * (14.0 - 58.0 * tt)
                + FC7 * als * (61.0 + tt * (tt * (179.0 - tt) - 479.0)))))
        y = self.k0 * (
            mlfn(phi, sinphi, cosphi, self.en) - self.ml0
            + sinphi * al * lam * FC2 * (
                1.0 + FC4 * als * (
                    5.0 - tt + n * (9.0 + 4.0 * n) + FC6 * als * (
                        61.0 + tt * (tt - 58.0) + n * (270.0 - 330.0 * tt)
                        + FC8 * als * (1385.0 + tt * (tt * (543.0 - tt)
                                                      - 3111.0))))))
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def _inv_a(self, x, y):
        from .core import inv_mlfn
        FC1, FC2, FC3 = 1.0, 0.5, 0.16666666666666666666
        FC4, FC5 = 0.08333333333333333333, 0.05
        FC6, FC7, FC8 = 0.03333333333333333333, 0.02380952380952380952, \
            0.01785714285714285714
        es = self.ell.es
        phi = inv_mlfn(self.ml0 + y / self.k0, self.en)
        pole = np.abs(phi) >= HALF_PI
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        tt = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        n = self.esp * cosphi * cosphi
        con = 1.0 - es * sinphi * sinphi
        d = x * np.sqrt(con) / self.k0
        con = con * tt
        tt = tt * tt
        ds = d * d
        phi_out = phi - (con * ds / (1.0 - es)) * FC2 * (
            1.0 - ds * FC4 * (
                5.0 + tt * (3.0 - 9.0 * n) + n * (1.0 - 4.0 * n)
                - ds * FC6 * (
                    61.0 + tt * (90.0 - 252.0 * n + 45.0 * tt) + 46.0 * n
                    - ds * FC8 * (1385.0 + tt * (3633.0 + tt * (4095.0
                                                                + 1575.0 * tt))))))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_out = d * (
                FC1 - ds * FC3 * (
                    1.0 + 2.0 * tt + n - ds * FC5 * (
                        5.0 + tt * (28.0 + 24.0 * tt + 8.0 * n) + 6.0 * n
                        - ds * FC7 * (61.0 + tt * (662.0 + tt * (1320.0
                                                                 + 720.0 * tt)))))) / cosphi
        phi_out = np.where(pole, np.where(y < 0.0, -HALF_PI, HALF_PI), phi_out)
        lam_out = np.where(pole, 0.0, lam_out)
        return lam_out, phi_out

    # --- spherical closed form (Snyder 1987 eq. 8-1..8-3) ---
    def _fwd_s(self, lam, phi):
        b = np.cos(phi) * np.sin(lam)
        x = self.esp * np.arctanh(b)
        y = self.esp * (np.arctan2(np.tan(phi), np.cos(lam)) - self.phi0)
        bad = np.abs(np.abs(b) - 1.0) <= 1e-10
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)

    def _inv_s(self, x, y):
        h = np.exp(x / self.esp)
        # h == 0 -> outside projection domain (tmerc.cpp:198-201)
        h = np.where(h == 0.0, np.nan, h)
        g = 0.5 * (h - 1.0 / h)
        d = self.phi0 + y / self.esp
        h2 = np.cos(d)
        phi = np.arcsin(np.clip(np.sqrt((1.0 - h2 * h2) / (1.0 + g * g)), -1, 1))
        phi = np.copysign(phi, d)
        lam = np.where((g != 0) | (h2 != 0), np.arctan2(g, h2), 0.0)
        return lam, phi

    @staticmethod
    def _split_apply(fn_far, fn_near, far, a, b):
        """auto-mode dispatch (tmerc.cpp:598-615): each row is computed
        exactly ONCE by the branch that owns it (the reference evaluates
        one branch per point; evaluating both and np.where-ing doubles the
        work). Chunked for allocator/cache locality."""
        from .core import chunk_apply
        o1 = np.empty_like(a)
        o2 = np.empty_like(a)
        idx = np.nonzero(far)[0]
        if idx.size:
            r1, r2 = chunk_apply(fn_far, (a[idx], b[idx]))
            o1[idx] = r1
            o2[idx] = r2
        idx = np.nonzero(~far)[0]
        if idx.size:
            r1, r2 = chunk_apply(fn_near, (a[idx], b[idx]))
            o1[idx] = r1
            o2[idx] = r2
        return o1, o2

    def _fwd(self, lam, phi, z, t):
        from .core import chunk_apply
        if self.spherical:
            x, y = chunk_apply(self._fwd_s, (lam, phi))
        elif self.algo == "exact":
            x, y = chunk_apply(self._fwd_e, (lam, phi))
        elif self.algo == "approx":
            x, y = chunk_apply(self._fwd_a, (lam, phi))
        elif np.ndim(lam) == 0:  # auto, scalar
            far = np.abs(lam) > 3.0 * DEG_TO_RAD
            x, y = (self._fwd_e if far else self._fwd_a)(lam, phi)
        else:  # auto (tmerc.cpp:598-603)
            far = np.abs(lam) > 3.0 * DEG_TO_RAD
            x, y = self._split_apply(self._fwd_e, self._fwd_a, far, lam, phi)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        from .core import chunk_apply
        if self.spherical:
            lam, phi = chunk_apply(self._inv_s, (x, y))
        elif self.algo == "exact":
            lam, phi = chunk_apply(self._inv_e, (x, y))
        elif self.algo == "approx":
            lam, phi = chunk_apply(self._inv_a, (x, y))
        elif np.ndim(x) == 0:  # auto, scalar
            far = np.abs(x) > 0.053 - 0.022 * y * y
            lam, phi = (self._inv_e if far else self._inv_a)(x, y)
        else:  # auto: parabola frontier in dimensionless xy (tmerc.cpp:605-615)
            far = np.abs(x) > 0.053 - 0.022 * y * y
            lam, phi = self._split_apply(self._inv_e, self._inv_a, far, x, y)
        return lam, phi, z, t


@register
class Latlong(Operator):
    """Identity lat/lon 'projection' (reference src/projections/latlong.cpp).
    left = right = radians; a pure no-op in the dataflow."""

    name = "latlong"
    gate_lat0 = False
    aliases = ("longlat", "latlon", "lonlat")
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        # latlong never applies lam0 offset in prepare (PROJ marks it with
        # skip_fwd_prepare for CRS use); mirror by zeroing lam0.
        self._lam0_saved = self.lam0
        self.lam0 = 0.0

    def _fwd(self, lam, phi, z, t):
        return lam, phi, z, t

    def _inv(self, lam, phi, z, t):
        return lam, phi, z, t


@register
class Noop(Operator):
    """+proj=noop (reference src/conversions/noop.cpp:15)."""

    name = "noop"
    gate_lat0 = False
    left = "whatever"
    right = "whatever"

    def _fwd(self, x, y, z, t):
        return x, y, z, t

    def _inv(self, x, y, z, t):
        return x, y, z, t
