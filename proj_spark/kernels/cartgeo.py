"""Conversions: cart, geocent, geoc, axisswap, unitconvert, set.

Vectorized numpy reimplementations of:
- cart geodetic<->geocentric: reference src/conversions/cart.cpp:100-240
- geoc geographic<->geocentric latitude: reference src/conversions/geoc.cpp
- axisswap: reference src/conversions/axisswap.cpp
- unitconvert (linear + time units): reference src/conversions/unitconvert.cpp
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    U_CARTESIAN,
    U_PROJECTED,
    U_RADIANS,
    U_WHATEVER,
)
from .core import HALF_PI, UNITS, DEG_TO_RAD


@register
class Cart(Operator):
    """Geodetic (lam,phi,h) <-> geocentric cartesian (X,Y,Z)
    (reference src/conversions/cart.cpp).

    Forward: closed-form with prime-vertical radius N(phi) (cart.cpp:139-153).
    Inverse: one-shot Bowring-style solution with e'^2 correction and pole
    clamp (cart.cpp:156-220).
    """

    name = "cart"
    gate_lat0 = False
    aliases = ("geocent",)
    left = U_RADIANS
    right = U_CARTESIAN

    def setup(self):
        if self.invoked_name == "geocent":
            # geocent is the CRS-level tag; same math (reference
            # src/conversions/geocent.cpp wraps cart at finalize)
            pass

    def _fwd(self, lam, phi, z, t):
        ell = self.ell
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        if ell.es == 0:
            n = ell.a
        else:
            n = ell.a / np.sqrt(1.0 - ell.es * sinphi * sinphi)
        x = (n + z) * cosphi * np.cos(lam)
        y = (n + z) * cosphi * np.sin(lam)
        zz = (n * (1.0 - ell.es) + z) * sinphi
        return x, y, zz, t

    def _inv(self, x, y, z, t):
        ell = self.ell
        x_a = x * ell.ra
        y_a = y * ell.ra
        z_a = z * ell.ra
        p_a = np.sqrt(x_a * x_a + y_a * y_a)
        b_div_a = 1.0 - ell.f
        p_ba = p_a * b_div_a
        norm = np.sqrt(z_a * z_a + p_ba * p_ba)
        nz = norm != 0
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.where(nz, p_ba / norm, 1.0)
            s = np.where(nz, z_a / norm, 0.0)
        y_phi = z_a + ell.e2s * b_div_a * s * s * s
        x_phi = p_a - ell.es * c * c * c
        norm_phi = np.sqrt(y_phi * y_phi + x_phi * x_phi)
        nzp = norm_phi != 0
        with np.errstate(divide="ignore", invalid="ignore"):
            cosphi = np.where(nzp, x_phi / norm_phi, 1.0)
            sinphi = np.where(nzp, y_phi / norm_phi, 0.0)
            phi = np.arctan(y_phi / x_phi)
        # pole clamp (cart.cpp:213-219)
        at_pole = x_phi <= 0
        phi = np.where(at_pole, np.where(z >= 0, HALF_PI, -HALF_PI), phi)
        cosphi = np.where(at_pole, 0.0, cosphi)
        sinphi = np.where(at_pole, np.where(z >= 0, 1.0, -1.0), sinphi)
        lam = np.arctan2(y_a, x_a)
        # height (cart.cpp:225-235): near the poles use |z| minus geocentric
        # radius; elsewhere h = a*p/a / cosphi - N
        cp2 = cosphi * cosphi
        sp2 = sinphi * sinphi
        ba2 = b_div_a * b_div_a
        ba2sp2 = ba2 * sp2
        with np.errstate(divide="ignore", invalid="ignore"):
            geoc_r = ell.a * np.sqrt((cp2 + ba2 * ba2sp2) / (cp2 + ba2sp2))
            n = ell.a if ell.es == 0 else ell.a / np.sqrt(1.0 - ell.es * sp2)
            h_gen = ell.a * p_a / cosphi - n
        h = np.where(cosphi < 1e-6, np.abs(z) - geoc_r, h_gen)
        return lam, phi, h, t


@register
class Geoc(Operator):
    """Geographic <-> geocentric latitude (reference src/conversions/geoc.cpp,
    src/geocentric_latitude.cpp): tan(theta) = (1-es) * tan(phi)."""

    name = "geoc"
    gate_lat0 = False
    left = U_RADIANS
    right = U_RADIANS

    def _fwd(self, lam, phi, z, t):
        # geographic -> geocentric latitude
        at_pole = np.abs(phi) >= HALF_PI - 1e-15
        theta = np.where(at_pole, phi, np.arctan(self.ell.one_es * np.tan(phi)))
        return lam, theta, z, t

    def _inv(self, lam, theta, z, t):
        at_pole = np.abs(theta) >= HALF_PI - 1e-15
        phi = np.where(at_pole, theta, np.arctan(np.tan(theta) / self.ell.one_es))
        return lam, phi, z, t


@register
class Axisswap(Operator):
    """Reorder / sign-flip axes, +order=2,1[,3,4] (+an optional global
    negation via repeated minus signs) — reference src/conversions/axisswap.cpp.

    Pure column permutation: in the Spark plan this is expressed as a
    ``select`` reorder and never costs a UDF; the kernel here exists for
    pipeline composition and gie parity.
    """

    name = "axisswap"
    gate_lat0 = False
    left = U_WHATEVER
    right = U_WHATEVER

    # classic enu axis spec (reference axisswap.cpp:189-225)
    _AXIS_CHARS = {"e": (0, 1.0), "w": (0, -1.0), "n": (1, 1.0),
                   "s": (1, -1.0), "u": (2, 1.0), "d": (2, -1.0)}

    def setup(self):
        if ("order" in self.params) == ("axis" in self.params):
            raise ValueError(
                "axisswap needs EITHER +order OR +axis (axisswap.cpp:145)")
        if "axis" in self.params:
            spec = str(self.params["axis"])
            if len(spec) != 3 or any(c not in self._AXIS_CHARS for c in spec):
                raise ValueError(f"invalid axis spec {spec!r}")
            axis = [self._AXIS_CHARS[c][0] for c in spec] + [3]
            sign = [self._AXIS_CHARS[c][1] for c in spec] + [1.0]
            if sorted(axis) != [0, 1, 2, 3]:
                raise ValueError("axisswap axis must not repeat")
            self.axis = axis
            self.sign = sign
            return
        order = str(self.params.get("order", "1,2,3,4"))
        toks = [s.strip() for s in order.split(",") if s.strip()]
        axis = []
        sign = []
        for s in toks:
            neg = s.startswith("-")
            i = int(s.lstrip("+-"))
            if not 1 <= i <= 4:
                raise ValueError("axisswap axis out of range")
            axis.append(i - 1)
            sign.append(-1.0 if neg else 1.0)
        # unspecified trailing axes stay identity
        for i in range(len(axis), 4):
            axis.append(i)
            sign.append(1.0)
        if sorted(axis) != [0, 1, 2, 3]:
            raise ValueError("axisswap order must be a permutation")
        self.axis = axis
        self.sign = sign

    def _fwd(self, x, y, z, t):
        v = [x, y, z, t]
        out = [v[self.axis[i]] * self.sign[i] for i in range(4)]
        return out[0], out[1], out[2], out[3]

    def _inv(self, x, y, z, t):
        v = [x, y, z, t]
        out = [None] * 4
        for i in range(4):
            out[self.axis[i]] = v[i] * self.sign[i]
        return out[0], out[1], out[2], out[3]


# ---------------------------------------------------------------------------
# unitconvert
# ---------------------------------------------------------------------------

def _leaps_before(year):
    """Number of leap years in [1, year] (Gregorian)."""
    y = np.asarray(year, dtype=np.int64)
    return y // 4 - y // 100 + y // 400


def _days_in_year(year):
    y = np.asarray(year, dtype=np.int64)
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return np.where(leap, 366, 365)


def decimalyear_to_mjd(dy):
    """Decimal year -> modified Julian date (epoch 1858-11-16 per the
    reference's convention, src/conversions/unitconvert.cpp:159-182)."""
    dy = np.asarray(dy, dtype=np.float64)
    valid = (dy >= -10000) & (dy <= 10000)
    dy_safe = np.where(valid, dy, 2000.0)
    year = np.floor(dy_safe).astype(np.int64)
    frac = dy_safe - year
    mjd = (year - 1859) * 365.0 + 14.0 + 31.0
    mjd = mjd + frac * _days_in_year(year)
    # leap days for years (1858, year-1]
    mjd = mjd + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64)
    return np.where(valid, mjd, 0.0)


def mjd_to_decimalyear(mjd):
    """Inverse of decimalyear_to_mjd (reference unitconvert.cpp:185-205)."""
    mjd = np.asarray(mjd, dtype=np.float64)
    # initial guess, then correct: days since 1859-01-01 = mjd - 45
    year = (1859 + (mjd - 45.0) / 365.2425).astype(np.int64)
    for _ in range(3):
        start = ((year - 1859) * 365.0 + 45.0
                 + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64))
        diy = _days_in_year(year).astype(np.float64)
        year = np.where(mjd < start, year - 1, np.where(mjd >= start + diy, year + 1, year))
    start = ((year - 1859) * 365.0 + 45.0
             + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64))
    return year + (mjd - start) / _days_in_year(year)


def gps_week_to_mjd(w):
    return 44244.0 + np.asarray(w, dtype=np.float64) * 7.0


def mjd_to_gps_week(mjd):
    return (np.asarray(mjd, dtype=np.float64) - 44244.0) / 7.0


def yyyymmdd_to_mjd(v):
    v = np.asarray(v, dtype=np.float64)
    year = np.floor(v / 10000.0).astype(np.int64)
    month = np.floor((v - year * 10000.0) / 100.0).astype(np.int64)
    day = np.floor(v - year * 10000.0 - month * 100.0)
    month = np.clip(month, 1, 12)
    cum = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334], dtype=np.float64)
    leap = (((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)) & (month > 2)
    doy = cum[month - 1] + day + leap.astype(np.float64)
    prior = ((year - 1859) * 365.0
             + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64))
    return prior + doy + 13.0 + 31.0


def mjd_to_yyyymmdd(mjd):
    mjd = np.asarray(mjd, dtype=np.float64)
    date = np.rint(mjd)
    year = (1859 + (date - 45.0) / 365.2425).astype(np.int64)
    for _ in range(3):
        start = ((year - 1859) * 365.0 + 45.0
                 + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64))
        diy = _days_in_year(year).astype(np.float64)
        year = np.where(date < start, year - 1, np.where(date >= start + diy, year + 1, year))
    start = ((year - 1859) * 365.0 + 45.0
             + (_leaps_before(year - 1) - _leaps_before(1858)).astype(np.float64))
    doy = date - start  # 0-based day of year
    cum = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 366], dtype=np.float64)
    leap = ((year % 4 == 0) & (year % 100 != 0)) | (year % 400 == 0)
    month = np.ones(date.shape, dtype=np.int64)
    for m in range(2, 13):
        edge = cum[m - 1] + ((m > 2) & leap).astype(np.float64)
        month = np.where(doy >= edge, m, month)
    edge = cum[month - 1] + ((month > 2) & leap).astype(np.float64)
    day = doy - edge + 1
    return year * 10000.0 + month * 100.0 + day


_TIME_IN = {
    "mjd": lambda v: np.asarray(v, dtype=np.float64),
    "decimalyear": decimalyear_to_mjd,
    "gps_week": gps_week_to_mjd,
    "yyyymmdd": yyyymmdd_to_mjd,
}
_TIME_OUT = {
    "mjd": lambda v: np.asarray(v, dtype=np.float64),
    "decimalyear": mjd_to_decimalyear,
    "gps_week": mjd_to_gps_week,
    "yyyymmdd": mjd_to_yyyymmdd,
}

_ANGULAR_UNITS = {"rad": 1.0, "deg": DEG_TO_RAD, "grad": np.pi / 200.0}


def _unit_factor(name: str) -> float:
    if name in UNITS:
        return UNITS[name]
    if name in _ANGULAR_UNITS:
        return _ANGULAR_UNITS[name]
    return float(name)  # numeric factor


@register
class Unitconvert(Operator):
    """Linear / angular / temporal unit conversion
    (reference src/conversions/unitconvert.cpp:279-407)."""

    name = "unitconvert"
    gate_lat0 = False
    left = U_WHATEVER
    right = U_WHATEVER

    # unitconvert bypasses the angular prepare/finalize machinery
    # (reference unitconvert.cpp:436-437 skip_fwd/inv_prepare)
    skip_prepare = True

    @staticmethod
    def _linearness(name: str):
        """True linear / False angular / None unknown numeric factor."""
        if name in UNITS:
            return True
        if name in _ANGULAR_UNITS:
            return False
        return None

    def setup(self):
        p = self.params
        xy_in_name = str(p.get("xy_in", "1"))
        xy_out_name = str(p.get("xy_out", "1"))
        z_in_name = str(p.get("z_in", "1"))
        z_out_name = str(p.get("z_out", "1"))
        for pair in ((xy_in_name, xy_out_name), (z_in_name, z_out_name)):
            lin = [self._linearness(n) for n in pair if n != "1"]
            lin = [v for v in lin if v is not None]
            if len(set(lin)) > 1:
                raise ValueError(
                    "unitconvert: cannot mix linear and angular units "
                    "(unitconvert.cpp unit-type check)")
        xy_in = _unit_factor(xy_in_name)
        xy_out = _unit_factor(xy_out_name)
        z_in = _unit_factor(z_in_name)
        z_out = _unit_factor(z_out_name)
        # numeric factors must be normal positive numbers
        # (unitconvert.cpp get_unit_conversion_factor: 0 / inf rejected)
        for nm, v in (("xy_in", xy_in), ("xy_out", xy_out),
                      ("z_in", z_in), ("z_out", z_out)):
            if v == 0 or not np.isfinite(v):
                from ..errors import illegal_arg
                illegal_arg(f"unitconvert: invalid value for {nm}")
        self.xy_factor = xy_in / xy_out
        self.z_factor = z_in / z_out
        # io-unit tags for angular xy units (unitconvert.cpp:455-459,476-480)
        from ..ops import U_RADIANS, U_DEGREES
        if xy_in_name == "rad":
            self.left = U_RADIANS
        elif xy_in_name == "deg":
            self.left = U_DEGREES
        if xy_out_name == "rad":
            self.right = U_RADIANS
        elif xy_out_name == "deg":
            self.right = U_DEGREES
        self.t_in = p.get("t_in")
        self.t_out = p.get("t_out")
        if self.t_in is not None and self.t_in not in _TIME_IN:
            raise ValueError(f"unknown t_in unit {self.t_in}")
        if self.t_out is not None and self.t_out not in _TIME_OUT:
            raise ValueError(f"unknown t_out unit {self.t_out}")

    def _fwd(self, x, y, z, t):
        x = x * self.xy_factor
        y = y * self.xy_factor
        z = z * self.z_factor
        if self.t_in is not None:
            t = _TIME_IN[self.t_in](t)
        if self.t_out is not None:
            t = _TIME_OUT[self.t_out](t)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        x = x / self.xy_factor
        y = y / self.xy_factor
        z = z / self.z_factor
        if self.t_out is not None:
            t = _TIME_IN[self.t_out](t)
        if self.t_in is not None:
            t = _TIME_OUT[self.t_in](t)
        return x, y, z, t


@register
class SetOp(Operator):
    """+proj=set +v_1=... overwrite selected components
    (reference src/conversions/set.cpp:69)."""

    name = "set"
    gate_lat0 = False
    left = U_WHATEVER
    right = U_WHATEVER

    def setup(self):
        self.values = {}
        for i, key in ((0, "v_1"), (1, "v_2"), (2, "v_3"), (3, "v_4")):
            if key in self.params:
                self.values[i] = float(self.params[key])

    def _apply_set(self, x, y, z, t):
        v = [x, y, z, t]
        for i, val in self.values.items():
            v[i] = np.full_like(v[i], val)
        return v[0], v[1], v[2], v[3]

    def _fwd(self, x, y, z, t):
        return self._apply_set(x, y, z, t)

    def _inv(self, x, y, z, t):
        return self._apply_set(x, y, z, t)
