"""Datum transformations: helmert/molobadekas, molodensky, affine, geogoffset.

Vectorized numpy reimplementations of:
- helmert (3/4/7/14-param, kinematic): reference
  src/transformations/helmert.cpp:102-760
- molodensky (standard + abridged): reference
  src/transformations/molodensky.cpp:85-210
- affine / geogoffset: reference src/transformations/affine.cpp
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    U_CARTESIAN,
    U_PROJECTED,
    U_RADIANS,
)
from .core import DEG_TO_RAD

ARCSEC_TO_RAD = DEG_TO_RAD / 3600.0


def _rot_matrix(o, p, k, exact: bool, position_vector: bool) -> np.ndarray:
    """Build the 3x3 rotation matrix (reference helmert.cpp:161-321).
    Coordinate-frame convention natively; position_vector = transpose."""
    if exact:
        cf, sf = np.cos(o), np.sin(o)
        ct, st = np.cos(p), np.sin(p)
        cp, sp = np.cos(k), np.sin(k)
        r = np.array([
            [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
            [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
            [st, -sf * ct, cf * ct],
        ])
    else:
        # small-angle approximation (the historical default)
        r = np.array([
            [1.0, k, -p],
            [-k, 1.0, o],
            [p, -o, 1.0],
        ])
    if position_vector:
        r = r.T
    return r


@register
class Helmert(Operator):
    """3/4/7/14-parameter similarity transform on geocentric coordinates
    (reference src/transformations/helmert.cpp).

    Kinematic (14-param) evaluation recomputes P(t) per *unique epoch* in the
    batch (the reference re-derives parameters per distinct t,
    helmert.cpp:438-455; we group identical epochs instead of per-row
    branching — SURVEY.md §7.3.6)."""

    name = "helmert"
    gate_lat0 = False
    aliases = ("molobadekas",)
    left = U_CARTESIAN
    right = U_CARTESIAN

    def setup(self):
        p = self.params
        g = lambda k, d=0.0: float(p.get(k, d))
        self.x = g("x")
        self.y = g("y")
        self.z = g("z")
        self.rx = g("rx") * ARCSEC_TO_RAD
        self.ry = g("ry") * ARCSEC_TO_RAD
        self.rz = g("rz") * ARCSEC_TO_RAD
        self.s = g("s")  # ppm
        self.exact = "exact" in p
        self.theta = None
        if "theta" in p:
            self.theta = g("theta") * ARCSEC_TO_RAD
            if "s" not in p:
                self.s = 1.0  # default full-scale for 4-param (helmert.cpp:606-609)
            self.left = U_PROJECTED
            self.right = U_PROJECTED
        # rates
        self.dx = g("dx")
        self.dy = g("dy")
        self.dz = g("dz")
        self.drx = g("drx") * ARCSEC_TO_RAD
        self.dry = g("dry") * ARCSEC_TO_RAD
        self.drz = g("drz") * ARCSEC_TO_RAD
        self.ds = g("ds")
        self.dtheta = g("dtheta") * ARCSEC_TO_RAD
        self.t_epoch = g("t_epoch")
        self.kinematic = any(v != 0.0 for v in (
            self.dx, self.dy, self.dz, self.drx, self.dry, self.drz,
            self.ds, self.dtheta))
        self.no_rotation = all(v == 0.0 for v in (
            self.rx, self.ry, self.rz, self.drx, self.dry, self.drz))
        from ..errors import illegal_arg, missing_arg
        # reference helmert.cpp:580-584: obsolete +transpose errors out
        if "transpose" in p:
            illegal_arg("helmert: 'transpose' argument is no longer valid")
        conv = p.get("convention")
        # towgs84 rotations historically use position_vector; accepting
        # coordinate_frame would be confusing (helmert.cpp:540-549)
        if "towgs84" in p and conv is not None and conv != "position_vector":
            illegal_arg("helmert: towgs84 should only be used with "
                        "convention=position_vector")
        if not self.no_rotation:
            # reference read_convention (helmert.cpp:517-549)
            if conv is None:
                missing_arg("helmert: missing 'convention' argument")
            if conv not in ("position_vector", "coordinate_frame"):
                illegal_arg("helmert: invalid value for 'convention'")
        self.position_vector = conv == "position_vector"
        # Molodensky-Badekas reference point folded into translations
        # (reference helmert.cpp:744-752)
        self.refp = np.zeros(3)
        if self.invoked_name == "molobadekas":
            for k in ("px", "py", "pz"):
                if k not in p:
                    missing_arg(f"molobadekas: missing '{k}' argument")
            self.refp = np.array([g("px"), g("py"), g("pz")])
            self.x += self.refp[0]
            self.y += self.refp[1]
            self.z += self.refp[2]

    def _params_at(self, dt: float):
        return (
            np.array([self.x + self.dx * dt,
                      self.y + self.dy * dt,
                      self.z + self.dz * dt]),
            (self.rx + self.drx * dt, self.ry + self.dry * dt, self.rz + self.drz * dt),
            self.s + self.ds * dt,
            self.theta + self.dtheta * dt if self.theta is not None else None,
        )

    def _apply(self, x, y, z, t, forward: bool):
        if not self.kinematic:
            return self._apply_epoch(x, y, z, 0.0, forward)
        # per-unique-epoch evaluation; missing t (NaN) uses t_epoch
        t_eff = np.where(np.isnan(t), self.t_epoch, t)
        out_x = np.empty_like(x)
        out_y = np.empty_like(y)
        out_z = np.empty_like(z)
        for t_obs in np.unique(t_eff):
            m = t_eff == t_obs
            dt = t_obs - self.t_epoch
            ox, oy, oz = self._apply_epoch(x[m], y[m], z[m], dt, forward)
            out_x[m] = ox
            out_y[m] = oy
            out_z[m] = oz
        return out_x, out_y, out_z

    def _apply_epoch(self, x, y, z, dt, forward: bool):
        xyz0, (o, p_, k), s_ppm, theta = self._params_at(dt)
        if theta is not None:
            # 4-parameter planar shift (helmert.cpp:326-358)
            scale = s_ppm
            if forward:
                cr = np.cos(theta) * scale
                sr = np.sin(theta) * scale
                return cr * x + sr * y + xyz0[0], -sr * x + cr * y + xyz0[1], z
            cr = np.cos(theta) / scale
            sr = np.sin(theta) / scale
            xx = x - xyz0[0]
            yy = y - xyz0[1]
            return xx * cr - yy * sr, xx * sr + yy * cr, z
        if self.no_rotation and s_ppm == 0.0:
            if forward:
                return x + xyz0[0], y + xyz0[1], z + xyz0[2]
            return x - xyz0[0], y - xyz0[1], z - xyz0[2]
        r = _rot_matrix(o, p_, k, self.exact, self.position_vector)
        scale = 1.0 + s_ppm * 1e-6
        if forward:
            xx = x - self.refp[0]
            yy = y - self.refp[1]
            zz = z - self.refp[2]
            return (
                scale * (r[0, 0] * xx + r[0, 1] * yy + r[0, 2] * zz) + xyz0[0],
                scale * (r[1, 0] * xx + r[1, 1] * yy + r[1, 2] * zz) + xyz0[1],
                scale * (r[2, 0] * xx + r[2, 1] * yy + r[2, 2] * zz) + xyz0[2],
            )
        xx = (x - xyz0[0]) / scale
        yy = (y - xyz0[1]) / scale
        zz = (z - xyz0[2]) / scale
        return (
            r[0, 0] * xx + r[1, 0] * yy + r[2, 0] * zz + self.refp[0],
            r[0, 1] * xx + r[1, 1] * yy + r[2, 1] * zz + self.refp[1],
            r[0, 2] * xx + r[1, 2] * yy + r[2, 2] * zz + self.refp[2],
        )

    def _fwd(self, x, y, z, t):
        ox, oy, oz = self._apply(x, y, z, t, True)
        return ox, oy, oz, t

    def _inv(self, x, y, z, t):
        ox, oy, oz = self._apply(x, y, z, t, False)
        return ox, oy, oz, t


@register
class Molodensky(Operator):
    """Classic & abridged Molodensky datum shift
    (reference src/transformations/molodensky.cpp)."""

    name = "molodensky"
    gate_lat0 = False
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        from ..errors import missing_arg
        p = self.params
        # all five shift params are required (molodensky.cpp:321-350)
        for k in ("dx", "dy", "dz", "da", "df"):
            if k not in p:
                missing_arg(f"molodensky: missing {k}")
        self.dx = float(p["dx"])
        self.dy = float(p["dy"])
        self.dz = float(p["dz"])
        self.da = float(p["da"])
        self.df = float(p["df"])
        self.abridged = "abridged" in p

    @staticmethod
    def _rm(a, es, phi):
        """Meridional radius of curvature (molodensky.cpp RM)."""
        s = np.sin(phi)
        if es == 0:
            return np.full_like(phi, a)
        return np.where(
            phi == 0.0, a * (1 - es),
            np.where(np.abs(phi) == np.pi / 2, a / np.sqrt(1 - es),
                     a * (1 - es) / (1 - es * s * s) ** 1.5))

    @staticmethod
    def _rn(a, es, phi):
        """Normal radius of curvature."""
        s = np.sin(phi)
        if es == 0:
            return np.full_like(phi, a)
        return np.where(np.abs(phi) == np.pi / 2, a / np.sqrt(1 - es),
                        a / np.sqrt(1 - es * s * s))

    def _deltas(self, lam, phi, z, sign):
        ell = self.ell
        slam = np.sin(lam)
        clam = np.cos(lam)
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        dx, dy, dz = sign * self.dx, sign * self.dy, sign * self.dz
        da, df = sign * self.da, sign * self.df
        rho = self._rm(ell.a, ell.es, phi)
        nu = self._rn(ell.a, ell.es, phi)
        if self.abridged:
            adffda = ell.a * df + ell.f * da
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + adffda * np.sin(2 * phi)) / rho
            denom = nu * cphi
            dlam = np.where(denom == 0, np.nan, (-dx * slam + dy * clam) / denom)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi - da
                  + adffda * sphi * sphi)
        else:
            dphi = (-dx * sphi * clam - dy * sphi * slam + dz * cphi
                    + (nu * ell.es * sphi * cphi * da) / ell.a
                    + sphi * cphi * (rho / (1 - ell.f) + nu * (1 - ell.f)) * df)
            denom_phi = rho + z
            dphi = np.where(denom_phi == 0, np.nan, dphi / denom_phi)
            denom = (nu + z) * cphi
            dlam = np.where(denom == 0, np.nan, (-dx * slam + dy * clam) / denom)
            dh = (dx * cphi * clam + dy * cphi * slam + dz * sphi
                  - (ell.a / nu) * da + nu * (1 - ell.f) * sphi * sphi * df)
        return dlam, dphi, dh

    def _fwd(self, lam, phi, z, t):
        dlam, dphi, dh = self._deltas(lam, phi, z, 1.0)
        return lam + dlam, phi + dphi, z + dh, t

    def _inv(self, lam, phi, z, t):
        dlam, dphi, dh = self._deltas(lam, phi, z, -1.0)
        return lam + dlam, phi + dphi, z + dh, t


@register
class GeogOffset(Operator):
    """Simple angular/vertical offsets (reference
    src/transformations/affine.cpp geogoffset): dlon/dlat arcsec, dh metres."""

    name = "geogoffset"
    gate_lat0 = False
    left = U_RADIANS
    right = U_RADIANS

    def setup(self):
        p = self.params
        self.dlon = float(p.get("dlon", 0.0)) * ARCSEC_TO_RAD
        self.dlat = float(p.get("dlat", 0.0)) * ARCSEC_TO_RAD
        self.dh = float(p.get("dh", 0.0))

    def _fwd(self, lam, phi, z, t):
        return lam + self.dlon, phi + self.dlat, z + self.dh, t

    def _inv(self, lam, phi, z, t):
        return lam - self.dlon, phi - self.dlat, z - self.dh, t


@register
class Affine(Operator):
    """4x4-ish affine transform (reference src/transformations/affine.cpp):
    out = [xoff,yoff,zoff] + S * [x,y,z] with a 3x3 matrix s11..s33."""

    name = "affine"
    gate_lat0 = False
    left = "whatever"
    right = "whatever"

    def setup(self):
        p = self.params
        g = lambda k, d: float(p.get(k, d))
        self.xoff = g("xoff", 0.0)
        self.yoff = g("yoff", 0.0)
        self.zoff = g("zoff", 0.0)
        self.toff = g("toff", 0.0)
        self.m = np.array([
            [g("s11", 1.0), g("s12", 0.0), g("s13", 0.0)],
            [g("s21", 0.0), g("s22", 1.0), g("s23", 0.0)],
            [g("s31", 0.0), g("s32", 0.0), g("s33", 1.0)],
        ])
        self.tscale = g("tscale", 1.0)
        det = np.linalg.det(self.m)
        self.minv = np.linalg.inv(self.m) if det != 0 else None
        # errno-parity flag (errors.classify_failure): a singular matrix
        # or tscale=0 has NO inverse (reference affine.cpp inverse guards
        # -> PROJ_ERR_OTHER_NO_INVERSE_OP)
        self.inverse_invalid = self.minv is None or self.tscale == 0.0

    def _fwd(self, x, y, z, t):
        m = self.m
        ox = self.xoff + m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
        oy = self.yoff + m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
        oz = self.zoff + m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
        ot = self.toff + self.tscale * t
        return ox, oy, oz, ot

    def _inv(self, x, y, z, t):
        if self.minv is None or self.tscale == 0.0:
            # non-invertible matrix or tscale=0 (reference affine.cpp inverse
            # guards) -> poison
            nan = np.full_like(x, np.nan)
            return nan, nan.copy(), nan.copy(), nan.copy()
        m = self.minv
        xx = x - self.xoff
        yy = y - self.yoff
        zz = z - self.zoff
        ox = m[0, 0] * xx + m[0, 1] * yy + m[0, 2] * zz
        oy = m[1, 0] * xx + m[1, 1] * yy + m[1, 2] * zz
        oz = m[2, 0] * xx + m[2, 1] * yy + m[2, 2] * zz
        ot = (t - self.toff) / self.tscale
        return ox, oy, oz, ot
