"""Discrete-global-grid cube projections: S2 and QSC.

Vectorized numpy reimplementations of:
- s2:  src/projections/s2.cpp (STtoUV/UVtoST profiles :126-166, face axes
  :168-217, face-from-center selection :436-447, ellipsoid<->sphere shift
  [LK12] :338-344,390-403)
- qsc: src/projections/qsc.cpp (O'Neill/Laubscher quadrilateralized
  spherical cube; per-face area decomposition AREA_0..3 :74-105, fwd
  :117-235, inv :237-375)

Face/ST plumbing for *cell ids* (Hilbert order) lives in s2cell.py; these
operators are the proj-string-facing projection surface.
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC, U_PROJECTED
from .core import FORT_PI, HALF_PI

_EPS10 = 1e-10

# faces (s2.cpp:55-62 / qsc.cpp:50-59): front right back left top bottom
F_FRONT, F_RIGHT, F_BACK, F_LEFT, F_TOP, F_BOTTOM = range(6)


def _face_from_center(phi0: float, lam0: float) -> int:
    """Cube face from the projection center (s2.cpp:436-447, identical in
    qsc.cpp:379-390)."""
    if phi0 >= HALF_PI - FORT_PI / 2.0:
        return F_TOP
    if phi0 <= -(HALF_PI - FORT_PI / 2.0):
        return F_BOTTOM
    if abs(lam0) <= FORT_PI:
        return F_FRONT
    if abs(lam0) <= HALF_PI + FORT_PI:
        return F_RIGHT if lam0 > 0.0 else F_LEFT
    return F_BACK


def _geodetic_to_geocentric_lat(phi, one_minus_f_squared):
    return np.arctan(one_minus_f_squared * np.tan(phi))


def _geocentric_to_geodetic_lat(phi, ell):
    """Sphere -> ellipsoid shift (s2.cpp:390-403 / qsc.cpp:364-374)."""
    one_minus_f = 1.0 - (ell.a - ell.b) / ell.a
    omf2 = one_minus_f * one_minus_f
    tanphi = np.tan(phi)
    xa = ell.b / np.sqrt(tanphi * tanphi + omf2)
    out = np.arctan(np.sqrt(ell.a * ell.a - xa * xa) / (one_minus_f * xa))
    return np.where(phi < 0.0, -out, out)


@register
class S2(Operator):
    """S2 cube-face projection (reference s2.cpp).

    ``+UVtoST=linear|quadratic|tangent|none`` selects the cell profile
    (s2.cpp:126-166); quadratic is the default. The reference sets
    ``from_greenwich = -lam0`` (s2.cpp:431) so the kernel sees the ABSOLUTE
    longitude — lam0 only selects the face.
    """

    name = "s2"
    left = U_RADIANS
    right = U_PROJECTED

    def setup(self):
        profile = str(self.params.get("UVtoST", "quadratic"))
        if profile not in ("linear", "quadratic", "tangent", "none"):
            from ..errors import ProjError, INVALID_OP_ILLEGAL_ARG_VALUE
            raise ProjError("s2 +UVtoST must be linear|quadratic|tangent|none",
                            INVALID_OP_ILLEGAL_ARG_VALUE)
        self.profile = profile
        self.face = _face_from_center(self.phi0, self.lam0)
        # cancel the generic central-meridian subtraction (from_greenwich
        # = -lam0 in the reference): kernel works in absolute longitude
        self._face_lam0 = self.lam0
        self.lam0 = 0.0
        self.omf = 1.0 - (self.ell.a - self.ell.b) / self.ell.a
        self.omf2 = self.omf * self.omf

    # ST <-> UV profiles (s2.cpp:126-166)
    def _uv_to_st(self, u):
        if self.profile == "linear":
            return 0.5 * (u + 1.0)
        if self.profile == "quadratic":
            return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u),
                            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))
        if self.profile == "tangent":
            return (2.0 / np.pi) * (np.arctan(u) + FORT_PI)
        return u

    def _st_to_uv(self, s):
        if self.profile == "linear":
            return 2.0 * s - 1.0
        if self.profile == "quadratic":
            return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0),
                            (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))
        if self.profile == "tangent":
            s = np.tan(HALF_PI * s - FORT_PI)
            return s + (1.0 / 9007199254740992.0) * s  # 2^53 nudge (s2.cpp:141-143)
        return s

    def _fwd(self, lam, phi, z, t):
        if self.ell.es != 0.0:
            lat = _geodetic_to_geocentric_lat(phi, self.omf2)
        else:
            lat = phi
        coslat = np.cos(lat)
        x = coslat * np.cos(lam)
        y = coslat * np.sin(lam)
        zz = np.sin(lat)
        # ValidFaceXYZtoUV with the FIXED face (s2.cpp:189-217; NB the s2
        # face order is s2geometry's front,right,top,back,left,bottom =
        # +x,+y,+z,-x,-y,-z — different from qsc's enum)
        f = self.face
        with np.errstate(divide="ignore", invalid="ignore"):
            if f == F_FRONT:
                u, v = y / x, zz / x
            elif f == F_RIGHT:
                u, v = -x / y, zz / y
            elif f == F_TOP:
                u, v = -x / zz, -y / zz
            elif f == F_BACK:
                u, v = zz / x, y / x
            elif f == F_LEFT:
                u, v = zz / y, -x / y
            else:  # F_BOTTOM
                u, v = -y / zz, -x / zz
        return self._uv_to_st(u), self._uv_to_st(v), z, t

    def _inv(self, s, tt, z, t):
        u = self._st_to_uv(s)
        v = self._st_to_uv(tt)
        # UVtoSphereXYZ (s2.cpp:290-330)
        major = 1.0 / np.sqrt(1.0 + u * u + v * v)
        m1 = u * major
        m2 = v * major
        f = self.face
        if f == F_FRONT:
            q, r, sz = major, m1, m2
        elif f == F_RIGHT:
            q, r, sz = -m1, major, m2
        elif f == F_TOP:
            q, r, sz = -m1, -m2, major
        elif f == F_BACK:
            q, r, sz = -major, -m2, -m1
        elif f == F_LEFT:
            q, r, sz = m2, -major, -m1
        else:  # F_BOTTOM
            q, r, sz = m2, m1, -major
        phi = np.arccos(-sz) - HALF_PI
        lam = np.arctan2(r, q)
        if self.ell.es != 0.0:
            phi = _geocentric_to_geodetic_lat(phi, self.ell)
        return lam, phi, z, t


def _shift_lon(lon, offset):
    """qsc_shift_longitude_origin (qsc.cpp:108-116)."""
    s = lon + offset
    s = np.where(s < -np.pi, s + 2.0 * np.pi, s)
    return np.where(s > np.pi, s - 2.0 * np.pi, s)


def _equat_face_theta(phi, y, x):
    """Theta + area on an equatorial face (qsc.cpp:81-105).
    Returns (theta, area)."""
    theta0 = np.arctan2(y, x)
    a0 = np.abs(theta0) <= FORT_PI
    a1 = (theta0 > FORT_PI) & (theta0 <= HALF_PI + FORT_PI)
    a2 = (theta0 > HALF_PI + FORT_PI) | (theta0 <= -(HALF_PI + FORT_PI))
    theta = np.select(
        [a0, a1, a2],
        [theta0, theta0 - HALF_PI,
         np.where(theta0 >= 0.0, theta0 - np.pi, theta0 + np.pi)],
        default=theta0 + HALF_PI)
    area = np.select([a0, a1, a2], [0, 1, 2], default=3)
    small = phi < _EPS10
    return np.where(small, 0.0, theta), np.where(small, 0, area)


@register
class Qsc(Operator):
    """Quadrilateralized Spherical Cube (reference qsc.cpp)."""

    name = "qsc"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        self.face = _face_from_center(self.phi0, self.lam0)
        b = self.ell.a * np.sqrt(1.0 - self.ell.es)
        self.omf = 1.0 - (self.ell.a - b) / self.ell.a
        self.omf2 = self.omf * self.omf

    def _fwd(self, lam, phi_in, z, t):
        if self.ell.es != 0.0:
            lat = _geodetic_to_geocentric_lat(phi_in, self.omf2)
        else:
            lat = phi_in
        lon = lam
        f = self.face
        if f == F_TOP:
            phi = HALF_PI - lat
            c0 = (lon >= FORT_PI) & (lon <= HALF_PI + FORT_PI)
            c1 = (lon > HALF_PI + FORT_PI) | (lon <= -(HALF_PI + FORT_PI))
            c2 = (lon > -(HALF_PI + FORT_PI)) & (lon <= -FORT_PI)
            theta = np.select(
                [c0, c1, c2],
                [lon - HALF_PI, np.where(lon > 0.0, lon - np.pi, lon + np.pi),
                 lon + HALF_PI], default=lon)
            area = np.select([c0, c1, c2], [0, 1, 2], default=3)
        elif f == F_BOTTOM:
            phi = HALF_PI + lat
            c0 = (lon >= FORT_PI) & (lon <= HALF_PI + FORT_PI)
            c1 = (lon < FORT_PI) & (lon >= -FORT_PI)
            c2 = (lon < -FORT_PI) & (lon >= -(HALF_PI + FORT_PI))
            theta = np.select(
                [c0, c1, c2],
                [-lon + HALF_PI, -lon, -lon - HALF_PI],
                default=np.where(lon > 0.0, -lon + np.pi, -lon - np.pi))
            area = np.select([c0, c1, c2], [0, 1, 2], default=3)
        else:
            if f == F_RIGHT:
                lon = _shift_lon(lon, HALF_PI)
            elif f == F_BACK:
                lon = _shift_lon(lon, np.pi)
            elif f == F_LEFT:
                lon = _shift_lon(lon, -HALF_PI)
            coslat = np.cos(lat)
            q = coslat * np.cos(lon)
            r = coslat * np.sin(lon)
            s = np.sin(lat)
            if f == F_FRONT:
                phi = np.arccos(np.clip(q, -1.0, 1.0))
                theta, area = _equat_face_theta(phi, s, r)
            elif f == F_RIGHT:
                phi = np.arccos(np.clip(r, -1.0, 1.0))
                theta, area = _equat_face_theta(phi, s, -q)
            elif f == F_BACK:
                phi = np.arccos(np.clip(-q, -1.0, 1.0))
                theta, area = _equat_face_theta(phi, s, -r)
            else:  # F_LEFT
                phi = np.arccos(np.clip(-r, -1.0, 1.0))
                theta, area = _equat_face_theta(phi, s, q)

        # mu/t for AREA_0 (qsc.cpp:216-221; [OL76] Eq. 3-21 / 3-38)
        mu = np.arctan((12.0 / np.pi) *
                       (theta + np.arccos(np.sin(theta) * np.cos(FORT_PI))
                        - HALF_PI))
        with np.errstate(invalid="ignore", divide="ignore"):
            tt = np.sqrt((1.0 - np.cos(phi)) / (np.cos(mu) ** 2) /
                         (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))))
        mu = mu + np.select([area == 1, area == 2, area == 3],
                            [HALF_PI, np.pi, np.pi + HALF_PI], default=0.0)
        return tt * np.cos(mu), tt * np.sin(mu), z, t

    def _inv(self, x, y, z, t):
        nu = np.arctan(np.sqrt(x * x + y * y))
        mu0 = np.arctan2(y, x)
        a0 = (x >= 0.0) & (x >= np.abs(y))
        a1 = (y >= 0.0) & (y >= np.abs(x))
        a2 = (x < 0.0) & (-x >= np.abs(y))
        mu = np.select(
            [a0, a1, a2],
            [mu0, mu0 - HALF_PI, np.where(mu0 < 0.0, mu0 + np.pi, mu0 - np.pi)],
            default=mu0 + HALF_PI)
        area = np.select([a0, a1, a2], [0, 1, 2], default=3)

        tq = (np.pi / 12.0) * np.tan(mu)
        tantheta = np.sin(tq) / (np.cos(tq) - 1.0 / np.sqrt(2.0))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = np.clip(
            1.0 - cosmu * cosmu * tannu * tannu *
            (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), -1.0, 1.0)

        f = self.face
        if f == F_TOP:
            phi = np.arccos(cosphi)
            out_phi = HALF_PI - phi
            out_lam = np.select(
                [area == 0, area == 1, area == 2],
                [theta + HALF_PI,
                 np.where(theta < 0.0, theta + np.pi, theta - np.pi),
                 theta - HALF_PI], default=theta)
        elif f == F_BOTTOM:
            phi = np.arccos(cosphi)
            out_phi = phi - HALF_PI
            out_lam = np.select(
                [area == 0, area == 1, area == 2],
                [-theta + HALF_PI, -theta, -theta - HALF_PI],
                default=np.where(theta < 0.0, -theta - np.pi, -theta + np.pi))
        else:
            # via unit-sphere coordinates (qsc.cpp:312-360)
            q = cosphi
            tsq = q * q
            s = np.where(tsq >= 1.0, 0.0, np.sqrt(np.clip(1.0 - tsq, 0.0, None))
                         * np.sin(theta))
            tsq = tsq + s * s
            r = np.where(tsq >= 1.0, 0.0, np.sqrt(np.clip(1.0 - tsq, 0.0, None)))
            # rotate into the correct area
            r, s = (np.select([area == 1, area == 2, area == 3],
                              [-s, -r, s], default=r),
                    np.select([area == 1, area == 2, area == 3],
                              [r, -s, -r], default=s))
            # rotate into the correct cube face
            if f == F_RIGHT:
                q, r = -r, q
            elif f == F_BACK:
                q, r = -q, -r
            elif f == F_LEFT:
                q, r = r, -q
            out_phi = np.arccos(-s) - HALF_PI
            out_lam = np.arctan2(r, q)
            if f == F_RIGHT:
                out_lam = _shift_lon(out_lam, -HALF_PI)
            elif f == F_BACK:
                out_lam = _shift_lon(out_lam, -np.pi)
            elif f == F_LEFT:
                out_lam = _shift_lon(out_lam, HALF_PI)

        if self.ell.es != 0.0:
            out_phi = _geocentric_to_geodetic_lat(out_phi, self.ell)
        return out_lam, out_phi, z, t


# ---------------------------------------------------------------------------
# HEALPix / rHEALPix (reference src/projections/healpix.cpp)
# ---------------------------------------------------------------------------

_HEALPIX_EPS = 1e-15

# CCW rotations by 0, 90, 180, 270 deg (healpix.cpp R1/R2/R3/IDENT :43-66);
# get_rotate_index(n) for n in -3..3 is equivalent to indexing by n mod 4
_ROT_M = np.array([
    [[1, 0], [0, 1]],
    [[0, -1], [1, 0]],
    [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]],
], dtype=np.float64)


def _authset(es: float):
    """pj_authset (reference src/auth.cpp:18-31): series coefficients for
    the inverse authalic latitude."""
    t = es * es
    apa0 = es * (1.0 / 3.0) + t * 0.17222222222222222222
    apa1 = t * 0.06388888888888888888
    t *= es
    apa0 += t * 0.10257936507936507937
    apa1 += t * 0.06640211640211640212
    apa2 = t * 0.01677689594356261023
    return apa0, apa1, apa2


def _authlat(beta, apa):
    """pj_authlat (reference src/auth.cpp:32-37)."""
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) \
        + apa[2] * np.sin(t + t + t)


def _sign(v):
    return np.sign(v)


def _healpix_sphere_fwd(lam, phi):
    """healpix_sphere (healpix.cpp:252-274)."""
    phi0 = np.arcsin(2.0 / 3.0)
    sinphi = np.sin(phi)
    x_eq = lam
    y_eq = 3.0 * np.pi / 8.0 * sinphi
    with np.errstate(invalid="ignore"):
        sigma = np.sqrt(3.0 * (1.0 - np.abs(sinphi)))
    cn = np.minimum(np.floor(2.0 * lam / np.pi + 2.0), 3.0)
    lamc = -3.0 * FORT_PI + HALF_PI * cn
    x_pol = lamc + (lam - lamc) * sigma
    y_pol = _sign(phi) * FORT_PI * (2.0 - sigma)
    eq = np.abs(phi) <= phi0
    return np.where(eq, x_eq, x_pol), np.where(eq, y_eq, y_pol)


def _healpix_sphere_inv(x, y):
    """healpix_spherhealpix_e_inverse (healpix.cpp:276-305)."""
    eq = np.abs(y) <= FORT_PI
    pol = (~eq) & (np.abs(y) < HALF_PI)
    cn = np.minimum(np.floor(2.0 * x / np.pi + 2.0), 3.0)
    xc = -3.0 * FORT_PI + HALF_PI * cn
    tau = 2.0 - 4.0 * np.abs(y) / np.pi
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.select(
            [eq, pol], [x, xc + (x - xc) / tau], default=-np.pi)
        phi = np.select(
            [eq, pol],
            [np.arcsin(np.clip(8.0 * y / (3.0 * np.pi), -1.0, 1.0)),
             _sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0, -1.0, 1.0))],
            default=_sign(y) * HALF_PI)
    return lam, phi


def _pnpoly(verts, px, py):
    """Vectorized even-odd crossing test, edge-for-edge identical to the
    reference pnpoly (healpix.cpp:132-165) including its open-polygon edge
    iteration and vertex-hit short-circuit."""
    inside = np.zeros(px.shape, dtype=bool)
    on_vertex = np.zeros(px.shape, dtype=bool)
    for vx, vy in verts:
        on_vertex |= (px == vx) & (py == vy)
    count = np.zeros(px.shape, dtype=np.int64)
    for i in range(1, len(verts)):
        x1, y1 = verts[i - 1]
        x2, y2 = verts[i]
        if y1 == y2:
            continue
        cond = (py > min(y1, y2)) & (py <= max(y1, y2)) & (px <= max(x1, x2))
        xinters = (py - y1) * (x2 - x1) / (y2 - y1) + x1
        hit = cond & ((x1 == x2) | (px <= xinters))
        count += hit.astype(np.int64)
    inside = (count % 2 == 1) | on_vertex
    return inside


def _healpix_verts():
    """Jittered HEALPix image boundary (healpix.cpp:176-194)."""
    e = _HEALPIX_EPS
    fp, hp, pi = FORT_PI, HALF_PI, np.pi
    return [(-pi - e, fp), (-3 * fp, hp + e), (-hp, fp + e), (-fp, hp + e),
            (0.0, fp + e), (fp, hp + e), (hp, fp + e), (3 * fp, hp + e),
            (pi + e, fp), (pi + e, -fp), (3 * fp, -hp - e), (hp, -fp - e),
            (fp, -hp - e), (0.0, -fp - e), (-fp, -hp - e), (-hp, -fp - e),
            (-3 * fp, -hp - e), (-pi - e, -fp), (-pi - e, fp)]


def _rhealpix_verts(ns: int, ss: int):
    """Jittered rHEALPix image boundary (healpix.cpp:203-218)."""
    e = _HEALPIX_EPS
    fp, hp, pi = FORT_PI, HALF_PI, np.pi
    return [(-pi - e, fp + e),
            (-pi + ns * hp - e, fp + e),
            (-pi + ns * hp - e, 3 * fp + e),
            (-pi + (ns + 1.0) * hp + e, 3 * fp + e),
            (-pi + (ns + 1.0) * hp + e, fp + e),
            (pi + e, fp + e), (pi + e, -fp - e),
            (-pi + (ss + 1.0) * hp + e, -fp - e),
            (-pi + (ss + 1.0) * hp + e, -3 * fp - e),
            (-pi + ss * hp - e, -3 * fp - e),
            (-pi + ss * hp - e, -fp - e),
            (-pi - e, -fp - e)]


def _combine_caps(x, y, ns: int, ss: int, inverse: bool):
    """combine_caps (healpix.cpp:437-499) vectorized: rearrange the four
    HEALPix polar cap triangles into the rHEALPix polar squares (fwd) or
    back (inverse)."""
    e = _HEALPIX_EPS
    north = y > FORT_PI
    south = y < -FORT_PI
    polar = north | south

    if not inverse:
        # get_cap forward branch (healpix.cpp:358-384)
        cn = np.select(
            [x < -HALF_PI, x < 0.0, x < HALF_PI], [0, 1, 2], default=3)
        cx = -3.0 * FORT_PI + HALF_PI * cn
        cy = np.where(north, HALF_PI, -HALF_PI)
        pole = np.where(north, ns, ss)
        n_rel = np.where(north, cn - pole, -(cn - pole))
        a0 = -3.0 * FORT_PI + pole * HALF_PI
    else:
        # get_cap inverse branch (healpix.cpp:385-432)
        xs = x - np.where(north, ns, ss) * HALF_PI
        cn_n = np.select(
            [(y >= -xs - FORT_PI - e) & (y < xs + 5 * FORT_PI - e),
             (y > -xs - FORT_PI + e) & (y >= xs + 5 * FORT_PI - e),
             (y <= -xs - FORT_PI + e) & (y > xs + 5 * FORT_PI + e)],
            [(ns + 1) % 4, (ns + 2) % 4, (ns + 3) % 4], default=ns)
        cn_s = np.select(
            [(y <= xs + FORT_PI + e) & (y > -xs - 5 * FORT_PI + e),
             (y < xs + FORT_PI - e) & (y <= -xs - 5 * FORT_PI + e),
             (y >= xs + FORT_PI - e) & (y < -xs - 5 * FORT_PI - e)],
            [(ss + 1) % 4, (ss + 2) % 4, (ss + 3) % 4], default=ss)
        cn = np.where(north, cn_n, cn_s)
        cx = np.where(north, -3.0 * FORT_PI + ns * HALF_PI,
                      -3.0 * FORT_PI + ss * HALF_PI)
        cy = np.where(north, HALF_PI, -HALF_PI)
        pole = np.where(north, ns, ss)
        n_rel = np.where(north, -(cn - pole), cn - pole)
        a0 = -3.0 * FORT_PI + cn * HALF_PI

    idx = np.mod(n_rel, 4).astype(np.int64)
    r = _ROT_M[idx]  # (..., 2, 2)
    vx = x - cx
    vy = y - cy
    ox = r[..., 0, 0] * vx + r[..., 0, 1] * vy + a0
    oy = r[..., 1, 0] * vx + r[..., 1, 1] * vy \
        + np.where(north, HALF_PI, -HALF_PI)
    return np.where(polar, ox, x), np.where(polar, oy, y)


@register
class Healpix(Operator):
    """HEALPix (reference healpix.cpp; authalic-sphere mapping for
    ellipsoids with the semimajor axis rescaled to the authalic radius,
    healpix.cpp:629-637). ``+rot_xy`` rotates the output plane."""

    name = "healpix"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        from .core import Ellipsoid, qsfn
        from ..ops import parse_angle
        self.rot_xy = parse_angle(self.params.get("rot_xy", 0.0)) * np.pi / 180.0
        self.es0 = self.ell.es
        self.e0 = self.ell.e
        if self.ell.es != 0.0:
            self.apa = _authset(self.ell.es)
            self.qp = float(qsfn(np.array(1.0), self.ell.e, self.ell.one_es))
            a_auth = self.ell.a * np.sqrt(0.5 * self.qp)
            # same es, authalic a (pj_calc_ellipsoid_params with new a)
            self.ell = Ellipsoid(a_auth, a_auth * np.sqrt(self.ell.one_es))

    def _rotate(self, x, y, angle):
        c, s = np.cos(angle), np.sin(angle)
        return x * c - y * s, y * c + x * s

    def _fwd(self, lam, phi, z, t):
        from .core import qsfn
        if self.es0 != 0.0:
            q = qsfn(np.sin(phi), self.e0, 1.0 - self.es0)
            phi = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        x, y = _healpix_sphere_fwd(lam, phi)
        x, y = self._rotate(x, y, -self.rot_xy)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        x, y = self._rotate(x, y, self.rot_xy)
        inside = _pnpoly(_healpix_verts(), x, y)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es0 != 0.0:
            phi = _authlat(phi, self.apa)
        lam = np.where(inside, lam, np.nan)
        phi = np.where(inside, phi, np.nan)
        return lam, phi, z, t


@register
class Rhealpix(Healpix):
    """rHEALPix (reference healpix.cpp:553-580,650-694): HEALPix with the
    polar caps rearranged into squares at +north_square/+south_square."""

    name = "rhealpix"

    def setup(self):
        super().setup()
        self.ns = int(self.params.get("north_square", 0))
        self.ss = int(self.params.get("south_square", 0))
        if not (0 <= self.ns <= 3) or not (0 <= self.ss <= 3):
            raise ValueError("north_square/south_square must be in [0,3]")

    def _fwd(self, lam, phi, z, t):
        from .core import qsfn
        if self.es0 != 0.0:
            q = qsfn(np.sin(phi), self.e0, 1.0 - self.es0)
            phi = np.arcsin(np.clip(q / self.qp, -1.0, 1.0))
        x, y = _healpix_sphere_fwd(lam, phi)
        x, y = _combine_caps(x, y, self.ns, self.ss, False)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        inside = _pnpoly(_rhealpix_verts(self.ns, self.ss), x, y)
        x, y = _combine_caps(x, y, self.ns, self.ss, True)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es0 != 0.0:
            phi = _authlat(phi, self.apa)
        lam = np.where(inside, lam, np.nan)
        phi = np.where(inside, phi, np.nan)
        return lam, phi, z, t


# ---------------------------------------------------------------------------
# ISEA — Icosahedral Snyder Equal Area (reference src/projections/isea.cpp)
# ---------------------------------------------------------------------------

_DEG36 = 0.62831853071795864768
_DEG72 = 1.25663706143591729537
_DEG108 = 1.88495559215387594306
_DEG120 = 2.09439510239319549229
_DEG144 = 2.51327412287183459075
_ISEA_SCALE = 0.8301572857837594396028083
_V_LAT = 0.46364760899944494524
_E_RAD = 0.91843818702186776133
_F_RAD = 0.18871053072122403508
_TABLE_G = 0.6615845383
_TABLE_H = 0.1909830056
_ISEA_STD_LAT = 1.01722196792335072101
_ISEA_STD_LONG = 0.19634954084936207740
_RPRIME = 0.91038328153090290025
# snyder constants for the icosahedron (isea.cpp:204-212): g, G, theta (deg)
_SNY_G_DEG = 37.37736814
_SNY_BIGG_DEG = 36.0
_SNY_THETA_DEG = 30.0

_ISEA_VERTEX = [
    (0.0, HALF_PI), (np.pi, _V_LAT), (-_DEG108, _V_LAT), (-_DEG36, _V_LAT),
    (_DEG36, _V_LAT), (_DEG108, _V_LAT), (-_DEG144, -_V_LAT),
    (-_DEG72, -_V_LAT), (0.0, -_V_LAT), (_DEG72, -_V_LAT),
    (_DEG144, -_V_LAT), (0.0, -HALF_PI)]

_ISEA_TRI_V1 = [0, 0, 0, 0, 0, 0, 6, 7, 8, 9, 10, 2, 3, 4, 5, 1, 11, 11, 11,
                11, 11]

_ISEA_TRI_CENTER = [
    (0.0, 0.0), (-_DEG144, _E_RAD), (-_DEG72, _E_RAD), (0.0, _E_RAD),
    (_DEG72, _E_RAD), (_DEG144, _E_RAD), (-_DEG144, _F_RAD),
    (-_DEG72, _F_RAD), (0.0, _F_RAD), (_DEG72, _F_RAD), (_DEG144, _F_RAD),
    (-_DEG108, -_F_RAD), (-_DEG36, -_F_RAD), (_DEG36, -_F_RAD),
    (_DEG108, -_F_RAD), (np.pi, -_F_RAD), (-_DEG108, -_E_RAD),
    (-_DEG36, -_E_RAD), (_DEG36, -_E_RAD), (_DEG108, -_E_RAD),
    (np.pi, -_E_RAD)]


def _isea_az_adjustment(tri: int) -> float:
    """az_adjustment (isea.cpp:237-252)."""
    vlon, vlat = _ISEA_VERTEX[_ISEA_TRI_V1[tri]]
    clon, clat = _ISEA_TRI_CENTER[tri]
    return np.arctan2(
        np.cos(vlat) * np.sin(vlon - clon),
        np.cos(clat) * np.sin(vlat)
        - np.sin(clat) * np.cos(vlat) * np.cos(vlon - clon))


def _isea_triangle_xy(tri: int):
    """Flattened-map triangle center (isea.cpp:254-285)."""
    t = (tri - 1) % 20
    cx = _TABLE_G * ((t % 5) - 2) * 2.0
    if t > 9:
        cx += _TABLE_G
    cy = (5.0, 1.0, -1.0, -5.0)[t // 5] * _TABLE_H
    return cx * _RPRIME, cy * _RPRIME


def _isea_ctran(o_lon, o_lat, o_az, lam, phi):
    """isea_ctran (isea.cpp:533-557) + snyder_ctran (:489-531): rotate so
    the grid's orientation pole becomes the north pole."""
    beta = o_lon + np.pi
    sin_a, cos_a = np.sin(o_lat), np.cos(o_lat)
    cos_p = np.cos(phi)
    sin_phip = sin_a * np.sin(phi) - cos_a * cos_p * np.cos(lam - beta)
    lp_b = np.arctan2(
        cos_p * np.sin(lam - beta),
        sin_a * cos_p * np.cos(lam - beta) + cos_a * np.sin(phi))
    lambdap = lp_b + beta
    lambdap = np.mod(lambdap, 2.0 * np.pi)
    lambdap = np.where(lambdap > np.pi, lambdap - 2.0 * np.pi, lambdap)
    lambdap = np.where(lambdap < -np.pi, lambdap + 2.0 * np.pi, lambdap)
    phip = np.arcsin(np.clip(sin_phip, -1.0, 1.0))
    # shift into the isea frame (isea.cpp:542-556)
    lambdap = lambdap - (np.pi - o_az + o_lon) + np.pi
    lambdap = np.mod(lambdap, 2.0 * np.pi)
    lambdap = np.where(lambdap > np.pi, lambdap - 2.0 * np.pi, lambdap)
    lambdap = np.where(lambdap < -np.pi, lambdap + 2.0 * np.pi, lambdap)
    return lambdap, phip


@register
class Isea(Operator):
    """Icosahedral Snyder Equal Area, plane output mode (reference
    isea.cpp:302-467 isea_snyder_forward, :672-695 isea_tri_plane). The
    triangle search loop is vectorized as a masked sweep over the 20
    triangles. di/dd/hex grid-address output modes and the inverse are not
    provided (the reference has no inverse either, isea.cpp:1021-1023)."""

    name = "isea"
    left = U_RADIANS
    right = U_CLASSIC
    has_inverse = False

    def setup(self):
        from ..ops import parse_angle
        p = self.params
        mode = str(p.get("mode", "plane"))
        if mode != "plane":
            raise ValueError(f"isea +mode={mode} not supported (plane only)")
        self.o_lat = _ISEA_STD_LAT
        self.o_lon = _ISEA_STD_LONG
        self.o_az = 0.0
        orient = p.get("orient")
        if orient == "pole":
            self.o_lat, self.o_lon = HALF_PI, 0.0
        elif orient not in (None, "isea"):
            raise ValueError("isea +orient must be isea or pole")
        if "azi" in p:
            self.o_az = parse_angle(p["azi"]) * np.pi / 180.0
        if "lon_0" in p:
            self.o_lon = self.lam0
        if "lat_0" in p:
            self.o_lat = parse_angle(p["lat_0"]) * np.pi / 180.0
        self.radius = _ISEA_SCALE if "rescale" in p else 1.0

    def _fwd(self, lam, phi, z, t):
        lam2, phi2_ = _isea_ctran(self.o_lon, self.o_lat, self.o_az, lam, phi)
        g = _SNY_G_DEG * np.pi / 180.0
        bigG = _SNY_BIGG_DEG * np.pi / 180.0
        theta = _SNY_THETA_DEG * np.pi / 180.0
        cot_theta = 1.0 / np.tan(theta)
        tan_g = np.tan(g)
        sinphi = np.sin(phi2_)
        cosphi = np.cos(phi2_)

        out_x = np.full_like(lam, np.nan)
        out_y = np.full_like(lam, np.nan)
        assigned = np.zeros(lam.shape, dtype=bool)
        for i in range(1, 21):
            clon, clat = _ISEA_TRI_CENTER[i]
            zc = np.arccos(np.clip(
                np.sin(clat) * sinphi
                + np.cos(clat) * cosphi * np.cos(lam2 - clon), -1.0, 1.0))
            cand = (~assigned) & (zc <= g + 0.000005)
            if not cand.any():
                continue
            az = np.arctan2(
                cosphi * np.sin(lam2 - clon),
                np.cos(clat) * sinphi
                - np.sin(clat) * cosphi * np.cos(lam2 - clon))
            az = az - _isea_az_adjustment(i)
            az = np.where(az < 0.0, az + 2.0 * np.pi, az)
            m = np.floor(az / _DEG120)
            az = az - m * _DEG120
            neg = az < 0.0
            az = np.where(neg, az + _DEG120, az)
            m = np.where(neg, m - 1, m)
            q = np.arctan2(tan_g, np.cos(az) + np.sin(az) * cot_theta)
            cand &= zc <= q + 0.000005
            if not cand.any():
                continue
            H = np.arccos(np.clip(
                np.sin(az) * np.sin(bigG) * np.cos(g)
                - np.cos(az) * np.cos(bigG), -1.0, 1.0))
            ag = az + bigG + H - np.pi
            azp = np.arctan2(
                2.0 * ag, _RPRIME * _RPRIME * tan_g * tan_g
                - 2.0 * ag * cot_theta)
            dprime = _RPRIME * tan_g / (np.cos(azp) + np.sin(azp) * cot_theta)
            with np.errstate(invalid="ignore", divide="ignore"):
                fq = dprime / (2.0 * _RPRIME * np.sin(q / 2.0))
            rho = 2.0 * _RPRIME * fq * np.sin(zc / 2.0)
            azp = azp + _DEG120 * m
            x = rho * np.sin(azp)
            y = rho * np.cos(azp)
            # isea_tri_plane (isea.cpp:672-685): down-triangles rotate 180
            if ((i - 1) // 5) % 2 == 1:
                x, y = -x, -y
            tcx, tcy = _isea_triangle_xy(i)
            x = x * self.radius + tcx * self.radius
            y = y * self.radius + tcy * self.radius
            out_x = np.where(cand, x, out_x)
            out_y = np.where(cand, y, out_y)
            assigned |= cand
        return out_x, out_y, z, t
