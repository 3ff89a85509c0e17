"""Interrupted pseudocylindrical projections: igh, igh_o, imoll, imoll_o.

Vectorized numpy reimplementations of:
- igh:     src/projections/igh.cpp (Goode Homolosine, 12 zones: sinusoidal
           below |40d44'11.8"|, Mollweide above; zone table :255-289)
- igh_o:   src/projections/igh_o.cpp (oceanic-view Goode, zone table
           :285-316)
- imoll:   src/projections/imoll.cpp (interrupted Mollweide, 6 zones,
           x0 seam-matching :258-277, seam x boundaries :280-287)
- imoll_o: src/projections/imoll_o.cpp (oceanic interrupted Mollweide,
           :264-305)

Each zone is a spherical moll/sinu sub-operator with its own lam0/x0/y0;
the forward picks the zone from (lam, phi) bands, the inverse picks it from
(x, y) bands and then re-checks the zone's lam/phi extent (poisons to NaN
outside — the interruption seams).
"""

from __future__ import annotations

import numpy as np

from ..ops import Operator, register, U_RADIANS, U_CLASSIC

from .core import DEG_TO_RAD

_EPS = 1e-10
# 40d44'11.8" sinusoidal<->Mollweide transition (igh.cpp:35)
_PHI_B = (40 + 44 / 60.0 + 11.8 / 3600.0) * DEG_TO_RAD


def _d(deg: float) -> float:
    return deg * DEG_TO_RAD


class _Interrupted(Operator):
    """Shared machinery: zones are (kind, x0, y0, lam0) tuples of raw
    spherical sub-kernels; fwd/inv assign a zone id per point and run the
    sub-kernel masked (igh.cpp:62-100/102-194 structure)."""

    left = U_RADIANS
    right = U_CLASSIC

    def _make_zone(self, kind: str, x0: float, y0: float, lam0: float):
        from ..ops import create_operator
        return {"op": create_operator({"proj": kind, "R": "1"}),
                "x0": x0, "y0": y0, "lam0": lam0}

    def _raw_y(self, zone, phi: float) -> float:
        """Raw forward y of a zone at (lam=0, phi) — used for the dy0
        Mollweide/sinusoidal stitching constant (igh.cpp:271-277)."""
        x, y, _, _ = zone["op"]._fwd(np.array([0.0]), np.array([phi]),
                                     np.zeros(1), np.zeros(1))
        return float(y[0])

    def _zone_x(self, zone, lam: float, phi: float) -> float:
        """x of a zone's placed forward at a point (compute_zone_offset
        helper, imoll.cpp:211-227)."""
        x, _, _, _ = zone["op"]._fwd(np.array([lam - zone["lam0"]]),
                                     np.array([phi]), np.zeros(1), np.zeros(1))
        return float(x[0]) + zone["x0"]

    def _match(self, z1: int, z2: int, lam: float, phi1: float, phi2: float):
        """Shift zone z1 so it meets zone z2 at the seam (imoll.cpp
        'Adjust zones', :258-277)."""
        self.zones[z1 - 1]["x0"] += (
            self._zone_x(self.zones[z2 - 1], lam, phi2)
            - self._zone_x(self.zones[z1 - 1], lam, phi1))

    def _seam_x(self, lam: float, phi: float) -> float:
        """Seam x location = mean of the full forward on both sides of the
        seam (compute_zone_x_boundary, imoll.cpp:229-241)."""
        x, _, _, _ = self._fwd(np.array([lam - _EPS, lam + _EPS]),
                               np.array([phi, phi]), np.zeros(2), np.zeros(2))
        return float((x[0] + x[1]) / 2.0)

    # subclasses: self.zones, _assign_fwd(lam, phi), _assign_inv(x, y),
    # _ok(zone_id, lam, phi)

    def _fwd(self, lam, phi, z, t):
        zi = self._assign_fwd(lam, phi)
        x = np.full_like(lam, np.nan)
        y = np.full_like(lam, np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            for i, zn in enumerate(self.zones, start=1):
                m = zi == i
                if not np.any(m):
                    continue
                xx, yy, _, _ = zn["op"]._fwd(lam - zn["lam0"], phi, z, t)
                x = np.where(m, xx + zn["x0"], x)
                y = np.where(m, yy + zn["y0"], y)
        return x, y, z, t

    def _inv(self, x, y, z, t):
        zi = self._assign_inv(x, y)
        lam = np.full_like(x, np.nan)
        phi = np.full_like(x, np.nan)
        with np.errstate(invalid="ignore", divide="ignore"):
            for i, zn in enumerate(self.zones, start=1):
                m = zi == i
                if not np.any(m):
                    continue
                lm, ph, _, _ = zn["op"]._inv(x - zn["x0"], y - zn["y0"], z, t)
                lm = lm + zn["lam0"]
                ok = m & self._ok(i, lm, ph)
                lam = np.where(ok, lm, lam)
                phi = np.where(ok, ph, phi)
        return lam, phi, z, t


def _band(lo, hi, lam):
    return (lam >= lo - _EPS) & (lam <= hi + _EPS)


@register
class Igh(_Interrupted):
    """Interrupted Goode Homolosine (reference igh.cpp)."""

    name = "igh"

    def setup(self):
        d = _d
        # sinusoidal equatorial zones 3-8, mollweide polar 1,2,9-12
        # (igh.cpp:255-289)
        self.zones = [None] * 12
        for n, kind, x0, lam0 in (
                (3, "sinu", -d(100), -d(100)), (4, "sinu", d(30), d(30)),
                (5, "sinu", -d(160), -d(160)), (6, "sinu", -d(60), -d(60)),
                (7, "sinu", d(20), d(20)), (8, "sinu", d(140), d(140)),
                (1, "moll", -d(100), -d(100))):
            self.zones[n - 1] = self._make_zone(kind, x0, 0.0, lam0)
        # dy0 stitches mollweide onto sinusoidal at the boundary latitude
        self.dy0 = (self._raw_y(self.zones[2], _PHI_B)
                    - self._raw_y(self.zones[0], _PHI_B))
        self.zones[0]["y0"] = self.dy0
        for n, x0, y0, lam0 in (
                (2, d(30), self.dy0, d(30)),
                (9, -d(160), -self.dy0, -d(160)),
                (10, -d(60), -self.dy0, -d(60)),
                (11, d(20), -self.dy0, d(20)),
                (12, d(140), -self.dy0, d(140))):
            self.zones[n - 1] = self._make_zone("moll", x0, y0, lam0)

    def _assign_fwd(self, lam, phi):
        d = _d
        hi = np.where(lam <= -d(40), 1, 2)
        mid_n = np.where(lam <= -d(40), 3, 4)
        mid_s = np.select([lam <= -d(100), lam <= -d(20), lam <= d(80)],
                          [5, 6, 7], default=8)
        lo = np.select([lam <= -d(100), lam <= -d(20), lam <= d(80)],
                       [9, 10, 11], default=12)
        return np.select([phi >= _PHI_B, phi >= 0, phi >= -_PHI_B],
                         [hi, mid_n, mid_s], default=lo)

    def _assign_inv(self, x, y):
        d = _d
        y90 = self.dy0 + np.sqrt(2.0)  # igh.cpp:106
        zi = self._assign_fwd(np.asarray(x), np.asarray(y))
        # (the x/y band layout coincides with the lam/phi bands, igh.cpp
        # :109-131, including the reference's asymmetric bottom fuzz)
        return np.where((y > y90 + _EPS) | (y < -y90 + _EPS), 0, zi)

    def _ok(self, i, lam, phi):
        d = _d
        if i == 1:
            return (_band(-d(180), -d(40), lam)
                    | (_band(-d(40), -d(10), lam)
                       & (phi >= d(60) - _EPS) & (phi <= d(90) + _EPS)))
        if i == 2:
            return (_band(-d(40), d(180), lam)
                    | (_band(-d(180), -d(160), lam)
                       & (phi >= d(50) - _EPS) & (phi <= d(90) + _EPS))
                    | (_band(-d(50), -d(40), lam)
                       & (phi >= d(60) - _EPS) & (phi <= d(90) + _EPS)))
        rng = {3: (-180, -40), 4: (-40, 180), 5: (-180, -100), 6: (-100, -20),
               7: (-20, 80), 8: (80, 180), 9: (-180, -100), 10: (-100, -20),
               11: (-20, 80), 12: (80, 180)}[i]
        return _band(d(rng[0]), d(rng[1]), lam)


@register
class IghO(_Interrupted):
    """Interrupted Goode Homolosine, oceanic view (reference igh_o.cpp)."""

    name = "igh_o"

    def setup(self):
        d = _d
        self.zones = [None] * 12
        for n, kind, x0, lam0 in (
                (4, "sinu", -d(140), -d(140)), (5, "sinu", -d(10), -d(10)),
                (6, "sinu", d(130), d(130)), (7, "sinu", -d(110), -d(110)),
                (8, "sinu", d(20), d(20)), (9, "sinu", d(150), d(150)),
                (1, "moll", -d(140), -d(140))):
            self.zones[n - 1] = self._make_zone(kind, x0, 0.0, lam0)
        self.dy0 = (self._raw_y(self.zones[3], _PHI_B)
                    - self._raw_y(self.zones[0], _PHI_B))
        self.zones[0]["y0"] = self.dy0
        for n, x0, y0, lam0 in (
                (2, -d(10), self.dy0, -d(10)),
                (3, d(130), self.dy0, d(130)),
                (10, -d(110), -self.dy0, -d(110)),
                (11, d(20), -self.dy0, d(20)),
                (12, d(150), -self.dy0, d(150))):
            self.zones[n - 1] = self._make_zone("moll", x0, y0, lam0)

    def _assign_fwd(self, lam, phi):
        d = _d
        hi = np.select([lam <= -d(90), lam >= d(60)], [1, 3], default=2)
        mid_n = np.select([lam <= -d(90), lam >= d(60)], [4, 6], default=5)
        mid_s = np.select([lam <= -d(60), lam >= d(90)], [7, 9], default=8)
        lo = np.select([lam <= -d(60), lam >= d(90)], [10, 12], default=11)
        return np.select([phi >= _PHI_B, phi >= 0, phi >= -_PHI_B],
                         [hi, mid_n, mid_s], default=lo)

    def _assign_inv(self, x, y):
        y90 = self.dy0 + np.sqrt(2.0)
        zi = self._assign_fwd(np.asarray(x), np.asarray(y))
        return np.where((y > y90 + _EPS) | (y < -y90 + _EPS), 0, zi)

    def _ok(self, i, lam, phi):
        d = _d
        if i == 1:
            return (_band(-d(180), -d(90), lam)
                    | (_band(d(160), d(180), lam)
                       & (phi >= d(50) - _EPS) & (phi <= d(90) + _EPS)))
        if i == 3:
            return (_band(d(60), d(180), lam)
                    | (_band(-d(180), -d(160), lam)
                       & (phi >= d(50) - _EPS) & (phi <= d(90) + _EPS)))
        if i == 11:
            return (_band(-d(60), d(90), lam)
                    | (_band(d(90), d(100), lam)
                       & (phi >= -d(90) - _EPS) & (phi <= -d(40) + _EPS)))
        rng = {2: (-90, 60), 4: (-180, -90), 5: (-90, 60), 6: (60, 180),
               7: (-180, -60), 8: (-60, 90), 9: (90, 180), 10: (-180, -60),
               12: (90, 180)}[i]
        return _band(d(rng[0]), d(rng[1]), lam)


@register
class Imoll(_Interrupted):
    """Interrupted Mollweide (reference imoll.cpp)."""

    name = "imoll"

    def setup(self):
        d = _d
        self.zones = [
            self._make_zone("moll", -d(100), 0.0, -d(100)),
            self._make_zone("moll", d(30), 0.0, d(30)),
            self._make_zone("moll", -d(160), 0.0, -d(160)),
            self._make_zone("moll", -d(60), 0.0, -d(60)),
            self._make_zone("moll", d(20), 0.0, d(20)),
            self._make_zone("moll", d(140), 0.0, d(140)),
        ]
        # seam matching, in the reference's order (imoll.cpp:258-277)
        self._match(3, 1, -d(160), -_EPS, _EPS)
        self._match(2, 1, -d(40), _EPS, _EPS)
        self._match(4, 1, -d(100), -_EPS, _EPS)
        self._match(5, 2, -d(20), -_EPS, _EPS)
        self._match(6, 2, d(80), -_EPS, _EPS)
        self.b12 = self._seam_x(-d(40), _EPS)
        self.b34 = self._seam_x(-d(100), -_EPS)
        self.b45 = self._seam_x(-d(20), -_EPS)
        self.b56 = self._seam_x(d(80), -_EPS)

    def _assign_fwd(self, lam, phi):
        d = _d
        north = np.where(lam <= -d(40), 1, 2)
        south = np.select([lam <= -d(100), lam <= -d(20), lam <= d(80)],
                          [3, 4, 5], default=6)
        return np.where(phi >= 0, north, south)

    def _assign_inv(self, x, y):
        y90 = np.sqrt(2.0)
        north = np.where(x <= self.b12, 1, 2)
        south = np.select([x <= self.b34, x <= self.b45, x <= self.b56],
                          [3, 4, 5], default=6)
        zi = np.where(y >= 0, north, south)
        return np.where((y > y90 + _EPS) | (y < -y90 + _EPS), 0, zi)

    def _ok(self, i, lam, phi):
        d = _d
        rng = {1: (-180, -40), 2: (-40, 180), 3: (-180, -100), 4: (-100, -20),
               5: (-20, 80), 6: (80, 180)}[i]
        hemi = phi >= -_EPS if i <= 2 else phi <= _EPS
        return _band(d(rng[0]), d(rng[1]), lam) & hemi


@register
class ImollO(_Interrupted):
    """Interrupted Mollweide, oceanic view (reference imoll_o.cpp)."""

    name = "imoll_o"

    def setup(self):
        d = _d
        self.zones = [
            self._make_zone("moll", -d(140), 0.0, -d(140)),
            self._make_zone("moll", -d(10), 0.0, -d(10)),
            self._make_zone("moll", d(130), 0.0, d(130)),
            self._make_zone("moll", -d(110), 0.0, -d(110)),
            self._make_zone("moll", d(20), 0.0, d(20)),
            self._make_zone("moll", d(150), 0.0, d(150)),
        ]
        # imoll_o.cpp:275-295
        self._match(2, 1, -d(90), _EPS, _EPS)
        self._match(3, 2, d(60), _EPS, _EPS)
        self._match(4, 1, -d(180), -_EPS, _EPS)
        self._match(5, 2, -d(60), -_EPS, _EPS)
        self._match(6, 3, d(90), -_EPS, _EPS)
        self.b12 = self._seam_x(-d(90), _EPS)
        self.b23 = self._seam_x(d(60), _EPS)
        self.b45 = self._seam_x(-d(60), -_EPS)
        self.b56 = self._seam_x(d(90), -_EPS)

    def _assign_fwd(self, lam, phi):
        d = _d
        north = np.select([lam <= -d(90), lam >= d(60)], [1, 3], default=2)
        south = np.select([lam <= -d(60), lam >= d(90)], [4, 6], default=5)
        return np.where(phi >= 0, north, south)

    def _assign_inv(self, x, y):
        y90 = np.sqrt(2.0)
        north = np.select([x <= self.b12, x >= self.b23], [1, 3], default=2)
        south = np.select([x <= self.b45, x >= self.b56], [4, 6], default=5)
        zi = np.where(y >= 0, north, south)
        return np.where((y > y90 + _EPS) | (y < -y90 + _EPS), 0, zi)

    def _ok(self, i, lam, phi):
        d = _d
        rng = {1: (-180, -90), 2: (-90, 60), 3: (60, 180),
               4: (-180, -60), 5: (-60, 90), 6: (90, 180)}[i]
        hemi = phi >= -_EPS if i <= 3 else phi <= _EPS
        return _band(d(rng[0]), d(rng[1]), lam) & hemi
