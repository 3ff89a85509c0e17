"""Meta-operator: ob_tran — general oblique transformation.

Vectorized numpy reimplementation of src/projections/ob_tran.cpp: wraps any
sub-projection (``+o_proj=``) behind a spherical rotation that moves a
chosen pole (``+o_lat_p/+o_lon_p``, ``+o_alpha/+o_lon_c/+o_lat_c``, or a
two-point ``+o_lon_1/+o_lat_1/+o_lon_2/+o_lat_2`` form) to the north pole.
The sub-projection is constructed from the same parameter set with
``o_proj`` substituted for ``proj`` (ob_tran.cpp:140-173) and its RAW
kernel is invoked (no per-step prepare/finalize), exactly like the
reference calling ``link->fwd`` directly (ob_tran.cpp:42,56).
"""

from __future__ import annotations

import numpy as np

from ..ops import (
    Operator,
    register,
    parse_angle,
    U_RADIANS,
    U_CLASSIC,
    U_WHATEVER,
)
from .core import DEG_TO_RAD, HALF_PI, adjlon, aasin, aacos  # noqa: F401

_TOL = 1e-10


@register
class ObTran(Operator):
    """General Oblique Transformation (reference ob_tran.cpp)."""

    name = "ob_tran"
    left = U_RADIANS
    right = U_CLASSIC

    def setup(self):
        from ..ops import create_operator
        p = self.params
        o_proj = p.get("o_proj")
        if o_proj is None or o_proj is True or not isinstance(o_proj, str) \
                or o_proj == "ob_tran":
            # ob_tran.cpp:168-180: +o_proj must name a non-ob_tran operator
            from ..errors import missing_arg
            missing_arg("ob_tran: +o_proj must name a projection "
                        "(and cannot be ob_tran itself)")
        inner = dict(p)
        inner["proj"] = o_proj
        inner.pop("o_proj", None)
        self.link = create_operator(inner)
        if self.link.left != U_RADIANS:
            # the reference's link->fwd (2D LP->XY) is null for 4D-only
            # operators like helmert -> "no forward/inverse operation"
            # (gie expects errno no_inverse_op on the inverse attempt)
            from ..errors import ProjError, NO_INVERSE_OP
            raise ProjError(
                f"ob_tran sub-projection {o_proj} has no 2D LP kernel",
                NO_INVERSE_OP)

        def ang(key, default=0.0):
            return parse_angle(p.get(key, default)) * DEG_TO_RAD

        if "o_alpha" in p:
            # pole from center + azimuth (ob_tran.cpp:223-239)
            lamc = ang("o_lon_c")
            phic = ang("o_lat_c")
            alpha = ang("o_alpha")
            if abs(abs(phic) - HALF_PI) <= _TOL:
                raise ValueError("|o_lat_c| should be < 90 deg")
            self.lamp = lamc + np.arctan2(-np.cos(alpha),
                                          -np.sin(alpha) * np.sin(phic))
            phip = float(np.arcsin(np.cos(phic) * np.sin(alpha)))
        elif "o_lat_p" in p:
            # explicit new pole (ob_tran.cpp:240-243)
            self.lamp = ang("o_lon_p")
            phip = ang("o_lat_p")
        else:
            # two points on the new equator (ob_tran.cpp:244-281)
            lam1, phi1 = ang("o_lon_1"), ang("o_lat_1")
            lam2, phi2_ = ang("o_lon_2"), ang("o_lat_2")
            if abs(phi1) > HALF_PI - _TOL:
                raise ValueError("|o_lat_1| should be < 90 deg")
            if abs(phi2_) > HALF_PI - _TOL:
                raise ValueError("|o_lat_2| should be < 90 deg")
            if abs(phi1 - phi2_) < _TOL:
                raise ValueError("o_lat_1 should differ from o_lat_2")
            if abs(phi1) < _TOL:
                raise ValueError("o_lat_1 should not be zero")
            self.lamp = float(np.arctan2(
                np.cos(phi1) * np.sin(phi2_) * np.cos(lam1)
                - np.sin(phi1) * np.cos(phi2_) * np.cos(lam2),
                np.sin(phi1) * np.cos(phi2_) * np.sin(lam2)
                - np.cos(phi1) * np.sin(phi2_) * np.sin(lam1)))
            phip = float(np.arctan(-np.cos(self.lamp - lam1) / np.tan(phi1)))

        self.oblique = abs(phip) > _TOL
        if self.oblique:
            self.sphip = np.sin(phip)
            self.cphip = np.cos(phip)
        # "speculative" latlong link: no output scaling (ob_tran.cpp:294-296)
        if self.link.right == U_RADIANS:
            self.right = U_WHATEVER
        else:
            self.right = self.link.right
        self.has_inverse = self.link.has_inverse

    def _fwd(self, lam, phi, z, t):
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.oblique:
            # Snyder formulas 5-8b / 5-7 (ob_tran.cpp:27-43)
            lam2 = adjlon(np.arctan2(
                cosphi * np.sin(lam),
                self.sphip * cosphi * coslam + self.cphip * sinphi)
                + self.lamp)
            phi2_ = aasin(self.sphip * sinphi - self.cphip * cosphi * coslam)
        else:
            # transverse (ob_tran.cpp:45-57)
            lam2 = adjlon(np.arctan2(cosphi * np.sin(lam), sinphi) + self.lamp)
            phi2_ = aasin(-cosphi * coslam)
        return self.link._fwd(lam2, phi2_, z, t)

    def _inv(self, x, y, z, t):
        lam, phi, z, t = self.link._inv(x, y, z, t)
        lam = lam - self.lamp
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.oblique:
            # Snyder formulas 5-9 / 5-10b (ob_tran.cpp:59-78)
            phi2_ = aasin(self.sphip * sinphi + self.cphip * cosphi * coslam)
            lam2 = np.arctan2(cosphi * np.sin(lam),
                              self.sphip * cosphi * coslam
                              - self.cphip * sinphi)
        else:
            # (ob_tran.cpp:80-93)
            lam2 = np.arctan2(cosphi * np.sin(lam), -sinphi)
            phi2_ = aasin(cosphi * coslam)
        return lam2, phi2_, z, t
