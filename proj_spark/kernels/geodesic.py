"""Vectorized geodesic direct/inverse on the ellipsoid (Karney's algorithm).

Re-implements the published algorithm of Karney, "Algorithms for geodesics",
J. Geodesy 87(1) 2013, order-6 series — the same algorithm the reference
embeds as C (src/geodesic.c, GEOGRAPHICLIB_GEODESIC_ORDER 6, :34-44; entry
points geod_direct :686, geod_inverse :1050) and exposes as proj_geod
(src/4D_api.cpp:121-135) and the aeqd projection's ellipsoidal path
(src/projections/aeqd.cpp:280). This is a from-scratch numpy implementation:
series coefficients re-derived with exact rational arithmetic
(tools/derive_geodesic_series.py) and cross-validated against numeric
quadrature of the defining integrals in tests/test_geodesic.py.

Inverse solver: the canonical arrangement (phi1 <= 0, |phi1| >= |phi2|,
0 <= lam12 <= pi) makes lam12(alpha1) monotonic on (0, pi) [Karney §4], so a
fixed-iteration vectorized bisection converges deterministically for every
row at once — branch-free, mask-based, no per-row Python. Newton refinement
is applied afterwards for the last bits.
"""

from __future__ import annotations

import numpy as np

from .core import Ellipsoid, adjlon

# ---------------------------------------------------------------------------
# order-6 series (coefficients: tools/derive_geodesic_series.py; C1' is the
# published reverted series, validated numerically in tests)
# ---------------------------------------------------------------------------


def _A1m1(eps):
    """A1 - 1 where I1 = A1 (sigma + sum C1 sin 2l sigma)."""
    e2 = eps * eps
    t = e2 * (e2 * (e2 / 256.0 + 1.0 / 64.0) + 0.25)
    return (t + eps) / (1.0 - eps)


def _C1(eps):
    e2 = eps * eps
    return [
        eps * (e2 * (-e2 / 32.0 + 3.0 / 16.0) - 0.5),
        e2 * (e2 * (-9.0 / 2048.0 * e2 + 1.0 / 32.0) - 1.0 / 16.0),
        eps * e2 * (3.0 / 256.0 * e2 - 1.0 / 48.0),
        e2 * e2 * (3.0 / 512.0 * e2 - 5.0 / 512.0),
        eps * e2 * e2 * (-7.0 / 1280.0),
        e2 * e2 * e2 * (-7.0 / 2048.0),
    ]


def _C1p(eps):
    e2 = eps * eps
    return [
        eps * (e2 * (205.0 / 1536.0 * e2 - 9.0 / 32.0) + 0.5),
        e2 * (e2 * (1335.0 / 4096.0 * e2 - 37.0 / 96.0) + 5.0 / 16.0),
        eps * e2 * (-75.0 / 128.0 * e2 + 29.0 / 96.0),
        e2 * e2 * (-2391.0 / 2560.0 * e2 + 539.0 / 1536.0),
        eps * e2 * e2 * (3467.0 / 7680.0),
        e2 * e2 * e2 * (38081.0 / 61440.0),
    ]


def _A2m1(eps):
    e2 = eps * eps
    t = e2 * (e2 * (-11.0 / 256.0 * e2 - 7.0 / 64.0) - 0.75)
    return (t - eps) / (1.0 + eps)


def _C2(eps):
    e2 = eps * eps
    return [
        eps * (e2 * (e2 / 32.0 + 1.0 / 16.0) + 0.5),
        e2 * (e2 * (35.0 / 2048.0 * e2 + 1.0 / 32.0) + 3.0 / 16.0),
        eps * e2 * (5.0 / 256.0 * e2 + 5.0 / 48.0),
        e2 * e2 * (7.0 / 512.0 * e2 + 35.0 / 512.0),
        eps * e2 * e2 * (63.0 / 1280.0),
        e2 * e2 * e2 * (77.0 / 2048.0),
    ]


def _A3_coefs(n):
    """A3 as polynomial coefficients in eps (constant..eps^5), functions of
    the third flattening n (exact joint expansion truncated at eps^5)."""
    return [
        1.0,
        -0.5 + 0.5 * n,
        -0.25 - n * (0.125 - 0.375 * n),
        -(1.0 / 16.0) - n * (3.0 / 16.0 + n * (1.0 / 16.0 - 5.0 / 16.0 * n)),
        -(3.0 / 64.0) - n * (1.0 / 32.0 + n * (5.0 / 32.0 + n * 5.0 / 128.0)),
        -(3.0 / 128.0) - n * (5.0 / 128.0 + n * 5.0 / 256.0),
    ]


def _C3_coefs(n):
    """C3[l] (l=1..5) polynomial coefficients in eps starting at eps^l."""
    c31 = [
        0.25 - 0.25 * n,
        0.125 - n * n * 0.125,
        3.0 / 64.0 + n * (3.0 / 64.0 - n * (1.0 / 64.0 + 5.0 / 64.0 * n)),
        5.0 / 128.0 + n * (1.0 / 64.0 + n * (1.0 / 64.0 - n / 64.0)),
        3.0 / 128.0 + n * (11.0 / 512.0 + n * (3.0 / 512.0 + n / 256.0)),
    ]
    c32 = [
        1.0 / 16.0 - n * (3.0 / 32.0 - n / 32.0),
        3.0 / 64.0 - n * (1.0 / 32.0 + n * (3.0 / 64.0 - n / 32.0)),
        3.0 / 128.0 + n * (1.0 / 128.0 - n * (9.0 / 256.0 + 3.0 / 128.0 * n)),
        5.0 / 256.0 + n * (1.0 / 256.0 - n * (1.0 / 128.0 + 7.0 / 256.0 * n)),
    ]
    c33 = [
        5.0 / 192.0 - n * (3.0 / 64.0 - n * (5.0 / 192.0 - n / 192.0)),
        3.0 / 128.0 - n * (5.0 / 192.0 + n * (1.0 / 64.0 - 5.0 / 192.0 * n)),
        7.0 / 512.0 - n * (1.0 / 384.0 + 77.0 / 3072.0 * n),
    ]
    c34 = [
        7.0 / 512.0 - n * (7.0 / 256.0 - n * (5.0 / 256.0 - 7.0 / 1024.0 * n)),
        7.0 / 512.0 - n * (5.0 / 256.0 + 7.0 / 2048.0 * n),
    ]
    c35 = [21.0 / 2560.0 - n * (9.0 / 512.0 - 15.0 / 1024.0 * n)]
    return [c31, c32, c33, c34, c35]


def _sin_series(coefs, sinx, cosx):
    """sum coefs[l-1] * sin(2 l x) via Clenshaw (coefs: list of arrays)."""
    # sin(2lx) recursion via Clenshaw on cos(2x)
    ar = 2.0 * (cosx - sinx) * (cosx + sinx)  # 2 cos(2x)
    y1 = np.zeros_like(sinx)
    y0 = np.zeros_like(sinx)
    for c in reversed(coefs):
        y1, y0 = y0, ar * y0 - y1 + c
    return 2.0 * sinx * cosx * y0  # sin(2x) * y0


class GeodSolver:
    """Precomputed ellipsoid-level state (reference geod_init analogue)."""

    def __init__(self, ell: Ellipsoid):
        self.ell = ell
        self.a = ell.a
        self.f = ell.f
        self.b = ell.a * (1.0 - ell.f)
        self.f1 = 1.0 - ell.f
        self.e2 = ell.es
        self.ep2 = self.e2 / (self.f1 * self.f1)
        self.n = ell.f / (2.0 - ell.f)
        self._a3 = _A3_coefs(self.n)
        self._c3 = _C3_coefs(self.n)

    # -- per-line helpers ---------------------------------------------------

    def _eps(self, cos2_alpha0):
        k2 = self.ep2 * cos2_alpha0
        s = np.sqrt(1.0 + k2)
        return k2 / ((s + 1.0) ** 2), k2

    def _A3(self, eps):
        out = np.zeros_like(eps)
        for c in reversed(self._a3):
            out = out * eps + c
        return out

    def _C3(self, eps):
        out = []
        p = np.ones_like(eps)
        for l, cl in enumerate(self._c3, start=1):
            acc = np.zeros_like(eps)
            for c in reversed(cl):
                acc = acc * eps + c
            p = p * eps
            out.append(acc * p)
        return out

    def _I1(self, eps, sinx, cosx, sigma):
        return (1.0 + _A1m1(eps)) * (sigma + _sin_series(_C1(eps), sinx, cosx))

    def _I2(self, eps, sinx, cosx, sigma):
        return (1.0 + _A2m1(eps)) * (sigma + _sin_series(_C2(eps), sinx, cosx))

    def _I3(self, eps, sinx, cosx, sigma):
        return self._A3(eps) * (sigma + _sin_series(self._C3(eps), sinx, cosx))

    def _length_scale(self, eps, k2, ssig1, csig1, dn1, ssig2, csig2, dn2,
                      sig1, sig2):
        """Reduced length m12 (metres) and geodesic scale M12 along a line
        between arc points 1, 2 (Karney eqs. 38-40; J = I1 - I2)."""
        J12 = ((_A1m1(eps) - _A2m1(eps)) * (sig2 - sig1)
               + ((1.0 + _A1m1(eps)) * (_sin_series(_C1(eps), ssig2, csig2)
                                        - _sin_series(_C1(eps), ssig1, csig1)))
               - ((1.0 + _A2m1(eps)) * (_sin_series(_C2(eps), ssig2, csig2)
                                        - _sin_series(_C2(eps), ssig1, csig1))))
        m12 = self.b * (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                        - csig1 * csig2 * J12)
        csig12 = csig1 * csig2 + ssig1 * ssig2
        t = k2 * (ssig2 - ssig1) * (ssig2 + ssig1) / (dn1 + dn2)
        M12 = csig12 + (t * ssig2 - csig2 * J12) * ssig1 / dn1
        M21 = csig12 - (t * ssig1 - csig1 * J12) * ssig2 / dn2
        return m12, M12, M21

    # -- direct -------------------------------------------------------------

    def direct(self, lon1, lat1, azi1, s12, want_scale: bool = False):
        """All angles radians, s12 metres. Returns (lon2, lat2, azi2);
        with ``want_scale`` also (m12, M12)."""
        lon1 = np.asarray(lon1, dtype=np.float64)
        lat1 = np.asarray(lat1, dtype=np.float64)
        azi1 = np.asarray(azi1, dtype=np.float64)
        s12 = np.asarray(s12, dtype=np.float64)

        sbet1 = self.f1 * np.sin(lat1)
        cbet1 = np.cos(lat1)
        norm = np.hypot(sbet1, cbet1)
        sbet1, cbet1 = sbet1 / norm, cbet1 / norm
        cbet1 = np.maximum(cbet1, 1e-12)  # polar guard

        salp1, calp1 = np.sin(azi1), np.cos(azi1)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)

        ssig1 = sbet1
        csig1 = np.where((sbet1 == 0) & (calp1 == 0), 1.0, calp1 * cbet1)
        nrm = np.hypot(ssig1, csig1)
        ssig1, csig1 = ssig1 / nrm, csig1 / nrm
        somg1 = salp0 * ssig1
        comg1 = csig1

        eps, k2 = self._eps(calp0 * calp0)
        sig1 = np.arctan2(ssig1, csig1)
        A1 = 1.0 + _A1m1(eps)
        s1 = self._I1(eps, ssig1, csig1, sig1) * self.b
        s2 = s1 + s12
        tau2 = s2 / (self.b * A1)
        stau2, ctau2 = np.sin(tau2), np.cos(tau2)
        sig2 = tau2 + _sin_series(_C1p(eps), stau2, ctau2)
        ssig2, csig2 = np.sin(sig2), np.cos(sig2)

        sbet2 = calp0 * ssig2
        cbet2 = np.hypot(salp0, calp0 * csig2)
        somg2 = salp0 * ssig2
        comg2 = csig2
        omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                           comg2 * comg1 + somg2 * somg1)
        lam12 = omg12 - self.f * salp0 * (
            self._I3(eps, ssig2, csig2, sig2) - self._I3(eps, ssig1, csig1, sig1))

        lat2 = np.arctan2(sbet2, self.f1 * cbet2)
        lon2 = adjlon(lon1 + lam12)
        azi2 = np.arctan2(salp0, calp0 * csig2)
        if want_scale:
            dn1 = np.sqrt(1.0 + k2 * ssig1 * ssig1)
            dn2 = np.sqrt(1.0 + k2 * ssig2 * ssig2)
            m12, M12, _ = self._length_scale(eps, k2, ssig1, csig1, dn1,
                                             ssig2, csig2, dn2, sig1, sig2)
            return lon2, lat2, azi2, m12, M12
        return lon2, lat2, azi2

    # -- inverse ------------------------------------------------------------

    def _lambda12(self, sbet1, cbet1, sbet2, cbet2, salp1, calp1,
                  want_s12: bool = True):
        """lam12 and s12-precursors for trial azimuth alpha1 (canonical
        arrangement). Returns (lam12, s12, salp2, calp2); ``want_s12=False``
        skips the distance series during root-finder iterations (s12 is
        only needed at the converged azimuth).

        Hot path: called 3-5x per point by the Newton solver. All operands
        are unit-magnitude, so plain sqrt(x^2+y^2) replaces overflow-safe
        hypot, and the eps-dependent series coefficients (A3/C3) are
        evaluated once per call instead of once per endpoint."""
        salp0 = salp1 * cbet1
        t = salp1 * sbet1
        calp0 = np.sqrt(calp1 * calp1 + t * t)

        ssig1 = sbet1
        csig1 = calp1 * cbet1
        inv_nrm = 1.0 / np.sqrt(ssig1 * ssig1 + csig1 * csig1)
        ssig1n, csig1n = ssig1 * inv_nrm, csig1 * inv_nrm
        somg1 = salp0 * sbet1
        comg1 = csig1

        # alpha2 from sin(alpha) cos(beta) = sin(alpha0)
        with np.errstate(invalid="ignore", divide="ignore"):
            salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
            calp2sq = (csig1 * csig1 +
                       np.where(cbet1 < -sbet1,
                                (cbet2 - cbet1) * (cbet1 + cbet2),
                                (sbet1 - sbet2) * (sbet1 + sbet2)))
            calp2 = np.sqrt(np.maximum(calp2sq, 0.0)) / cbet2
        ssig2 = sbet2
        csig2 = calp2 * cbet2
        inv_nrm2 = 1.0 / np.sqrt(ssig2 * ssig2 + csig2 * csig2)
        ssig2n, csig2n = ssig2 * inv_nrm2, csig2 * inv_nrm2
        somg2 = salp0 * sbet2
        comg2 = csig2

        omg12 = np.arctan2(
            np.maximum(comg1 * somg2 - somg1 * comg2, 0.0),
            comg1 * comg2 + somg1 * somg2)

        eps, k2 = self._eps(calp0 * calp0)
        sig1 = np.arctan2(ssig1n, csig1n)
        sig2 = np.arctan2(ssig2n, csig2n)
        # shared-coefficient I3 difference: A3/C3 depend only on eps
        a3 = self._A3(eps)
        c3 = self._C3(eps)
        I3d = a3 * ((sig2 - sig1)
                    + (_sin_series(c3, ssig2n, csig2n)
                       - _sin_series(c3, ssig1n, csig1n)))
        lam12 = omg12 - self.f * salp0 * I3d
        if want_s12:
            c1 = _C1(eps)
            s12 = (1.0 + _A1m1(eps)) * ((sig2 - sig1)
                                        + (_sin_series(c1, ssig2n, csig2n)
                                           - _sin_series(c1, ssig1n, csig1n))) * self.b
        else:
            s12 = None
        internals = (eps, k2, ssig1n, csig1n, ssig2n, csig2n, sig1, sig2)
        return lam12, s12, salp2, calp2, internals

    def _final_state(self, sbet1, cbet1, sbet2, cbet2, salp1, calp1):
        """Distance + far azimuth at the CONVERGED alpha1 — the quantities
        lambda12 iteration skipped. Omits the omg12/I3 lambda series (not
        needed once the root is found), so the post-loop full-array pass
        costs ~half a _lambda12."""
        salp0 = salp1 * cbet1
        t = salp1 * sbet1
        calp0 = np.sqrt(calp1 * calp1 + t * t)
        ssig1 = sbet1
        csig1 = calp1 * cbet1
        inv_nrm = 1.0 / np.sqrt(ssig1 * ssig1 + csig1 * csig1)
        ssig1n, csig1n = ssig1 * inv_nrm, csig1 * inv_nrm
        with np.errstate(invalid="ignore", divide="ignore"):
            salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
            calp2sq = (csig1 * csig1 +
                       np.where(cbet1 < -sbet1,
                                (cbet2 - cbet1) * (cbet1 + cbet2),
                                (sbet1 - sbet2) * (sbet1 + sbet2)))
            calp2 = np.sqrt(np.maximum(calp2sq, 0.0)) / cbet2
        ssig2 = sbet2
        csig2 = calp2 * cbet2
        inv_nrm2 = 1.0 / np.sqrt(ssig2 * ssig2 + csig2 * csig2)
        ssig2n, csig2n = ssig2 * inv_nrm2, csig2 * inv_nrm2
        eps, k2 = self._eps(calp0 * calp0)
        sig1 = np.arctan2(ssig1n, csig1n)
        sig2 = np.arctan2(ssig2n, csig2n)
        c1 = _C1(eps)
        s12 = (1.0 + _A1m1(eps)) * ((sig2 - sig1)
                                    + (_sin_series(c1, ssig2n, csig2n)
                                       - _sin_series(c1, ssig1n, csig1n))) * self.b
        internals = (eps, k2, ssig1n, csig1n, ssig2n, csig2n, sig1, sig2)
        return s12, salp2, calp2, internals

    def _dlam12(self, internals, sbet1, cbet2, calp2):
        """d(lam12)/d(alpha1) at the trial azimuth (Karney 2013 eq. 46;
        reference src/geodesic.c Lambda12 diffp branch): m12b*f1/(calp2*
        cbet2), with the meridional limit -2*f1*dn1/sbet1 when the line
        passes through the far pole (calp2*cbet2 -> 0)."""
        eps, k2, ssig1, csig1, ssig2, csig2, sig1, sig2 = internals
        dn1 = np.sqrt(1.0 + k2 * ssig1 * ssig1)
        dn2 = np.sqrt(1.0 + k2 * ssig2 * ssig2)
        # reduced length only (skip M12/M21), shared coefficients
        a1m1 = _A1m1(eps)
        a2m1 = _A2m1(eps)
        c1 = _C1(eps)
        c2 = _C2(eps)
        J12 = ((a1m1 - a2m1) * (sig2 - sig1)
               + ((1.0 + a1m1) * (_sin_series(c1, ssig2, csig2)
                                  - _sin_series(c1, ssig1, csig1)))
               - ((1.0 + a2m1) * (_sin_series(c2, ssig2, csig2)
                                  - _sin_series(c2, ssig1, csig1))))
        m12 = self.b * (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                        - csig1 * csig2 * J12)
        denom = calp2 * cbet2
        with np.errstate(invalid="ignore", divide="ignore"):
            d = (m12 / self.b) * self.f1 / denom
            merid = np.abs(denom) < 1e-14
            d = np.where(merid,
                         -2.0 * self.f1 * dn1 / np.where(sbet1 != 0.0,
                                                         sbet1, -1.0),
                         d)
        return d

    def inverse(self, lon1, lat1, lon2, lat2, n_bisect: int = 52,
                want_scale: bool = False):
        """All radians. Returns (s12 metres, azi1, azi2); with
        ``want_scale`` returns (s12, azi1, azi2, m12, M12)."""
        from .core import chunk_apply, _CHUNK
        if all(np.ndim(a) == 1 and np.shape(a) == np.shape(lon1)
               for a in (lon1, lat1, lon2, lat2)) \
                and np.shape(lon1)[0] > _CHUNK:
            # L2-sized slices: the lambda-iteration's ~dozen temporaries
            # stay in the reused allocator arena instead of fresh mmaps
            return chunk_apply(
                lambda a, b, c, d: self._inverse_impl(a, b, c, d, n_bisect,
                                                      want_scale),
                (lon1, lat1, lon2, lat2))
        return self._inverse_impl(lon1, lat1, lon2, lat2, n_bisect,
                                  want_scale)

    def _inverse_impl(self, lon1, lat1, lon2, lat2, n_bisect: int = 52,
                      want_scale: bool = False):
        scalar_in = np.ndim(lon1) == 0 and np.ndim(lat1) == 0 \
            and np.ndim(lon2) == 0 and np.ndim(lat2) == 0
        lon1 = np.atleast_1d(np.asarray(lon1, dtype=np.float64))
        lat1 = np.atleast_1d(np.asarray(lat1, dtype=np.float64))
        lon2 = np.atleast_1d(np.asarray(lon2, dtype=np.float64))
        lat2 = np.atleast_1d(np.asarray(lat2, dtype=np.float64))

        lam12_t = adjlon(lon2 - lon1)
        # canonical arrangement: swap points so |phi1| >= |phi2|, make
        # phi1 <= 0, lam12 in [0, pi]; record flips to undo at the end
        swapp = np.abs(lat1) < np.abs(lat2)
        la1 = np.where(swapp, lat2, lat1)
        la2 = np.where(swapp, lat1, lat2)
        lam = np.where(swapp, -lam12_t, lam12_t)
        latsign = np.where(la1 > 0, -1.0, 1.0)
        la1 = la1 * latsign
        la2 = la2 * latsign
        lonsign = np.where(lam < 0, -1.0, 1.0)
        lam = lam * lonsign

        sbet1 = self.f1 * np.sin(la1)
        cbet1 = np.cos(la1)
        nrm = np.hypot(sbet1, cbet1)
        sbet1, cbet1 = sbet1 / nrm, cbet1 / nrm
        cbet1 = np.maximum(cbet1, 1e-15)
        sbet2 = self.f1 * np.sin(la2)
        cbet2 = np.cos(la2)
        nrm = np.hypot(sbet2, cbet2)
        sbet2, cbet2 = sbet2 / nrm, cbet2 / nrm
        cbet2 = np.maximum(cbet2, 1e-15)
        # snap sub-1e-12-rad latitudes to the equator: the sigma
        # parameterization degenerates under fp cancellation for
        # beta ~ 1e-16 near alpha1 = pi/2 (position error of the snap
        # <= 6 um, far inside every tolerance); enables the exact
        # equatorial shortcut for equator-to-equator pairs
        sbet1 = np.where(np.abs(sbet1) < 1e-12, 0.0, sbet1)
        sbet2 = np.where(np.abs(sbet2) < 1e-12, 0.0, sbet2)
        coincident = (sbet1 == sbet2) & (cbet1 == cbet2) & (lam == 0.0)
        # enforce |bet2| <= |bet1| exactly (roundoff guard)
        sbet2 = np.where(np.abs(sbet2) > np.abs(sbet1) * (1 - 1e-15),
                         np.sign(sbet2 + 0.0) * np.abs(sbet1), sbet2)

        # equatorial shortcut: both on equator and lam12 <= (1-f)*pi
        equatorial = (sbet1 == 0) & (sbet2 == 0) & (lam <= self.f1 * np.pi)

        # root-find on alpha1 in (0, pi): lam12(alpha1) is monotonic
        # increasing in the canonical arrangement, so a bracket [lo, hi]
        # always holds the root. Newton with the reduced-length derivative
        # (Karney 2013 eq. 46, _dlam12) converges in ~3-5 evaluations from
        # the spherical starting azimuth; a step that leaves the bracket
        # falls back to the midpoint, so worst case (nearly-antipodal rows
        # with a poor spherical guess) degrades to plain bisection. The
        # active set is compressed to the unconverged tail as rows finish.
        lo = np.full_like(lam, 1e-12)
        hi = np.full_like(lam, np.pi - 1e-12)
        n_pts = lam.shape[0] if lam.ndim else 1
        # starting azimuth (Karney 2013 §5 / geodesic.c InverseStart
        # non-antipodal branch): the inverse problem solved on the
        # auxiliary sphere with the longitude compressed by f1*dnm for
        # short lines — starting error O(f^2) instead of O(f), which
        # saves a Newton iteration per point
        sbet12 = sbet2 * cbet1 - cbet2 * sbet1
        cbet12 = cbet2 * cbet1 + sbet2 * sbet1
        shortline = (cbet12 >= 0.0) & (sbet12 < 0.5) & (cbet2 * lam < 0.5)
        sbsum = sbet1 + sbet2
        cbsum = cbet1 + cbet2
        sbetm2 = sbsum * sbsum / (sbsum * sbsum + cbsum * cbsum)
        dnm = np.sqrt(1.0 + self.ep2 * sbetm2)
        omg12s = np.where(shortline, lam / (self.f1 * dnm), lam)
        somg12, comg12 = np.sin(omg12s), np.cos(omg12s)
        with np.errstate(invalid="ignore", divide="ignore"):
            guess = np.arctan2(
                cbet2 * somg12,
                np.where(comg12 >= 0.0,
                         sbet12 + cbet2 * sbet1 * somg12 * somg12
                         / (1.0 + comg12),
                         (sbet2 * cbet1 + cbet2 * sbet1)
                         - cbet2 * sbet1 * somg12 * somg12
                         / (1.0 - comg12)))
        alp1 = np.clip(guess, lo, hi)
        best_f = np.full_like(lam, np.inf)
        idx = np.arange(n_pts)
        a_lo, a_hi = lo, hi
        a_sb1, a_cb1, a_sb2, a_cb2, a_lam = sbet1, cbet1, sbet2, cbet2, lam
        cand = alp1.copy()
        a_best = alp1.copy()
        a_bestf = best_f.copy()
        for it in range(n_bisect):
            if idx.size == 0:
                break
            l12, _, _, calp2t, internals = self._lambda12(
                a_sb1, a_cb1, a_sb2, a_cb2, np.sin(cand), np.cos(cand),
                want_s12=False)
            f_c = l12 - a_lam
            improved = np.abs(f_c) < a_bestf
            a_best = np.where(improved, cand, a_best)
            a_bestf = np.where(improved, np.abs(f_c), a_bestf)
            neg = f_c < 0
            a_lo = np.where(neg, cand, a_lo)
            a_hi = np.where(neg, a_hi, cand)
            # Newton step (bracket-guarded)
            d = self._dlam12(internals, a_sb1, a_cb2, calp2t)
            with np.errstate(invalid="ignore", divide="ignore"):
                newton = cand - f_c / d
            bad = ~np.isfinite(newton) | (newton <= a_lo) \
                | (newton >= a_hi) | (d <= 0)
            nxt = np.where(bad, 0.5 * (a_lo + a_hi), newton)
            # acceptance: (a) residual at machine floor, (b) bracket
            # exhausted, or (c) POLISH — |f| < 1e-9 rad means quadratic
            # convergence puts the next iterate's residual below 1e-17,
            # so commit the Newton step without paying a re-evaluation
            # (the reference's tripn/tripb early exit, geodesic.c:1188-1202)
            polish = (np.abs(f_c) < 1e-9) & ~bad
            a_best = np.where(polish, nxt, a_best)
            done = polish | (np.abs(f_c) < 1e-15) | ((a_hi - a_lo) < 1e-15)
            cand = nxt
            if np.any(done):
                alp1[idx] = a_best
                best_f[idx] = a_bestf
                keep = ~done
                idx = idx[keep]
                a_lo, a_hi = a_lo[keep], a_hi[keep]
                a_sb1, a_cb1 = a_sb1[keep], a_cb1[keep]
                a_sb2, a_cb2 = a_sb2[keep], a_cb2[keep]
                a_lam = a_lam[keep]
                cand = cand[keep]
                a_best, a_bestf = a_best[keep], a_bestf[keep]
        if idx.size:
            alp1[idx] = a_best
        salp1, calp1 = np.sin(alp1), np.cos(alp1)
        s12, salp2, calp2, internals = self._final_state(
            sbet1, cbet1, sbet2, cbet2, salp1, calp1)
        m12 = M12 = None
        if want_scale:
            eps, k2, ssig1, csig1, ssig2, csig2, sig1, sig2 = internals
            dn1 = np.sqrt(1.0 + k2 * ssig1 * ssig1)
            dn2 = np.sqrt(1.0 + k2 * ssig2 * ssig2)
            m12, M12s, M21s = self._length_scale(eps, k2, ssig1, csig1, dn1,
                                                 ssig2, csig2, dn2, sig1, sig2)
            # reduced length is symmetric under endpoint exchange; the
            # geodesic scale is not: when canonicalization swapped the
            # endpoints, the scale at the true point 2 is M21 of the solved
            # (swapped) problem. Reflections (latsign/lonsign) leave both
            # invariant.
            M12 = np.where(swapp, M21s, M12s)

        # coincident points: exactly zero
        s12 = np.where(coincident, 0.0, s12)
        # equatorial exact value
        s12 = np.where(equatorial, self.a * lam, s12)
        salp1 = np.where(equatorial, 1.0, salp1)
        calp1 = np.where(equatorial, 0.0, calp1)
        salp2 = np.where(equatorial, 1.0, salp2)
        calp2 = np.where(equatorial, 0.0, calp2)

        # undo canonicalization: swap exchanges the azimuth pair and reverses
        # the line (negate sin AND cos = +180 deg); lonsign flips sin,
        # latsign flips cos
        sw = np.where(swapp, -1.0, 1.0)
        salp1u = np.where(swapp, salp2, salp1) * sw * lonsign
        calp1u = np.where(swapp, calp2, calp1) * sw * latsign
        salp2u = np.where(swapp, salp1, salp2) * sw * lonsign
        calp2u = np.where(swapp, calp1, calp2) * sw * latsign
        azi1 = np.arctan2(salp1u, calp1u)
        azi2 = np.arctan2(salp2u, calp2u)
        if scalar_in:
            s12, azi1, azi2 = s12[0], azi1[0], azi2[0]
            if want_scale:
                m12, M12 = m12[0], M12[0]
        if want_scale:
            return s12, azi1, azi2, m12, M12
        return s12, azi1, azi2


_SOLVERS: dict = {}


def solver(ell: Ellipsoid) -> GeodSolver:
    key = (ell.a, ell.b)
    if key not in _SOLVERS:
        _SOLVERS[key] = GeodSolver(ell)
    return _SOLVERS[key]


def geod_inverse(ell, lon1, lat1, lon2, lat2):
    return solver(ell).inverse(lon1, lat1, lon2, lat2)


def geod_direct(ell, lon1, lat1, azi1, s12):
    return solver(ell).direct(lon1, lat1, azi1, s12)


def geod_dist_m(ell, lon1, lat1, lon2, lat2):
    """Exact metric distance (the reference's proj_lp_dist semantics,
    src/4D_api.cpp:137-143: geodesic inverse s12)."""
    return solver(ell).inverse(lon1, lat1, lon2, lat2)[0]
