"""Per-point projection distortion analytics — P5_FACTORS parity.

Vectorized numpy reimplementation of proj_factors (reference
src/factors.cpp:50-131 + src/deriv.cpp:21-85, surfaced by ``proj -S``,
src/apps/proj.cpp:122-132): meridional/parallel scale h/k, areal scale s,
meridian convergence, Tissot semi-axes a/b, angular distortion omega, and
the four partial derivatives — all via the same central-difference
derivative stencil (step h = 1e-5 rad) on the operator's RAW forward
kernel, so the numbers match the reference's numerical factors bit-for-ulp.
"""

from __future__ import annotations

import numpy as np

from .kernels.core import HALF_PI, adjlon, aasin

_DEFAULT_H = 1e-5
_EPS = 1e-12


def factors(op, lam, phi, h: float = _DEFAULT_H):
    """Compute distortion factors at geographic (lam, phi) radians.

    ``op`` is an Operator (a projection with a raw dimensionless ``_fwd``).
    Returns a dict of numpy arrays: x_l, y_l, x_p, y_p (derivatives),
    h, k (meridional/parallel scale), s (areal), conv (convergence, rad),
    a, b (Tissot axes), omega (angular distortion, rad). Out-of-range
    inputs poison to NaN like the reference (factors.cpp:82-92).
    """
    lam = np.asarray(lam, dtype=np.float64).copy()
    phi = np.asarray(phi, dtype=np.float64).copy()
    bad = ((np.abs(phi) - HALF_PI) > _EPS) | (np.abs(lam) > 10.0)
    h = abs(h) if abs(h) >= _EPS else _DEFAULT_H

    if getattr(op, "geoc", False):
        phi = np.arctan(op.ell.one_es * np.tan(phi))
    # keep the stencil inside the poles (factors.cpp:103-105)
    over = np.abs(phi) > (HALF_PI - h)
    phi = np.where(over, np.where(phi < 0, -(HALF_PI - h), HALF_PI - h), phi)
    lam = lam - op.lam0
    if not getattr(op, "over", False):
        lam = adjlon(lam)

    # 4-point stencil (deriv.cpp:21-85): fwd at (l+h,p+h), (l+h,p-h),
    # (l-h,p-h), (l-h,p+h)
    z = np.zeros_like(lam)
    t = np.full_like(lam, np.nan)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        xpp, ypp, _, _ = op._fwd(lam + h, phi + h, z, t)
        xpm, ypm, _, _ = op._fwd(lam + h, phi - h, z, t)
        xmm, ymm, _, _ = op._fwd(lam - h, phi - h, z, t)
        xmp, ymp, _, _ = op._fwd(lam - h, phi + h, z, t)
    h2 = 2.0 * h
    x_l = (xpp + xpm - xmm - xmp) / (h2 + h2)
    y_l = (ypp + ypm - ymm - ymp) / (h2 + h2)
    x_p = (xpp - xpm - xmm + xmp) / (h2 + h2)
    y_p = (ypp - ypm - ymm + ymp) / (h2 + h2)

    cosphi = np.cos(phi)
    fh = np.hypot(x_p, y_p)
    fk = np.hypot(x_l, y_l) / cosphi
    es = op.ell.es
    if es != 0.0:
        tt = np.sin(phi)
        tt = 1.0 - es * tt * tt
        n = np.sqrt(tt)
        fh = fh * tt * n / op.ell.one_es
        fk = fk * n
        r = tt * tt / op.ell.one_es
    else:
        r = np.ones_like(phi)
    conv = -np.arctan2(x_p, y_p)
    s = (y_p * x_l - x_p * y_l) * r / cosphi
    with np.errstate(invalid="ignore", divide="ignore"):
        thetap = aasin(s / (fh * fk))
        tq = fk * fk + fh * fh
        fa = np.sqrt(np.clip(tq + 2.0 * s, 0.0, None))
        tq = np.clip(tq - 2.0 * s, 0.0, None)
        tq = np.sqrt(tq)
        fb = 0.5 * (fa - tq)
        fa = 0.5 * (fa + tq)
        omega = 2.0 * aasin((fa - fb) / (fa + fb))

    out = {"x_l": x_l, "y_l": y_l, "x_p": x_p, "y_p": y_p,
           "h": fh, "k": fk, "s": s, "conv": conv, "thetap": thetap,
           "a": fa, "b": fb, "omega": omega}
    return {kk: np.where(bad, np.nan, vv) for kk, vv in out.items()}
