"""Error classification matching the reference's PROJ_ERR_* constants.

The engine's data path is vectorized, so per-row failures travel as NaN
poison, not exceptions (SURVEY.md §3.3) — but the reference attaches a
specific errno to every failure (src/proj.h PROJ_ERR_*; the gie harness
asserts them by name, src/apps/gie.cpp:1155-1181). This module restores
that parity:

- ``ProjError``: a ValueError subclass carrying ``errno`` (the gie-style
  lowercase name) for construction-time failures;
- ``classify_failure``: given an operator, direction, and ONE failed
  coordinate, reproduce the errno the reference would have set, using
  the same decision order proj_trans takes (input validation ->
  grid containment -> projection domain).
"""

from __future__ import annotations

import numpy as np

# gie errno names (reference src/apps/gie.cpp:1160-1181 <-> proj.h)
INVALID_OP = "invalid_op"
INVALID_OP_WRONG_SYNTAX = "invalid_op_wrong_syntax"
INVALID_OP_MISSING_ARG = "invalid_op_missing_arg"
INVALID_OP_ILLEGAL_ARG_VALUE = "invalid_op_illegal_arg_value"
INVALID_OP_MUTUALLY_EXCLUSIVE_ARGS = "invalid_op_mutually_exclusive_args"
INVALID_OP_FILE_NOT_FOUND_OR_INVALID = \
    "invalid_op_file_not_found_or_invalid"
COORD_TRANSFM = "coord_transfm"
COORD_TRANSFM_INVALID_COORD = "coord_transfm_invalid_coord"
COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN = \
    "coord_transfm_outside_projection_domain"
COORD_TRANSFM_NO_OPERATION = "coord_transfm_no_operation"
COORD_TRANSFM_OUTSIDE_GRID = "coord_transfm_outside_grid"
COORD_TRANSFM_GRID_AT_NODATA = "coord_transfm_grid_at_nodata"
COORD_TRANSFM_NO_CONVERGENCE = "coord_transfm_no_convergence"
NO_INVERSE_OP = "no_inverse_op"


class ProjError(ValueError):
    """Construction/setup failure with a reference-parity errno name."""

    def __init__(self, message: str, errno: str = INVALID_OP):
        super().__init__(message)
        self.errno = errno


def illegal_arg(msg: str):
    """Raise with PROJ_ERR_INVALID_OP_ILLEGAL_ARG_VALUE parity."""
    raise ProjError(msg, INVALID_OP_ILLEGAL_ARG_VALUE)


def missing_arg(msg: str):
    """Raise with PROJ_ERR_INVALID_OP_MISSING_ARG parity."""
    raise ProjError(msg, INVALID_OP_MISSING_ARG)


def errno_of_exception(exc: BaseException) -> str:
    """errno name for a construction-time exception (typed ProjError wins;
    untyped falls back on the reference's catch-all categories)."""
    e = getattr(exc, "errno", None)
    if e:
        return e
    if isinstance(exc, KeyError):
        # unresolved name (grid file, EPSG code, init file)
        return INVALID_OP_FILE_NOT_FOUND_OR_INVALID
    if isinstance(exc, NotImplementedError):
        return NO_INVERSE_OP
    return INVALID_OP


def _grids_of(op):
    g = getattr(op, "grid", None) or getattr(op, "gset", None)
    if g is None:
        return None
    members = getattr(g, "grids", None)
    return members if members is not None else [g]


def classify_failure(op, direction: str, lam, phi) -> str:
    """errno for ONE coordinate that came back NaN from ``op.apply``.

    Mirrors the reference's decision order (4D_api.cpp proj_trans +
    per-op checks): an input outside the valid coordinate range is
    COORD_TRANSFM_INVALID_COORD (|lat| > 90deg on angular input, non-
    finite anywhere); a grid-backed operator whose grids don't cover the
    point is COORD_TRANSFM_OUTSIDE_GRID; an operator without a usable
    inverse asked for one is NO_INVERSE_OP; everything else is
    COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN."""
    lam = float(np.asarray(lam).reshape(-1)[0])
    phi = float(np.asarray(phi).reshape(-1)[0])
    if not (np.isfinite(lam) and np.isfinite(phi)):
        return COORD_TRANSFM_INVALID_COORD
    angular_in = False
    try:
        from .ops import U_RADIANS
        angular_in = op.input_units(direction) == U_RADIANS
    except Exception:
        pass
    if angular_in and abs(phi) > np.pi / 2 + 1e-12:
        return COORD_TRANSFM_INVALID_COORD
    if direction == "inverse":
        # a pipeline inverse fails with no_inverse_op when ANY step that
        # must run inverted lacks a usable inverse (pipeline.cpp reverse
        # path propagates the step errno). A step declared +inv runs
        # FORWARD under pipeline inversion, so its missing inverse is
        # irrelevant — only forward-declared steps are flipped.
        subs = [op] + [s for s, d in getattr(op, "steps", [])
                       if d == "forward"]
        if any(getattr(s, "inverse_invalid", False) for s in subs):
            return NO_INVERSE_OP
    grids = _grids_of(op)
    if grids is not None:
        lam_d, phi_d = lam, phi
        if angular_in:
            lam_d, phi_d = np.degrees(lam), np.degrees(phi)
        inside = any(np.asarray(g.contains(lam_d, phi_d)).reshape(-1)[0]
                     for g in grids)
        if not inside:
            return COORD_TRANSFM_OUTSIDE_GRID
    return COORD_TRANSFM_OUTSIDE_PROJECTION_DOMAIN
