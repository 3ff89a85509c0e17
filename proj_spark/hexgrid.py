"""Aperture-7 hierarchical hexagonal grid (H3-style parent/child ids).

VERDICT r3 #8: `hex_tile_counts` bins points into flat axial hexes; the
north rule names H3, whose defining feature is the aperture-7 *hierarchy* —
each resolution's hexes are 7x the area of the next, rotated ~19.1deg.
This module adds that hierarchy with exact integer parent/child ids.

Construction (public: Gibson & Lucas' Generalized Balanced Ternary, 1982;
the same index-7 sublattice H3 uses, cf. h3lib's coordijk.c `_upAp7` /
`_downAp7` which hard-code the equivalent (3,1)/(1,2)-over-7 matrices):

Identify pointy-top axial coords (q, r) with the Eisenstein-like integer
z = q + r*tau, tau = e^{i*pi/3} (the two axial basis vectors are 60deg
apart and equal length, so the cell-center lattice IS Z[tau]).
Norm(a + b*tau) = a^2 + ab + b^2.

    u = 2 + tau            (norm 7 -> index-7 sublattice, |u| = sqrt(7),
                            arg(u) = atan(sqrt(3)/5) ~ 19.106deg — exactly
                            H3's inter-resolution rotation)

* parent(z)  = hexround(z * conj(u) / 7); conj(u) = 3 - tau, so in axial
  ints: parent = cube_round((3q + r)/7, (2r - q)/7).
* child0(p)  = u * p = (2*qp - rp,  qp + 3*rp); the 7 children of p are
  u*p + d for d in DIGITS (center + the 6 axial unit neighbors), which is
  a complete residue system of Z[tau] mod u (distinct because the norm of
  any difference of two digits is in {1, 3, 4}, never divisible by 7).
* exactness: a child u*p + d sits |d/u| = 1/sqrt(7) ~ 0.378 lattice units
  from p — strictly inside the rounding hexagon's inradius 1/2, so
  parent(child) == p ALWAYS, in exact arithmetic and in doubles (the
  0.122-unit margin dwarfs the 1-ulp error of the /7.0).

Geometric note: like H3, hex hierarchies cannot nest exactly — a child
hexagon's *area* pokes slightly outside its parent — but the ID algebra
is an exact 7-ary tree, which is what rollup/drilldown queries need.
The algebra is projection-agnostic: querylib's `hex_parent_counts` runs
it on the spherical-mercator plane so DuckDB can oracle it bit-exactly;
pairing it with kernels/dgg.py's isea forward gives the icosahedral
variant (same lattice math, no code change).
"""

from __future__ import annotations

import numpy as np

# the 7 aperture digits: center + 6 axial neighbors (a complete residue
# system of Z[tau] modulo u = 2 + tau), ORDERED so that index i is the
# residue (a + 3b) mod 7 of the offset (a, b) — then the child digit is
# pure integer arithmetic (no 7-way branch), and the SQL spelling stays
# one whole-stage-codegen expression instead of a 14-branch CASE
DIGITS = ((0, 0), (1, 0), (-1, 1), (0, 1), (0, -1), (1, -1), (-1, 0))
_DIG_Q = np.array([d[0] for d in DIGITS])
_DIG_R = np.array([d[1] for d in DIGITS])


def cube_round(aq, ar):
    """Round fractional axial coords to the containing hex (integer axial).

    Standard cube rounding: round all three cube coords, then repair the
    one with the largest rounding error so x+y+z == 0 holds.
    """
    aq = np.asarray(aq, dtype=np.float64)
    ar = np.asarray(ar, dtype=np.float64)
    ay = -aq - ar
    rq, ry, rr = np.round(aq), np.round(ay), np.round(ar)
    dq, dy, dr = np.abs(rq - aq), np.abs(ry - ay), np.abs(rr - ar)
    fix_q = (dq > dy) & (dq > dr)
    fix_r = ~fix_q & (dr > dy)
    out_q = np.where(fix_q, -ry - rr, rq)
    out_r = np.where(fix_r, -rq - ry, rr)
    return out_q.astype(np.int64), out_r.astype(np.int64)


def xy_to_hex(x, y, size, decimals=6):
    """Planar (x, y) -> integer axial hex (q, r) with circumradius `size`
    (pointy-top; same mapping as querylib's hex SQL, including its
    round-to-`decimals` quantization of the fractional axial coords —
    the quantization DEFINES cell membership for points sitting exactly
    on a hexagon corner, e.g. axial fraction 1/3, so both engines must
    apply it identically to bin identically). Pass decimals=None for the
    raw unquantized mapping."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    aq = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size
    ar = (y * 2.0 / 3.0) / size
    if decimals is not None:
        aq = np.round(aq, decimals)
        ar = np.round(ar, decimals)
    return cube_round(aq, ar)


def hex_parent(q, r):
    """Aperture-7 parent of integer axial (q, r): hexround(z * (3-tau) / 7)."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return cube_round((3.0 * q + r) / 7.0, (2.0 * r - q) / 7.0)


def hex_children(q, r):
    """The 7 children of (q, r): u*p + d, d in DIGITS. Returns (7, ...) arrays."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    cq0 = 2 * q - r
    cr0 = q + 3 * r
    cq = np.stack([cq0 + d[0] for d in DIGITS])
    cr = np.stack([cr0 + d[1] for d in DIGITS])
    return cq, cr


def child_digit(q, r, pq, pr):
    """Digit index (0..6) of child (q, r) under parent (pq, pr); -1 if the
    pair is not a parent/child pair.

    The index is the residue (dq + 3*dr) mod 7 of the offset
    d = z - u*p, injective over the 7 digit offsets (DIGITS is ordered so
    index == residue). Pure integer arithmetic — no 7-way branch."""
    dq = np.asarray(q) - (2 * np.asarray(pq) - np.asarray(pr))
    dr = np.asarray(r) - (np.asarray(pq) + 3 * np.asarray(pr))
    dig = (dq + 3 * dr) % 7  # numpy % is nonnegative for positive modulus
    ok = (_DIG_Q[dig] == dq) & (_DIG_R[dig] == dr)
    return np.where(ok, dig, -1).astype(np.int64)


def hex_ancestry(x, y, size, levels):
    """(x, y) -> [(q, r) at finest res, parent, grandparent, ...] —
    `levels + 1` integer axial pairs, coarsening by aperture 7 each step."""
    q, r = xy_to_hex(x, y, size)
    out = [(q, r)]
    for _ in range(levels):
        q, r = hex_parent(q, r)
        out.append((q, r))
    return out
