"""Derive the order-6 geodesic series coefficients exactly (no sympy).

Framework: Karney, "Algorithms for geodesics", J. Geodesy 87(1), 2013
(the algorithm the reference embeds as src/geodesic.c). We re-derive every
coefficient from the integral definitions with exact rational arithmetic:

  I1(s) = ∫ sqrt(1 + k2 sin^2 s) ds              = A1 (s + Σ C1l sin 2ls)
  I2(s) = ∫ ds / sqrt(1 + k2 sin^2 s)            = A2 (s + Σ C2l sin 2ls)
  I3(s) = ∫ (2-f)/(1+(1-f) sqrt(1+k2 sin^2 s)) ds = A3 (s + Σ C3l sin 2ls)
  k2 = 4 eps/(1-eps)^2,  f = 2n/(1+n)
  C1' : reversion of tau = I1(sigma)/A1  ->  sigma = tau + Σ C1pl sin 2l tau

Representation: truncated polynomials in Q[eps, n][cos 2sigma]; powers of
cos map to multiple angles via the binomial identity
cos^k t = 2^-k Σ_j C(k,j) cos((k-2j) t), so the Fourier split is exact.
The reversion is done by Lagrange iteration in the sin/cos harmonic basis.

    python tools/derive_geodesic_series.py      # prints python literals
"""

from __future__ import annotations

from fractions import Fraction as Fr
from math import comb

ORDER = 6

# ---------------------------------------------------------------------------
# Q[eps, n] truncated at eps^ORDER, n^ORDER: dict (pe, pn) -> Fr
# ---------------------------------------------------------------------------

def pmul(a, b, omax=ORDER):
    out = {}
    for (e1, n1), c1 in a.items():
        for (e2, n2), c2 in b.items():
            e, nn = e1 + e2, n1 + n2
            if e > omax or nn > omax:
                continue
            out[(e, nn)] = out.get((e, nn), Fr(0)) + c1 * c2
    return {k: v for k, v in out.items() if v != 0}


def padd(a, b):
    out = dict(a)
    for k, v in b.items():
        out[k] = out.get(k, Fr(0)) + v
    return {k: v for k, v in out.items() if v != 0}


def pscale(a, s):
    return {k: v * Fr(s) for k, v in a.items() if v != 0}


def pinv(a, omax=ORDER):
    """1/a for a with nonzero constant term (power series inversion)."""
    c0 = a.get((0, 0))
    assert c0
    inv = {(0, 0): 1 / c0}
    # Newton-ish iteration: inv <- inv*(2 - a*inv), doubles correct order
    for _ in range(6):
        t = pmul(a, inv, omax)
        t = padd(pscale(t, -1), {(0, 0): Fr(2)})
        inv = pmul(inv, t, omax)
    return inv


ONE = {(0, 0): Fr(1)}
EPS = {(1, 0): Fr(1)}
N = {(0, 1): Fr(1)}


def k2_series():
    """k2 = 4 eps (1-eps)^-2 = 4 Σ (m+1) eps^(m+1)."""
    return {(m + 1, 0): Fr(4 * (m + 1)) for m in range(ORDER)}


# ---------------------------------------------------------------------------
# Q[eps,n][cos 2sigma] -> harmonics: dict l -> coef poly  (cos 2 l sigma)
# ---------------------------------------------------------------------------

def cospoly_mul(a, b):
    """a, b: dict deg->poly in the variable C=cos2s."""
    out = {}
    for d1, c1 in a.items():
        for d2, c2 in b.items():
            d = d1 + d2
            out[d] = padd(out.get(d, {}), pmul(c1, c2))
    return out


def cospoly_to_harmonics(p):
    """C^k -> 2^-k sum_j C(k,j) cos(2(k-2j) s). Returns dict l>=0 -> poly."""
    out = {}
    for k, coef in p.items():
        for j in range(k + 1):
            l = abs(k - 2 * j)
            w = Fr(comb(k, j), 2 ** k)
            out[l] = padd(out.get(l, {}), pscale(coef, w))
    return out


def binom_frac(alpha_num, alpha_den, j):
    """C(alpha, j) for alpha = alpha_num/alpha_den rational."""
    alpha = Fr(alpha_num, alpha_den)
    v = Fr(1)
    for i in range(j):
        v *= (alpha - i) / (i + 1)
    return v


def sqrt_series(u, half=1):
    """(1+u)^(half/2) for u with no constant term: binomial expansion.
    u: cospoly (deg -> coef poly)."""
    out = {0: dict(ONE)}
    term = {0: dict(ONE)}
    for j in range(1, ORDER + 1):
        term = cospoly_mul(term, u)
        w = binom_frac(half, 2, j)
        for d, c in term.items():
            out[d] = padd(out.get(d, {}), pscale(c, w))
    return out


def fourier(integrand_cospoly):
    """F(s) = Σ_l a_l cos 2 l s  ->  A = a_0,  C_l = a_l / (2 l A)
    (since ∫(F-a0) = Σ a_l sin 2ls/(2l) and I = A(s + Σ C_l sin 2ls))."""
    h = cospoly_to_harmonics(integrand_cospoly)
    A = h.get(0, {})
    Ainv = pinv(A)
    C = {}
    for l in range(1, ORDER + 1):
        if l in h:
            C[l] = pscale(pmul(h[l], Ainv), Fr(1, 2 * l))
    return A, C


def poly_str(p, var_order=("eps", "n")):
    if not p:
        return "0"
    terms = []
    for (pe, pn) in sorted(p, key=lambda k: (k[0] + k[1], k)):
        c = p[(pe, pn)]
        s = f"Fr({c.numerator},{c.denominator})"
        if pe:
            s += f"*eps**{pe}"
        if pn:
            s += f"*n**{pn}"
        terms.append(s)
    return " + ".join(terms)


# ---------------------------------------------------------------------------
# Reversion in the sin-harmonic basis for C1'
# ---------------------------------------------------------------------------

def revert_c1(C1):
    """sigma = tau + Σ B_l sin 2 l tau from tau = sigma + Σ C1_l sin 2 l sigma.
    Lagrange iteration keeping terms to eps^ORDER. Basis: ('s'|'c', l) -> poly
    in eps (n unused)."""

    def basis_mul(a, b):
        out = {}
        for (t1, l1), c1 in a.items():
            for (t2, l2), c2 in b.items():
                c = pmul(c1, c2)
                # product-to-sum
                pairs = []
                if t1 == "s" and t2 == "s":
                    pairs = [(("c", abs(l1 - l2)), Fr(1, 2)), (("c", l1 + l2), Fr(-1, 2))]
                elif t1 == "c" and t2 == "c":
                    pairs = [(("c", abs(l1 - l2)), Fr(1, 2)), (("c", l1 + l2), Fr(1, 2))]
                elif t1 == "s" and t2 == "c":
                    pairs = [(("s", l1 + l2), Fr(1, 2)), (("s", l1 - l2), Fr(1, 2))]
                else:
                    pairs = [(("s", l1 + l2), Fr(1, 2)), (("s", l2 - l1), Fr(1, 2))]
                for (tt, ll), w in pairs:
                    if ll < 0:
                        ll, w = -ll, (-w if tt == "s" else w)
                    if ll == 0 and tt == "s":
                        continue
                    key = (tt, ll)
                    out[key] = padd(out.get(key, {}), pscale(c, w))
        return {k: v for k, v in out.items() if v}

    def basis_add(a, b):
        out = dict(a)
        for k, v in b.items():
            out[k] = padd(out.get(k, {}), v)
        return {k: v for k, v in out.items() if v}

    def basis_scale(a, s):
        return {k: pscale(v, s) for k, v in a.items()}

    # delta(tau) approximated iteratively: delta = -Σ C1_l sin(2 l (tau+delta))
    delta = {}
    for _ in range(ORDER + 1):
        newd = {}
        for l, cl in C1.items():
            # sin(2l(tau+delta)) = sin2lt cos(2ld) + cos2lt sin(2ld)
            # expand cos/sin of (2 l delta) as Taylor (delta = O(eps))
            # powers of delta in basis algebra
            dk = {("c", 0): dict(ONE)}  # (2l delta)^0
            sin_part = {}
            cos_part = {("c", 0): dict(ONE)}
            fact = 1
            for j in range(1, ORDER + 1):
                dk = basis_mul(dk, basis_scale(delta, 2 * l))
                fact *= j
                w = Fr((-1) ** ((j - 1) // 2), fact)
                if j % 2 == 1:
                    sin_part = basis_add(sin_part, basis_scale(dk, w))
                else:
                    cos_part = basis_add(cos_part, basis_scale(dk, w))
            term = basis_add(
                basis_mul({("s", l): dict(ONE)}, cos_part),
                basis_mul({("c", l): dict(ONE)}, sin_part))
            newd = basis_add(newd, basis_scale(term, -1))
            # note: C1 applied with harmonic l means sin(2 l sigma); our basis
            # key ('s', l) stands for sin(2 l tau)
            newd_scaled = newd
        # multiply each C1_l in: we folded cl below
        out = {}
        for l, cl in C1.items():
            pass
        # recompute properly: delta = - Σ_l C1_l * sin(2l(tau+delta))
        acc = {}
        for l, cl in C1.items():
            dk = {("c", 0): dict(ONE)}
            sin_part = {}
            cos_part = {("c", 0): dict(ONE)}
            fact = 1
            for j in range(1, ORDER + 1):
                dk = basis_mul(dk, basis_scale(delta, 2 * l))
                fact *= j
                w = Fr((-1) ** ((j - 1) // 2), fact)
                if j % 2 == 1:
                    sin_part = basis_add(sin_part, basis_scale(dk, w))
                else:
                    cos_part = basis_add(cos_part, basis_scale(dk, w))
            term = basis_add(
                basis_mul({("s", l): dict(ONE)}, cos_part),
                basis_mul({("c", l): dict(ONE)}, sin_part))
            acc = basis_add(acc, {k: pmul(v, cl) for k, v in term.items()})
        delta = basis_scale(acc, -1)
    # delta should be pure sin series
    out = {}
    for (t, l), c in delta.items():
        if t == "s" and c:
            out[l] = c
    return out


def main():
    k2 = k2_series()
    sin2 = {0: pscale(ONE, Fr(1, 2)), 1: pscale(ONE, Fr(-1, 2))}  # sin^2 = (1-cos2s)/2
    u = {d: pmul(c, k2) for d, c in sin2.items()}  # k2 sin^2 s

    A1, C1 = fourier(sqrt_series(u, half=1))
    print("# A1 = poly / (1 - eps):")
    print("A1_TIMES_1MEPS =", poly_str(pmul(A1, padd(ONE, pscale(EPS, -1)))))
    for l in sorted(C1):
        print(f"C1[{l}] =", poly_str(C1[l]))

    print()
    C1p = revert_c1({l: c for l, c in C1.items()})
    for l in sorted(C1p):
        print(f"C1p[{l}] =", poly_str(C1p[l]))

    print()
    A2, C2 = fourier(sqrt_series(u, half=-1))
    print("# A2 = poly / (1 + eps):")
    print("A2_TIMES_1PEPS =", poly_str(pmul(A2, padd(ONE, EPS))))
    for l in sorted(C2):
        print(f"C2[{l}] =", poly_str(C2[l]))

    print()
    # I3: (2-f)/(1 + (1-f) sqrt(1+u)), f = 2n/(1+n)
    inv1pn = pinv(padd(ONE, N))
    f = pmul({(0, 1): Fr(2)}, inv1pn)
    one_mf = padd(ONE, pscale(f, -1))
    two_mf = padd(ONE, one_mf)
    sq = sqrt_series(u, half=1)
    den = {d: (pmul(c, one_mf) if True else c) for d, c in sq.items()}
    den[0] = padd(den.get(0, {}), ONE)
    # invert den: den = d0 (1 + v); compute via cospoly Newton using pinv on
    # harmonic-0 part iteratively: write den = c0 + R (R has cos terms)
    c0 = den[0]
    R = {d: c for d, c in den.items() if d != 0}
    c0inv = pinv(c0)
    # 1/(c0+R) = c0inv Σ (-R c0inv)^j
    inv = {0: dict(c0inv)}
    term = {0: dict(ONE)}
    negRc0inv = {d: pscale(pmul(c, c0inv), -1) for d, c in R.items()}
    for _ in range(ORDER):
        term = cospoly_mul(term, negRc0inv)
        for d, c in term.items():
            inv[d] = padd(inv.get(d, {}), pmul(c, c0inv))
    integrand = {d: pmul(c, two_mf) for d, c in inv.items()}
    A3, C3 = fourier(integrand)
    print("A3 =", poly_str(A3))
    for l in sorted(C3):
        if C3[l]:
            print(f"C3[{l}] =", poly_str(C3[l]))


if __name__ == "__main__":
    main()
