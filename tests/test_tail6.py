"""sch / horner / unified gridshift / xyzgridshift / deformation /
tinshift: roundtrip + semantic checks (no reference gie vectors exist
without external grid files; the TC32 polynomial case uses the reference
documentation coefficients, docs/source/operations/transformations/
horner.rst:165-178)."""

import numpy as np
import pytest

import proj_spark

D = np.radians

TC32 = (
    "+proj=horner +ellps=intl +range=500000 "
    "+fwd_origin=877605.269066,6125810.306769 "
    "+inv_origin=877605.760036,6125811.281773 +deg=4 "
    "+fwd_v=6.1258112678e+06,9.9999971567e-01,1.5372750011e-10,5.9300860915e-15,2.2609497633e-19,4.3188227445e-05,2.8225130416e-10,7.8740007114e-16,-1.7453997279e-19,1.6877465415e-10,-1.1234649773e-14,-1.7042333358e-18,-7.9303467953e-15,-5.2906832535e-19,3.9984284847e-19 "
    "+fwd_u=8.7760574982e+05,9.9999752475e-01,2.8817299305e-10,5.5641310680e-15,-1.5544700949e-18,-4.1357045890e-05,4.2106213519e-11,2.8525551629e-14,-1.9107771273e-18,3.3615590093e-10,2.4380247154e-14,-2.0241230315e-18,1.2429019719e-15,5.3886155968e-19,-1.0167505000e-18 "
    "+inv_v=6.1258103208e+06,1.0000002826e+00,-1.5372762184e-10,-5.9304261011e-15,-2.2612705361e-19,-4.3188331419e-05,-2.8225549995e-10,-7.8529116371e-16,1.7476576773e-19,-1.6875687989e-10,1.1236475299e-14,1.7042518057e-18,7.9300735257e-15,5.2881862699e-19,-3.9990736798e-19 "
    "+inv_u=8.7760527928e+05,9.9999752545e-01,-2.8817540032e-10,-5.5627059451e-15,1.5543637570e-18,4.1357152105e-05,-4.2114813612e-11,-2.8523713454e-14,1.9109017837e-18,-3.3616407783e-10,-2.4382678126e-14,2.0245020199e-18,-1.2441377565e-15,-5.3885232648e-19,1.0167203661e-18"
)

STB = (
    "+proj=horner +ellps=intl +range=500000 "
    "+fwd_origin=4.94690026817276e+05,6.13342113183056e+06 "
    "+inv_origin=6.19480258923588e+05,6.13258568148837e+06 +deg=3 "
    "+fwd_c=6.13258562111350e+06,6.19480105709997e+05,9.99378966275206e-01,-2.82153291753490e-02,-2.27089979140026e-10,-1.77019590701470e-09,1.08522286274070e-14,2.11430298751604e-15 "
    "+inv_c=6.13342118787027e+06,4.94690181709311e+05,9.99824464710368e-01,2.82279070814774e-02,7.66123542220864e-11,1.78425334628927e-09,-1.05584823306400e-14,-3.32554258683744e-15"
)


def test_horner_real_roundtrip():
    op = proj_spark.create(TC32)
    x = np.array([877605.0, 900000.0, 850000.0])
    y = np.array([6125810.0, 6200000.0, 6100000.0])
    X, Y, _, _ = op.fwd(x, y)
    # the fwd/inv polynomials are independently fitted, so the closure
    # loosens away from the fit origin (sub-mm at the origin, ~dm at the
    # region edge) — the same behavior as the reference pair
    xb, yb, _, _ = op.inv(X, Y)
    assert abs(xb[0] - x[0]) < 1e-4 and abs(yb[0] - y[0]) < 1e-4
    assert np.max(np.abs(xb - x)) < 0.5
    assert np.max(np.abs(yb - y)) < 0.5


def test_horner_iterative_matches_explicit():
    op = proj_spark.create(TC32)
    op_it = proj_spark.create(TC32.replace(
        "+inv_v=", "+IGNORED_v=").replace("+inv_u=", "+IGNORED_u=").replace(
        "+inv_origin=877605.760036,6125811.281773 ", ""))
    assert not op_it.explicit_inv
    x = np.array([877605.0, 900000.0])
    y = np.array([6125810.0, 6200000.0])
    X, Y, _, _ = op.fwd(x, y)
    xi, yi, _, _ = op_it.inv(X, Y)
    # the iterative inverse solves the forward polynomial exactly, so the
    # roundtrip closes to machine precision (unlike the fitted explicit
    # inverse pair)
    assert np.max(np.abs(xi - x)) < 1e-6
    assert np.max(np.abs(yi - y)) < 1e-6


def test_horner_complex_roundtrip():
    op = proj_spark.create(STB)
    x = np.array([494690.0, 500000.0])
    y = np.array([6133421.0, 6130000.0])
    X, Y, _, _ = op.fwd(x, y)
    xb, yb, _, _ = op.inv(X, Y)
    assert np.max(np.abs(xb - x)) < 2e-2
    assert np.max(np.abs(yb - y)) < 2e-2


def test_sch_roundtrip_and_origin():
    op = proj_spark.create(
        "+proj=sch +plat_0=40 +plon_0=-75 +phdg_0=90 +h_0=0 +ellps=WGS84")
    # peg point maps to (0, 0, ~0)
    x, y, z, _ = op.fwd(np.array([D(-75.0)]), np.array([D(40.0)]),
                        np.array([0.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6 and abs(z[0]) < 1e-6
    lons = D(np.array([-75.0, -74.5, -75.5]))
    lats = D(np.array([40.0, 40.3, 39.8]))
    h = np.array([0.0, 1000.0, -200.0])
    X, Y, Z, _ = op.fwd(lons, lats, h)
    lo, la, hh, _ = op.inv(X, Y, Z)
    assert np.max(np.abs(np.degrees(lo) - np.degrees(lons))) < 1e-9
    assert np.max(np.abs(np.degrees(la) - np.degrees(lats))) < 1e-9
    assert np.max(np.abs(hh - h)) < 1e-6


def test_gridshift_unified_roundtrip():
    op = proj_spark.create("+proj=gridshift +grids=synthetic_world +ellps=GRS80")
    lons, lats = D([10.0, -120.0]), D([45.0, -30.0])
    z = np.zeros(2)
    lo, la, zz, _ = op.fwd(lons, lats, z)
    assert np.any(zz != 0)  # vertical band applied
    lo2, la2, z2, _ = op.inv(lo, la, zz)
    assert np.max(np.abs(np.degrees(lo2 - lons))) < 1e-10
    assert np.max(np.abs(np.degrees(la2 - lats))) < 1e-10
    assert np.max(np.abs(z2)) < 1e-9


def test_xyzgridshift_roundtrip():
    op = proj_spark.create("+proj=xyzgridshift +grids=synthetic_world +ellps=GRS80")
    X = np.array([3e6, -2e6])
    Y = np.array([1e6, 4e6])
    Z = np.array([5e6, 4e6])
    X2, Y2, Z2, _ = op.fwd(X, Y, Z)
    assert np.any(X2 != X)
    Xb, Yb, Zb, _ = op.inv(X2, Y2, Z2)
    # reference iterative_adjustment stops at err^2 < 1e-10 m^2
    assert np.max(np.abs(Xb - X)) < 1e-4
    assert np.max(np.abs(Yb - Y)) < 1e-4
    assert np.max(np.abs(Zb - Z)) < 1e-4


def test_deformation_linear_in_dt():
    base = "+proj=deformation +grids=synthetic_world +ellps=GRS80 +dt={dt}"
    X = np.array([3194419.0]); Y = np.array([3194419.0]); Z = np.array([4487348.0])
    op1 = proj_spark.create(base.format(dt=1.0))
    op2 = proj_spark.create(base.format(dt=2.0))
    X1, Y1, Z1, _ = op1.fwd(X, Y, Z)
    X2, Y2, Z2, _ = op2.fwd(X, Y, Z)
    # shift is dt-linear
    assert abs((X2[0] - X[0]) - 2 * (X1[0] - X[0])) < 1e-9
    Xb, Yb, Zb, _ = op1.inv(X1, Y1, Z1)
    assert abs(Xb[0] - X[0]) < 1e-6 and abs(Zb[0] - Z[0]) < 1e-6


def test_tinshift_barycentric():
    op = proj_spark.create("+proj=tinshift +file=synthetic_tin")
    # vertex 0 gets exactly its own offset
    lo, la, z, _ = op.fwd(np.array([D(0.0)]), np.array([D(0.0)]),
                          np.zeros(1))
    assert abs(np.degrees(lo[0]) - 1e-4) < 1e-12
    assert abs(np.degrees(la[0]) - -2e-4) < 1e-12
    assert abs(z[0] - 0.5) < 1e-12
    # outside the triangulation -> poison
    lo, la, _, _ = op.fwd(np.array([D(10.0)]), np.array([D(10.0)]),
                          np.zeros(1))
    assert np.isnan(lo[0]) and np.isnan(la[0])
    # interior roundtrip
    lons, lats = D([0.7, 1.2]), D([0.9, 1.8])
    lo, la, z, _ = op.fwd(lons, lats, np.zeros(2))
    lo2, la2, z2, _ = op.inv(lo, la, z)
    assert np.max(np.abs(np.degrees(lo2 - lons))) < 1e-11
    assert np.max(np.abs(np.degrees(la2 - lats))) < 1e-11


def test_defmodel_velocity_and_roundtrip():
    op = proj_spark.create("+proj=defmodel +model=synthetic_model +ellps=GRS80")
    X = np.array([3194419.0]); Y = np.array([3194419.0]); Z = np.array([4487348.0])
    t0 = np.array([2010.0]); t5 = np.array([2015.0])
    X0, Y0, Z0, _ = op.fwd(X, Y, Z, t0)
    # at the epoch the velocity function is zero
    assert abs(X0[0] - X[0]) < 1e-9
    X5, Y5, Z5, _ = op.fwd(X, Y, Z, t5)
    assert abs(X5[0] - X[0]) > 0
    Xb, Yb, Zb, _ = op.inv(X5, Y5, Z5, t5)
    assert abs(Xb[0] - X[0]) < 1e-6 and abs(Zb[0] - Z[0]) < 1e-6
