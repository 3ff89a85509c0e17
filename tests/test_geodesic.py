"""Geodesic kernel tests.

1. The 20-point GeographicLib test set the reference vendors in
   src/tests/geodtest.c:43-130 (lat1 lon1 azi1 / lat2 lon2 azi2 / s12 a12
   m12 M12 ...), asserted at micrometre / nano-degree tolerances.
2. Series validation: the order-6 A1/C1/A2/C2/A3/C3 coefficients
   (tools/derive_geodesic_series.py) against numeric quadrature of the
   defining integrals.
3. direct-inverse roundtrip property over random points.
"""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark.kernels.core import Ellipsoid
from proj_spark.kernels import geodesic as G

WGS84 = Ellipsoid(6378137.0, 6378137.0 * (1 - 1 / 298.257223563))

# (lat1, lon1, azi1, lat2, lon2, azi2, s12, m12, M12) -- reference
# src/tests/geodtest.c testcases[20]
CASES = [
    (35.60777, -139.44815, 111.098748429560326, -11.17491, -69.95921, 129.289270889708762, 8935244.5604818305, 6273170.2055303837, 0.16606318447386067),
    (55.52454, 106.05087, 22.020059880982801, 77.03196, 197.18234, 109.112041110671519, 4105086.1713924406, 3828869.3344387607, 0.80076349608092607),
    (-21.97856, 142.59065, -32.44456876433189, 41.84138, 98.56635, -41.84359951440466, 8394328.894657671, 6161154.5773110616, 0.24816339233950381),
    (-66.99028, 112.2363, 173.73491240878403, -12.70631, 285.90344, 2.512956620913668, 11150344.2312080241, 6289939.5670446687, -0.17199490274700385),
    (-17.42761, 173.34268, -159.033557661192928, -15.84784, 5.93557, -20.787484651536988, 16076603.1631180673, 3732902.1583877189, -0.81273638700070476),
    (32.84994, 48.28919, 150.492927788121982, -56.28556, 202.29132, 48.113449399816759, 16727068.9438164461, 3147838.1910180939, -0.87334918086923126),
    (6.96833, 52.74123, 92.581585386317712, -7.39675, 206.17291, 90.721692165923907, 17102477.2496958388, 2772035.6169917581, -0.89991282520302447),
    (-50.56724, -16.30485, -105.439679907590164, -33.56571, -94.97412, -47.348547835650331, 6455670.5118668696, 5409150.7979815838, 0.53053508035997263),
    (-58.93002, -8.90775, 140.965397902500679, -8.91104, 133.13503, 19.255429433416599, 11756066.0219864627, 6151101.2270708536, -0.26548622269867183),
    (-68.82867, -74.28391, 93.774347763114881, -50.63005, -8.36685, 34.65564085411343, 3956936.926063544, 3708890.9544062657, 0.81443963736383502),
    (-10.62672, -32.0898, -86.426713286747751, 5.883, -134.31681, -80.473780971034875, 11470869.3864563009, 6184411.6622659713, -0.23138683500430237),
    (-21.76221, 166.90563, 29.319421206936428, 48.72884, 213.97627, 43.508671946410168, 9098627.3986554915, 6299240.9166992283, 0.13965943368590333),
    (-19.79938, -174.47484, 71.167275780171533, -11.99349, -154.35109, 65.589099775199228, 2319004.8601169389, 2267960.8703918325, 0.93427001867125849),
    (-11.95887, -116.94513, 92.712619830452549, 4.57352, 7.16501, 78.64960934409585, 13834722.5801401374, 5228093.177931598, -0.56879356755666463),
    (-87.85331, 85.66836, -65.120313040242748, 66.48646, 16.09921, -4.888658719272296, 17286615.3147144645, 2635887.4729110181, -0.90697975771398578),
    (1.74708, 128.32011, -101.584843631173858, -11.16617, 11.87109, -86.325793296437476, 12942901.1241347408, 5682744.8413270572, -0.44857868222697644),
    (-25.72959, -144.90758, -153.647468693117198, -57.70581, -269.17879, -48.343983158876487, 9413446.7452453107, 6356176.6898881281, 0.09492245755254703),
    (-41.22777, 122.32875, 14.285113402275739, -7.57291, 130.37946, 10.805303085187369, 3812686.035106021, 3588703.8812128856, 0.82605222593217889),
    (11.01307, 138.25278, 79.43682622782374, 6.62726, 247.05981, 103.708090215522657, 11911190.819018408, 6070904.722786735, -0.29767608923657404),
    (-29.47124, 95.14681, -163.779130441688382, -27.46601, -69.15955, -15.909335945554969, 13487015.8381145492, 5481428.9945736388, -0.51527225545373252),
]

_ARR = np.array(CASES)
d = np.radians


class TestReferenceVectors:
    def test_inverse(self):
        lat1, lon1, azi1, lat2, lon2, azi2, s12, m12, M12 = _ARR.T
        s, a1, a2, m, M = G.solver(WGS84).inverse(
            d(lon1), d(lat1), d(lon2), d(lat2), want_scale=True)
        assert np.max(np.abs(s - s12)) < 1e-6
        assert np.max(np.abs(((np.degrees(a1) - azi1 + 180) % 360) - 180)) < 1e-12
        assert np.max(np.abs(((np.degrees(a2) - azi2 + 180) % 360) - 180)) < 1e-12
        assert np.max(np.abs(m - m12)) < 1e-6
        assert np.max(np.abs(M - M12)) < 1e-12

    def test_direct(self):
        lat1, lon1, azi1, lat2, lon2, azi2, s12, m12, M12 = _ARR.T
        lo2, la2, az2, m, M = G.solver(WGS84).direct(
            d(lon1), d(lat1), d(azi1), s12, want_scale=True)
        assert np.max(np.abs(np.degrees(la2) - lat2)) < 1e-12
        assert np.max(np.abs(((np.degrees(lo2) - lon2 + 180) % 360) - 180)) < 1e-12
        assert np.max(np.abs(((np.degrees(az2) - azi2 + 180) % 360) - 180)) < 1e-12
        assert np.max(np.abs(m - m12)) < 1e-6
        assert np.max(np.abs(M - M12)) < 1e-12


class TestSeriesVsQuadrature:
    """Validate the embedded order-6 series against numeric integration of
    the defining integrals at WGS84-scale eps."""

    def _quad(self, f, sig, n=20000):
        x = np.linspace(0.0, sig, n + 1)
        trap = getattr(np, "trapezoid", None) or np.trapz
        return trap(f(x), x)

    @pytest.mark.parametrize("eps", [5e-4, 1.679e-3, 3e-3])
    def test_I1(self, eps):
        k2 = 4 * eps / (1 - eps) ** 2
        for sig in (0.3, 1.1, 2.6):
            truth = self._quad(lambda s: np.sqrt(1 + k2 * np.sin(s) ** 2), sig)
            got = (1 + G._A1m1(np.float64(eps))) * (
                sig + G._sin_series([np.float64(c) for c in G._C1(np.float64(eps))],
                                    np.sin(np.float64(sig)), np.cos(np.float64(sig))))
            assert abs(got - truth) < 1e-9

    @pytest.mark.parametrize("eps", [5e-4, 1.679e-3, 3e-3])
    def test_I2(self, eps):
        k2 = 4 * eps / (1 - eps) ** 2
        for sig in (0.3, 1.1, 2.6):
            truth = self._quad(lambda s: 1 / np.sqrt(1 + k2 * np.sin(s) ** 2), sig)
            got = (1 + G._A2m1(np.float64(eps))) * (
                sig + G._sin_series([np.float64(c) for c in G._C2(np.float64(eps))],
                                    np.sin(np.float64(sig)), np.cos(np.float64(sig))))
            assert abs(got - truth) < 1e-9

    def test_I3(self):
        n = 0.00167922038638370  # WGS84 third flattening
        f = 2 * n / (1 + n)
        eps = 1.6792e-3
        k2 = 4 * eps / (1 - eps) ** 2
        sol = G.GeodSolver(Ellipsoid(1.0, 1.0 - f))
        for sig in (0.4, 1.3, 2.9):
            truth = self._quad(
                lambda s: (2 - f) / (1 + (1 - f) * np.sqrt(1 + k2 * np.sin(s) ** 2)), sig)
            e = np.asarray(eps)
            got = sol._I3(e, np.sin(np.asarray(sig)), np.cos(np.asarray(sig)),
                          np.asarray(sig))
            assert abs(float(got) - truth) < 1e-9

    def test_C1p_reversion(self):
        eps = 2.5e-3
        C1 = [float(c) for c in G._C1(np.float64(eps))]
        C1p = [float(c) for c in G._C1p(np.float64(eps))]
        for tau in np.linspace(0.1, 6.2, 23):
            sig = tau + sum(c * np.sin(2 * (l + 1) * tau) for l, c in enumerate(C1p))
            back = sig + sum(c * np.sin(2 * (l + 1) * sig) for l, c in enumerate(C1))
            assert abs(back - tau) < 1e-14


class TestRoundtrip:
    def test_direct_inverse_property(self):
        rng = np.random.default_rng(11)
        N = 5000
        lon1 = rng.uniform(-np.pi, np.pi, N)
        lat1 = rng.uniform(-1.45, 1.45, N)
        azi = rng.uniform(-np.pi, np.pi, N)
        s = rng.uniform(1.0, 1.8e7, N)
        lo2, la2, _ = G.geod_direct(WGS84, lon1, lat1, azi, s)
        s_b, a1_b, _ = G.geod_inverse(WGS84, lon1, lat1, lo2, la2)
        assert np.nanmax(np.abs(s_b - s)) < 1e-6

    def test_sphere_equals_great_circle(self):
        R = 6371000.0
        sph = Ellipsoid(R, R)
        rng = np.random.default_rng(5)
        N = 2000
        lon1 = rng.uniform(-np.pi, np.pi, N)
        lat1 = rng.uniform(-1.5, 1.5, N)
        lon2 = rng.uniform(-np.pi, np.pi, N)
        lat2 = rng.uniform(-1.5, 1.5, N)
        s, _, _ = G.geod_inverse(sph, lon1, lat1, lon2, lat2)
        want = R * np.arccos(np.clip(
            np.sin(lat1) * np.sin(lat2)
            + np.cos(lat1) * np.cos(lat2) * np.cos(lon2 - lon1), -1, 1))
        assert np.max(np.abs(s - want)) < 1e-5

    def test_concurrent_inverse_threads(self):
        """The module-level solver() cache hands ONE instance to all
        callers; its Clenshaw scratch buffers are thread-local, so
        concurrent inverse() calls must not corrupt each other (they did
        clobber a shared ping-pong workspace before the buffers moved to
        threading.local)."""
        import threading
        rng = np.random.default_rng(11)
        N = 60000
        args = [(rng.uniform(-np.pi, np.pi, N), rng.uniform(-1.5, 1.5, N),
                 rng.uniform(-np.pi, np.pi, N), rng.uniform(-1.5, 1.5, N))
                for _ in range(4)]
        want = [G.geod_inverse(WGS84, *a)[0] for a in args]
        got = [None] * 4

        def work(i):
            got[i] = G.geod_inverse(WGS84, *args[i])[0]

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for w, g_ in zip(want, got):
            assert np.array_equal(w, g_)

    def test_solver_pickles_through_cloudpickle(self):
        """Operators embedding a GeodSolver (ellipsoidal aeqd/gnom) are
        captured in pandas-UDF closures and cloudpickled by Spark at
        action time; the thread-local scratch must not break that (it
        did: threading.local is unpicklable), and the unpickled solver
        must produce identical results."""
        import cloudpickle
        from proj_spark.kernels.geodesic import GeodSolver
        from proj_spark.kernels.core import Ellipsoid
        g = GeodSolver(Ellipsoid(6378137.0, 6356752.314245179))
        rng = np.random.default_rng(7)
        a = (rng.uniform(-np.pi, np.pi, 512), rng.uniform(-1.5, 1.5, 512),
             rng.uniform(-np.pi, np.pi, 512), rng.uniform(-1.5, 1.5, 512))
        want = g.inverse(*a)
        g2 = cloudpickle.loads(cloudpickle.dumps(g))
        got = g2.inverse(*a)
        for w, o in zip(want, got):
            assert np.array_equal(w, o)
        # operator-level: the aeqd setup stores a solver on the instance
        import proj_spark
        op = proj_spark.create("+proj=aeqd +lat_0=40 +lon_0=6 +ellps=WGS84")
        op2 = cloudpickle.loads(cloudpickle.dumps(op))
        x1, y1, _, _ = op.fwd(np.radians([7.0]), np.radians([41.0]))
        x2, y2, _, _ = op2.fwd(np.radians([7.0]), np.radians([41.0]))
        assert x1 == x2 and y1 == y2
