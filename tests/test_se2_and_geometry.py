import numpy as np
import pytest

from sparse_gslam_tpu.utils import se2
from sparse_gslam_tpu.ops import line_geometry as lg


rng = np.random.default_rng(42)


def rand_pose(n=()):
    p = rng.uniform(-5, 5, tuple(np.atleast_1d(n)) + (3,) if n else (3,))
    p[..., 2] = rng.uniform(-np.pi, np.pi, p[..., 2].shape)
    return p


class TestSE2:
    def test_compose_inverse_identity(self):
        a = rand_pose(7)
        ident = se2.compose(a, se2.inverse(a))
        np.testing.assert_allclose(ident, 0, atol=1e-12)

    def test_compose_matches_matrix(self):
        a, b = rand_pose(), rand_pose()
        c = se2.compose(a, b)
        Ra = se2.rotation_matrix(a[2])
        np.testing.assert_allclose(c[:2], a[:2] + Ra @ b[:2], atol=1e-12)
        assert abs(se2.wrap_angle(c[2] - a[2] - b[2])) < 1e-12

    def test_apply(self):
        a = rand_pose()
        pts = rng.uniform(-3, 3, (5, 2))
        out = se2.apply(a, pts)
        R = se2.rotation_matrix(a[2])
        np.testing.assert_allclose(out, (R @ pts.T).T + a[:2], atol=1e-12)

    def test_wrap(self):
        th = np.array([0.0, np.pi, -np.pi, 3 * np.pi, -2.5 * np.pi])
        w = se2.wrap_angle(th)
        assert np.all(w > -np.pi - 1e-12) and np.all(w <= np.pi + 1e-12)
        np.testing.assert_allclose(np.cos(w), np.cos(th), atol=1e-12)
        np.testing.assert_allclose(np.sin(w), np.sin(th), atol=1e-12)

    def test_jax_path(self):
        import jax.numpy as jnp

        a, b = rand_pose(), rand_pose()
        np.testing.assert_allclose(
            se2.compose(jnp.array(a), jnp.array(b)),
            se2.compose(a, b),
            atol=1e-6,
        )


class TestLineGeometry:
    def test_topolar_on_line(self):
        p1 = np.array([1.0, 2.0])
        p2 = np.array([3.0, 1.0])
        rt = lg.topolar(p1, p2)
        # both points satisfy x cos t + y sin t = rho
        for p in (p1, p2):
            assert abs(p @ [np.cos(rt[1]), np.sin(rt[1])] - rt[0]) < 1e-12
        assert rt[0] >= 0

    def test_transform_line_roundtrip(self):
        rt = np.array([2.0, 0.7])
        pose = rand_pose()
        inv = se2.inverse(pose)
        rt_b = lg.transform_line(rt, inv[:2], inv[2])
        rt_back = lg.transform_line(rt_b, pose[:2], pose[2])
        np.testing.assert_allclose(rt_back, rt, atol=1e-12)

    def test_transform_line_consistent_with_points(self):
        # transform two points on the line by T^-1; the line through the
        # transformed points must equal transform_line(rt, T^-1)
        p1 = np.array([1.0, 2.0])
        p2 = np.array([3.0, 1.0])
        rt = lg.topolar(p1, p2)
        pose = rand_pose()
        inv = se2.inverse(pose)
        rt_t = lg.transform_line(rt, inv[:2], inv[2])
        q1, q2 = se2.apply(inv, p1), se2.apply(inv, p2)
        rt_q = lg.topolar(q1, q2)
        np.testing.assert_allclose(
            [rt_t[0], np.cos(rt_t[1]), np.sin(rt_t[1])],
            [rt_q[0], np.cos(rt_q[1]), np.sin(rt_q[1])],
            atol=1e-9,
        )

    def test_ll_distance(self):
        rt = np.array([1.0, np.pi / 2])  # the line y = 1
        err, t0, t1 = lg.ll_distance(
            rt, np.array([0.0, 1.5]), np.array([2.0, 0.5])
        )
        assert abs(err - 1.0) < 1e-12
        assert t0 < t1

    def test_point_line_distance(self):
        rt = np.array([2.0, 0.0])  # x = 2
        pts = np.array([[3.0, 0.0], [0.5, 0.0]])
        polar = np.stack(
            [np.linalg.norm(pts, axis=1), np.arctan2(pts[:, 1], pts[:, 0])], 1
        )
        d = lg.point_line_distance(polar, rt)
        np.testing.assert_allclose(d, [1.0, 1.5], atol=1e-12)


class TestChi2:
    def test_reference_constant(self):
        from sparse_gslam_tpu.utils.chi2 import chi2_quantile

        # log_runner.cpp:184 uses 11.345 = chi2(3).ppf(0.99)
        assert abs(chi2_quantile(0.99, 3) - 11.3449) < 0.05

    def test_wilson_hilferty_close(self):
        from sparse_gslam_tpu.utils import chi2 as c2

        if c2._scipy_chi2 is None:
            pytest.skip("scipy missing")
        for dof in (3, 10, 50, 200):
            exact = float(c2._scipy_chi2.ppf(0.99, dof))
            z = c2._Z[0.99]
            import math

            wh = dof * (1 - 2 / (9 * dof) + z * math.sqrt(2 / (9 * dof))) ** 3
            assert abs(wh - exact) / exact < 0.01
