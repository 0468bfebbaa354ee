import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from sparse_gslam_tpu.ops import solvers
from sparse_gslam_tpu.utils import se2


rng = np.random.default_rng(3)


def rand_pose(n=None):
    shape = (n, 3) if n else (3,)
    p = rng.uniform(-3, 3, shape)
    p[..., 2] = rng.uniform(-np.pi, np.pi, p[..., 2].shape)
    return p


class TestEdges:
    def test_se2_residual_zero_when_consistent(self):
        xi = rand_pose(5)
        z = rand_pose(5)
        xj = se2.compose(xi, z)
        e = solvers.se2_edge_residual(jnp.array(xi), jnp.array(xj), jnp.array(z))
        np.testing.assert_allclose(e, 0, atol=1e-12)

    def test_se2_jacobians_match_autodiff(self):
        xi, xj, z = rand_pose(), rand_pose(), rand_pose()
        Ji, Jj = solvers.se2_edge_jacobians(
            jnp.array(xi), jnp.array(xj), jnp.array(z)
        )
        Ji_ad = jax.jacfwd(
            lambda a: solvers.se2_edge_residual(a, jnp.array(xj), jnp.array(z))
        )(jnp.array(xi))
        Jj_ad = jax.jacfwd(
            lambda b: solvers.se2_edge_residual(jnp.array(xi), b, jnp.array(z))
        )(jnp.array(xj))
        np.testing.assert_allclose(Ji, Ji_ad, atol=1e-9)
        np.testing.assert_allclose(Jj, Jj_ad, atol=1e-9)

    def test_rhotheta_residual_zero_when_consistent(self):
        from sparse_gslam_tpu.ops.line_geometry import transform_line

        pose = rand_pose()
        lm = np.array([2.0, 0.7])
        inv = se2.inverse(pose)
        z = transform_line(lm, inv[:2], inv[2])
        e = solvers.rhotheta_edge_residual(
            jnp.array(pose), jnp.array(lm), jnp.array(z)
        )
        np.testing.assert_allclose(e, 0, atol=1e-12)

    def test_dcs_weight(self):
        w = solvers.dcs_weight(jnp.array([0.0, 1.0, 100.0]), 1.0)
        np.testing.assert_allclose(w[0], 1.0)
        np.testing.assert_allclose(w[1], 1.0)  # 2*1/(1+1) = 1
        assert w[2] < 0.001


def make_lm_graph(P=8, L=4, E=64, n_poses=6, n_lms=3, seed=0):
    """Small landmark graph: noisy chain of poses observing rho-theta
    landmarks; returns (graph, gt_poses, gt_lms)."""
    r = np.random.default_rng(seed)
    from sparse_gslam_tpu.ops.line_geometry import transform_line

    gt_poses = np.zeros((n_poses, 3))
    for i in range(1, n_poses):
        gt_poses[i] = se2.compose(
            gt_poses[i - 1], np.array([0.8, 0.05, 0.15])
        )
    gt_lms = np.stack(
        [r.uniform(2, 6, n_lms), r.uniform(-np.pi, np.pi, n_lms)], 1
    )

    poses = np.zeros((P, 3))
    pose_valid = np.zeros(P, bool)
    pose_fixed = np.zeros(P, bool)
    odom_meas = np.zeros((P, 3))
    odom_info = np.tile(np.eye(3), (P, 1, 1))
    odom_valid = np.zeros(P, bool)
    pose_valid[:n_poses] = True
    pose_fixed[0] = True
    # noisy initial estimates
    poses[:n_poses] = gt_poses + r.normal(0, 0.05, (n_poses, 3))
    poses[0] = gt_poses[0]
    for i in range(1, n_poses):
        odom_meas[i] = se2.relative(gt_poses[i - 1], gt_poses[i]) + r.normal(
            0, 0.01, 3
        )
        odom_info[i] = np.eye(3) * 100.0
        odom_valid[i] = True

    lms = np.zeros((L, 2))
    lm_valid = np.zeros(L, bool)
    lms[:n_lms] = gt_lms + r.normal(0, 0.03, (n_lms, 2))
    lm_valid[:n_lms] = True

    obs_pose = np.zeros(E, np.int32)
    obs_lm = np.zeros(E, np.int32)
    obs_meas = np.zeros((E, 2))
    obs_info = np.tile(np.eye(2), (E, 1, 1))
    obs_valid = np.zeros(E, bool)
    k = 0
    for i in range(n_poses):
        for j in range(n_lms):
            inv = se2.inverse(gt_poses[i])
            z = transform_line(gt_lms[j], inv[:2], inv[2])
            obs_pose[k] = i
            obs_lm[k] = j
            obs_meas[k] = z + r.normal(0, 0.005, 2)
            obs_info[k] = np.eye(2) * 400.0
            obs_valid[k] = True
            k += 1

    g = solvers.LMGraphData(
        *map(
            jnp.array,
            (
                poses, pose_valid, pose_fixed, odom_meas, odom_info,
                odom_valid, lms, lm_valid, obs_pose, obs_lm, obs_meas,
                obs_info, obs_valid,
            ),
        )
    )
    return g, gt_poses, gt_lms


class TestLandmarkGraphLM:
    def test_chi2_decreases_and_recovers_gt(self):
        g, gt_poses, gt_lms = make_lm_graph()
        chi2_before, dof = solvers.lm_graph_chi2(g)
        g_opt, chi2_after, dof2 = solvers.optimize_landmark_graph(g, 15)
        assert float(chi2_after) < float(chi2_before)
        assert int(dof) == int(dof2) == 3 * 5 + 2 * 18
        n = 6
        err = np.abs(np.asarray(g_opt.poses[:n]) - gt_poses)
        assert err[:, :2].max() < 0.03
        # fixed pose must not move
        np.testing.assert_allclose(g_opt.poses[0], gt_poses[0], atol=1e-12)
        lm_err = np.abs(np.asarray(g_opt.lms[:3]) - gt_lms)
        assert lm_err.max() < 0.03

    def test_masked_slots_untouched(self):
        g, _, _ = make_lm_graph()
        g_opt, _, _ = solvers.optimize_landmark_graph(g, 5)
        np.testing.assert_allclose(g_opt.poses[6:], g.poses[6:], atol=0)
        np.testing.assert_allclose(g_opt.lms[3:], g.lms[3:], atol=0)

    def test_jit_compiles(self):
        g, _, _ = make_lm_graph()
        f = jax.jit(lambda gg: solvers.optimize_landmark_graph(gg, 15))
        g_opt, chi2, dof = f(g)
        assert np.isfinite(float(chi2))


def make_pose_graph(N=32, C=4, n=24, drift=0.02, seed=1):
    r = np.random.default_rng(seed)
    gt = np.zeros((n, 3))
    for i in range(1, n):
        step = np.array([1.0, 0.0, 2 * np.pi / n])  # a circle
        gt[i] = se2.compose(gt[i - 1], step)

    poses = np.zeros((N, 3))
    valid = np.zeros(N, bool)
    fixed = np.zeros(N, bool)
    chain_meas = np.zeros((N, 3))
    chain_info = np.tile(np.eye(3), (N, 1, 1))
    chain_valid = np.zeros(N, bool)
    valid[:n] = True
    fixed[0] = True
    poses[0] = gt[0]
    for i in range(1, n):
        d = se2.relative(gt[i - 1], gt[i]) + r.normal(0, drift, 3)
        chain_meas[i] = d
        chain_info[i] = np.eye(3) * 50.0
        chain_valid[i] = True
        poses[i] = se2.compose(poses[i - 1], d)  # dead-reckoned init

    clo_i = np.zeros(C, np.int32)
    clo_j = np.zeros(C, np.int32)
    clo_meas = np.zeros((C, 3))
    clo_info = np.tile(np.eye(3), (C, 1, 1))
    clo_valid = np.zeros(C, bool)
    # one loop closure: last pose sees first
    clo_i[0], clo_j[0] = 0, n - 1
    clo_meas[0] = se2.relative(gt[0], gt[n - 1])
    clo_info[0] = np.eye(3) * 1000.0
    clo_valid[0] = True

    g = solvers.PoseGraphData(
        *map(
            jnp.array,
            (
                poses, valid, fixed, chain_meas, chain_info, chain_valid,
                clo_i, clo_j, clo_meas, clo_info, clo_valid,
            ),
        )
    )
    return g, gt, n


class TestPoseGraphGN:
    def test_closure_corrects_drift(self):
        g, gt, n = make_pose_graph()
        err_before = np.abs(np.asarray(g.poses[n - 1, :2]) - gt[n - 1, :2]).max()
        g_opt = solvers.optimize_pose_graph(g, phi=1.0, iterations=20)
        err_after = np.abs(
            np.asarray(g_opt.poses[n - 1, :2]) - gt[n - 1, :2]
        ).max()
        assert err_after < err_before * 0.5
        chi2_after = float(solvers.posegraph_chi2(g_opt, 1.0))
        chi2_before = float(solvers.posegraph_chi2(g, 1.0))
        assert chi2_after < chi2_before

    def test_false_closure_downweighted_by_dcs(self):
        g, gt, n = make_pose_graph(C=4)
        # add a wildly wrong closure
        clo_i = np.asarray(g.clo_i).copy()
        clo_j = np.asarray(g.clo_j).copy()
        clo_meas = np.asarray(g.clo_meas).copy()
        clo_valid = np.asarray(g.clo_valid).copy()
        clo_i[1], clo_j[1] = 3, 17
        clo_meas[1] = np.array([20.0, -14.0, 2.0])  # garbage
        clo_valid[1] = True
        g_bad = g._replace(
            clo_i=jnp.array(clo_i), clo_j=jnp.array(clo_j),
            clo_meas=jnp.array(clo_meas), clo_valid=jnp.array(clo_valid),
        )
        g_opt = solvers.optimize_pose_graph(g_bad, phi=1.0, iterations=20)
        err = np.abs(np.asarray(g_opt.poses[n - 1, :2]) - gt[n - 1, :2]).max()
        assert err < 0.5  # the garbage closure must not destroy the fit
        raw = np.asarray(solvers.closure_chi2(g_opt))
        assert raw[1] > 11.345  # and the pruning gate would catch it

    def test_fixed_pose_stationary(self):
        g, gt, n = make_pose_graph()
        g_opt = solvers.optimize_pose_graph(g, phi=1.0, iterations=10)
        np.testing.assert_allclose(g_opt.poses[0], g.poses[0], atol=1e-12)

    def test_jit(self):
        g, _, _ = make_pose_graph()
        f = jax.jit(
            lambda gg: solvers.optimize_pose_graph(gg, 1.0, 20)
        )
        g_opt = f(g)
        assert np.isfinite(np.asarray(g_opt.poses)).all()


class TestTridiagPath:
    def test_tridiag_solve_matches_dense(self):
        rng2 = np.random.default_rng(5)
        P = 20
        # random SPD block-tridiagonal system
        D = np.zeros((P, 3, 3))
        O = np.zeros((P, 3, 3))
        for i in range(P):
            a = rng2.normal(0, 1, (3, 3))
            D[i] = a @ a.T + 4 * np.eye(3)
            if i > 0:
                O[i] = rng2.normal(0, 0.3, (3, 3))
        H = np.zeros((3 * P, 3 * P))
        for i in range(P):
            H[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = D[i]
            if i > 0:
                H[3 * (i - 1) : 3 * i, 3 * i : 3 * i + 3] = O[i]
                H[3 * i : 3 * i + 3, 3 * (i - 1) : 3 * i] = O[i].T
        rhs = rng2.normal(0, 1, (P, 3, 4))
        x = solvers.tridiag_solve(
            jnp.array(D), jnp.array(O), jnp.array(rhs)
        )
        x_ref = np.linalg.solve(H, rhs.reshape(3 * P, 4))
        np.testing.assert_allclose(
            np.asarray(x).reshape(3 * P, 4), x_ref, atol=1e-9
        )

    def test_lm_tridiag_matches_dense_path(self):
        g, gt_poses, gt_lms = make_lm_graph(P=16, L=8, E=64)
        g_d, chi_d, _ = solvers.optimize_landmark_graph(
            g, 10, tridiag_threshold=10**9
        )
        g_t, chi_t, _ = solvers.optimize_landmark_graph(
            g, 10, tridiag_threshold=1
        )
        np.testing.assert_allclose(
            np.asarray(g_t.poses), np.asarray(g_d.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(g_t.lms), np.asarray(g_d.lms), atol=1e-8
        )
        assert abs(float(chi_t) - float(chi_d)) < 1e-8


class TestRhoThetaJacobians:
    def test_closed_form_matches_autodiff(self):
        r = np.random.default_rng(9)
        n = 200
        poses = np.stack(
            [r.uniform(-5, 5, n), r.uniform(-5, 5, n),
             r.uniform(-np.pi, np.pi, n)], 1
        )
        lms = np.stack(
            [r.uniform(0.1, 8, n), r.uniform(-np.pi, np.pi, n)], 1
        )
        zs = np.stack(
            [r.uniform(0.1, 8, n), r.uniform(-np.pi, np.pi, n)], 1
        )
        Jp, Jl = solvers.rhotheta_edge_jacobians(
            jnp.array(poses), jnp.array(lms), jnp.array(zs)
        )
        jac = jax.vmap(
            jax.jacfwd(solvers.rhotheta_edge_residual, argnums=(0, 1))
        )(jnp.array(poses), jnp.array(lms), jnp.array(zs))
        np.testing.assert_allclose(Jp, jac[0], atol=1e-10)
        np.testing.assert_allclose(Jl, jac[1], atol=1e-10)


class TestJointGraph:
    """Final joint landmark+pose solve (solvers.optimize_joint_graph)."""

    def _make(self, P=24, L=6, seed=7, drift=0.03):
        from sparse_gslam_tpu.ops.line_geometry import transform_line

        r = np.random.default_rng(seed)
        # ground-truth square-ish loop
        gt = np.zeros((P, 3))
        for i in range(1, P):
            step = np.array([0.5, 0.0, 0.0])
            if i % (P // 4) == 0:
                step[2] = np.pi / 2
            gt[i] = se2.compose(gt[i - 1], step)
        # lines strictly OUTSIDE the loop's extent: a pose crossing a
        # line flips the rho>=0 normalization branch mid-solve (real
        # data never associates an observation across such a flip)
        lms_gt = np.stack(
            [
                np.array([6.0 + 0.7 * k, 0.3 + 0.9 * (k % 3)])
                for k in range(L)
            ]
        )
        odom_meas = np.zeros((P, 3))
        odom_info = np.tile(np.eye(3) * 400.0, (P, 1, 1))
        odom_valid = np.zeros(P, bool)
        for i in range(1, P):
            noise = r.normal(0, drift, 3) * np.array([1, 1, 0.5])
            odom_meas[i] = se2.relative(gt[i - 1], gt[i]) + noise
            odom_valid[i] = True
        # dead-reckoned init
        poses0 = np.zeros((P, 3))
        for i in range(1, P):
            poses0[i] = se2.compose(poses0[i - 1], odom_meas[i])
        obs_pose, obs_lm, obs_meas = [], [], []
        for i in range(P):
            for k in range(L):
                inv = se2.inverse(gt[i])
                z = np.asarray(
                    transform_line(lms_gt[k], inv[:2], inv[2])
                ) + r.normal(0, 0.01, 2)
                obs_pose.append(i)
                obs_lm.append(k)
                obs_meas.append(z)
        E = len(obs_pose)
        # one loop closure end->start
        clo_i = np.array([0], np.int32)
        clo_j = np.array([P - 1], np.int32)
        clo_meas = se2.relative(gt[0], gt[P - 1])[None]
        clo_info = np.tile(np.eye(3) * 1e4, (1, 1, 1))
        g = solvers.JointGraphData(
            jnp.asarray(poses0), jnp.ones(P, bool),
            jnp.asarray(np.arange(P) == 0),
            jnp.asarray(odom_meas), jnp.asarray(odom_info),
            jnp.asarray(odom_valid),
            jnp.asarray(lms_gt + r.normal(0, 0.05, lms_gt.shape)),
            jnp.ones(L, bool),
            jnp.asarray(obs_pose, jnp.int32), jnp.asarray(obs_lm, jnp.int32),
            jnp.asarray(np.stack(obs_meas)),
            jnp.asarray(np.tile(np.eye(2) * 1e4, (E, 1, 1))),
            jnp.ones(E, bool),
            jnp.asarray(clo_i), jnp.asarray(clo_j),
            jnp.asarray(clo_meas), jnp.asarray(clo_info),
            jnp.ones(1, bool),
        )
        return g, gt, lms_gt, poses0

    def test_reduces_error_and_recovers_gt(self):
        g, gt, lms_gt, poses0 = self._make()
        g_opt, chi2 = solvers.optimize_joint_graph(g, 10.0, 30)
        err0 = np.linalg.norm(poses0[:, :2] - gt[:, :2], axis=1).mean()
        err1 = np.linalg.norm(
            np.asarray(g_opt.poses)[:, :2] - gt[:, :2], axis=1
        ).mean()
        assert err1 < 0.35 * err0
        # landmarks polished toward ground truth
        lerr = np.abs(np.asarray(g_opt.lms) - lms_gt)
        assert lerr[:, 0].max() < 0.05

    def test_gradient_zero_at_optimum(self):
        # at the LM fixpoint the assembled gradient (b) vanishes
        g, *_ = self._make()
        g_opt, _ = solvers.optimize_joint_graph(g, 10.0, 40)
        _, bp, _, bl, _ = solvers._assemble_joint_system(g_opt, 10.0)
        assert float(jnp.abs(bp).max()) < 1e-4
        assert float(jnp.abs(bl).max()) < 1e-4

    def test_fixed_pose_stationary(self):
        g, *_ = self._make()
        g_opt, _ = solvers.optimize_joint_graph(g, 10.0, 10)
        np.testing.assert_allclose(
            np.asarray(g_opt.poses)[0], np.asarray(g.poses)[0]
        )

    def test_masked_slots_untouched(self):
        g, *_ = self._make()
        # pad with invalid slots
        import jax.tree_util as jtu

        P = g.poses.shape[0]
        g2 = g._replace(
            poses=jnp.concatenate([g.poses, jnp.full((4, 3), 7.0)]),
            pose_valid=jnp.concatenate(
                [g.pose_valid, jnp.zeros(4, bool)]
            ),
            pose_fixed=jnp.concatenate(
                [g.pose_fixed, jnp.zeros(4, bool)]
            ),
            odom_meas=jnp.concatenate([g.odom_meas, jnp.zeros((4, 3))]),
            odom_info=jnp.concatenate(
                [g.odom_info, jnp.tile(jnp.eye(3), (4, 1, 1))]
            ),
            odom_valid=jnp.concatenate(
                [g.odom_valid, jnp.zeros(4, bool)]
            ),
        )
        del jtu, P
        g_opt, _ = solvers.optimize_joint_graph(g2, 10.0, 10)
        out = np.asarray(g_opt.poses)[-4:]
        # x, y untouched; theta only angle-wrapped (applied to all rows)
        np.testing.assert_allclose(out[:, :2], 7.0)
        np.testing.assert_allclose(
            out[:, 2], np.asarray(se2.wrap_angle(7.0))
        )
