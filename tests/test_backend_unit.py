"""Unit tests for SubmapLoopCloser bookkeeping (submap creation
geometry, pose-graph chain extension, closure acceptance, map-frame
transforms) against hand-built frontends."""
import numpy as np
import pytest

from sparse_gslam_tpu.models.backend import SubmapLoopCloser
from sparse_gslam_tpu.models.frontend import Frontend, Keyframe
from sparse_gslam_tpu.models.range_data import RangeData2D
from sparse_gslam_tpu.utils import se2
from sparse_gslam_tpu.utils.config import SlamConfig


def make_frontend_with_path(poses, cfg, scan_pts=None):
    """Frontend with keyframes at given poses, each holding a small
    range scan of a wall."""
    fe = Frontend(cfg)
    table = np.stack(
        [np.cos(np.linspace(-1, 1, 8)), np.sin(np.linspace(-1, 1, 8))], 1
    )
    for i, p in enumerate(poses):
        kf = Keyframe(
            estimate=np.asarray(p, dtype=np.float64),
            odom_meas=(
                se2.relative(poses[i - 1], p) if i else np.zeros(3)
            ),
            odom_info=np.eye(3) * 100.0,
            data=RangeData2D(),
            odom_times=[float(i)],
            odom_dposes=[np.asarray(p, dtype=np.float64)],
        )
        # a wall 3 m ahead in the body frame
        kf.data.insert_scan(np.full(8, 3.0), table, cfg.range_max)
        fe.keyframes.append(kf)
    return fe


def cfg():
    return SlamConfig(
        range_max=8.0, scan_size=8, submap_trajectory_length=2.0,
        submap_overlap_poses=0, last_submap_not_match=0,
        max_match_distance=100.0, last_traj_length=1.0,
        loop_closure_min_score=0.7, match_interval=1,
    )


class TestPrecompute:
    def test_submap_created_after_trajectory_length(self):
        c = cfg()
        poses = [np.array([0.5 * i, 0.0, 0.0]) for i in range(8)]
        fe = make_frontend_with_path(poses, c)
        be = SubmapLoopCloser(c, fe)
        be.precompute()
        assert be.submap_count == 1
        # mid pose = first index where cumulative length > 1.0 (half of 2.0)
        assert be.submaps[0].anchor_idx == 3
        # last_pose_idx advanced to mid - overlap
        assert be.last_pose_idx == 3

    def test_no_submap_when_too_short(self):
        c = cfg()
        poses = [np.array([0.2 * i, 0.0, 0.0]) for i in range(5)]
        fe = make_frontend_with_path(poses, c)
        be = SubmapLoopCloser(c, fe)
        be.precompute()
        assert be.submap_count == 0

    def test_overlap_poses(self):
        c = cfg()
        c.submap_overlap_poses = 2
        poses = [np.array([0.5 * i, 0.0, 0.0]) for i in range(8)]
        fe = make_frontend_with_path(poses, c)
        be = SubmapLoopCloser(c, fe)
        be.precompute()
        assert be.last_pose_idx == 1  # mid(3) - overlap(2)


class TestMapTransforms:
    def test_trans_pre_identity_when_graphs_agree(self):
        c = cfg()
        poses = [np.array([0.5 * i, 0.0, 0.0]) for i in range(6)]
        fe = make_frontend_with_path(poses, c)
        be = SubmapLoopCloser(c, fe)
        be._ensure_pg_init()
        mp = be._map_transforms()
        for i in range(6):
            np.testing.assert_allclose(mp(i), poses[i], atol=1e-12)

    def test_trans_pre_carries_correction(self):
        c = cfg()
        poses = [np.array([0.5 * i, 0.0, 0.0]) for i in range(6)]
        fe = make_frontend_with_path(poses, c)
        be = SubmapLoopCloser(c, fe)
        be._ensure_pg_init()
        # pretend a closure shifted the pose graph by (0, 1, 0)
        be.pg_poses[0] = np.array([0.0, 1.0, 0.0])
        mp = be._map_transforms()
        # lm poses after last_opt(1) get the pose-graph correction
        np.testing.assert_allclose(mp(3), [1.5, 1.0, 0.0], atol=1e-12)


class TestMatchFlow:
    def _loopy_frontend(self, c):
        """Out-and-back path revisiting the start with a wall ahead."""
        n1 = 10
        fwd = [np.array([0.4 * i, 0.0, 0.0]) for i in range(n1)]
        back = [
            np.array([0.4 * (n1 - 1 - i), 0.02, 0.0]) for i in range(n1)
        ]
        poses = fwd + back
        fe = make_frontend_with_path(poses, c)
        return fe, poses

    def test_closure_extends_pose_graph_and_prunes_window(self):
        c = cfg()
        fe, poses = self._loopy_frontend(c)
        be = SubmapLoopCloser(c, fe)
        for _ in range(6):
            be.precompute()
        assert be.submap_count >= 2
        ok = be.match()
        if ok:  # acceptance depends on grid content; flow asserts below
            n = len(fe.keyframes)
            assert be.last_opt_pose_index == n
            assert len(be.pg_poses) == n
            assert fe.window_start == n - 1
            assert len(fe.obs_edges) == 0
            assert be.closure_count == 1
            # chain measurements reproduce lm relative estimates
            for i in range(1, n):
                np.testing.assert_allclose(
                    be.pg_meas[i],
                    se2.relative(poses[i - 1], poses[i]),
                    atol=1e-9,
                )

    def test_min_score_gate(self):
        c = cfg()
        c.loop_closure_min_score = 0.999  # impossible bar
        fe, poses = self._loopy_frontend(c)
        be = SubmapLoopCloser(c, fe)
        for _ in range(6):
            be.precompute()
        assert not be.match()
        assert be.closure_count == 0


class TestRidgeDriftGate:
    """Accept-time along-ridge drift arbitration
    (backend._ridge_drift_gate; calibrated on the sim worlds, see
    utils/config.closure_ridge_max_drift)."""

    def _be(self, max_drift=1.3):
        c = cfg()
        c.closure_ridge_max_drift = max_drift
        fe = make_frontend_with_path(
            [np.array([0.5 * i, 0.0, 0.0]) for i in range(4)], c
        )
        return SubmapLoopCloser(c, fe)

    @staticmethod
    def _ridge_cov(sigma_along=0.9, sigma_cross=0.05, axis=0.0):
        """(3,3) covariance with a translational ridge along `axis`."""
        ca, sa = np.cos(axis), np.sin(axis)
        V = np.array([[ca, -sa], [sa, ca]])
        t = V @ np.diag([sigma_along**2, sigma_cross**2]) @ V.T
        out = np.eye(3) * 1e-4
        out[:2, :2] = t
        return out

    def test_alias_drift_rejected(self):
        be = self._be()
        cov = self._ridge_cov()
        refined = np.array([2.0, 0.03, 0.0])  # 2 m along the ridge
        along, sig, reject = be._ridge_drift_gate(
            cov, refined, np.zeros(2)
        )
        assert reject
        assert along == pytest.approx(2.0, abs=0.05)
        assert sig == pytest.approx(0.9, abs=1e-6)

    def test_true_ridge_closure_kept(self):
        be = self._be()
        # typical true ridge closure: small along-ridge drift
        along, sig, reject = be._ridge_drift_gate(
            self._ridge_cov(), np.array([0.15, 0.02, 0.0]), np.zeros(2)
        )
        assert not reject

    def test_sharp_closure_never_gated(self):
        be = self._be()
        # sharp (junction-anchored) match: large drift is a genuine
        # correction the matcher can actually see
        along, sig, reject = be._ridge_drift_gate(
            self._ridge_cov(sigma_along=0.1), np.array([2.0, 0.0, 0.0]),
            np.zeros(2),
        )
        assert not reject

    def test_gate_respects_ridge_axis(self):
        be = self._be()
        # drift CROSS the ridge is not along-ridge drift
        cov = self._ridge_cov(axis=np.pi / 2)  # ridge along y
        along, sig, reject = be._ridge_drift_gate(
            cov, np.array([2.0, 0.1, 0.0]), np.zeros(2)
        )
        assert not reject
        assert along == pytest.approx(0.1, abs=1e-6)

    def test_disabled_by_zero(self):
        be = self._be(max_drift=0.0)
        _, _, reject = be._ridge_drift_gate(
            self._ridge_cov(), np.array([5.0, 0.0, 0.0]), np.zeros(2)
        )
        assert not reject
