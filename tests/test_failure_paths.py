"""Error-recovery paths (VERDICT r1 item 4).

(a) the chi^2 consistency gate + full rollback in the frontend
    (models/frontend.py, reference drone.cpp:161-189): a keyframe tick
    whose observation violates chi^2(0.99, dof) must restore estimates
    and landmarks, drop the tick's edges, and recover on the next tick.
(b) run_realtime's frontend/backend thread interleaving
    (models/slam.py:117-157, reference log_runner.cpp:214-239) must
    finish without corruption under a deterministic fast-paced replay.
"""
import math

import numpy as np
import pytest

from sparse_gslam_tpu.models.frontend import Frontend
from sparse_gslam_tpu.ops.lines import Segments
from sparse_gslam_tpu.utils.config import ExtractorConfig, SlamConfig


def wall_segments(rho=2.0, cov_scale=1e-4, x0=-1.0, x1=1.0):
    """One wall parallel to the direction of travel, seen in the body
    frame: line rho=`rho`, theta=pi/2, endpoints (x0, rho)-(x1, rho)."""
    return Segments(
        rhotheta=np.array([[rho, math.pi / 2]]),
        cov=np.array([[[cov_scale, 0.0], [0.0, cov_scale]]]),
        start=np.array([[x0, rho]]),
        end=np.array([[x1, rho]]),
    )


def drive(frontend, n_keyframes, segments_fn, t0=0.0, step=0.6):
    """Feed keyframe-triggering ticks along +x with the given segment
    generator (called per tick with the keyframe index)."""
    t = t0
    made = 0
    x = frontend.prev_odom[0] if frontend.prev_odom is not None else 0.0
    while made < n_keyframes:
        x += step  # > 0.5 m displacement -> keyframe trigger
        t += 1.0
        ranges = np.full(frontend.config.scan_size, 3.0)
        was = frontend.tick(
            segments_fn(made), t, np.array([x, 0.0, 0.0]), ranges
        )
        if was:
            made += 1
    return t


class TestChi2Rollback:
    def make_frontend(self):
        cfg = SlamConfig(
            scan_size=11, landmark_assoc_thresh=0.5, landmark_max_gap=2.0,
            landmark_max_dist=50.0,
        )
        return Frontend(cfg)

    def test_gate_fires_and_rolls_back(self):
        fe = self.make_frontend()
        drive(fe, 5, lambda k: wall_segments())
        assert fe.rejected_ticks == 0
        assert len(fe.landmarks) == 1  # one consistently observed wall

        est_before = fe.estimates().copy()
        lm_before = fe.landmarks[0].rhotheta.copy()
        n_edges_before = len(fe.obs_edges)
        n_kf_before = len(fe.keyframes)

        # poison tick: the wall observed TWICE at contradictory ranges
        # (rho 2.2 and 1.8, both inside the association gate:
        # ll_distance sums both endpoint offsets, 2*0.2 = 0.4 < 0.5) with
        # near-zero claimed covariance -> no pose/landmark estimate can
        # satisfy both edges -> chi^2 blows past the 0.99 quantile
        def poison(_):
            return Segments(
                rhotheta=np.array(
                    [[2.2, math.pi / 2], [1.8, math.pi / 2]]
                ),
                cov=np.tile(np.eye(2) * 1e-10, (2, 1, 1)),
                start=np.array([[-1.0, 2.2], [-1.0, 1.8]]),
                end=np.array([[1.0, 2.2], [1.0, 1.8]]),
            )

        drive(fe, 1, poison)
        assert fe.rejected_ticks == 1, "chi2 gate did not fire"
        # rollback: old estimates restored bit-exactly, poison edges
        # dropped, landmark estimate restored
        np.testing.assert_array_equal(
            fe.estimates()[:n_kf_before], est_before
        )
        np.testing.assert_array_equal(fe.landmarks[0].rhotheta, lm_before)
        assert len(fe.obs_edges) == n_edges_before
        assert len(fe.landmarks) == 1

        # recovery: consistent ticks resume optimizing without residue
        drive(fe, 2, lambda k: wall_segments())
        assert fe.rejected_ticks == 1
        assert len(fe.landmarks) == 1
        assert np.isfinite(fe.estimates()).all()

    def test_orphan_landmark_popped_on_rollback(self):
        fe = self.make_frontend()
        drive(fe, 5, lambda k: wall_segments())
        n_lms = len(fe.landmarks)

        # poison tick introducing a NEW landmark (far from the wall)
        # alongside an irreconcilable re-observation of the old one
        def poison(_):
            return Segments(
                rhotheta=np.array(
                    [
                        [2.2, math.pi / 2],
                        [1.8, math.pi / 2],
                        [5.0, -math.pi / 2],
                    ]
                ),
                cov=np.tile(np.eye(2) * 1e-10, (3, 1, 1)),
                start=np.array(
                    [[-1.0, 2.2], [-1.0, 1.8], [-1.0, -5.0]]
                ),
                end=np.array([[1.0, 2.2], [1.0, 1.8], [1.0, -5.0]]),
            )

        drive(fe, 1, poison)
        assert fe.rejected_ticks == 1
        # the orphaned brand-new landmark must be popped
        assert len(fe.landmarks) == n_lms


class TestRealtimeInterleave:
    def test_realtime_run_is_uncorrupted(self, tmp_path):
        from sparse_gslam_tpu.eval.simulate import SimConfig, generate_dataset
        from sparse_gslam_tpu.io.providers import create_data_provider
        from sparse_gslam_tpu.models.slam import SlamSystem

        cfg = SimConfig(n_beams=60, seed=4)
        generate_dataset(str(tmp_path), cfg, name="t")
        frames = list(
            create_data_provider("carmen", str(tmp_path / "t.log")).frames()
        )[:260]
        slam = SlamConfig(
            std_r=0.05, range_max=10.0, scan_size=11, multicloud_size=88,
            landmark_max_gap=0.5, match_interval=20, dcs_phi=10.0,
            max_match_distance=10.0, submap_trajectory_length=6.0,
        )
        ls = ExtractorConfig(min_line_points=8, cluster_threshold=100.0)
        sys_ = SlamSystem(slam, ls, enable_backend=True)
        # rate >> 1: frontend never sleeps, backend thread free-runs ->
        # maximal interleaving pressure on the snapshot/apply lock
        sys_.run_realtime(frames, rate=1e9)

        fe, be = sys_.frontend, sys_.backend
        assert len(fe.keyframes) > 20
        assert np.isfinite(fe.estimates()).all()
        # pose-graph invariants: parallel arrays aligned, measurements
        # finite, closure endpoints inside the chain
        assert len(be.pg_poses) == len(be.pg_meas) == len(be.pg_info)
        assert len(be.pg_poses) <= len(fe.keyframes)
        if be.pg_poses:
            assert np.isfinite(np.stack(be.pg_poses)).all()
        for c in be.closures:
            assert 0 <= c.i < len(fe.keyframes)
            assert 0 <= c.j < len(fe.keyframes)
            assert np.isfinite(c.meas).all()
        # the result writer must produce a consistent trajectory
        sys_.write_result(str(tmp_path / "t.result"))
        from sparse_gslam_tpu.eval.relations import load_result

        times, poses = load_result(str(tmp_path / "t.result"))
        assert np.isfinite(poses).all()
        assert (np.diff(times) >= 0).all()
