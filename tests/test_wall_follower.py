"""Closed-loop wall-follower exploration (VERDICT r4 #8).

The reference declares the onboard exploration interface
(include/wallfollowing_multirange_onboard.h:10-15) with no shipped
implementation; models/wall_follower.py implements the behavior. These
tests close the loop: the follower autonomously explores a simulated
world through the 4-beam multiranger interface
(eval/simulate.simulate_controlled), and the resulting log runs
through the full SLAM pipeline with a map-coverage + ATE assertion.
"""
import numpy as np
import pytest

from sparse_gslam_tpu.eval.simulate import (
    SimConfig,
    make_relations,
    ray_cast,
    rect_room_world,
    simulate_controlled,
    write_carmen_log,
)
from sparse_gslam_tpu.models.wall_follower import (
    WallFollower,
    WallFollowerConfig,
)


@pytest.fixture(scope="module")
def explored(tmp_path_factory):
    d = tmp_path_factory.mktemp("wf")
    # odometry noise raised well above the simulator default so dead
    # reckoning visibly drifts over the ~200 m exploration (the
    # default 0.006 keeps raw odometry at ~0.03 m ATE on this path
    # length -- nothing for SLAM to correct)
    cfg = SimConfig(
        n_beams=60, seed=3, odom_trans_noise=0.03, odom_rot_noise=0.02
    )
    wf = WallFollower(
        WallFollowerConfig(side="right", max_speed=0.9, target_dist=0.6)
    )
    sim = simulate_controlled(wf, cfg, n_steps=1400)
    write_carmen_log(str(d / "wf.log"), sim)
    from sparse_gslam_tpu.eval.relations import save_relations

    t1, t2, rel = make_relations(sim)
    save_relations(str(d / "wf.relations"), t1, t2, rel)
    return d, sim


class TestWallFollowerExploration:
    def test_explores_without_collision(self, explored):
        _, sim = explored
        gt = sim["gt"]
        steps = np.linalg.norm(np.diff(gt[:, :2], axis=0), axis=1)
        # it actually travels (not stuck spinning)
        assert steps.sum() > 100.0
        # explores most of the 24x16 world, not one corner
        ext = gt[:, :2].max(0) - gt[:, :2].min(0)
        assert ext[0] > 18.0 and ext[1] > 10.0, ext
        # returns near previously visited ground (loop-closure
        # opportunities exist for the SLAM run below)
        cum = np.concatenate([[0.0], np.cumsum(steps)])
        revisit = False
        for k in range(0, len(gt), 10):
            old = cum[: len(gt)] < cum[k] - 30.0
            if old.any():
                dd = np.linalg.norm(
                    gt[old][:, :2] - gt[k, :2], axis=1
                )
                if (dd < 1.0).any():
                    revisit = True
                    break
        assert revisit
        # never collides with a wall (the controller's own clearance,
        # above the simulator's 0.15 m hard clamp)
        for k in range(0, len(gt), 20):
            r = ray_cast(
                gt[k], np.linspace(-np.pi, np.pi, 72),
                sim["walls"], 5.0,
            )
            assert r.min() > 0.16, (k, r.min())

    def test_slam_on_explored_log(self, explored):
        """Full pipeline on the autonomously collected log: keyframes
        + landmarks form, the map covers the explored area, and the
        trajectory beats raw odometry on the relations ATE."""
        from sparse_gslam_tpu.eval.relations import (
            evaluate,
            load_relations,
            load_result,
        )
        from sparse_gslam_tpu.io.providers import create_data_provider
        from sparse_gslam_tpu.models.slam import SlamSystem
        from sparse_gslam_tpu.utils.config import (
            ExtractorConfig,
            SlamConfig,
        )

        d, sim = explored
        slam = SlamConfig(
            std_r=0.05, range_max=10.0, scan_size=11,
            multicloud_size=88, landmark_max_gap=0.5,
            match_interval=20, dcs_phi=10.0,
            max_match_distance=10.0, submap_trajectory_length=6.0,
        )
        ls = ExtractorConfig(min_line_points=8, cluster_threshold=100.0)
        sys_ = SlamSystem(slam, ls, enable_backend=True)
        frames = list(
            create_data_provider("carmen", str(d / "wf.log")).frames()
        )
        for fr in frames:
            sys_.process_frame(fr)
        sys_.final_cleanup()
        assert len(sys_.frontend.keyframes) > 40
        assert len(sys_.frontend.landmarks) > 5
        sys_.write_result(str(d / "wf.result"))
        times, poses = load_result(str(d / "wf.result"))
        t1, t2, gt_rel = load_relations(str(d / "wf.relations"))
        res = evaluate(times, poses, t1, t2, gt_rel)
        res_odo = evaluate(
            sim["times"], sim["odom"], t1, t2, gt_rel
        )
        assert res.trans_mean < 0.5
        assert res.trans_mean < res_odo.trans_mean
        # map coverage: the estimated trajectory visits the same
        # 2 m-cell footprint as ground truth (>= 70% overlap). The
        # .result frame is the zero-based odometry frame
        # (log_runner.cpp zero_pose composition); align to gt by the
        # first pose before comparing footprints.
        from sparse_gslam_tpu.utils import se2

        gt0 = sim["gt"][np.searchsorted(sim["times"], times[0])]
        T = se2.compose(gt0, se2.inverse(poses[0]))
        aligned = np.stack([se2.compose(T, p) for p in poses])

        def cells(p):
            return set(map(tuple, np.floor(p[:, :2] / 2.0).astype(int)))

        got = cells(aligned)
        want = cells(sim["gt"])
        overlap = len(got & want) / len(want)
        assert overlap > 0.7, overlap
