import numpy as np

from sparse_gslam_tpu.ops.multicloud import (
    MulticloudConverter,
    OdomErrorPropagator,
    propagate_suffixes,
)
from sparse_gslam_tpu.utils import se2
from sparse_gslam_tpu.utils.config import SlamConfig


class TestOdomPropagation:
    def test_cov_grows(self):
        p = OdomErrorPropagator(0.2, 1.0, 1.0)
        for _ in range(10):
            p.step(np.array([0.1, 0.0, 0.05]))
        assert np.trace(p.cov) > 1e-6
        assert np.all(np.linalg.eigvalsh(p.cov) >= 0)

    def test_pose_is_composition(self):
        p = OdomErrorPropagator(0.2, 1.0, 1.0)
        deltas = [np.array([0.1, 0.02, 0.05])] * 7
        ref = np.zeros(3)
        for d in deltas:
            p.step(d)
            ref = se2.compose(ref, d)
        np.testing.assert_allclose(p.pose, ref, atol=1e-12)

    def test_suffix_propagation_matches_sequential(self):
        rng = np.random.default_rng(0)
        deltas = rng.normal(0, 0.1, (12, 3))
        var = np.array([0.04, 1.0, 1.0])
        poses, covs = propagate_suffixes(deltas, var)
        for i in range(13):
            p = OdomErrorPropagator(0.2, 1.0, 1.0)
            for d in deltas[i:]:
                p.step(d)
            np.testing.assert_allclose(poses[i], p.pose, atol=1e-12)
            np.testing.assert_allclose(covs[i], p.cov, atol=1e-12)


class TestMulticloud:
    def cfg(self):
        return SlamConfig(
            scan_size=4, multicloud_size=24, range_max=7.0, std_r=0.1,
            std_x=0.2, std_y=1.0, std_w=1.0,
        )

    def test_window_fills_then_emits(self):
        cfg = self.cfg()
        mc = MulticloudConverter(cfg)
        deltas = []
        pose = np.zeros(3)
        out = None
        for i in range(10):
            if i > 0:
                d = np.array([0.1, 0.0, 0.0])
                deltas.append(d)
                pose = se2.compose(pose, d)
            out = mc.update(np.array([1.0, 2.0, 2.0, 1.0]), deltas, pose)
            if i < 5:
                assert out is None
        assert out is not None
        assert len(out.points) == 24
        assert out.covs.shape == (24, 2, 2)

    def test_points_in_body_frame(self):
        """A static wall seen while moving forward must produce
        consistent body-frame points after window correction."""
        cfg = self.cfg()
        mc = MulticloudConverter(cfg)
        deltas = []
        pose = np.zeros(3)
        # wall at x = 5 (world); beams at angles table
        out = None
        for i in range(8):
            if i > 0:
                d = np.array([0.2, 0.0, 0.0])
                deltas.append(d)
                pose = se2.compose(pose, d)
            # ranges to wall x=5 along each beam from current pose
            angles = np.arctan2(mc.table[:, 1], mc.table[:, 0])
            r = (5.0 - pose[0]) / np.cos(angles + pose[2])
            out = mc.update(r, deltas, pose)
        assert out is not None
        # all finite points lie on the wall x = 5 - pose_x in body frame
        np.testing.assert_allclose(
            out.points[:, 0], 5.0 - pose[0], atol=1e-9
        )

    def test_max_range_dropped(self):
        cfg = self.cfg()
        mc = MulticloudConverter(cfg)
        deltas = []
        pose = np.zeros(3)
        out = None
        for i in range(8):
            if i > 0:
                deltas.append(np.array([0.1, 0, 0]))
                pose = se2.compose(pose, deltas[-1])
            out = mc.update(np.array([1.0, 7.0, 9.0, 1.0]), deltas, pose)
        assert out is not None
        assert len(out.points) == 12  # half the beams were >= range_max

    def test_older_scans_more_uncertain(self):
        cfg = self.cfg()
        mc = MulticloudConverter(cfg)
        deltas = []
        pose = np.zeros(3)
        out = None
        for i in range(6):
            if i > 0:
                deltas.append(np.array([0.3, 0.0, 0.1]))
                pose = se2.compose(pose, deltas[-1])
            out = mc.update(np.array([2.0, 2.0, 2.0, 2.0]), deltas, pose)
        tr = np.trace(out.covs, axis1=1, axis2=2)
        # first scan in window (oldest) must be more uncertain than last
        assert tr[:4].mean() > tr[-4:].mean()


class TestEvalAndIO:
    def test_relations_roundtrip(self, tmp_path):
        from sparse_gslam_tpu.eval.relations import (
            evaluate,
            load_relations,
            save_relations,
        )

        rng = np.random.default_rng(0)
        n = 50
        times = np.arange(n, dtype=float)
        poses = np.cumsum(rng.normal(0, 0.1, (n, 3)), axis=0)
        poses[:, 2] = se2.wrap_angle(poses[:, 2])
        t1 = times[:-5]
        t2 = times[5:]
        gt = se2.relative(poses[:-5], poses[5:])
        res = evaluate(times, poses, t1, t2, gt)
        assert res.trans_mean < 1e-12 and res.rot_mean < 1e-12

        p = tmp_path / "x.relations"
        save_relations(str(p), t1, t2, gt)
        t1b, t2b, gtb = load_relations(str(p))
        np.testing.assert_allclose(gtb, gt, atol=1e-8)

    def test_result_roundtrip(self, tmp_path):
        from sparse_gslam_tpu.eval.relations import load_result
        from sparse_gslam_tpu.io.result_writer import write_result_line

        p = tmp_path / "x.result"
        with open(p, "w") as f:
            write_result_line(f, np.array([1.0, 2.0, 0.5]), 123.456)
        times, poses = load_result(str(p))
        np.testing.assert_allclose(times, [123.456])
        np.testing.assert_allclose(poses[0], [1.0, 2.0, 0.5])

    def test_simulator_generates_consistent_scans(self, tmp_path):
        from sparse_gslam_tpu.eval.simulate import (
            SimConfig,
            generate_dataset,
        )
        from sparse_gslam_tpu.io.providers import create_data_provider
        from sparse_gslam_tpu.eval.relations import evaluate, load_relations

        cfg = SimConfig(n_beams=30, seed=1)
        sim = generate_dataset(str(tmp_path), cfg, name="tiny")
        frames = list(
            create_data_provider("carmen", str(tmp_path / "tiny.log")).frames()
        )
        assert len(frames) == len(sim["times"])
        assert frames[0].ranges.shape == (30,)
        # raw odometry (= what the log stores) vs gt relations gives a
        # nonzero but bounded drift error
        t1, t2, gt = load_relations(str(tmp_path / "tiny.relations"))
        res = evaluate(sim["times"], sim["odom"], t1, t2, gt)
        assert 0 < res.trans_mean < 1.0

    def test_carmen_provider_parses_and_sorts(self, tmp_path):
        p = tmp_path / "t.log"
        lines = [
            "FLASER 2 1.0 2.0 9 9 9 5.0 6.0 0.5 20.0 host 20.0",
            "FLASER 2 1.5 2.5 9 9 9 5.1 6.1 0.6 10.0 host 10.0",
        ]
        p.write_text("\n".join(lines) + "\n")
        from sparse_gslam_tpu.io.providers import create_data_provider

        frames = list(create_data_provider("carmen", str(p)).frames())
        assert frames[0].time == 10.0  # sorted
        np.testing.assert_allclose(frames[0].pose, [5.1, 6.1, 0.6])
        np.testing.assert_allclose(frames[1].ranges, [1.0, 2.0])

    def test_rosbag_provider(self):
        from sparse_gslam_tpu.io.providers import create_data_provider

        path = (
            "/root/reference/src/sparse_gslam/datasets/olsson-demo/"
            "olsson-demo.log"
        )
        frames = list(create_data_provider("drone_bag", path).frames())
        assert len(frames) > 3000
        assert frames[0].ranges.shape == (4,)
        assert np.isfinite(frames[0].pose).all()


class TestClosurePR:
    def _circle_gt(self):
        # two laps around a circle: every pose in lap 2 revisits lap 1
        t = np.arange(0.0, 120.0, 0.5)
        ang = 2 * np.pi * t / 60.0  # 60 s per lap
        r = 5.0
        poses = np.stack(
            [r * np.cos(ang), r * np.sin(ang), ang + np.pi / 2], axis=1
        )
        poses[:, 2] = (poses[:, 2] + np.pi) % (2 * np.pi) - np.pi
        return t, poses

    def test_revisit_segments_two_laps(self):
        from sparse_gslam_tpu.eval.closures import revisit_segments

        t, poses = self._circle_gt()
        segs = revisit_segments(t, poses, radius=1.0, min_time_sep=30.0)
        # the whole second lap is one revisit segment
        assert len(segs) == 1
        # (starts slightly before the exact lap point: with radius 1.0
        # the chord closes ~1.5 s early on a 5 m circle)
        assert segs[0][0] >= 57.0 and segs[0][1] == t[-1]

    def test_precision_and_recall(self):
        from sparse_gslam_tpu.eval.closures import closure_pr
        from sparse_gslam_tpu.utils import se2

        t, poses = self._circle_gt()

        def gt_at(time):
            i = int(np.argmin(np.abs(t - time)))
            return poses[i]

        good = (10.0, 70.0, se2.relative(gt_at(10.0), gt_at(70.0)))
        # wrong measurement at a true revisit -> counted false
        bad_meas = (20.0, 80.0, np.array([3.0, 0.0, 1.0]))
        # endpoints not actually near each other -> false
        far = (10.0, 40.0, se2.relative(gt_at(10.0), gt_at(40.0)))
        pr = closure_pr(
            [good, bad_meas, far], t, poses, radius=1.0, match_radius=1.0,
            min_time_sep=30.0,
        )
        assert pr["verdicts"] == [True, False, False]
        assert abs(pr["precision"] - 1.0 / 3.0) < 1e-9
        assert pr["recall"] == 1.0  # the lone segment is detected

    def test_ridge_aware_precision(self):
        """VERDICT r4 #5: a closure whose error lies along its OWN
        declared wide covariance axis is ridge-true; the same error
        with a tight claimed covariance stays false; cross-ridge
        error is never excused."""
        from sparse_gslam_tpu.eval.closures import closure_pr
        from sparse_gslam_tpu.utils import se2

        t, poses = self._circle_gt()

        def gt_at(time):
            i = int(np.argmin(np.abs(t - time)))
            return poses[i]

        rel = se2.relative(gt_at(10.0), gt_at(70.0))
        gi = gt_at(10.0)
        # 1.2 m error along the world x axis, expressed in the i frame
        c, s = np.cos(gi[2]), np.sin(gi[2])
        d_world = np.array([1.2, 0.0])
        d_i = np.array([c * d_world[0] + s * d_world[1],
                        -s * d_world[0] + c * d_world[1]])
        bad = rel.copy()
        bad[:2] += d_i
        # covariance wide along the SAME axis (sigma 0.8 m), tight
        # across (0.05 m): error is ridge-in-band (1.2 < 2*0.8)
        R = np.array([[c, -s], [s, c]])  # hmm: error frame = i frame
        # express the wide axis in the i frame directly
        axis = d_i / np.linalg.norm(d_i)
        perp = np.array([-axis[1], axis[0]])
        cov_t = 0.64 * np.outer(axis, axis) + 0.0025 * np.outer(
            perp, perp
        )
        cov = np.zeros((3, 3))
        cov[:2, :2] = cov_t
        cov[2, 2] = 0.01
        info_wide = np.linalg.inv(cov)
        info_tight = np.linalg.inv(np.diag([0.01, 0.01, 0.01]))
        # cross-ridge violation: same wide cov but error PERPENDICULAR
        bad_cross = rel.copy()
        bad_cross[:2] += 1.2 * perp
        del R
        closures = [
            (10.0, 70.0, bad),
            (10.0, 70.0, bad),
            (10.0, 70.0, bad_cross),
        ]
        infos = [info_wide, info_tight, info_wide]
        pr = closure_pr(
            closures, t, poses, radius=1.0, match_radius=3.0,
            min_time_sep=30.0, infos=infos,
        )
        assert pr["verdicts"] == [False, False, False]
        assert pr["ridge_verdicts"] == [True, False, False]
        assert abs(pr["precision_ridge"] - 1.0 / 3.0) < 1e-9
        assert pr["ridge_rows"][0]["is_ridge"]
        assert not pr["ridge_rows"][1]["is_ridge"]

    def test_no_closures_no_crash(self):
        from sparse_gslam_tpu.eval.closures import closure_pr

        t, poses = self._circle_gt()
        pr = closure_pr([], t, poses, radius=1.0, min_time_sep=30.0)
        assert np.isnan(pr["precision"]) and pr["n_segments"] >= 1
        assert pr["recall"] == 0.0

    def test_gt_roundtrip(self, tmp_path):
        from sparse_gslam_tpu.eval.closures import load_gt, save_gt

        t, poses = self._circle_gt()
        p = str(tmp_path / "x.gt")
        save_gt(p, t, poses)
        t2, p2 = load_gt(p)
        np.testing.assert_allclose(t2, t, atol=1e-5)
        np.testing.assert_allclose(p2, poses, atol=1e-5)
