import numpy as np
import pytest

from sparse_gslam_tpu.eval.relations import evaluate, load_relations, load_result
from sparse_gslam_tpu.eval.simulate import SimConfig, generate_dataset
from sparse_gslam_tpu.io.providers import create_data_provider
from sparse_gslam_tpu.models.slam import SlamSystem
from sparse_gslam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from sparse_gslam_tpu.utils.config import ExtractorConfig, SlamConfig


def small_configs():
    slam = SlamConfig(
        std_r=0.05, range_max=10.0, scan_size=11, multicloud_size=88,
        landmark_max_gap=0.5, match_interval=20, dcs_phi=10.0,
        max_match_distance=10.0, submap_trajectory_length=6.0,
    )
    ls = ExtractorConfig(min_line_points=8, cluster_threshold=100.0)
    return slam, ls


@pytest.fixture(scope="module")
def sim_frames(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    cfg = SimConfig(n_beams=60, seed=4)
    sim = generate_dataset(str(d), cfg, name="t")
    frames = list(create_data_provider("carmen", str(d / "t.log")).frames())
    return d, sim, frames


class TestEndToEnd:
    def test_frontend_only_beats_odometry_rotation(self, sim_frames):
        d, sim, frames = sim_frames
        slam, ls = small_configs()
        sys_ = SlamSystem(slam, ls, enable_backend=False)
        for fr in frames:
            sys_.process_frame(fr)
        assert len(sys_.frontend.keyframes) > 20
        assert len(sys_.frontend.landmarks) > 3
        sys_.write_result(str(d / "t.result"))
        t1, t2, gt = load_relations(str(d / "t.relations"))
        times, poses = load_result(str(d / "t.result"))
        res = evaluate(times, poses, t1, t2, gt)
        res_odo = evaluate(sim["times"], sim["odom"], t1, t2, gt)
        assert res.rot_mean < res_odo.rot_mean * 1.2
        assert res.trans_mean < 1.0

    def test_checkpoint_roundtrip_resumes_identically(self, sim_frames):
        d, sim, frames = sim_frames
        slam, ls = small_configs()
        cut = len(frames) // 2

        sys_a = SlamSystem(slam, ls, enable_backend=True)
        for fr in frames[:cut]:
            sys_a.process_frame(fr)
        save_checkpoint(str(d / "ckpt.npz"), sys_a)

        sys_b = SlamSystem(slam, ls, enable_backend=True)
        load_checkpoint(str(d / "ckpt.npz"), sys_b)
        sys_b.frame_idx = sys_a.frame_idx
        sys_b.deltas = list(sys_a.deltas)
        sys_b.zero_pose = sys_a.zero_pose.copy()
        sys_b.last_pose = sys_a.last_pose.copy()
        sys_b.mc._cloud_odom = sys_a.mc._cloud_odom.copy()

        # continue both and compare trajectories
        for fr in frames[cut : cut + 60]:
            sys_a.process_frame(fr)
            sys_b.process_frame(fr)
        ea = sys_a.frontend.estimates()
        eb = sys_b.frontend.estimates()
        assert len(ea) == len(eb)
        np.testing.assert_allclose(ea, eb, atol=1e-6)

    def test_timing_files_written(self, sim_frames, tmp_path):
        d, sim, frames = sim_frames
        slam, ls = small_configs()
        from sparse_gslam_tpu.io.result_writer import TimingWriter

        sys_ = SlamSystem(slam, ls, enable_backend=False)
        prefix = str(tmp_path / "t")
        sys_.timing = TimingWriter(prefix)
        for fr in frames[:80]:
            sys_.process_frame(fr)
        sys_.timing.close()
        from sparse_gslam_tpu.eval.timing import analyze

        stats = analyze(prefix)
        assert stats.mean_data_interval > 0
        assert stats.mean_frontend >= 0


class TestLiveView:
    def test_background_render_surface(self, sim_frames, tmp_path):
        """Live visualization thread (visualizer.cpp:425-441
        equivalent): renders maps + status at rate while frames
        stream, files are atomically replaced and progress between
        reads, and the thread stops cleanly."""
        import json
        import os
        import time as _time

        from sparse_gslam_tpu.eval.live_view import LiveVisualizer

        d, sim, frames = sim_frames
        slam, ls = small_configs()
        sys_ = SlamSystem(slam, ls, enable_backend=True)
        prefix = str(tmp_path / "lv")
        live = LiveVisualizer(sys_, prefix, rate=4.0)
        live.start()
        seen_frames = []
        try:
            for k, fr in enumerate(frames[:260]):
                with sys_.lock:
                    sys_.process_frame(fr)
                if k % 60 == 59:
                    p = prefix + "_live_status.json"
                    if os.path.exists(p):
                        seen_frames.append(json.load(open(p))["frame"])
                    _time.sleep(0.3)  # give the thread a render slot
        finally:
            live.stop(final=True)
        assert live.renders >= 2
        status = json.load(open(prefix + "_live_status.json"))
        assert status["frame"] >= 260
        assert status["keyframes"] > 5
        assert os.path.exists(prefix + "_live_lm.png")
        # progression was visible mid-run, not just at the end
        assert len(seen_frames) >= 2
        assert seen_frames[-1] > seen_frames[0]


class TestPrewarm:
    def test_prewarm_compiles_without_error(self):
        from sparse_gslam_tpu.utils.config import SlamConfig
        from sparse_gslam_tpu.utils.prewarm import build_tasks, prewarm

        cfg = SlamConfig()
        tasks = build_tasks(cfg, ladder=1)
        assert len(tasks) > 5
        # run a couple of representative tasks synchronously (CPU)
        names = [n for n, _ in tasks]
        assert any(n.startswith("lm") for n in names)
        assert any(n.startswith("pg") for n in names)
        prewarm(cfg, threads=4, ladder=1, wait=True)
