"""Submap construction + loop-closure detection + pose-graph backend.

Re-implements SubmapLoopCloser (src/sparse_gslam/src/submap_loop_closer
.cpp:43-297, include/loop_closer/submap_loop_closer.h) and the
pose-graph bookkeeping of graphs.h:30-40 / log_runner.cpp:176-206:

  precompute(): accumulate ~submap_trajectory_length of keyframes into
  a multicloud, ray-trace it into a match-resolution grid + a fixed
  0.05 m high-res grid, anchor at the middle keyframe, precompute the
  dilated score grid (pyramid level 0).

  match(): build the query multiscan from the last ~last_traj_length of
  keyframes, select candidate submaps by distance (the ctpl thread-pool
  fan-out of the reference becomes sequential jit calls of the batched
  FFT correlator -- each call already scores every rotation x offset in
  parallel), take the best score >= loop_closure_min_score, refine on
  the high-res grid, extend the pose-graph chain, prune the landmark
  graph to one fixed pose, add the DCS closure edge and run 20 GN
  iterations.
"""
from __future__ import annotations

import dataclasses
import math
import os

import numpy as np

from ..ops import matching, solvers
from ..ops.grid import GridSpec, build_submap_grid, precompute_pyramid
from ..utils import se2
from ..utils.config import SlamConfig
from .frontend import Frontend, _bucket
from .range_data import construct_multicloud

_jitted_pg_solver = {}
_jitted_blocked_solver = {}


def _get_pg_solver(phi: float, iterations: int = 20, gnc_scale: float = 1.0):
    key = (float(phi), int(iterations), float(gnc_scale))
    if key not in _jitted_pg_solver:
        import jax

        _jitted_pg_solver[key] = jax.jit(
            lambda g: solvers.optimize_pose_graph(
                g, key[0], key[1], gnc_init_scale=key[2]
            )
        )
    return _jitted_pg_solver[key]


def _get_blocked_solver(phi: float, iterations: int, gnc_scale: float):
    """Jitted keyframe-partitioned Schur solver (parallel/dist_solver).
    Shape churn is bounded: pose count buckets pow2, separator capacity
    in multiples of 64, the compact scatter enumerations pow2."""
    key = (float(phi), int(iterations), float(gnc_scale))
    if key not in _jitted_blocked_solver:
        import jax

        from ..parallel import dist_solver

        _jitted_blocked_solver[key] = jax.jit(
            lambda bg, sg: dist_solver.optimize_pose_graph_blocked(
                bg, sg, key[0], key[1], key[2]
            )
        )
    return _jitted_blocked_solver[key]


@dataclasses.dataclass
class Submap:
    """Reference: include/submap.h:18-41."""

    anchor_idx: int  # keyframe index of the anchoring pose
    score_grid: object  # (G,G) jnp: dilated level-0 score grid
    pooled_grid: object  # (G,G) jnp: level-(depth-1) pooled bound grid
    probs: object  # (G,G) jnp: raw (undilated) probability grid
    origin: object  # (2,) jnp
    high_res: object  # (G2,G2) jnp probability grid
    high_origin: object
    resolution: float
    # keyframe index range [start_idx, end_idx) the grids were built
    # from (for the local-refinement non-overlap constraint)
    start_idx: int = 0
    end_idx: int = 0
    # lazily-cached host copy of score_grid (per-keyframe pins score
    # their small windows with direct numpy gathers on the host; one
    # D2H transfer per submap, amortized over its pins)
    score_grid_np: object = None
    # same for pooled_grid (pin pre-gate bound lookups)
    pooled_np: object = None
    # lazily-cached full (F, F) complex spectrum of score_grid (the
    # FFT-free MXU matcher consumes it; built once per submap like
    # Cartographer's precomputation grids at fix_submap,
    # fast_correlative_scan_matcher_2d.cc:454-468; invalidated when
    # rebuild_grids replaces the grids)
    spectrum: object = None

    def get_spectrum(self, fft_size: int):
        if self.spectrum is None or self.spectrum.shape[-2] != fft_size:
            self.spectrum = matching.grid_spectrum(
                self.score_grid[None], int(fft_size),
                int(self.score_grid.shape[0]),
            )[0]
        return self.spectrum


@dataclasses.dataclass
class Closure:
    i: int  # pose index of submap anchor
    j: int  # pose index of matched query mid
    meas: np.ndarray  # (3,)
    info: np.ndarray  # (3,3)
    active: bool = True
    # "loop" = correlative loop closure (the reference's only kind);
    # "local" = submap-to-previous-submap chain edge; "kf" = per-
    # keyframe scan-to-previous-submap pin (both new-engine
    # capabilities: they bound odometric drift BETWEEN revisits, which
    # loop closures alone cannot -- see RESULTS.md error budgets)
    kind: str = "loop"
    # recomputed by _gate_consistent_loops before every solve: True =
    # currently outvoted by pairwise odometry-consistency (may clear
    # again as more closures accumulate); distinct from `active`,
    # which is the permanent 11.345 chi2 prune
    suppressed: bool = False
    # accept-time diagnostics (loop closures from the live matcher):
    # drift of the accepted measurement from the graph prediction
    # projected on the wide axis of its own covariance, and that
    # axis's claimed sigma (see _match_search ridge arbitration)
    along_drift: float = float("nan")
    sigma_along: float = float("nan")


class SubmapLoopCloser:
    def __init__(self, config: SlamConfig, frontend: Frontend):
        self.config = config
        self.frontend = frontend
        self.submaps: list[Submap] = []
        self.last_pose_idx = 0
        self.last_opt_pose_index = 0
        self.loop_closure_min_score = config.loop_closure_min_score
        # pose graph state (parallel arrays per chain vertex)
        self.pg_poses: list[np.ndarray] = []
        self.pg_meas: list[np.ndarray] = []
        self.pg_info: list[np.ndarray] = []
        self.closures: list[Closure] = []
        self.false_closures = 0
        self.ridge_drift_rejects = 0
        # grid geometry: big enough for traj_len + 2*range_max
        extent = (
            config.submap_trajectory_length + 2.0 * config.range_max + 2.0
        )
        size = int(math.ceil(extent / config.submap_resolution / 64.0) * 64)
        self.spec = GridSpec(size=size, resolution=config.submap_resolution)
        hsize = int(math.ceil(extent / 0.05 / 64.0) * 64)
        self.high_spec = GridSpec(size=hsize, resolution=0.05)
        self.match_calls = 0
        # intra-tick wall-time accounting (seconds per phase; read by
        # scripts/prof_e2e.py -- negligible overhead, always on)
        import collections as _collections

        self.prof = _collections.defaultdict(float)
        # local-refinement accept/reject counters (diagnostics)
        self.local_stats = {
            "dist": 0, "no_submap": 0, "corr": 0, "score": 0,
            "few_points": 0, "covered": 0, "accepted": 0,
        }
        # per-keyframe refinement counters (diagnostics)
        self.kf_stats = {
            "no_submap": 0, "corr": 0, "score": 0, "few_points": 0,
            "bound": 0, "accepted": 0,
        }
        self._kf_edge_done = 1  # next keyframe to consider for kf edges
        # device-stacked pooled grids for the batched pin screen
        # (accelerator path of _keyframe_edges); None = rebuild
        self._pin_stack = None
        self._spectra_stack = None
        self._high_stack = None
        # optional jax.sharding.Mesh with a "blocks" axis: when set,
        # every pose-graph solve runs the shard_map multi-chip solver
        # (parallel/dist_solver.optimize_pose_graph_sharded)
        self.mesh = None
        # optional jax.sharding.Mesh with a "cands" axis: when set,
        # candidate matching fans out across devices
        # (ops/matching.match_candidates_sharded, SURVEY §2.7 row 1 --
        # the multi-chip replacement for the reference's ctpl pool)
        self.match_mesh = None

    # -- stats -----------------------------------------------------------
    @property
    def pose_count(self) -> int:
        return len(self.pg_poses)

    @property
    def submap_count(self) -> int:
        return len(self.submaps)

    @property
    def closure_count(self) -> int:
        """Active LOOP closures (the reference's closure statistic;
        local refinement edges are counted separately)."""
        return sum(
            1
            for c in self.closures
            if c.active and not c.suppressed and c.kind == "loop"
        )

    @property
    def local_edge_count(self) -> int:
        return sum(
            1 for c in self.closures if c.active and c.kind == "local"
        )

    @property
    def kf_edge_count(self) -> int:
        return sum(
            1 for c in self.closures if c.active and c.kind == "kf"
        )

    @property
    def false_closure_count(self) -> int:
        return self.false_closures

    def pose_estimates(self) -> np.ndarray:
        return np.stack(self.pg_poses)

    # --------------------------------------------------------------------
    def precompute(self):
        """Finalize a submap when enough trajectory accumulated
        (submap_loop_closer.cpp:63-98)."""
        import time as _time

        kfs = self.frontend.keyframes
        if not kfs:
            return
        if self.config.kf_refine:
            _t = _time.perf_counter()
            self._keyframe_edges()
            self.prof["kf_edges"] += _time.perf_counter() - _t
        est = self.frontend.estimates()
        traj_len = 0.0
        mid = -1
        i = self.last_pose_idx + 1
        while i < len(kfs):
            traj_len += float(
                np.linalg.norm(est[i, :2] - est[i - 1, :2])
            )
            if traj_len > self.config.submap_trajectory_length / 2 and mid == -1:
                mid = i
            if traj_len > self.config.submap_trajectory_length:
                break
            i += 1
        if traj_len <= self.config.submap_trajectory_length:
            return
        _t = _time.perf_counter()
        rd = construct_multicloud(
            [k.data for k in kfs], est, self.last_pose_idx, mid, i + 1
        )
        cfg = self.config
        sm_grid = build_submap_grid(
            rd, self.spec, cfg.hit_probability, cfg.miss_probability
        )
        hi_grid = build_submap_grid(
            rd, self.high_spec, cfg.hit_probability, cfg.miss_probability
        )
        depth = max(1, cfg.branch_and_bound_depth)
        pyr = precompute_pyramid(
            sm_grid.probs, depth, smooth=cfg.smoothing_kernel
        )
        self.prof["grid_build"] += _time.perf_counter() - _t
        self.submaps.append(
            Submap(
                anchor_idx=mid,
                score_grid=pyr[0],
                pooled_grid=pyr[depth - 1],
                probs=sm_grid.probs,
                origin=sm_grid.origin,
                high_res=hi_grid.probs,
                high_origin=hi_grid.origin,
                resolution=self.spec.resolution,
                start_idx=self.last_pose_idx,
                end_idx=i + 1,
            )
        )
        # on an accelerator backend the pin screen runs on device
        # (_keyframe_edges); invalidate the stacked pooled-grid cache
        # so it rebuilds with the new submap included
        self._pin_stack = None
        self._spectra_stack = None
        self._high_stack = None
        self.last_pose_idx = max(0, mid - cfg.submap_overlap_poses)
        if cfg.local_refine:
            _t = _time.perf_counter()
            self._chain_edges()
            self.prof["chain_edges"] += _time.perf_counter() - _t

    # --------------------------------------------------------------------
    def _gt_edge_hook(self, kind: str, i: int, j: int, meas):
        """Eval-harness-only error-budget hook (never active in real
        runs): with SLAM_GT_EDGES=loop,local,kf[,odom] and SLAM_GT_FILE
        set, replace the named edge families' measurements with the
        ground-truth relative pose of their endpoints. Differencing
        ATE across family subsets attributes the remaining error to
        measurement noise per family vs graph structure (the round-3
        budget decomposition; see scripts/edge_budget.py)."""
        kinds = os.environ.get("SLAM_GT_EDGES")
        if not kinds or kind not in kinds.split(","):
            return meas
        if not hasattr(self, "_gt_edge_data"):
            from ..eval.closures import load_gt

            self._gt_edge_data = load_gt(os.environ["SLAM_GT_FILE"])
        from ..eval.closures import interp_gt

        gt_times, gt_poses = self._gt_edge_data
        kfs = self.frontend.keyframes
        gi = interp_gt(gt_times, gt_poses, kfs[i].odom_times[0])
        gj = interp_gt(gt_times, gt_poses, kfs[j].odom_times[0])
        return se2.relative(gi, gj)

    def _ensure_pg_init(self):
        if not self.pg_poses and self.frontend.keyframes:
            k0 = self.frontend.keyframes[0]
            self.pg_poses.append(k0.estimate.copy())
            self.pg_meas.append(np.zeros(3))
            self.pg_info.append(np.eye(3))
            self.last_opt_pose_index = 1

    def _map_transforms(self):
        """trans_pre and per-pose map-frame lookup
        (submap_loop_closer.cpp:144-148)."""
        lm_est = self.frontend.estimates()
        lo = self.last_opt_pose_index
        trans_pre = se2.compose(
            self.pg_poses[lo - 1], se2.inverse(lm_est[lo - 1])
        )

        def map_pose(idx):
            if idx < lo:
                return self.pg_poses[idx]
            return se2.compose(trans_pre, lm_est[idx])

        return map_pose

    # --------------------------------------------------------------------
    def match(self, lock=None) -> bool:
        """Find + apply one loop closure (submap_loop_closer.cpp:118-297).
        Returns True if a closure was accepted.

        lock: optional mutex guarding frontend state (the realtime
        mode's concurrent-frontend case). Like the reference's
        shared-lock discipline (submap_loop_closer.cpp:122-157), state
        is snapshotted under the lock, the expensive candidate matching
        runs unlocked, and the apply phase re-locks.
        """
        import contextlib
        import time as _time

        guard = lock if lock is not None else contextlib.nullcontext()
        _t = _time.perf_counter()
        with guard:
            snap = self._match_snapshot()
        self.prof["match_snapshot"] += _time.perf_counter() - _t
        result = None
        if snap is not None:
            _t = _time.perf_counter()
            result = self._match_search(snap)  # expensive; runs unlocked
            self.prof["match_search"] += _time.perf_counter() - _t
        if result is None:
            return False
        _t = _time.perf_counter()
        with guard:
            self._match_apply(snap, result)
        self.prof["match_apply"] += _time.perf_counter() - _t
        return True

    def _match_snapshot(self):
        """Under-lock phase: build the query multiscan + candidate set
        (deep copies / device arrays, submap_loop_closer.cpp:122-157)."""
        cfg = self.config
        kfs = self.frontend.keyframes
        n = len(kfs)
        if n <= 2 or len(self.submaps) <= cfg.last_submap_not_match:
            return None
        self._ensure_pg_init()
        est = self.frontend.estimates()

        traj_len = 0.0
        mid = -1
        i = n - 2
        while i >= 0:
            traj_len += float(np.linalg.norm(est[i + 1, :2] - est[i, :2]))
            if traj_len >= cfg.last_traj_length / 2 and mid == -1:
                if i - self.last_opt_pose_index < 2:
                    return None
                mid = i
            if traj_len >= cfg.last_traj_length:
                break
            i -= 1
        i = max(i, 0)
        if mid < 0:
            return None

        query = construct_multicloud(
            [k.data for k in kfs], est, i, mid, n, returns_only=True
        )
        if len(query) == 0:
            return None
        map_pose = self._map_transforms()
        bl_trans = map_pose(mid)

        max_range = float(np.linalg.norm(query, axis=1).max())
        import jax as _jax

        if _jax.default_backend() != "cpu":
            # freeze the rotation count: through the remote-compile
            # tunnel every distinct (C, R) shape of the fused matcher
            # costs ~30-90 s to compile, and max_range varies per query.
            # range_max gives the FINEST angular step (a superset of
            # rotations -- strictly more thorough, same best match);
            # the fused matcher's coarse bounds prune the extras for
            # ~free.
            max_range = cfg.range_max
        spec = matching.search_spec(
            cfg.linear_search_window,
            cfg.angular_search_window,
            max_range,
            cfg.submap_resolution,
        )

        eit = len(self.submaps) - cfg.last_submap_not_match
        candidates = []
        for sm in self.submaps[:eit]:
            anchor = map_pose(sm.anchor_idx)
            if (
                np.linalg.norm(bl_trans[:2] - anchor[:2])
                >= cfg.max_match_distance
            ):
                continue
            # estimated relative pose anchor -> query mid: the search
            # window covers +-linear_search_window of DRIFT around this
            # estimate, exactly like the reference centering its
            # SearchParameters on the initial pose estimate
            # (fast_correlative_scan_matcher_2d.cc:480-507). Implemented
            # by shifting the candidate's grid origin: cells are
            # floor((R(th) p + t_est - origin)/res), so passing
            # origin - t_est to the matcher re-centers the correlation.
            t_est = se2.relative(anchor, bl_trans)[:2]
            candidates.append(
                (
                    sm,
                    float(se2.wrap_angle(bl_trans[2] - anchor[2])),
                    t_est,
                )
            )
        if not candidates:
            return None
        return dict(query=query, spec=spec, candidates=candidates, mid=mid)

    def _match_search(self, snap):
        """Unlocked phase: candidate matching + high-res refinement."""
        cfg = self.config
        query = snap["query"]
        spec = snap["spec"]
        candidates = snap["candidates"]
        # the ctpl-pool fan-out of submap_loop_closer.cpp:158-171 as
        # exact upper-bound rotation pruning + batched FFT correlation.
        # On CPU the sequential per-candidate loop wins (the running-
        # best floor prunes real work); on TPU per-candidate host
        # round-trips cost more than the pruned correlations, so the
        # chunk-batched variant (one sync per ~8 candidates) is used.
        import jax

        stride = 1 << (max(1, cfg.branch_and_bound_depth) - 1)
        # CPU: the sequential pruned loop (running-best floor prunes
        # real work, host syncs are free). Non-CPU: the fused one-call
        # matcher (ops/matching.fused_match) -- coarse bounds, top-K
        # exact FFT planes, argmax and covariance all in ONE device
        # program; round-2's chunked multi-call path paid 597 ms in
        # gather-bound bound scans plus ~30-50 ms per host sync through
        # the tunnel.
        if jax.default_backend() == "cpu":
            match_fn = matching.match_candidates_pruned
        else:
            import functools as _ft

            # pad the candidate axis to a fixed bucket: with the
            # frozen rotation count above, the whole run compiles ONE
            # fused-matcher shape. Per-submap grid spectra are cached
            # on the Submap (fix_submap-style precompute) so the
            # MXU exact stage pays no per-query spectrum build.
            fft_sz = int(candidates[0][0].score_grid.shape[0]) + 64
            # K=256: the exactness contract pages through planes whose
            # coarse bound exceeds the accept floor; overlapping
            # submaps put hundreds of planes above it, and at K=64 a
            # miss cost 10-42 paging dispatches per tick (~30 ms RPC
            # each through the tunnel). 4x the planes per pass costs
            # ~10 ms of MXU time and collapses the page count.
            match_fn = _ft.partial(
                matching.match_candidates_fused, c_bucket=16, K=256,
                spectra_list=[
                    c[0].get_spectrum(fft_sz) for c in candidates
                ],
            )
        # search centered on the estimated relative pose: shift each
        # candidate's origin by its t_est (see _match_snapshot)
        import jax.numpy as _jnp

        origins = [
            _jnp.asarray(c[0].origin) - _jnp.asarray(c[2], _jnp.float32)
            for c in candidates
        ]
        if self.match_mesh is not None:
            ci, score, pose, cov = matching.match_candidates_sharded(
                [c[0].score_grid for c in candidates],
                origins,
                [c[1] for c in candidates],
                query,
                spec,
                self.match_mesh,
                float(self.loop_closure_min_score),
            )
        else:
            import time as _time

            _t = _time.perf_counter()
            ci, score, pose, cov = match_fn(
                [c[0].score_grid for c in candidates],
                [c[0].pooled_grid for c in candidates],
                origins,
                [c[1] for c in candidates],
                query,
                spec,
                float(self.loop_closure_min_score),
                stride,
            )
            self.prof["match_correlate"] += _time.perf_counter() - _t
        self.match_calls += len(candidates)
        if os.environ.get("SLAM_LOG_MATCHES"):
            # match-score progress lines like the reference's stdout
            # (submap_loop_closer.cpp:174); on a miss, re-run with a low
            # floor to report the best sub-threshold score for diagnosis
            if ci is None:
                dci, dscore, _, _ = match_fn(
                    [c[0].score_grid for c in candidates],
                    [c[0].pooled_grid for c in candidates],
                    origins,
                    [c[1] for c in candidates],
                    query, spec, 0.30, stride,
                )
                print(
                    f"[match] mid={snap['mid']} cands={len(candidates)} "
                    f"MISS best={dscore if dci is not None else '<0.30'}"
                    + (
                        f" (submap anchor={candidates[dci][0].anchor_idx})"
                        if dci is not None
                        else ""
                    ),
                    flush=True,
                )
            else:
                drift = np.asarray(pose[:2], np.float64)
                print(
                    f"[match] mid={snap['mid']} cands={len(candidates)} "
                    f"HIT score={score:.3f} "
                    f"anchor={candidates[ci][0].anchor_idx} "
                    f"offset={np.linalg.norm(drift):.2f}m",
                    flush=True,
                )
        if ci is None:
            return None
        sm = candidates[ci][0]
        # matcher pose is drift around the estimate; full relative
        # translation = t_est + matched offset
        pose = np.asarray(pose, np.float64).copy()
        pose[:2] += np.asarray(candidates[ci][2], np.float64)

        # optional match-case dump for scripts/submap_debug.py (the
        # reference's submap_test.cpp debugging flow)
        if os.environ.get("SLAM_DUMP_MATCHES"):
            dump_dir = os.environ.get("SLAM_DUMP_DIR", "/tmp/slam_matches")
            os.makedirs(dump_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(
                    dump_dir, f"match_{len(self.closures):03d}.npz"
                ),
                probs=np.asarray(sm.score_grid),
                origin=np.asarray(origins[ci]),
                resolution=sm.resolution,
                query=query,
                init_theta=float(candidates[ci][1]),
                t_est=np.asarray(candidates[ci][2]),
                score=score,
            )

        # high-res refinement (ceres replacement)
        import jax.numpy as jnp

        Nb = _bucket(len(query), 256)
        ptsb = np.zeros((Nb, 2), np.float32)
        ptsb[: len(query)] = query
        valid = np.arange(Nb) < len(query)
        import time as _time

        _t = _time.perf_counter()
        refined, censi_cov, _ = matching.refine_pose_cov(
            sm.high_res, sm.high_origin, 0.05, jnp.asarray(ptsb),
            jnp.asarray(valid), jnp.asarray(pose, dtype=jnp.float32),
        )
        refined = np.asarray(refined).astype(np.float64)
        self.prof["match_refine"] += _time.perf_counter() - _t
        cov = self._closure_cov(np.asarray(censi_cov, np.float64), cov)

        along_drift, sigma_along, reject = self._ridge_drift_gate(
            cov, refined, np.asarray(candidates[ci][2], np.float64)
        )
        if reject:
            if os.environ.get("SLAM_LOG_MATCHES"):
                print(
                    f"[match] mid={snap['mid']} REJECT ridge-drift "
                    f"anchor={sm.anchor_idx} along={along_drift:.2f}m "
                    f"(sigma_along={sigma_along:.2f})",
                    flush=True,
                )
            self.ridge_drift_rejects += 1
            return None

        # diagnostic oracle gate (eval harness only): with
        # SLAM_GT_ORACLE=<name>.gt, reject closures whose measurement
        # disagrees with ground truth -- measures the accuracy CEILING
        # a perfect-precision detector would reach (never affects real
        # runs; see RESULTS.md error budget)
        gt_path = os.environ.get("SLAM_GT_ORACLE")
        if gt_path:
            from ..eval.closures import interp_gt, load_gt

            if not hasattr(self, "_oracle_gt"):
                self._oracle_gt = load_gt(gt_path)
            gt_times, gt_poses = self._oracle_gt
            kfs = self.frontend.keyframes
            gi = interp_gt(gt_times, gt_poses, kfs[sm.anchor_idx].odom_times[0])
            gj = interp_gt(gt_times, gt_poses, kfs[snap["mid"]].odom_times[0])
            err = se2.relative(se2.relative(gi, gj), refined)
            if np.linalg.norm(err[:2]) > 0.5 or abs(
                se2.wrap_angle(err[2])
            ) > 0.2:
                print(
                    f"[oracle] reject kf{sm.anchor_idx}->kf{snap['mid']} "
                    f"err=({err[0]:+.2f},{err[1]:+.2f})",
                    flush=True,
                )
                return None
        return dict(
            sm=sm, refined=refined, cov=cov,
            along_drift=along_drift, sigma_along=sigma_along,
        )

    def _ridge_drift_gate(self, cov, refined, t_est):
        """Along-ridge drift arbitration (ROADMAP round-5 #3): project
        the accepted measurement's drift from the graph prediction
        (search center t_est) onto the WIDE axis of its own
        covariance. Along that axis the score surface declared itself
        ambiguous (sigma_along > closure_ridge_sigma), so a large
        claimed correction there is exactly the component the matcher
        cannot actually see -- a corridor alias outscoring the true
        pose by periodic self-similarity (measured accept-time drifts
        on the sim worlds: true ridge closures at median 0.08 m, the
        counted-false aliases at 1.46-4.19 m; see
        utils/config.closure_ridge_max_drift).

        Returns (along_drift, sigma_along, reject)."""
        cfg = self.config
        tcov = 0.5 * (cov[:2, :2] + cov[:2, :2].T)
        w_e, V_e = np.linalg.eigh(tcov)
        sigma_along = float(np.sqrt(max(w_e[1], 0.0)))
        along_drift = float(
            abs((np.asarray(refined[:2], np.float64) - t_est) @ V_e[:, 1])
        )
        max_ad = cfg.closure_ridge_max_drift
        reject = bool(
            max_ad > 0
            and sigma_along > cfg.closure_ridge_sigma
            and along_drift > max_ad
        )
        return along_drift, sigma_along, reject

    def _closure_cov(self, censi_cov: np.ndarray, win_cov: np.ndarray):
        """Closure covariance = high-res GN (Censi) measurement
        covariance + the EXCESS score-surface ambiguity of the
        correlative window + a small floor.

        Round-2 shipped window_cov alone, whose calibration floor
        (2.5 cells = 0.25 m sigma) made every closure ~7x weaker than
        its measured error (edge budget on sim-office: closure RMS
        0.036 m vs sigma 0.25 -- the graph barely listened to its best
        measurements). The Censi covariance of the high-res refinement
        is the honest local precision; window_cov still carries the
        one thing Censi cannot see -- multi-modal/ridge ambiguity
        within the search window (an along-corridor alias makes
        window_cov wide in that direction while the local Hessian
        looks sharp). Combine: keep window_cov's width only where it
        EXCEEDS its own calibration floor (whitened-eigenvalue
        clipping, unit-consistent), and add it to the Censi term.

        closure_cov_mode="window" restores the round-2 behavior for
        ablation."""
        cfg = self.config
        if cfg.closure_cov_mode == "window":
            return win_cov
        # sharpen only UNAMBIGUOUS matches: when the window moments
        # report a translational ridge (sigma above the window's own
        # 0.25 m calibration floor), the argmax itself may be an alias
        # that genuinely outscored the true pose -- sharpening its
        # cross-ridge/rotation components then drags the graph
        # (measured on sim-killian: hybrid-everywhere 0.363 vs
        # window 0.188; office closures are floor-sharp and gain from
        # hybrid, 0.22 -> 0.082)
        w_t = np.linalg.eigvalsh(win_cov[:2, :2])
        if float(np.sqrt(w_t.max())) > cfg.closure_ridge_sigma:
            if cfg.closure_ridge_mode == "inflate":
                return self._ridge_inflate(win_cov)
            return win_cov
        return self._cov_hybrid(
            censi_cov, win_cov, 0.01,
            cfg.closure_sigma_xy, cfg.closure_sigma_th,
        )

    def _ridge_inflate(self, win_cov: np.ndarray) -> np.ndarray:
        """Honest along-ridge covariance for ambiguous (corridor)
        closures: under a score surface flat along the ridge, the
        along-ridge component of the match is ~uniformly distributed
        over the search window (the detector reports SOME point on the
        ridge; round-3 measurement: counted-false ridge closures carry
        1.4-5.0 m of along-ridge ground-truth error against a
        band-weighted window sigma of 0.58-1.3 -- the +-w_lin moment
        window underestimates a ridge longer than itself). Inflate
        every translational eigendirection that exceeds the ridge
        threshold to at least the uniform-over-window variance L^2/3
        (sigma ~2.9 m at L=5); cross-ridge and rotation keep their
        measured (sharp) values, which is where a corridor closure's
        real information lives."""
        cfg = self.config
        L = cfg.linear_search_window
        ridge_var = L * L / 3.0
        t = 0.5 * (win_cov[:2, :2] + win_cov[:2, :2].T)
        w, V = np.linalg.eigh(t)
        w2 = np.where(
            np.sqrt(np.maximum(w, 0.0)) > cfg.closure_ridge_sigma,
            np.maximum(w, ridge_var),
            w,
        )
        out = win_cov.copy()
        out[:2, :2] = V @ np.diag(w2) @ V.T
        return out

    def _cov_hybrid(self, censi_cov, win_cov, angular_step,
                    floor_xy, floor_th):
        """Censi + above-floor window excess + floor (see _closure_cov).
        The window floor (2.5 cells / 2.5 rotation steps) matches the
        calibration floor window_cov/score_volume_cov always add."""
        res = self.spec.resolution
        f = np.array(
            [2.5 * res, 2.5 * res, 2.5 * angular_step], np.float64
        )
        # whiten by the floor, keep only the above-floor excess
        Fi = np.diag(1.0 / f)
        M = Fi @ win_cov @ Fi
        M = 0.5 * (M + M.T)
        w, V = np.linalg.eigh(M)
        excess = (
            np.diag(f) @ V @ np.diag(np.maximum(w - 1.0, 0.0)) @ V.T
            @ np.diag(f)
        )
        floor = np.diag([floor_xy**2, floor_xy**2, floor_th**2])
        return censi_cov + excess + floor

    def _score_grid_host(self, sm: Submap):
        if sm.score_grid_np is None:
            sm.score_grid_np = np.asarray(sm.score_grid, np.float64)
        return sm.score_grid_np

    def _pooled_grid_host(self, sm: Submap):
        if sm.pooled_np is None:
            sm.pooled_np = np.asarray(sm.pooled_grid, np.float64)
        return sm.pooled_np

    def _pin_match_grid(self, score_np, refine_grid, grid_origin, res,
                        query, seed, refine_origin=None, refine_res=None,
                        min_overlap=0.0, floor_xy=None, floor_th=None,
                        pooled_np=None):
        """Small-window exhaustive correlative match of a short query
        against one grid, centered on the pose-estimate seed -- the
        per-keyframe pin measurement (round-3 redesign).

        Round-2 pins GN-refined from the seed and inherited its basin:
        measured pin errors on sim-office were 0.38 m RMS (p90 0.72)
        against a claimed sigma of 0.046 -- seeded descent on a sparse
        query escapes to neighboring basins and the Censi covariance
        cannot see it. An exhaustive window search with the centered
        tie-break has no basin to escape; ambiguity within the window
        lands in the band-weighted volume covariance
        (matching.score_volume_cov) instead of a wrong mean. The tiny
        window (~15 cells x ~33 rotations) runs as direct numpy
        gathers on the host -- far below FFT break-even, no device
        sync. Refinement + Censi covariance on the RAW grid (unbiased:
        the forward-looking 2x2 dilation of the score grid centers
        wall bands at half-integer cells). Returns
        (refined, cov, score, None) or (None, None, None, reason)."""
        cfg = self.config
        max_range = float(np.linalg.norm(query, axis=1).max())
        spec = matching.search_spec(
            cfg.kf_search_window, cfg.kf_angular_window, max_range, res
        )
        origin = np.asarray(grid_origin, np.float64) - seed[:2]
        ks = np.arange(-spec.n_angular, spec.n_angular + 1)
        thetas = seed[2] + ks * spec.angular_step
        stride = 1 << (max(1, cfg.branch_and_bound_depth) - 1)
        if pooled_np is not None and stride >= 2 * spec.n_linear:
            # exact B&B-root bound from the pooled pyramid level: one
            # (or 2x2 at stride == 2*n_linear; see pin_bound_host's
            # coverage analysis) lookup per (rotation, point) instead
            # of the full window correlation
            bound = matching.pin_bound_host(
                pooled_np, origin, res, query, thetas, spec.n_linear,
                stride=stride,
            )
            if bound < cfg.kf_min_score:
                return None, None, None, "bound"
        scores = matching.correlate_window_host(
            score_np, origin, res, query, thetas, spec.n_linear
        )
        if refine_origin is None:
            refine_origin = grid_origin
        if refine_res is None:
            refine_res = res
        return self._pin_accept(
            scores, thetas, spec, seed, refine_grid, refine_origin,
            refine_res, query, min_overlap, floor_xy, floor_th, res,
        )

    def _pin_accept(self, scores, thetas, spec, seed, refine_grid,
                    refine_origin, refine_res, query, min_overlap,
                    floor_xy, floor_th, res):
        """Shared pin acceptance from a computed (R, W, W) score
        volume: centered-tie-break argmax, score gate, band-weighted
        volume covariance, high-res GN refinement, overlap + basin
        gates, hybrid covariance (see _pin_match_grid)."""
        cfg = self.config
        k, i, jx = matching._argmax_center_tiebreak(scores, spec.n_linear)
        sc = float(scores[k, i, jx])
        if sc < cfg.kf_min_score:
            return None, None, None, "score"
        wcov = matching.score_volume_cov(
            scores, thetas, seed[2], res, spec.n_linear
        )
        pose0 = np.array(
            [
                (i - spec.n_linear) * res + seed[0],
                (jx - spec.n_linear) * res + seed[1],
                thetas[k],
            ]
        )
        import jax.numpy as jnp

        Nb = _bucket(len(query), 256)
        ptsb = np.zeros((Nb, 2), np.float32)
        ptsb[: len(query)] = query
        valid = np.arange(Nb) < len(query)
        refined, censi, probs = matching.refine_pose_cov(
            refine_grid, jnp.asarray(refine_origin, jnp.float32),
            float(refine_res), jnp.asarray(ptsb),
            jnp.asarray(valid), jnp.asarray(pose0, dtype=jnp.float32),
        )
        refined = np.asarray(refined).astype(np.float64)
        if min_overlap > 0.0:
            # fraction of query points on occupied refine-grid cells at
            # the refined pose: keeps only queries that genuinely
            # re-observe the target's mapped structure
            pr = np.asarray(probs)[: len(query)]
            if float((pr > 0.55).mean()) < min_overlap:
                return None, None, None, "score"
        # refinement polishes sub-cell; a larger move left the
        # correlative peak's basin
        if (
            np.linalg.norm(refined[:2] - pose0[:2]) > 0.3
            or abs(se2.wrap_angle(refined[2] - pose0[2])) > 0.1
        ):
            return None, None, None, "corr"
        cov = self._cov_hybrid(
            np.asarray(censi, np.float64), wcov, spec.angular_step,
            cfg.kf_refine_sigma_xy if floor_xy is None else floor_xy,
            cfg.kf_refine_sigma_th if floor_th is None else floor_th,
        )
        return refined, cov, sc, None

    def extend_chain(self):
        """Extend the pose-graph chain to the CURRENT keyframe count
        (the frontend may have grown during an unlocked search, exactly
        like the reference re-reading lm_graph.poses at apply time,
        submap_loop_closer.cpp:204-225) and prune the landmark-graph
        window to one fixed pose (submap_loop_closer.cpp:256-270:
        opt.clear() + single vertex). Called at closure apply and at
        final cleanup (so tail-of-run local edges enter the final
        optimization)."""
        self._ensure_pg_init()
        if not self.pg_poses:
            return
        kfs = self.frontend.keyframes
        est = self.frontend.estimates()
        n = len(kfs)
        marg = {}
        if (
            self.config.chain_info_mode == "marginal"
            and n > self.last_opt_pose_index
        ):
            marg = self.frontend.relative_chain_info(
                self.last_opt_pose_index, n
            )
        for idx in range(self.last_opt_pose_index, n):
            meas = se2.relative(est[idx - 1], est[idx])
            meas = self._gt_edge_hook("odom", idx - 1, idx, meas)
            self.pg_meas.append(meas)
            # landmark-posterior marginal info where available (see
            # frontend.relative_chain_info), raw odometry otherwise
            self.pg_info.append(
                marg.get(idx, kfs[idx].odom_info).copy()
            )
            self.pg_poses.append(se2.compose(self.pg_poses[-1], meas))
        if n > self.last_opt_pose_index:
            self.last_opt_pose_index = n
            self.frontend.window_start = max(
                1, self.last_opt_pose_index - 1
            )
            # retire the window's observation edges into the archive
            # (they feed the final joint solve) before pruning the
            # active landmark graph to one fixed pose
            self.frontend.archived_obs.extend(self.frontend.obs_edges)
            self.frontend.obs_edges.clear()
            self.frontend.last_landmark_edge = 0
            self.frontend.need_reinit = True

    def _match_apply(self, snap, result):
        """Under-lock phase: extend the pose-graph chain, add the DCS
        closure edge (submap_loop_closer.cpp:272-285) and optimize."""
        sm = result["sm"]
        mid = snap["mid"]
        self.extend_chain()
        self.closures.append(
            Closure(
                i=sm.anchor_idx,
                j=mid,
                meas=self._gt_edge_hook(
                    "loop", sm.anchor_idx, mid, result["refined"]
                ),
                info=np.linalg.inv(result["cov"]),
                along_drift=result["along_drift"],
                sigma_along=result["sigma_along"],
            )
        )
        self.optimize(iterations=20)

    # --------------------------------------------------------------------
    def _refine_on_submap(self, sm: Submap, query: np.ndarray, seed,
                          max_correction: float, min_overlap: float,
                          high_res: bool = False):
        """Two-stage GN refinement of query points against a submap's
        grids, seeded at the current pose estimate: first on the
        dilated score grid (wide convergence basin), then on the raw
        probability grid (unbiased -- the forward-looking 2x2 dilation
        centers wall bands at half-integer cells). Covariance is
        Censi-style from the raw-grid GN Hessian, so grid-flat
        directions carry ~zero information.

        Returns (refined (3,), cov (3,3), overlap) on success or
        (None, reason, None) where reason is a stats-counter key."""
        import jax.numpy as jnp

        Nb = _bucket(len(query), 256)
        ptsb = np.zeros((Nb, 2), np.float32)
        ptsb[: len(query)] = query
        valid = np.arange(Nb) < len(query)
        pts_d = jnp.asarray(ptsb)
        valid_d = jnp.asarray(valid)
        # both GN stages in one device program (one host sync instead
        # of two; see refine_pose_cov_two_stage)
        if high_res:
            # final polish on the 0.05 m grid: halves the
            # discretization error of the match-resolution grid
            refined, cov, probs = matching.refine_pose_cov_two_stage(
                sm.score_grid, sm.origin, float(sm.resolution),
                sm.high_res, sm.high_origin, 0.05,
                pts_d, valid_d, jnp.asarray(seed, dtype=jnp.float32),
            )
        else:
            refined, cov, probs = matching.refine_pose_cov_two_stage(
                sm.score_grid, sm.origin, float(sm.resolution),
                sm.probs, sm.origin, float(sm.resolution),
                pts_d, valid_d, jnp.asarray(seed, dtype=jnp.float32),
            )
        refined = np.asarray(refined).astype(np.float64)
        # reject a jump the pose estimate cannot plausibly have
        # drifted: the refinement left its basin
        if (
            np.linalg.norm(refined[:2] - seed[:2]) > max_correction
            or abs(se2.wrap_angle(refined[2] - seed[2])) > 0.35
        ):
            return None, "corr", None
        # overlap gate: fraction of query points landing on occupied
        # (dilated) cells at the refined pose. Unknown cells score
        # PMIN, so a query that mostly left the target's observed
        # region cannot pass.
        pr = np.asarray(probs)[: len(query)]
        overlap = float((pr > 0.55).mean())
        if overlap < min_overlap:
            return None, "score", None
        return refined, np.asarray(cov, np.float64), overlap

    # --------------------------------------------------------------------
    def _keyframe_edges(self) -> int:
        """Per-keyframe pins: small-window EXHAUSTIVE correlative match
        of a short multicloud around each completed keyframe against
        the newest finalized submap that did not include it
        (new-engine capability, no reference counterpart).

        Round-2 pins GN-refined from the seed: basin escapes gave
        0.38 m RMS pin error against a claimed sigma of 0.046 on
        sim-office and poisoned the graph (see scripts/edge_budget.py).
        Round 3 replaces the seeded descent with an exhaustive window
        search (no basin to escape; in-window ambiguity lands in the
        band-weighted volume covariance) and gates HARD: correlative
        score >= kf_min_score AND high-res occupied-cell overlap >=
        kf_min_overlap. The gates keep only keyframes that genuinely
        re-observe the older submap (measured: 4/275 on sim-office
        with 0.019 m RMS error; corridor worlds, where the robot walks
        straight out of the previous submap, yield many more). An
        active-submap variant (match-then-insert within the CURRENT
        window, the Cartographer local-SLAM pattern) was tried and
        measured useless at 11-beam sparsity: the window grid drifts
        with the same estimates the pin is meant to correct, so the
        match just reproduces the seed, and bare keyframe stores alias
        to the previous keyframe's beam pattern."""
        cfg = self.config
        stats = self.kf_stats
        if not cfg.kf_refine or not self.submaps:
            return 0
        kfs = self.frontend.keyframes
        self._ensure_pg_init()
        map_pose = self._map_transforms()
        # a keyframe's scan store is complete once its successor exists
        last_complete = len(kfs) - 1
        est_arr = None
        pending = []
        for j in range(self._kf_edge_done, last_complete):
            smi = None
            for si in range(len(self.submaps) - 1, -1, -1):
                if self.submaps[si].end_idx <= j:
                    smi = si
                    break
            if smi is None:
                stats["no_submap"] += 1
                continue
            # query = short multicloud centered on j: a single 11-beam
            # keyframe store is too sparse to pin (it aliases to the
            # previous keyframe's beam pattern)
            if est_arr is None:
                est_arr = np.stack(
                    [map_pose(k) for k in range(len(kfs))]
                )
            query = construct_multicloud(
                [k.data for k in kfs], est_arr, max(0, j - 1), j,
                min(j + 2, len(kfs)), returns_only=True,
            )
            if len(query) < 12:
                stats["few_points"] += 1
                continue
            if len(query) > 512:  # bound the jit bucket / GN cost
                query = query[
                    np.linspace(0, len(query) - 1, 512).astype(int)
                ]
            seed = se2.relative(
                map_pose(self.submaps[smi].anchor_idx), map_pose(j)
            )
            pending.append((j, smi, query, seed))
        self._kf_edge_done = max(self._kf_edge_done, last_complete)
        if not pending:
            return 0
        import jax

        if jax.default_backend() == "cpu":
            return self._kf_edges_host(pending, stats)
        return self._kf_edges_device(pending, stats)

    def _kf_edges_host(self, pending, stats) -> int:
        """CPU path: direct numpy window correlation against
        host-cached grids (fastest when the grids already live in host
        memory)."""
        cfg = self.config
        made = 0
        for j, smi, query, seed in pending:
            sm = self.submaps[smi]
            refined, cov, score, why = self._pin_match_grid(
                self._score_grid_host(sm), sm.high_res, sm.origin,
                float(sm.resolution), query, seed,
                refine_origin=sm.high_origin, refine_res=0.05,
                min_overlap=cfg.kf_min_overlap,
                pooled_np=self._pooled_grid_host(sm),
            )
            made += self._pin_finish(j, sm, query, refined, cov,
                                     score, why, stats)
        return made

    def _kf_edges_device(self, pending, stats) -> int:
        """Accelerator path, ONE device program per chunk (VERDICT r4
        #4): matching.pin_eval_batch computes the exhaustive window
        scores (FFT-free MXU correlator on the cached per-submap
        spectra), argmax, volume covariance, high-res GN refinement
        and occupancy overlap for up to 8 pins at once and returns one
        packed (B, 26) blob -- a single ~1 KB transfer. The previous
        structure (batch bound pre-gate, then one window-correlation
        call PLUS one refinement call per passer) cost 1 + 2*passers
        RPC round-trips per tick at ~35 ms each through the remote
        tunnel. Host side keeps only the accept gates, identical to
        _pin_accept. Rotation set is frozen from cfg.range_max (like
        _match_snapshot) so exactly one kernel shape ever compiles."""
        cfg = self.config
        import time as _time

        import jax.numpy as jnp

        res = float(self.spec.resolution)
        spec = matching.search_spec(
            cfg.kf_search_window, cfg.kf_angular_window,
            cfg.range_max, res,
        )
        R = 2 * spec.n_angular + 1
        ks = np.arange(R) - spec.n_angular
        size = self.spec.size
        fft_size = size + 64
        _t = _time.perf_counter()
        spectra = self._get_spectra_stack(fft_size)
        high_stack, high_origins = self._get_high_stack()
        self.prof["kf_stack"] += _time.perf_counter() - _t
        made = 0
        B = 8
        for lo in range(0, len(pending), B):
            chunk = pending[lo : lo + B]
            _t = _time.perf_counter()
            pts = np.zeros((B, 512, 2), np.float32)
            val = np.zeros((B, 512), bool)
            orgs = np.zeros((B, 2), np.float32)
            seeds = np.zeros((B, 3), np.float32)
            ths = np.zeros((B, R), np.float32)
            ids = np.zeros(B, np.int32)
            live = np.zeros(B, bool)
            for k, (j, smi, query, seed) in enumerate(chunk):
                pts[k, : len(query)] = query
                val[k, : len(query)] = True
                orgs[k] = (
                    np.asarray(self.submaps[smi].origin, np.float64)
                    - seed[:2]
                )
                seeds[k] = seed
                ths[k] = seed[2] + ks * spec.angular_step
                ids[k] = smi
                live[k] = True
            out = np.asarray(
                matching.pin_eval_batch(
                    spectra, high_stack, high_origins,
                    jnp.asarray(ids), jnp.asarray(orgs),
                    jnp.asarray(seeds), jnp.asarray(pts),
                    jnp.asarray(val), jnp.asarray(ths),
                    jnp.asarray(live), resolution=res,
                    n_linear=int(spec.n_linear), size=int(size),
                    fft_size=int(fft_size),
                ),
                dtype=np.float64,
            )
            self.prof["kf_window"] += _time.perf_counter() - _t
            _t = _time.perf_counter()
            for k, (j, smi, query, seed) in enumerate(chunk):
                sm = self.submaps[smi]
                refined, cov, score, why = self._pin_accept_packed(
                    out[k], spec, cfg.kf_min_score,
                    cfg.kf_min_overlap, cfg.kf_refine_sigma_xy,
                    cfg.kf_refine_sigma_th,
                )
                made += self._pin_finish(j, sm, query, refined, cov,
                                         score, why, stats)
            self.prof["kf_accept"] += _time.perf_counter() - _t
        return made

    def _pin_accept_packed(self, row, spec, min_score, min_overlap,
                           floor_xy, floor_th):
        """Accept gates over one pin_eval_batch row (the same logic as
        _pin_accept, operating on precomputed device outputs).
        Row layout: [score, pose0(3), wcov(9), refined(3), censi(9),
        overlap]."""
        sc = float(row[0])
        if sc < min_score:
            return None, None, None, "score"
        pose0 = row[1:4]
        wcov = row[4:13].reshape(3, 3)
        refined = row[13:16].copy()
        censi = row[16:25].reshape(3, 3)
        overlap = float(row[25])
        if min_overlap > 0.0 and overlap < min_overlap:
            return None, None, None, "score"
        if (
            np.linalg.norm(refined[:2] - pose0[:2]) > 0.3
            or abs(se2.wrap_angle(refined[2] - pose0[2])) > 0.1
        ):
            return None, None, None, "corr"
        cov = self._cov_hybrid(
            censi, wcov, spec.angular_step, floor_xy, floor_th,
        )
        return refined, cov, sc, None

    def _get_spectra_stack(self, fft_size: int):
        """Pow2-padded device stack of the cached per-submap spectra
        (rebuilt lazily when the submap set changes)."""
        if (
            self._spectra_stack is None
            or self._spectra_stack[0] != len(self.submaps)
        ):
            import jax.numpy as jnp

            # min 32: every pow2 stack growth recompiles the (large)
            # pin_eval_batch program at ~12-18 s through the remote
            # compile tunnel; starting at 32 makes one shape cover
            # whole datasets
            M = 32
            while M < len(self.submaps):
                M *= 2
            arrs = [sm.get_spectrum(fft_size) for sm in self.submaps]
            arrs += [arrs[-1]] * (M - len(arrs))
            self._spectra_stack = (len(self.submaps), jnp.stack(arrs))
        return self._spectra_stack[1]

    def _get_high_stack(self):
        """Pow2-padded device stack of high-res grids + origins."""
        if (
            self._high_stack is None
            or self._high_stack[0] != len(self.submaps)
        ):
            import jax.numpy as jnp

            M = 32  # see _get_spectra_stack
            while M < len(self.submaps):
                M *= 2
            grids = [sm.high_res for sm in self.submaps]
            origs = [
                jnp.asarray(sm.high_origin, jnp.float32)
                for sm in self.submaps
            ]
            grids += [grids[-1]] * (M - len(grids))
            origs += [origs[-1]] * (M - len(origs))
            self._high_stack = (
                len(self.submaps), jnp.stack(grids), jnp.stack(origs),
            )
        return self._high_stack[1], self._high_stack[2]

    def _get_pin_stack(self):
        """Pow2-padded device stack of the pooled pin-screen grids
        (rebuilt lazily when the submap set changes)."""
        if (
            self._pin_stack is None
            or self._pin_stack[0] != len(self.submaps)
        ):
            import jax.numpy as jnp

            M = 1
            while M < len(self.submaps):
                M *= 2
            arrs = [sm.pooled_grid for sm in self.submaps]
            arrs += [arrs[-1]] * (M - len(arrs))
            self._pin_stack = (len(self.submaps), jnp.stack(arrs))
        return self._pin_stack[1]

    def _pin_finish(self, j, sm, query, refined, cov, score, why,
                    stats) -> int:
        """Book a pin result: count the reject reason or append the
        closure edge."""
        if refined is None:
            stats[why] += 1
            return 0
        self.closures.append(
            Closure(
                i=sm.anchor_idx, j=j,
                meas=self._gt_edge_hook("kf", sm.anchor_idx, j, refined),
                info=np.linalg.inv(cov), kind="kf",
            )
        )
        stats["accepted"] += 1
        if os.environ.get("SLAM_LOG_MATCHES"):
            print(
                f"[kfpin] kf{sm.anchor_idx}->kf{j} n={len(query)} "
                f"score={score:.2f}",
                flush=True,
            )
        return 1


    # --------------------------------------------------------------------
    def _chain_edges(self) -> int:
        """Submap chain edges (new-engine capability, no reference
        counterpart -- the reference relies solely on its landmark
        frontend between loop closures).

        Called from precompute() right after a new submap finalizes:
        GN-refine the new submap's multicloud (restricted to keyframes
        the target submap did NOT see) against the previous
        `local_refine_hops` submaps' grids, seeded at the current pose
        estimates -- first on the dilated score grid (wide convergence
        basin), then on the raw grid (unbiased; the forward-looking
        2x2 dilation centers wall bands at half-integer cells). Seeding
        at the estimate means there is no exhaustive search and hence
        no aliasing risk; an edge is accepted only if the refined pose
        stays near the seed AND enough query points land on occupied
        target cells. Covariance is Censi-style from the raw-grid GN
        Hessian: ~zero information along grid-flat directions, so a
        corridor's unconstrained axis carries no weight.

        These edges bound odometric drift BETWEEN revisits -- the error
        that dominates long corridors (RESULTS.md killian error budget:
        a perfect-precision closure oracle still plateaus at ~0.29 m;
        the 8-60 s relation errors are pure chain drift). Multi-hop
        edges (anchor k-2 -> anchor k) halve the accumulation rate
        again. Runs under the graph lock (precompute's caller): two
        fixed-shape jitted GNs per hop, ~ms each."""
        cfg = self.config
        stats = self.local_stats
        kfs = self.frontend.keyframes
        new = self.submaps[-1]
        if len(self.submaps) < 2:
            stats["no_submap"] += 1
            return 0
        self._ensure_pg_init()
        map_pose = self._map_transforms()
        bl = map_pose(new.anchor_idx)
        est = self.frontend.estimates()
        # coarse work-skip only (the real gate is the overlap fraction)
        max_dist = cfg.local_refine_max_dist or (
            cfg.range_max + 2.0 * cfg.submap_trajectory_length
        )
        made = 0

        import jax.numpy as jnp

        hops = min(cfg.local_refine_hops, len(self.submaps) - 1)
        for hop in range(1, hops + 1):
            prev = self.submaps[-1 - hop]
            qs = max(new.start_idx, prev.end_idx)
            qe = new.end_idx
            if qe - qs < 2:
                stats["few_points"] += 1
                continue
            if (
                np.linalg.norm(bl[:2] - map_pose(prev.anchor_idx)[:2])
                > max_dist
            ):
                stats["dist"] += 1
                continue
            # landmark-coverage gate: where the line-landmark frontend
            # has solid observations over the query span, its relative
            # estimates are 2-3x more accurate than a scan-to-submap
            # edge (measured on sim-office: frontend ~0.02-0.06 m vs
            # edge ~0.07 m RMS), so adding the edge would only inject
            # noise. Chain edges are the substitute constraint for
            # landmark-starved stretches -- long corridors, exactly
            # where drift compounds. NOTE a directional-diversity
            # requirement (>=2 non-parallel landmark normals) was
            # tried in round 4 and measured HARMFUL on sim-corridor
            # (0.154 -> 0.266): the chain edges it admits there are
            # grid re-measurements of the same lateral estimates the
            # frontend already produced (the submap grid is built from
            # those estimates), so they echo the current drift with a
            # tight Censi covariance instead of adding evidence.
            obs = [
                e
                for e in self.frontend.obs_edges
                if qs <= e.pose_idx < qe
            ]
            if (
                len(obs) >= cfg.local_refine_lm_cover * (qe - qs)
                and len({e.lm_idx for e in obs}) >= 2
            ):
                stats["covered"] += 1
                continue
            query = construct_multicloud(
                [k.data for k in kfs], est, qs, new.anchor_idx, qe,
                returns_only=True,
            )
            if len(query) < 12:
                stats["few_points"] += 1
                continue
            if len(query) > 512:  # bound the jit bucket / GN cost
                query = query[
                    np.linspace(0, len(query) - 1, 512).astype(int)
                ]
            seed = se2.relative(map_pose(prev.anchor_idx), bl)
            refined, cov, overlap = self._refine_on_submap(
                prev, query, seed, cfg.local_refine_max_correction,
                cfg.local_refine_min_overlap,
            )
            if refined is None:
                stats[cov] += 1
                continue
            cov += np.diag(
                [
                    cfg.local_refine_sigma_xy**2,
                    cfg.local_refine_sigma_xy**2,
                    cfg.local_refine_sigma_th**2,
                ]
            )
            self.closures.append(
                Closure(
                    i=prev.anchor_idx, j=new.anchor_idx,
                    meas=self._gt_edge_hook(
                        "local", prev.anchor_idx, new.anchor_idx, refined
                    ),
                    info=np.linalg.inv(cov), kind="local",
                )
            )
            stats["accepted"] += 1
            made += 1
            if os.environ.get("SLAM_LOG_MATCHES"):
                sig = np.sqrt(np.diag(cov))
                print(
                    f"[chain] kf{prev.anchor_idx}->kf{new.anchor_idx} "
                    f"hop={hop} n={len(query)} overlap={overlap:.2f} "
                    f"corr=({refined[0]-seed[0]:+.3f},"
                    f"{refined[1]-seed[1]:+.3f},"
                    f"{se2.wrap_angle(refined[2]-seed[2]):+.3f}) "
                    f"sigma=({sig[0]:.3f},{sig[1]:.3f},{sig[2]:.3f})",
                    flush=True,
                )
        return made

    # --------------------------------------------------------------------
    def refine_map(self, rounds: int = 1, iterations: int = 40,
                   gnc_scale: float = 1.0) -> None:
        """Iterative map refinement (final_cleanup, after the global
        re-match sweep): rebuild every submap's grids from the CURRENT
        optimized poses, re-measure every active loop/local edge with
        a small-window exhaustive match + high-res refinement against
        the rebuilt grids, and re-solve. No reference counterpart (the
        reference linearizes each closure once, at match time).

        Why: a closure's measurement error is dominated by the
        stitching distortion of its query multicloud and target grid,
        both built from the DRIFTED estimates available at match time
        (measured on sim-office: ~0.08 m RMS closure error vs ~0.014
        per-step chain noise). After a global solve the poses are far
        better, so re-building and re-measuring shrinks exactly that
        term -- the same relinearization logic as an outer
        Gauss-Newton loop over the measurement process itself."""
        cfg = self.config
        kfs = self.frontend.keyframes
        if not self.submaps or len(self.pg_poses) < 2:
            return
        for _ in range(max(0, rounds)):
            map_pose = self._map_transforms()
            est_arr = np.stack([map_pose(k) for k in range(len(kfs))])
            self.rebuild_grids(est_arr)
            by_anchor = {sm.anchor_idx: sm for sm in self.submaps}
            n = len(self.pg_poses)
            for c in self.closures:
                if not c.active or c.kind == "kf":
                    continue
                if c.i not in by_anchor or c.i >= n or c.j >= n:
                    continue
                sm = by_anchor[c.i]
                # query around the j endpoint: for loop closures j is a
                # query-multicloud mid (or another submap's anchor after
                # rematch_all); re-measure with a short window around it
                qs = max(0, c.j - 3)
                qe = min(len(kfs), c.j + 4)
                query = construct_multicloud(
                    [k.data for k in kfs], est_arr, qs, c.j, qe,
                    returns_only=True,
                )
                if len(query) < 12:
                    continue
                if len(query) > 512:
                    query = query[
                        np.linspace(0, len(query) - 1, 512).astype(int)
                    ]
                seed = se2.relative(est_arr[c.i], est_arr[c.j])
                # pose: seeded two-stage GN (dilated grid for basin,
                # high-res for precision). Post-solve seeds are within
                # ~0.1 m of truth, so there is no basin-escape risk --
                # and NOT the centered-tie-break window argmax: seeded
                # at the current estimate it reproduces the estimate
                # (scores tie within the noise band across the
                # dilation plateau), which dilutes the edge back
                # toward odometry (measured: ATE 0.082 -> 0.127).
                refined, censi, _ = self._refine_on_submap(
                    sm, query, seed, 0.4, 0.0, high_res=True
                )
                if refined is None:
                    continue
                # ambiguity (ridge) covariance from the exhaustive
                # window around the refined pose
                res = float(sm.resolution)
                spec = matching.search_spec(
                    cfg.kf_search_window, cfg.kf_angular_window,
                    float(np.linalg.norm(query, axis=1).max()), res,
                )
                ks = np.arange(-spec.n_angular, spec.n_angular + 1)
                thetas = refined[2] + ks * spec.angular_step
                scores = matching.correlate_window_host(
                    self._score_grid_host(sm),
                    np.asarray(sm.origin, np.float64) - refined[:2],
                    res, query, thetas, spec.n_linear,
                )
                wcov = matching.score_volume_cov(
                    scores, thetas, refined[2], res, spec.n_linear
                )
                cov = self._cov_hybrid(
                    censi, wcov, spec.angular_step,
                    cfg.closure_sigma_xy, cfg.closure_sigma_th,
                )
                c.meas = self._gt_edge_hook("loop", c.i, c.j, refined)
                c.info = np.linalg.inv(cov)
            self.optimize(iterations=iterations, gnc_scale=gnc_scale)

    # --------------------------------------------------------------------
    def rebuild_grids(self, est_arr: np.ndarray) -> None:
        """Rebuild every submap's grids from the given keyframe poses
        (shared by refine_map and the final re-match sweep). Why the
        sweep needs it: sweep QUERIES are stitched from the current
        (post-optimization) estimates while the grids were built from
        the drifted estimates available at match time -- the pair is
        systematically misaligned, which caps sweep scores exactly
        where drift was worst (measured on sim-loops: the early
        revisit segment's genuine re-traversals scored 0.31-0.52
        against frozen grids, below every threshold, leaving recall at
        0.50)."""
        cfg = self.config
        kfs = self.frontend.keyframes
        for sm in self.submaps:
            rd = construct_multicloud(
                [k.data for k in kfs], est_arr, sm.start_idx,
                sm.anchor_idx, min(sm.end_idx, len(kfs)),
            )
            sm_grid = build_submap_grid(
                rd, self.spec, cfg.hit_probability, cfg.miss_probability
            )
            hi_grid = build_submap_grid(
                rd, self.high_spec, cfg.hit_probability,
                cfg.miss_probability,
            )
            depth = max(1, cfg.branch_and_bound_depth)
            pyr = precompute_pyramid(
                sm_grid.probs, depth, smooth=cfg.smoothing_kernel
            )
            sm.score_grid = pyr[0]
            sm.pooled_grid = pyr[depth - 1]
            sm.probs = sm_grid.probs
            sm.origin = sm_grid.origin
            sm.high_res = hi_grid.probs
            sm.high_origin = hi_grid.origin
            sm.score_grid_np = None
            sm.pooled_np = None
            sm.spectrum = None
        self._pin_stack = None
        self._spectra_stack = None
        self._high_stack = None

    # --------------------------------------------------------------------
    def rematch_all(self) -> int:
        """Global re-match sweep (called from final_cleanup when
        config.final_rematch): every submap's multicloud is matched
        against every non-overlapping submap within
        max_match_distance, adding loop closures throughout the
        trajectory instead of only where the live tail happened to
        revisit (the reference only ever queries the recent tail,
        submap_loop_closer.cpp:122-157). Motivation (round-3 GT-edge
        decomposition, scripts/edge_budget.py): with measurement-true
        closures the ATE is unchanged, with measurement-true ODOMETRY
        it collapses to the oracle floor -- the remaining error is
        accumulated chain noise BETWEEN absolute anchors, so anchor
        DENSITY is the lever. All acceptance machinery (min_score,
        chi2 prune, pairwise consistency voting) applies unchanged.
        Affordable because the fused matcher makes a candidate-set
        match ~65 ms on TPU. Acceptance threshold = the dataset's
        min_score minus rematch_score_margin (floored at 0.5; sparse
        queries put genuine revisits just under the live bar), and
        every sweep acceptance must additionally be SHARP
        (rematch_skip_ridge below): an unconditional sweep at 0.5
        floods corridor worlds with self-similarity aliases (measured
        on sim-killian round 3: +39 ridge closures whose along-axis gt
        error was 1.4-5.0 m, ATE 0.198 -> 0.231; the sharpness gate
        removes exactly those and restores 0.220). Returns the number
        of closures added."""
        cfg = self.config
        kfs = self.frontend.keyframes
        if len(self.submaps) < 2 or not kfs:
            return 0
        self._ensure_pg_init()
        self.extend_chain()
        map_pose = self._map_transforms()
        est_arr = np.stack([map_pose(k) for k in range(len(kfs))])
        if cfg.final_rebuild_grids:
            # align the sweep's targets with its queries: both are now
            # stitched from the same post-optimization estimates (see
            # rebuild_grids)
            self.rebuild_grids(est_arr)
        have = {
            (c.i, c.j)
            for c in self.closures
            if c.kind == "loop" and c.active
        }
        import jax

        if jax.default_backend() == "cpu":
            match_fn = matching.match_candidates_pruned
        else:
            import functools as _ft

            match_fn = _ft.partial(
                matching.match_candidates_fused, c_bucket=16, K=256,
            )
        stride = 1 << (max(1, cfg.branch_and_bound_depth) - 1)
        # sweep threshold: live floor minus the configured margin (the
        # sweep's extra accept gates justify it -- see config)
        min_sc = max(
            0.5, cfg.loop_closure_min_score - cfg.rematch_score_margin
        )
        made = 0
        import jax.numpy as _jnp

        for qi, qsm in enumerate(self.submaps):
            q_anchor = est_arr[qsm.anchor_idx]
            query = construct_multicloud(
                [k.data for k in kfs], est_arr, qsm.start_idx,
                qsm.anchor_idx, qsm.end_idx, returns_only=True,
            )
            if len(query) < 12:
                continue
            if len(query) > 512:
                query = query[
                    np.linspace(0, len(query) - 1, 512).astype(int)
                ]
            max_range = float(np.linalg.norm(query, axis=1).max())
            if jax.default_backend() != "cpu":
                max_range = cfg.range_max  # frozen shape (see match())
            spec = matching.search_spec(
                cfg.linear_search_window, cfg.angular_search_window,
                max_range, cfg.submap_resolution,
            )
            cands = []
            for ti, tsm in enumerate(self.submaps):
                if tsm.end_idx > qsm.start_idx and (
                    tsm.start_idx < qsm.end_idx
                ):
                    continue  # keyframe ranges overlap
                if abs(ti - qi) <= cfg.last_submap_not_match:
                    continue
                if (tsm.anchor_idx, qsm.anchor_idx) in have or (
                    qsm.anchor_idx, tsm.anchor_idx
                ) in have:
                    continue
                anchor = est_arr[tsm.anchor_idx]
                if (
                    np.linalg.norm(q_anchor[:2] - anchor[:2])
                    >= cfg.max_match_distance
                ):
                    continue
                t_est = se2.relative(anchor, q_anchor)[:2]
                cands.append(
                    (
                        tsm,
                        float(se2.wrap_angle(q_anchor[2] - anchor[2])),
                        t_est,
                    )
                )
            if not cands:
                continue
            origins = [
                _jnp.asarray(c[0].origin)
                - _jnp.asarray(c[2], _jnp.float32)
                for c in cands
            ]
            kw = {}
            if match_fn is not matching.match_candidates_pruned:
                # per-submap cached spectra: one grid_spectrum per
                # submap for the WHOLE sweep instead of per call
                fsz = int(cands[0][0].score_grid.shape[0]) + 64
                kw["spectra_list"] = [
                    c[0].get_spectrum(fsz) for c in cands
                ]
            ci, score, pose, cov = match_fn(
                [c[0].score_grid for c in cands],
                [c[0].pooled_grid for c in cands],
                origins,
                [c[1] for c in cands],
                query,
                spec,
                float(min_sc),
                stride,
                **kw,
            )
            if ci is None:
                continue
            tsm = cands[ci][0]
            pose = np.asarray(pose, np.float64).copy()
            pose[:2] += np.asarray(cands[ci][2], np.float64)
            Nb = _bucket(len(query), 256)
            ptsb = np.zeros((Nb, 2), np.float32)
            ptsb[: len(query)] = query
            valid = np.arange(Nb) < len(query)
            refined, censi_cov, _ = matching.refine_pose_cov(
                tsm.high_res, tsm.high_origin, 0.05,
                _jnp.asarray(ptsb), _jnp.asarray(valid),
                _jnp.asarray(pose, dtype=_jnp.float32),
            )
            refined = np.asarray(refined).astype(np.float64)
            if cfg.rematch_skip_ridge:
                # sweep-only gate: keep only SHARP (junction/corner)
                # anchors. A live-tail ridge closure is vetted by PCM
                # against its revisit cohort; the global sweep has no
                # cohort and corridor worlds hand it mutually-
                # consistent aliases (round-3 regression: killian
                # 0.198 -> 0.231 from sweep ridge closures whose
                # along-axis gt error measured 1.4-5.0 m,
                # scripts/edge_budget.py round 4).
                # rematch_ridge_gate relaxes this to the along-ridge
                # drift arbitration: at sweep time the graph is
                # post-optimization, so the prediction (t_est) is an
                # anchored prior and a ridge match drifting from it is
                # an alias; one drifting little is a usable anchor.
                w_t = np.linalg.eigvalsh(np.asarray(cov)[:2, :2])
                if float(np.sqrt(w_t.max())) > cfg.closure_ridge_sigma:
                    if not cfg.rematch_ridge_gate:
                        continue
                    _, _, rej = self._ridge_drift_gate(
                        np.asarray(cov, np.float64), refined,
                        np.asarray(cands[ci][2], np.float64),
                    )
                    if rej:
                        self.ridge_drift_rejects += 1
                        continue
            cov = self._closure_cov(
                np.asarray(censi_cov, np.float64), cov
            )
            self.closures.append(
                Closure(
                    i=tsm.anchor_idx, j=qsm.anchor_idx,
                    meas=self._gt_edge_hook(
                        "loop", tsm.anchor_idx, qsm.anchor_idx, refined
                    ),
                    info=np.linalg.inv(cov),
                )
            )
            have.add((tsm.anchor_idx, qsm.anchor_idx))
            made += 1
            if os.environ.get("SLAM_LOG_MATCHES"):
                print(
                    f"[rematch] kf{tsm.anchor_idx}->kf{qsm.anchor_idx} "
                    f"score={score:.3f}",
                    flush=True,
                )
        return made

    # --------------------------------------------------------------------
    def _build_pg_data(self):
        import jax.numpy as jnp

        n = len(self.pg_poses)
        N = _bucket(n, self.config.bucket_min_pg)
        C = _bucket(max(len(self.closures), 1))
        poses = np.zeros((N, 3))
        valid = np.zeros(N, bool)
        fixed = np.zeros(N, bool)
        chain_meas = np.zeros((N, 3))
        chain_info = np.tile(np.eye(3), (N, 1, 1))
        chain_valid = np.zeros(N, bool)
        poses[:n] = np.stack(self.pg_poses)
        valid[:n] = True
        fixed[0] = True
        chain_meas[1:n] = np.stack(self.pg_meas[1:])
        chain_info[1:n] = np.stack(self.pg_info[1:])
        chain_valid[1:n] = True

        clo_i = np.zeros(C, np.int32)
        clo_j = np.zeros(C, np.int32)
        clo_meas = np.zeros((C, 3))
        clo_info = np.tile(np.eye(3), (C, 1, 1))
        clo_valid = np.zeros(C, bool)
        for k, c in enumerate(self.closures):
            clo_i[k] = min(c.i, n - 1)
            clo_j[k] = min(c.j, n - 1)
            clo_meas[k] = c.meas
            # exact symmetry matters downstream: covariance inversion
            # leaves ~1e-5 relative asymmetry that the Schur solver's
            # one-triangle Cholesky turns into NaN (dist_solver
            # _eq_chol_solve docstring)
            clo_info[k] = 0.5 * (c.info + c.info.T)
            # an edge whose endpoint the chain has not reached yet
            # (local edges accumulate ahead of the chain; they activate
            # once extend_chain covers them)
            clo_valid[k] = (
                c.active and not c.suppressed and c.i < n and c.j < n
            )
        return solvers.PoseGraphData(
            jnp.asarray(poses), jnp.asarray(valid), jnp.asarray(fixed),
            jnp.asarray(chain_meas), jnp.asarray(chain_info),
            jnp.asarray(chain_valid), jnp.asarray(clo_i),
            jnp.asarray(clo_j), jnp.asarray(clo_meas),
            jnp.asarray(clo_info), jnp.asarray(clo_valid),
        )

    def _gate_consistent_loops(self):
        """Pairwise odometry-consistency gating of loop closures
        (PCM-flavored, after Mangelson et al. 2018; no reference
        counterpart -- the reference relies on DCS + the final 11.345
        chi2 prune alone, which cannot reject an along-corridor alias
        whose own covariance is honestly wide in the alias direction).

        Two closures a=(ia,ja,Ta) and b=(ib,jb,Tb) whose endpoints are
        near each other on the chain must satisfy Ta*B == A*Tb, where
        A = dead-reckoned ia->ib and B = ja->jb: aliased matches shift
        by the corridor's self-similarity period (>= 1 m) and violate
        this against every true closure of the same revisit, while
        true closures support each other to odometry precision.
        Recomputed from scratch before every solve, so a closure
        suppressed while outnumbered is re-admitted once enough
        agreeing closures accumulate."""
        n = len(self.pg_poses)
        idx = [
            k
            for k, c in enumerate(self.closures)
            if c.active and c.kind == "loop" and c.i < n and c.j < n
        ]
        for k in idx:
            self.closures[k].suppressed = False
        if len(idx) < 2:
            return
        # dead-reckoned chain poses + cumulative travel distance
        # (closure-independent, unlike pg_poses)
        dr = np.zeros((n, 3))
        dist = np.zeros(n)
        for k in range(1, n):
            dr[k] = se2.compose(dr[k - 1], self.pg_meas[k])
            dist[k] = dist[k - 1] + float(
                np.linalg.norm(self.pg_meas[k][:2])
            )
        cls = [self.closures[k] for k in idx]
        m = len(cls)
        covs = [np.linalg.inv(c.info) for c in cls]
        conflict = [set() for _ in range(m)]
        support = [set() for _ in range(m)]
        for a in range(m):
            for b in range(a + 1, m):
                ca, cb = cls[a], cls[b]
                gi = abs(dist[ca.i] - dist[cb.i])
                gj = abs(dist[ca.j] - dist[cb.j])
                if max(gi, gj) > 80.0:
                    continue  # not comparable: too much chain between
                A = se2.relative(dr[ca.i], dr[cb.i])
                B = se2.relative(dr[ca.j], dr[cb.j])
                err = se2.relative(
                    se2.compose(A, cb.meas), se2.compose(ca.meas, B)
                )
                err[2] = se2.wrap_angle(err[2])
                # Mahalanobis consistency: weight by both closures'
                # covariances (anchors of one revisit share heading, so
                # frame rotation between the covs is negligible) plus
                # odometric drift over the connecting chain segments.
                # Euclidean tolerances would flag two honest corridor
                # closures as conflicting over their (explicitly
                # low-information) along-ridge components.
                g = gi + gj
                S = covs[a] + covs[b] + np.diag(
                    [
                        (0.15 + 0.01 * g) ** 2,
                        (0.15 + 0.01 * g) ** 2,
                        (0.03 + 0.001 * g) ** 2,
                    ]
                )
                chi2 = float(err @ np.linalg.solve(S, err))
                ok = chi2 <= 11.345
                (support if ok else conflict)[a].add(b)
                (support if ok else conflict)[b].add(a)
        # iteratively drop the most-conflicted / least-supported until
        # conflict-free (greedy max consistent subset)
        alive = set(range(m))
        while True:
            worst, worst_key = None, None
            for k in alive:
                ncon = len(conflict[k] & alive)
                if ncon == 0:
                    continue
                key = (ncon - len(support[k] & alive), ncon, -k)
                if worst_key is None or key > worst_key:
                    worst, worst_key = k, key
            if worst is None:
                break
            alive.remove(worst)
        # a closure that HAD comparable partners but supports none of
        # the survivors is an unverifiable odd-one-out (e.g. the lone
        # survivor of an all-alias cluster after the greedy pass):
        # suppress it too. True revisits produce mutually-supporting
        # closures over consecutive match ticks, so this costs recall
        # only for genuinely isolated events, which stay (no partners).
        frozen = frozenset(alive)
        for k in frozen:
            if (conflict[k] | support[k]) and not (support[k] & frozen):
                alive.discard(k)
        for k in range(m):
            cls[k].suppressed = k not in alive

    @property
    def suppressed_closure_count(self) -> int:
        return sum(
            1
            for c in self.closures
            if c.active and c.kind == "loop" and c.suppressed
        )

    def optimize(self, iterations: int = 20, gnc_scale: float = 1.0):
        if len(self.pg_poses) < 2:
            return
        self._gate_consistent_loops()
        g = self._build_pg_data()
        if os.environ.get("SLAM_CHECK_FINITE"):
            for fname in g._fields:
                a = np.asarray(getattr(g, fname))
                if a.dtype.kind == "f" and not np.isfinite(a).all():
                    raise FloatingPointError(
                        f"pose-graph solve INPUT {fname} non-finite at "
                        f"{np.argwhere(~np.isfinite(a))[:4].tolist()}"
                    )
        g_opt = self._solve(g, iterations, gnc_scale)
        new_poses = np.asarray(g_opt.poses)
        if os.environ.get("SLAM_CHECK_FINITE"):
            if not np.isfinite(new_poses[: len(self.pg_poses)]).all():
                dump = os.environ.get(
                    "SLAM_NAN_DUMP", "/tmp/pg_nan_case.npz"
                )
                np.savez_compressed(
                    dump,
                    iterations=iterations,
                    gnc_scale=gnc_scale,
                    **{
                        f: np.asarray(getattr(g, f)) for f in g._fields
                    },
                )
                raise FloatingPointError(
                    "pose-graph solve OUTPUT non-finite "
                    f"(n={len(self.pg_poses)}, finite inputs; "
                    f"case dumped to {dump})"
                )
        for k in range(len(self.pg_poses)):
            self.pg_poses[k] = new_poses[k]

    def _solve(self, g, iterations: int, gnc_scale: float):
        """Route one pose-graph solve (the product path replacing
        submap_loop_closer.cpp:286-288) to the dense or the
        keyframe-partitioned Schur solver per config.pg_solver; a mesh
        attached to the closer always takes the shard_map multi-chip
        path."""
        cfg = self.config
        N = g.poses.shape[0]
        blocked = self.mesh is not None or cfg.pg_solver == "blocked" or (
            cfg.pg_solver == "auto" and N >= cfg.dist_solver_min_poses
        )
        if not blocked:
            return _get_pg_solver(cfg.dcs_phi, iterations, gnc_scale)(g)

        from ..parallel import dist_solver
        from ..parallel.partition import make_partition

        n_blocks = max(1, N // max(1, cfg.dist_block_size))
        if self.mesh is not None:
            from jax import numpy as jnp  # noqa: F401

            n_dev = self.mesh.shape["blocks"]
            n_blocks = max(n_dev, n_blocks)
            # N and n_dev are powers of two, so n_blocks divides N and
            # is a multiple of n_dev
        plan = make_partition(
            N, n_blocks,
            np.asarray(g.clo_i), np.asarray(g.clo_j),
            np.asarray(g.clo_valid),
        )
        bg, sg = dist_solver.split_graph(g, plan)
        if self.mesh is not None:
            poses = dist_solver.optimize_pose_graph_sharded(
                bg, sg, cfg.dcs_phi, self.mesh, iterations, gnc_scale
            )
        else:
            poses = _get_blocked_solver(cfg.dcs_phi, iterations, gnc_scale)(
                bg, sg
            )
        import jax.numpy as jnp

        return g._replace(poses=jnp.reshape(poses, g.poses.shape))

    # --------------------------------------------------------------------
    def joint_solve(self) -> bool:
        """Final joint landmark+pose bundle adjustment
        (solvers.optimize_joint_graph; no reference counterpart -- the
        reference discards the landmark graph at every closure and
        finishes pose-graph-only, log_runner.cpp:203-205).

        Uses every original measurement: RAW odometry between
        keyframes (kf.odom_meas/odom_info -- honest independent noise,
        unlike the pose-graph chain edges whose landmark-informed
        measurements carry raw-odometry info), ALL archived + active
        line-landmark observation edges, and the vetted closure/chain/
        pin edges with DCS. Landmarks are re-initialized from their
        observations at the current pose estimates (the frontend's
        landmark frame drifts from the map frame across prunes).
        Warm-started from the pose-graph solution. Returns True if it
        ran (and wrote back pg_poses + frontend estimates)."""
        cfg = self.config
        kfs = self.frontend.keyframes
        n = len(self.pg_poses)
        if n < 2 or n != len(kfs):
            return False
        edges = [
            e
            for e in (
                self.frontend.archived_obs + self.frontend.obs_edges
            )
            if e.pose_idx < n
        ]
        if not edges:
            return False
        import jax.numpy as jnp

        from ..ops.line_geometry import transform_line

        lm_map = {}
        for e in edges:
            if e.lm_idx not in lm_map:
                lm_map[e.lm_idx] = len(lm_map)
        by_lm: dict[int, list] = {}
        for e in edges:
            by_lm.setdefault(e.lm_idx, []).append(e)

        P = _bucket(n, cfg.bucket_min_pg)
        L = _bucket(max(len(lm_map), 1), 64)
        E = _bucket(max(len(edges), 1), 256)
        closures = [
            c
            for c in self.closures
            if c.active and not c.suppressed and c.i < n and c.j < n
        ]
        C = _bucket(max(len(closures), 1))

        poses = np.zeros((P, 3))
        pose_valid = np.zeros(P, bool)
        pose_fixed = np.zeros(P, bool)
        odom_meas = np.zeros((P, 3))
        odom_info = np.tile(np.eye(3), (P, 1, 1))
        odom_valid = np.zeros(P, bool)
        poses[:n] = np.stack(self.pg_poses)
        pose_valid[:n] = True
        pose_fixed[0] = True
        for i in range(1, n):
            odom_meas[i] = kfs[i].odom_meas
            odom_info[i] = kfs[i].odom_info
            odom_valid[i] = True

        # landmark init: world line from the median observation's
        # measurement under the CURRENT pose estimate (the frontend's
        # landmark estimates live in the drifted landmark frame)
        lms = np.zeros((L, 2))
        lm_valid = np.zeros(L, bool)
        for lid, k in lm_map.items():
            les = by_lm[lid]
            e = les[len(les) // 2]
            pose = poses[e.pose_idx]
            lms[k] = np.asarray(
                transform_line(e.meas, pose[:2], pose[2])
            )
            lm_valid[k] = True

        obs_pose = np.zeros(E, np.int32)
        obs_lm = np.zeros(E, np.int32)
        obs_meas = np.zeros((E, 2))
        obs_info = np.tile(np.eye(2), (E, 1, 1))
        obs_valid = np.zeros(E, bool)
        for k, e in enumerate(edges):
            obs_pose[k] = e.pose_idx
            obs_lm[k] = lm_map[e.lm_idx]
            obs_meas[k] = e.meas
            obs_info[k] = e.info
            obs_valid[k] = True

        clo_i = np.zeros(C, np.int32)
        clo_j = np.zeros(C, np.int32)
        clo_meas = np.zeros((C, 3))
        clo_info = np.tile(np.eye(3), (C, 1, 1))
        clo_valid = np.zeros(C, bool)
        for k, c in enumerate(closures):
            clo_i[k] = c.i
            clo_j[k] = c.j
            clo_meas[k] = c.meas
            clo_info[k] = c.info
            clo_valid[k] = True

        if os.environ.get("SLAM_DUMP_JOINT"):
            # offline-iteration hook (scripts/joint_lab.py): dump the
            # solver inputs so solver variants can be measured without
            # re-running the whole pipeline
            np.savez_compressed(
                os.environ["SLAM_DUMP_JOINT"],
                poses=poses, pose_valid=pose_valid,
                pose_fixed=pose_fixed, odom_meas=odom_meas,
                odom_info=odom_info, odom_valid=odom_valid, lms=lms,
                lm_valid=lm_valid, obs_pose=obs_pose, obs_lm=obs_lm,
                obs_meas=obs_meas, obs_info=obs_info,
                obs_valid=obs_valid, clo_i=clo_i, clo_j=clo_j,
                clo_meas=clo_meas, clo_info=clo_info,
                clo_valid=clo_valid, n=np.asarray([n]),
            )
        g = solvers.JointGraphData(
            jnp.asarray(poses), jnp.asarray(pose_valid),
            jnp.asarray(pose_fixed), jnp.asarray(odom_meas),
            jnp.asarray(odom_info), jnp.asarray(odom_valid),
            jnp.asarray(lms), jnp.asarray(lm_valid),
            jnp.asarray(obs_pose), jnp.asarray(obs_lm),
            jnp.asarray(obs_meas), jnp.asarray(obs_info),
            jnp.asarray(obs_valid), jnp.asarray(clo_i),
            jnp.asarray(clo_j), jnp.asarray(clo_meas),
            jnp.asarray(clo_info), jnp.asarray(clo_valid),
        )
        g_opt, _ = solvers.optimize_joint_graph(
            g, cfg.dcs_phi, cfg.final_joint_iterations
        )
        new_poses = np.asarray(g_opt.poses, np.float64)
        for k in range(n):
            self.pg_poses[k] = new_poses[k]
        # keep the frontend's landmark estimates consistent with the
        # solved map frame (maps/diagnostics; associations are over)
        new_lms = np.asarray(g_opt.lms, np.float64)
        for lid, k in lm_map.items():
            self.frontend.landmarks[lid].rhotheta = new_lms[k]
        return True

    # --------------------------------------------------------------------
    def prune_false_closures(self) -> int:
        """chi2 > 11.345 closure pruning (log_runner.cpp:182-190).
        Returns the number of edges deactivated by this call."""
        if not self.closures or len(self.pg_poses) < 2:
            return 0
        self._gate_consistent_loops()
        g = self._build_pg_data()
        chi2 = np.asarray(solvers.closure_chi2(g))
        n = len(self.pg_poses)
        pruned = 0
        for k, c in enumerate(self.closures):
            if c.suppressed:
                continue  # not in the graph; chi2[k] is meaningless
            if c.active and c.i < n and c.j < n and chi2[k] > 11.345:
                c.active = False
                pruned += 1
                # the reference's counter tracks rejected LOOP
                # closures; local refinement edges are a new-engine
                # edge kind and don't feed the false-closure stat
                if c.kind == "loop":
                    self.false_closures += 1
        return pruned
