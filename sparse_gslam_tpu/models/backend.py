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
    origin: object  # (2,) jnp
    high_res: object  # (G2,G2) jnp probability grid
    high_origin: object
    resolution: float


@dataclasses.dataclass
class Closure:
    i: int  # pose index of submap anchor
    j: int  # pose index of matched query mid
    meas: np.ndarray  # (3,)
    info: np.ndarray  # (3,3)
    active: bool = True


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
        # grid geometry: big enough for traj_len + 2*range_max
        extent = (
            config.submap_trajectory_length + 2.0 * config.range_max + 2.0
        )
        size = int(math.ceil(extent / config.submap_resolution / 64.0) * 64)
        self.spec = GridSpec(size=size, resolution=config.submap_resolution)
        hsize = int(math.ceil(extent / 0.05 / 64.0) * 64)
        self.high_spec = GridSpec(size=hsize, resolution=0.05)
        self.match_calls = 0
        # optional jax.sharding.Mesh with a "blocks" axis: when set,
        # every pose-graph solve runs the shard_map multi-chip solver
        # (parallel/dist_solver.optimize_pose_graph_sharded)
        self.mesh = None

    # -- stats -----------------------------------------------------------
    @property
    def pose_count(self) -> int:
        return len(self.pg_poses)

    @property
    def submap_count(self) -> int:
        return len(self.submaps)

    @property
    def closure_count(self) -> int:
        return sum(1 for c in self.closures if c.active)

    @property
    def false_closure_count(self) -> int:
        return self.false_closures

    def pose_estimates(self) -> np.ndarray:
        return np.stack(self.pg_poses)

    # --------------------------------------------------------------------
    def precompute(self):
        """Finalize a submap when enough trajectory accumulated
        (submap_loop_closer.cpp:63-98)."""
        kfs = self.frontend.keyframes
        if not kfs:
            return
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
        pyr = precompute_pyramid(sm_grid.probs, depth)
        self.submaps.append(
            Submap(
                anchor_idx=mid,
                score_grid=pyr[0],
                pooled_grid=pyr[depth - 1],
                origin=sm_grid.origin,
                high_res=hi_grid.probs,
                high_origin=hi_grid.origin,
                resolution=self.spec.resolution,
            )
        )
        self.last_pose_idx = max(0, mid - cfg.submap_overlap_poses)

    # --------------------------------------------------------------------
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

        guard = lock if lock is not None else contextlib.nullcontext()
        with guard:
            snap = self._match_snapshot()
        if snap is None:
            return False
        result = self._match_search(snap)  # expensive; runs unlocked
        if result is None:
            return False
        with guard:
            self._match_apply(snap, result)
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
        match_fn = (
            matching.match_candidates_pruned
            if jax.default_backend() == "cpu"
            else matching.match_candidates_pruned_batched
        )
        # search centered on the estimated relative pose: shift each
        # candidate's origin by its t_est (see _match_snapshot)
        import jax.numpy as _jnp

        origins = [
            _jnp.asarray(c[0].origin) - _jnp.asarray(c[2], _jnp.float32)
            for c in candidates
        ]
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
                print(
                    f"[match] mid={snap['mid']} cands={len(candidates)} "
                    f"HIT score={score:.3f} "
                    f"anchor={candidates[ci][0].anchor_idx}",
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
        refined = np.asarray(
            matching.refine_pose(
                sm.high_res, sm.high_origin, 0.05, jnp.asarray(ptsb),
                jnp.asarray(valid), jnp.asarray(pose, dtype=jnp.float32),
            )
        ).astype(np.float64)
        return dict(sm=sm, refined=refined, cov=cov)

    def _match_apply(self, snap, result):
        """Under-lock phase: extend the pose-graph chain with the
        CURRENT keyframes (the frontend may have grown during the
        unlocked search, exactly like the reference re-reading
        lm_graph.poses at apply time, submap_loop_closer.cpp:204-225),
        prune the landmark-graph window, add the DCS closure edge and
        optimize."""
        sm = result["sm"]
        mid = snap["mid"]
        kfs = self.frontend.keyframes
        est = self.frontend.estimates()
        n = len(kfs)

        lo = self.last_opt_pose_index
        for idx in range(lo, n):
            meas = se2.relative(est[idx - 1], est[idx])
            self.pg_meas.append(meas)
            self.pg_info.append(kfs[idx].odom_info.copy())
            self.pg_poses.append(se2.compose(self.pg_poses[-1], meas))
        self.last_opt_pose_index = n

        # prune the landmark graph to one fixed pose
        # (submap_loop_closer.cpp:256-270): opt.clear() + single vertex
        self.frontend.window_start = max(1, self.last_opt_pose_index - 1)
        self.frontend.obs_edges.clear()
        self.frontend.last_landmark_edge = 0
        self.frontend.need_reinit = True

        # add the DCS closure edge (submap_loop_closer.cpp:272-285)
        self.closures.append(
            Closure(
                i=sm.anchor_idx,
                j=mid,
                meas=result["refined"],
                info=np.linalg.inv(result["cov"]),
            )
        )
        self.optimize(iterations=20)

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
            clo_i[k] = c.i
            clo_j[k] = c.j
            clo_meas[k] = c.meas
            clo_info[k] = c.info
            clo_valid[k] = c.active
        return solvers.PoseGraphData(
            jnp.asarray(poses), jnp.asarray(valid), jnp.asarray(fixed),
            jnp.asarray(chain_meas), jnp.asarray(chain_info),
            jnp.asarray(chain_valid), jnp.asarray(clo_i),
            jnp.asarray(clo_j), jnp.asarray(clo_meas),
            jnp.asarray(clo_info), jnp.asarray(clo_valid),
        )

    def optimize(self, iterations: int = 20, gnc_scale: float = 1.0):
        if len(self.pg_poses) < 2:
            return
        g = self._build_pg_data()
        g_opt = self._solve(g, iterations, gnc_scale)
        new_poses = np.asarray(g_opt.poses)
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
    def prune_false_closures(self):
        """chi2 > 11.345 closure pruning (log_runner.cpp:182-190)."""
        if not self.closures or len(self.pg_poses) < 2:
            return
        g = self._build_pg_data()
        chi2 = np.asarray(solvers.closure_chi2(g))
        for k, c in enumerate(self.closures):
            if c.active and chi2[k] > 11.345:
                c.active = False
                self.false_closures += 1
