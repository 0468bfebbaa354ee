"""Configuration schema for the SLAM engine.

Mirrors the reference's layered roslaunch + per-dataset YAML parameter
scheme (reference: datasets/slam_config_example.yaml:1-70, read via
XmlRpc in src/drone.cpp:27-32, src/submap_loop_closer.cpp:43-57,
src/multicloud2.cpp:11-17, ls_extractor/ros_utils.h:6-14) as two plain
dataclasses loadable from the same per-dataset directory layout
(<dataset>/slam-<N>.yaml + <dataset>/line_extractor.yaml).
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional

import yaml


@dataclasses.dataclass
class ExtractorConfig:
    """Line-extractor parameters (reference: ls_extractor/defs.h:25-34)."""

    outlier_dist: float = 0.1
    min_split_dist: float = 0.1
    max_line_gap: float = 0.25
    min_line_length: float = 0.5
    rmse_thresh: float = 0.1  # unused by SMC, kept for schema parity
    cluster_threshold: float = 100.0
    min_line_points: int = 10
    # Extractor algorithm: "smc" (default, the evaluated one), "smf"
    # (fuzzy split-merge), or "hough" -- the reference selects these at
    # compile time by swapping includes (ls_extractor/README.md:9)
    algorithm: str = "smc"
    # Behavior switch NOT in the reference: the reference's chi^2 merge step
    # is unreachable as shipped (smc.cpp:14-25 gapBetween never updates its
    # 1e10 init, so the gap test always fails). "reference" replicates that;
    # "correct" enables information-weighted merging with a proper min-gap.
    merge_mode: str = "reference"

    @classmethod
    def from_yaml(cls, path: str) -> "ExtractorConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "ExtractorConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})


@dataclasses.dataclass
class SlamConfig:
    """SLAM parameters; schema = datasets/slam_config_example.yaml:1-70."""

    # odometry / range noise
    std_x: float = 0.2
    std_y: float = 1.0
    std_w: float = 1.0
    std_r: float = 0.1
    # control-noise form: "reference" = the reference's forward-scaled
    # diag(|dx^2|, |dy dx|, |dth dx|) (odom_error_propagator.h:40-42);
    # "additive" = sigma proportional to distance traveled in ALL
    # three components (standard wheel-odometry model; representable
    # calibration for straight driving -- see
    # ops/multicloud.step_control_var)
    noise_model: str = "reference"
    # lidar geometry
    angle_min: float = -math.pi / 2
    angle_max: float = math.pi / 2
    range_min: float = 0.0
    range_max: float = 7.0
    scan_size: int = 4
    multicloud_size: int = 120
    # landmark graph / data association
    landmark_max_gap: float = 2.0
    landmark_max_dist: float = 10.0
    landmark_assoc_thresh: float = 0.5
    # loop closure matcher
    last_traj_length: float = 5.0
    loop_closure_min_score: float = 0.7
    angular_search_window: float = 1.0
    linear_search_window: float = 5.0
    branch_and_bound_depth: int = 5
    # occupancy grid
    hit_probability: float = 0.7
    miss_probability: float = 0.4
    # submap builder
    max_match_distance: float = 5.0
    submap_resolution: float = 0.1
    submap_trajectory_length: float = 6.0
    submap_overlap_poses: int = 2
    last_submap_not_match: int = 3
    loop_closing_threads: int = 8  # reference thread count; here = match batch
    # robust kernel
    dcs_phi: float = 1.0
    # score-grid smoothing kernel half-width (0 = off, 1 = the
    # reference's 3x3 binomial, 2 = 5x5, ...). The reference ships the
    # kernel commented out of its match path
    # (fast_correlative_scan_matcher_2d.cc:439-444) and ablates it in
    # datasets/sweep.py; scripts/sweep.py --kernels does the same
    # here. Smoothing scales peak scores down, so co-tune
    # loop_closure_min_score when enabling.
    smoothing_kernel: int = 0
    # driver
    match_interval: int = 10
    data_provider: str = "carmen"
    # visualization (kept for schema parity)
    visualize_rate: float = 2.0
    map_resolution: float = 0.1
    # ignored reference fields
    address: str = ""
    std_rpcm: float = 0.0001

    # --- new-engine-only knobs (not in the reference schema) ---
    # graduated non-convexity for the FINAL pose-graph optimization:
    # anneal the DCS phi from phi*gnc_init_scale down to phi
    # (ops.solvers.gnc_phi_schedule). 1.0 = reference fixed-phi
    # behavior. The final optimize is where GNC matters: incremental
    # closures are well-initialized, but the final pass re-evaluates
    # ALL closures and a poor basin rejects good ones.
    final_gnc_scale: float = 1.0
    final_opt_iterations: int = 20
    # Pose-graph solver routing (models/backend.py SubmapLoopCloser):
    # "dense" = the (3N,3N) normal-equation solver, "blocked" = the
    # keyframe-partitioned Schur solver (parallel/dist_solver.py),
    # "auto" = dense below dist_solver_min_poses, blocked above (and
    # always blocked/sharded when a device mesh is attached to the
    # loop closer). Replaces the reference's single g2o GN solve at
    # submap_loop_closer.cpp:286-288.
    pg_solver: str = "auto"
    # Run the per-keyframe landmark-LM solve on the host CPU device
    # when the main backend is an accelerator. The solve is a tiny
    # fixed-shape kernel (P<=128 poses) that is pure dispatch latency
    # on a TPU -- and through a remote-TPU tunnel every call pays
    # milliseconds of round-trip on top. The heavy work (matcher,
    # pose-graph solver) stays on the accelerator. No effect when the
    # whole run is already on CPU.
    frontend_on_host: bool = True
    # Pose-graph chain-edge information (models/backend.py
    # extend_chain): "odom" (default) = raw odometry covariance (the
    # reference's behavior, submap_loop_closer.cpp:209-218);
    # "marginal" = marginal covariance of the relative pose under the
    # landmark-graph posterior (frontend.relative_chain_info). The
    # marginal is the honest per-edge claim (raw odometry under-claims
    # the landmark-refined chain 5-7x -- measured,
    # scripts/edge_budget.py) but stiffening the chain was measured to
    # HURT end ATE on every sim world (office 0.080 -> 0.115, corridor
    # 0.154 -> 0.32): the stiff chain makes the 11.345 prune reject
    # good closures and distributes ridge-closure errors worse. Kept
    # as a capability; the round-4 accuracy path is the final joint
    # landmark+pose solve, which uses raw odometry info correctly (the
    # landmark evidence enters as its own edges).
    chain_info_mode: str = "odom"
    # Loop-closure covariance model (models/backend.py _closure_cov):
    # "hybrid" (default) = high-res-GN Censi covariance + the
    # above-floor excess of the correlative window covariance (ridge
    # ambiguity) + the floor below; "window" = round-2 behavior, the
    # raw window covariance with its 2.5-cell calibration floor
    # (measured ~7x weaker than the actual closure error on the sim
    # worlds -- see scripts/edge_budget.py).
    closure_cov_mode: str = "hybrid"
    closure_sigma_xy: float = 0.03  # meters
    closure_sigma_th: float = 0.01  # radians
    # window-cov translational sigma above which a closure is treated
    # as ridge-ambiguous and NOT sharpened (see backend._closure_cov;
    # the window floor itself reports ~0.25 m for a perfectly sharp
    # match, so anything clearly above it indicates a real ridge)
    closure_ridge_sigma: float = 0.32  # meters
    # What to do with a ridge-ambiguous closure's covariance:
    # "window" = keep the band-weighted window covariance (round-3
    # behavior); "inflate" = raise every translational eigendirection
    # above the ridge threshold to the uniform-over-search-window
    # variance L^2/3 (backend._ridge_inflate) -- honest for along-
    # corridor aliases (measured gt errors 1.4-5 m vs window sigma
    # ~0.6) at the cost of discarding the partial along-ridge
    # correction genuine ridge matches carry.
    closure_ridge_mode: str = "window"
    # Along-ridge drift arbitration (backend._match_search): reject a
    # ridge-ambiguous live closure whose accepted measurement sits
    # more than this many meters from the graph prediction ALONG its
    # own wide covariance axis. Along that axis the matcher declared
    # itself blind, so a large claimed correction there is a corridor
    # alias (periodic self-similarity outscoring the true pose), not
    # information. 0 disables the gate. Calibration (accept-time
    # drift, sim worlds, round 5): true ridge closures sit at median
    # 0.08 m with one genuine first-of-revisit correction at 2.83 m;
    # counted-false aliases span 1.46-4.19 m; the 1.3 m default kills
    # the five largest-pull killian aliases and both corridor aliases
    # at the cost of that one large true correction.
    closure_ridge_max_drift: float = 1.3
    # Global re-match sweep at final cleanup (backend.rematch_all):
    # match every submap pair within range, not just the live tail.
    final_rematch: bool = True
    # Rebuild every submap's grids from the post-optimization poses
    # before the sweep (backend.rebuild_grids): sweep queries are
    # stitched from current estimates, so matching them against grids
    # frozen at drifted match-time estimates caps scores exactly where
    # drift was worst (sim-loops early revisit: 0.31-0.52 vs frozen
    # grids). Distinct from final_refine_rounds, which RE-MEASURES
    # existing edges (measured harmful); this only improves NEW
    # detection.
    final_rebuild_grids: bool = True
    # Sweep closures must be SHARP (window-cov eigensigma below
    # closure_ridge_sigma): the sweep has no PCM cohort to vet
    # corridor aliases, which are mutually consistent by construction
    # (see rematch_all).
    rematch_skip_ridge: bool = True
    # With rematch_skip_ridge, admit a sweep ridge closure anyway when
    # it passes the along-ridge drift gate (closure_ridge_max_drift)
    # against the post-optimization prediction -- the sweep-time
    # equivalent of the live gate's arbitration (default off; measured
    # per-world before enabling).
    rematch_ridge_gate: bool = False
    # The sweep may accept below the live threshold by this margin
    # (floored at 0.5): sparse 11-beam queries put genuine revisits at
    # 0.62-0.69 against the live 0.7 bar (measured on sim-loops:
    # 14 sub-threshold MISSes, one full revisit segment undetected --
    # VERDICT r3 recall 0.50), and sweep acceptances are triple-gated
    # (sharpness above, PCM voting, 11.345 chi2 prune) where the live
    # path's single score test is not.
    rematch_score_margin: float = 0.12
    # Iterative map refinement at final cleanup (backend.refine_map):
    # rebuild grids at the optimized poses, re-measure every closure,
    # re-solve. Kept as a capability but DEFAULT OFF: on the sim
    # worlds re-measured edges shrink on paper (0.083 -> 0.053 RMS)
    # yet ATE worsens (0.082 -> 0.094-0.127) -- re-measurement against
    # grids rebuilt from the same estimates correlates the edge errors
    # with the current solution, which the graph then trusts.
    final_refine_rounds: int = 0
    dist_solver_min_poses: int = 1024
    dist_block_size: int = 128
    # Final joint landmark+pose bundle adjustment
    # (backend.joint_solve / solvers.optimize_joint_graph): after the
    # pose-graph-only final optimization, re-solve poses AND landmarks
    # jointly over every original measurement (raw odometry, all
    # archived line observations, DCS closures). No reference
    # counterpart (the reference throws the landmark graph away at
    # every closure). DEFAULT OFF after measurement
    # (scripts/joint_lab.py, RESULTS.md round 4): multicloud
    # observations of one landmark share ~15/16 of their scans, so
    # treating them as independent double-counts heavily, and even
    # span-thinned / long-range-only variants worsened sim-office ATE
    # (0.080 -> 0.087-0.099) because line re-observations carry
    # viewpoint-dependent bias. Kept as a tested capability for
    # landmark-rich datasets with genuinely independent observations.
    final_joint: bool = False
    final_joint_iterations: int = 12
    # Submap chain edges (models/backend.py _chain_edges): when a new
    # submap finalizes, GN-refine its multicloud against the previous
    # `local_refine_hops` submaps' grids, seeded at the pose estimate
    # (no exhaustive search -> no aliasing risk), and add pose-graph
    # edges with Censi covariances. Bounds odometric drift BETWEEN
    # revisits, which loop closures alone cannot (the sim-killian
    # error budget in RESULTS.md shows a perfect-precision closure
    # oracle still plateaus at ~0.29 m on long corridors). Not in the
    # reference schema: the reference leans on its landmark frontend
    # alone between closures.
    local_refine: bool = True
    local_refine_hops: int = 2  # previous submaps to chain against
    # min fraction of query points on occupied (dilated) submap cells
    # at the refined pose (rejects queries that left the submap's
    # coverage or didn't align)
    local_refine_min_overlap: float = 0.4
    # covariance floor added to the GN-Hessian (Censi) covariance
    # (match-resolution cell scale: measured per-edge errors on sim
    # worlds are ~0.05-0.17 m even when the Censi sigma says less)
    local_refine_sigma_xy: float = 0.1  # meters
    local_refine_sigma_th: float = 0.04  # radians
    local_refine_max_correction: float = 1.0  # reject larger jumps (m)
    # skip the edge when the landmark frontend has >= this many
    # observations per keyframe (and >=2 distinct landmarks) over the
    # seam query -- its estimates are better than scan matching there
    local_refine_lm_cover: float = 1.0
    local_refine_max_dist: float = 0.0  # 0 = range_max + 2*traj_len
    # per-keyframe scan-to-previous-submap pins (models/backend.py
    # _keyframe_edges): bound drift per submap hop instead of per
    # keyframe. Gates shared with local_refine_*; the sigmas below are
    # added to the Censi covariance of each pin.
    kf_refine: bool = True
    kf_refine_sigma_xy: float = 0.04  # meters
    kf_refine_sigma_th: float = 0.015  # radians
    # the seed is at most a few keyframes of drift from truth, so the
    # basin gate is much tighter than the submap-hop one
    kf_refine_max_correction: float = 0.4  # meters
    # round-3 pin redesign (models/backend.py _pin_match): pins are
    # small-window EXHAUSTIVE correlative matches (no seeded-GN basin
    # escapes; measured round-2 pin error 0.38 m RMS vs claimed 0.046)
    kf_search_window: float = 0.8  # meters each side of the seed
    kf_angular_window: float = 0.2  # radians each side
    kf_min_score: float = 0.55  # correlative accept threshold
    # min fraction of query points on occupied HIGH-RES cells at the
    # refined pose: keeps only keyframes that genuinely re-observe the
    # older submap (few but 0.02 m-grade pins; loosening this admitted
    # 10x more pins at 0.15 m error -- measured, scripts/edge_budget.py)
    kf_min_overlap: float = 0.4
    # jit bucket minima. On CPU small buckets are fastest; through the
    # TPU remote-compile tunnel every distinct shape costs up to ~60 s
    # to compile, while the solve itself is latency-bound (a P=64 LM
    # solve costs the same wall time as P=16), so the runner raises
    # these on non-cpu platforms to collapse the bucket ladder into
    # one or two shapes per kernel.
    bucket_min_poses: int = 16
    bucket_min_lms: int = 16
    bucket_min_edges: int = 16
    bucket_min_pg: int = 16
    # preallocation bucket sizes for fixed-shape jit state
    max_keyframes: int = 4096
    max_landmarks: int = 1024
    max_obs_edges: int = 8192
    max_closures: int = 256
    max_submaps: int = 512
    seed: int = 0

    @property
    def angle_increment(self) -> float:
        return (self.angle_max - self.angle_min) / (self.scan_size - 1)

    @classmethod
    def from_yaml(cls, path: str) -> "SlamConfig":
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "SlamConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in fields})


def load_dataset_config(
    dataset_dir: str, postfix: str = ""
) -> tuple[SlamConfig, ExtractorConfig]:
    """Load <dir>/slam[-postfix].yaml + <dir>/line_extractor.yaml.

    Matches the launch-file convention (launch/log_runner.launch:11-18):
    the slam yaml is `slam{postfix}.yaml` where postfix is e.g. "-11";
    extractor params may live in line_extractor.yaml or inline in the
    slam yaml (some reference datasets put them in either place).
    """
    slam_path = os.path.join(dataset_dir, f"slam{postfix}.yaml")
    with open(slam_path) as f:
        raw = yaml.safe_load(f) or {}
    slam = SlamConfig.from_dict(raw)
    ls_path = os.path.join(dataset_dir, "line_extractor.yaml")
    ls_raw = {}
    if os.path.exists(ls_path):
        with open(ls_path) as f:
            ls_raw = yaml.safe_load(f) or {}
    # allow extractor keys inline in the slam yaml (e.g. intel-lab slam-11)
    merged = {**raw, **ls_raw}
    extractor = ExtractorConfig.from_dict(merged)
    return slam, extractor
