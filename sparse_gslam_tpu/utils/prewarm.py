"""Parallel jit prewarming for TPU service mode (ROADMAP item 2).

Through the axon remote-compile tunnel a fresh bucket shape costs up to
~60 s; without prewarming, those compiles serialize inside the frame
loop (measured on sim-office/TPU: a 60 s stall at the first keyframe's
LM solve + ~30 s of matcher compiles spread over the first closures).
Prewarming submits the bucket ladder's shapes to a thread pool at
startup: the compile service processes them concurrently and the frame
loop's first calls hit a warm cache. Everything here is best-effort --
a failed prewarm task only means that shape compiles lazily later.
"""
from __future__ import annotations

import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _lm_dummy(P, L, E):
    import jax.numpy as jnp

    from ..ops import solvers

    poses = np.zeros((P, 3), np.float32)
    poses[:4] = np.array(
        [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], np.float32
    )
    pose_valid = np.zeros(P, bool)
    pose_valid[:4] = True
    pose_fixed = np.zeros(P, bool)
    pose_fixed[0] = True
    odom_meas = np.zeros((P, 3), np.float32)
    odom_meas[1:4, 0] = 1.0
    odom_info = np.tile(np.eye(3, dtype=np.float32) * 10, (P, 1, 1))
    odom_valid = np.zeros(P, bool)
    odom_valid[1:4] = True
    lms = np.zeros((L, 2), np.float32)
    lms[0] = [2.0, 1.2]
    lm_valid = np.zeros(L, bool)
    lm_valid[0] = True
    obs_pose = np.zeros(E, np.int32)
    obs_lm = np.zeros(E, np.int32)
    obs_meas = np.zeros((E, 2), np.float32)
    obs_meas[:2] = [2.0, 1.2]
    obs_info = np.tile(np.eye(2, dtype=np.float32) * 5, (E, 1, 1))
    obs_valid = np.zeros(E, bool)
    obs_valid[:2] = True
    obs_pose[1] = 1
    return solvers.LMGraphData(
        *[
            jnp.asarray(a)
            for a in (
                poses, pose_valid, pose_fixed, odom_meas, odom_info,
                odom_valid, lms, lm_valid, obs_pose, obs_lm, obs_meas,
                obs_info, obs_valid,
            )
        ]
    )


def _pg_dummy(N, C):
    import jax.numpy as jnp

    from ..ops import solvers

    poses = np.zeros((N, 3), np.float32)
    poses[:4, 0] = np.arange(4)
    valid = np.zeros(N, bool)
    valid[:4] = True
    fixed = np.zeros(N, bool)
    fixed[0] = True
    chain_meas = np.zeros((N, 3), np.float32)
    chain_meas[1:4, 0] = 1.0
    chain_info = np.tile(np.eye(3, dtype=np.float32) * 10, (N, 1, 1))
    chain_valid = np.zeros(N, bool)
    chain_valid[1:4] = True
    clo_i = np.zeros(C, np.int32)
    clo_j = np.zeros(C, np.int32)
    clo_meas = np.zeros((C, 3), np.float32)
    clo_info = np.tile(np.eye(3, dtype=np.float32), (C, 1, 1))
    clo_valid = np.zeros(C, bool)
    return solvers.PoseGraphData(
        *[
            jnp.asarray(a)
            for a in (
                poses, valid, fixed, chain_meas, chain_info, chain_valid,
                clo_i, clo_j, clo_meas, clo_info, clo_valid,
            )
        ]
    )


def build_tasks(config, ladder: int = 4):
    """Callables that each force-compile one jitted shape the pipeline
    will hit. `ladder` bounds how far up the pow2 bucket ladders we
    reach ahead."""
    import math

    import jax.numpy as jnp

    from ..models.frontend import _get_lm_solver_packed
    from ..models.backend import _get_pg_solver
    from ..ops import matching

    tasks = []

    def warm_lm(P, L, E):
        g = _lm_dummy(P, L, E)
        a = {k: np.asarray(v) for k, v in g._asdict().items()}
        fbuf = np.concatenate(
            [
                a["poses"].ravel(), a["odom_meas"].ravel(),
                a["odom_info"].ravel(), a["lms"].ravel(),
                a["obs_meas"].ravel(), a["obs_info"].ravel(),
            ]
        )
        ibuf = np.concatenate([a["obs_pose"], a["obs_lm"]]).astype(
            np.int32
        )
        bbuf = np.concatenate(
            [
                a["pose_valid"], a["pose_fixed"], a["odom_valid"],
                a["lm_valid"], a["obs_valid"],
            ]
        )
        from ..models.frontend import _lm_exec_device

        dev = _lm_exec_device(config)
        if dev is not None:
            # product path runs the LM solve on host CPU
            # (frontend_on_host): warm the CPU executable, not a TPU
            # one that would never be used -- TPU compile-queue time
            # is the scarce resource here
            import jax

            with jax.default_device(dev):
                _get_lm_solver_packed(P, L, E)(fbuf, ibuf, bbuf)
        else:
            _get_lm_solver_packed(P, L, E)(
                jnp.asarray(fbuf), jnp.asarray(ibuf), jnp.asarray(bbuf)
            )

    # frontend LM bucket ladder from the configured minima upward (the
    # configured minimum is what the whole run uses until the window
    # outgrows it); ORDER MATTERS: the compile service is a shared
    # queue, so the shapes needed first go first
    Pm = config.bucket_min_poses
    Lm = config.bucket_min_lms
    Em = config.bucket_min_edges
    lm_shapes = []
    for k in range(ladder):
        lm_shapes.append(
            (Pm << k, max(Lm, (Pm << k) // 4) if k else Lm,
             max(Em, (Pm << k) * 4) if k else Em)
        )
    for P, L, E in lm_shapes:
        tasks.append(
            ("lm %d/%d/%d" % (P, L, E),
             lambda P=P, L=L, E=E: warm_lm(P, L, E))
        )

    # pose-graph solver ladder
    for k in range(max(ladder - 1, 1)):
        N = config.bucket_min_pg << k
        tasks.append(
            ("pg %d" % N,
             lambda N=N: _get_pg_solver(config.dcs_phi)(_pg_dummy(N, 1)))
        )

    # matcher shapes for this config's grid geometry: the fused
    # one-call matcher compiles ONE shape per dataset (rotation count
    # frozen to range_max, candidate axis padded to 16 -- see
    # models/backend._match_search), plus the high-res refinement
    # kernels the closure/pin paths call
    extent = (
        config.submap_trajectory_length + 2.0 * config.range_max + 2.0
    )
    size = int(math.ceil(extent / config.submap_resolution / 64.0) * 64)
    hsize = int(math.ceil(extent / 0.05 / 64.0) * 64)
    grid = jnp.zeros((size, size), jnp.float32)
    origin = jnp.zeros(2, jnp.float32)
    pts = jnp.zeros((256, 2), jnp.float32)
    valid = jnp.zeros(256, bool)
    stride = 1 << (max(1, config.branch_and_bound_depth) - 1)
    spec = matching.search_spec(
        config.linear_search_window, config.angular_search_window,
        config.range_max, config.submap_resolution,
    )

    def warm_fused():
        matching.match_candidates_fused(
            [grid], [grid], [origin], [0.0],
            np.zeros((4, 2), np.float32), spec, 0.7, stride,
            c_bucket=16,
        )

    tasks.append(("fused c16", warm_fused))

    def warm_refine(gs, npts):
        matching.refine_pose_cov(
            jnp.zeros((gs, gs), jnp.float32), origin, 0.05,
            jnp.zeros((npts, 2), jnp.float32), jnp.zeros(npts, bool),
            jnp.zeros(3, jnp.float32),
        )

    for npts in (256, 512):
        tasks.append(
            ("refine hi %d" % npts,
             lambda n=npts: warm_refine(hsize, n))
        )
        tasks.append(
            ("refine lo %d" % npts,
             lambda n=npts: warm_refine(size, n))
        )
    return tasks


def prewarm(config, threads: int = 4, ladder: int = 3, wait: bool = False):
    """Kick off parallel compilation of the expected jit shapes.
    Returns the executor (shut down lazily); wait=True blocks until
    all shapes are compiled (useful for benchmarking / tests)."""
    tasks = build_tasks(config, ladder)
    ex = ThreadPoolExecutor(max_workers=threads)

    def run(name, fn):
        try:
            fn()
        except Exception as e:  # best-effort
            print(f"prewarm {name}: {e!r}", file=sys.stderr)

    futs = [ex.submit(run, name, fn) for name, fn in tasks]
    print(
        f"prewarm: {len(futs)} shapes compiling on {threads} threads",
        file=sys.stderr,
    )
    if wait:
        for f in futs:
            f.result()
        ex.shutdown()
    else:
        ex.shutdown(wait=False)
    return futs
