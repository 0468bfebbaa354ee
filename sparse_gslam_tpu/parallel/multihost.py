"""Multi-host initialization + mesh construction helpers.

The reference has no distributed backend (SURVEY.md §2.7); this is the
jax.distributed layer for configs 4-5 of BASELINE.json: a 1-D "blocks"
mesh over all chips of a pod slice, with the keyframe-partitioned
Schur solver (parallel.dist_solver) running under shard_map on top.
Cross-host traffic is only the psum-reduced separator system and the
ppermute chain halo -- both XLA collectives that ride ICI within a
slice and DCN across hosts transparently.

Usage (one process per host):
    from sparse_gslam_tpu.parallel import multihost
    multihost.initialize()          # reads JAX coordinator env vars
    mesh = multihost.block_mesh()   # 1-D mesh over all global devices
    ... optimize_pose_graph_sharded(bg, sg, phi, mesh) ...
"""
from __future__ import annotations

import os

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process."""
    import jax

    n = num_processes or int(os.environ.get("SLAM_NUM_PROCESSES", "1"))
    if n <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("SLAM_COORDINATOR", "localhost:12321"),
        num_processes=n,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("SLAM_PROCESS_ID", "0")),
    )


def block_mesh(n_devices: int | None = None):
    """1-D Mesh("blocks") over the first n global devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("blocks",))


def scaling_report(g, phi: float, device_counts=(1, 2, 4, 8),
                   iterations: int = 20, reps: int = 3,
                   n_blocks: int = 128):
    """Measure pose-graph GN throughput at several mesh sizes (on a
    virtual CPU mesh when real chips are unavailable) and compute
    scaling efficiency -- the frames/s-efficiency metric of
    BASELINE.json config 5 specialized to the solver.

    Block granularity is constant (n_blocks) across device counts so
    the numeric work is identical and efficiency isolates collective +
    distribution overhead. Returns {n_devices: iters_per_s}.
    """
    import time

    import jax

    from .dist_solver import optimize_partitioned

    out = {}
    for n in device_counts:
        if n > len(jax.devices()) or n_blocks % n != 0:
            continue
        mesh = block_mesh(n)
        f = lambda: optimize_partitioned(
            g, phi, n_blocks=n_blocks, iterations=iterations, mesh=mesh
        )
        jax.block_until_ready(f().poses)
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f().poses)
        dt = (time.perf_counter() - t0) / reps
        out[n] = iterations / dt
    return out
