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


def model_efficiency(
    t_int_s: float,
    t_sep_s: float,
    sep_bytes: float,
    device_counts=(2, 4, 8, 16, 32, 64),
    chips_per_host: int = 8,
    bw_ici: float = 100e9,
    bw_dcn: float = 25e9,
    lat_ici: float = 1e-6,
    lat_dcn: float = 50e-6,
):
    """Projected scaling efficiency of the partitioned GN solver from
    a collective-traffic model (VERDICT r4 #6): the virtual-CPU-mesh
    table measures core oversubscription, not the algorithm, so this
    models what pod hardware would do from first principles +
    single-chip calibration.

    Per GN iteration the sharded solver (optimize_pose_graph_sharded)
    does: interior block work (perfectly partitioned -> t_int/n),
    the replicated separator solve (t_sep, constant), one psum of the
    dense (3S, 3S)+ (3S) separator system (`sep_bytes`), and one
    3-float ppermute (latency only). psum cost uses the standard
    ring reduce-scatter + all-gather model, 2(n-1)/n * bytes / BW,
    over the slowest traversed fabric: ICI within a host
    (v5e: 4 links x 400 Gbps/chip; ~100 GB/s effective ring BW),
    DCN between hosts (~200 Gbps NIC -> 25 GB/s), with per-collective
    latency floors. Returns {n: (t_iter_s, efficiency)} where
    efficiency = t_1 / (n * t_n)."""
    import math

    t1 = t_int_s + t_sep_s
    out = {}
    for n in device_counts:
        hosts = max(1, math.ceil(n / chips_per_host))
        comm = 2.0 * (n - 1) / n * sep_bytes / bw_ici
        comm += lat_ici * max(1.0, math.log2(max(n, 2)))
        if hosts > 1:
            # the inter-host stage of the hierarchical reduction
            comm += 2.0 * (hosts - 1) / hosts * sep_bytes / bw_dcn
            comm += lat_dcn * max(1.0, math.log2(hosts))
        tn = t_int_s / n + t_sep_s + comm
        out[n] = (tn, t1 / (n * tn))
    return out


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
