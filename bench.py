"""Benchmark: pose-graph Gauss-Newton optimization throughput on TPU.

Headline metric (BASELINE.md: ">=3x pose-graph-optimization throughput
vs the C++ g2o backend on one TPU chip"): GN iterations/second on a
production-scale chain+closures pose graph (16384 keyframes, 256 loop
closures -- 8x the mit-killian sequence that is the reference's
largest), solved by the block-partitioned Schur solver
(parallel.dist_solver) in float32 on one chip.

vs_baseline = TPU iters/s divided by the same graph solved by the
native C++ baseline (native/posegraph_solver.cpp: block-tridiagonal
LDL^T + Woodbury closures, -O3 -march=native, float64 -- an
implementation specialized to this graph family, i.e. at least as fast
as g2o's generic sparse Cholesky, so the ratio is conservative).

Prints ONE JSON line; details go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_tpu(g, n_blocks, iterations=20, reps=5):
    import jax

    from sparse_gslam_tpu.parallel.dist_solver import (
        optimize_pose_graph_blocked,
        split_graph,
    )
    from sparse_gslam_tpu.parallel.partition import make_partition

    plan = make_partition(
        g.poses.shape[0], n_blocks, np.asarray(g.clo_i),
        np.asarray(g.clo_j), np.asarray(g.clo_valid),
    )
    bg, sg = split_graph(g, plan)
    f = jax.jit(
        lambda b, s: optimize_pose_graph_blocked(b, s, 1.0, iterations)
    )
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(bg, sg))
    log(f"  compile+first run: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(f(bg, sg))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(np.asarray(out)).all(), "solver produced NaN"
    return iterations / dt


def time_native(g, iterations=4):
    from sparse_gslam_tpu.io.native import posegraph_gn_native

    posegraph_gn_native(g, 1.0, 1)  # warm (includes lazy g++ build)
    t0 = time.perf_counter()
    posegraph_gn_native(g, 1.0, iterations)
    dt = time.perf_counter() - t0
    return iterations / dt


def main():
    import jax

    from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache(tag="tpu")

    from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # mit-killian scale (the reference's largest sequence)
    g_small, _ = make_chain_graph(
        n_poses=2000, n_closures=64, pad_to=2048, dtype=np.float32
    )
    tpu_small = time_tpu(g_small, n_blocks=16)
    native_small = time_native(g_small, iterations=20)
    log(
        f"mit-killian scale (N=2048, C=64): tpu {tpu_small:.0f} it/s, "
        f"C++ {native_small:.0f} it/s, ratio {tpu_small / native_small:.2f}"
    )

    # production scale
    g_big, _ = make_chain_graph(
        n_poses=16000, n_closures=256, pad_to=16384, dtype=np.float32
    )
    tpu_big = time_tpu(g_big, n_blocks=128, reps=10)
    native_big = time_native(g_big, iterations=3)
    log(
        f"production scale (N=16384, C=256): tpu {tpu_big:.0f} it/s, "
        f"C++ {native_big:.1f} it/s, ratio {tpu_big / native_big:.1f}"
    )

    print(
        json.dumps(
            {
                "metric": "posegraph_gn_iters_per_s_16k",
                "value": round(tpu_big, 1),
                "unit": "iters/s",
                "vs_baseline": round(tpu_big / native_big, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
