"""In-situ timing of the partitioned pose-graph solver at bench scale.

Usage: python scripts/prof_solver.py [n_blocks ...]
Sweeps SLAM_INTERIOR_UNROLL via re-exec (the constant is baked at
import time) unless SLAM_INTERIOR_UNROLL is already set, in which
case it times one configuration.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("SLAM_INTERIOR_UNROLL") is None and "--one" not in sys.argv:
    for u in [1, 2, 4, 8]:
        env = dict(os.environ, SLAM_INTERIOR_UNROLL=str(u))
        subprocess.run(
            [sys.executable, __file__, "--one", *sys.argv[1:]], env=env
        )
    sys.exit(0)

import numpy as np
import jax

from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache

_enable_cache(tag="tpu")

from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph
from sparse_gslam_tpu.parallel.dist_solver import (
    INTERIOR_UNROLL,
    optimize_pose_graph_blocked,
    split_graph,
)
from sparse_gslam_tpu.parallel.partition import make_partition

blocks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [128]

g, _ = make_chain_graph(
    n_poses=16000, n_closures=256, pad_to=16384, dtype=np.float32
)
for n_blocks in blocks:
    plan = make_partition(
        g.poses.shape[0], n_blocks, np.asarray(g.clo_i),
        np.asarray(g.clo_j), np.asarray(g.clo_valid),
    )
    bg, sg = split_graph(g, plan)
    f = jax.jit(lambda b, s: optimize_pose_graph_blocked(b, s, 1.0, 20))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(bg, sg))
    compile_t = time.perf_counter() - t0
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(f(bg, sg))
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(np.asarray(out)).all()
    print(
        f"unroll={INTERIOR_UNROLL} n_blocks={n_blocks}: "
        f"{20 / dt:7.1f} it/s ({dt * 1e3:.2f} ms/20it, "
        f"compile {compile_t:.1f}s)",
        flush=True,
    )
