"""Multi-host launcher for the keyframe-partitioned pose-graph solver
(BASELINE.json config 5; ROADMAP item 4).

One process per host:

    SLAM_NUM_PROCESSES=2 SLAM_PROCESS_ID=0 SLAM_COORDINATOR=host0:12321 \
        python scripts/run_multihost.py --devices 8 &
    SLAM_NUM_PROCESSES=2 SLAM_PROCESS_ID=1 SLAM_COORDINATOR=host0:12321 \
        python scripts/run_multihost.py --devices 8

Single-host validation on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/run_multihost.py --devices 8 --cpu

Each host touches only its own keyframe blocks: the BlockedGraph is
device_put with a NamedSharding over the 1-D "blocks" mesh axis before
the solve, so HBM holds 1/n of the chain state per chip and host->
device transfer is per-shard (multi-host: use
jax.make_array_from_process_local_data with each host's block range).
Cross-host traffic during the solve is only the psum-reduced separator
system and the ppermute chain halo.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-poses", type=int, default=16000)
    ap.add_argument("--pad-to", type=int, default=16384)
    ap.add_argument("--closures", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=128)
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--devices", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (virtual-device runs)")
    ap.add_argument("--scaling", action="store_true",
                    help="sweep 1..N devices and report efficiency")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sparse_gslam_tpu.parallel import multihost
    from sparse_gslam_tpu.parallel.dist_solver import (
        optimize_pose_graph_sharded,
        split_graph,
    )
    from sparse_gslam_tpu.parallel.partition import make_partition
    from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph

    multihost.initialize()
    n_dev = args.devices or len(jax.devices())
    print(
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{len(jax.local_devices())} local / {len(jax.devices())} global "
        f"devices, using {n_dev}",
        flush=True,
    )

    g, _ = make_chain_graph(
        n_poses=args.n_poses, n_closures=args.closures,
        pad_to=args.pad_to, dtype=np.float32,
    )
    plan = make_partition(
        args.pad_to, args.blocks, np.asarray(g.clo_i),
        np.asarray(g.clo_j), np.asarray(g.clo_valid),
    )
    bg, sg = split_graph(g, plan)

    if args.scaling:
        counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n_dev]
        rep = multihost.scaling_report(
            g, 1.0, device_counts=counts, iterations=args.iterations,
            reps=args.reps, n_blocks=args.blocks,
        )
        base = None
        for n, ips in rep.items():
            base = base or ips
            eff = ips / (base * n / list(rep)[0])
            print(f"{n} devices: {ips:.0f} it/s (efficiency {eff:.2f})")
        return

    mesh = multihost.block_mesh(n_dev)
    from jax.sharding import NamedSharding, PartitionSpec as Ps

    # shard the block state over the mesh so each chip holds 1/n
    shard = NamedSharding(mesh, Ps("blocks"))
    rep = NamedSharding(mesh, Ps())
    bg = jax.tree_util.tree_map(lambda a: jax.device_put(a, shard), bg)
    sg = jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), sg)

    out = optimize_pose_graph_sharded(
        bg, sg, 1.0, mesh, iterations=args.iterations
    )
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = optimize_pose_graph_sharded(
            bg, sg, 1.0, mesh, iterations=args.iterations
        )
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.reps
    assert np.isfinite(np.asarray(out)).all()
    print(
        f"{n_dev} devices x {jax.process_count()} hosts: "
        f"{args.iterations / dt:.1f} it/s "
        f"(N={args.pad_to}, C={args.closures}, blocks={args.blocks})"
    )


if __name__ == "__main__":
    main()
