"""Multi-device scaling report for the partitioned pose-graph solver
(BASELINE.json configs 4-5: 1 chip -> 8 chips -> multi-host).

NOTE on interpreting virtual-mesh numbers: with
--xla_force_host_platform_device_count the "devices" share the same
physical cores, so per-device replicated work (the separator solve)
serializes and measured efficiency is a severe LOWER bound that mostly
reflects core oversubscription, not the algorithm. The run still
validates correctness of the sharded path (tests assert it matches the
dense solver bit-for-bit-ish); real chip-scaling numbers require pod
hardware, where each device's replicated separator solve runs
concurrently and the only true cross-chip traffic is one psum of the
(3S,3S) separator system + one 3-vector ppermute per GN iteration.

Usage: python scripts/scaling_report.py [--poses 16384] [--closures 256]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=16384)
    ap.add_argument("--closures", type=int, default=256)
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform == "cpu" or not os.environ.get("JAX_PLATFORMS"):
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph
    from sparse_gslam_tpu.parallel.multihost import scaling_report

    g, _ = make_chain_graph(
        n_poses=args.poses - 100, n_closures=args.closures,
        pad_to=args.poses, dtype=np.float32,
    )
    print(f"devices available: {len(jax.devices())} ({jax.devices()[0]})")
    rep = scaling_report(g, 1.0, device_counts=args.devices)
    base = rep.get(1)
    out = {}
    for n, ips in sorted(rep.items()):
        eff = ips / (base * n) if base else float("nan")
        out[n] = {"iters_per_s": round(ips, 2), "efficiency": round(eff, 3)}
        print(
            f"  {n} devices: {ips:8.1f} iters/s  efficiency {eff:.2f}",
            flush=True,
        )

    # -- collective-traffic model (VERDICT r4 #6): projected pod
    # efficiency from single-device calibration + the psum payload --
    modeled = model_section(g, args)
    print(json.dumps({"scaling": out, "modeled": modeled}), flush=True)


def model_section(g, args, n_blocks=128, iterations=20):
    """Calibrate (t_int, t_sep) on the available backend and print the
    modeled pod-scale efficiency. t_sep is measured directly (the
    replicated separator Cholesky+solve at this graph's true separator
    size); t_int = measured single-device iteration minus t_sep."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sparse_gslam_tpu.parallel import multihost
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
    S = int(sg.sep_valid.shape[0])
    f = jax.jit(
        lambda b, s: optimize_pose_graph_blocked(b, s, 1.0, iterations)
    )
    jax.block_until_ready(f(bg, sg))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(f(bg, sg))
    t_iter = (time.perf_counter() - t0) / 3 / iterations

    # separator stage alone: dense (3S,3S) SPD solve, replicated on
    # every device in the sharded version. Chained `iterations` times
    # inside ONE program so per-dispatch RPC latency (which dominates
    # a single ~ms solve through the remote tunnel) amortizes away,
    # matching how the solve actually occurs inside the GN loop.
    A = jnp.eye(3 * S, dtype=jnp.float32) * 4.0 + 0.1
    b = jnp.ones((3 * S,), jnp.float32)

    @jax.jit
    def g_sep(A, b):
        def body(_, bb):
            ch = jax.scipy.linalg.cho_factor(A, lower=True)
            x = jax.scipy.linalg.cho_solve(ch, bb)
            return x / jnp.maximum(jnp.abs(x).max(), 1e-20)

        return jax.lax.fori_loop(0, iterations, body, b)

    jax.block_until_ready(g_sep(A, b))
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(g_sep(A, b))
    t_sep = (time.perf_counter() - t0) / 5 / iterations
    t_int = max(t_iter - t_sep, 0.0)
    sep_bytes = 4.0 * (9.0 * S * S + 3.0 * S)  # f32 psum payload
    print(
        f"model calibration ({jax.devices()[0].platform}): "
        f"t_iter {t_iter*1e3:.2f} ms = t_int {t_int*1e3:.2f} + "
        f"t_sep {t_sep*1e3:.2f}; S={S} separators -> psum payload "
        f"{sep_bytes/1e6:.2f} MB/iter",
        flush=True,
    )
    modeled = {}
    for n, (tn, eff) in multihost.model_efficiency(
        t_int, t_sep, sep_bytes
    ).items():
        hosts = max(1, -(-n // 8))
        print(
            f"  modeled {n:3d} chips ({hosts} host"
            f"{'s' if hosts > 1 else ''}): {iterations_per_s(tn):8.1f} "
            f"iters/s  efficiency {eff:.2f}",
            flush=True,
        )
        modeled[n] = {
            "t_iter_ms": round(tn * 1e3, 3),
            "efficiency": round(eff, 3),
        }
    return modeled


def iterations_per_s(t_iter_s):
    return 1.0 / max(t_iter_s, 1e-12)


if __name__ == "__main__":
    main()
