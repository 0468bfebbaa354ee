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
    print(json.dumps({"scaling": out}), flush=True)


if __name__ == "__main__":
    main()
