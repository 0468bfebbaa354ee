"""Phase breakdown of the end-to-end sim-office run (bench.py
time_end_to_end): wall time split into frontend ticks, backend
precompute+match ticks, final cleanup, and everything else (host-side
plumbing + multicloud). Run on TPU (default) or CPU
(JAX_PLATFORMS=cpu + SLAM_PROF_CPU=1).

Usage: python scripts/prof_e2e.py [--frames 250]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=250)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache

    _enable_cache(tag="cpu" if args.cpu else "tpu")

    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.utils.config import load_dataset_config

    slam_cfg, ls_cfg = load_dataset_config("datasets/sim-office")
    t_pre = time.perf_counter()
    if jax.default_backend() != "cpu":
        slam_cfg.bucket_min_poses = max(slam_cfg.bucket_min_poses, 64)
        slam_cfg.bucket_min_lms = max(slam_cfg.bucket_min_lms, 32)
        slam_cfg.bucket_min_edges = max(slam_cfg.bucket_min_edges, 256)
        slam_cfg.bucket_min_pg = max(slam_cfg.bucket_min_pg, 128)
        from sparse_gslam_tpu.utils.prewarm import prewarm

        prewarm(slam_cfg)
    prewarm_s = time.perf_counter() - t_pre

    provider = create_data_provider(
        slam_cfg.data_provider, "datasets/sim-office/sim-office.log"
    )
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=True)
    t0 = time.perf_counter()
    n = 0
    for frame in provider.frames():
        system.process_frame(frame)
        n += 1
        if n >= args.frames:
            break
    t_loop = time.perf_counter() - t0
    t0 = time.perf_counter()
    system.final_cleanup()
    t_final = time.perf_counter() - t0

    ft = np.asarray(system.frontend_times)
    bt = np.asarray(system.backend_times)
    other = t_loop - ft.sum() - bt.sum()
    print(f"backend: {jax.default_backend()}  frames: {n}")
    print(f"prewarm               {prewarm_s:8.2f} s")
    print(f"frame loop            {t_loop:8.2f} s  ({n / t_loop:.1f} fps)")
    print(
        f"  frontend ticks      {ft.sum():8.2f} s  (n={len(ft)}, "
        f"mean {ft.mean() * 1e3:.1f} ms, max {ft.max() * 1e3:.1f} ms)"
    )
    top = np.sort(ft)[-8:][::-1] * 1e3
    print(f"    top ticks ms: {np.round(top, 1).tolist()}")
    if len(bt):
        print(
            f"  backend ticks       {bt.sum():8.2f} s  (n={len(bt)}, "
            f"mean {bt.mean() * 1e3:.1f} ms, max {bt.max() * 1e3:.1f} ms)"
        )
        topb = np.sort(bt)[-8:][::-1] * 1e3
        print(f"    top ticks ms: {np.round(topb, 1).tolist()}")
    if system.backend is not None and system.backend.prof:
        print("  backend phase totals (incl. final_cleanup):")
        for k, v in sorted(
            system.backend.prof.items(), key=lambda kv: -kv[1]
        ):
            print(f"    {k:<16} {v:8.2f} s")
    print(f"  other (host+mc)     {other:8.2f} s")
    print(f"final_cleanup         {t_final:8.2f} s")
    print(
        f"TOTAL (loop+final)    {t_loop + t_final:8.2f} s  "
        f"({n / (t_loop + t_final):.1f} fps incl. final)"
    )


if __name__ == "__main__":
    main()
