"""Beam-count sweep: error vs scan_size, the sweep.py equivalent
(reference: datasets/sweep.py:27-97 error-vs-beam-count plots and
multiscan-size ablation).

Usage: python scripts/sweep.py <dataset_dir> <name> [--beams 4 6 8 11]
       [--multicloud 88 132 176] [--out sweep.png]

Runs the full pipeline per setting and plots ATE vs beams.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"  # CPU tool; never grab the TPU tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run_one(dataset_dir, name, scan_size, multicloud_size=None,
            kernel=None, min_score_scale=1.0):
    from sparse_gslam_tpu.eval.relations import evaluate_files
    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.utils.config import load_dataset_config

    slam_cfg, ls_cfg = load_dataset_config(dataset_dir)
    slam_cfg.scan_size = scan_size
    if multicloud_size:
        slam_cfg.multicloud_size = multicloud_size
    else:
        # keep ~16 scans per multicloud like the shipped configs
        slam_cfg.multicloud_size = scan_size * 16
    if kernel is not None:
        slam_cfg.smoothing_kernel = kernel
        # smoothing scales peak scores down (a point on a 1-cell wall
        # drops from ~0.9 to ~0.5 under the 3x3 kernel); scale the
        # acceptance threshold with it so the ablation compares like
        # with like
        slam_cfg.loop_closure_min_score *= min_score_scale
    prefix = os.path.join(dataset_dir, name)
    provider = create_data_provider(slam_cfg.data_provider, prefix + ".log")
    system = SlamSystem(slam_cfg, ls_cfg)
    for frame in provider.frames():
        system.process_frame(frame)
    system.final_cleanup()
    out = prefix + f".sweep{scan_size}.result"
    system.write_result(out)
    res = evaluate_files(out, prefix + ".relations")
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_dir")
    ap.add_argument("name")
    ap.add_argument("--beams", type=int, nargs="+", default=[4, 6, 8, 11])
    ap.add_argument(
        "--kernels", type=int, nargs="+", default=None,
        help="smoothing-kernel ablation instead of a beam sweep: list "
        "of kernel half-widths (0=off, 1=3x3, 2=5x5, 3=7x7) -- the "
        "reference's datasets/sweep.py:54-75 'no kernel/3x3/5x5/7x7' "
        "experiment. Uses the dataset's configured scan_size.",
    )
    ap.add_argument("--out", default="sweep.png")
    args = ap.parse_args()

    import numpy as np

    if args.kernels is not None:
        from sparse_gslam_tpu.utils.config import load_dataset_config

        slam_cfg, _ = load_dataset_config(args.dataset_dir)
        results = {}
        for s in args.kernels:
            # empirical peak-score scale of a (2s+1)-tap binomial on a
            # 1-cell wall line: weights summed along the wall = central
            # row of the separable kernel
            import math

            scale = (
                math.comb(2 * s, s) / (4.0**s) if s > 0 else 1.0
            )
            res = run_one(
                args.dataset_dir, args.name, slam_cfg.scan_size,
                slam_cfg.multicloud_size, kernel=s,
                min_score_scale=scale,
            )
            results[s] = res
            print(f"kernel={2*s+1}x{2*s+1}: {res}", flush=True)
        with open(args.out + ".kernels.json", "w") as f:
            json.dump(
                {
                    str(s): {
                        "trans_mean": results[s].trans_mean,
                        "trans_std": results[s].trans_std,
                        "rot_mean_deg": float(
                            np.degrees(results[s].rot_mean)
                        ),
                    }
                    for s in results
                },
                f,
                indent=2,
            )
        print(f"-> {args.out}.kernels.json")
        return

    results = {}
    for b in args.beams:
        res = run_one(args.dataset_dir, args.name, b)
        results[b] = res
        print(f"beams={b}: {res}", flush=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.2))
    xs = sorted(results)
    t_mean = [results[b].trans_mean for b in xs]
    t_std = [results[b].trans_std for b in xs]
    r_mean = [np.degrees(results[b].rot_mean) for b in xs]
    r_std = [np.degrees(results[b].rot_std) for b in xs]
    axes[0].errorbar(xs, t_mean, yerr=t_std, marker="o")
    axes[0].set_xlabel("beams per scan")
    axes[0].set_ylabel("translational ATE (m)")
    axes[1].errorbar(xs, r_mean, yerr=r_std, marker="o", color="tab:red")
    axes[1].set_xlabel("beams per scan")
    axes[1].set_ylabel("rotational ATE (deg)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"plot -> {args.out}")
    with open(args.out + ".json", "w") as f:
        json.dump(
            {
                str(b): {
                    "trans_mean": results[b].trans_mean,
                    "trans_std": results[b].trans_std,
                    "rot_mean_deg": float(np.degrees(results[b].rot_mean)),
                    "rot_std_deg": float(np.degrees(results[b].rot_std)),
                }
                for b in xs
            },
            f,
            indent=2,
        )


if __name__ == "__main__":
    main()
