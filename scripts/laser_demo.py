"""Standalone line-extractor demo: the laser_node + ls_test equivalent
(reference: src/ls_extractor/src/laser_node.cpp:12-43 runs the
extractor on live scans with fixed isotropic covariance 0.01*I;
src/ls_extractor/src/ls_test.cpp:48-96 runs it on synthetic noisy
segments and plots extracted vs ground truth).

Usage:
  python scripts/laser_demo.py                    # synthetic ls_test
  python scripts/laser_demo.py --log <carmen.log> --frame 100
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"  # CPU tool; never grab the TPU tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--algorithm", default="smc",
                    choices=["smc", "smf", "hough"])
    ap.add_argument("--out", default="laser_demo.png")
    args = ap.parse_args()

    from sparse_gslam_tpu.ops.lines import extract_lines_any
    from sparse_gslam_tpu.utils.config import ExtractorConfig

    params = ExtractorConfig(
        outlier_dist=0.1, min_split_dist=0.1, max_line_gap=0.6,
        min_line_length=0.5, min_line_points=10,
        cluster_threshold=100.0, algorithm=args.algorithm,
    )

    gt_segments = None
    if args.log:
        from sparse_gslam_tpu.io.providers import create_data_provider

        frames = list(create_data_provider("carmen", args.log).frames())
        fr = frames[args.frame]
        n = len(fr.ranges)
        angles = np.linspace(-np.pi / 2, np.pi / 2, n)
        finite = np.isfinite(fr.ranges) & (fr.ranges < 40.0)
        pts = np.stack(
            [fr.ranges * np.cos(angles), fr.ranges * np.sin(angles)], 1
        )[finite]
    else:
        # the ls_test synthetic scene: 4 segments, sigma=0.03 normal
        # displacement, shuffled (ls_test.cpp:48-96)
        rng = np.random.default_rng(0)
        gt_segments = [
            ((-2.0, -1.5), (2.0, -1.5)),
            ((2.0, -1.5), (2.0, 1.5)),
            ((2.0, 1.5), (-2.0, 1.5)),
            ((-2.0, -0.5), (-2.0, 1.0)),
        ]
        pts = []
        for (x0, y0), (x1, y1) in gt_segments:
            t = rng.uniform(0, 1, 60)
            p = np.stack([x0 + t * (x1 - x0), y0 + t * (y1 - y0)], 1)
            nvec = np.array([-(y1 - y0), x1 - x0])
            nvec /= np.linalg.norm(nvec)
            pts.append(p + nvec[None] * rng.normal(0, 0.03, (60, 1)))
        pts = np.concatenate(pts)
        rng.shuffle(pts)

    covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))  # laser_node.cpp:20
    segs = extract_lines_any(pts, covs, params)
    print(f"{args.algorithm}: {segs.n} segments from {len(pts)} points")
    for k in range(segs.n):
        print(
            f"  rho={segs.rhotheta[k, 0]:.3f} "
            f"theta={np.degrees(segs.rhotheta[k, 1]):7.2f}deg  "
            f"len={np.linalg.norm(segs.end[k] - segs.start[k]):.2f}m"
        )

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(pts[:, 0], pts[:, 1], s=4, c="gray", label="points")
    if gt_segments:
        for (a, b) in gt_segments:
            ax.plot([a[0], b[0]], [a[1], b[1]], "g--", linewidth=1,
                    label="_gt")
    for k in range(segs.n):
        ax.plot(
            [segs.start[k, 0], segs.end[k, 0]],
            [segs.start[k, 1], segs.end[k, 1]],
            "r-", linewidth=2,
        )
    ax.set_aspect("equal")
    ax.legend(["points", "ground truth", "extracted"])
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"plot -> {args.out}")


if __name__ == "__main__":
    main()
