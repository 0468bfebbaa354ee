"""Submap match debugging harness: the submap_test.cpp equivalent
(reference: src/sparse_gslam/src/submap_test.cpp:18-155 -- reload a
dumped submap + query scan, re-run the matcher, plot the aligned scan
over the grid for match-score regression debugging).

Dump format: one .npz per case with arrays {probs, origin, resolution,
query, init_theta} (written by SubmapLoopCloser when
SLAM_DUMP_MATCHES=1, or hand-made).

Usage: python scripts/submap_debug.py case.npz [--out match.png]
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
    ap.add_argument("case")
    ap.add_argument("--out", default="match_debug.png")
    ap.add_argument("--min-score", type=float, default=0.5)
    args = ap.parse_args()

    import jax.numpy as jnp

    from sparse_gslam_tpu.ops import matching
    from sparse_gslam_tpu.ops.grid import precompute_pyramid
    from sparse_gslam_tpu.utils import se2

    z = np.load(args.case)
    probs = jnp.asarray(z["probs"])
    origin = np.asarray(z["origin"])
    res = float(z["resolution"])
    query = np.asarray(z["query"])
    init_theta = float(z["init_theta"]) if "init_theta" in z else 0.0

    score_grid = precompute_pyramid(probs, 1)[0]
    spec = matching.search_spec(
        5.0, 1.0, float(np.linalg.norm(query, axis=1).max()), res
    )
    score, pose, cov = matching.match_submap(
        score_grid, jnp.asarray(origin), res, query, init_theta, spec
    )
    verdict = "MATCH" if score > args.min_score else "no match"
    print(f"score={score:.4f} ({verdict}, min={args.min_score})")
    print(f"pose=({pose[0]:.3f}, {pose[1]:.3f}, {pose[2]:.4f} rad)")
    print(f"cov diag={np.diag(cov)}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(probs)
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(
        np.where(img > 0, 1 - img, 0.5).T, origin="lower", cmap="gray",
        vmin=0, vmax=1,
    )
    aligned = se2.apply(pose, query)
    cells = (aligned - origin) / res
    ax.scatter(cells[:, 0], cells[:, 1], s=3, c="red")
    ax.set_title(f"score {score:.3f}")
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"plot -> {args.out}")


if __name__ == "__main__":
    main()
