"""Re-base a .result trajectory onto a raw log's timestamps by
interpolating with raw odometry: the fixlog.py equivalent (reference:
datasets/fixlog.py:1-62, which uses spatialmath SE2 composition).

For every raw-log frame whose timestamp is missing from the .result,
the nearest earlier result pose is advanced by the raw relative
odometry between the two timestamps.

Usage: python scripts/fixlog.py <dataset_dir> <name> [--provider carmen]
Writes <dir>/<name>.fixed.result.
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
    ap.add_argument("dataset_dir")
    ap.add_argument("name")
    ap.add_argument("--provider", default="carmen")
    args = ap.parse_args()

    from sparse_gslam_tpu.eval.relations import load_result
    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.io.result_writer import write_result_line
    from sparse_gslam_tpu.utils import se2

    prefix = os.path.join(args.dataset_dir, args.name)
    rtimes, rposes = load_result(prefix + ".result")
    order = np.argsort(rtimes)
    rtimes, rposes = rtimes[order], rposes[order]

    frames = list(
        create_data_provider(args.provider, prefix + ".log").frames()
    )
    out = prefix + ".fixed.result"
    with open(out, "w") as f:
        for fr in frames:
            i = np.searchsorted(rtimes, fr.time, side="right") - 1
            i = max(i, 0)
            base = rposes[i]
            # advance by raw odometry between the matched stamps
            j = min(
                range(len(frames)),
                key=lambda k: abs(frames[k].time - rtimes[i]),
            )
            delta = se2.relative(frames[j].pose, fr.pose)
            write_result_line(f, se2.compose(base, delta), fr.time)
    print(f"wrote {out} ({len(frames)} lines)")


if __name__ == "__main__":
    main()
