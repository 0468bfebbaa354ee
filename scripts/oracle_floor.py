"""Relations-ATE noise floor: perfect keyframe poses, real odometry.

Quantifies the irreducible part of the sim-world ATE (VERDICT r1 weak
#4): the `.result` trajectory is piecewise dead-reckoned -- a keyframe
pose followed by raw noisy odometry until the next keyframe
(io/result_writer.py, mirroring log_runner.cpp:26-34). Even an oracle
that estimates every keyframe pose EXACTLY therefore carries the
odometry noise of the intra-keyframe windows plus the keyframe
time-quantization error into the relations metric. This script runs
the frontend only (to get the actual keyframe times + odometry
windows the real system produces), substitutes ground-truth poses at
every keyframe, writes a `.result`, and evaluates it with the same
relations metric -- the floor any estimator with this output format
can reach on the dataset.

Usage: python scripts/oracle_floor.py datasets/sim-office sim-office
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from sparse_gslam_tpu.eval.closures import interp_gt, load_gt
from sparse_gslam_tpu.eval.relations import evaluate_files
from sparse_gslam_tpu.io.providers import create_data_provider
from sparse_gslam_tpu.io.result_writer import write_trajectory
from sparse_gslam_tpu.models.slam import SlamSystem
from sparse_gslam_tpu.utils.config import load_dataset_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_dir")
    ap.add_argument("name")
    args = ap.parse_args()

    slam_cfg, ls_cfg = load_dataset_config(args.dataset_dir)
    log_path = os.path.join(args.dataset_dir, f"{args.name}.log")
    provider = create_data_provider(slam_cfg.data_provider, log_path)
    # frontend only: keyframing + odometry windows, no loop closures
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=False)
    for frame in provider.frames():
        system.process_frame(frame)

    gt_times, gt_poses = load_gt(
        os.path.join(args.dataset_dir, f"{args.name}.gt")
    )
    kfs = system.frontend.keyframes
    # oracle: every keyframe pose is ground truth at its timestamp
    est = np.stack(
        [interp_gt(gt_times, gt_poses, k.odom_times[0]) for k in kfs]
    )
    odom = [(k.odom_times, k.odom_dposes) for k in kfs]
    out = os.path.join(args.dataset_dir, f"{args.name}-oracle.result")
    write_trajectory(out, est, odom, len(kfs), est)

    res = evaluate_files(
        out, os.path.join(args.dataset_dir, f"{args.name}.relations")
    )
    print(f"{args.name} oracle floor ({len(kfs)} GT keyframes): {res}")


if __name__ == "__main__":
    main()
