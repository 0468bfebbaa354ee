"""Raw-odometry ATE baseline for a dataset (the number SLAM must beat).

Replays the log's odometry poses as the trajectory and scores them
against the .relations ground truth with the same relations-ATE metric
as the SLAM runs -- the honest lower bar for every accuracy table row
(round-1 advice: report the odometry baseline next to every SLAM
number).

    python scripts/odom_baseline.py datasets/sim-office sim-office
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    dataset_dir, name = sys.argv[1], sys.argv[2]
    from sparse_gslam_tpu.eval.relations import evaluate_files
    from sparse_gslam_tpu.io.providers import create_data_provider

    provider = create_data_provider(
        "carmen", os.path.join(dataset_dir, f"{name}.log")
    )
    out = f"/tmp/odom_{name}.result"
    with open(out, "w") as f:
        for fr in provider.frames():
            p = fr.pose
            # minimal FLASER .result line (load_result's format):
            # FLASER 0 <corr x y th> <odom x y th> <time>
            f.write(
                f"FLASER 0 {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {fr.time:.6f}\n"
            )
    res = evaluate_files(
        out, os.path.join(dataset_dir, f"{name}.relations")
    )
    print(f"{name} raw odometry: {res}")


if __name__ == "__main__":
    main()
