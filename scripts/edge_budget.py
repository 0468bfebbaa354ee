"""Per-edge-kind error budget vs ground truth.

Runs one sim dataset end-to-end, then compares every accepted pose-graph
edge's measurement (loop closures, submap chain edges, per-keyframe
pins, and the odometry chain itself) against the ground-truth relative
pose of its endpoints. Reports, per edge kind: count, RMS translational
/ rotational measurement error, and the ratio between the actual error
and the sigma the graph was told (info = inv(cov)) -- the calibration
of each edge family. This names the dominant term of the remaining ATE
(VERDICT r2 next-step #1).

    python scripts/edge_budget.py datasets/sim-office sim-office [k=v...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402


def main():
    from scripts.eval_config import parse_val

    from sparse_gslam_tpu.eval.closures import interp_gt, load_gt
    from sparse_gslam_tpu.eval.relations import evaluate_files
    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.utils import se2
    from sparse_gslam_tpu.utils.config import load_dataset_config

    dataset_dir, name = sys.argv[1], sys.argv[2]
    overrides = dict(
        (k, parse_val(v)) for k, v in (a.split("=", 1) for a in sys.argv[3:])
    )
    slam_cfg, ls_cfg = load_dataset_config(dataset_dir)
    for k, v in overrides.items():
        setattr(slam_cfg, k, v)
    provider = create_data_provider(
        slam_cfg.data_provider, os.path.join(dataset_dir, f"{name}.log")
    )
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=True)
    for frame in provider.frames():
        system.process_frame(frame)
    system.final_cleanup()

    gt_times, gt_poses = load_gt(os.path.join(dataset_dir, f"{name}.gt"))
    b = system.backend
    kfs = system.frontend.keyframes

    def gt_pose(idx):
        return interp_gt(gt_times, gt_poses, kfs[idx].odom_times[0])

    stats = {}
    for c in b.closures:
        if not c.active or c.suppressed:
            continue
        rel_gt = se2.relative(gt_pose(c.i), gt_pose(c.j))
        err = se2.relative(rel_gt, c.meas)
        err[2] = se2.wrap_angle(err[2])
        cov = np.linalg.inv(c.info)
        sig = np.sqrt(np.diag(cov))
        # whitened error: err in the metric the graph actually uses
        chi = float(err @ c.info @ err)
        stats.setdefault(c.kind, []).append(
            (np.linalg.norm(err[:2]), abs(err[2]), sig[:2].mean(), sig[2], chi)
        )

    # odometry chain edges between consecutive keyframes
    od = []
    for idx in range(1, len(b.pg_poses)):
        rel_gt = se2.relative(gt_pose(idx - 1), gt_pose(idx))
        err = se2.relative(rel_gt, b.pg_meas[idx])
        err[2] = se2.wrap_angle(err[2])
        info = b.pg_info[idx]
        sig = np.sqrt(np.diag(np.linalg.inv(info)))
        od.append(
            (np.linalg.norm(err[:2]), abs(err[2]), sig[:2].mean(), sig[2],
             float(err @ info @ err))
        )
    stats["odom"] = od

    # keyframe pose error of the final estimate (the thing ATE measures)
    n = len(b.pg_poses)
    # align: the estimate frame = GT frame at kf 0 (sim datasets start at GT)
    pe = []
    for idx in range(n):
        err = se2.relative(gt_pose(idx), b.pg_poses[idx])
        err[2] = se2.wrap_angle(err[2])
        pe.append((np.linalg.norm(err[:2]), abs(err[2])))
    pe = np.array(pe)

    out = os.path.join("/tmp", f"budget_{name}_{os.getpid()}.result")
    system.write_result(out)
    res = evaluate_files(
        out, os.path.join(dataset_dir, f"{name}.relations")
    )

    report = {
        "dataset": name,
        "overrides": overrides,
        "trans": round(res.trans_mean, 4),
        "rot_deg": round(float(np.degrees(res.rot_mean)), 3),
        "kf_pose_err_rms": round(float(np.sqrt((pe[:, 0] ** 2).mean())), 4),
        "kf_pose_err_max": round(float(pe[:, 0].max()), 4),
        "kinds": {},
    }
    for kind, rows in stats.items():
        a = np.array(rows)
        report["kinds"][kind] = {
            "n": len(rows),
            "rms_t": round(float(np.sqrt((a[:, 0] ** 2).mean())), 4),
            "p90_t": round(float(np.quantile(a[:, 0], 0.9)), 4),
            "rms_r": round(float(np.sqrt((a[:, 1] ** 2).mean())), 4),
            "sigma_t_med": round(float(np.median(a[:, 2])), 4),
            "sigma_r_med": round(float(np.median(a[:, 3])), 4),
            "chi2_med": round(float(np.median(a[:, 4])), 2),
            "chi2_p90": round(float(np.quantile(a[:, 4], 0.9)), 2),
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
