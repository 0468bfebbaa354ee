"""Offline lab for the final joint landmark+pose solve.

Phase 1 (slow, once): run a sim dataset end-to-end with
SLAM_DUMP_JOINT to capture the solver inputs and the system's
keyframes for result writing.

Phase 2 (fast, repeatable): load the dump, run optimize_joint_graph
variants (iterations, info scalings), write a .result per variant and
score it with the relations metric -- measurement-first solver tuning
without re-running SLAM.

    python scripts/joint_lab.py capture datasets/sim-office sim-office
    python scripts/joint_lab.py solve datasets/sim-office sim-office \
        [iters=30] [obs_scale=1.0] [phi=10.0]
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


def dump_path(name):
    return f"/tmp/joint_{name}.npz"


def ckpt_path(name):
    return f"/tmp/joint_{name}.ckpt.npz"


def capture(dataset_dir, name):
    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.utils.checkpoint import save_checkpoint
    from sparse_gslam_tpu.utils.config import load_dataset_config

    os.environ["SLAM_DUMP_JOINT"] = dump_path(name)
    slam_cfg, ls_cfg = load_dataset_config(dataset_dir)
    provider = create_data_provider(
        slam_cfg.data_provider, os.path.join(dataset_dir, f"{name}.log")
    )
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=True)
    for frame in provider.frames():
        system.process_frame(frame)
    system.final_cleanup()
    save_checkpoint(ckpt_path(name), system)
    print(f"captured {dump_path(name)} + {ckpt_path(name)}")


def solve(dataset_dir, name, overrides):
    import jax.numpy as jnp

    from sparse_gslam_tpu.eval.relations import (
        evaluate_files,
        evaluate_per_separation,
    )
    from sparse_gslam_tpu.io.providers import create_data_provider  # noqa: F401
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.ops import solvers
    from sparse_gslam_tpu.utils.checkpoint import load_checkpoint
    from sparse_gslam_tpu.utils.config import load_dataset_config

    z = np.load(dump_path(name))
    iters = int(overrides.get("iters", 12))
    obs_scale = float(overrides.get("obs_scale", 1.0))
    odom_scale = float(overrides.get("odom_scale", 1.0))
    clo_scale = float(overrides.get("clo_scale", 1.0))
    phi = float(overrides.get("phi", 10.0))
    n = int(z["n"][0])

    odom_meas = z["odom_meas"].copy()
    odom_info = z["odom_info"] * odom_scale
    obs_valid = z["obs_valid"].copy()

    # chain=pg: replace raw odometry with the pose-graph chain
    # measurements (landmark-smoothed) + their infos from the ckpt
    if overrides.get("chain") == "pg":
        ck = np.load(ckpt_path(name))
        pgm, pgi = ck["pg_meas"], ck["pg_info"]
        odom_meas[1 : len(pgm)] = pgm[1:]
        odom_info[1 : len(pgi)] = pgi[1:] * odom_scale

    op, ol = z["obs_pose"], z["obs_lm"]
    # lm_min_span=k: keep only obs edges of landmarks whose observing
    # keyframes span >= k (the long-range couplings; short-span
    # landmarks' multicloud observations are correlated re-reads)
    if "lm_min_span" in overrides:
        k = int(overrides["lm_min_span"])
        for lid in np.unique(ol[obs_valid]):
            m = (ol == lid) & obs_valid
            if op[m].max() - op[m].min() < k:
                obs_valid[m] = False
    # lm_thin=k: keep every k-th observation of each landmark
    # (approximately independent multicloud windows)
    if "lm_thin" in overrides:
        k = int(overrides["lm_thin"])
        for lid in np.unique(ol[obs_valid]):
            idx = np.where((ol == lid) & obs_valid)[0]
            keep = idx[:: k]
            drop = np.setdiff1d(idx, keep)
            obs_valid[drop] = False

    g = solvers.JointGraphData(
        jnp.asarray(z["poses"]), jnp.asarray(z["pose_valid"]),
        jnp.asarray(z["pose_fixed"]), jnp.asarray(odom_meas),
        jnp.asarray(odom_info),
        jnp.asarray(z["odom_valid"]),
        jnp.asarray(z["lms"]), jnp.asarray(z["lm_valid"]),
        jnp.asarray(op), jnp.asarray(ol),
        jnp.asarray(z["obs_meas"]), jnp.asarray(z["obs_info"] * obs_scale),
        jnp.asarray(obs_valid), jnp.asarray(z["clo_i"]),
        jnp.asarray(z["clo_j"]), jnp.asarray(z["clo_meas"]),
        jnp.asarray(z["clo_info"] * clo_scale), jnp.asarray(z["clo_valid"]),
    )
    g_opt, chi2 = solvers.optimize_joint_graph(g, phi, iters)
    new_poses = np.asarray(g_opt.poses, np.float64)[:n]

    # rebuild the system (for keyframe odometry windows) and write the
    # trajectory with the solved poses
    slam_cfg, ls_cfg = load_dataset_config(dataset_dir)
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=True)
    load_checkpoint(ckpt_path(name), system)
    for k in range(min(n, len(system.backend.pg_poses))):
        system.backend.pg_poses[k] = new_poses[k]
    out = f"/tmp/jointlab_{name}_{os.getpid()}.result"
    system.write_result(out)
    rel = os.path.join(dataset_dir, f"{name}.relations")
    res = evaluate_files(out, rel)
    persep = evaluate_per_separation(out, rel)
    print(
        json.dumps(
            {
                "overrides": overrides,
                "chi2": round(float(chi2), 1),
                "trans": round(res.trans_mean, 4),
                "per_sep": {
                    k: round(v[0], 4) for k, v in persep.items()
                },
            }
        )
    )


def main():
    mode, dataset_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    overrides = dict(a.split("=", 1) for a in sys.argv[4:])
    if mode == "capture":
        capture(dataset_dir, name)
    else:
        solve(dataset_dir, name, overrides)


if __name__ == "__main__":
    main()
