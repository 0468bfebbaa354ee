"""Run one dataset end-to-end with config overrides; print one JSON line.

Ablation driver for accuracy work (used by the RESULTS.md error-budget
experiments): any SlamConfig field can be overridden from the command
line, so variants run side by side without editing dataset yamls.

    python scripts/eval_config.py datasets/sim-office sim-office \
        local_refine_sigma_th=0.04 local_refine_hops=1
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def parse_val(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            pass
    if s in ("true", "True"):
        return True
    if s in ("false", "False"):
        return False
    return s


def main():
    dataset_dir, name = sys.argv[1], sys.argv[2]
    overrides = dict(
        (k, parse_val(v))
        for k, v in (a.split("=", 1) for a in sys.argv[3:])
    )
    from sparse_gslam_tpu.eval.relations import evaluate_files
    from sparse_gslam_tpu.io.providers import create_data_provider
    from sparse_gslam_tpu.models.slam import SlamSystem
    from sparse_gslam_tpu.utils.config import load_dataset_config

    slam_cfg, ls_cfg = load_dataset_config(dataset_dir)
    for k, v in overrides.items():
        if not hasattr(slam_cfg, k):
            raise SystemExit(f"unknown config field {k}")
        setattr(slam_cfg, k, v)
    provider = create_data_provider(
        slam_cfg.data_provider, os.path.join(dataset_dir, f"{name}.log")
    )
    system = SlamSystem(slam_cfg, ls_cfg, enable_backend=True)
    for frame in provider.frames():
        system.process_frame(frame)
    system.final_cleanup()
    out = os.path.join("/tmp", f"eval_{name}_{os.getpid()}.result")
    system.write_result(out)
    res = evaluate_files(
        out, os.path.join(dataset_dir, f"{name}.relations")
    )
    from sparse_gslam_tpu.eval.relations import evaluate_per_separation

    persep = evaluate_per_separation(
        out, os.path.join(dataset_dir, f"{name}.relations")
    )
    b = system.backend
    pr = None
    gt_path = os.path.join(dataset_dir, f"{name}.gt")
    if os.path.exists(gt_path) and b.closures:
        from sparse_gslam_tpu.eval.closures import closure_pr, load_gt

        gt_times, gt_poses = load_gt(gt_path)
        kfs = system.frontend.keyframes
        triples = [
            (kfs[c.i].odom_times[0], kfs[c.j].odom_times[0], c.meas)
            for c in b.closures
            if c.active and not c.suppressed and c.kind == "loop"
        ]
        infos = [
            c.info
            for c in b.closures
            if c.active and not c.suppressed and c.kind == "loop"
        ]
        pr = closure_pr(
            triples, gt_times, gt_poses,
            match_radius=max(6.0, slam_cfg.max_match_distance + 2.0),
            infos=infos,
        )
    print(
        json.dumps(
            {
                "dataset": name,
                "overrides": overrides,
                "trans": round(res.trans_mean, 4),
                "per_sep": {k: round(v[0], 4) for k, v in persep.items()},
                "trans_std": round(res.trans_std, 4),
                "rot_deg": round(float(__import__("numpy").degrees(res.rot_mean)), 3),
                "closures": b.closure_count,
                "suppressed": b.suppressed_closure_count,
                "local_edges": b.local_edge_count,
                "local_stats": b.local_stats,
                "kf_edges": b.kf_edge_count,
                "kf_stats": b.kf_stats,
                "pr": pr,
            }
        )
    )


if __name__ == "__main__":
    main()
