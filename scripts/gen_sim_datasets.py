"""Generate the synthetic evaluation datasets (CARMEN logs + Freiburg
.relations ground truth + per-dataset config YAMLs) under datasets/.

The reference evaluates on aces / intel-lab / mit-killian, which its
download.sh fetches from the web; in this zero-egress environment the
equivalent quantitative benchmarks are simulated worlds with exact
ground truth. Three difficulty tiers mirror the reference's spread:

  sim-office   aces-like:       medium rooms, 2 laps, moderate noise
  sim-loops    intel-lab-like:  many loop closures, 3 laps
  sim-corridor mit-killian-like: long corridors, sparse features

Usage: python scripts/gen_sim_datasets.py [out_root]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"  # CPU tool; never grab the TPU tunnel
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

from sparse_gslam_tpu.eval.simulate import (
    SimConfig,
    generate_dataset,
    killian_waypoints,
    killian_world,
    rect_room_world,
)


def corridor_world():
    """Long-corridor world (mit-killian flavor)."""
    w = []

    def strip(x0, y0, x1, y1):
        w.extend(
            [((x0, y0), (x1, y0)), ((x1, y1), (x0, y1))]
        )

    # a large rectangular loop of corridors, 3m wide
    strip(0, 0, 60, 3)
    strip(57, 3, 60, 30)
    w.append(((57, 3), (57, 27)))
    w.append(((60, 0), (60, 30)))
    strip(0, 27, 57, 30)
    w.append(((0, 0), (0, 30)))
    w.append(((3, 3), (3, 27)))
    # some clutter for loop closures to latch on
    w.append(((15, 0.5), (15, 1.2)))
    w.append(((30, 2.0), (31, 2.0)))
    w.append(((45, 0.8), (45, 1.6)))
    w.append(((58, 10), (59, 10)))
    w.append(((20, 28.5), (21, 28.5)))
    return np.array(w, dtype=np.float64)


def corridor_waypoints():
    return np.array(
        [(5, 1.5), (30, 1.5), (55, 1.5), (58.5, 5), (58.5, 15),
         (58.5, 25), (55, 28.5), (30, 28.5), (5, 28.5), (1.5, 25),
         (1.5, 15), (1.5, 5), (5, 1.5), (30, 1.5), (55, 1.5)],
        dtype=np.float64,
    )


SLAM_YAML = """\
std_x: 0.2
std_y: 1.0
std_w: 1.0
std_r: 0.05
angle_min: -1.5707963267948966
angle_max: 1.5707963267948966
range_min: 0.0
range_max: {range_max}
scan_size: {scan_size}
multicloud_size: {multicloud_size}
landmark_max_gap: 0.5
landmark_max_dist: 10.0
landmark_assoc_thresh: 0.5
last_traj_length: 5.0
loop_closure_min_score: 0.7
angular_search_window: 1.0
linear_search_window: 5.0
branch_and_bound_depth: 5
hit_probability: 0.7
miss_probability: 0.4
max_match_distance: 10.0
submap_resolution: 0.1
submap_trajectory_length: 6.0
submap_overlap_poses: 0
last_submap_not_match: 3
loop_closing_threads: 8
dcs_phi: 10.0
match_interval: 25
data_provider: carmen
visualize_rate: 2
map_resolution: 0.1
"""

LS_YAML = """\
max_line_gap: 0.25
min_line_length: 0.5
min_split_dist: 0.1
outlier_dist: 0.1
min_line_points: 10
rmse_thresh: 0.1
cluster_threshold: 100.0
"""


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets",
    )
    specs = {
        "sim-office": dict(
            cfg=SimConfig(
                n_beams=180, range_max=10.0, laps=2, seed=2,
                odom_trans_noise=0.02, odom_rot_noise=0.015,
            ),
            scan_size=11, multicloud_size=176,
        ),
        "sim-loops": dict(
            cfg=SimConfig(
                n_beams=180, range_max=10.0, laps=3, seed=5,
                odom_trans_noise=0.025, odom_rot_noise=0.02,
            ),
            scan_size=11, multicloud_size=176,
        ),
        "sim-killian": dict(
            cfg=SimConfig(
                n_beams=180, range_max=10.0, laps=2, seed=13,
                odom_trans_noise=0.015, odom_rot_noise=0.01,
            ),
            scan_size=11, multicloud_size=176,
            walls=killian_world(), waypoints=killian_waypoints(),
        ),
        "sim-corridor": dict(
            cfg=SimConfig(
                n_beams=180, range_max=10.0, laps=1, seed=9,
                odom_trans_noise=0.02, odom_rot_noise=0.012,
            ),
            scan_size=11, multicloud_size=176,
            walls=corridor_world(), waypoints=corridor_waypoints(),
        ),
    }
    for name, spec in specs.items():
        out = os.path.join(root, name)
        os.makedirs(out, exist_ok=True)
        cfg = spec["cfg"]
        from sparse_gslam_tpu.eval.simulate import simulate, write_carmen_log
        from sparse_gslam_tpu.eval.relations import save_relations
        from sparse_gslam_tpu.eval.simulate import make_relations

        sim = simulate(
            cfg, walls=spec.get("walls"), waypoints=spec.get("waypoints")
        )
        write_carmen_log(os.path.join(out, f"{name}.log"), sim)
        t1, t2, rel = make_relations(sim)
        save_relations(os.path.join(out, f"{name}.relations"), t1, t2, rel)
        from sparse_gslam_tpu.eval.closures import save_gt

        save_gt(os.path.join(out, f"{name}.gt"), sim["times"], sim["gt"])
        with open(os.path.join(out, "slam.yaml"), "w") as f:
            f.write(
                SLAM_YAML.format(
                    range_max=cfg.range_max,
                    scan_size=spec["scan_size"],
                    multicloud_size=spec["multicloud_size"],
                )
            )
        with open(os.path.join(out, "line_extractor.yaml"), "w") as f:
            f.write(LS_YAML)
        print(
            f"{name}: {len(sim['times'])} frames, "
            f"{sim['times'][-1]:.0f}s, {len(t1)} relations"
        )


if __name__ == "__main__":
    main()
