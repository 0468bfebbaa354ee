"""Real-dataset day-one readiness (VERDICT r1 item 8).

The reference's headline logs (aces/intel-lab/mit-killian) cannot be
downloaded in this environment, but the moment they appear the parity
run must be exactly one command:

    python -m sparse_gslam_tpu.runner --dataset-dir datasets/aces \
        --dataset-name aces --postfix=-11 --eval

This test proves that path end-to-end today: it stages a dataset
directory in the reference's aces layout, with the reference's OWN
slam-11.yaml + line_extractor.yaml (read verbatim from the reference
checkout) and a synthetic CARMEN log shaped like the real aces file
(180-beam FLASER lines), then runs the full runner CLI on it.
"""
import os
import shutil

import numpy as np
import pytest

REF_ACES = "/root/reference/src/sparse_gslam/datasets/aces"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ACES),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def aces_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("aces_layout") / "aces"
    d.mkdir()
    # the reference's real configs, byte-for-byte
    shutil.copy(os.path.join(REF_ACES, "slam-11.yaml"), d / "slam-11.yaml")
    shutil.copy(
        os.path.join(REF_ACES, "line_extractor.yaml"),
        d / "line_extractor.yaml",
    )
    # a synthetic log in the real aces shape: 180-beam FLASER lines
    # (the aces SICK covers [-pi/2, +pi/2 - 1 step], range ~<= 50 m;
    # slam-11.yaml clips to range_max 5.0 and subsamples to 11 beams)
    from sparse_gslam_tpu.eval.simulate import (
        SimConfig,
        simulate,
        write_carmen_log,
        make_relations,
    )
    from sparse_gslam_tpu.eval.relations import save_relations

    cfg = SimConfig(n_beams=180, seed=7, range_max=8.0)
    sim = simulate(cfg)
    # truncate for speed: enough frames to form keyframes + submaps
    for k in ("times", "odom", "gt"):
        sim[k] = sim[k][:420]
    sim["scans"] = sim["scans"][:420]
    write_carmen_log(str(d / "aces.log"), sim)
    t1, t2, rel = make_relations(sim)
    save_relations(str(d / "aces.relations"), t1, t2, rel)
    return d


class TestAcesReadiness:
    def test_reference_yaml_parses_verbatim(self, aces_dir):
        from sparse_gslam_tpu.utils.config import load_dataset_config

        slam, ls = load_dataset_config(str(aces_dir), "-11")
        # spot-check the values the reference ships
        assert slam.scan_size == 11
        assert slam.range_max == 5.0
        assert slam.loop_closure_min_score == 0.55
        assert slam.dcs_phi == 10.0
        assert slam.multicloud_size == 176
        assert slam.submap_overlap_poses == 4
        assert ls.min_line_length == 0.75
        assert ls.min_line_points == 10

    def test_reference_gmapping_trajectories_parse(self):
        """VERDICT r4 #7: the reference ships real GMapping result
        trajectories in-tree (datasets/intel-lab/{30,45,60,180}pts.txt,
        datasets/aces/aces-30pts.txt -- the paper Table I baseline
        column). eval/relations.load_result must parse every one, so
        the acc-table comparator regenerates the instant real
        .relations files land (scripts/gen_acc_table.py trajectory
        rows)."""
        from sparse_gslam_tpu.eval.relations import load_result

        ref_root = "/root/reference/src/sparse_gslam/datasets"
        files = [
            ("intel-lab", "30pts.txt", 1051),
            ("intel-lab", "45pts.txt", 1051),
            ("intel-lab", "60pts.txt", 1051),
            ("intel-lab", "180pts.txt", 1051),
            ("aces", "aces-30pts.txt", 440),
            ("aces", "aces-60pts.txt", 440),
        ]
        for d, fname, n_lines in files:
            path = os.path.join(ref_root, d, fname)
            times, poses = load_result(path)
            assert len(times) == n_lines, (fname, len(times))
            assert poses.shape == (n_lines, 3)
            assert np.isfinite(poses).all(), fname
            # a real trajectory: finite extent, tens of meters
            ext = poses[:, :2].max(0) - poses[:, :2].min(0)
            assert 5.0 < max(ext) < 500.0, (fname, ext)

    def test_gen_acc_table_trajectory_rows(self, tmp_path):
        """The trajectory-row mode of scripts/gen_acc_table.py
        end-to-end: with a .relations file present the FLASER
        trajectory is scored in-process (paper-style baseline
        column); without one it reports the parsed span."""
        import subprocess
        import sys as _sys

        ref_root = "/root/reference/src/sparse_gslam/datasets"
        gm = os.path.join(ref_root, "intel-lab", "30pts.txt")
        out = subprocess.run(
            [
                _sys.executable, "scripts/gen_acc_table.py",
                f"{tmp_path}:intel-lab:gmapping-30:{gm}",
            ],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr
        assert "parsed 1051 poses" in out.stdout
        # now WITH ground truth: self-relations from the trajectory
        # itself -> near-zero ATE proves the scoring path runs
        from sparse_gslam_tpu.eval.relations import (
            load_result, save_relations,
        )
        from sparse_gslam_tpu.utils import se2

        times, poses = load_result(gm)
        order = np.argsort(times)
        times, poses = times[order], poses[order]
        t1, t2, gt = [], [], []
        for k in range(0, len(times) - 20, 40):
            t1.append(times[k])
            t2.append(times[k + 20])
            gt.append(se2.relative(poses[k], poses[k + 20]))
        save_relations(
            str(tmp_path / "intel-lab.relations"),
            np.asarray(t1), np.asarray(t2), np.asarray(gt),
        )
        out = subprocess.run(
            [
                _sys.executable, "scripts/gen_acc_table.py",
                f"{tmp_path}:intel-lab:gmapping-30:{gm}",
            ],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert out.returncode == 0, out.stderr
        assert "0.0000 ±" in out.stdout, out.stdout

    def test_one_command_parity_run(self, aces_dir):
        from sparse_gslam_tpu.runner import main

        rc = main(
            [
                "--dataset-dir", str(aces_dir),
                "--dataset-name", "aces",
                "--postfix=-11",
                "--eval",
            ]
        )
        assert rc == 0
        out = aces_dir / "aces.result"
        assert out.exists()
        from sparse_gslam_tpu.eval.relations import load_result

        times, poses = load_result(str(out))
        assert len(times) > 100
        assert np.isfinite(poses).all()
        # timing files in the reference's format
        for ext in (".ftime", ".btime", ".dtime"):
            assert (aces_dir / f"aces{ext}").exists()
