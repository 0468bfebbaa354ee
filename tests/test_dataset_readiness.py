"""intel-lab + mit-killian day-one readiness (VERDICT r2 item 7).

Same pattern as tests/test_aces_readiness.py, extended to the other
two headline datasets: the reference's OWN per-dataset YAML families
(read verbatim from the reference checkout, including a multi-beam
pair slam-4 + slam-60 for intel-lab) must parse into this engine's
config, and a one-command runner invocation on a CARMEN log staged in
the real datasets' shape must produce a .result + timing files.
Reference configs: src/sparse_gslam/datasets/intel-lab/slam-4.yaml,
slam-60.yaml; mit-killian/slam-11.yaml.
"""
import os
import shutil

import numpy as np
import pytest

REF = "/root/reference/src/sparse_gslam/datasets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF),
    reason="reference checkout not available",
)


def _stage(tmp_path_factory, ref_name, name, yaml_postfixes, n_beams):
    d = tmp_path_factory.mktemp(ref_name + "_layout") / ref_name
    d.mkdir()
    for pf in yaml_postfixes:
        shutil.copy(
            os.path.join(REF, ref_name, f"slam{pf}.yaml"),
            d / f"slam{pf}.yaml",
        )
    shutil.copy(
        os.path.join(REF, ref_name, "line_extractor.yaml"),
        d / "line_extractor.yaml",
    )
    from sparse_gslam_tpu.eval.relations import save_relations
    from sparse_gslam_tpu.eval.simulate import (
        SimConfig,
        make_relations,
        simulate,
        write_carmen_log,
    )

    cfg = SimConfig(n_beams=n_beams, seed=11, range_max=8.0)
    sim = simulate(cfg)
    for k in ("times", "odom", "gt"):
        sim[k] = sim[k][:420]
    sim["scans"] = sim["scans"][:420]
    write_carmen_log(str(d / f"{name}.log"), sim)
    t1, t2, rel = make_relations(sim)
    save_relations(str(d / f"{name}.relations"), t1, t2, rel)
    return d


@pytest.fixture(scope="module")
def intel_dir(tmp_path_factory):
    # intel-lab ships SICK logs with 180 beams; the yaml family
    # subsamples to 4..60
    return _stage(
        tmp_path_factory, "intel-lab", "intel-lab",
        ["-4", "-11", "-60"], 180,
    )


@pytest.fixture(scope="module")
def killian_dir(tmp_path_factory):
    return _stage(
        tmp_path_factory, "mit-killian", "mit-killian", ["-11"], 180
    )


class TestIntelLabReadiness:
    def test_yaml_family_parses_verbatim(self, intel_dir):
        from sparse_gslam_tpu.utils.config import load_dataset_config

        slam4, ls = load_dataset_config(str(intel_dir), "-4")
        assert slam4.scan_size == 4
        assert slam4.range_max == 5.0
        assert slam4.loop_closing_threads == 8
        assert slam4.max_match_distance == 15.0
        slam60, _ = load_dataset_config(str(intel_dir), "-60")
        assert slam60.scan_size == 60
        assert slam60.std_r == 0.25
        slam11, _ = load_dataset_config(str(intel_dir), "-11")
        assert slam11.scan_size == 11

    @pytest.mark.parametrize("postfix", ["-4", "-60"])
    def test_one_command_run(self, intel_dir, postfix):
        """Both ends of the beam-count family run end-to-end (the
        sweep axis of the reference's Table I, gen_acc_table.py)."""
        from sparse_gslam_tpu.runner import main

        rc = main(
            [
                "--dataset-dir", str(intel_dir),
                "--dataset-name", "intel-lab",
                f"--postfix={postfix}",
                "--eval",
                "--max-frames", "300",
            ]
        )
        assert rc == 0
        from sparse_gslam_tpu.eval.relations import load_result

        times, poses = load_result(str(intel_dir / "intel-lab.result"))
        assert len(times) > 50
        assert np.isfinite(poses).all()


class TestMitKillianReadiness:
    def test_yaml_parses_verbatim(self, killian_dir):
        from sparse_gslam_tpu.utils.config import load_dataset_config

        slam, ls = load_dataset_config(str(killian_dir), "-11")
        assert slam.scan_size == 11
        assert slam.landmark_max_gap == 5.0
        assert slam.std_w == 2.0

    def test_one_command_run(self, killian_dir):
        from sparse_gslam_tpu.runner import main

        rc = main(
            [
                "--dataset-dir", str(killian_dir),
                "--dataset-name", "mit-killian",
                "--postfix=-11",
                "--eval",
            ]
        )
        assert rc == 0
        from sparse_gslam_tpu.eval.relations import load_result

        times, poses = load_result(
            str(killian_dir / "mit-killian.result")
        )
        assert len(times) > 100
        assert np.isfinite(poses).all()
        for ext in (".ftime", ".btime", ".dtime"):
            assert (killian_dir / f"mit-killian{ext}").exists()
