import numpy as np

from sparse_gslam_tpu.ops.lines import extract_lines_any
from sparse_gslam_tpu.utils.config import ExtractorConfig
from test_lines import make_box_points


def cfg(algorithm, **kw):
    base = dict(
        outlier_dist=0.1,
        min_split_dist=0.1,
        max_line_gap=0.6,
        min_line_length=0.5,
        min_line_points=10,
        cluster_threshold=100.0,
        algorithm=algorithm,
    )
    base.update(kw)
    return ExtractorConfig(**base)


def gt_recovered(segments, segs_gt, tol=0.2):
    from sparse_gslam_tpu.ops.line_geometry import topolar

    hits = 0
    for (a, b) in segs_gt:
        gt = topolar(np.array(a, dtype=float), np.array(b, dtype=float))
        best = min(
            abs(rt[0] - gt[0]) + abs(np.sin(rt[1] - gt[1]))
            for rt in segments.rhotheta
        )
        if best < tol:
            hits += 1
    return hits


class TestSMF:
    def test_recovers_box(self):
        pts, segs = make_box_points(noise=0.02, per_seg=60)
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines_any(pts, covs, cfg("smf"))
        assert out.n >= 3
        assert gt_recovered(out, segs) >= 3

    def test_covariance_psd(self):
        pts, _ = make_box_points(noise=0.02)
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines_any(pts, covs, cfg("smf"))
        for c in out.cov:
            assert np.all(np.linalg.eigvalsh(c) >= -1e-12)

    def test_endpoints_on_line(self):
        pts, _ = make_box_points(noise=0.02)
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines_any(pts, covs, cfg("smf"))
        for k in range(out.n):
            nrm = np.array(
                [np.cos(out.rhotheta[k, 1]), np.sin(out.rhotheta[k, 1])]
            )
            assert abs(out.start[k] @ nrm - out.rhotheta[k, 0]) < 1e-9


class TestHough:
    def test_recovers_box(self):
        pts, segs = make_box_points(noise=0.02, per_seg=80)
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines_any(pts, covs, cfg("hough"))
        assert out.n >= 3
        assert gt_recovered(out, segs, tol=0.3) >= 3

    def test_empty_input(self):
        out = extract_lines_any(
            np.zeros((0, 2)), np.zeros((0, 2, 2)), cfg("hough")
        )
        assert out.n == 0


class TestDispatch:
    def test_unknown_raises(self):
        import pytest

        with pytest.raises(ValueError):
            extract_lines_any(
                np.zeros((5, 2)), np.zeros((5, 2, 2)), cfg("nope")
            )
