import numpy as np

from sparse_gslam_tpu.ops.lines import extract_lines, fit_line_with_cov
from sparse_gslam_tpu.utils.config import ExtractorConfig


rng = np.random.default_rng(7)


def make_box_points(noise=0.03, per_seg=60, seed=0):
    """4 ground-truth segments like the reference's synthetic test
    (ls_test.cpp:48-96)."""
    r = np.random.default_rng(seed)
    segs = [
        ((-2.0, -1.5), (2.0, -1.5)),
        ((2.0, -1.5), (2.0, 1.5)),
        ((2.0, 1.5), (-2.0, 1.5)),
        ((-2.0, -0.5), (-2.0, 1.0)),
    ]
    pts = []
    for (x0, y0), (x1, y1) in segs:
        t = np.sort(r.uniform(0, 1, per_seg))
        p = np.stack([x0 + t * (x1 - x0), y0 + t * (y1 - y0)], 1)
        nvec = np.array([-(y1 - y0), x1 - x0]) / np.hypot(x1 - x0, y1 - y0)
        pts.append(p + nvec[None, :] * r.normal(0, noise, (per_seg, 1)))
    pts = np.concatenate(pts)
    r.shuffle(pts)
    return pts, segs


DEFAULT = ExtractorConfig(
    outlier_dist=0.1,
    min_split_dist=0.1,
    max_line_gap=0.6,
    min_line_length=0.5,
    min_line_points=10,
    cluster_threshold=100.0,
)


class TestFit:
    def test_fit_exact_line(self):
        # points exactly on x cos t + y sin t = rho
        rho, th = 2.0, 0.6
        d = np.array([-np.sin(th), np.cos(th)])
        base = rho * np.array([np.cos(th), np.sin(th)])
        pts = base + np.linspace(-1, 1, 30)[:, None] * d
        covs = np.tile(np.eye(2) * 1e-4, (30, 1, 1))
        rt, cov = fit_line_with_cov(pts, covs)
        np.testing.assert_allclose(rt, [rho, th], atol=1e-9)
        assert np.all(np.linalg.eigvalsh(cov) >= 0)

    def test_fit_cov_scales_with_noise(self):
        rho, th = 1.5, -0.4
        d = np.array([-np.sin(th), np.cos(th)])
        base = rho * np.array([np.cos(th), np.sin(th)])
        pts = base + np.linspace(-1, 1, 50)[:, None] * d
        c_small = np.tile(np.eye(2) * 1e-4, (50, 1, 1))
        c_big = np.tile(np.eye(2) * 1e-2, (50, 1, 1))
        _, cov_s = fit_line_with_cov(pts, c_small)
        _, cov_b = fit_line_with_cov(pts, c_big)
        np.testing.assert_allclose(cov_b, cov_s * 100, rtol=1e-6, atol=1e-15)

    def test_fit_cov_monte_carlo(self):
        """Propagated covariance must match the empirical estimator
        covariance (validates smc.cpp:52-67 Jacobian math)."""
        rho, th = 1.0, 0.3
        d = np.array([-np.sin(th), np.cos(th)])
        base = rho * np.array([np.cos(th), np.sin(th)])
        t = np.linspace(-1, 1, 40)
        pts0 = base + t[:, None] * d
        sigma = 0.02
        covs = np.tile(np.eye(2) * sigma**2, (40, 1, 1))
        _, cov_pred = fit_line_with_cov(pts0, covs)
        fits = []
        r = np.random.default_rng(1)
        for _ in range(3000):
            noisy = pts0 + r.normal(0, sigma, pts0.shape)
            rt, _ = fit_line_with_cov(noisy, covs)
            fits.append(rt)
        emp = np.cov(np.stack(fits).T)
        np.testing.assert_allclose(cov_pred, emp, rtol=0.25, atol=5e-7)

    def test_fit_masked_matches_dense(self):
        pts = rng.uniform(-2, 2, (20, 2))
        covs = np.tile(np.eye(2) * 0.01, (20, 1, 1))
        rt_d, cov_d = fit_line_with_cov(pts[:15], covs[:15])
        mask = np.arange(20) < 15
        rt_m, cov_m = fit_line_with_cov(pts, covs, mask=mask)
        np.testing.assert_allclose(rt_m, rt_d, atol=1e-9)
        np.testing.assert_allclose(cov_m, cov_d, atol=1e-9)

    def test_fit_jax_matches_numpy(self):
        import jax.numpy as jnp

        pts = rng.uniform(-2, 2, (25, 2))
        covs = np.tile(np.eye(2) * 0.01, (25, 1, 1))
        rt_np, cov_np = fit_line_with_cov(pts, covs)
        rt_j, cov_j = fit_line_with_cov(jnp.array(pts), jnp.array(covs))
        np.testing.assert_allclose(rt_j, rt_np, atol=1e-5)
        np.testing.assert_allclose(cov_j, cov_np, rtol=5e-3, atol=1e-6)


class TestExtract:
    def test_recovers_box_lines(self):
        pts, segs = make_box_points()
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines(pts, covs, DEFAULT)
        assert out.n >= 4
        # every ground-truth wall must be covered by some extracted
        # segment with matching (rho, theta) up to the normal-flip
        gt_rts = []
        from sparse_gslam_tpu.ops.line_geometry import topolar

        for (a, b) in segs:
            gt_rts.append(topolar(np.array(a), np.array(b)))
        for gt in gt_rts:
            best = min(
                min(
                    abs(rt[0] - gt[0]) + abs(np.sin(rt[1] - gt[1]))
                    for rt in out.rhotheta
                ),
                1e9,
            )
            assert best < 0.15, f"wall {gt} not recovered"

    def test_endpoints_on_fitted_line(self):
        pts, _ = make_box_points()
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines(pts, covs, DEFAULT)
        for i in range(out.n):
            nrm = np.array(
                [np.cos(out.rhotheta[i, 1]), np.sin(out.rhotheta[i, 1])]
            )
            assert abs(out.start[i] @ nrm - out.rhotheta[i, 0]) < 1e-9
            assert abs(out.end[i] @ nrm - out.rhotheta[i, 0]) < 1e-9

    def test_min_points_filter(self):
        pts = rng.uniform(-1, 1, (5, 2))
        covs = np.tile(np.eye(2) * 0.01, (5, 1, 1))
        out = extract_lines(pts, covs, DEFAULT)
        assert out.n == 0

    def test_outlier_rejected(self):
        # one far outlier inside a clean line should be dropped, and the
        # line still extracted as one segment
        th = np.pi / 2
        pts = np.stack([np.linspace(-1, 1, 30), np.full(30, 2.0)], 1)
        pts[15] = [0.02, 3.5]  # outlier off the line y=2
        covs = np.tile(np.eye(2) * 0.01, (len(pts), 1, 1))
        out = extract_lines(pts, covs, DEFAULT)
        assert out.n == 1
        assert abs(out.rhotheta[0, 0] - 2.0) < 0.05
        assert abs(np.sin(out.rhotheta[0, 1] - th)) < 0.05

    def test_gap_splits(self):
        xs = np.concatenate([np.linspace(-3, -1, 25), np.linspace(1, 3, 25)])
        pts = np.stack([xs, np.full(50, 1.0)], 1)
        covs = np.tile(np.eye(2) * 0.001, (50, 1, 1))
        p = ExtractorConfig(
            outlier_dist=0.1,
            min_split_dist=0.1,
            max_line_gap=0.5,
            min_line_length=0.5,
            min_line_points=5,
            cluster_threshold=100.0,
        )
        out = extract_lines(pts, covs, p)
        assert out.n == 2

    def test_merge_correct_mode_fuses(self):
        xs = np.concatenate([np.linspace(-2, -0.1, 30), np.linspace(0.1, 2, 30)])
        r = np.random.default_rng(3)
        pts = np.stack([xs, 1.0 + r.normal(0, 0.01, 60)], 1)
        covs = np.tile(np.eye(2) * 0.0001, (60, 1, 1))
        p_ref = ExtractorConfig(
            min_line_points=5, max_line_gap=0.5, merge_mode="reference",
            cluster_threshold=100.0,
        )
        p_cor = ExtractorConfig(
            min_line_points=5, max_line_gap=0.5, merge_mode="correct",
            cluster_threshold=100.0,
        )
        out_ref = extract_lines(pts, covs, p_ref)
        out_cor = extract_lines(pts, covs, p_cor)
        # a small gap < max_line_gap never splits, so force a split first
        # by bending: this test just asserts correct-mode <= reference-mode
        assert out_cor.n <= out_ref.n

    def test_clustering_splits_far_groups(self):
        a = np.stack([np.linspace(0, 2, 20), np.zeros(20)], 1)
        b = a + np.array([100.0, 100.0])
        pts = np.concatenate([a, b])
        covs = np.tile(np.eye(2) * 0.001, (40, 1, 1))
        p = ExtractorConfig(
            min_line_points=5, cluster_threshold=5.0, min_line_length=0.5
        )
        out = extract_lines(pts, covs, p)
        assert out.n == 2
