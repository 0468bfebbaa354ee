import numpy as np
import jax.numpy as jnp

from sparse_gslam_tpu.models.range_data import RangeData2D
from sparse_gslam_tpu.ops import grid as gridmod
from sparse_gslam_tpu.ops import matching
from sparse_gslam_tpu.ops.grid import GridSpec, build_submap_grid, precompute_pyramid
from sparse_gslam_tpu.utils import se2


def scan_table(n=45, fov=np.pi):
    a = np.linspace(-fov / 2, fov / 2, n)
    return np.stack([np.cos(a), np.sin(a)], 1), a


def wall_ranges(pose, angles, wall_x=4.0, range_max=8.0):
    th = pose[2] + angles
    with np.errstate(divide="ignore"):
        r = (wall_x - pose[0]) / np.cos(th)
    r = np.where((r > 0) & (np.abs(np.cos(th)) > 1e-6), r, np.inf)
    return np.minimum(r, range_max)


def make_wall_data(n_scans=10, range_max=8.0):
    """Scans of the wall x=4 from poses walking along y."""
    table, angles = scan_table()
    rd = RangeData2D()
    for i in range(n_scans):
        pose = np.array([0.0, 0.2 * i, 0.0])
        r = wall_ranges(pose, angles, range_max=range_max)
        rd.insert_scan(r, table, range_max, pose=pose)
    return rd


class TestGrid:
    def test_insert_marks_hits_and_misses(self):
        rd = make_wall_data()
        spec = GridSpec(size=128, resolution=0.1)
        sm = build_submap_grid(rd, spec)
        probs = np.asarray(sm.probs)
        origin = np.asarray(sm.origin)
        # cell at the wall should be occupied
        wall_cell = ((np.array([4.0, 1.0]) - origin) / 0.1).astype(int)
        assert probs[wall_cell[0], wall_cell[1]] > 0.5
        # cell midway along the ray should be free
        mid_cell = ((np.array([2.0, 1.0]) - origin) / 0.1).astype(int)
        assert 0 < probs[mid_cell[0], mid_cell[1]] < 0.5
        # far behind the sensors: unknown
        back_cell = ((np.array([-1.5, 1.0]) - origin) / 0.1).astype(int)
        if 0 <= back_cell[0] < 128:
            assert probs[back_cell[0], back_cell[1]] == 0.0

    def test_hits_beat_misses_within_scan(self):
        # a scan where one beam's ray passes the hit cell of another
        table = np.array([[1.0, 0.0], [np.cos(0.05), np.sin(0.05)]])
        rd = RangeData2D()
        rd.insert_scan(np.array([2.0, 6.0]), table, 8.0,
                       pose=np.zeros(3))
        spec = GridSpec(size=128, resolution=0.1)
        sm = build_submap_grid(rd, spec)
        probs = np.asarray(sm.probs)
        origin = np.asarray(sm.origin)
        hit_cell = ((np.array([2.0, 0.0]) - origin) / 0.1).astype(int)
        assert probs[hit_cell[0], hit_cell[1]] > 0.5

    def test_repeated_hits_increase_probability(self):
        table, angles = scan_table(5, fov=0.5)
        spec = GridSpec(size=128, resolution=0.1)
        vals = []
        for n in (1, 4):
            rd = RangeData2D()
            for _ in range(n):
                rd.insert_scan(
                    np.full(5, 3.0), table, 8.0, pose=np.zeros(3)
                )
            sm = build_submap_grid(rd, spec)
            probs = np.asarray(sm.probs)
            origin = np.asarray(sm.origin)
            c = ((np.array([3.0, 0.0]) - origin) / 0.1).astype(int)
            vals.append(probs[c[0], c[1]])
        assert vals[1] > vals[0] > 0.5
        assert vals[1] <= gridmod.PMAX + 1e-6

    def test_pyramid_upper_bounds(self):
        rd = make_wall_data()
        spec = GridSpec(size=128, resolution=0.1)
        sm = build_submap_grid(rd, spec)
        pyr = np.asarray(precompute_pyramid(sm.probs, 5))
        assert pyr.shape == (5, 128, 128)
        score0 = np.where(np.asarray(sm.probs) > 0, np.asarray(sm.probs),
                          gridmod.PMIN)
        # level 0 = 2x2 forward max
        assert pyr[0, 10, 10] == score0[10:12, 10:12].max()
        # higher levels dominate lower ones
        for d in range(1, 5):
            assert np.all(pyr[d] >= pyr[d - 1] - 1e-6)


def brute_force_scores(score_grid, origin, res, points, thetas, n_lin):
    """Direct evaluation of the candidate score volume."""
    size = score_grid.shape[0]
    R = len(thetas)
    W = 2 * n_lin + 1
    out = np.zeros((R, W, W))
    for k, th in enumerate(thetas):
        c, s = np.cos(th), np.sin(th)
        rp = points @ np.array([[c, s], [-s, c]])
        cells = np.floor((rp - origin) / res).astype(int)
        for i, ox in enumerate(range(-n_lin, n_lin + 1)):
            for j, oy in enumerate(range(-n_lin, n_lin + 1)):
                cx = cells[:, 0] + ox
                cy = cells[:, 1] + oy
                inb = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
                v = np.where(
                    inb,
                    score_grid[np.clip(cx, 0, size - 1),
                               np.clip(cy, 0, size - 1)],
                    gridmod.PMIN,
                )
                out[k, i, j] = v.mean()
    return out


class TestMatching:
    def _setup(self):
        rd = make_wall_data(n_scans=12)
        # add a second wall so the match is well-constrained in 2D
        table, angles = scan_table()
        for i in range(6):
            pose = np.array([0.3 * i, 3.0, -np.pi / 2])
            th = pose[2] + angles
            with np.errstate(divide="ignore"):
                r = (pose[1] - (-1.0)) / -np.sin(th)  # wall y=-1
            r = np.where((r > 0) & (np.abs(np.sin(th)) > 1e-6), r, np.inf)
            rd.insert_scan(np.minimum(r, 8.0), table, 8.0, pose=pose)
        spec = GridSpec(size=128, resolution=0.1)
        sm = build_submap_grid(rd, spec)
        pyr = precompute_pyramid(sm.probs, 5)
        return sm, pyr

    def test_fft_matches_brute_force(self):
        sm, pyr = self._setup()
        rng = np.random.default_rng(0)
        pts = np.column_stack(
            [np.full(40, 4.0), np.linspace(-0.5, 2.5, 40)]
        )
        pts = np.concatenate(
            [pts, np.column_stack([np.linspace(0, 2, 30), np.full(30, -1.0)])]
        )
        spec = matching.SearchSpec(
            n_angular=8, angular_step=0.02, n_linear=10, resolution=0.1
        )
        N = 128
        ptsb = np.zeros((N, 2), np.float32)
        ptsb[: len(pts)] = pts
        valid = np.arange(N) < len(pts)
        scores, thetas = matching.correlate_all(
            pyr[0], sm.origin, jnp.asarray(ptsb), jnp.asarray(valid),
            jnp.float32(0.0), jnp.float32(spec.angular_step),
            0.1, 8, 10, 128, 192,
        )
        ref = brute_force_scores(
            np.asarray(pyr[0]), np.asarray(sm.origin), 0.1, pts,
            np.asarray(thetas), 10,
        )
        np.testing.assert_allclose(np.asarray(scores), ref, atol=2e-4)

    def test_recovers_known_offset(self):
        sm, pyr = self._setup()
        # query: wall points offset by a known SE2 perturbation
        gt = np.array([0.6, -0.4, 0.15])
        base = np.concatenate(
            [
                np.column_stack([np.full(50, 4.0), np.linspace(-0.5, 2.5, 50)]),
                np.column_stack([np.linspace(0.0, 2.0, 40), np.full(40, -1.0)]),
            ]
        )
        # points as seen from a frame displaced by gt: p_query = T^-1 p
        query = se2.apply(se2.inverse(gt), base)
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        score, pose, cov = matching.match_submap(
            pyr[0], sm.origin, 0.1, query, 0.0, spec
        )
        # the coarse correlative match lands on the discretization
        # plateau around gt (exactly like the reference's B&B would);
        # the high-res refinement then tightens it
        assert score > 0.7
        np.testing.assert_allclose(pose[:2], gt[:2], atol=0.15)
        np.testing.assert_allclose(pose[2], gt[2], atol=0.07)
        assert np.all(np.linalg.eigvalsh(cov) > -1e-9)

        N = 128
        ptsb = np.zeros((N, 2), np.float32)
        ptsb[: len(query)] = query
        valid = np.arange(N) < len(query)
        refined = np.asarray(
            matching.refine_pose(
                sm.probs, sm.origin, 0.1, jnp.asarray(ptsb),
                jnp.asarray(valid), jnp.asarray(pose, dtype=jnp.float32),
            )
        )
        assert np.linalg.norm(refined[:2] - gt[:2]) < 0.12
        assert abs(refined[2] - gt[2]) < 0.05

    def test_refine_improves_pose(self):
        sm, _ = self._setup()
        gt = np.array([0.3, -0.2, 0.08])
        base = np.concatenate(
            [
                np.column_stack([np.full(50, 4.0), np.linspace(-0.5, 2.5, 50)]),
                np.column_stack([np.linspace(0.0, 2.0, 40), np.full(40, -1.0)]),
            ]
        )
        query = se2.apply(se2.inverse(gt), base)
        coarse = gt + np.array([0.08, -0.06, 0.02])  # off by < 1 cell
        N = 128
        ptsb = np.zeros((N, 2), np.float32)
        ptsb[: len(query)] = query
        valid = np.arange(N) < len(query)
        refined = matching.refine_pose(
            sm.probs, sm.origin, 0.1, jnp.asarray(ptsb),
            jnp.asarray(valid), jnp.asarray(coarse, dtype=jnp.float32),
        )
        refined = np.asarray(refined)
        assert np.linalg.norm(refined[:2] - gt[:2]) <= np.linalg.norm(
            coarse[:2] - gt[:2]
        ) + 1e-6

    def test_search_spec_buckets(self):
        s = matching.search_spec(5.0, 1.0, 7.0, 0.1)
        assert s.n_angular % 16 == 0
        assert s.n_linear == 50
        # reference formula (correlative_scan_matcher_2d.cc:39-43)
        import math

        step = (1 - 1e-3) * math.acos(1 - 0.1**2 / (2 * 49.0))
        assert abs(s.angular_step - step) < 1e-12
        assert s.n_angular >= math.ceil(1.0 / step)


class TestPrunedMatching:
    def test_pruned_matches_full_search(self):
        """Rotation pruning must be exact: same accepted match as the
        full FFT over every rotation."""
        sm, pyr = TestMatching()._setup()
        import jax.numpy as jnp
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        gt = np.array([0.4, -0.3, 0.1])
        base = np.concatenate(
            [
                np.column_stack([np.full(50, 4.0), np.linspace(-0.5, 2.5, 50)]),
                np.column_stack([np.linspace(0.0, 2.0, 40), np.full(40, -1.0)]),
            ]
        )
        query = se2.apply(se2.inverse(gt), base)
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        # full exhaustive
        s_full, p_full, _ = matching.match_submap(
            pyr5[0], sm.origin, 0.1, query, 0.0, spec
        )
        # pruned
        ci, s_pr, p_pr, cov = matching.match_candidates_pruned(
            [pyr5[0]], [pyr5[4]], [sm.origin], [0.0], query, spec,
            min_score=0.5, stride=16,
        )
        assert ci == 0
        assert abs(s_pr - s_full) < 1e-4
        np.testing.assert_allclose(p_pr, p_full, atol=1e-6)
        assert np.isfinite(cov).all()

    def test_pruned_rejects_below_min_score(self):
        sm, pyr = TestMatching()._setup()
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        # garbage query far outside the mapped area
        query = np.random.default_rng(0).uniform(40, 60, (64, 2))
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        ci, s, p, cov = matching.match_candidates_pruned(
            [pyr5[0]], [pyr5[4]], [sm.origin], [0.0], query, spec,
            min_score=0.7, stride=16,
        )
        assert ci is None

    def test_upper_bound_dominates_scores(self):
        sm, pyr = TestMatching()._setup()
        import jax.numpy as jnp
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        pts = np.column_stack([np.full(40, 4.0), np.linspace(-0.5, 2.5, 40)])
        N = 64
        ptsb = np.zeros((N, 2), np.float32)
        ptsb[: len(pts)] = pts
        valid = np.arange(N) < len(pts)
        thetas = np.linspace(-0.3, 0.3, 16).astype(np.float32)
        ub = np.asarray(
            matching.rotation_upper_bounds(
                pyr5[4], sm.origin, jnp.asarray(ptsb), jnp.asarray(valid),
                jnp.asarray(thetas), 0.1, 20, 128, 16,
            )
        )
        scores = np.asarray(
            matching.correlate_rotations(
                pyr5[0], sm.origin, jnp.asarray(ptsb), jnp.asarray(valid),
                jnp.asarray(thetas), 0.1, 20, 128, 256,
            )
        )
        # every true score must be bounded by its rotation's upper bound
        assert np.all(scores.max(axis=(1, 2)) <= ub + 1e-5)


class TestPallasInsert:
    def test_matches_xla_insert(self):
        """Pallas ray-insertion kernel (interpret mode) must reproduce
        the XLA scatter path bit-for-bit."""
        from sparse_gslam_tpu.ops.grid import insert_rays
        from sparse_gslam_tpu.ops.grid_pallas import insert_rays_pallas

        rng = np.random.default_rng(3)
        S, B, G = 8, 8, 64
        origins = rng.uniform(1.5, 4.5, (S, 2)).astype(np.float32)
        pts = (
            origins[:, None, :] + rng.uniform(-1.6, 1.6, (S, B, 2))
        ).astype(np.float32)
        kind = rng.integers(0, 3, (S, B)).astype(np.int8)
        args = (
            jnp.zeros((G, G), jnp.float32), jnp.zeros(2, jnp.float32),
            jnp.asarray(origins), jnp.asarray(pts), jnp.asarray(kind),
            jnp.asarray([0.7, 0.4], jnp.float32), 0.1, 24, G,
        )
        ref = np.asarray(insert_rays(*args))
        pal = np.asarray(insert_rays_pallas(*args, interpret=True))
        np.testing.assert_array_equal(ref, pal)


class TestBatchedPrunedMatching:
    def test_batched_matches_sequential(self):
        """The TPU chunk-batched pruned matcher must accept the same
        closure (same candidate, score, pose, cov) as the sequential
        path."""
        sm, pyr = TestMatching()._setup()
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        gt = np.array([0.4, -0.3, 0.1])
        base = np.concatenate(
            [
                np.column_stack(
                    [np.full(50, 4.0), np.linspace(-0.5, 2.5, 50)]
                ),
                np.column_stack(
                    [np.linspace(0.0, 2.0, 40), np.full(40, -1.0)]
                ),
            ]
        )
        query = se2.apply(se2.inverse(gt), base)
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        # three candidates: two decoys (shifted origins) + the real one
        grids = [pyr5[0], pyr5[0], pyr5[0]]
        pooled = [pyr5[4], pyr5[4], pyr5[4]]
        import jax.numpy as jnp

        origins = [
            sm.origin + jnp.asarray([30.0, 30.0]),
            sm.origin,
            sm.origin + jnp.asarray([-25.0, 10.0]),
        ]
        thetas = [0.3, 0.0, -0.2]
        seq = matching.match_candidates_pruned(
            grids, pooled, origins, thetas, query, spec,
            min_score=0.5, stride=16,
        )
        bat = matching.match_candidates_pruned_batched(
            grids, pooled, origins, thetas, query, spec,
            min_score=0.5, stride=16,
        )
        assert bat[0] == seq[0] == 1
        assert abs(bat[1] - seq[1]) < 1e-5
        np.testing.assert_allclose(bat[2], seq[2], atol=1e-6)
        np.testing.assert_allclose(bat[3], seq[3], atol=1e-8)

    def test_batched_rejects_below_min_score(self):
        sm, pyr = TestMatching()._setup()
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        query = np.random.default_rng(0).uniform(40, 60, (64, 2))
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        ci, s, p, cov = matching.match_candidates_pruned_batched(
            [pyr5[0]], [pyr5[4]], [sm.origin], [0.0], query, spec,
            min_score=0.7, stride=16,
        )
        assert ci is None


class TestShardedMatching:
    def test_sharded_matches_sequential(self):
        """The shard_map candidate fan-out (SURVEY §2.7 row 1) must
        pick the same closure as the single-device paths on an
        8-device CPU mesh."""
        import jax
        from jax.sharding import Mesh

        sm, pyr = TestMatching()._setup()
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        gt = np.array([0.4, -0.3, 0.1])
        base = np.concatenate(
            [
                np.column_stack(
                    [np.full(50, 4.0), np.linspace(-0.5, 2.5, 50)]
                ),
                np.column_stack(
                    [np.linspace(0.0, 2.0, 40), np.full(40, -1.0)]
                ),
            ]
        )
        query = se2.apply(se2.inverse(gt), base)
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        grids = [pyr5[0], pyr5[0], pyr5[0]]
        pooled = [pyr5[4], pyr5[4], pyr5[4]]
        origins = [
            sm.origin + jnp.asarray([30.0, 30.0]),
            sm.origin,
            sm.origin + jnp.asarray([-25.0, 10.0]),
        ]
        thetas = [0.3, 0.0, -0.2]
        seq = matching.match_candidates_pruned(
            grids, pooled, origins, thetas, query, spec,
            min_score=0.5, stride=16,
        )
        devs = jax.devices("cpu")
        assert len(devs) >= 8
        mesh = Mesh(np.array(devs[:8]), ("cands",))
        sh = matching.match_candidates_sharded(
            grids, origins, thetas, query, spec, mesh, min_score=0.5
        )
        assert sh[0] == seq[0] == 1
        assert abs(sh[1] - seq[1]) < 1e-5
        np.testing.assert_allclose(sh[2], seq[2], atol=1e-5)
        np.testing.assert_allclose(sh[3], seq[3], atol=1e-6)

    def test_sharded_rejects_below_min_score(self):
        import jax
        from jax.sharding import Mesh

        sm, pyr = TestMatching()._setup()
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        pyr5 = precompute_pyramid(sm.probs, 5)
        query = np.random.default_rng(0).uniform(40, 60, (64, 2))
        spec = matching.search_spec(2.0, 0.6, 8.0, 0.1)
        mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("cands",))
        ci, s, p, cov = matching.match_candidates_sharded(
            [pyr5[0]], [sm.origin], [0.0], query, spec, mesh,
            min_score=0.7,
        )
        assert ci is None


class TestWindowCovCalibration:
    """window_cov must report the score-surface shape honestly: a
    sharply peaked match gets a tight sigma, a corridor-style ridge
    gets a wide sigma ALONG the ridge (the alias direction) -- this is
    what de-weights aliased loop closures in the pose graph."""

    def _cov_for(self, probs, pts, res=0.1):
        size = probs.shape[0]
        origin = np.array([-size * res / 2, -size * res / 2], np.float32)
        score = np.where(probs > 0, probs, 0.1).astype(np.float32)
        n = 256
        ptsb = np.zeros((n, 2), np.float32)
        ptsb[: len(pts)] = pts
        valid = np.arange(n) < len(pts)
        step = 0.01
        cov = matching.window_cov(
            jnp.asarray(score), jnp.asarray(origin), jnp.asarray(ptsb),
            jnp.asarray(valid), jnp.zeros(3, jnp.float32),
            jnp.float32(0.0), jnp.float32(step), jnp.float32(-0.3),
            jnp.float32(0.3), res, size,
        )
        return np.asarray(cov)

    def test_ridge_gets_wide_sigma_along_corridor(self):
        size, res = 128, 0.1
        origin = -size * res / 2
        probs = np.zeros((size, size), np.float32)
        # two long parallel walls along x = a corridor along x
        probs[10:118, 40] = 0.9
        probs[10:118, 88] = 0.9
        ys = np.array([40, 88])
        xs = np.arange(30, 98, 2)
        cells = np.array([(x, y) for x in xs for y in ys])
        pts = (cells + 0.5) * res + origin
        cov = self._cov_for(probs, pts)
        sig = np.sqrt(np.diag(cov))
        # wide along x (ridge), floor-tight across (y)
        assert sig[0] > 2.5 * sig[1], sig
        assert sig[1] < 0.35, sig  # ~the 2.5-cell floor

    def test_peak_gets_tight_sigma(self):
        size, res = 128, 0.1
        origin = -size * res / 2
        probs = np.zeros((size, size), np.float32)
        probs[30:98, 40] = 0.9
        probs[40, 30:98] = 0.9  # corner: constrains both axes
        cells = np.concatenate(
            [
                np.stack([np.arange(30, 98, 2), np.full(34, 40)], 1),
                np.stack([np.full(34, 40), np.arange(30, 98, 2)], 1),
            ]
        )
        pts = (cells + 0.5) * res + origin
        cov = self._cov_for(probs, pts)
        sig = np.sqrt(np.diag(cov))
        # both axes at the floor scale (no ridge inflation)
        assert sig[0] < 0.35 and sig[1] < 0.35, sig


class TestPlateauTieBreak:
    def test_perfect_alignment_is_unbiased(self):
        """The 2x2 dilation creates exact score plateaus; plain argmax
        picked the plateau's most-negative corner, biasing every match
        by up to -1 cell per axis (-0.1 m at match resolution). With
        the centered tie-break, a query already in perfect alignment
        must match at zero offset."""
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        res, size = 0.1, 256
        origin = np.array([-12.8, -12.8], np.float32)
        probs = np.zeros((size, size), np.float32)

        def cell(w):
            return int(np.floor((w - origin[0]) / res))

        lo, hi = cell(-5.0), cell(5.0)
        probs[lo, lo : hi + 1] = 0.9
        probs[hi, lo : hi + 1] = 0.9
        probs[lo : hi + 1, lo] = 0.9
        probs[lo : hi + 1, hi] = 0.9
        pyr = precompute_pyramid(jnp.asarray(probs), 5)
        pts = []
        for t in np.arange(-4.9, 4.9, 0.2):
            for w in (lo, hi):
                c = origin[0] + (w + 0.5) * res
                pts += [(c, t), (t, c)]
        pts = np.array(pts, np.float64)
        spec = matching.search_spec(1.0, 0.3, 7.0, res)
        ci, score, pose, cov = matching.match_candidates_pruned(
            [pyr[0]], [pyr[4]], [jnp.asarray(origin)], [0.0], pts,
            spec, 0.5, 16,
        )
        assert ci == 0 and score > 0.85
        np.testing.assert_allclose(pose, np.zeros(3), atol=1e-6)


class TestSmoothingKernel:
    def test_binomial_blur_matches_reference_kernel(self):
        """s=1 must equal the reference's 3x3 kernel
        [1/16 1/8 1/16; 1/8 1/4 1/8; 1/16 1/8 1/16]
        (fast_correlative_scan_matcher_2d.cc:439-444)."""
        from sparse_gslam_tpu.ops.grid import PMIN, binomial_blur

        rng = np.random.default_rng(3)
        x = rng.uniform(0.1, 0.9, (16, 16)).astype(np.float32)
        got = np.asarray(binomial_blur(jnp.asarray(x), 1))
        k = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float64) / 16
        xp = np.pad(x, 1, constant_values=PMIN)
        want = np.zeros_like(x)
        for i in range(16):
            for j in range(16):
                want[i, j] = (xp[i : i + 3, j : j + 3] * k).sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_smoothed_pyramid_keeps_bound_property(self):
        """Smoothing applies BEFORE pooling, so every level must still
        upper-bound level 0 over its stride window (exact B&B)."""
        from sparse_gslam_tpu.ops.grid import precompute_pyramid

        rng = np.random.default_rng(5)
        probs = np.where(
            rng.uniform(size=(64, 64)) > 0.9,
            rng.uniform(0.5, 0.9, (64, 64)),
            0.0,
        ).astype(np.float32)
        pyr = np.asarray(precompute_pyramid(jnp.asarray(probs), 4, smooth=1))
        for lvl in range(1, 4):
            w = 1 << lvl  # stride window the level must dominate
            for i in range(0, 64 - w, 7):
                for j in range(0, 64 - w, 7):
                    assert (
                        pyr[lvl, i, j]
                        >= pyr[0, i : i + w, j : j + w].max() - 1e-6
                    )


class TestIncrementalInsert:
    def test_insert_range_data_matches_batch_build(self):
        """Incremental per-keyframe insertion (ops/grid.insert_range_data,
        the Cartographer local-SLAM-style API) reproduces the batch
        submap build when fed the same scans at the same poses."""
        import numpy as np
        import jax.numpy as jnp

        from sparse_gslam_tpu.models.range_data import RangeData2D
        from sparse_gslam_tpu.ops.grid import (
            GridSpec,
            build_submap_grid,
            insert_range_data,
        )

        rng = np.random.default_rng(5)
        spec = GridSpec(size=128, resolution=0.1)
        table = np.stack(
            [np.cos(np.linspace(-1.2, 1.2, 11)),
             np.sin(np.linspace(-1.2, 1.2, 11))], 1
        )
        stores = []
        batch = RangeData2D()
        poses = [np.array([0.0, 0.0, 0.0]), np.array([0.6, 0.1, 0.1]),
                 np.array([1.1, 0.3, 0.2])]
        for pose in poses:
            rd = RangeData2D()
            ranges = rng.uniform(1.0, 4.5, 11)
            ranges[rng.random(11) < 0.2] = 10.0  # some max-range misses
            rd.insert_scan(ranges, table, 5.0)
            stores.append(rd)
            rd.transform_into(pose, batch)
        g_batch = build_submap_grid(batch, spec)
        probs = jnp.zeros((spec.size, spec.size), jnp.float32)
        for rd, pose in zip(stores, poses):
            probs = insert_range_data(
                probs, g_batch.origin, rd, pose, spec
            )
        a = np.asarray(g_batch.probs)
        b = np.asarray(probs)
        # same observed cells, probabilities equal (identical odds
        # updates in both paths, scan order preserved)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestPinBoundCoverage:
    """Regression for the ADVICE r3 off-by-one: at stride == 2*n_linear
    (the DEFAULT config, depth 5 / n_linear 8), a single pooled lookup
    misses the level-0 dilation's +1 overhang, so the 'exact' bound
    could fall below the true window score and valid pins were pruned."""

    def _setup(self, hot_cell):
        size = 64
        probs = np.zeros((size, size), np.float32)
        probs[hot_cell] = 0.9
        depth = 5  # stride = 16
        pyr = np.asarray(precompute_pyramid(jnp.asarray(probs), depth))
        return pyr[0], pyr[depth - 1]

    def test_bound_dominates_true_score_at_equal_stride(self):
        n_linear = 8
        stride = 16  # == 2 * n_linear: the overhang case
        res = 0.1
        origin = np.zeros(2)
        # single query point at the grid center cell
        pt = np.array([[3.205, 3.205]])  # cell (32, 32)
        thetas = np.array([0.0])
        for dx in range(-n_linear, n_linear + 2):
            for dy in (-n_linear, 0, n_linear + 1):
                hot = (32 + dx, 32 + dy)
                score0, pooled = self._setup(hot)
                true = matching.correlate_window_host(
                    score0, origin, res, pt, thetas, n_linear
                ).max()
                bound = matching.pin_bound_host(
                    pooled, origin, res, pt, thetas, n_linear,
                    stride=stride,
                )
                assert bound >= true - 1e-6, (
                    f"bound {bound} < true {true} at hot={hot}"
                )

    def test_single_lookup_would_miss_overhang(self):
        # documents the bug the stride-aware path fixes: the hot cell at
        # +n_linear+1 is reachable through the level-0 dilation but NOT
        # by one pooled lookup at -n_linear
        n_linear = 8
        res = 0.1
        origin = np.zeros(2)
        pt = np.array([[3.205, 3.205]])  # cell (32, 32)
        thetas = np.array([0.0])
        hot = (32 + n_linear + 1, 32)
        score0, pooled = self._setup(hot)
        true = matching.correlate_window_host(
            score0, origin, res, pt, thetas, n_linear
        ).max()
        assert true > 0.5  # the dilated window DOES see the hot cell
        old_bound = matching.pin_bound_host(
            pooled, origin, res, pt, thetas, n_linear
        )  # no stride: the old single-lookup behavior
        assert old_bound < true  # the bug
        new_bound = matching.pin_bound_host(
            pooled, origin, res, pt, thetas, n_linear, stride=16
        )
        assert new_bound >= true - 1e-6


class TestPinBoundsBatch:
    """Device-batched pin screen (matching.pin_bounds_batch) must
    reproduce the host bound (pin_bound_host) per pin."""

    def test_matches_host_bounds(self):
        rng = np.random.default_rng(11)
        depth, n_linear, res = 5, 8, 0.1
        size = 128
        M = 3
        pyrs = []
        for m in range(M):
            probs = np.zeros((size, size), np.float32)
            occ = rng.integers(10, size - 10, (40, 2))
            probs[occ[:, 0], occ[:, 1]] = rng.uniform(0.55, 0.95, 40)
            pyrs.append(
                np.asarray(precompute_pyramid(jnp.asarray(probs), depth))
            )
        pooled_np = [p[depth - 1].astype(np.float64) for p in pyrs]
        stack = jnp.stack([jnp.asarray(p[depth - 1]) for p in pyrs])

        Kp, N, R = 5, 60, 9
        pts = np.zeros((Kp, N, 2), np.float32)
        val = np.zeros((Kp, N), bool)
        orgs = np.zeros((Kp, 2), np.float32)
        ths = np.zeros((Kp, R), np.float32)
        ids = rng.integers(0, M, Kp).astype(np.int32)
        host = np.zeros(Kp)
        for k in range(Kp):
            n = int(rng.integers(20, N))
            p = rng.uniform(2.0, 10.0, (n, 2))
            pts[k, :n] = p
            val[k, :n] = True
            orgs[k] = rng.uniform(-1, 1, 2)
            ths[k] = rng.uniform(-0.2, 0.2) + np.linspace(
                -0.1, 0.1, R
            )
            host[k] = matching.pin_bound_host(
                pooled_np[ids[k]], orgs[k].astype(np.float64), res,
                p.astype(np.float64), ths[k].astype(np.float64),
                n_linear, stride=16,
            )
        dev = np.asarray(
            matching.pin_bounds_batch(
                stack, jnp.asarray(ids), jnp.asarray(orgs),
                jnp.asarray(pts), jnp.asarray(val), jnp.asarray(ths),
                res, n_linear, extra=True,
            )
        )
        np.testing.assert_allclose(dev, host, atol=1e-5)


class TestPinEvalBatch:
    """One-program pin evaluator (matching.pin_eval_batch, VERDICT r4
    #4): its packed outputs must reproduce the piecewise path --
    correlate_window_host window scores, score_volume_cov,
    refine_pose_cov, overlap -- per pin."""

    def test_matches_piecewise_path(self):
        rng = np.random.default_rng(5)
        n_linear, res = 8, 0.1
        size, fft_size = 128, 192
        high_size, high_res = 256, 0.05
        M = 2
        score_grids, highs, high_origins = [], [], []
        for m in range(M):
            probs = np.full((size, size), 0.15, np.float32)
            for _ in range(5):
                x0, y0 = rng.integers(20, size - 20, 2)
                ln = int(rng.integers(30, 70))
                if rng.random() < 0.5:
                    probs[x0 : min(x0 + ln, size - 1), y0] = 0.9
                else:
                    probs[x0, y0 : min(y0 + ln, size - 1)] = 0.9
            score_grids.append(probs)
            # matching high-res grid: same walls at 2x resolution
            hi = np.full((high_size, high_size), 0.15, np.float32)
            hi[::2, ::2] = probs[: high_size // 2, : high_size // 2]
            hi = np.maximum(hi, np.roll(hi, 1, 0))
            hi = np.maximum(hi, np.roll(hi, 1, 1))
            highs.append(hi)
            high_origins.append(np.array([-6.4, -6.4], np.float32))
        spectra = jnp.stack(
            [
                matching.grid_spectrum(
                    jnp.asarray(g)[None], fft_size, size
                )[0]
                for g in score_grids
            ]
        )
        origin = np.array([-6.4, -6.4])

        B, N, R = 3, 80, 9
        pts = np.zeros((B, N, 2), np.float32)
        val = np.zeros((B, N), bool)
        orgs = np.zeros((B, 2), np.float32)
        seeds = np.zeros((B, 3), np.float32)
        ths = np.zeros((B, R), np.float32)
        ids = np.asarray([0, 1, 0], np.int32)
        live = np.ones(B, bool)
        step = 0.02
        for k in range(B):
            g = score_grids[ids[k]]
            occ = np.argwhere(g > 0.7)
            # interior cells only: a point whose cell leaves the grid
            # at SOME window offset is scored per-offset by the host
            # reference but dropped with a uniform PMIN correction by
            # both device paths (the documented correlate_rotations
            # approximation) -- not the behavior under test here
            occ = occ[(occ > 30).all(1) & (occ < 96).all(1)]
            sel = rng.choice(len(occ), size=60, replace=True)
            p = origin[None] + (occ[sel] + 0.5) * res
            pts[k, :60] = p + rng.normal(0, 0.01, p.shape)
            val[k, :60] = True
            seeds[k] = [
                rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), 0.0,
            ]
            orgs[k] = origin - seeds[k, :2]
            ths[k] = seeds[k, 2] + (np.arange(R) - R // 2) * step
        out = np.asarray(
            matching.pin_eval_batch(
                spectra, jnp.stack([jnp.asarray(h) for h in highs]),
                jnp.asarray(np.stack(high_origins)),
                jnp.asarray(ids), jnp.asarray(orgs),
                jnp.asarray(seeds), jnp.asarray(pts),
                jnp.asarray(val), jnp.asarray(ths),
                jnp.asarray(live), resolution=res,
                n_linear=n_linear, size=size, fft_size=fft_size,
                high_res=high_res,
            ),
            dtype=np.float64,
        )
        assert out.shape == (B, 26)
        for k in range(B):
            nq = int(val[k].sum())
            q = pts[k, :nq].astype(np.float64)
            scores = matching.correlate_window_host(
                score_grids[ids[k]].astype(np.float64),
                orgs[k].astype(np.float64), res, q,
                ths[k].astype(np.float64), n_linear,
            )
            ki, i, j = matching._argmax_center_tiebreak(
                scores, n_linear
            )
            sc_host = scores[ki, i, j]
            assert abs(out[k, 0] - sc_host) < 1e-4, k
            pose0_host = np.array(
                [
                    (i - n_linear) * res + seeds[k, 0],
                    (j - n_linear) * res + seeds[k, 1],
                    ths[k, ki],
                ]
            )
            np.testing.assert_allclose(
                out[k, 1:4], pose0_host, atol=1e-5
            )
            wcov_host = matching.score_volume_cov(
                scores, ths[k].astype(np.float64), seeds[k, 2], res,
                n_linear,
            )
            np.testing.assert_allclose(
                out[k, 4:13].reshape(3, 3), wcov_host,
                rtol=1e-3, atol=1e-5,
            )
            ptsb = np.zeros((256, 2), np.float32)
            ptsb[:nq] = q
            vb = np.arange(256) < nq
            refined, censi, probs = matching.refine_pose_cov(
                jnp.asarray(highs[ids[k]]),
                jnp.asarray(high_origins[ids[k]]), high_res,
                jnp.asarray(ptsb), jnp.asarray(vb),
                jnp.asarray(pose0_host, jnp.float32),
            )
            np.testing.assert_allclose(
                out[k, 13:16], np.asarray(refined), atol=2e-4
            )
            ov_host = float(
                ((np.asarray(probs) > 0.55) & vb).sum() / nq
            )
            assert abs(out[k, 25] - ov_host) < 0.05, k
