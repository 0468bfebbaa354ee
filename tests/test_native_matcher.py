"""Native branch-and-bound matcher (native/correlative_matcher.cpp) vs
the FFT exhaustive matcher (ops/matching.py).

The native matcher is the reference's DFS algorithm
(fast_correlative_scan_matcher_2d.cc:368-688); the FFT matcher scores
the same function exhaustively. On inputs whose optimum is interior
(every query point stays on-grid at the best offset) the two must find
the SAME optimum: this is the independent B&B-vs-exhaustive
cross-validation the reference never had (SURVEY.md §4), and it
validates the bench.py baseline.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from sparse_gslam_tpu.io.native import (
    correlative_match_many_native,
    correlative_match_native,
)
from sparse_gslam_tpu.ops import matching
from sparse_gslam_tpu.ops.grid import PMIN, precompute_pyramid


def make_case(seed=0, size=128, n_points=80, resolution=0.1):
    """A wall-like occupancy grid + a query scan sampled from occupied
    cells, displaced by a known rigid transform."""
    rng = np.random.default_rng(seed)
    probs = np.zeros((size, size), np.float32)
    # two walls + scattered occupied cells, interior region
    probs[30:100, 40] = 0.9
    probs[30, 40:90] = 0.9
    occ = rng.integers(25, size - 25, size=(30, 2))
    probs[occ[:, 0], occ[:, 1]] = 0.8
    # mark everything else observed-free so FFT/native agree off-wall
    probs[probs == 0.0] = 0.15

    origin = np.array([-size * resolution / 2, -size * resolution / 2])
    # sample points from all occupied cells (both walls + scatter) so
    # the optimum is unambiguous (no single-wall translation ridge)
    occ_cells = np.argwhere(probs > 0.7)
    sel = rng.choice(len(occ_cells), size=n_points, replace=True)
    pts_map = origin[None, :] + (occ_cells[sel] + 0.5) * resolution
    # true transform: rotate + translate the map points into query frame
    th = 0.12
    t = np.array([0.7, -0.4])
    c, s = np.cos(-th), np.sin(-th)
    R = np.array([[c, -s], [s, c]])
    pts_query = (pts_map - t) @ R.T
    return probs, origin, resolution, pts_query, th, t


class TestNativeVsFFT:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_same_optimum(self, seed):
        probs, origin, res, pts, th, t = make_case(seed)
        depth = 4
        spec = matching.search_spec(1.5, 0.35, 8.0, res)
        pyr = np.asarray(precompute_pyramid(jnp.asarray(probs), depth))

        score_f, pose_f, _ = matching.match_submap(
            jnp.asarray(pyr[0]), jnp.asarray(origin, jnp.float32),
            res, pts.astype(np.float32), 0.0, spec,
        )
        got = correlative_match_native(
            probs, origin, res, pts, 0.0, spec.angular_step,
            spec.n_angular, spec.n_linear, depth, min_score=0.2,
        )
        assert got is not None
        score_n, pose_n = got
        # the equivalence claim is the OPTIMAL SCORE: both searches
        # maximize the same function, ties may fall on neighboring
        # near-equal candidates (score surface is discretized)
        assert abs(score_n - score_f) < 2e-3, (score_n, score_f)
        assert np.allclose(pose_n[:2], pose_f[:2], atol=2 * res + 1e-6)
        assert abs(pose_n[2] - pose_f[2]) < 2.5 * spec.angular_step

    def test_native_recovers_true_transform(self):
        probs, origin, res, pts, th, t = make_case(3)
        spec = matching.search_spec(1.5, 0.35, 8.0, res)
        got = correlative_match_native(
            probs, origin, res, pts, 0.0, spec.angular_step,
            spec.n_angular, spec.n_linear, depth=4, min_score=0.2,
        )
        assert got is not None
        _, pose = got
        assert np.linalg.norm(pose[:2] - t) < 2.5 * res
        assert abs(pose[2] - th) < 2 * spec.angular_step

    def test_min_score_gate(self):
        probs, origin, res, pts, th, t = make_case(4)
        spec = matching.search_spec(1.5, 0.35, 8.0, res)
        got = correlative_match_native(
            probs, origin, res, pts, 0.0, spec.angular_step,
            spec.n_angular, spec.n_linear, depth=4, min_score=0.999,
        )
        assert got is None

    def test_many_fanout_picks_best(self):
        probs, origin, res, pts, th, t = make_case(5)
        # candidate 0: decoy (uniform PMIN-ish), candidate 1: real
        decoy = np.full_like(probs, 0.15)
        grids = np.stack([decoy, probs])
        origins = np.stack([origin, origin])
        spec = matching.search_spec(1.5, 0.35, 8.0, res)
        got = correlative_match_many_native(
            grids, origins, res, pts, [0.0, 0.0], spec.angular_step,
            spec.n_angular, spec.n_linear, depth=4, min_score=0.2,
            n_threads=2,
        )
        assert got is not None
        best, score, pose = got
        assert best == 1
        assert np.linalg.norm(pose[:2] - t) < 2.5 * res
