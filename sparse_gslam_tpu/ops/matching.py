"""Correlative scan-to-map matching + covariance + local refinement.

TPU-native replacement for the reference's FastCorrelativeScanMatcher2D
branch-and-bound search (src/cartographer_bindings/
fast_correlative_scan_matcher_2d.cc:41-688) and CeresScanMatcher2D
refinement (ceres_scan_matcher_2d.h:38-58, options at
submap_loop_closer.cpp:30-39).

Design: instead of a DFS over a max-pool pyramid, we compute the EXACT
exhaustive score of every (rotation, x-offset, y-offset) candidate in
one shot: per rotation, the discretized scan becomes a cell-count
histogram; score(offset) = <histogram, grid shifted by offset> / N is a
cross-correlation, evaluated for all offsets simultaneously with FFTs.
Branch-and-bound returns the argmax of this same function (its pyramid
levels are upper bounds, pruning is exact), so this is equivalent at
equal discretization -- with no search-failure modes -- and it is
embarrassingly parallel, which is what the MXU/VPU want. The
reference's deliberate 2x2 score dilation (its level-0 precomputation
grid has window 2, fast_correlative_scan_matcher_2d.cc:454-468) is
applied to the grid before correlation.

The score-moment covariance (reference's modification, :536-560) is a
windowed second-moment reduction over the same score volume.

Refinement replicates the Ceres objective: occupied-space residuals on
a bicubic-interpolated high-res grid + translation/rotation deltas,
10 Gauss-Newton iterations (weights 20/10/1).
"""
from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .grid import PMIN

# Score plateaus narrower than the per-point sampling noise carry no
# information: mean scores over n~100-500 points have binomial noise
# sqrt(p(1-p)/n) ~ 0.02-0.04, so candidates within this band of the
# max are statistically tied and the centered tie-break (odometry
# prior) decides. A genuinely peaked match exceeds its surroundings by
# ~0.1-0.3 and is unaffected.
SCORE_NOISE_BAND = 0.02

# diagnostic counter: fused_match device dispatches (paging /
# band-recall passes show up as >1 per wrapper call)
FUSED_CALLS = 0

# ---------------------------------------------------------------------------
# search geometry (SearchParameters, correlative_scan_matcher_2d.cc:27-54)
# ---------------------------------------------------------------------------


class SearchSpec(NamedTuple):
    n_angular: int  # rotations each side of initial angle
    angular_step: float
    n_linear: int  # linear window in cells (each side)
    resolution: float


def search_spec(
    linear_window: float,
    angular_window: float,
    max_scan_range: float,
    resolution: float,
    angular_bucket: int = 16,
) -> SearchSpec:
    """Angular step from scan extent (correlative_scan_matcher_2d.cc:34-47),
    rotations padded up to a bucket multiple to bound recompiles."""
    max_scan_range = max(max_scan_range, 3.0 * resolution)
    step = (1.0 - 1e-3) * math.acos(
        1.0 - resolution**2 / (2.0 * max_scan_range**2)
    )
    n_ang = int(math.ceil(angular_window / step))
    n_ang = int(math.ceil(n_ang / angular_bucket) * angular_bucket)
    n_lin = int(math.ceil(linear_window / resolution))
    return SearchSpec(n_ang, step, n_lin, resolution)


class MatchResult(NamedTuple):
    score: jnp.ndarray  # ()
    pose: jnp.ndarray  # (3,) [x, y, theta] in submap frame
    cov: jnp.ndarray  # (3, 3)


# ---------------------------------------------------------------------------
# exhaustive correlation match
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_linear", "size", "stride"),
)
def rotation_upper_bounds(
    pooled_grid,  # (size, size) level-h pooled score grid (width 2^h+1)
    grid_origin,
    points,
    point_valid,
    thetas,  # (R,) candidate rotations
    resolution: float,
    n_linear: int,
    size: int,
    stride: int,  # 2^h
):
    """Per-rotation EXACT upper bound on the best achievable score:
    max over the stride-lattice of mean pooled-grid lookups -- the
    branch-and-bound root level (fast_correlative_scan_matcher_2d.cc
    ComputeLowestResolutionCandidates). Rotations whose bound is below
    min_score cannot contain the accepted match and are skipped by the
    exhaustive FFT phase."""
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = jnp.floor((px - grid_origin[0]) / resolution).astype(jnp.int32)
    cy = jnp.floor((py - grid_origin[1]) / resolution).astype(jnp.int32)
    offs = jnp.arange(-n_linear, n_linear + 1, stride)
    ox, oy = jnp.meshgrid(offs, offs, indexing="ij")
    off_pairs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=1)
    n_valid = jnp.maximum(jnp.sum(point_valid), 1)

    def one_offset(best, off):
        gx = cx + off[0]
        gy = cy + off[1]
        inb = (
            point_valid[None, :]
            & (gx >= 0) & (gx < size) & (gy >= 0) & (gy < size)
        )
        vals = pooled_grid[
            jnp.clip(gx, 0, size - 1), jnp.clip(gy, 0, size - 1)
        ]
        vals = jnp.where(inb, vals, PMIN)
        sc = jnp.sum(
            jnp.where(point_valid[None, :], vals, 0.0), axis=-1
        ) / n_valid
        return jnp.maximum(best, sc), None

    best0 = jnp.full(thetas.shape, -jnp.inf, pooled_grid.dtype)
    best, _ = jax.lax.scan(one_offset, best0, off_pairs)
    return best


@functools.partial(
    jax.jit,
    static_argnames=("n_linear", "size", "stride"),
)
def rotation_upper_bounds_batch(
    pooled_grids,  # (C, size, size)
    origins,  # (C, 2)
    thetas,  # (C, R)
    points,
    point_valid,
    resolution: float,
    n_linear: int,
    size: int,
    stride: int,
):
    """vmapped rotation_upper_bounds over candidate submaps: one device
    round-trip for the whole candidate set."""

    def one(grid, origin, th):
        return rotation_upper_bounds(
            grid, origin, points, point_valid, th, resolution,
            n_linear, size, stride,
        )

    return jax.vmap(one)(pooled_grids, origins, thetas)


@functools.partial(
    jax.jit, static_argnames=("n_angular", "n_linear", "size", "fft_size")
)
def correlate_all(
    score_grid,  # (size, size) dilated score grid (PMIN where unknown)
    grid_origin,  # (2,)
    points,  # (N, 2) query points in submap frame
    point_valid,  # (N,) bool
    init_theta,  # () initial rotation estimate
    angular_step,  # ()
    resolution: float,
    n_angular: int,
    n_linear: int,
    size: int,
    fft_size: int,
):
    """Score every (rotation, ox, oy) candidate.

    Returns scores (R, 2*n_linear+1, 2*n_linear+1) with
    R = 2*n_angular+1; score = mean over valid points of the grid value
    at the point's cell shifted by (ox, oy) cells.
    """
    R = 2 * n_angular + 1
    W = 2 * n_linear + 1
    ks = jnp.arange(R) - n_angular
    thetas = init_theta + ks * angular_step  # (R,)
    scores = correlate_rotations(
        score_grid, grid_origin, points, point_valid, thetas,
        resolution, n_linear, size, fft_size,
    )
    del W
    return scores, thetas


# XLA's TPU FFT silently switches to a low-precision algorithm above
# ~200 transforms of 384^2 per op (measured: identical inputs score
# 0.7562 at batch 192 and 0.7024 at batch 224 -- a 7% error that
# flips loop-closure decisions). Chunking every (i)rfft2 to at most
# this many transforms per op stays on the accurate path; harmless on
# CPU.
#
# Round-4 follow-up: the degraded path ALSO engages for power-of-two
# transform sizes at batch <= 128 -- 512^2 transforms scored the bench
# case 0.803 against a CPU-exact 0.894 while 448^2 (= 2^6 * 7, which
# XLA lowers through its accurate mixed-radix path) matches to 6
# decimals. fft_margin_bucket therefore defaults to 64 everywhere
# (fft = 384 + 64 = 448); if the grid geometry ever produces a pow2
# fft size again, re-verify scores against the CPU path
# (tests/test_fused_match.py pins CPU equivalence; the bench cross-
# checks the returned pose's score against a direct host evaluation).
_FFT_MAX_BATCH = 128


def _rfft2_chunked(x):
    lead = x.shape[:-2]
    n = 1
    for d in lead:
        n *= d
    xf = x.reshape((n,) + x.shape[-2:])
    outs = [
        jnp.fft.rfft2(xf[i : i + _FFT_MAX_BATCH])
        for i in range(0, n, _FFT_MAX_BATCH)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(lead + out.shape[-2:])


def _irfft2_chunked(x, s):
    lead = x.shape[:-2]
    n = 1
    for d in lead:
        n *= d
    xf = x.reshape((n,) + x.shape[-2:])
    outs = [
        jnp.fft.irfft2(xf[i : i + _FFT_MAX_BATCH], s=s)
        for i in range(0, n, _FFT_MAX_BATCH)
    ]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out.reshape(lead + out.shape[-2:])


@functools.partial(
    jax.jit, static_argnames=("n_linear", "size", "fft_size")
)
def correlate_rotations(
    score_grid,
    grid_origin,
    points,
    point_valid,
    thetas,  # (R,) explicit rotation set
    resolution: float,
    n_linear: int,
    size: int,
    fft_size: int,
):
    """Exhaustive translation scores for an explicit rotation set.
    Returns (R, 2*n_linear+1, 2*n_linear+1)."""
    R = thetas.shape[0]
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    # rotate points: (R, N, 2)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = jnp.floor((px - grid_origin[0]) / resolution).astype(jnp.int32)
    cy = jnp.floor((py - grid_origin[1]) / resolution).astype(jnp.int32)
    inb = (
        point_valid[None, :]
        & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    )
    # per-rotation histogram images, zero-padded to fft_size
    hist = jnp.zeros((R, fft_size, fft_size), jnp.float32)
    # invalid points get an out-of-bounds flat index -> dropped
    flat = jnp.where(inb, cx * fft_size + cy, fft_size * fft_size)
    ar = jnp.broadcast_to(jnp.arange(R)[:, None], flat.shape)
    hist = hist.reshape(R, -1).at[ar, flat].add(
        inb.astype(jnp.float32), mode="drop"
    ).reshape(R, fft_size, fft_size)

    grid_pad = jnp.zeros((fft_size, fft_size), jnp.float32)
    grid_pad = grid_pad.at[:size, :size].set(score_grid)

    # correlation via FFT: corr[o] = sum_c hist[c] * grid[c + o]
    Fh = _rfft2_chunked(hist)  # (R, F, F/2+1)
    Fg = jnp.fft.rfft2(grid_pad)  # (F, F/2+1)
    corr = _irfft2_chunked(
        jnp.conj(Fh) * Fg[None], s=(fft_size, fft_size)
    )  # corr[o] at index o (negative offsets wrap)
    # extract window [-n_linear, n_linear] via roll
    corr = jnp.roll(corr, (n_linear, n_linear), axis=(1, 2))[
        :, : 2 * n_linear + 1, : 2 * n_linear + 1
    ]
    n_valid = jnp.maximum(jnp.sum(point_valid), 1)
    # out-of-grid points contribute 0 to the correlation; the reference
    # would clamp them into the search bounds -- approximate by giving
    # them PMIN (their count per (r, offset) is unknown; use global
    # n_oob per rotation as a uniform correction)
    n_in = jnp.sum(inb, axis=1)  # (R,)
    corr = corr + (n_valid - n_in)[:, None, None] * PMIN
    return corr / n_valid


@functools.partial(jax.jit, static_argnames=("size", "w_lin", "w_rot"))
def window_cov(
    score_grid,  # (size, size) level-0 (2x2 dilated) score grid
    grid_origin,
    points,
    point_valid,
    best_pose,  # (3,) [x, y, theta] best candidate (submap frame)
    init_theta,
    angular_step,
    theta_lo,
    theta_hi,
    resolution: float,
    size: int,
    w_lin: int = 31,
    w_rot: int = 5,
):
    """Score-moment covariance by direct re-scoring of the window
    around the best candidate (the reference's computation,
    fast_correlative_scan_matcher_2d.cc:536-560, with two calibration
    changes that matter for corridor worlds):

    - the translation window is +-w_lin cells (reference: +-5). A +-5
      window cannot see a score ridge wider than ~0.5 m, so an aliased
      along-corridor match gets the SAME ~0.3 m sigma as a sharply
      peaked one, and a meter-level alias error then carries full
      weight in the pose graph. The wider window measures the actual
      ridge width. Default +-31 cells (~+-3 m): corridor ridges span
      the full search window; truncating at +-1.5 m reported
      sigma~0.8 m for a ridge whose aliases sit 2 m out, which still
      let them pull the graph (measured on sim-killian).
    - moment weights count only the mass within a noise band below the
      window maximum, w = max(score - (smax - delta), 0): raw scores
      sit on a large constant floor (~PMIN..0.5), which makes the raw
      second moment converge to the uniform-window variance regardless
      of peak shape. The band (delta = max(0.05, 0.15*(smax - smin)),
      0.05 ~ the per-point binomial score noise at ~100 beams) keeps a
      corridor ridge -- whose candidates are statistically
      indistinguishable from the best -- wide along the ridge, while a
      uniquely peaked match collapses to cell scale. This de-weights
      exactly the error direction of an along-corridor alias
      (models/backend.py closure info = inv(cov)).
    """
    dr = jnp.arange(-w_rot, w_rot + 1)
    dl = jnp.arange(-w_lin, w_lin + 1)
    thetas = jnp.clip(
        best_pose[2] + dr * angular_step, theta_lo, theta_hi
    )  # rotation window clamped to the search range
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = jnp.floor(
        (px + best_pose[0] - grid_origin[0]) / resolution
    ).astype(jnp.int32)
    cy = jnp.floor(
        (py + best_pose[1] - grid_origin[1]) / resolution
    ).astype(jnp.int32)
    gx = cx[:, None, None, :] + dl[None, :, None, None]
    gy = cy[:, None, None, :] + dl[None, None, :, None]
    inb = (
        point_valid[None, None, None, :]
        & (gx >= 0) & (gx < size) & (gy >= 0) & (gy < size)
    )
    vals = jnp.where(
        inb,
        score_grid[jnp.clip(gx, 0, size - 1), jnp.clip(gy, 0, size - 1)],
        PMIN,
    )
    n_valid = jnp.maximum(jnp.sum(point_valid), 1)
    scores = jnp.sum(
        jnp.where(point_valid[None, None, None, :], vals, 0.0), axis=-1
    ) / n_valid  # (R, X, Y)

    smax = jnp.max(scores)
    smin = jnp.min(scores)
    delta = jnp.maximum(0.05, 0.15 * (smax - smin))
    weights = jnp.clip(scores - (smax - delta), 0.0, None) + 1e-9

    X = jnp.stack(
        jnp.broadcast_arrays(
            (best_pose[0] + dl.astype(scores.dtype) * resolution)[
                None, :, None
            ],
            (best_pose[1] + dl.astype(scores.dtype) * resolution)[
                None, None, :
            ],
            (thetas - init_theta)[:, None, None],
        ),
        axis=-1,
    ).reshape(-1, 3)
    sflat = weights.reshape(-1)
    ssum = jnp.sum(sflat)
    u = jnp.sum(X * sflat[:, None], axis=0)
    K = jnp.einsum("ni,nj,n->ij", X, X, sflat)
    inv_s = 1.0 / ssum
    cov = inv_s * K - inv_s * inv_s * jnp.outer(u, u)
    # floor at the reference estimator's best-case scale (its raw
    # moments over a +-5-cell window report sigma ~0.25-0.3 m even for
    # a perfectly peaked match, and that calibration is what dcs_phi /
    # the 11.345 chi^2 pruning thresholds were tuned against). The
    # band-weighted moments above only ever ADD width beyond this
    # floor, in the directions where the score surface is genuinely
    # ambiguous.
    floor = jnp.diag(
        jnp.asarray(
            [
                (2.5 * resolution) ** 2,
                (2.5 * resolution) ** 2,
                (2.5 * angular_step) ** 2,
            ],
            cov.dtype,
        )
    )
    return cov + floor


@functools.partial(jax.jit, static_argnames=("n_linear",))
def best_candidate_with_cov(
    scores,  # (R, W, W)
    thetas,  # (R,)
    init_theta,
    angular_step,
    resolution: float,
    n_linear: int,
):
    """Argmax + score-moment covariance over a +-5 cell / +-5 rotation
    window (fast_correlative_scan_matcher_2d.cc:522-560)."""
    R = scores.shape[0]
    W = scores.shape[1]
    # argmax with centered tie-break: (a) the 2x2 dilation of the score
    # grid creates exact score plateaus 1-2 cells wide, and plain
    # argmax always picks a plateau's most-negative corner, biasing
    # every closure by up to -1 cell per axis (measured -0.1 m on a
    # synthetic square room); (b) a corridor's score RIDGE is flat to
    # within the per-point sampling noise (~sqrt(p(1-p)/n) ~ 0.02), so
    # plain argmax picks a random noise bump meters away along the
    # ridge -- a drift-reinforcing alias. Among candidates within the
    # noise band of the max, prefer the one nearest the search center
    # (= the pose estimate seed): MAP with a flat likelihood, where the
    # odometry prior is the only information left.
    m = jnp.max(scores)
    d = jnp.arange(W) - n_linear
    r2 = (d[:, None] ** 2 + d[None, :] ** 2).astype(scores.dtype)
    # score-agnostic within the band: see _argmax_center_tiebreak
    flat_idx = jnp.argmax(
        jnp.where(
            scores >= m - SCORE_NOISE_BAND, -r2[None], -jnp.inf
        ).reshape(-1)
    )
    k = flat_idx // (W * W)
    rem = flat_idx % (W * W)
    ox = rem // W - n_linear
    oy = rem % W - n_linear
    best_score = scores.reshape(-1)[flat_idx]

    pose = jnp.stack(
        [
            ox.astype(scores.dtype) * resolution,
            oy.astype(scores.dtype) * resolution,
            thetas[k],
        ]
    )

    # windowed second moment (w_size=5; rotation window clamped to
    # available range like the reference's scan_window)
    w = 5
    di = jnp.arange(-w, w + 1)
    # gather score sub-volume around the best candidate, clamping
    # indices (reference restricts the rotation window instead; the
    # clamp duplicates border entries -- equivalent weighting near edges)
    ki = jnp.clip(k + di, 0, R - 1)
    xi = jnp.clip(ox + n_linear + di, 0, W - 1)
    yi = jnp.clip(oy + n_linear + di, 0, W - 1)
    sub = scores[ki[:, None, None], xi[None, :, None], yi[None, None, :]]
    # candidate poses of the window
    px = (xi - n_linear).astype(scores.dtype) * resolution
    py = (yi - n_linear).astype(scores.dtype) * resolution
    pt = thetas[ki] - init_theta  # relative rotation like ToPose
    X = jnp.stack(
        jnp.broadcast_arrays(
            px[None, :, None], py[None, None, :], pt[:, None, None]
        ),
        axis=-1,
    )  # (11,11,11,3)
    sflat = sub.reshape(-1)
    Xflat = X.reshape(-1, 3)
    ssum = jnp.sum(sflat)
    u = jnp.sum(Xflat * sflat[:, None], axis=0)
    K = jnp.einsum("ni,nj,n->ij", Xflat, Xflat, sflat)
    inv_s = 1.0 / ssum
    cov = inv_s * K - inv_s * inv_s * jnp.outer(u, u)
    return best_score, pose, cov


# ---------------------------------------------------------------------------
# local refinement (Ceres scan matcher replacement)
# ---------------------------------------------------------------------------


def _bicubic_kernel(t):
    """Catmull-Rom cubic weights for fractional offset t (4 taps)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return jnp.stack([w0, w1, w2, w3], axis=-1)


def interp_grid(grid, origin, resolution, pts):
    """Bicubic interpolation of grid at world pts (N,2); out-of-grid
    clamps to border (Ceres BiCubicInterpolator semantics)."""
    size = grid.shape[0]
    u = (pts[:, 0] - origin[0]) / resolution - 0.5
    v = (pts[:, 1] - origin[1]) / resolution - 0.5
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    fu = u - iu
    fv = v - iv
    wu = _bicubic_kernel(fu)  # (N,4)
    wv = _bicubic_kernel(fv)
    iu = iu.astype(jnp.int32)
    iv = iv.astype(jnp.int32)
    taps_u = jnp.clip(iu[:, None] + jnp.arange(-1, 3)[None, :], 0, size - 1)
    taps_v = jnp.clip(iv[:, None] + jnp.arange(-1, 3)[None, :], 0, size - 1)
    vals = grid[taps_u[:, :, None], taps_v[:, None, :]]  # (N,4,4)
    return jnp.einsum("na,nab,nb->n", wu, vals, wv)


@functools.partial(jax.jit, static_argnames=("iterations",))
def refine_pose(
    grid,  # (size, size) high-res probability grid (0 = unknown)
    origin,
    resolution,
    points,  # (N, 2) query returns in submap frame
    point_valid,  # (N,)
    init_pose,  # (3,) from the correlative match
    occupied_space_weight: float = 20.0,
    translation_weight: float = 10.0,
    rotation_weight: float = 1.0,
    iterations: int = 10,
):
    """Gauss-Newton refinement of the match pose against the high-res
    grid -- the CeresScanMatcher2D replacement (options hard-coded like
    submap_loop_closer.cpp:30-39; target translation/rotation = the
    correlative estimate, matching the reference's Match call at
    submap_loop_closer.cpp:181-184)."""
    sgrid = jnp.where(grid > 0.0, grid, PMIN)
    n = jnp.maximum(jnp.sum(point_valid), 1)
    w_occ = occupied_space_weight / jnp.sqrt(n.astype(grid.dtype))
    wv = point_valid.astype(grid.dtype)

    def residuals(pose):
        c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
        tp = jnp.stack(
            [
                c * points[:, 0] - s * points[:, 1] + pose[0],
                s * points[:, 0] + c * points[:, 1] + pose[1],
            ],
            axis=1,
        )
        occ = (1.0 - interp_grid(sgrid, origin, resolution, tp)) * w_occ * wv
        r_t = translation_weight * (pose[:2] - init_pose[:2])
        r_r = rotation_weight * (pose[2] - init_pose[2]).reshape(1)
        return jnp.concatenate([occ, r_t, r_r])

    def gn_step(pose, _):
        r = residuals(pose)
        J = jax.jacfwd(residuals)(pose)
        H = J.T @ J + 1e-9 * jnp.eye(3, dtype=pose.dtype)
        g = J.T @ r
        dp = jnp.linalg.solve(H, -g)
        new_pose = pose + dp
        # accept only if cost decreases (poor-man's trust region, close
        # to Ceres' nonmonotonic LM over 10 iterations)
        better = jnp.sum(residuals(new_pose) ** 2) <= jnp.sum(r**2)
        return jnp.where(better, new_pose, pose), None

    pose, _ = jax.lax.scan(gn_step, init_pose, None, length=iterations)
    return pose


@functools.partial(jax.jit, static_argnames=("iterations",))
def refine_pose_cov_two_stage(
    coarse_grid,  # (S, S) dilated score grid (wide convergence basin)
    coarse_origin,
    coarse_res,
    fine_grid,  # (S2, S2) raw/high-res probability grid (unbiased)
    fine_origin,
    fine_res,
    points,
    point_valid,
    init_pose,
    iterations: int = 10,
):
    """backend._refine_on_submap's two-stage GN (coarse basin on the
    dilated grid, polish + Censi covariance on the raw/high-res grid)
    as ONE device program. The split version pays a host
    synchronization between the stages -- 30-60+ ms per sync through
    the remote-TPU tunnel, twice per chain-edge hop. Returns
    (refined_pose, censi_cov, coarse_probs): the overlap gate reads
    the COARSE-stage per-point occupancy (dilated grid), exactly like
    the split path did."""
    coarse, _, cprobs = refine_pose_cov(
        coarse_grid, coarse_origin, coarse_res, points, point_valid,
        init_pose, iterations=iterations,
    )
    refined, cov, _ = refine_pose_cov(
        fine_grid, fine_origin, fine_res, points, point_valid, coarse,
        iterations=iterations,
    )
    return refined, cov, cprobs


@functools.partial(jax.jit, static_argnames=("iterations",))
def refine_pose_cov(
    grid,  # (size, size) high-res probability grid (0 = unknown)
    origin,
    resolution,
    points,  # (N, 2) query returns in submap frame
    point_valid,  # (N,)
    init_pose,  # (3,)
    iterations: int = 10,
):
    """refine_pose + a Censi-style covariance of the refined pose and
    per-point occupancy probabilities (for overlap gating).

    Used by the local-refinement edge path (models/backend.py
    _chain_edges, no reference counterpart): unlike the exhaustive
    matcher's score-moment covariance (window_cov), the covariance here
    comes from the occupied-space Gauss-Newton Hessian at the solution,
    cov = sigma^2 (J^T J)^{-1} with sigma^2 the per-residual variance.
    In a corridor, the grid gradient along the corridor axis is ~0, so
    J^T J is near-singular in that direction and the resulting edge
    carries ~zero information along it -- by construction the local
    edge can never fight a loop closure over the alias direction; it
    only pins the directions the scan actually constrains. The anchor
    (translation/rotation-to-seed) residuals of refine_pose are
    EXCLUDED from the covariance: they encode the prior, not the
    measurement."""
    sgrid = jnp.where(grid > 0.0, grid, PMIN)
    n = jnp.maximum(jnp.sum(point_valid), 1).astype(grid.dtype)
    wv = point_valid.astype(grid.dtype)

    pose = refine_pose(
        grid, origin, resolution, points, point_valid, init_pose,
        iterations=iterations,
    )

    def transformed(p):
        c, s = jnp.cos(p[2]), jnp.sin(p[2])
        return jnp.stack(
            [
                c * points[:, 0] - s * points[:, 1] + p[0],
                s * points[:, 0] + c * points[:, 1] + p[1],
            ],
            axis=1,
        )

    def occ_residuals(p):
        return (1.0 - interp_grid(sgrid, origin, resolution,
                                  transformed(p))) * wv

    r = occ_residuals(pose)
    J = jax.jacfwd(occ_residuals)(pose)  # (N, 3)
    H = J.T @ J
    sigma2 = jnp.sum(r * r) / jnp.maximum(n - 3.0, 1.0)
    # pseudo-inverse via eigen decomposition: directions the scan does
    # not constrain (tiny eigenvalues) get a huge, finite variance
    # instead of a numerical explosion
    w, V = jnp.linalg.eigh(H)
    inv_w = jnp.where(w > 1e-6, 1.0 / jnp.maximum(w, 1e-6), 1e6)
    cov = (V * (sigma2 * inv_w)[None, :]) @ V.T
    probs = interp_grid(sgrid, origin, resolution, transformed(pose))
    return pose, cov, probs


@functools.partial(jax.jit, static_argnames=("size",))
def score_pose(
    score_grid,  # (size, size) level-0 score grid
    grid_origin,
    points,
    point_valid,
    pose,  # (3,)
    resolution: float,
    size: int,
):
    """Mean grid score of the query at one pose -- the same candidate
    score the correlative matcher maximizes, evaluated pointwise (used
    to accept/reject local refinement edges)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    px = c * points[:, 0] - s * points[:, 1] + pose[0]
    py = s * points[:, 0] + c * points[:, 1] + pose[1]
    cx = jnp.floor((px - grid_origin[0]) / resolution).astype(jnp.int32)
    cy = jnp.floor((py - grid_origin[1]) / resolution).astype(jnp.int32)
    inb = point_valid & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    vals = jnp.where(
        inb,
        score_grid[jnp.clip(cx, 0, size - 1), jnp.clip(cy, 0, size - 1)],
        PMIN,
    )
    n = jnp.maximum(jnp.sum(point_valid), 1)
    return jnp.sum(jnp.where(point_valid, vals, 0.0)) / n


def _volume_cov_jnp(scores, thetas, init_theta, resolution,
                    n_linear: int):
    """In-jit port of score_volume_cov (same band-weighted moments)."""
    smax = jnp.max(scores)
    smin = jnp.min(scores)
    delta = jnp.maximum(0.05, 0.15 * (smax - smin))
    w = jnp.clip(scores - (smax - delta), 0.0, None) + 1e-9
    d = (jnp.arange(scores.shape[1]) - n_linear) * resolution
    X = jnp.stack(
        jnp.broadcast_arrays(
            d[None, :, None],
            d[None, None, :],
            (thetas - init_theta)[:, None, None],
        ),
        axis=-1,
    ).reshape(-1, 3)
    sflat = w.reshape(-1)
    ssum = jnp.sum(sflat)
    u = jnp.sum(X * sflat[:, None], axis=0) / ssum
    K = jnp.einsum("ni,nj,n->ij", X, X, sflat) / ssum
    cov = K - jnp.outer(u, u)
    step = (
        thetas[1] - thetas[0]
        if thetas.shape[0] > 1
        else jnp.asarray(0.01, cov.dtype)
    )
    return cov + jnp.diag(
        jnp.stack(
            [
                jnp.asarray((2.5 * resolution) ** 2, cov.dtype),
                jnp.asarray((2.5 * resolution) ** 2, cov.dtype),
                (2.5 * step) ** 2,
            ]
        )
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "resolution", "n_linear", "size", "fft_size", "high_res",
        "iterations",
    ),
)
def pin_eval_batch(
    spectra,  # (Msub, F, F2) cached grid spectra (grid_spectrum)
    high_stack,  # (Msub, G2, G2) high-res probability grids
    high_origins,  # (Msub, 2)
    ids,  # (B,) submap index per pin query
    origins,  # (B, 2) score-grid origin minus seed translation
    seeds,  # (B, 3) seed pose per query
    pts,  # (B, N, 2)
    valid,  # (B, N)
    thetas,  # (B, R) rotation set per query
    live,  # (B,) padding mask
    resolution: float,
    n_linear: int,
    size: int,
    fft_size: int,
    high_res: float = 0.05,
    iterations: int = 10,
):
    """ONE device program for a whole chunk of per-keyframe pins
    (VERDICT r4 #4 one-program backend tick): exhaustive window scores
    via the FFT-free MXU correlator on the cached spectra, centered
    argmax, band-weighted volume covariance, high-res GN refinement +
    Censi covariance + occupancy overlap -- everything the host accept
    logic (models/backend._pin_accept) needs, packed into one (B, 26)
    blob = ONE ~2 KB transfer, replacing the previous per-passer
    window-correlation + refinement round-trips (each ~35 ms of RPC
    floor through the remote tunnel)."""
    B, R = thetas.shape
    W = 2 * n_linear + 1
    n_valid = jnp.maximum(jnp.sum(valid, axis=1), 1).astype(jnp.float32)

    def cells_one(p, th, org):
        return _plane_cells(p, th, jnp.broadcast_to(org, (R, 2)),
                            resolution)

    cx, cy = jax.vmap(cells_one)(pts, thetas, origins)  # (B, R, N)
    Fg = spectra[ids]  # (B, F, F2)

    # many-plane/small-window regime (B*R planes, W ~ 17): histogram +
    # FFT forward + partial matmul inverse (_corr_planes_hist
    # docstring: the NUDFT forward's factor arrays are HBM-bound at
    # this plane count). Planes are flattened so _rfft2_chunked keeps
    # every FFT op at <= _FFT_MAX_BATCH transforms (a vmap here would
    # multiply the batch invisibly into the degraded-precision
    # regime); the per-query spectrum broadcasts into the product
    # without materializing a (B*R, F, F2) copy.
    F2 = fft_size // 2 + 1
    N = pts.shape[1]
    cx_f = cx.reshape(B * R, N)
    cy_f = cy.reshape(B * R, N)
    valid_f = jnp.repeat(valid, R, axis=0)
    hist, n_in = _hist_onehot_masked(
        cx_f, cy_f, valid_f, size, fft_size
    )
    Fh = _rfft2_chunked(hist)  # (B*R, F, F2)
    S = (
        jnp.conj(Fh).reshape(B, R, fft_size, F2) * Fg[:, None]
    ).reshape(B * R, fft_size, F2)
    corr = _partial_idft(
        jnp.real(S).astype(jnp.float32),
        jnp.imag(S).astype(jnp.float32), n_linear, fft_size,
    )
    nv_rep = jnp.repeat(n_valid, R, axis=0)
    corr = corr + (nv_rep - n_in)[:, None, None] * PMIN
    corr = corr / nv_rep[:, None, None]
    scores = corr.reshape(B, R, W, W)

    d = jnp.arange(W) - n_linear
    r2 = (d[:, None] ** 2 + d[None, :] ** 2).astype(jnp.float32)

    def finish_one(sc_b, th_b, seed_b, id_b, pts_b, val_b):
        m = jnp.max(sc_b)
        flat = jnp.argmax(
            jnp.where(
                sc_b >= m - SCORE_NOISE_BAND, -r2[None], -jnp.inf
            ).reshape(-1)
        )
        k = flat // (W * W)
        rem = flat % (W * W)
        oi = rem // W - n_linear
        oj = rem % W - n_linear
        best = sc_b.reshape(-1)[flat]
        pose0 = jnp.stack(
            [
                oi.astype(jnp.float32) * resolution + seed_b[0],
                oj.astype(jnp.float32) * resolution + seed_b[1],
                th_b[k],
            ]
        )
        wcov = _volume_cov_jnp(sc_b, th_b, seed_b[2], resolution,
                               n_linear)
        refined, censi, probs = refine_pose_cov(
            high_stack[id_b], high_origins[id_b], high_res, pts_b,
            val_b, pose0, iterations=iterations,
        )
        nv = jnp.maximum(jnp.sum(val_b), 1).astype(jnp.float32)
        overlap = jnp.sum((probs > 0.55) & val_b) / nv
        return jnp.concatenate(
            [
                best[None], pose0, wcov.reshape(-1), refined,
                censi.reshape(-1), overlap[None],
            ]
        )

    out = jax.vmap(finish_one)(scores, thetas, seeds, ids, pts, valid)
    return jnp.where(live[:, None], out, 0.0)  # (B, 26)


# ---------------------------------------------------------------------------
# batched candidate matching: the reference fans one thread per
# candidate submap (submap_loop_closer.cpp:158-162 ctpl pool); here the
# candidate set is a vmap batch dimension over fixed-size grids.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("n_angular", "n_linear", "size", "fft_size"),
)
def correlate_batch(
    score_grids,  # (C, size, size)
    origins,  # (C, 2)
    init_thetas,  # (C,)
    points,  # (N, 2) shared query
    point_valid,  # (N,)
    angular_step,
    resolution: float,
    n_angular: int,
    n_linear: int,
    size: int,
    fft_size: int,
):
    """Score + argmax + covariance for C candidate submaps at once.
    Returns (scores (C,), poses (C,3), covs (C,3,3))."""

    def one(grid, origin, th0):
        scores, thetas = correlate_all(
            grid, origin, points, point_valid, th0, angular_step,
            resolution, n_angular, n_linear, size, fft_size,
        )
        return best_candidate_with_cov(
            scores, thetas, th0, angular_step, resolution, n_linear
        )

    # statically unrolled rather than vmap: vmap would fuse all C
    # candidates' rotation FFTs into one op and cross the TPU FFT
    # batch-precision cliff (see _FFT_MAX_BATCH)
    outs = [
        one(score_grids[i], origins[i], init_thetas[i])
        for i in range(score_grids.shape[0])
    ]
    return tuple(
        jnp.stack([o[k] for o in outs]) for k in range(3)
    )


def match_submaps_batched(
    score_grids,  # list of (size,size) jnp arrays (same shape)
    origins,
    init_thetas,
    points,  # (N,2) numpy
    spec: SearchSpec,
    chunk: int = 8,
    fft_margin_bucket: int = 64,
):
    """Batched matchOne over candidate submaps with memory-bounded
    chunking. Returns list of (score, pose, cov) numpy triples."""
    import numpy as _np

    size = score_grids[0].shape[0]
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = _np.zeros((n_bucket, 2), _np.float32)
    pts[:N] = points
    valid = _np.zeros(n_bucket, bool)
    valid[:N] = True
    fft_size = size + fft_margin_bucket
    out = []
    for c0 in range(0, len(score_grids), chunk):
        gs = score_grids[c0 : c0 + chunk]
        # pad to the next power of two <= chunk (few compiled variants,
        # no 8x padding waste when there is a single candidate)
        csize = 1
        while csize < len(gs):
            csize *= 2
        pad = csize - len(gs)
        grids = jnp.stack(list(gs) + [gs[0]] * pad)
        origs = jnp.stack(
            list(origins[c0 : c0 + chunk])
            + [origins[c0]] * pad
        )
        th0 = jnp.asarray(
            list(init_thetas[c0 : c0 + chunk])
            + [init_thetas[c0]] * pad,
            jnp.float32,
        )
        s, p, cv = correlate_batch(
            grids, origs, th0, jnp.asarray(pts), jnp.asarray(valid),
            jnp.float32(spec.angular_step), float(spec.resolution),
            int(spec.n_angular), int(spec.n_linear), int(size),
            int(fft_size),
        )
        s, p, cv = _np.asarray(s), _np.asarray(p), _np.asarray(cv)
        for k in range(len(gs)):
            out.append((float(s[k]), p[k], cv[k]))
    return out


def _argmax_center_tiebreak(scores, n_linear, tol=None):
    """(k, i, j) of the max of a (R, W, W) score volume; among
    near-ties -- exact plateaus created by the 2x2-dilated score grid,
    and corridor ridges flat to within the sampling noise -- the
    candidate nearest the translation-window center, i.e. the
    pose-estimate seed (see best_candidate_with_cov for why)."""
    import numpy as _np

    if tol is None:
        tol = SCORE_NOISE_BAND
    m = scores.max()
    W = scores.shape[1]
    d = _np.arange(W) - n_linear
    r2 = d[:, None] ** 2 + d[None, :] ** 2
    # NOTE: among equal-r2 in-band cells the winner is the first in
    # flat-array order -- deliberately score-agnostic (within the band
    # the score differences ARE the sampling noise; preferring the
    # higher one re-introduces the ridge-alias bias this tie-break
    # exists to kill; measured: sim-office ATE 0.080 -> 0.163 with a
    # score-secondary key). Different plane orderings (sequential vs
    # fused top-K) may therefore pick different equal-radius cells;
    # the equivalence contract is same candidate + same radius + score
    # within the band, not bit equality.
    masked = _np.where(scores >= m - tol, -r2[None], -_np.inf)
    return _np.unravel_index(_np.argmax(masked), scores.shape)


def match_candidates_pruned(
    score_grids,  # list of level-0 (2x2 dilated) score grids
    pooled_grids,  # list of level-h pooled grids (same shapes)
    origins,
    init_thetas,
    points,  # (N, 2) numpy query returns
    spec: SearchSpec,
    min_score: float,
    stride: int,
    fft_margin_bucket: int = 64,
):
    """Candidate-submap matching with exact rotation pruning.

    Phase 1 (cheap): per-candidate, per-rotation upper bounds from the
    pooled grid kill every rotation that cannot reach min_score --
    branch-and-bound's root-level pruning, vectorized. Phase 2: the
    exhaustive FFT correlator runs only over surviving rotations
    (bucketed). Phase 3: the winning candidate's covariance comes from
    direct window re-scoring (window_cov). Returns
    (best_idx or None, score, pose (3,), cov (3,3)).
    """
    import numpy as _np

    size = score_grids[0].shape[0]
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = jnp.asarray(
        _np.concatenate(
            [points.astype(_np.float32),
             _np.zeros((n_bucket - N, 2), _np.float32)]
        )
    )
    valid = jnp.asarray(_np.arange(n_bucket) < N)
    fft_size = size + fft_margin_bucket
    R_full = 2 * spec.n_angular + 1

    # phase 1: per-rotation upper bounds for ALL candidates, batched in
    # pow2 chunks (one device round-trip per chunk)
    C = len(score_grids)
    ks = _np.arange(R_full) - spec.n_angular
    all_thetas = _np.stack(
        [
            (float(t0) + ks * spec.angular_step).astype(_np.float32)
            for t0 in init_thetas
        ]
    )
    ubs = _np.zeros((C, R_full), _np.float32)
    c0 = 0
    while c0 < C:
        csize = 1
        while csize < min(16, C - c0):
            csize *= 2
        idxs = list(range(c0, min(c0 + csize, C)))
        pad = csize - len(idxs)
        sel_idx = idxs + [idxs[0]] * pad
        got = _np.asarray(
            rotation_upper_bounds_batch(
                jnp.stack([pooled_grids[k] for k in sel_idx]),
                jnp.stack([jnp.asarray(origins[k]) for k in sel_idx]),
                jnp.asarray(all_thetas[sel_idx]),
                pts, valid, float(spec.resolution),
                int(spec.n_linear), int(size), int(stride),
            )
        )
        ubs[idxs] = got[: len(idxs)]
        c0 += csize

    # order candidates by best bound so the running-best floor prunes
    # later candidates harder
    order = _np.argsort(ubs.max(axis=1))[::-1]
    best = None  # (score, cand_idx, theta, ox, oy)
    for ci in order:
        ci = int(ci)
        thetas_full = all_thetas[ci]
        ub = ubs[ci]
        floor = max(min_score, best[0] if best else -1.0)
        sel = _np.nonzero(ub > floor)[0]
        if len(sel) == 0:
            continue
        Rb = 8
        while Rb < len(sel):
            Rb *= 2
        sel_pad = _np.concatenate(
            [sel, _np.full(Rb - len(sel), sel[0], _np.int64)]
        )
        scores = correlate_rotations(
            score_grids[ci], origins[ci], pts, valid,
            jnp.asarray(thetas_full[sel_pad]),
            float(spec.resolution), int(spec.n_linear), int(size),
            int(fft_size),
        )
        scores = _np.asarray(scores)
        k, i, j = _argmax_center_tiebreak(scores, spec.n_linear)
        sc = float(scores[k, i, j])
        if sc > floor:
            best = (
                sc, ci, float(thetas_full[sel_pad[k]]),
                (int(i) - spec.n_linear) * spec.resolution,
                (int(j) - spec.n_linear) * spec.resolution,
            )
    if best is None:
        return None, 0.0, None, None
    sc, ci, th, ox, oy = best
    pose = _np.array([ox, oy, th])
    th0 = float(init_thetas[ci])
    cov = _np.asarray(
        window_cov(
            score_grids[ci], origins[ci], pts, valid,
            jnp.asarray(pose, jnp.float32), jnp.float32(th0),
            jnp.float32(spec.angular_step),
            jnp.float32(th0 - spec.n_angular * spec.angular_step),
            jnp.float32(th0 + spec.n_angular * spec.angular_step),
            float(spec.resolution), int(size),
        )
    ).astype(_np.float64)
    return ci, sc, pose, cov


@functools.partial(
    jax.jit, static_argnames=("n_linear", "size", "fft_size")
)
def correlate_rotations_batch(
    score_grids,  # (B, size, size)
    origins,  # (B, 2)
    points,
    point_valid,
    thetas,  # (B, R) per-candidate rotation sets
    resolution,
    n_linear: int,
    size: int,
    fft_size: int,
):
    """correlate_rotations over a candidate batch (shared query).
    Written directly (not vmap of the single version: vmapping its
    histogram scatter makes XLA materialize a (B,N,fft,...) one-hot
    intermediate that OOMs). The (B,R) histograms build through one
    flat scatter-add with the batch folded into the flat index --
    identical structure to the single-candidate path.
    Returns (B, R, 2*n_linear+1, 2*n_linear+1)."""
    B, R = thetas.shape
    c, s = jnp.cos(thetas), jnp.sin(thetas)  # (B, R)
    px = (
        c[:, :, None] * points[None, None, :, 0]
        - s[:, :, None] * points[None, None, :, 1]
    )  # (B, R, N)
    py = (
        s[:, :, None] * points[None, None, :, 0]
        + c[:, :, None] * points[None, None, :, 1]
    )
    cx = jnp.floor(
        (px - origins[:, None, None, 0]) / resolution
    ).astype(jnp.int32)
    cy = jnp.floor(
        (py - origins[:, None, None, 1]) / resolution
    ).astype(jnp.int32)
    inb = (
        point_valid[None, None, :]
        & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    )
    BR = B * R
    cell = fft_size * fft_size
    N = points.shape[0]
    flat = jnp.where(inb, cx * fft_size + cy, cell).reshape(BR, N)
    ar = jnp.broadcast_to(jnp.arange(BR)[:, None], (BR, N))
    hist = (
        jnp.zeros((BR, cell), jnp.float32)
        .at[ar, flat]
        .add(inb.astype(jnp.float32).reshape(BR, N), mode="drop")
        .reshape(B, R, fft_size, fft_size)
    )
    grid_pad = jnp.zeros((B, fft_size, fft_size), jnp.float32)
    grid_pad = grid_pad.at[:, :size, :size].set(score_grids)
    Fh = _rfft2_chunked(hist)  # (B, R, F, F/2+1)
    Fg = _rfft2_chunked(grid_pad)  # (B, F, F/2+1)
    corr = _irfft2_chunked(
        jnp.conj(Fh) * Fg[:, None], s=(fft_size, fft_size)
    )
    corr = jnp.roll(corr, (n_linear, n_linear), axis=(2, 3))[
        :, :, : 2 * n_linear + 1, : 2 * n_linear + 1
    ]
    n_valid = jnp.maximum(jnp.sum(point_valid), 1)
    # same out-of-grid correction as correlate_rotations
    n_in = jnp.sum(inb, axis=2)  # (B, R)
    corr = corr + (n_valid - n_in)[:, :, None, None] * PMIN
    return corr / n_valid


def match_candidates_pruned_batched(
    score_grids,
    pooled_grids,
    origins,
    init_thetas,
    points,
    spec: SearchSpec,
    min_score: float,
    stride: int,
    fft_margin_bucket: int = 64,
    chunk: int = 8,
):
    """TPU variant of match_candidates_pruned: same exact rotation
    pruning from pooled-grid upper bounds, but the FFT phase batches
    surviving candidates in chunks with ONE device sync per chunk
    instead of one per candidate (ROADMAP item: on TPU, per-candidate
    host round-trips cost more than the extra correlations the
    sequential running-best floor would have pruned). Bit-identical
    best-match semantics for any fixed min_score floor; only the
    intermediate floor tightening differs, which cannot change the
    argmax (every rotation above min_score is still scored).
    Returns (best_idx or None, score, pose (3,), cov (3,3))."""
    import numpy as _np

    size = score_grids[0].shape[0]
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = jnp.asarray(
        _np.concatenate(
            [points.astype(_np.float32),
             _np.zeros((n_bucket - N, 2), _np.float32)]
        )
    )
    valid = jnp.asarray(_np.arange(n_bucket) < N)
    fft_size = size + fft_margin_bucket
    R_full = 2 * spec.n_angular + 1
    C = len(score_grids)
    ks = _np.arange(R_full) - spec.n_angular
    all_thetas = _np.stack(
        [
            (float(t0) + ks * spec.angular_step).astype(_np.float32)
            for t0 in init_thetas
        ]
    )
    # phase 1: batched per-rotation upper bounds (shared with the
    # sequential path)
    ubs = _np.zeros((C, R_full), _np.float32)
    c0 = 0
    while c0 < C:
        csize = 1
        while csize < min(16, C - c0):
            csize *= 2
        idxs = list(range(c0, min(c0 + csize, C)))
        pad = csize - len(idxs)
        sel_idx = idxs + [idxs[0]] * pad
        got = _np.asarray(
            rotation_upper_bounds_batch(
                jnp.stack([pooled_grids[k] for k in sel_idx]),
                jnp.stack([jnp.asarray(origins[k]) for k in sel_idx]),
                jnp.asarray(all_thetas[sel_idx]),
                pts, valid, float(spec.resolution),
                int(spec.n_linear), int(size), int(stride),
            )
        )
        ubs[idxs] = got[: len(idxs)]
        c0 += csize

    # phase 2: candidates in descending-bound order; per device call,
    # batch up to `chunk` candidates' surviving rotations. The running
    # best tightens the floor BETWEEN calls (the sequential path's
    # pruning at chunk granularity), so both paths accept the same
    # match: every rotation above min_score on the winning candidate
    # is still scored.
    order = _np.argsort(ubs.max(axis=1))[::-1]
    best = None  # (score, cand_idx, theta, ox, oy)
    pos = 0
    cur_chunk = 1  # ramp 1 -> 2 -> 4 ... : the first (highest-bound)
    # candidate alone usually sets a tight floor that guts the rest
    while pos < C:
        floor = max(min_score, best[0] if best else -1.0)
        if ubs[int(order[pos])].max() <= floor:
            break  # bound-ordered: nothing below can beat the floor
        batch = []
        while pos < C and len(batch) < cur_chunk:
            ci = int(order[pos])
            if ubs[ci].max() <= floor:
                break
            sel = _np.nonzero(ubs[ci] > floor)[0]
            pos += 1
            if len(sel):
                batch.append((ci, sel))
        cur_chunk = min(2 * cur_chunk, chunk)
        if not batch:
            continue
        Rb = 8
        while Rb < max(len(sel) for _, sel in batch):
            Rb *= 2
        # memory/precision bound: at most ~128 rotation-planes per call
        eff = max(1, min(len(batch), 128 // Rb))
        for b0 in range(0, len(batch), eff):
            sub = batch[b0 : b0 + eff]
            csize = 1
            while csize < len(sub):
                csize *= 2
            sub_pad = sub + [sub[0]] * (csize - len(sub))
            th = _np.stack(
                [
                    all_thetas[ci][
                        _np.concatenate(
                            [sel,
                             _np.full(Rb - len(sel), sel[0], _np.int64)]
                        )
                    ]
                    for ci, sel in sub_pad
                ]
            )
            scores = _np.asarray(
                correlate_rotations_batch(
                    jnp.stack([score_grids[ci] for ci, _ in sub_pad]),
                    jnp.stack(
                        [jnp.asarray(origins[ci]) for ci, _ in sub_pad]
                    ),
                    pts, valid, jnp.asarray(th),
                    float(spec.resolution), int(spec.n_linear),
                    int(size), int(fft_size),
                )
            )  # (csize, Rb, L, L)
            for b, (ci, sel) in enumerate(sub):
                k, i, j = _argmax_center_tiebreak(
                    scores[b], spec.n_linear
                )
                sc = float(scores[b, k, i, j])
                if sc > max(min_score, best[0] if best else -1.0):
                    best = (
                        sc, ci, float(th[b, k]),
                        (int(i) - spec.n_linear) * spec.resolution,
                        (int(j) - spec.n_linear) * spec.resolution,
                    )
    if best is None:
        return None, 0.0, None, None
    sc, ci, th_, ox, oy = best
    pose = _np.array([ox, oy, th_])
    th0 = float(init_thetas[ci])
    cov = _np.asarray(
        window_cov(
            score_grids[ci], origins[ci], pts, valid,
            jnp.asarray(pose, jnp.float32), jnp.float32(th0),
            jnp.float32(spec.angular_step),
            jnp.float32(th0 - spec.n_angular * spec.angular_step),
            jnp.float32(th0 + spec.n_angular * spec.angular_step),
            float(spec.resolution), int(size),
        )
    ).astype(_np.float64)
    return ci, sc, pose, cov


# ---------------------------------------------------------------------------
# small-window exhaustive matching (per-keyframe pins)
# ---------------------------------------------------------------------------


def pin_bound_host(
    pooled_np,  # (S, S) numpy level-(depth-1) forward-max pooled grid
    origin,  # (2,)
    resolution: float,
    points,  # (N, 2) numpy
    thetas,  # (R,) numpy
    n_linear: int,
    stride: int = None,
):
    """Exact upper bound on the best correlate_window_host score over
    the +-n_linear offset window, one (or, see below, 2x2) pooled
    lookup per (rotation, point) -- the branch-and-bound root bound
    applied to the per-keyframe pin search. pooled_np holds the
    forward-looking max over a (stride+1)-wide window
    (grid.precompute_pyramid). correlate_window_host reads the level-0
    score grid, itself a 2-wide forward max of score0, so the
    +-n_linear window touches score0 cells in
    [c - n_linear, c + n_linear + 1] -- a (2*n_linear + 2)-cell span
    per axis. A single lookup at c - n_linear covers stride+1 cells,
    enough only when stride >= 2*n_linear + 1; at stride == 2*n_linear
    (the DEFAULT config: depth 5 -> stride 16, n_linear 8) the span
    overhangs by one cell and the bound could fall BELOW the true
    window score, silently pruning valid pins. When `stride` is given
    and < 2*n_linear + 1, the lookup becomes an elementwise max over
    the 2x2 {c, c+1} offsets, extending coverage to stride+2 cells --
    exact for stride >= 2*n_linear (caller must still check that).
    Lookups are clipped into the grid and floored at PMIN; both only
    ever RAISE the bound, so pruning stays exact. ~97% of keyframes
    never re-observe the target submap (their points land on unknown
    cells, bound ~ PMIN << kf_min_score), so this skips the full
    window correlation for nearly all of them."""
    S = pooled_np.shape[0]
    c, s = np.cos(thetas), np.sin(thetas)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = np.floor((px - origin[0]) / resolution).astype(np.int64) - n_linear
    cy = np.floor((py - origin[1]) / resolution).astype(np.int64) - n_linear
    cx = np.clip(cx, 0, S - 1)
    cy = np.clip(cy, 0, S - 1)
    vals = pooled_np[cx, cy]
    if stride is not None and stride < 2 * n_linear + 1:
        cx1 = np.minimum(cx + 1, S - 1)
        cy1 = np.minimum(cy + 1, S - 1)
        vals = np.maximum(vals, pooled_np[cx1, cy])
        vals = np.maximum(vals, pooled_np[cx, cy1])
        vals = np.maximum(vals, pooled_np[cx1, cy1])
    vals = np.maximum(vals, PMIN)
    return float(vals.mean(axis=1).max())


@functools.partial(
    jax.jit, static_argnames=("n_linear", "extra")
)
def pin_bounds_batch(
    pooled_stack,  # (M, S, S) stacked level-(depth-1) pooled grids
    sm_ids,  # (Kp,) int32 per-pin submap index into the stack
    origins,  # (Kp, 2) grid origin minus the pin seed xy
    points,  # (Kp, N, 2)
    point_valid,  # (Kp, N) bool
    thetas,  # (Kp, R)
    resolution,
    n_linear: int,
    extra: bool,
):
    """Device-batched pin_bound_host: exact upper bounds for a batch
    of per-keyframe pin candidates in ONE device call. The accelerator
    path of backend._keyframe_edges uses this instead of pulling every
    submap's grids to the host (round-3/4 profiling: blocking D2H of
    the pin grids through the remote-TPU tunnel cost 76+ s per
    663-frame run, and copy_to_host_async stalls the tunnel outright).
    `extra` = the 2x2 coverage lookups for stride == 2*n_linear (see
    pin_bound_host). Returns (Kp,) bounds."""
    S = pooled_stack.shape[1]
    c, s = jnp.cos(thetas), jnp.sin(thetas)  # (Kp, R)
    px = (
        c[:, :, None] * points[:, None, :, 0]
        - s[:, :, None] * points[:, None, :, 1]
    )  # (Kp, R, N)
    py = (
        s[:, :, None] * points[:, None, :, 0]
        + c[:, :, None] * points[:, None, :, 1]
    )
    cx = jnp.floor(
        (px - origins[:, None, None, 0]) / resolution
    ).astype(jnp.int32) - n_linear
    cy = jnp.floor(
        (py - origins[:, None, None, 1]) / resolution
    ).astype(jnp.int32) - n_linear
    cx = jnp.clip(cx, 0, S - 1)
    cy = jnp.clip(cy, 0, S - 1)

    def look(dx, dy):
        gx = jnp.minimum(cx + dx, S - 1)
        gy = jnp.minimum(cy + dy, S - 1)
        return pooled_stack[sm_ids[:, None, None], gx, gy]

    vals = look(0, 0)
    if extra:
        vals = jnp.maximum(vals, look(1, 0))
        vals = jnp.maximum(vals, look(0, 1))
        vals = jnp.maximum(vals, look(1, 1))
    vals = jnp.maximum(vals, PMIN)
    vals = jnp.where(point_valid[:, None, :], vals, 0.0)
    n = jnp.maximum(jnp.sum(point_valid, axis=-1), 1).astype(vals.dtype)
    return jnp.max(jnp.sum(vals, axis=-1) / n[:, None], axis=-1)


def correlate_window_host(
    score_grid,  # (S, S) numpy level-0 (dilated) score grid
    origin,  # (2,)
    resolution: float,
    points,  # (N, 2) numpy
    thetas,  # (R,) numpy
    n_linear: int,
):
    """Exhaustive (rotation x offset) scores for a SMALL window, direct
    numpy gathers on the host. For per-keyframe pin windows (~+-7
    cells, ~33 rotations, <=128 points) the work is ~0.5M lookups --
    far below FFT break-even, and cheap enough to run per keyframe on
    the host even when the backend computes on TPU. Same score
    function as correlate_rotations (mean of grid values, PMIN
    out-of-grid). Returns (R, W, W)."""
    S = score_grid.shape[0]
    c, s = np.cos(thetas), np.sin(thetas)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = np.floor((px - origin[0]) / resolution).astype(np.int64)
    cy = np.floor((py - origin[1]) / resolution).astype(np.int64)
    d = np.arange(-n_linear, n_linear + 1)
    gx = cx[:, :, None] + d[None, None, :]  # (R, N, W)
    gy = cy[:, :, None] + d[None, None, :]
    inx = (gx >= 0) & (gx < S)
    iny = (gy >= 0) & (gy < S)
    vx = np.clip(gx, 0, S - 1)
    vy = np.clip(gy, 0, S - 1)
    # vals[r, p, ox, oy] = grid[cx+ox, cy+oy]
    vals = score_grid[vx[:, :, :, None], vy[:, :, None, :]]
    vals = np.where(
        inx[:, :, :, None] & iny[:, :, None, :], vals, PMIN
    )
    return vals.mean(axis=1)  # (R, W, W)


def score_volume_cov(
    scores,  # (R, W, W) numpy score volume (full search window)
    thetas,  # (R,)
    init_theta: float,
    resolution: float,
    n_linear: int,
):
    """Band-weighted second-moment covariance over a full small score
    volume -- window_cov's estimator (see its docstring for the
    calibration rationale) applied to an already-computed volume
    instead of re-scoring device-side. Moments are about the weighted
    mean, so the coordinate origin cancels."""
    smax = scores.max()
    smin = scores.min()
    delta = max(0.05, 0.15 * (smax - smin))
    w = np.clip(scores - (smax - delta), 0.0, None) + 1e-9
    d = (np.arange(scores.shape[1]) - n_linear) * resolution
    X = np.stack(
        np.broadcast_arrays(
            d[None, :, None],
            d[None, None, :],
            (thetas - init_theta)[:, None, None],
        ),
        axis=-1,
    ).reshape(-1, 3)
    sflat = w.reshape(-1)
    ssum = sflat.sum()
    u = (X * sflat[:, None]).sum(0) / ssum
    K = np.einsum("ni,nj,n->ij", X, X, sflat) / ssum
    cov = K - np.outer(u, u)
    step = thetas[1] - thetas[0] if len(thetas) > 1 else 0.01
    return cov + np.diag(
        [
            (2.5 * resolution) ** 2,
            (2.5 * resolution) ** 2,
            (2.5 * step) ** 2,
        ]
    )


# ---------------------------------------------------------------------------
# fused single-call matcher (TPU product path)
#
# Round-2 profiling on v5e through the remote tunnel: the chunked
# multi-call matcher spent 597 ms in the offset-scan upper-bound phase
# (element gathers serialize on TPU), 172 ms re-scoring the covariance
# window (same disease), ~28 ms in the histogram scatter, and ~30-50 ms
# per host sync. Total 852 ms for a 16-candidate set -- 8x SLOWER than
# a 2-thread native B&B. Every piece below is the MXU/VPU-native
# replacement:
#   - histograms are one-hot einsums (a (N x S) @ (N x S) batched
#     matmul -- 2.6 ms for 128 planes vs 28 ms scatter),
#   - rotation/offset-block upper bounds are a tiny dense correlation
#     of a stride-quantized histogram against a double-width pooled
#     grid (3.6 ms for all 3600 planes vs 597 ms),
#   - only the top-K (candidate, rotation) planes by bound get exact
#     FFT correlation (19.8 ms at K=128, fft 448^2),
#   - the covariance window re-uses the same hist+FFT machinery on 16
#     rotation planes instead of 11M pointwise gathers,
#   - everything runs in ONE jit call; the only host sync transfers
#     ~50 bytes (score, pose, cov, argmax, exactness flag).
# Exactness: the coarse bounds are true upper bounds (doubled pooled
# window absorbs the cell quantization), so if the best excluded
# plane's bound <= max(best_score, min_score), the truncated search
# provably found the same accepted match as the exhaustive one; the
# returned flag reports this, and the host wrapper widens K (2x) and
# reruns in the rare other case.
# ---------------------------------------------------------------------------


def _plane_cells(points, thetas, origins, resolution):
    """Rotate points by per-plane thetas and quantize to grid cells.
    thetas (K,), origins (K,2), points (N,2) -> cx, cy (K,N) int32."""
    c, s = jnp.cos(thetas), jnp.sin(thetas)
    px = c[:, None] * points[None, :, 0] - s[:, None] * points[None, :, 1]
    py = s[:, None] * points[None, :, 0] + c[:, None] * points[None, :, 1]
    cx = jnp.floor((px - origins[:, None, 0]) / resolution).astype(jnp.int32)
    cy = jnp.floor((py - origins[:, None, 1]) / resolution).astype(jnp.int32)
    return cx, cy


def _hist_onehot(cx, cy, point_valid, size: int, out_size: int):
    """Cell-count histograms as a one-hot batched matmul (MXU path;
    replaces scatter-add, which TPU lowers to a serial loop).
    cx, cy (K, N) -> hist (K, out_size, out_size) f32, plus n_in (K,).
    bf16 one-hots are exact: products are 0/1, accumulation is f32."""
    inb = (
        point_valid[None, :]
        & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    )
    ii = jnp.arange(size)
    ex = ((cx[:, :, None] == ii) & inb[:, :, None]).astype(jnp.bfloat16)
    ey = (cy[:, :, None] == ii).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "kpi,kpj->kij", ex, ey, preferred_element_type=jnp.float32
    )
    pad = out_size - size
    if pad > 0:
        hist = jnp.pad(hist, ((0, 0), (0, pad), (0, pad)))
    return hist, jnp.sum(inb, axis=1)


def _corr_planes(hist, Fg, n_in, n_valid, n_linear: int, fft_size: int):
    """Exact correlation scores for K planes given pre-transformed
    grids Fg (K, F, F//2+1). Returns (K, W, W) mean scores with the
    out-of-grid PMIN correction of correlate_rotations."""
    Fh = _rfft2_chunked(hist)
    corr = _irfft2_chunked(jnp.conj(Fh) * Fg, s=(fft_size, fft_size))
    corr = jnp.roll(corr, (n_linear, n_linear), axis=(1, 2))[
        :, : 2 * n_linear + 1, : 2 * n_linear + 1
    ]
    corr = corr + (n_valid - n_in)[:, None, None] * PMIN
    return corr / n_valid


# ---------------------------------------------------------------------------
# FFT-free MXU correlator (VERDICT r4 #1)
#
# The FFT path above runs on the VPU (transposes + twiddle gathers)
# and measured 0.06% MFU against the MXU. The same cross-correlation
# is computed here entirely as matmuls:
#
#   corr(dx,dy) = (1/F^2) sum_{u,v} conj(Fh)[u,v] Fg[u,v]
#                                   e^{2 pi i (u dx + v dy)/F}
#
# - conj(Fh)[u,v] = sum_n e^{+2 pi i (u cx_n + v cy_n)/F} is a
#   NONUNIFORM DFT of the (sparse!) query points: one complex outer
#   contraction over the N points -- 4 real einsums on the MXU, no
#   histogram scatter, no FFT. Phases are exact integer mods, so f32
#   trig sees arguments only in [0, 2 pi).
# - Fg is the grid's full (F, F) spectrum, computed ONCE per submap
#   and cached (grid_spectrum below) -- exactly Cartographer's
#   precompute-at-fix_submap discipline
#   (fast_correlative_scan_matcher_2d.cc:454-468).
# - The inverse transform is evaluated only on the (2L+1)^2 search
#   window (a partial DFT): two complex matmuls instead of a full
#   F^2 inverse FFT.
#
# Identical math to _corr_planes (same circular padding, same PMIN
# out-of-grid correction), different factorization; equivalence is
# pinned by tests/test_fused_match.py.
# ---------------------------------------------------------------------------

_HI = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("fft_size", "size"))
def grid_spectrum(score_grids, fft_size: int, size: int):
    """Half-width (C, F, F//2+1) complex spectrum of zero-padded score
    grids (hermitian symmetry supplies the other half inside the
    correlator); computed once per submap and reused across every
    query that matches against it."""
    C = score_grids.shape[0]
    gpad = jnp.zeros((C, fft_size, fft_size), jnp.float32)
    gpad = gpad.at[:, :size, :size].set(score_grids)
    return _rfft2_chunked(gpad)  # (C, F, F//2+1)


def _corr_planes_nudft(
    Fg,  # (K, F, F//2+1) complex64: half spectra of the K planes' grids
    cx, cy,  # (K, N) int32 cell coordinates
    point_valid,  # (N,) bool
    n_valid,
    n_linear: int,
    size: int,
    fft_size: int,
):
    """MXU replacement for _hist_onehot + _corr_planes: exact (K, W, W)
    mean scores, same values as the FFT path to fp tolerance.

    Hermitian halving: the grid spectrum is stored half-width; the
    missing columns v in [F2, F) satisfy
    S_full[u, v] = conj(S[(F-u) % F, F-v]), so the inverse transform's
    v-sum splits into the stored half plus a row-flipped conjugate
    partial sum -- two half-width matmuls instead of one full-width,
    while the four forward NUDFT einsums (the dominant cost) halve
    outright."""
    F = fft_size
    F2 = F // 2 + 1
    M = F - F2  # columns recovered by symmetry: v' in [1, M]
    inb = (
        point_valid[None, :]
        & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    )
    n_in = jnp.sum(inb, axis=1)
    # clamp before phase math: masked-out points otherwise feed huge
    # integers into the u*c products
    cxs = jnp.clip(cx, 0, size - 1)
    cys = jnp.clip(cy, 0, size - 1)
    u = jnp.arange(F, dtype=jnp.int32)
    v = jnp.arange(F2, dtype=jnp.int32)
    w = jnp.float32(2.0 * math.pi / F)
    # forward NUDFT factors e^{+2 pi i u c / F}; exact integer phases
    phx = ((cxs[..., None] * u) % F).astype(jnp.float32) * w  # (K,N,F)
    phy = ((cys[..., None] * v) % F).astype(jnp.float32) * w  # (K,N,F2)
    m = inb.astype(jnp.float32)[..., None]
    axr = jnp.cos(phx) * m
    axi = jnp.sin(phx) * m
    ayr = jnp.cos(phy)
    ayi = jnp.sin(phy)
    ein = functools.partial(jnp.einsum, precision=_HI)
    # conj(Fh)[k,u,v] = sum_n (axr+i axi)[k,n,u] * (ayr+i ayi)[k,n,v]
    fhr = ein("knu,knv->kuv", axr, ayr) - ein("knu,knv->kuv", axi, ayi)
    fhi = ein("knu,knv->kuv", axr, ayi) + ein("knu,knv->kuv", axi, ayr)
    gr = jnp.real(Fg)
    gi = jnp.imag(Fg)
    sr = fhr * gr - fhi * gi  # (K, F, F2)
    si = fhr * gi + fhi * gr
    corr = _partial_idft(sr, si, n_linear, fft_size)
    corr = corr + (n_valid - n_in)[:, None, None] * PMIN
    return corr / n_valid


def _partial_idft(sr, si, n_linear: int, fft_size: int):
    """Inverse 2-D DFT of a half-width spectrum (K, F, F//2+1),
    evaluated ONLY on the (2L+1)^2 search window -- matmuls instead of
    a full inverse FFT. Real output; the missing spectrum half enters
    through hermitian symmetry:
    T[u,dy] = sum_{v<F2} S[u,v] e^{+i phi_v dy}
            + sum_{v'=1..M} conj(S[(F-u)%F, v']) e^{-i phi_v' dy}."""
    F = fft_size
    F2 = F // 2 + 1
    M = F - F2
    u = jnp.arange(F, dtype=jnp.int32)
    v = jnp.arange(F2, dtype=jnp.int32)
    w = jnp.float32(2.0 * math.pi / F)
    ein = functools.partial(jnp.einsum, precision=_HI)
    d = jnp.arange(-n_linear, n_linear + 1, dtype=jnp.int32)
    phd = ((v[:, None] * d[None, :]) % F).astype(jnp.float32) * w
    er = jnp.cos(phd)  # (F2, W)
    ei = jnp.sin(phd)
    rows = (-jnp.arange(F)) % F
    fr = sr[:, rows, 1 : M + 1]  # Re conj(S[flip]) = Re S[flip]
    fi = -si[:, rows, 1 : M + 1]  # Im conj(S[flip])
    erm = er[1 : M + 1]
    eim = ei[1 : M + 1]
    tr = (
        ein("kuv,vw->kuw", sr, er) - ein("kuv,vw->kuw", si, ei)
        + ein("kuv,vw->kuw", fr, erm) + ein("kuv,vw->kuw", fi, eim)
    )
    ti = (
        ein("kuv,vw->kuw", sr, ei) + ein("kuv,vw->kuw", si, er)
        - ein("kuv,vw->kuw", fr, eim) + ein("kuv,vw->kuw", fi, erm)
    )
    phu = ((u[:, None] * d[None, :]) % F).astype(jnp.float32) * w
    eur = jnp.cos(phu)  # (F, W)
    eui = jnp.sin(phu)
    return (
        ein("kuw,ux->kxw", tr, eur) - ein("kuw,ux->kxw", ti, eui)
    ) / jnp.float32(F * F)


def _hist_onehot_masked(cx, cy, valid, size: int, out_size: int):
    """_hist_onehot with a PER-PLANE validity mask (K, N)."""
    inb = (
        valid & (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)
    )
    ii = jnp.arange(size)
    ex = ((cx[:, :, None] == ii) & inb[:, :, None]).astype(jnp.bfloat16)
    ey = ((cy[:, :, None] == ii)).astype(jnp.bfloat16)
    hist = jnp.einsum(
        "kpi,kpj->kij", ex, ey, preferred_element_type=jnp.float32
    )
    pad = out_size - size
    if pad > 0:
        hist = jnp.pad(hist, ((0, 0), (0, pad), (0, pad)))
    return hist, jnp.sum(inb, axis=1)


def _corr_planes_hist(
    Fg,  # (K, F, F//2+1) complex64 grid spectra
    cx, cy,  # (K, N)
    valid,  # (K, N) per-plane point mask
    n_valid,  # (K,)
    n_linear: int,
    size: int,
    fft_size: int,
):
    """Many-plane/small-window exact correlator: MXU one-hot histogram
    + FFT forward (cost independent of the point count after the
    histogram collapse) + partial matmul inverse. Complements
    _corr_planes_nudft, whose forward factors scale with
    planes x points x F and become HBM-bound for hundreds of planes
    (measured ~3 s/chunk on the 520-plane pin screen vs ~80 ms for
    this path). Same values as _corr_planes to fp tolerance."""
    hist, n_in = _hist_onehot_masked(cx, cy, valid, size, fft_size)
    Fh = _rfft2_chunked(hist)
    S = jnp.conj(Fh) * Fg
    corr = _partial_idft(
        jnp.real(S).astype(jnp.float32),
        jnp.imag(S).astype(jnp.float32), n_linear, fft_size,
    )
    corr = corr + (n_valid - n_in)[:, None, None] * PMIN
    return corr / n_valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_linear", "size", "fft_size", "stride", "K", "w_lin", "w_rot"
    ),
)
def fused_match(
    score_grids,  # (C, S, S) dilated level-0 score grids
    pooled_grids,  # (C, S, S) level-(depth-1) pooled grids (window stride+1)
    origins,  # (C, 2)
    thetas,  # (C, R) per-candidate rotation sets
    live,  # (C,) bool: padding candidates = False
    points,  # (N, 2)
    point_valid,  # (N,)
    init_thetas,  # (C,) search-center rotations (for the cov window)
    angular_step,
    min_score,
    resolution: float,
    n_linear: int,
    size: int,
    fft_size: int,
    stride: int,
    K: int,
    w_lin: int = 31,
    w_rot: int = 5,
    plane_live=None,  # (C, R) bool: planes still in play (paging)
    spectra=None,  # (C, F, F) complex64 cached grid spectra -> MXU path
):
    """One-call exhaustive-equivalent candidate-set match.

    With `spectra` (the per-submap full grid spectra from
    grid_spectrum, cached across queries), the exact stages C/E run
    the FFT-free MXU correlator (_corr_planes_nudft); without it they
    fall back to the VPU FFT path. Same scores either way.

    Returns (best_score, pose (3,), cov (3,3), best_cand, kth_bound,
    scored_planes (K,) int32). Exactness contract: every plane outside
    the top-K has coarse upper bound <= kth_bound, so when kth_bound
    <= max(best_score, min_score) no unscored plane can change the
    accept decision. When it can, the host wrapper calls again with
    `plane_live` masking out `scored_planes` -- the SAME compiled
    shape pages through the next K planes by bound (round-3's
    K-widening changed the static K and recompiled, costing ~60 s per
    widening through the remote-compile tunnel -- the two largest
    backend ticks of the round-3 TPU profile)."""
    C, R = thetas.shape
    n_valid = jnp.maximum(jnp.sum(point_valid), 1).astype(jnp.float32)

    # ---- stage A: coarse upper bounds for all C*R planes ----
    # Quantize cells to stride blocks; bound = mean of a pooled grid
    # whose value at block b is max(score) over [s*b, s*b + 2s-1]^2 --
    # built from the existing (s+1)-window pooled pyramid level by a
    # 2x2 max over samples at s*m and s*m + s-1. Then a dense
    # correlation over all offset BLOCKS (the offset lattice quantized
    # the same way), max over blocks = the per-plane bound.
    P = size // stride  # coarse blocks per side
    # offset block range: floor((phi + o)/stride) for o in [-L, L] and
    # cell phase phi in [0, stride) -- the quantized cell can land one
    # block further than floor(L/stride)
    ko_lo = -((n_linear + stride - 1) // stride)
    ko_hi = (n_linear + stride - 1) // stride
    PAD = -ko_lo  # coarse-grid padding so shifted lookups stay in-bounds
    PADH = ko_hi
    # coarse pooled grid (C, P, P): max over the two stride-phase samples
    m_idx = jnp.arange(P) * stride
    m2_idx = jnp.minimum(m_idx + stride - 1, size - 1)
    pc = jnp.maximum(
        jnp.maximum(
            pooled_grids[:, m_idx][:, :, m_idx],
            pooled_grids[:, m2_idx][:, :, m_idx],
        ),
        jnp.maximum(
            pooled_grids[:, m_idx][:, :, m2_idx],
            pooled_grids[:, m2_idx][:, :, m2_idx],
        ),
    )
    P2 = P + PAD + PADH
    pc = jnp.pad(pc, ((0, 0), (PAD, PADH), (PAD, PADH)),
                 constant_values=PMIN)

    # coarse histograms for all C*R planes
    th_flat = thetas.reshape(-1)
    org_flat = jnp.repeat(origins, R, axis=0)
    ccx, ccy = _plane_cells(points, th_flat, org_flat, resolution)
    bcx, bcy = (
        jnp.floor_divide(ccx, stride) + PAD,
        jnp.floor_divide(ccy, stride) + PAD,
    )
    chist, cn_in = _hist_onehot(bcx, bcy, point_valid, P2, P2)
    # correlate against all KO x KO shifted coarse grids (tiny einsum);
    # shifts are static slices of a PMIN-padded copy (roll would wrap
    # garbage into the borders and break the upper-bound property)
    pc_sh = jnp.pad(pc, ((0, 0), (PAD, PADH), (PAD, PADH)),
                    constant_values=PMIN)
    shifts = jnp.stack(
        [
            pc_sh[:, PAD + dx : PAD + dx + P2,
                  PAD + dy : PAD + dy + P2].reshape(C, -1)
            for dx in range(ko_lo, ko_hi + 1)
            for dy in range(ko_lo, ko_hi + 1)
        ],
        axis=-1,
    )  # (C, P2*P2, KO*KO)
    b = jnp.einsum(
        "crf,cfo->cro",
        chist.reshape(C, R, -1),
        shifts,
        precision=jax.lax.Precision.DEFAULT,
    )
    bounds = jnp.max(b, axis=-1)  # (C, R) sum over in-coarse points
    bounds = (bounds + (n_valid - cn_in.reshape(C, R)) * PMIN) / n_valid
    bounds = jnp.where(live[:, None], bounds, -jnp.inf)
    if plane_live is not None:
        bounds = jnp.where(plane_live, bounds, -jnp.inf)

    # ---- stage B: top-K planes by bound ----
    flat_bounds = bounds.reshape(-1)
    top_vals, top_idx = jax.lax.top_k(flat_bounds, K)
    cand_k = top_idx // R
    theta_k = th_flat[top_idx]
    org_k = origins[cand_k]

    # ---- stage C: exact correlation for the K planes ----
    kcx, kcy = _plane_cells(points, theta_k, org_k, resolution)
    if spectra is not None:
        # FFT-free MXU path: cached full spectra + NUDFT einsums
        Fg_all = None
        corr = _corr_planes_nudft(
            spectra[cand_k], kcx, kcy, point_valid, n_valid,
            n_linear, size, fft_size,
        )
    else:
        gpad = jnp.zeros((C, fft_size, fft_size), jnp.float32)
        gpad = gpad.at[:, :size, :size].set(score_grids)
        Fg_all = _rfft2_chunked(gpad)  # (C, F, F//2+1)
        Fg = Fg_all[cand_k]
        hist, n_in = _hist_onehot(kcx, kcy, point_valid, size, fft_size)
        corr = _corr_planes(hist, Fg, n_in, n_valid, n_linear, fft_size)
    # mask planes whose bound says they cannot win (exactness is keyed
    # off bounds, and padding planes carry -inf bounds)
    corr = jnp.where(
        (top_vals > -jnp.inf)[:, None, None], corr, -jnp.inf
    )

    # ---- stage D: argmax with centered tie-break ----
    W = 2 * n_linear + 1
    m = jnp.max(corr)
    d = jnp.arange(W) - n_linear
    r2 = (d[:, None] ** 2 + d[None, :] ** 2).astype(jnp.float32)
    # score-agnostic within the band: see _argmax_center_tiebreak
    flat_idx = jnp.argmax(
        jnp.where(
            corr >= m - SCORE_NOISE_BAND, -r2[None], -jnp.inf
        ).reshape(-1)
    )
    kk = flat_idx // (W * W)
    rem = flat_idx % (W * W)
    oi = rem // W - n_linear
    oj = rem % W - n_linear
    best_score = corr.reshape(-1)[flat_idx]
    best_cand = cand_k[kk]
    best_theta = theta_k[kk]
    pose = jnp.stack(
        [
            oi.astype(jnp.float32) * resolution,
            oj.astype(jnp.float32) * resolution,
            best_theta,
        ]
    )

    # exactness floor: planes outside this pass's top-K have bound <=
    # kth (the host wrapper compares against max(best, min_score))
    kth = top_vals[K - 1]

    # ---- stage E: covariance window via the same hist+FFT machinery ----
    # 2*w_rot+1 rotation planes around the winner (clipped to the
    # search range like window_cov), translation window +-w_lin cells
    # around the winning offset.
    th0 = init_thetas[best_cand]
    th_lo = thetas[best_cand, 0]
    th_hi = thetas[best_cand, R - 1]
    dr = jnp.arange(-w_rot, w_rot + 1)
    cth = jnp.clip(best_theta + dr * angular_step, th_lo, th_hi)
    corg = jnp.broadcast_to(origins[best_cand], (2 * w_rot + 1, 2))
    wcx, wcy = _plane_cells(points, cth, corg, resolution)
    if spectra is not None:
        Fgw_full = jnp.broadcast_to(
            spectra[best_cand][None],
            (2 * w_rot + 1,) + spectra.shape[1:],
        )
        wcorr_full = _corr_planes_nudft(
            Fgw_full, wcx, wcy, point_valid, n_valid,
            n_linear, size, fft_size,
        )  # (2*w_rot+1, W, W)
    else:
        whist, wn_in = _hist_onehot(wcx, wcy, point_valid, size, fft_size)
        Fgw = jnp.broadcast_to(
            Fg_all[best_cand][None], (2 * w_rot + 1,) + Fg_all.shape[1:]
        )
        wcorr_full = _corr_planes(
            whist, Fgw, wn_in, n_valid, n_linear, fft_size
        )  # (2*w_rot+1, W, W)
    dl = jnp.arange(-w_lin, w_lin + 1)
    xi = jnp.clip(oi + n_linear + dl, 0, W - 1)
    yi = jnp.clip(oj + n_linear + dl, 0, W - 1)
    scores_w = wcorr_full[:, xi][:, :, yi]  # (R2, L2, L2)
    smax = jnp.max(scores_w)
    smin = jnp.min(scores_w)
    delta = jnp.maximum(0.05, 0.15 * (smax - smin))
    weights = jnp.clip(scores_w - (smax - delta), 0.0, None) + 1e-9
    X = jnp.stack(
        jnp.broadcast_arrays(
            (pose[0] + (xi - n_linear - oi).astype(jnp.float32)
             * resolution)[None, :, None],
            (pose[1] + (yi - n_linear - oj).astype(jnp.float32)
             * resolution)[None, None, :],
            (cth - th0)[:, None, None],
        ),
        axis=-1,
    ).reshape(-1, 3)
    sflat = weights.reshape(-1)
    ssum = jnp.sum(sflat)
    u = jnp.sum(X * sflat[:, None], axis=0)
    Kmom = jnp.einsum("ni,nj,n->ij", X, X, sflat)
    inv_s = 1.0 / ssum
    cov = inv_s * Kmom - inv_s * inv_s * jnp.outer(u, u)
    cov = cov + jnp.diag(
        jnp.asarray(
            [
                (2.5 * resolution) ** 2,
                (2.5 * resolution) ** 2,
                (2.5 * angular_step) ** 2,
            ],
            cov.dtype,
        )
    )
    return best_score, pose, cov, best_cand, kth, top_idx, bounds


def match_candidates_fused(
    score_grids,
    pooled_grids,
    origins,
    init_thetas,
    points,
    spec: SearchSpec,
    min_score: float,
    stride: int,
    fft_margin_bucket: int = 64,
    K: int = 64,
    c_bucket: int = 16,
    spectra_list=None,  # per-candidate cached grid_spectrum outputs
):
    """Host wrapper over fused_match with the same contract as
    match_candidates_pruned: (best_idx or None, score, pose, cov).

    Exact-stage backend: the FFT-free MXU correlator by default
    (pass cached per-submap spectra via `spectra_list` to skip the
    per-call spectrum build); SLAM_MATCH_EXACT=fft restores the VPU
    FFT path.

    Compiled-shape discipline (the round-4 latency fix): exactly ONE
    fused_match shape is ever compiled per (R, N-bucket). Candidate
    sets larger than c_bucket page through the same kernel in chunks
    of c_bucket (running best carries across chunks as the pruning
    floor), and within a chunk, exactness shortfalls page through the
    next-K planes via the plane_live mask instead of recompiling with
    a larger K. Round 3 did both by reshaping (pow2 candidate growth,
    4x K widening); each new shape cost ~30-90 s of XLA compile
    through the remote-TPU tunnel and produced the 60-70 s backend
    ticks in the e2e profile."""
    import numpy as _np

    size = score_grids[0].shape[0]
    C = len(score_grids)
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = _np.zeros((n_bucket, 2), _np.float32)
    pts[:N] = points
    valid = _np.arange(n_bucket) < N
    pts_d = jnp.asarray(pts)
    valid_d = jnp.asarray(valid)
    R_full = 2 * spec.n_angular + 1
    ks = _np.arange(R_full) - spec.n_angular
    fft_size = size + fft_margin_bucket
    Cp = max(1, c_bucket)
    k_eff = min(K, Cp * R_full)

    best = (None, -_np.inf, None, None)  # (cand, score, pose, cov)
    for lo in range(0, C, Cp):
        chunk = list(range(lo, min(lo + Cp, C)))
        nc = len(chunk)
        thetas = _np.stack(
            [
                (float(init_thetas[i]) + ks * spec.angular_step).astype(
                    _np.float32
                )
                for i in chunk
            ]
            + [_np.zeros(R_full, _np.float32)] * (Cp - nc)
        )
        grids = jnp.stack(
            [score_grids[i] for i in chunk]
            + [score_grids[chunk[0]]] * (Cp - nc)
        )
        pooled = jnp.stack(
            [pooled_grids[i] for i in chunk]
            + [pooled_grids[chunk[0]]] * (Cp - nc)
        )
        origs = jnp.stack(
            [jnp.asarray(origins[i], jnp.float32) for i in chunk]
            + [jnp.asarray(origins[chunk[0]], jnp.float32)] * (Cp - nc)
        )
        live = _np.arange(Cp) < nc
        th0 = _np.asarray(
            [init_thetas[i] for i in chunk] + [0.0] * (Cp - nc),
            _np.float32,
        )
        if os.environ.get("SLAM_MATCH_EXACT", "nudft") == "fft":
            spec_stack = None
        elif spectra_list is not None:
            spec_stack = jnp.stack(
                [spectra_list[i] for i in chunk]
                + [spectra_list[chunk[0]]] * (Cp - nc)
            )
        else:
            spec_stack = grid_spectrum(grids, int(fft_size), int(size))

        def call(mask):
            global FUSED_CALLS
            FUSED_CALLS += 1
            return jax.device_get(
                fused_match(
                    grids, pooled, origs, jnp.asarray(thetas),
                    jnp.asarray(live), pts_d, valid_d,
                    jnp.asarray(th0), jnp.float32(spec.angular_step),
                    jnp.float32(min_score), float(spec.resolution),
                    int(spec.n_linear), int(size), int(fft_size),
                    int(stride), int(k_eff),
                    plane_live=jnp.asarray(mask),
                    spectra=spec_stack,
                )
            )

        plane_live = _np.ones((Cp, R_full), bool)
        winners = []  # per-pass (score, pose, cov, cand)
        bounds_np = None
        while True:
            # the running best across chunks/passes is the floor: a
            # plane whose bound is below it cannot change the outcome
            score, pose, cov, cand, kth, scored, bounds = call(plane_live)
            if bounds_np is None:
                bounds_np = _np.asarray(bounds)
            winners.append(
                (
                    float(score), _np.asarray(pose, _np.float64),
                    _np.asarray(cov, _np.float64), int(cand),
                )
            )
            m_chunk = max(w[0] for w in winners)
            # exact when no remaining plane's bound beats the floor
            if float(kth) <= max(min_score, best[1], m_chunk):
                break
            pl = plane_live.reshape(-1)
            pl[_np.asarray(scored)] = False
            if not pl.any():
                break
            plane_live = pl.reshape(Cp, R_full)
        m_chunk = max(w[0] for w in winners)
        if len(winners) > 1 and m_chunk >= min_score:
            # paging split the noise band across passes, so each
            # per-pass centered tie-break saw a partial pool. Restore
            # the single-call semantics: re-score every band-ELIGIBLE
            # plane (bound within SCORE_NOISE_BAND of the chunk max)
            # in one pool with the SAME compiled shape. If the band
            # outgrows K (pathological self-similarity), fall back to
            # the host lexicographic rule over pass winners -- max
            # score, centered tie-break within the band.
            band = bounds_np >= m_chunk - SCORE_NOISE_BAND
            if band.sum() <= k_eff:
                score, pose, cov, cand, _, _, _ = call(band)
                chunk_best = (
                    float(score), _np.asarray(pose, _np.float64),
                    _np.asarray(cov, _np.float64), int(cand),
                )
            else:
                eligible = [
                    w
                    for w in winners
                    if w[0] >= m_chunk - SCORE_NOISE_BAND
                ]
                chunk_best = min(
                    eligible,
                    key=lambda w: float(w[1][0] ** 2 + w[1][1] ** 2),
                )
        else:
            chunk_best = winners[0]
        if chunk_best[0] > best[1]:
            best = (
                chunk[0] + chunk_best[3], chunk_best[0],
                chunk_best[1], chunk_best[2],
            )
    if best[0] is None or best[1] < min_score:
        return None, best[1], None, None
    return best


def match_candidates_fused_throughput(
    score_grids,
    pooled_grids,
    origins,
    init_thetas,
    points,
    spec: SearchSpec,
    min_score: float,
    stride: int,
    fft_margin_bucket: int = 64,
    K: int = 64,
    depth: int = 8,
    reps: int = 5,
    spectra_list=None,
):
    """Sustained-throughput measurement of the fused matcher: dispatch
    `depth` independent device programs back-to-back, block once, and
    return the per-match wall milliseconds for each of `reps` rounds.

    This is the deployment pattern: the reference consumes loop-closure
    results on a free-running thread (log_runner.cpp:216-239) and
    models/slam.run_realtime does the same, so per-call RPC round-trip
    latency (which dominates through a remote-TPU tunnel) amortizes
    across in-flight matches. Single-chunk candidate sets only (the
    bench case); correctness of the outputs is asserted against the
    synchronous wrapper's score."""
    import time as _time

    import numpy as _np

    size = score_grids[0].shape[0]
    C = len(score_grids)
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = _np.zeros((n_bucket, 2), _np.float32)
    pts[:N] = points
    valid = _np.arange(n_bucket) < N
    pts_d = jnp.asarray(pts)
    valid_d = jnp.asarray(valid)
    R_full = 2 * spec.n_angular + 1
    ks = _np.arange(R_full) - spec.n_angular
    fft_size = size + fft_margin_bucket
    k_eff = min(K, C * R_full)
    thetas = jnp.asarray(
        _np.stack(
            [
                (float(t) + ks * spec.angular_step).astype(_np.float32)
                for t in init_thetas
            ]
        )
    )
    grids = jnp.stack(list(score_grids))
    pooled = jnp.stack(list(pooled_grids))
    origs = jnp.stack([jnp.asarray(o, jnp.float32) for o in origins])
    live = jnp.asarray(_np.ones(C, bool))
    th0 = jnp.asarray(_np.asarray(init_thetas, _np.float32))
    if os.environ.get("SLAM_MATCH_EXACT", "nudft") == "fft":
        spec_stack = None
    elif spectra_list is not None:
        spec_stack = jnp.stack(list(spectra_list))
    else:
        spec_stack = grid_spectrum(grids, int(fft_size), int(size))
    args = (
        grids, pooled, origs, thetas, live, pts_d, valid_d, th0,
        jnp.float32(spec.angular_step), jnp.float32(min_score),
    )
    kw = dict(
        resolution=float(spec.resolution), n_linear=int(spec.n_linear),
        size=int(size), fft_size=int(fft_size), stride=int(stride),
        K=int(k_eff), spectra=spec_stack,
    )
    out = fused_match(*args, **kw)
    jax.block_until_ready(out)
    ref_score = float(out[0])
    times = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        outs = [fused_match(*args, **kw) for _ in range(depth)]
        jax.block_until_ready(outs)
        times.append((_time.perf_counter() - t0) / depth * 1e3)
        for o in outs:
            assert abs(float(o[0]) - ref_score) < 1e-4
    return times


# ---------------------------------------------------------------------------
# host-facing match wrapper
# ---------------------------------------------------------------------------


def match_candidates_sharded(
    score_grids,  # list of level-0 (2x2 dilated) score grids
    origins,
    init_thetas,
    points,  # (N, 2) numpy query returns
    spec: SearchSpec,
    mesh,  # jax.sharding.Mesh with a "cands" axis
    min_score: float,
    fft_margin_bucket: int = 64,
):
    """Multi-chip loop-closure fan-out (SURVEY §2.7 row 1): candidate
    submaps shard across the mesh's "cands" axis -- the TPU-native
    replacement for the reference's ctpl thread pool
    (submap_loop_closer.cpp:158-171). Each device scores its local
    candidates with the exhaustive FFT correlator, then one all_gather
    of the tiny per-candidate (score, pose, cov) results + a replicated
    argmax reduce picks the winner; the grids themselves never move
    between devices.

    Same contract as match_candidates_pruned:
    (best_idx or None, score, pose (3,), cov (3,3)).
    """
    import numpy as _np
    from jax import shard_map
    from jax.sharding import PartitionSpec as Ps

    axis = "cands"
    n_dev = mesh.shape[axis]
    C = len(score_grids)
    Cp = -(-C // n_dev) * n_dev
    size = score_grids[0].shape[0]
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = _np.zeros((n_bucket, 2), _np.float32)
    pts[:N] = points
    valid = _np.arange(n_bucket) < N
    fft_size = size + fft_margin_bucket

    pad = Cp - C
    grids = jnp.stack(list(score_grids) + [score_grids[0]] * pad)
    origs = jnp.stack(
        [jnp.asarray(o, jnp.float32) for o in origins]
        + [jnp.asarray(origins[0], jnp.float32)] * pad
    )
    th0 = jnp.asarray(list(init_thetas) + [0.0] * pad, jnp.float32)
    live = jnp.asarray(_np.arange(Cp) < C)
    Cl = Cp // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(Ps(axis), Ps(axis), Ps(axis), Ps(axis), Ps(), Ps()),
        out_specs=(Ps(), Ps(), Ps(), Ps()),
        check_vma=False,
    )
    def run(grids_l, origs_l, th0_l, live_l, pts_d, valid_d):
        outs = []
        for i in range(Cl):  # static local count; FFTs stay per-device
            scores, thetas = correlate_all(
                grids_l[i], origs_l[i], pts_d, valid_d, th0_l[i],
                jnp.float32(spec.angular_step), float(spec.resolution),
                int(spec.n_angular), int(spec.n_linear), int(size),
                int(fft_size),
            )
            sc, pose, _ = best_candidate_with_cov(
                scores, thetas, th0_l[i],
                jnp.float32(spec.angular_step), float(spec.resolution),
                int(spec.n_linear),
            )
            cov = window_cov(
                grids_l[i], origs_l[i], pts_d, valid_d, pose, th0_l[i],
                jnp.float32(spec.angular_step),
                th0_l[i] - spec.n_angular * spec.angular_step,
                th0_l[i] + spec.n_angular * spec.angular_step,
                float(spec.resolution), int(size),
            )
            outs.append((jnp.where(live_l[i], sc, -jnp.inf), pose, cov))
        s_l = jnp.stack([o[0] for o in outs])
        p_l = jnp.stack([o[1] for o in outs])
        c_l = jnp.stack([o[2] for o in outs])
        # all_gather the tiny results; candidate order is device-major
        # = original order (contiguous block sharding)
        s_all = jax.lax.all_gather(s_l, axis).reshape(-1)
        p_all = jax.lax.all_gather(p_l, axis).reshape(-1, 3)
        c_all = jax.lax.all_gather(c_l, axis).reshape(-1, 3, 3)
        k = jnp.argmax(s_all)
        return s_all[k], p_all[k], c_all[k], k

    sc, pose, cov, k = run(grids, origs, th0, live, jnp.asarray(pts),
                           jnp.asarray(valid))
    sc = float(sc)
    if sc < min_score:
        return None, sc, None, None
    return (
        int(k), sc, _np.asarray(pose).astype(_np.float64),
        _np.asarray(cov).astype(_np.float64),
    )


def match_submap(
    score_grid,  # dilated (2x2 max) score grid, jnp (size,size)
    grid_origin,
    resolution,
    points,  # (N,2) numpy query points (returns only)
    init_theta: float,
    spec: SearchSpec,
    fft_margin_bucket: int = 64,
):
    """One candidate-submap match = reference matchOne
    (submap_loop_closer.cpp:108-115). Returns (score, pose, cov) as
    numpy; gating against min_score happens in the caller."""
    size = score_grid.shape[0]
    N = len(points)
    n_bucket = 256
    while n_bucket < N:
        n_bucket *= 2
    pts = np.zeros((n_bucket, 2), np.float32)
    pts[:N] = points
    valid = np.zeros(n_bucket, bool)
    valid[:N] = True
    fft_size = size + fft_margin_bucket
    scores, thetas = correlate_all(
        score_grid,
        grid_origin,
        jnp.asarray(pts),
        jnp.asarray(valid),
        jnp.float32(init_theta),
        jnp.float32(spec.angular_step),
        float(spec.resolution),
        int(spec.n_angular),
        int(spec.n_linear),
        int(size),
        int(fft_size),
    )
    score, pose, cov = best_candidate_with_cov(
        scores,
        thetas,
        jnp.float32(init_theta),
        jnp.float32(spec.angular_step),
        float(spec.resolution),
        int(spec.n_linear),
    )
    return float(score), np.asarray(pose), np.asarray(cov)
