"""Probability occupancy grids: odds-space hit/miss insertion with
per-scan update semantics, cropping, and max-pool precomputation
pyramids -- the TPU-native replacement for Cartographer's
ProbabilityGrid + MultirangeDataInserter + PrecomputationGrid2D
(reference: src/cartographer_bindings/range_data_inserter_2d.cc:51-94,
fast_correlative_scan_matcher_2d.cc:368-468).

Design (SURVEY.md §7): each submap is a fixed-size jnp grid (static
shape -> one compiled kernel for every submap); ray tracing is a
dense sampled-DDA over (scan, beam, step) with scatter-max dedup; the
per-scan hit-priority rule ("hits beat misses within a scan",
range_data_inserter_2d.cc:90-93) becomes a masked two-phase odds
update inside a lax.scan over scans.

Probability semantics match Cartographer: p clamped to
[PMIN, PMAX] = [0.1, 0.9], unknown cells scored as PMIN, odds-space
multiplicative updates p' = odds^-1(odds(p_obs) * odds(p)).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PMIN = 0.1
PMAX = 0.9
UNKNOWN = 0.0  # stored value for never-observed cells


def odds(p):
    return p / (1.0 - p)


def odds_inv(o):
    return o / (1.0 + o)


class GridSpec(NamedTuple):
    size: int  # cells per side (square, static)
    resolution: float

    @property
    def extent(self) -> float:
        return self.size * self.resolution


class SubmapGrid(NamedTuple):
    """One submap's occupancy grid. origin = world coords of cell (0,0)
    corner, in the submap's anchor frame."""

    probs: jnp.ndarray  # (size, size) float32, 0 = unknown
    origin: jnp.ndarray  # (2,)
    resolution: float


def cell_index(points, origin, resolution):
    """world points (...,2) -> integer cells (...,2) [ix, iy]."""
    return jnp.floor((points - origin) / resolution).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def insert_rays(
    probs,
    origin,
    scan_origins,  # (S, 2) per-scan ray origin
    scan_points,  # (S, B, 2) endpoints
    scan_kind,  # (S, B) int8: 0=invalid, 1=hit, 2=miss(at range_max)
    hit_miss_p,  # (2,) [hit_probability, miss_probability]
    resolution: float,
    n_steps: int,
    size: int,
):
    """Insert S scans into the grid with per-scan hit-priority odds
    updates (range_data_inserter_2d.cc:55-94).

    Misses trace the whole ray; hits mark only the endpoint cell and
    trace the ray as miss up to (not including) the endpoint cell.
    """

    def per_scan(probs, scan):
        s_origin, pts, kind = scan
        valid = kind > 0
        is_hit = kind == 1

        end_cells = cell_index(pts, origin, resolution)  # (B,2)
        # sampled ray: t in (0, 1), excluding endpoint cell for hits
        ts = (jnp.arange(n_steps) + 0.5) / n_steps  # (T,)
        ray_pts = (
            s_origin[None, None, :]
            + (pts - s_origin[None, :])[:, None, :] * ts[None, :, None]
        )  # (B, T, 2)
        ray_cells = cell_index(ray_pts, origin, resolution)  # (B, T, 2)

        # mark endpoint cells of hits
        hit_mask = jnp.zeros((size, size), jnp.bool_)
        oob_h = (
            (end_cells[:, 0] < 0)
            | (end_cells[:, 0] >= size)
            | (end_cells[:, 1] < 0)
            | (end_cells[:, 1] >= size)
        )
        h_idx = jnp.where((is_hit & valid & ~oob_h)[:, None], end_cells, size)
        hit_mask = hit_mask.at[h_idx[:, 0], h_idx[:, 1]].set(
            True, mode="drop"
        )

        # mark miss cells: all ray cells except a hit's endpoint cell
        not_end = ~(
            (ray_cells[..., 0] == end_cells[:, None, 0])
            & (ray_cells[..., 1] == end_cells[:, None, 1])
            & is_hit[:, None]
        )
        m_valid = valid[:, None] & not_end
        oob_m = (
            (ray_cells[..., 0] < 0)
            | (ray_cells[..., 0] >= size)
            | (ray_cells[..., 1] < 0)
            | (ray_cells[..., 1] >= size)
        )
        miss_mask = jnp.zeros((size, size), jnp.bool_)
        m_idx = jnp.where(
            (m_valid & ~oob_m)[..., None], ray_cells, size
        ).reshape(-1, 2)
        miss_mask = miss_mask.at[m_idx[:, 0], m_idx[:, 1]].set(
            True, mode="drop"
        )
        miss_mask = miss_mask & ~hit_mask  # hits beat misses in-scan

        known = probs > 0.0
        p_eff = jnp.where(known, probs, 0.5)

        def apply(p, obs_p):
            newp = odds_inv(odds(obs_p) * odds(p))
            return jnp.clip(newp, PMIN, PMAX)

        # unknown cell first observed: becomes p_obs directly
        # (Cartographer lookup table for unknown = p_obs)
        p_hit = jnp.where(known, apply(p_eff, hit_miss_p[0]), hit_miss_p[0])
        p_miss = jnp.where(known, apply(p_eff, hit_miss_p[1]), hit_miss_p[1])
        probs = jnp.where(
            hit_mask, p_hit, jnp.where(miss_mask, p_miss, probs)
        )
        return probs, None

    probs, _ = jax.lax.scan(
        per_scan, probs, (scan_origins, scan_points, scan_kind)
    )
    return probs


def build_submap_grid(
    range_data,
    spec: GridSpec,
    hit_p: float = 0.7,
    miss_p: float = 0.4,
    n_steps: int = 96,
):
    """Build a fixed-size grid from a RangeData2D (host prep + jit
    insertion). The grid is centered on the data's bounding box like
    GrowAsNeeded + ComputeCroppedGrid (range_data_inserter_2d.cc:35-47).

    Returns SubmapGrid.
    """
    pts = range_data.points
    metas = range_data.meta
    S = len(metas)
    if S == 0 or len(pts) == 0:
        return SubmapGrid(
            jnp.zeros((spec.size, spec.size), jnp.float32),
            jnp.zeros(2, jnp.float32),
            spec.resolution,
        )
    origins = np.stack([m[2] for m in metas])
    all_xy = np.concatenate([pts, origins])
    lo = all_xy.min(0)
    hi = all_xy.max(0)
    center = (lo + hi) / 2.0
    origin = center - spec.extent / 2.0

    # pack scans to bucketed shapes (powers of two) so the jitted
    # insertion kernel compiles once per bucket, not per submap
    counts = []
    prev = 0
    for re_, e_, _ in metas:
        counts.append(e_ - prev)
        prev = e_
    B = 4
    while B < max(max(counts), 1):
        B *= 2
    S_pad = 32
    while S_pad < S:
        S_pad *= 2
    scan_pts = np.zeros((S_pad, B, 2), np.float32)
    scan_kind = np.zeros((S_pad, B), np.int8)
    i = 0
    for s, (re_, e_, _) in enumerate(metas):
        n_hit = re_ - i
        n_all = e_ - i
        scan_pts[s, :n_all] = pts[i:e_]
        scan_kind[s, :n_hit] = 1
        scan_kind[s, n_hit:n_all] = 2
        i = e_
    origins_pad = np.zeros((S_pad, 2), np.float32)
    origins_pad[:S] = origins
    import os

    if os.environ.get("SLAM_PALLAS_INSERT"):
        from .grid_pallas import insert_rays_pallas as _insert
    else:
        _insert = insert_rays
    probs = _insert(
        jnp.zeros((spec.size, spec.size), jnp.float32),
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(origins_pad),
        jnp.asarray(scan_pts),
        jnp.asarray(scan_kind),
        jnp.asarray([hit_p, miss_p], jnp.float32),
        spec.resolution,
        n_steps,
        spec.size,
    )
    return SubmapGrid(probs, jnp.asarray(origin, jnp.float32),
                      spec.resolution)


def insert_range_data(
    probs,  # (size, size) existing grid (jnp)
    grid_origin,  # (2,) grid origin in the grid frame
    range_data,  # RangeData2D (one keyframe's scans, own frame)
    pose,  # (3,) se2 store frame -> grid frame (None = identity)
    spec: GridSpec,
    hit_p: float = 0.7,
    miss_p: float = 0.4,
    n_steps: int = 96,
):
    """Insert one keyframe's range store into an EXISTING grid at
    `pose` -- the incremental active-submap insertion of the
    Cartographer local-SLAM pattern (the reference's batch submap
    build, range_data_inserter_2d.cc:51-94, applied one keyframe at a
    time so each new keyframe can first be MATCHED against the grid
    built from its predecessors). Bucketed shapes: one jit variant per
    (S_pad, B) bucket."""
    from ..utils import se2

    pts = np.asarray(range_data.points)
    metas = range_data.meta
    S = len(metas)
    if S == 0 or len(pts) == 0:
        return probs
    if pose is not None:
        pts = se2.apply(pose, pts)
    origins = np.stack([m[2] for m in metas])
    if pose is not None:
        origins = origins + pose[:2]
    counts = []
    prev = 0
    for re_, e_, _ in metas:
        counts.append(e_ - prev)
        prev = e_
    B = 4
    while B < max(max(counts), 1):
        B *= 2
    S_pad = 8
    while S_pad < S:
        S_pad *= 2
    scan_pts = np.zeros((S_pad, B, 2), np.float32)
    scan_kind = np.zeros((S_pad, B), np.int8)
    i = 0
    for s, (re_, e_, _) in enumerate(metas):
        n_hit = re_ - i
        n_all = e_ - i
        scan_pts[s, :n_all] = pts[i:e_]
        scan_kind[s, :n_hit] = 1
        scan_kind[s, n_hit:n_all] = 2
        i = e_
    origins_pad = np.zeros((S_pad, 2), np.float32)
    origins_pad[:S] = origins
    return insert_rays(
        probs,
        jnp.asarray(grid_origin, jnp.float32),
        jnp.asarray(origins_pad),
        jnp.asarray(scan_pts),
        jnp.asarray(scan_kind),
        jnp.asarray([hit_p, miss_p], jnp.float32),
        spec.resolution,
        n_steps,
        spec.size,
    )


@functools.partial(jax.jit, static_argnums=(1,))
def binomial_blur(x, s: int):
    """(2s+1)-tap separable binomial (approx. Gaussian) blur with PMIN
    border -- the reference's convolve2DFast smoothing kernel
    (fast_correlative_scan_matcher_2d.cc:439-444; their 3x3
    [1/16 1/8 1/16; 1/8 1/4 1/8; 1/16 1/8 1/16] is s=1). The reference
    ships it commented out of the match path; datasets/sweep.py:54-75
    ablates it, and scripts/sweep.py --kernels reproduces that
    ablation here. NOTE: smoothing scales peak scores down (a
    perfectly-aligned point on a 1-cell wall scores ~0.5 instead of
    ~0.9 under s=1), so loop_closure_min_score must be co-tuned."""
    import math as _math

    k = jnp.asarray(
        [_math.comb(2 * s, i) for i in range(2 * s + 1)], x.dtype
    )
    k = k / jnp.sum(k)
    xp = jnp.pad(x, s, constant_values=PMIN)
    x1 = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(xp)
    return jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"))(x1.T).T


def precompute_pyramid(probs, depth: int, smooth: int = 0):
    """Max-pool precomputation stack (PrecomputationGrid2D semantics,
    fast_correlative_scan_matcher_2d.cc:368-468): level i holds, at
    full resolution, the max of scores over the forward-looking
    (2^i + 1)-wide square window at each cell, so that scoring a
    candidate at stride 2^i upper-bounds all finer candidates beneath
    it. NOTE: the reference deliberately widens every level by one vs
    upstream Cartographer (width+1 at fast_correlative_scan_matcher_2d
    .cc:468), so even level 0 is a 2x2 max -- a dilation that makes
    sparse-scan matching more tolerant. Replicated.

    Unknown cells score PMIN. Returns (depth, size, size) float32.

    smooth > 0 applies the reference's (commented-out) binomial
    smoothing kernel of half-width `smooth` to the base scores BEFORE
    pooling, so every pyramid level remains an exact upper bound of
    the (smoothed) level-0 scores and branch-and-bound pruning stays
    exact.
    """
    score0 = jnp.where(probs > 0.0, probs, PMIN)
    if smooth > 0:
        score0 = binomial_blur(score0, smooth)
    levels = []
    for i in range(depth):
        width = (1 << i) + 1
        pooled = jax.lax.reduce_window(
            score0,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(width, width),
            window_strides=(1, 1),
            padding=((0, width - 1), (0, width - 1)),
        )
        levels.append(pooled)
    return jnp.stack(levels)


def grid_to_png(probs, path: str):
    """Dump a grid as a grayscale PNG (observability; replaces the rviz
    occupancy-grid topics, visualizer.cpp:197-208)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(probs)
    img = np.where(arr > 0, 1.0 - arr, 0.5)
    plt.imsave(path, img.T[::-1], cmap="gray", vmin=0, vmax=1)
