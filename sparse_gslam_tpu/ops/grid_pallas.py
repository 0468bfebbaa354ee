"""Pallas TPU kernel for occupancy-grid ray insertion.

The scatter-heavy ray-trace insertion (SURVEY.md §7 hard-part #6) as a
single Pallas kernel: the grid stays resident in VMEM across the whole
multi-scan insertion; scans execute sequentially over the pallas grid
dimension (TPU grid iteration order is sequential, which is exactly the
per-scan hit-priority semantics of the reference inserter,
range_data_inserter_2d.cc:55-94); within a scan, per-sample updates use
an update-marker plane (the Cartographer kUpdateMarker idea:
probability_values.h) so each cell updates at most once per scan with
hits beating misses.

Semantically identical to ops.grid.insert_rays (asserted bit-exact by
tests in interpret mode); avoids materializing the per-scan hit/miss
masks and the XLA scatter round trips -- the whole insertion is one
kernel launch with the grid in VMEM.

Status: opt-in via SLAM_PALLAS_INSERT=1, validated on TPU v5e
hardware (compiles and runs; matches the XLA path bit-exactly in
interpret mode and to fp tolerance on hardware -- lane-masked VPU
arithmetic rounds differently from XLA's scatter fusion at ~1e-7).
NOT the default because it is currently SLOWER than the XLA scatter
path (1.4 ms vs 0.8 ms at S=8/B=16/256^2; 6.8 ms vs 1.6 ms at
S=30/T=128): Mosaic cannot address a dynamic lane position, so each
cell update is a (1, size) row read-modify-write, serializing
beams x steps row ops, while XLA batches all scatters. A faster
design would rasterize each scan densely (cells x beams vectorized
point-to-segment tests) rather than walk rays; revisit if grid
insertion ever dominates a profile (it does not today -- matching
does).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import PMAX, PMIN


def _insert_kernel(
    hm_ref,  # (1, 2) [hit_p, miss_p] SMEM
    origin_ref,  # (1, 2) grid origin SMEM
    res_ref,  # (1, 1) resolution SMEM
    scan_origin_ref,  # (S, 2) all scan origins (SMEM, indexed by scan)
    pts_ref,  # (1, B, 2) endpoints (SMEM: scalar reads at dynamic b)
    kind_ref,  # (1, B, 1) int32 0=invalid 1=hit 2=miss (SMEM)
    probs_ref,  # (G, G) in/out (VMEM, aliased)
    marker_ref,  # (G, G) int32 scratch-like in/out (aliased)
    *,
    n_steps: int,
    size: int,
    n_beams: int,
):
    scan_idx = pl.program_id(0)
    hit_p = hm_ref[0, 0]
    miss_p = hm_ref[0, 1]
    inv_res = 1.0 / res_ref[0, 0]
    ox = origin_ref[0, 0]
    oy = origin_ref[0, 1]
    sx = scan_origin_ref[scan_idx, 0]
    sy = scan_origin_ref[scan_idx, 1]
    marker = scan_idx + 1  # 0 = untouched

    def update_cell(cx, cy, obs_p, is_hit):
        """Odds-update one cell if in bounds and not yet updated this
        scan (first update wins; hits are applied before misses within
        the scan).

        Mosaic cannot index VMEM at a dynamic LANE position (the last
        dim must be statically 128-aligned), so the update is a
        row-vector read-modify-write: load the cell's full (1, size)
        row (dynamic sublane index is allowed), select the target lane
        with an iota mask, and store the row back."""
        inb = (cx >= 0) & (cx < size) & (cy >= 0) & (cy < size)

        @pl.when(inb)
        def _():
            cxi = jnp.clip(cx, 0, size - 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, size), 1)
            mrow = marker_ref[pl.ds(cxi, 1), :]  # (1, size) int32
            prow = probs_ref[pl.ds(cxi, 1), :]  # (1, size) f32
            fresh = (lane == cy) & (mrow != marker)
            known = prow > 0.0
            p_eff = jnp.where(known, prow, 0.5)
            odds = (obs_p / (1.0 - obs_p)) * (p_eff / (1.0 - p_eff))
            newp = jnp.clip(odds / (1.0 + odds), PMIN, PMAX)
            out = jnp.where(known, newp, obs_p)
            probs_ref[pl.ds(cxi, 1), :] = jnp.where(fresh, out, prow)
            marker_ref[pl.ds(cxi, 1), :] = jnp.where(fresh, marker, mrow)

        del is_hit

    def beam(b, _):
        kind = kind_ref[0, b, 0]
        ex = pts_ref[0, b, 0]
        ey = pts_ref[0, b, 1]

        @pl.when(kind == 1)  # hit: endpoint cell first (priority)
        def _():
            cx = jnp.floor((ex - ox) * inv_res).astype(jnp.int32)
            cy = jnp.floor((ey - oy) * inv_res).astype(jnp.int32)
            update_cell(cx, cy, hit_p, True)

        return 0

    def beam_miss(b, _):
        kind = kind_ref[0, b, 0]
        ex = pts_ref[0, b, 0]
        ey = pts_ref[0, b, 1]
        hx = jnp.floor((ex - ox) * inv_res).astype(jnp.int32)
        hy = jnp.floor((ey - oy) * inv_res).astype(jnp.int32)

        def step(t, _):
            f = (t + 0.5) / n_steps
            px = sx + (ex - sx) * f
            py = sy + (ey - sy) * f
            cx = jnp.floor((px - ox) * inv_res).astype(jnp.int32)
            cy = jnp.floor((py - oy) * inv_res).astype(jnp.int32)
            # skip a hit's endpoint cell (it was updated as hit)
            at_end = (kind == 1) & (cx == hx) & (cy == hy)

            @pl.when(jnp.logical_not(at_end))
            def _():
                update_cell(cx, cy, miss_p, False)

            return 0

        @pl.when(kind > 0)
        def _():
            jax.lax.fori_loop(0, n_steps, step, 0)

        return 0

    # phase 1: all hits of the scan; phase 2: all miss rays
    jax.lax.fori_loop(0, n_beams, beam, 0)
    jax.lax.fori_loop(0, n_beams, beam_miss, 0)


@functools.partial(
    jax.jit, static_argnames=("n_steps", "size", "interpret")
)
def insert_rays_pallas(
    probs,  # (G, G) float32
    origin,  # (2,)
    scan_origins,  # (S, 2)
    scan_points,  # (S, B, 2)
    scan_kind,  # (S, B) int8
    hit_miss_p,  # (2,)
    resolution: float,
    n_steps: int,
    size: int,
    interpret: bool = False,
):
    """Drop-in equivalent of ops.grid.insert_rays as one Pallas kernel."""
    S, B = scan_kind.shape
    marker0 = jnp.zeros((size, size), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((S, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((size, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((size, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((size, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def kernel(hm, org, res, sorg, pts, kind, probs_in, marker_in,
               probs_out, marker_out):
        # in/out aliasing keeps the grid resident across grid steps
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            probs_out[...] = probs_in[...]
            marker_out[...] = marker_in[...]

        _insert_kernel(
            hm, org, res, sorg, pts, kind, probs_out, marker_out,
            n_steps=n_steps, size=size, n_beams=B,
        )

    out_probs, _ = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((size, size), jnp.float32),
            jax.ShapeDtypeStruct((size, size), jnp.int32),
        ],
        interpret=interpret,
    )(
        hit_miss_p.reshape(1, 2).astype(jnp.float32),
        jnp.asarray(origin, jnp.float32).reshape(1, 2),
        jnp.full((1, 1), resolution, jnp.float32),
        jnp.asarray(scan_origins, jnp.float32),
        jnp.asarray(scan_points, jnp.float32),
        scan_kind.astype(jnp.int32)[..., None],
        probs.astype(jnp.float32),
        marker0,
    )
    return out_probs
