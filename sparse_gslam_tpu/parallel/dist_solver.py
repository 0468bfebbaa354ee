"""Keyframe-partitioned Gauss-Newton pose-graph solver via distributed
Schur complement.

The scalable counterpart of ops.solvers.optimize_pose_graph (which
assembles one dense (3N,3N) system): poses split into P contiguous
blocks; each block's interior chain system factorizes as a local dense
Cholesky ((3M,3M), MXU-friendly), the separator system (block
boundaries + closure endpoints; a few hundred DOF) is psum-reduced and
solved replicated, then interiors back-substitute locally. One GN
iteration is EXACT -- identical to the dense solve up to roundoff;
this is block-sparse Cholesky by partitioning, not an approximation.

Separator slot convention (parallel.partition.make_partition): slot b
(b < n_blocks-1) is the boundary pose of block b (its last pose), so
inside the kernel the pose preceding block p's first pose is separator
slot p-1 statically. Closure endpoints occupy later slots.

Drivers over the same per-block kernel:
  - optimize_pose_graph_blocked: single chip, blocks batched with vmap
  - optimize_pose_graph_sharded: multi chip, shard_map over a 1-D
    jax.sharding.Mesh ("blocks"), halo via ppermute, psum reductions

No reference code exists for this (the reference is single-process,
SURVEY.md §2.7); the design follows SURVEY.md §7 / BASELINE.json.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.solvers import (
    PoseGraphData,
    dcs_weight,
    se2_edge_jacobians,
    se2_edge_residual,
)
from ..utils.se2 import wrap_angle
from .partition import PartitionPlan


class BlockedGraph(NamedTuple):
    poses: jnp.ndarray  # (P, M, 3)
    valid: jnp.ndarray  # (P, M)
    fixed: jnp.ndarray  # (P, M)
    chain_meas: jnp.ndarray  # (P, M, 3)
    chain_info: jnp.ndarray  # (P, M, 3, 3)
    chain_valid: jnp.ndarray  # (P, M)
    sep_local: jnp.ndarray  # (P, M) int32 LOCAL separator id or -1
    loc_sep: jnp.ndarray  # (P, K) int32 global slot ids, -1 padded


class SepGraph(NamedTuple):
    """Replicated separator + closure arrays."""

    sep_pose_block: jnp.ndarray  # (S,) owning block of each separator
    sep_pose_off: jnp.ndarray  # (S,) local offset within block
    sep_valid: jnp.ndarray  # (S,)
    clo_sep_i: jnp.ndarray  # (C,)
    clo_sep_j: jnp.ndarray  # (C,)
    clo_meas: jnp.ndarray  # (C, 3)
    clo_info: jnp.ndarray  # (C, 3, 3)
    clo_valid: jnp.ndarray  # (C,)
    # compact (block, slot) enumerations (see PartitionPlan)
    pair_block: jnp.ndarray  # (Q,)
    pair_ki: jnp.ndarray
    pair_kj: jnp.ndarray
    pair_si: jnp.ndarray
    pair_sj: jnp.ndarray
    single_block: jnp.ndarray  # (Q2,)
    single_k: jnp.ndarray
    single_s: jnp.ndarray


def split_graph(g: PoseGraphData, plan: PartitionPlan):
    P, M = plan.n_blocks, plan.block_size

    def r(a):
        return jnp.reshape(a, (P, M) + a.shape[1:])

    bg = BlockedGraph(
        poses=r(g.poses), valid=r(g.valid), fixed=r(g.fixed),
        chain_meas=r(g.chain_meas), chain_info=r(g.chain_info),
        chain_valid=r(g.chain_valid),
        sep_local=r(jnp.asarray(plan.sep_local_id)),
        loc_sep=jnp.asarray(plan.loc_sep),
    )
    # a separator slot whose underlying pose is padding or fixed must
    # get an identity row (update 0), not a (singular) zero row --
    # sep_valid below therefore means "free separator variable"
    sp = jnp.asarray(plan.sep_pose)
    sep_valid = jnp.asarray(plan.sep_valid) & g.valid[sp] & (~g.fixed[sp])
    sg = SepGraph(
        sep_pose_block=jnp.asarray(plan.sep_pose // M, jnp.int32),
        sep_pose_off=jnp.asarray(plan.sep_pose % M, jnp.int32),
        sep_valid=sep_valid,
        clo_sep_i=jnp.asarray(plan.clo_sep_i),
        clo_sep_j=jnp.asarray(plan.clo_sep_j),
        clo_meas=g.clo_meas,
        clo_info=g.clo_info,
        clo_valid=g.clo_valid,
        pair_block=jnp.asarray(plan.pair_block),
        pair_ki=jnp.asarray(plan.pair_ki),
        pair_kj=jnp.asarray(plan.pair_kj),
        pair_si=jnp.asarray(plan.pair_si),
        pair_sj=jnp.asarray(plan.pair_sj),
        single_block=jnp.asarray(plan.single_block),
        single_k=jnp.asarray(plan.single_k),
        single_s=jnp.asarray(plan.single_s),
    )
    return bg, sg


# ---------------------------------------------------------------------------
# per-block kernel (operates on ONE block; batched by vmap or shard_map)
# ---------------------------------------------------------------------------


def _eq_chol_solve(Amat, rhs):
    """SPD solve with Jacobi equilibration (f32-stable Cholesky).
    rhs may be a vector or matrix (columns).

    The dtype-scaled relative ridge (equilibrated diagonal is exactly
    1; 8*eps = ~1e-6 in f32, ~2e-15 in f64): the separator Schur
    complement Hss - sum His A^-1 His^T is formed by floating
    subtraction and can come out marginally indefinite when a sharp
    closure pushes cond(H) toward 1/eps -- without the ridge the f32
    Cholesky emits NaN and permanently corrupts every pose-graph
    vertex (first seen at sim-office frame 575 on TPU, caught by
    SLAM_CHECK_FINITE=1). The ridge MUST scale with eps: a flat 1e-6
    on the f64 path damps the long-chain compliant modes (equilibrated
    eigenvalues ~1e-7) and measured sim-killian 0.22 -> 0.42 m.

    Symmetrization first: closure information matrices arrive with
    ~1e-5 relative asymmetry (f32 covariance assembly noise amplified
    by the inversion), which propagates into the separator system.
    cho_factor reads ONE triangle; when the asymmetry exceeds the
    smallest equilibrated eigenvalue, that triangle is indefinite and
    the factorization emits NaN even in f64 (the actual frame-575
    root cause -- numpy's lower-triangle cholesky masked it)."""
    Amat = 0.5 * (Amat + Amat.T)
    d = jnp.clip(jnp.diagonal(Amat), 1e-20, None)
    s = jax.lax.rsqrt(d)
    A_eq = Amat * s[:, None] * s[None, :]
    ridge = 8.0 * jnp.finfo(A_eq.dtype).eps
    A_eq = A_eq + ridge * jnp.eye(A_eq.shape[0], dtype=A_eq.dtype)
    chol = jax.scipy.linalg.cho_factor(A_eq)
    if rhs.ndim == 1:
        return jax.scipy.linalg.cho_solve(chol, rhs * s) * s
    return jax.scipy.linalg.cho_solve(chol, rhs * s[:, None]) * s[:, None]


def _scatter_blocks(target, bi, bj, vals):
    """Scatter-add (K,3,3) blocks into a 2-D matrix at block indices
    (bi, bj); entries with bi<0 or bj<0 are dropped."""
    ar3 = jnp.arange(3)
    ok = (bi >= 0) & (bj >= 0)
    big = target.shape[0]  # out-of-range sentinel
    rows = jnp.where(ok, 3 * bi, big)[:, None] + ar3[None, :]  # (K,3)
    cols = jnp.where(ok, 3 * bj, big)[:, None] + ar3[None, :]
    return target.at[rows[:, :, None], cols[:, None, :]].add(
        jnp.where(ok[:, None, None], vals, 0.0), mode="drop"
    )


def _shift_up(x):
    """out[m] = x[m+1], out[-1] = 0 (moves edge-m values to slot m-1)."""
    return jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)


def _block_system(
    block_idx,  # () int32
    poses, valid, fixed, chain_meas, chain_info, chain_valid, sep_local,
    prev_last_pose,  # (3,) halo: last pose of the previous block
    S: int,
    b_ext=None,  # (M, 3) externally supplied gradient (refinement mode)
    need_dense: bool = False,  # build the dense (3M,3M) interior matrix
):
    """Assemble one block's partitioned-system pieces in LOCAL separator
    indexing (S = local capacity K; the driver scatters local pieces
    into the global separator system via loc_sep).

    Returns (A (3M,3M) or None, b_i (3M,), His (3S,3M), Hss (3S,3S),
    b_s (3S,)).

    Assembly is scatter-free: TPU lowers dynamic-index scatter-adds to
    serial loops (measured 10.3 ms of a 16.9 ms GN iteration at
    P=128/M=128). The chain's connectivity is static -- edge m couples
    poses m-1 and m -- so every "scatter" is either a shift along m
    (_shift_up) or a one-hot masked product/contraction over the K
    local separator slots, all of which fuse into vector ops.
    """
    M = poses.shape[0]
    dt = poses.dtype
    xi = jnp.concatenate([prev_last_pose[None], poses[:-1]], axis=0)
    e = se2_edge_residual(xi, poses, chain_meas)
    Ji, Jj = se2_edge_jacobians(xi, poses, chain_meas)

    free = valid & (~fixed)
    is_sep = sep_local >= 0
    interior = free & (~is_sep)

    # endpoint A of edge m: m=0 -> previous block's boundary (always
    # LOCAL separator id 0 by construction), m>0 -> local pose m-1
    sepA = jnp.concatenate(
        [jnp.where(block_idx > 0, 0, -1)[None].astype(jnp.int32),
         sep_local[:-1]]
    )
    intA = jnp.concatenate([jnp.zeros(1, bool), interior[:-1]])
    freeA = jnp.concatenate([(block_idx > 0)[None], free[:-1]])
    sepB = sep_local
    intB = interior
    freeB = free

    w = chain_valid.astype(dt)
    Ji = Ji * (w * freeA.astype(dt))[:, None, None]
    Jj = Jj * (w * freeB.astype(dt))[:, None, None]
    OJi = jnp.einsum("nab,nbc->nac", chain_info, Ji)
    OJj = jnp.einsum("nab,nbc->nac", chain_info, Jj)
    Hii = jnp.einsum("nba,nbc->nac", Ji, OJi)
    Hij = jnp.einsum("nba,nbc->nac", Ji, OJj)
    Hjj = jnp.einsum("nba,nbc->nac", Jj, OJj)
    ew = e * w[:, None]
    bi_ = -jnp.einsum("nba,nb->na", OJi, ew)
    bj_ = -jnp.einsum("nba,nb->na", OJj, ew)

    m_idx = jnp.arange(M)
    HijT = jnp.swapaxes(Hij, -1, -2)
    both = intA & intB & (m_idx > 0)

    if b_ext is None:
        # edge m contributes bi_ to pose m-1 (shift up) and bj_ to m
        b_i = jnp.where(intB[:, None], bj_, 0.0) + _shift_up(
            jnp.where(intA[:, None], bi_, 0.0)
        )
    else:
        # refinement mode: the full gradient (chain + closures) was
        # computed externally in float64; interior rows take it
        # directly, separator rows get theirs via the driver's bs_ext
        b_i = jnp.where(interior[:, None], b_ext.astype(dt), 0.0)

    # block-tridiagonal interior system (identity rows keep padding /
    # separator slots decoupled)
    eye = jnp.eye(3, dtype=dt)
    Db = eye * jnp.where(interior, dt.type(1e-12), dt.type(1.0))[
        :, None, None
    ]
    Db = Db + _shift_up(jnp.where(intA[:, None, None], Hii, 0.0))
    Db = Db + jnp.where(intB[:, None, None], Hjj, 0.0)
    Ob = jnp.where(both[:, None, None], Hij, 0.0)  # Ob[m] at (m-1, m)

    if need_dense:
        mA = jnp.maximum(m_idx - 1, 0)
        base = jnp.where(
            jnp.repeat(interior, 3), jnp.asarray(1e-12, dt),
            jnp.asarray(1.0, dt),
        )
        A = jnp.diag(base)
        A = _scatter_blocks(
            A, jnp.where(intA, mA, -1), jnp.where(intA, mA, -1), Hii
        )
        A = _scatter_blocks(
            A, jnp.where(intB, m_idx, -1), jnp.where(intB, m_idx, -1),
            Hjj,
        )
        A = _scatter_blocks(
            A, jnp.where(both, mA, -1), jnp.where(both, m_idx, -1), Hij
        )
        A = _scatter_blocks(
            A, jnp.where(both, m_idx, -1), jnp.where(both, mA, -1), HijT
        )
    else:
        A = None

    # separator coupling + separator system via one-hot masks over the
    # K local slots (K is small; everything stays dense vector math)
    sA = jnp.where(intA, -1, sepA)  # valid slot only when A is separator
    sB = jnp.where(intB, -1, sepB)
    k_ar = jnp.arange(S)
    put = (sA >= 0) & intB  # H_{A,B} = Hij with A=sep row, B=int col
    put2 = (sB >= 0) & intA  # H_{B,A} = Hij^T at col m-1
    UA = ((sA[:, None] == k_ar[None]) & put[:, None]).astype(dt)  # (M,S)
    UB2 = ((sB[:, None] == k_ar[None]) & put2[:, None]).astype(dt)
    T1 = UA[:, :, None, None] * Hij[:, None]  # (M, S, 3, 3) at col m
    T2 = _shift_up(UB2[:, :, None, None] * HijT[:, None])  # at col m-1
    His_mat = (
        (T1 + T2).transpose(1, 2, 0, 3).reshape(3 * S, 3 * M)
    )

    putA = (sA >= 0) & freeA
    putB = (sB >= 0) & freeB
    putAB = (sA >= 0) & (sB >= 0)
    WA = ((sA[:, None] == k_ar[None]) & putA[:, None]).astype(dt)
    WB = ((sB[:, None] == k_ar[None]) & putB[:, None]).astype(dt)
    WABi = ((sA[:, None] == k_ar[None]) & putAB[:, None]).astype(dt)
    WABj = ((sB[:, None] == k_ar[None]) & putAB[:, None]).astype(dt)
    Hss4 = (
        jnp.einsum("mk,ml,mab->kalb", WA, WA, Hii)
        + jnp.einsum("mk,ml,mab->kalb", WB, WB, Hjj)
        + jnp.einsum("mk,ml,mab->kalb", WABi, WABj, Hij)
        + jnp.einsum("mk,ml,mab->kalb", WABj, WABi, HijT)
    )
    Hss_mat = Hss4.reshape(3 * S, 3 * S)
    if b_ext is None:
        b_s = jnp.einsum("mk,ma->ka", WA, bi_) + jnp.einsum(
            "mk,ma->ka", WB, bj_
        )
    else:
        b_s = jnp.zeros((S, 3), dt)

    return (
        A, Db, Ob, b_i.reshape(3 * M), His_mat, Hss_mat,
        b_s.reshape(3 * S),
    )


def _closure_system(sep_poses, sg: SepGraph, phi, S):
    """Closure contributions to the separator system (DCS-weighted).
    sep_poses: (S, 3) current separator pose values."""
    dt = sep_poses.dtype
    xi = sep_poses[sg.clo_sep_i]
    xj = sep_poses[sg.clo_sep_j]
    e = se2_edge_residual(xi, xj, sg.clo_meas)
    Ji, Jj = se2_edge_jacobians(xi, xj, sg.clo_meas)
    # fixed/invalid separator endpoints contribute no Jacobian columns
    Ji = Ji * sg.sep_valid[sg.clo_sep_i].astype(dt)[:, None, None]
    Jj = Jj * sg.sep_valid[sg.clo_sep_j].astype(dt)[:, None, None]
    chi2 = jnp.einsum("ni,nij,nj->n", e, sg.clo_info, e)
    w = sg.clo_valid.astype(dt) * dcs_weight(chi2, phi)
    info_w = sg.clo_info * w[:, None, None]
    OJi = jnp.einsum("nab,nbc->nac", info_w, Ji)
    OJj = jnp.einsum("nab,nbc->nac", info_w, Jj)

    # block scatter (a one-hot matmul variant was tried and is slower
    # at f32-highest precision; see _locals_to_global)
    Hss = jnp.zeros((3 * S, 3 * S), dt)
    b_s = jnp.zeros((S, 3), dt)
    si, sj = sg.clo_sep_i, sg.clo_sep_j
    Hss = _scatter_blocks(Hss, si, si, jnp.einsum("nba,nbc->nac", Ji, OJi))
    Hss = _scatter_blocks(Hss, sj, sj, jnp.einsum("nba,nbc->nac", Jj, OJj))
    Hij = jnp.einsum("nba,nbc->nac", Ji, OJj)
    Hss = _scatter_blocks(Hss, si, sj, Hij)
    Hss = _scatter_blocks(Hss, sj, si, jnp.swapaxes(Hij, -1, -2))
    b_s = b_s.at[si].add(-jnp.einsum("nba,nb->na", OJi, e))
    b_s = b_s.at[sj].add(-jnp.einsum("nba,nb->na", OJj, e))
    return Hss, b_s.reshape(3 * S)


# Interior solve: "tridiag" (O(M) sequential LDL scan), "cr" (block
# cyclic reduction, O(log M) levels), or "dense" (Cholesky). Measured
# at P=128/M=128/R=49 on v5e with scatter-free assembly: tridiag
# 5.4 ms, cr 6.4 ms (each CR level's full-array rewrites cost more
# HBM traffic than the scan steps it removes), dense 22.3 ms -- the
# scan wins once assembly no longer dominates.
INTERIOR_SOLVE = os.environ.get("SLAM_INTERIOR_SOLVE", "tridiag")
# lax.scan unroll factor for the tridiag LDL scans (latency-bound:
# each step is tiny vmapped 3x3 math; unrolling lets XLA fuse across
# steps). Overridable for experiments via SLAM_INTERIOR_UNROLL.
INTERIOR_UNROLL = int(os.environ.get("SLAM_INTERIOR_UNROLL", "1"))
# hybrid CR: reduce until this many blocks remain, then LDL-scan them
CR_MINSEQ = int(os.environ.get("SLAM_CR_MINSEQ", "1"))


def _block_gn_pieces(block_idx, blk, prev_last_pose, S, b_ext=None):
    """Local factorization + Schur pieces for one block.

    Returns (S_contrib (3S,3S), rhs_contrib (3S,), Hss_part, bs_part,
    Y (3M, 1+3S) solved columns) -- Y is carried to back-substitution.

    The interior solve is either a dense equilibrated Cholesky or the
    O(M) block-tridiagonal LDL (ops.solvers.tridiag_solve) -- the
    interior matrix IS block-tridiagonal, so both are exact; the LDL
    path does ~M times less work per block.
    """
    from ..ops.solvers import tridiag_solve, tridiag_solve_cr

    A, Db, Ob, b_i, His, Hss, b_s = _block_system(
        block_idx, blk.poses, blk.valid, blk.fixed, blk.chain_meas,
        blk.chain_info, blk.chain_valid, blk.sep_local, prev_last_pose, S,
        b_ext, need_dense=(INTERIOR_SOLVE == "dense"),
    )
    rhs = jnp.concatenate([b_i[:, None], His.T], axis=1)  # (3M, 1+3K)
    if INTERIOR_SOLVE in ("tridiag", "cr"):
        M = Db.shape[0]
        # row-wise Jacobi equilibration for f32 stability
        d = jnp.clip(
            jnp.diagonal(Db, axis1=-2, axis2=-1), 1e-20, None
        )  # (M,3)
        sdiag = jax.lax.rsqrt(d)
        Ds = Db * sdiag[:, :, None] * sdiag[:, None, :]
        s_prev = jnp.concatenate([sdiag[:1], sdiag[:-1]], axis=0)
        Os = Ob * s_prev[:, :, None] * sdiag[:, None, :]
        R = rhs.shape[1]
        rhs_s = rhs.reshape(M, 3, R) * sdiag[:, :, None]
        if INTERIOR_SOLVE == "cr":
            Ys = tridiag_solve_cr(Ds, Os, rhs_s, min_seq=CR_MINSEQ)
        else:
            Ys = tridiag_solve(Ds, Os, rhs_s, unroll=INTERIOR_UNROLL)
        Y = (Ys * sdiag[:, :, None]).reshape(3 * M, R)
    else:
        Y = _eq_chol_solve(A, rhs)
    S_contrib = His @ Y[:, 1:]  # (3K, 3K)
    rhs_contrib = His @ Y[:, 0]  # (3K,)
    return S_contrib, rhs_contrib, Hss, b_s, Y


def _compute_delta(Y, d_loc, sep_local):
    """delta_i = Y0 - (A^-1 His^T) d_loc; separator poses take their
    local separator update. Returns (M, 3). d_loc (3K,).

    The separator pick-out is a one-hot matmul, not a gather: TPU
    executes dynamic gathers serially (measured ~1.7 ms for this
    (M from K)-row pick at P=128), while the (M,K)@(K,3) product
    fuses into vector math."""
    M = Y.shape[0] // 3
    d_i = (Y[:, 0] - Y[:, 1:] @ d_loc).reshape(M, 3)
    dl = d_loc.reshape(-1, 3)
    oh = (sep_local[:, None] == jnp.arange(dl.shape[0])[None]).astype(
        Y.dtype
    )
    d_sep = oh @ dl
    is_sep = sep_local >= 0
    return jnp.where(is_sep[:, None], d_sep, d_i)


def _apply_updates(poses, Y, d_loc, sep_local):
    poses = poses + _compute_delta(Y, d_loc, sep_local)
    return poses.at[..., 2].set(wrap_angle(poses[..., 2]))


def _gather_local(d_s, loc_sep_row):
    """(3S,) global separator update -> (3K,) local (0 for padding).
    One-hot matmul instead of a gather (slow on TPU); padding rows
    (-1) match no column and come out zero."""
    dsr = d_s.reshape(-1, 3)
    oh = (
        loc_sep_row[:, None] == jnp.arange(dsr.shape[0])[None]
    ).astype(d_s.dtype)
    return (oh @ dsr).reshape(-1)


def _locals_to_global(S_base, b_base, loc_sep, S_loc, b_loc):
    """Scatter per-block local Schur pieces into the global separator
    system. loc_sep (..., K); S_loc (..., 3K, 3K); b_loc (..., 3K).
    Leading block dims are flattened.

    Stays a block scatter deliberately: a one-hot contraction variant
    (the (S, P*K) @ (P*K, 3S*3) selection matmul) was tried and is
    SLOWER at f32-highest precision (7.3 ms vs 3.5 ms at
    P=128/K=16/S=1024), and the bf16 hi/lo-split fast path is
    numerically unsafe here -- Hss - Sc is a near-cancellation whose
    small eigenvalues cannot absorb 2^-16-relative rounding of
    ~1e3-magnitude entries (observed indefinite separator systems ->
    Cholesky NaN)."""
    K = loc_sep.shape[-1]
    ls = loc_sep.reshape(-1, K)
    nb = ls.shape[0]
    vals = (
        S_loc.reshape(nb, K, 3, K, 3)
        .transpose(0, 1, 3, 2, 4)
        .reshape(-1, 3, 3)
    )
    bi = jnp.broadcast_to(ls[:, :, None], (nb, K, K)).reshape(-1)
    bj = jnp.broadcast_to(ls[:, None, :], (nb, K, K)).reshape(-1)
    S_out = _scatter_blocks(S_base, bi, bj, vals)
    S_dim = b_base.shape[0] // 3
    idx = jnp.where(ls >= 0, ls, S_dim).reshape(-1)
    bv = b_loc.reshape(nb * K, 3)
    b_out = (
        b_base.reshape(-1, 3)
        .at[idx]
        .add(jnp.where((idx < S_dim)[:, None], bv, 0.0), mode="drop")
        .reshape(-1)
    )
    return S_out, b_out


def _locals_to_global_compact(S_base, b_base, sg: SepGraph, S_loc, b_loc):
    """Compact-pair variant of _locals_to_global for the single-chip
    driver: ~90% of the (P, K, K) local-pair lattice is padding, and
    TPU scatters pay per update whether dropped or not (measured
    3.2 ms dense vs the compact list's ~4k real blocks). The valid
    (block, ki, kj) -> (si, sj) enumeration is static host data
    (PartitionPlan.pair_*). The sharded driver keeps the dense
    scatter: its S_loc carries only the device-local blocks, while
    these pair lists are global."""
    P = S_loc.shape[0]
    K = S_loc.shape[1] // 3
    V = S_loc.reshape(P, K, 3, K, 3)
    pb = jnp.maximum(sg.pair_block, 0)
    ok = sg.pair_block >= 0
    vals = V[pb, jnp.maximum(sg.pair_ki, 0), :,
             jnp.maximum(sg.pair_kj, 0), :]  # (Q, 3, 3)
    S_out = _scatter_blocks(
        S_base, jnp.where(ok, sg.pair_si, -1),
        jnp.where(ok, sg.pair_sj, -1), vals,
    )
    bv = b_loc.reshape(P, K, 3)
    ok2 = sg.single_block >= 0
    bvals = bv[jnp.maximum(sg.single_block, 0),
               jnp.maximum(sg.single_k, 0)]  # (Q2, 3)
    S_dim = b_base.shape[0] // 3
    idx = jnp.where(ok2, sg.single_s, S_dim)
    b_out = (
        b_base.reshape(-1, 3)
        .at[idx]
        .add(jnp.where(ok2[:, None], bvals, 0.0), mode="drop")
        .reshape(-1)
    )
    return S_out, b_out


# ---------------------------------------------------------------------------
# single-chip driver: vmap over blocks
# ---------------------------------------------------------------------------


from ..ops.solvers import precise


@precise
@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph_blocked(
    bg: BlockedGraph, sg: SepGraph, phi, iterations: int = 20,
    gnc_init_scale=1.0,
) -> jnp.ndarray:
    """Block-sparse GN on one device. Returns updated (P, M, 3) poses.
    gnc_init_scale > 1 anneals the DCS phi (graduated non-convexity,
    ops.solvers.gnc_phi_schedule)."""
    from ..ops.solvers import gnc_phi_schedule

    P, M = bg.poses.shape[0], bg.poses.shape[1]
    S = sg.sep_valid.shape[0]
    K = bg.loc_sep.shape[1]
    dt = bg.poses.dtype
    block_ids = jnp.arange(P, dtype=jnp.int32)
    phis = gnc_phi_schedule(phi, iterations, gnc_init_scale).astype(dt)

    def gn_iter(poses, phi):
        prev_last = jnp.concatenate(
            [jnp.zeros((1, 3), dt), poses[:-1, -1, :]], axis=0
        )
        sep_poses = poses[sg.sep_pose_block, sg.sep_pose_off]

        Sc, rc, Hss, bs, Y = _vmapped_pieces(
            block_ids, bg, poses, prev_last, K
        )
        eye = jnp.eye(3 * S, dtype=dt)
        sep_free = jnp.repeat(sg.sep_valid, 3)
        Hss_c, bs_c = _closure_system(sep_poses, sg, phi, S)
        S_base = Hss_c + jnp.where(sep_free, 1e-12, 1.0) * eye
        S_dense, rhs_s = _locals_to_global_compact(
            S_base, bs_c, sg, Hss - Sc, bs - rc
        )
        S_dense = jnp.where(
            sep_free[:, None] & sep_free[None, :], S_dense, eye
        )
        rhs_s = jnp.where(sep_free, rhs_s, 0.0)
        d_s = _eq_chol_solve(S_dense, rhs_s)
        d_loc = jax.vmap(lambda ls: _gather_local(d_s, ls))(bg.loc_sep)
        new_poses = jax.vmap(_apply_updates)(poses, Y, d_loc, bg.sep_local)
        return new_poses, None

    poses, _ = jax.lax.scan(gn_iter, bg.poses, phis, length=iterations)
    return poses


def _vmapped_pieces(block_ids, bg: BlockedGraph, poses, prev_last, K,
                    b_ext=None):
    if b_ext is None:
        def one(bi, p, valid, fixed, cm, ci, cv, sl, ls, pl):
            b = BlockedGraph(p, valid, fixed, cm, ci, cv, sl, ls)
            return _block_gn_pieces(bi, b, pl, K)

        return jax.vmap(one, in_axes=(0,) * 10)(
            block_ids, poses, bg.valid, bg.fixed, bg.chain_meas,
            bg.chain_info, bg.chain_valid, bg.sep_local, bg.loc_sep,
            prev_last,
        )

    def one_b(bi, p, valid, fixed, cm, ci, cv, sl, ls, pl, be):
        b = BlockedGraph(p, valid, fixed, cm, ci, cv, sl, ls)
        return _block_gn_pieces(bi, b, pl, K, be)

    return jax.vmap(one_b, in_axes=(0,) * 11)(
        block_ids, poses, bg.valid, bg.fixed, bg.chain_meas,
        bg.chain_info, bg.chain_valid, bg.sep_local, bg.loc_sep,
        prev_last, b_ext,
    )


# ---------------------------------------------------------------------------
# mixed-precision iterative refinement (float64 gradient on host,
# partitioned H-solve on device)
# ---------------------------------------------------------------------------
#
# A GN fixpoint is where the gradient b = -J^T(Omega)e vanishes; H only
# preconditions the iteration. In float32 the gradient evaluation
# carries absolute rounding noise ~eps*|Omega e| per edge, and the pose
# graph's chain compliance (H^-1 entries grow ~O(N) along the chain)
# amplifies that noise into meter-level pose error at N~10^4 -- measured
# 1.9 m vs the float64 native solver at N=8192 with BOTH interior
# solvers and even with the separator solve upcast to f64 (assembly, not
# solve, is the bottleneck). Classic mixed-precision refinement fixes
# the fixpoint: keep a float64 master copy of the poses on host,
# evaluate the exact gradient there (O(N) numpy, trivial), and let the
# device compute the Schur-partitioned step H^-1 b in f32 -- near the
# fixpoint b is tiny, so f32 relative precision on the step suffices.


def _np_edge_residual(xi, xj, z):
    ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    d0 = ci * dx + si * dy
    d1 = -si * dx + ci * dy
    cz, sz = np.cos(z[:, 2]), np.sin(z[:, 2])
    e0 = cz * (d0 - z[:, 0]) + sz * (d1 - z[:, 1])
    e1 = -sz * (d0 - z[:, 0]) + cz * (d1 - z[:, 1])
    e2 = xj[:, 2] - xi[:, 2] - z[:, 2]
    e2 = (e2 + np.pi) % (2 * np.pi) - np.pi
    return np.stack([e0, e1, e2], axis=-1)


def _np_edge_jacobians(xi, xj, z):
    ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    cz, sz = np.cos(z[:, 2]), np.sin(z[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    m00 = cz * ci + sz * (-si)
    m01 = cz * si + sz * ci
    m10 = -sz * ci + cz * (-si)
    m11 = -sz * si + cz * ci
    g0 = -si * dx + ci * dy
    g1 = -ci * dx - si * dy
    e0_ti = cz * g0 + sz * g1
    e1_ti = -sz * g0 + cz * g1
    o = np.zeros_like(ci)
    i1 = np.ones_like(ci)
    Ji = np.stack(
        [
            np.stack([-m00, -m01, e0_ti], axis=-1),
            np.stack([-m10, -m11, e1_ti], axis=-1),
            np.stack([o, o, -i1], axis=-1),
        ],
        axis=-2,
    )
    Jj = np.stack(
        [
            np.stack([m00, m01, o], axis=-1),
            np.stack([m10, m11, o], axis=-1),
            np.stack([o, o, i1], axis=-1),
        ],
        axis=-2,
    )
    return Ji, Jj


def pose_graph_gradient_np(poses64, arrs, phi) -> np.ndarray:
    """Exact float64 gradient b = -J^T Omega e of the (IRLS-weighted)
    pose-graph objective; mirrors the device kernels' semantics (DCS
    weight evaluated at the current poses, treated constant)."""
    N = poses64.shape[0]
    b = np.zeros((N, 3))
    xi, xj = poses64[:-1], poses64[1:]
    z = arrs["chain_meas"][1:]
    info = arrs["chain_info"][1:]
    v = arrs["chain_valid"][1:].astype(np.float64)
    e = _np_edge_residual(xi, xj, z)
    Ji, Jj = _np_edge_jacobians(xi, xj, z)
    Oe = np.einsum("nij,nj->ni", info, e) * v[:, None]
    b[:-1] -= np.einsum("nji,nj->ni", Ji, Oe)
    b[1:] -= np.einsum("nji,nj->ni", Jj, Oe)

    ci_, cj_ = arrs["clo_i"], arrs["clo_j"]
    xi, xj = poses64[ci_], poses64[cj_]
    z, info = arrs["clo_meas"], arrs["clo_info"]
    cv = arrs["clo_valid"].astype(np.float64)
    e = _np_edge_residual(xi, xj, z)
    Ji, Jj = _np_edge_jacobians(xi, xj, z)
    chi2 = np.einsum("ni,nij,nj->n", e, info, e)
    s = np.minimum(1.0, 2.0 * phi / (phi + chi2))
    Oe = np.einsum("nij,nj->ni", info, e) * (s * s * cv)[:, None]
    np.subtract.at(b, ci_, np.einsum("nji,nj->ni", Ji, Oe))
    np.subtract.at(b, cj_, np.einsum("nji,nj->ni", Jj, Oe))
    return b


@precise
@jax.jit
def gn_refine_delta_blocked(
    bg: BlockedGraph, sg: SepGraph, phi, b_ext, bs_ext
) -> jnp.ndarray:
    """One partitioned GN step with an externally supplied gradient.
    b_ext (P, M, 3): gradient rows per pose; bs_ext (3S,): gradient at
    separator poses. Returns the delta (P, M, 3), NOT applied."""
    P, M = bg.poses.shape[0], bg.poses.shape[1]
    S = sg.sep_valid.shape[0]
    K = bg.loc_sep.shape[1]
    dt = bg.poses.dtype
    block_ids = jnp.arange(P, dtype=jnp.int32)
    poses = bg.poses
    prev_last = jnp.concatenate(
        [jnp.zeros((1, 3), dt), poses[:-1, -1, :]], axis=0
    )
    sep_poses = poses[sg.sep_pose_block, sg.sep_pose_off]

    Sc, rc, Hss, bs, Y = _vmapped_pieces(
        block_ids, bg, poses, prev_last, K, b_ext
    )
    eye = jnp.eye(3 * S, dtype=dt)
    sep_free = jnp.repeat(sg.sep_valid, 3)
    Hss_c, _ = _closure_system(sep_poses, sg, phi, S)
    S_base = Hss_c + jnp.where(sep_free, 1e-12, 1.0) * eye
    S_dense, rhs_s = _locals_to_global_compact(
        S_base, bs_ext.astype(dt), sg, Hss - Sc, bs - rc
    )
    S_dense = jnp.where(sep_free[:, None] & sep_free[None, :], S_dense, eye)
    rhs_s = jnp.where(sep_free, rhs_s, 0.0)
    d_s = _eq_chol_solve(S_dense, rhs_s)
    d_loc = jax.vmap(lambda ls: _gather_local(d_s, ls))(bg.loc_sep)
    return jax.vmap(_compute_delta)(Y, d_loc, bg.sep_local)


def refine_f64(
    g: PoseGraphData, plan, bg: BlockedGraph, sg: SepGraph, phi,
    poses_start, rounds: int = 4,
) -> np.ndarray:
    """Polish a solved graph to float64-gradient fixpoint. Returns
    (N, 3) float64 poses."""
    P, M = plan.n_blocks, plan.block_size
    dt = bg.poses.dtype
    arrs = {
        k: np.asarray(v, np.float64)
        if np.asarray(v).dtype.kind == "f"
        else np.asarray(v)
        for k, v in g._asdict().items()
    }
    poses64 = np.asarray(poses_start, np.float64).reshape(-1, 3).copy()
    sep_gate = np.asarray(plan.sep_valid, np.float64)[:, None]
    for _ in range(rounds):
        b64 = pose_graph_gradient_np(poses64, arrs, phi)
        bg_r = bg._replace(poses=jnp.asarray(poses64.reshape(P, M, 3), dt))
        b_ext = jnp.asarray(b64.reshape(P, M, 3), dt)
        bs_ext = jnp.asarray(
            (b64[plan.sep_pose] * sep_gate).reshape(-1), dt
        )
        delta = np.asarray(
            gn_refine_delta_blocked(bg_r, sg, phi, b_ext, bs_ext),
            np.float64,
        )
        poses64 += delta.reshape(-1, 3)
        poses64[:, 2] = (poses64[:, 2] + np.pi) % (2 * np.pi) - np.pi
    return poses64


# ---------------------------------------------------------------------------
# multi-chip driver: shard_map over a mesh axis "blocks"
# ---------------------------------------------------------------------------


def optimize_pose_graph_sharded(
    bg: BlockedGraph, sg: SepGraph, phi, mesh, iterations: int = 20,
    gnc_init_scale: float = 1.0,
):
    """Multi-chip GN: blocks sharded over mesh axis 'blocks' (P must be
    divisible by the mesh size; each device vmaps over its P/n local
    blocks, so block granularity is independent of chip count).

    Chain halo rides ppermute (only each device's first local block
    needs the previous device's boundary); the Schur reduction rides
    psum -- ICI collectives only (SURVEY.md §5 "distributed
    communication backend").
    """
    from jax.sharding import PartitionSpec as Ps
    from jax import shard_map

    P, M = bg.poses.shape[0], bg.poses.shape[1]
    S = sg.sep_valid.shape[0]
    axis = "blocks"
    n_dev = mesh.shape[axis]
    assert P % n_dev == 0, "n_blocks must be divisible by mesh size"
    Pl = P // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: Ps(axis), bg),
            jax.tree_util.tree_map(lambda _: Ps(), sg),
        ),
        out_specs=Ps(axis),
        check_vma=False,
    )
    def run(blk_sh: BlockedGraph, sg_rep: SepGraph):
        from ..ops.solvers import gnc_phi_schedule

        dt = blk_sh.poses.dtype
        my = jax.lax.axis_index(axis).astype(jnp.int32)
        K = blk_sh.loc_sep.shape[-1]
        block_ids = my * Pl + jnp.arange(Pl, dtype=jnp.int32)
        phis = gnc_phi_schedule(phi, iterations, gnc_init_scale).astype(dt)

        def gn_iter(poses, phi):
            # halo: previous block's last pose. Local blocks i>0 take
            # it from block i-1 on-device; local block 0 from the
            # previous device via ppermute.
            from_prev_dev = jax.lax.ppermute(
                poses[-1, -1], axis,
                [(i, (i + 1) % n_dev) for i in range(n_dev)],
            )
            from_prev_dev = jnp.where(
                my > 0, from_prev_dev, jnp.zeros(3, dt)
            )
            prev_last = jnp.concatenate(
                [from_prev_dev[None], poses[:-1, -1, :]], axis=0
            )
            # replicated separator poses: scatter own, psum
            own_dev = sg_rep.sep_pose_block // Pl == my
            sep_mine = own_dev & sg_rep.sep_valid
            sep_poses = jnp.where(
                sep_mine[:, None],
                poses[sg_rep.sep_pose_block % Pl, sg_rep.sep_pose_off],
                0.0,
            )
            sep_poses = jax.lax.psum(sep_poses, axis)

            Sc, rc, Hss, bs, Y = _vmapped_pieces(
                block_ids, blk_sh, poses, prev_last, K
            )
            # local (3K,3K) pieces scatter into the global separator
            # system, then psum-reduce across devices
            S_part, b_part = _locals_to_global(
                jnp.zeros((3 * S, 3 * S), dt), jnp.zeros(3 * S, dt),
                blk_sh.loc_sep, Hss - Sc, bs - rc,
            )
            Hss_tot = jax.lax.psum(S_part, axis)
            bs_tot = jax.lax.psum(b_part, axis)
            Hss_c, bs_c = _closure_system(sep_poses, sg_rep, phi, S)
            eye = jnp.eye(3 * S, dtype=dt)
            sep_free = jnp.repeat(sg_rep.sep_valid, 3)
            S_dense = Hss_c + Hss_tot + jnp.where(sep_free, 1e-12, 1.0) * eye
            S_dense = jnp.where(
                sep_free[:, None] & sep_free[None, :], S_dense, eye
            )
            rhs_s = jnp.where(sep_free, bs_c + bs_tot, 0.0)
            d_s = _eq_chol_solve(S_dense, rhs_s)
            d_loc = jax.vmap(lambda ls: _gather_local(d_s, ls))(
                blk_sh.loc_sep
            )
            new_poses = jax.vmap(_apply_updates)(
                poses, Y, d_loc, blk_sh.sep_local
            )
            return new_poses, None

        poses, _ = jax.lax.scan(
            gn_iter, blk_sh.poses, phis, length=iterations
        )
        return poses

    with jax.default_matmul_precision("highest"):
        return run(bg, sg)


# ---------------------------------------------------------------------------
# convenience: full path from PoseGraphData
# ---------------------------------------------------------------------------


def optimize_partitioned(
    g: PoseGraphData, phi: float, n_blocks: int, iterations: int = 20,
    mesh=None, refine_rounds: int = 0, gnc_init_scale: float = 1.0,
):
    """Partition + solve. mesh=None -> single-chip vmap driver.

    refine_rounds > 0 polishes the float32 device solution with
    mixed-precision iterative refinement (float64 gradient on host,
    partitioned H-solve on device): the fixpoint moves from the f32
    gradient's zero to the f64 gradient's zero, eliminating the
    compliance-amplified meter-level f32 error on long chains at
    negligible cost (a few extra device solves)."""
    from .partition import make_partition

    plan = make_partition(
        g.poses.shape[0], n_blocks,
        np.asarray(g.clo_i), np.asarray(g.clo_j), np.asarray(g.clo_valid),
    )
    bg, sg = split_graph(g, plan)
    if mesh is None:
        poses = optimize_pose_graph_blocked(
            bg, sg, phi, iterations, gnc_init_scale
        )
    else:
        poses = optimize_pose_graph_sharded(
            bg, sg, phi, mesh, iterations, gnc_init_scale
        )
    if refine_rounds > 0:
        poses64 = refine_f64(g, plan, bg, sg, phi, poses, refine_rounds)
        poses = jnp.asarray(poses64, g.poses.dtype).reshape(g.poses.shape)
        return g._replace(poses=poses)
    return g._replace(poses=jnp.reshape(poses, g.poses.shape))
