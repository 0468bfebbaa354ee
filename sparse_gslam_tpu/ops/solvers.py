"""Batched sparse Gauss-Newton / Levenberg-Marquardt graph solvers.

From-scratch TPU-native replacement for the reference's g2o backends
(src/sparse_gslam/src/graphs.cpp:9-37: LM + BlockSolver<-1,2> for the
landmark graph, GN + BlockSolver<3,3> for the pose graph; robust DCS
kernel on closures, submap_loop_closer.cpp:41,283). Design per
SURVEY.md §7: fixed-shape masked edge tables, vmapped residual/Jacobian
evaluation, scatter-assembled normal equations, Schur-complement
elimination of 2-DoF landmark blocks, dense Cholesky for the reduced
pose system. Everything here is jit-compatible; shapes are static.

Edge types:
  - SE2->SE2 odometry/closure edges (g2o EdgeSE2 semantics:
    e = t2v(Z^-1 (Xi^-1 Xj)))
  - SE2->(rho,theta) line observation edges (g2o_bindings
    edge_se2_rhotheta.cpp:9-16: e = z - transform_line(l, Xi^-1))
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.se2 import wrap_angle
from .line_geometry import transform_line

# Normal-equation assembly is numerically delicate in f32: TPU default
# matmul precision (bf16 passes) corrupts H enough to break Cholesky.
# All jitted solver entry points trace under the "highest" context.
def precise(fn):
    """Decorator: trace `fn` with float32-accurate matmuls on TPU."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return wrapped

# ---------------------------------------------------------------------------
# residuals + Jacobians
# ---------------------------------------------------------------------------


def se2_edge_residual(xi, xj, z):
    """e = t2v(Z^-1 * (Xi^-1 * Xj)) for batches of edges.

    xi, xj, z: (...,3). Returns (...,3) with wrapped angle.
    """
    ci, si = jnp.cos(xi[..., 2]), jnp.sin(xi[..., 2])
    dx = xj[..., 0] - xi[..., 0]
    dy = xj[..., 1] - xi[..., 1]
    # d = Ri^T (tj - ti)
    d0 = ci * dx + si * dy
    d1 = -si * dx + ci * dy
    cz, sz = jnp.cos(z[..., 2]), jnp.sin(z[..., 2])
    e0 = cz * (d0 - z[..., 0]) + sz * (d1 - z[..., 1])
    e1 = -sz * (d0 - z[..., 0]) + cz * (d1 - z[..., 1])
    e2 = wrap_angle(xj[..., 2] - xi[..., 2] - z[..., 2])
    return jnp.stack([e0, e1, e2], axis=-1)


def se2_edge_jacobians(xi, xj, z):
    """Closed-form (...,3,3) Jacobians (Ji, Jj) of se2_edge_residual."""
    ci, si = jnp.cos(xi[..., 2]), jnp.sin(xi[..., 2])
    cz, sz = jnp.cos(z[..., 2]), jnp.sin(z[..., 2])
    dx = xj[..., 0] - xi[..., 0]
    dy = xj[..., 1] - xi[..., 1]
    # Rz^T Ri^T
    a = cz * ci + sz * -si  # hmm: compute M = Rz^T @ Ri^T explicitly
    # Ri^T = [[ci, si], [-si, ci]]; Rz^T = [[cz, sz], [-sz, cz]]
    m00 = cz * ci + sz * (-si)
    m01 = cz * si + sz * ci
    m10 = -sz * ci + cz * (-si)
    m11 = -sz * si + cz * ci
    del a
    # dRi^T/dtheta_i = [[-si, ci], [-ci, -si]]
    g0 = -si * dx + ci * dy
    g1 = -ci * dx - si * dy
    # de_t/dtheta_i = Rz^T @ [g0, g1]
    e0_ti = cz * g0 + sz * g1
    e1_ti = -sz * g0 + cz * g1
    o = jnp.zeros_like(ci)
    i1 = jnp.ones_like(ci)
    Ji = jnp.stack(
        [
            jnp.stack([-m00, -m01, e0_ti], axis=-1),
            jnp.stack([-m10, -m11, e1_ti], axis=-1),
            jnp.stack([o, o, -i1], axis=-1),
        ],
        axis=-2,
    )
    Jj = jnp.stack(
        [
            jnp.stack([m00, m01, o], axis=-1),
            jnp.stack([m10, m11, o], axis=-1),
            jnp.stack([o, o, i1], axis=-1),
        ],
        axis=-2,
    )
    return Ji, Jj


def rhotheta_edge_residual(pose, lm, z):
    """e = z - transform_line(lm, pose^-1), angle wrapped
    (edge_se2_rhotheta.cpp:9-16)."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    inv_t = jnp.stack(
        [
            -(c * pose[..., 0] + s * pose[..., 1]),
            -(-s * pose[..., 0] + c * pose[..., 1]),
        ],
        axis=-1,
    )
    pred = transform_line(lm, inv_t, -pose[..., 2])
    e = z - pred
    return jnp.stack([e[..., 0], wrap_angle(e[..., 1])], axis=-1)


def rhotheta_edge_jacobians(poses, lms, zs):
    """Closed-form (E,2,3) d e/d pose and (E,2,2) d e/d lm.

    Derivation: with c,s = cos/sin(theta_p), inv_t = (-(c x + s y),
    s x - c y), theta_raw = theta_l - theta_p, n = (cos, sin)(theta_raw)
    and rho_raw = rho_l + inv_t.n, the prediction is (sigma*rho_raw,
    theta_raw [+pi]) where sigma = -1 on the rho<0 normalization flip
    (check_rhotheta) -- the branch is differentiated as taken, matching
    forward-mode AD of the residual (validated in tests); closed form
    keeps the per-iteration HLO ~3x smaller than vmapped jacfwd, which
    matters for the remote-compile path.
    """
    dt = poses.dtype
    c, s = jnp.cos(poses[..., 2]), jnp.sin(poses[..., 2])
    x, y = poses[..., 0], poses[..., 1]
    itx = -(c * x + s * y)
    ity = s * x - c * y
    theta_raw = wrap_angle(lms[..., 1] - poses[..., 2])
    nx, ny = jnp.cos(theta_raw), jnp.sin(theta_raw)
    rho_raw = lms[..., 0] + itx * nx + ity * ny
    sigma = jnp.where(rho_raw < 0, -1.0, 1.0).astype(dt)

    # d rho_raw / d {x, y, theta_l}; d rho_raw / d theta_p == 0 exactly
    # (body-frame rho is the distance from the robot position to the
    # world line -- rotation-invariant)
    dr_dx = -c * nx + s * ny  # = -cos(theta_l)
    dr_dy = -s * nx - c * ny  # = -sin(theta_l)
    dr_dthl = -itx * ny + ity * nx  # inv_t . dn/dtheta_raw

    o = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    Jp = jnp.stack(
        [
            jnp.stack([-sigma * dr_dx, -sigma * dr_dy, o], axis=-1),
            jnp.stack([o, o, one], axis=-1),
        ],
        axis=-2,
    )
    Jl = jnp.stack(
        [
            jnp.stack([-sigma, -sigma * dr_dthl], axis=-1),
            jnp.stack([o, -one], axis=-1),
        ],
        axis=-2,
    )
    return Jp, Jl


# ---------------------------------------------------------------------------
# block-tridiagonal machinery (3x3 blocks)
# ---------------------------------------------------------------------------


def inv3(m):
    """Explicit 3x3 inverse (adjugate) -- batched-friendly, avoids the
    generic LU path for the tiny blocks of chain systems."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    rows = [
        jnp.stack([A, B, C], axis=-1),
        jnp.stack([D, E, F], axis=-1),
        jnp.stack([G, H, I], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def tridiag_solve(D, O, rhs, unroll: int = 1):
    """Solve a block-tridiagonal SPD system (3x3 blocks) for multiple
    right-hand sides via block LDL^T with a forward/backward lax.scan.

    D: (P, 3, 3) diagonal blocks; O: (P, 3, 3) with O[i] the
    H[i-1, i] coupling block (O[0] ignored); rhs: (P, 3, R).
    Returns x (P, 3, R). O(P) -- replaces the dense (3P)^3 Cholesky for
    chain-structured systems (the landmark-graph pose chain).

    unroll > 1 unrolls the scans (fewer loop trips; XLA fuses across
    the unrolled steps) -- useful when each step is tiny and the scan
    is latency-bound (the vmapped partitioned-solver interior solve).
    """
    P = D.shape[0]
    O = O.at[0].set(0.0)

    def fwd(carry, inp):
        S_prev_inv, y_prev = carry
        D_i, O_i, r_i = inp
        L = jnp.swapaxes(O_i, -1, -2) @ S_prev_inv  # (3,3)
        S_i = D_i - L @ O_i
        S_inv = inv3(S_i)
        y_i = r_i - L @ y_prev
        return (S_inv, y_i), (S_inv, y_i)

    R = rhs.shape[-1]
    init = (jnp.zeros((3, 3), D.dtype), jnp.zeros((3, R), D.dtype))
    _, (S_invs, ys) = jax.lax.scan(fwd, init, (D, O, rhs), unroll=unroll)

    def bwd(x_next, inp):
        S_inv, y, O_next = inp
        x_i = S_inv @ (y - O_next @ x_next)
        return x_i, x_i

    O_next = jnp.concatenate(
        [O[1:], jnp.zeros((1, 3, 3), D.dtype)], axis=0
    )
    _, xs = jax.lax.scan(
        bwd,
        jnp.zeros((3, R), D.dtype),
        (S_invs, ys, O_next),
        reverse=True,
        unroll=unroll,
    )
    return xs


def tridiag_solve_cr(D, O, rhs, min_seq: int = 1):
    """Block cyclic reduction for the same SPD block-tridiagonal system
    as tridiag_solve: O(log P) parallel elimination levels instead of
    an O(P) sequential scan -- each level eliminates all odd-indexed
    blocks simultaneously (vectorized across blocks, partitions, and
    right-hand sides). Equivalent to block Cholesky under a
    nested-dissection ordering, so stability matches the LDL scan for
    SPD input.

    min_seq > 1 gives the hybrid schedule: reduce until min_seq blocks
    remain, then solve that core with the sequential-scan LDL. Each CR
    level costs a fixed handful of op dispatches while the scan costs
    ~2 dispatches per block row, so the optimum runs a few CR levels
    and a short scan (both regimes are latency-bound on TPU, not
    FLOP-bound).

    D: (P, 3, 3); O: (P, 3, 3) with O[i] = H[i-1, i] (O[0] ignored);
    rhs: (P, 3, R). Returns x (P, 3, R).
    """
    P = D.shape[0]
    M = 1
    while M < max(P, 1):
        M *= 2
    dt = D.dtype
    eye = jnp.eye(3, dtype=dt)
    if M != P:
        pad = M - P
        D = jnp.concatenate([D, jnp.tile(eye, (pad, 1, 1))], axis=0)
        O = jnp.concatenate([O, jnp.zeros((pad, 3, 3), dt)], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((pad,) + rhs.shape[1:], dt)], axis=0
        )
    E = O.at[0].set(0.0)
    r = rhs

    # forward elimination: per level, remove odd-indexed blocks
    stack = []  # per-level (D_o_inv, E_e, E_o) for back-substitution
    m = M
    while m > min_seq:
        D_e, D_o = D[0::2], D[1::2]
        E_e, E_o = E[0::2], E[1::2]
        r_e, r_o = r[0::2], r[1::2]
        Dinv_o = inv3(D_o)
        z33 = jnp.zeros((1, 3, 3), dt)
        Dinv_prev = jnp.concatenate([z33, Dinv_o[:-1]], axis=0)
        E_o_prev = jnp.concatenate([z33, E_o[:-1]], axis=0)
        r_o_prev = jnp.concatenate(
            [jnp.zeros((1,) + r.shape[1:], dt), r_o[:-1]], axis=0
        )
        EeT = jnp.swapaxes(E_e, -1, -2)
        L = EeT @ Dinv_prev  # couples eq 2k to odd 2k-1
        Rr = E_o @ Dinv_o  # couples eq 2k to odd 2k+1
        D_new = D_e - L @ jnp.swapaxes(EeT, -1, -2) - Rr @ jnp.swapaxes(
            E_o, -1, -2
        )
        r_new = r_e - L @ r_o_prev - Rr @ r_o
        # convention E'[k] = H'[k-1, k]: the elimination of odd block
        # 2k-1 couples eq 2k to x_{2k-2} with -E_e^T Dinv E_o_prev^T,
        # which is H'[k, k-1]; store its transpose
        E_new = -(E_o_prev @ Dinv_prev @ E_e)
        stack.append((Dinv_o, E_e, E_o, r_o))
        D, E, r = D_new, E_new, r_new
        m //= 2

    if m > 1:
        x = tridiag_solve(D, E, r)  # short sequential core
    else:
        x = inv3(D[0])[None] @ r  # (1, 3, R)

    # back-substitution: recover the odd blocks of each level
    for Dinv_o, E_e, E_o, r_o in reversed(stack):
        half = Dinv_o.shape[0]
        x_e = x  # (half, 3, R)
        E_e_next = jnp.concatenate(
            [E_e[1:], jnp.zeros((1, 3, 3), dt)], axis=0
        )
        x_e_next = jnp.concatenate(
            [x_e[1:], jnp.zeros((1,) + x.shape[1:], dt)], axis=0
        )
        x_o = Dinv_o @ (
            r_o
            - jnp.swapaxes(E_o, -1, -2) @ x_e
            - E_e_next @ x_e_next
        )
        x = jnp.stack([x_e, x_o], axis=1).reshape(
            2 * half, *x.shape[1:]
        )
    return x[:P]


# ---------------------------------------------------------------------------
# robust kernel
# ---------------------------------------------------------------------------


def dcs_weight(chi2, phi):
    """Dynamic Covariance Scaling weight s^2, s = min(1, 2 phi/(phi+chi2))
    (g2o RobustKernelDCS::robustify; reference submap_loop_closer.cpp:41)."""
    s = jnp.minimum(1.0, 2.0 * phi / (phi + chi2))
    return s * s


# ---------------------------------------------------------------------------
# landmark-graph system (poses + rho-theta landmarks)
# ---------------------------------------------------------------------------


class LMGraphData(NamedTuple):
    """Fixed-shape landmark-graph arrays (reference: include/graphs.h:15-28).

    Pose i connects to pose i-1 via odometry edge i (odom_valid[i]).
    Obs edge e connects pose obs_pose[e] to landmark obs_lm[e].
    """

    poses: jnp.ndarray  # (P, 3)
    pose_valid: jnp.ndarray  # (P,) bool
    pose_fixed: jnp.ndarray  # (P,) bool
    odom_meas: jnp.ndarray  # (P, 3)
    odom_info: jnp.ndarray  # (P, 3, 3)
    odom_valid: jnp.ndarray  # (P,) bool
    lms: jnp.ndarray  # (L, 2)
    lm_valid: jnp.ndarray  # (L,) bool
    obs_pose: jnp.ndarray  # (E,) int32
    obs_lm: jnp.ndarray  # (E,) int32
    obs_meas: jnp.ndarray  # (E, 2)
    obs_info: jnp.ndarray  # (E, 2, 2)
    obs_valid: jnp.ndarray  # (E,) bool


def lm_graph_chi2(g: LMGraphData):
    """Total chi2 and dof over active edges (drone.cpp:161-165)."""
    xi = g.poses[jnp.maximum(jnp.arange(g.poses.shape[0]) - 1, 0)]
    eo = se2_edge_residual(xi, g.poses, g.odom_meas)
    c_o = jnp.einsum("ni,nij,nj->n", eo, g.odom_info, eo)
    chi2 = jnp.sum(jnp.where(g.odom_valid, c_o, 0.0))
    el = rhotheta_edge_residual(
        g.poses[g.obs_pose], g.lms[g.obs_lm], g.obs_meas
    )
    c_l = jnp.einsum("ni,nij,nj->n", el, g.obs_info, el)
    chi2 = chi2 + jnp.sum(jnp.where(g.obs_valid, c_l, 0.0))
    dof = 3 * jnp.sum(g.odom_valid) + 2 * jnp.sum(g.obs_valid)
    return chi2, dof


def _assemble_lm_system(g: LMGraphData):
    """Build the (masked, fixed-aware) normal equations of the landmark
    graph: pose block Hpp (P,P,3,3), landmark diag Hll (L,2,2), coupling
    via obs edges kept in edge-list form for the Schur product."""
    P = g.poses.shape[0]
    idx_prev = jnp.maximum(jnp.arange(P) - 1, 0)
    xi = g.poses[idx_prev]
    eo = se2_edge_residual(xi, g.poses, g.odom_meas)
    Ji, Jj = se2_edge_jacobians(xi, g.poses, g.odom_meas)
    w_o = g.odom_valid.astype(g.poses.dtype)
    # free-variable masks: fixed poses contribute nothing
    free_i = (~g.pose_fixed[idx_prev]).astype(g.poses.dtype)
    free_j = (~g.pose_fixed).astype(g.poses.dtype)
    Ji = Ji * (w_o * free_i)[:, None, None]
    Jj = Jj * (w_o * free_j)[:, None, None]

    OJi = jnp.einsum("nab,nbc->nac", g.odom_info, Ji)
    OJj = jnp.einsum("nab,nbc->nac", g.odom_info, Jj)
    H_ii = jnp.einsum("nba,nbc->nac", Ji, OJi)
    H_ij = jnp.einsum("nba,nbc->nac", Ji, OJj)
    H_jj = jnp.einsum("nba,nbc->nac", Jj, OJj)
    eo_w = eo * w_o[:, None]
    b_i = jnp.einsum("nba,nb->na", OJi, eo_w)
    b_j = jnp.einsum("nba,nb->na", OJj, eo_w)

    Hpp = jnp.zeros((P, P, 3, 3), g.poses.dtype)
    Hpp = Hpp.at[idx_prev, idx_prev].add(H_ii)
    Hpp = Hpp.at[idx_prev, jnp.arange(P)].add(H_ij)
    Hpp = Hpp.at[jnp.arange(P), idx_prev].add(jnp.swapaxes(H_ij, -1, -2))
    Hpp = Hpp.at[jnp.arange(P), jnp.arange(P)].add(H_jj)
    bp = jnp.zeros((P, 3), g.poses.dtype)
    bp = bp.at[idx_prev].add(-b_i)
    bp = bp.at[jnp.arange(P)].add(-b_j)

    # observation edges
    ep = g.poses[g.obs_pose]
    el = g.lms[g.obs_lm]
    r = rhotheta_edge_residual(ep, el, g.obs_meas)
    Jp, Jl = rhotheta_edge_jacobians(ep, el, g.obs_meas)
    w_e = g.obs_valid.astype(g.poses.dtype)
    free_p = (~g.pose_fixed[g.obs_pose]).astype(g.poses.dtype)
    Jp = Jp * (w_e * free_p)[:, None, None]
    Jl = Jl * w_e[:, None, None]
    OJp = jnp.einsum("nab,nbc->nac", g.obs_info, Jp)
    OJl = jnp.einsum("nab,nbc->nac", g.obs_info, Jl)
    Hpp_e = jnp.einsum("nba,nbc->nac", Jp, OJp)  # (E,3,3)
    Hpl_e = jnp.einsum("nba,nbc->nac", Jp, OJl)  # (E,3,2)
    Hll_e = jnp.einsum("nba,nbc->nac", Jl, OJl)  # (E,2,2)
    r_w = r * w_e[:, None]
    bp_e = jnp.einsum("nba,nb->na", OJp, r_w)  # (E,3)
    bl_e = jnp.einsum("nba,nb->na", OJl, r_w)  # (E,2)

    Hpp = Hpp.at[g.obs_pose, g.obs_pose].add(Hpp_e)
    bp = bp.at[g.obs_pose].add(-bp_e)

    L = g.lms.shape[0]
    Hll = jnp.zeros((L, 2, 2), g.poses.dtype)
    Hll = Hll.at[g.obs_lm].add(Hll_e)
    bl = jnp.zeros((L, 2), g.poses.dtype)
    bl = bl.at[g.obs_lm].add(-bl_e)

    return Hpp, bp, Hll, bl, Hpl_e


def _schur_solve(g: LMGraphData, Hpp, bp, Hll, bl, Hpl_e, lam):
    """Solve the damped system via Schur elimination of landmarks.

    Damping: g2o's Levenberg adds lambda to every diagonal entry
    (BlockSolver::setLambda); inactive/fixed variables get identity
    diagonals so the dense factorization stays SPD and their update is 0.
    """
    P = Hpp.shape[0]
    L = Hll.shape[0]
    dt = Hpp.dtype
    pose_free = (g.pose_valid & (~g.pose_fixed)).astype(dt)
    lm_free = g.lm_valid.astype(dt)

    eye3 = jnp.eye(3, dtype=dt)
    eye2 = jnp.eye(2, dtype=dt)
    diag_fix_p = (1.0 - pose_free)[:, None, None] * eye3
    Hpp = Hpp.at[jnp.arange(P), jnp.arange(P)].add(
        lam * eye3 * pose_free[:, None, None] + diag_fix_p
    )
    Hll = Hll + lam * eye2 * lm_free[:, None, None] + (
        (1.0 - lm_free)[:, None, None] * eye2
    )
    bp = bp * pose_free[:, None]
    bl = bl * lm_free[:, None]

    Hll_inv = jnp.linalg.inv(Hll)
    # Schur: S = Hpp - sum_e1,e2 coupling. Edge-list form:
    # W_e = Hpl_e (3,2) couples pose p_e with lm l_e. The correction is
    # sum over lm l: (sum_{e: l} W_e gathered at p_e) Hll_inv_l (...)^T.
    # Scatter into dense (P, L, 3, 2) coupling: P*L small (<= 512*256).
    Hpl = jnp.zeros((P, L, 3, 2), dt)
    Hpl = Hpl.at[g.obs_pose, g.obs_lm].add(Hpl_e)
    HplHinv = jnp.einsum("plab,lbc->plac", Hpl, Hll_inv)
    S = Hpp - jnp.einsum("plab,qlcb->pqac", HplHinv, Hpl)
    rhs = bp - jnp.einsum("plab,lb->pa", HplHinv, bl)

    Sd = S.transpose(0, 2, 1, 3).reshape(3 * P, 3 * P)
    rd = rhs.reshape(3 * P)
    # dense SPD solve of the reduced pose system
    chol = jax.scipy.linalg.cho_factor(Sd)
    dp = jax.scipy.linalg.cho_solve(chol, rd).reshape(P, 3)
    dl = jnp.einsum(
        "lab,lb->la",
        Hll_inv,
        bl - jnp.einsum("plab,pa->lb", Hpl, dp),
    )
    dp = dp * pose_free[:, None]
    dl = dl * lm_free[:, None]
    return dp, dl


def _chol2(m):
    """Closed-form 2x2 Cholesky factor of SPD matrices (...,2,2)."""
    a = jnp.sqrt(jnp.maximum(m[..., 0, 0], 1e-30))
    b = m[..., 1, 0] / a
    c = jnp.sqrt(jnp.maximum(m[..., 1, 1] - b * b, 1e-30))
    z = jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([a, z], -1), jnp.stack([b, c], -1)], -2
    )


def _lm_tridiag_assemble(g: LMGraphData):
    """Assemble the chain-structured landmark-graph normal equations:
    (D (P,3,3) undamped pose diag, O (P,3,3) chain off-diag, bp,
    Hll (L,2,2) undamped, bl, W_e (E,3,2) pose-landmark coupling)."""
    P = g.poses.shape[0]
    L = g.lms.shape[0]
    dt = g.poses.dtype
    idx_prev = jnp.maximum(jnp.arange(P) - 1, 0)
    xi = g.poses[idx_prev]
    eo = se2_edge_residual(xi, g.poses, g.odom_meas)
    Ji, Jj = se2_edge_jacobians(xi, g.poses, g.odom_meas)
    w_o = g.odom_valid.astype(dt)
    free_i = (~g.pose_fixed[idx_prev]).astype(dt)
    free_j = (~g.pose_fixed).astype(dt)
    Ji = Ji * (w_o * free_i)[:, None, None]
    Jj = Jj * (w_o * free_j)[:, None, None]
    OJi = jnp.einsum("nab,nbc->nac", g.odom_info, Ji)
    OJj = jnp.einsum("nab,nbc->nac", g.odom_info, Jj)
    D = jnp.zeros((P, 3, 3), dt)
    D = D.at[idx_prev].add(jnp.einsum("nba,nbc->nac", Ji, OJi))
    D = D.at[jnp.arange(P)].add(jnp.einsum("nba,nbc->nac", Jj, OJj))
    O = jnp.einsum("nba,nbc->nac", Ji, OJj)  # H[i-1, i]
    eo_w = eo * w_o[:, None]
    bp = jnp.zeros((P, 3), dt)
    bp = bp.at[idx_prev].add(-jnp.einsum("nba,nb->na", OJi, eo_w))
    bp = bp.at[jnp.arange(P)].add(-jnp.einsum("nba,nb->na", OJj, eo_w))

    ep = g.poses[g.obs_pose]
    el = g.lms[g.obs_lm]
    r = rhotheta_edge_residual(ep, el, g.obs_meas)
    Jp, Jl = rhotheta_edge_jacobians(ep, el, g.obs_meas)
    w_e = g.obs_valid.astype(dt)
    free_p = (~g.pose_fixed[g.obs_pose]).astype(dt)
    Jp = Jp * (w_e * free_p)[:, None, None]
    Jl = Jl * w_e[:, None, None]
    OJp = jnp.einsum("nab,nbc->nac", g.obs_info, Jp)
    OJl = jnp.einsum("nab,nbc->nac", g.obs_info, Jl)
    D = D.at[g.obs_pose].add(jnp.einsum("nba,nbc->nac", Jp, OJp))
    Hll = jnp.zeros((L, 2, 2), dt)
    Hll = Hll.at[g.obs_lm].add(jnp.einsum("nba,nbc->nac", Jl, OJl))
    W_e = jnp.einsum("nba,nbc->nac", Jp, OJl)  # (E,3,2) at (p_e, l_e)
    r_w = r * w_e[:, None]
    bp = bp.at[g.obs_pose].add(-jnp.einsum("nba,nb->na", OJp, r_w))
    bl = jnp.zeros((L, 2), dt)
    bl = bl.at[g.obs_lm].add(-jnp.einsum("nba,nb->na", OJl, r_w))

    return D, O, bp, Hll, bl, W_e


def _schur_solve_tridiag(g: LMGraphData, parts, lam):
    """O(P) landmark-graph solve: the pose chain factorizes as a block
    tridiagonal (tridiag_solve), landmark elimination enters as a
    rank-2L Woodbury downdate. Replaces the dense (3P)^3 path when the
    active window grows (long closure-free stretches, e.g. corridors --
    the situation where g2o's sparse Cholesky also stays O(P)).

    Math: after eliminating landmarks, S = T - V V^T with
    V[:, 2l:2l+2] = W_l chol(Hll_l^-1); then
    S^-1 b = T^-1 b + T^-1 V (I - V^T T^-1 V)^-1 V^T T^-1 b.
    """
    D, O, bp, Hll, bl, W_e = parts
    P = g.poses.shape[0]
    L = g.lms.shape[0]
    dt = g.poses.dtype
    pose_free = (g.pose_valid & (~g.pose_fixed)).astype(dt)
    lm_free = g.lm_valid.astype(dt)
    eye3 = jnp.eye(3, dtype=dt)
    eye2 = jnp.eye(2, dtype=dt)
    D = D + (lam * pose_free + (1.0 - pose_free))[:, None, None] * eye3
    Hll = Hll + (lam * lm_free + (1.0 - lm_free))[:, None, None] * eye2
    bp = bp * pose_free[:, None]
    bl = bl * lm_free[:, None]
    Hll_inv = jnp.linalg.inv(Hll)

    # reduced rhs: b' = bp - W Hll^-1 bl (edge-wise scatter)
    hb = jnp.einsum("lab,lb->la", Hll_inv, bl)  # (L,2)
    bp_red = bp.at[g.obs_pose].add(
        -jnp.einsum("nab,nb->na", W_e, hb[g.obs_lm])
    )

    # V = W blockdiag(chol(Hll^-1)): assemble dense (3P, 2L) in 2-D
    R2 = _chol2(Hll_inv)  # (L,2,2)
    WR = jnp.einsum("nab,nbc->nac", W_e, R2[g.obs_lm])  # (E,3,2)
    V = jnp.zeros((3 * P, 2 * L), dt)
    ar3 = jnp.arange(3)
    ar2 = jnp.arange(2)
    rows = (3 * g.obs_pose)[:, None] + ar3[None, :]
    cols = (2 * g.obs_lm)[:, None] + ar2[None, :]
    V = V.at[rows[:, :, None], cols[:, None, :]].add(WR)

    rhs = jnp.concatenate(
        [bp_red.reshape(3 * P, 1), V], axis=1
    ).reshape(P, 3, 1 + 2 * L)
    X = tridiag_solve(D, O, rhs).reshape(3 * P, 1 + 2 * L)
    xb, XV = X[:, 0], X[:, 1:]
    Mmat = jnp.eye(2 * L, dtype=dt) - V.T @ XV
    wvec = jnp.linalg.solve(Mmat, V.T @ xb)
    dp = (xb + XV @ wvec).reshape(P, 3)
    dp = dp * pose_free[:, None]

    # back-substitute landmarks: dl = Hll^-1 (bl - W^T dp)
    wtdp = jnp.zeros((L, 2), dt)
    wtdp = wtdp.at[g.obs_lm].add(
        jnp.einsum("nab,na->nb", W_e, dp[g.obs_pose])
    )
    dl = jnp.einsum("lab,lb->la", Hll_inv, bl - wtdp)
    dl = dl * lm_free[:, None]
    return dp, dl, bp, bl


def _lm_apply(g: LMGraphData, dp, dl) -> LMGraphData:
    poses = g.poses + dp
    poses = poses.at[:, 2].set(wrap_angle(poses[:, 2]))
    lms = g.lms + dl
    lms = lms.at[:, 1].set(wrap_angle(lms[:, 1]))
    return g._replace(poses=poses, lms=lms)


@precise
def optimize_landmark_graph(
    g: LMGraphData, iterations: int = 15, tau: float = 1e-5,
    tridiag_threshold: int = 128, rtol: float = 1e-7,
):
    """Levenberg-Marquardt with g2o's damping schedule
    (OptimizationAlgorithmLevenberg): initial lambda = tau * max diag(H),
    gain-ratio-driven lambda update, reject restores the previous state.
    Replaces lm_graph.opt.optimize(15) (drone.cpp:146-156).

    Returns (g_optimized, chi2, dof).

    Linear-solve path is chosen statically by window size: dense Schur
    for small windows, block-tridiagonal + Woodbury (O(P)) for large
    ones (long closure-free stretches).

    rtol > 0 enables early termination (lax.while_loop): stop once an
    accepted step improves chi2 by less than rtol relatively (the g2o
    levenberg terminateThreshold idea). The frontend warm-starts each
    keyframe from the previous solution, so most ticks converge in a
    few iterations instead of burning all `iterations`; rtol=0
    restores the fixed-trip scan behavior exactly.
    """
    chi2_0, dof = lm_graph_chi2(g)
    use_tridiag = g.poses.shape[0] >= tridiag_threshold

    if use_tridiag:
        D0, _, _, Hll0t, _, _ = _lm_tridiag_assemble(g)
        diag_max = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(D0, axis1=-2, axis2=-1))),
            jnp.max(jnp.abs(jnp.diagonal(Hll0t, axis1=-2, axis2=-1))),
        )
    else:
        Hpp0, _, Hll0, _, _ = _assemble_lm_system(g)
        P = Hpp0.shape[0]
        diag_max = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(Hpp0[jnp.arange(P), jnp.arange(P)],
                                         axis1=-2, axis2=-1))),
            jnp.max(jnp.abs(jnp.diagonal(Hll0, axis1=-2, axis2=-1))),
        )
    lam0 = tau * diag_max

    def step(g_cur, chi2_cur, lam, ni):
        if use_tridiag:
            parts = _lm_tridiag_assemble(g_cur)
            bp, bl = parts[2], parts[4]
            dp, dl, _, _ = _schur_solve_tridiag(g_cur, parts, lam)
        else:
            Hpp, bp, Hll, bl, Hpl_e = _assemble_lm_system(g_cur)
            dp, dl = _schur_solve(g_cur, Hpp, bp, Hll, bl, Hpl_e, lam)
        g_new = _lm_apply(g_cur, dp, dl)
        chi2_new, _ = lm_graph_chi2(g_new)
        # gain ratio rho = (chi2_cur - chi2_new) / (d^T (lam d + b))
        lin = jnp.sum(dp * (lam * dp + bp)) + jnp.sum(dl * (lam * dl + bl))
        rho = (chi2_cur - chi2_new) / jnp.maximum(lin, 1e-12)
        accept = (rho > 0.0) & jnp.isfinite(chi2_new)
        factor = jnp.maximum(
            1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3
        )
        lam_next = jnp.where(accept, lam * factor, lam * ni)
        ni_next = jnp.where(accept, 2.0, ni * 2.0)
        g_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                jnp.broadcast_to(
                    accept.reshape((1,) * new.ndim), new.shape
                ),
                new,
                old,
            ),
            g_new,
            g_cur,
        )
        chi2_next = jnp.where(accept, chi2_new, chi2_cur)
        rel_impr = jnp.where(
            accept,
            (chi2_cur - chi2_new) / jnp.maximum(chi2_cur, 1e-30),
            jnp.inf,
        )
        return g_next, chi2_next, lam_next, ni_next, rel_impr

    if rtol <= 0.0:

        def body(carry, _):
            g_cur, chi2_cur, lam, ni = carry
            g_next, chi2_next, lam_next, ni_next, _ = step(
                g_cur, chi2_cur, lam, ni
            )
            return (g_next, chi2_next, lam_next, ni_next), chi2_next

        (g_out, chi2_out, _, _), _ = jax.lax.scan(
            body, (g, chi2_0, lam0, 2.0), None, length=iterations
        )
        return g_out, chi2_out, dof

    def wcond(carry):
        _, _, _, _, it, done = carry
        return (it < iterations) & jnp.logical_not(done)

    def wbody(carry):
        g_cur, chi2_cur, lam, ni, it, _ = carry
        g_next, chi2_next, lam_next, ni_next, rel_impr = step(
            g_cur, chi2_cur, lam, ni
        )
        done = (rel_impr < rtol) | (lam_next > 1e10)
        return (g_next, chi2_next, lam_next, ni_next, it + 1, done)

    g_out, chi2_out, _, _, _, _ = jax.lax.while_loop(
        wcond, wbody, (g, chi2_0, lam0, 2.0, jnp.int32(0), jnp.bool_(False))
    )
    return g_out, chi2_out, dof


# ---------------------------------------------------------------------------
# pose-graph system (chain + loop closures, DCS-robustified GN)
# ---------------------------------------------------------------------------


class PoseGraphData(NamedTuple):
    """Fixed-shape pose-graph arrays (reference: include/graphs.h:30-40)."""

    poses: jnp.ndarray  # (N, 3)
    valid: jnp.ndarray  # (N,) bool
    fixed: jnp.ndarray  # (N,) bool
    chain_meas: jnp.ndarray  # (N, 3) edge i-1 -> i
    chain_info: jnp.ndarray  # (N, 3, 3)
    chain_valid: jnp.ndarray  # (N,) bool
    clo_i: jnp.ndarray  # (C,) int32
    clo_j: jnp.ndarray  # (C,) int32
    clo_meas: jnp.ndarray  # (C, 3)
    clo_info: jnp.ndarray  # (C, 3, 3)
    clo_valid: jnp.ndarray  # (C,) bool


def posegraph_chi2(g: PoseGraphData, phi: float | None = None):
    """chi2 of all active edges; closure chi2 optionally DCS-scaled."""
    N = g.poses.shape[0]
    idx_prev = jnp.maximum(jnp.arange(N) - 1, 0)
    eo = se2_edge_residual(g.poses[idx_prev], g.poses, g.chain_meas)
    c_o = jnp.einsum("ni,nij,nj->n", eo, g.chain_info, eo)
    chi2 = jnp.sum(jnp.where(g.chain_valid, c_o, 0.0))
    ec = se2_edge_residual(
        g.poses[g.clo_i], g.poses[g.clo_j], g.clo_meas
    )
    c_c = jnp.einsum("ni,nij,nj->n", ec, g.clo_info, ec)
    if phi is not None:
        w = dcs_weight(c_c, phi)
        # g2o adds rho(chi2) (= w-scaled) to the robust objective
        c_c = w * c_c
    chi2 = chi2 + jnp.sum(jnp.where(g.clo_valid, c_c, 0.0))
    return chi2


def closure_chi2(g: PoseGraphData):
    """Raw chi2 per closure edge (for the 11.345 pruning gate,
    log_runner.cpp:182-190)."""
    ec = se2_edge_residual(g.poses[g.clo_i], g.poses[g.clo_j], g.clo_meas)
    return jnp.einsum("ni,nij,nj->n", ec, g.clo_info, ec)


def _assemble_posegraph(g: PoseGraphData, phi: float):
    N = g.poses.shape[0]
    dt = g.poses.dtype
    idx_prev = jnp.maximum(jnp.arange(N) - 1, 0)

    def edge_terms(ii, jj, meas, info, valid, robust):
        xi, xj = g.poses[ii], g.poses[jj]
        e = se2_edge_residual(xi, xj, meas)
        Ji, Jj = se2_edge_jacobians(xi, xj, meas)
        chi2_e = jnp.einsum("ni,nij,nj->n", e, info, e)
        w = valid.astype(dt)
        if robust:
            w = w * dcs_weight(chi2_e, phi)
        free_i = (~g.fixed[ii]).astype(dt)
        free_j = (~g.fixed[jj]).astype(dt)
        Ji = Ji * free_i[:, None, None]
        Jj = Jj * free_j[:, None, None]
        info_w = info * w[:, None, None]
        OJi = jnp.einsum("nab,nbc->nac", info_w, Ji)
        OJj = jnp.einsum("nab,nbc->nac", info_w, Jj)
        return e, Ji, Jj, OJi, OJj

    Hd = jnp.zeros((N, 3, 3), dt)  # block diagonal
    b = jnp.zeros((N, 3), dt)

    # chain edges: prev -> cur
    e, Ji, Jj, OJi, OJj = edge_terms(
        idx_prev, jnp.arange(N), g.chain_meas, g.chain_info,
        g.chain_valid, robust=False,
    )
    Hd = Hd.at[idx_prev].add(jnp.einsum("nba,nbc->nac", Ji, OJi))
    Hd = Hd.at[jnp.arange(N)].add(jnp.einsum("nba,nbc->nac", Jj, OJj))
    H_off_chain = jnp.einsum("nba,nbc->nac", Ji, OJj)  # (N,3,3) at (i-1, i)
    b = b.at[idx_prev].add(-jnp.einsum("nba,nb->na", OJi, e))
    b = b.at[jnp.arange(N)].add(-jnp.einsum("nba,nb->na", OJj, e))

    # closure edges (DCS)
    ec, Jci, Jcj, OJci, OJcj = edge_terms(
        g.clo_i, g.clo_j, g.clo_meas, g.clo_info, g.clo_valid, robust=True
    )
    Hd = Hd.at[g.clo_i].add(jnp.einsum("nba,nbc->nac", Jci, OJci))
    Hd = Hd.at[g.clo_j].add(jnp.einsum("nba,nbc->nac", Jcj, OJcj))
    H_off_clo = jnp.einsum("nba,nbc->nac", Jci, OJcj)  # at (clo_i, clo_j)
    b = b.at[g.clo_i].add(-jnp.einsum("nba,nb->na", OJci, ec))
    b = b.at[g.clo_j].add(-jnp.einsum("nba,nb->na", OJcj, ec))

    return Hd, H_off_chain, H_off_clo, b


def _posegraph_dense_solve(g: PoseGraphData, Hd, H_off_chain, H_off_clo, b):
    """Assemble dense (3N,3N) H and Cholesky-solve. Correctness path;
    the partitioned solver (parallel.dist_solver) is the scalable path."""
    N = g.poses.shape[0]
    dt = Hd.dtype
    free = (g.valid & (~g.fixed)).astype(dt)
    eye3 = jnp.eye(3, dtype=dt)
    Hd = Hd + (1.0 - free)[:, None, None] * eye3 + 1e-8 * eye3
    b = b * free[:, None]

    H = jnp.zeros((N, N, 3, 3), dt)
    H = H.at[jnp.arange(N), jnp.arange(N)].add(Hd)
    idx_prev = jnp.maximum(jnp.arange(N) - 1, 0)
    cv = g.chain_valid.astype(dt)[:, None, None]
    H = H.at[idx_prev, jnp.arange(N)].add(H_off_chain * cv)
    H = H.at[jnp.arange(N), idx_prev].add(
        jnp.swapaxes(H_off_chain, -1, -2) * cv
    )
    clv = g.clo_valid.astype(dt)[:, None, None]
    H = H.at[g.clo_i, g.clo_j].add(H_off_clo * clv)
    H = H.at[g.clo_j, g.clo_i].add(jnp.swapaxes(H_off_clo, -1, -2) * clv)

    Hdense = H.transpose(0, 2, 1, 3).reshape(3 * N, 3 * N)
    # Jacobi equilibration: odometry informations span ~2e-4..6e3 on
    # real logs (long dead-reckoned stretches next to short precise
    # hops), putting cond(H) near 1e8-1e9 -- enough for the raw f32
    # Cholesky to hit a negative pivot and emit NaN (observed on
    # sim-office at keyframe ~215 on TPU). Symmetric diagonal scaling
    # is exact in infinite precision and bounds the equilibrated
    # diagonal at 1, where a 1e-6 relative ridge keeps the
    # factorization PD in f32.
    dg = jnp.diagonal(Hdense)
    s = jax.lax.rsqrt(jnp.maximum(dg, 1e-30))
    Hs = Hdense * s[:, None] * s[None, :]
    Hs = Hs + 1e-6 * jnp.eye(3 * N, dtype=dt)
    chol = jax.scipy.linalg.cho_factor(Hs)
    y = jax.scipy.linalg.cho_solve(chol, s * b.reshape(3 * N))
    d = (s * y).reshape(N, 3)
    return d * free[:, None]


def gnc_phi_schedule(phi, iterations: int, init_scale: float,
                     anneal_frac: float = 0.75):
    """Graduated non-convexity schedule for the DCS parameter: start at
    phi*init_scale (large phi => w ~ 1, convex least squares) and decay
    geometrically to the target phi over the first anneal_frac of the
    iterations, then hold. init_scale=1 reproduces fixed-phi DCS (the
    reference's g2o RobustKernelDCS behavior). GNC picks dramatically
    better basins when the initialization is poor: on a drifted
    N=8192/C=128 synthetic graph, fixed phi=1 accepts 1/128 closures
    (mean ATE 29.4 m = no better than odometry) while the annealed
    schedule accepts 128/128 (mean ATE 0.63 m)."""
    t = jnp.arange(iterations)
    T_a = max(int(anneal_frac * iterations), 1)
    expo = jnp.clip(1.0 - t / T_a, 0.0, 1.0)
    return phi * jnp.power(init_scale, expo)


# ---------------------------------------------------------------------------
# joint landmark + pose-graph system (final global bundle adjustment)
# ---------------------------------------------------------------------------


class JointGraphData(NamedTuple):
    """Fixed-shape arrays for the final joint solve: the landmark graph
    (odometry chain + line-landmark observations, LMGraphData layout)
    PLUS the pose-graph extra edges (loop closures / submap chain edges
    / keyframe pins) as DCS-robustified SE2 edges.

    No reference counterpart: the reference optimizes the landmark
    graph incrementally (drone.cpp:146-156), throws its information
    away at every loop closure (landmark-graph prune,
    submap_loop_closer.cpp:256-270), and finishes with a pose-graph-only
    solve (log_runner.cpp:203-205). The joint solve keeps every
    original measurement: odometry edges carry RAW odometry
    information (honest, independent), landmark evidence enters as its
    own 2-dof edges instead of being baked into chain estimates, and
    closures couple revisits. On landmark-rich worlds this cuts the
    mid-range chain drift that the pose-graph architecture cannot see
    (landmarks observed across 10-20 keyframes rigidly couple those
    spans; measured on the sim worlds, RESULTS.md round 4)."""

    poses: jnp.ndarray  # (P, 3)
    pose_valid: jnp.ndarray  # (P,) bool
    pose_fixed: jnp.ndarray  # (P,) bool
    odom_meas: jnp.ndarray  # (P, 3)
    odom_info: jnp.ndarray  # (P, 3, 3)
    odom_valid: jnp.ndarray  # (P,) bool
    lms: jnp.ndarray  # (L, 2)
    lm_valid: jnp.ndarray  # (L,) bool
    obs_pose: jnp.ndarray  # (E,) int32
    obs_lm: jnp.ndarray  # (E,) int32
    obs_meas: jnp.ndarray  # (E, 2)
    obs_info: jnp.ndarray  # (E, 2, 2)
    obs_valid: jnp.ndarray  # (E,) bool
    clo_i: jnp.ndarray  # (C,) int32
    clo_j: jnp.ndarray  # (C,) int32
    clo_meas: jnp.ndarray  # (C, 3)
    clo_info: jnp.ndarray  # (C, 3, 3)
    clo_valid: jnp.ndarray  # (C,) bool


def _joint_lm_view(g: JointGraphData) -> LMGraphData:
    return LMGraphData(
        g.poses, g.pose_valid, g.pose_fixed, g.odom_meas, g.odom_info,
        g.odom_valid, g.lms, g.lm_valid, g.obs_pose, g.obs_lm,
        g.obs_meas, g.obs_info, g.obs_valid,
    )


def joint_graph_chi2(g: JointGraphData, phi: float):
    """Robust objective: odom + obs chi2 plus DCS-scaled closure chi2."""
    chi2, _ = lm_graph_chi2(_joint_lm_view(g))
    ec = se2_edge_residual(g.poses[g.clo_i], g.poses[g.clo_j], g.clo_meas)
    c_c = jnp.einsum("ni,nij,nj->n", ec, g.clo_info, ec)
    c_c = dcs_weight(c_c, phi) * c_c
    return chi2 + jnp.sum(jnp.where(g.clo_valid, c_c, 0.0))


def _assemble_joint_system(g: JointGraphData, phi: float):
    """Normal equations of the joint system: the landmark-graph terms
    (dense pose block Hpp + landmark diag + coupling edges) plus the
    DCS-weighted closure terms added into Hpp/bp."""
    Hpp, bp, Hll, bl, Hpl_e = _assemble_lm_system(_joint_lm_view(g))
    dt = g.poses.dtype
    xi, xj = g.poses[g.clo_i], g.poses[g.clo_j]
    e = se2_edge_residual(xi, xj, g.clo_meas)
    Ji, Jj = se2_edge_jacobians(xi, xj, g.clo_meas)
    chi2_e = jnp.einsum("ni,nij,nj->n", e, g.clo_info, e)
    w = g.clo_valid.astype(dt) * dcs_weight(chi2_e, phi)
    free_i = (~g.pose_fixed[g.clo_i]).astype(dt)
    free_j = (~g.pose_fixed[g.clo_j]).astype(dt)
    Ji = Ji * free_i[:, None, None]
    Jj = Jj * free_j[:, None, None]
    info_w = g.clo_info * w[:, None, None]
    OJi = jnp.einsum("nab,nbc->nac", info_w, Ji)
    OJj = jnp.einsum("nab,nbc->nac", info_w, Jj)
    Hpp = Hpp.at[g.clo_i, g.clo_i].add(jnp.einsum("nba,nbc->nac", Ji, OJi))
    Hpp = Hpp.at[g.clo_j, g.clo_j].add(jnp.einsum("nba,nbc->nac", Jj, OJj))
    H_ij = jnp.einsum("nba,nbc->nac", Ji, OJj)
    Hpp = Hpp.at[g.clo_i, g.clo_j].add(H_ij)
    Hpp = Hpp.at[g.clo_j, g.clo_i].add(jnp.swapaxes(H_ij, -1, -2))
    bp = bp.at[g.clo_i].add(-jnp.einsum("nba,nb->na", OJi, e))
    bp = bp.at[g.clo_j].add(-jnp.einsum("nba,nb->na", OJj, e))
    return Hpp, bp, Hll, bl, Hpl_e


def _joint_schur_solve(g: JointGraphData, Hpp, bp, Hll, bl, Hpl_e, lam):
    """Damped joint solve, Schur-eliminating landmarks. Unlike
    _schur_solve's (P,L) pairwise einsum, the fill-in is formed as one
    big matmul S = Hpp - U U^T with U = Hpl chol(Hll^-1) reshaped
    (3P, 2L) -- the MXU-shaped formulation (a (3P, 2L) x (2L, 3P)
    contraction) that also keeps the CPU float64 parity path at dgemm
    speed for the final-cleanup problem sizes (P ~ 1-2k, L ~ 256)."""
    P = Hpp.shape[0]
    L = Hll.shape[0]
    dt = Hpp.dtype
    pose_free = (g.pose_valid & (~g.pose_fixed)).astype(dt)
    lm_free = g.lm_valid.astype(dt)

    eye3 = jnp.eye(3, dtype=dt)
    eye2 = jnp.eye(2, dtype=dt)
    diag_fix_p = (1.0 - pose_free)[:, None, None] * eye3
    Hpp = Hpp.at[jnp.arange(P), jnp.arange(P)].add(
        lam * eye3 * pose_free[:, None, None] + diag_fix_p
    )
    Hll = Hll + lam * eye2 * lm_free[:, None, None] + (
        (1.0 - lm_free)[:, None, None] * eye2
    )
    bp = bp * pose_free[:, None]
    bl = bl * lm_free[:, None]

    Hll_inv = jnp.linalg.inv(Hll)
    Hpl = jnp.zeros((P, L, 3, 2), dt)
    Hpl = Hpl.at[g.obs_pose, g.obs_lm].add(Hpl_e)
    R2 = _chol2(Hll_inv)  # (L,2,2): Hll_inv = R2 R2^T
    U = jnp.einsum("plab,lbc->plac", Hpl, R2)
    # (3P, 2L): row p*3+a, col l*2+c
    U2 = U.transpose(0, 2, 1, 3).reshape(3 * P, 2 * L)
    Sd = Hpp.transpose(0, 2, 1, 3).reshape(3 * P, 3 * P) - U2 @ U2.T
    rhs = (
        bp - jnp.einsum("plab,lbc,lc->pa", Hpl, Hll_inv, bl)
    ).reshape(3 * P)
    chol = jax.scipy.linalg.cho_factor(Sd)
    dp = jax.scipy.linalg.cho_solve(chol, rhs).reshape(P, 3)
    dl = jnp.einsum(
        "lab,lb->la",
        Hll_inv,
        bl - jnp.einsum("plab,pa->lb", Hpl, dp),
    )
    dp = dp * pose_free[:, None]
    dl = dl * lm_free[:, None]
    return dp, dl


@precise
def optimize_joint_graph(
    g: JointGraphData, phi: float, iterations: int = 12,
    tau: float = 1e-6, rtol: float = 1e-9,
):
    """Levenberg-Marquardt on the joint landmark+pose system (see
    JointGraphData). Same damping schedule as optimize_landmark_graph;
    closures are DCS-reweighted at every relinearization. Warm-started
    from the pose-graph solution, so few iterations suffice.

    Returns (g_optimized, chi2)."""
    chi2_0 = joint_graph_chi2(g, phi)
    Hpp0, _, Hll0, _, _ = _assemble_joint_system(g, phi)
    P = Hpp0.shape[0]
    diag_max = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(
            Hpp0[jnp.arange(P), jnp.arange(P)], axis1=-2, axis2=-1
        ))),
        jnp.max(jnp.abs(jnp.diagonal(Hll0, axis1=-2, axis2=-1))),
    )
    lam0 = tau * diag_max

    def step(g_cur, chi2_cur, lam, ni):
        Hpp, bp, Hll, bl, Hpl_e = _assemble_joint_system(g_cur, phi)
        dp, dl = _joint_schur_solve(g_cur, Hpp, bp, Hll, bl, Hpl_e, lam)
        poses = g_cur.poses + dp
        poses = poses.at[:, 2].set(wrap_angle(poses[:, 2]))
        lms = g_cur.lms + dl
        lms = lms.at[:, 1].set(wrap_angle(lms[:, 1]))
        g_new = g_cur._replace(poses=poses, lms=lms)
        chi2_new = joint_graph_chi2(g_new, phi)
        lin = jnp.sum(dp * (lam * dp + bp)) + jnp.sum(dl * (lam * dl + bl))
        rho = (chi2_cur - chi2_new) / jnp.maximum(lin, 1e-12)
        accept = (rho > 0.0) & jnp.isfinite(chi2_new)
        factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_next = jnp.where(accept, lam * factor, lam * ni)
        ni_next = jnp.where(accept, 2.0, ni * 2.0)
        g_next = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                jnp.broadcast_to(
                    accept.reshape((1,) * new.ndim), new.shape
                ),
                new,
                old,
            ),
            g_new,
            g_cur,
        )
        chi2_next = jnp.where(accept, chi2_new, chi2_cur)
        rel_impr = jnp.where(
            accept,
            (chi2_cur - chi2_new) / jnp.maximum(chi2_cur, 1e-30),
            jnp.inf,
        )
        return g_next, chi2_next, lam_next, ni_next, rel_impr

    def wcond(carry):
        _, _, _, _, it, done = carry
        return (it < iterations) & jnp.logical_not(done)

    def wbody(carry):
        g_cur, chi2_cur, lam, ni, it, _ = carry
        g_next, chi2_next, lam_next, ni_next, rel_impr = step(
            g_cur, chi2_cur, lam, ni
        )
        done = (rel_impr < rtol) | (lam_next > 1e10)
        return (g_next, chi2_next, lam_next, ni_next, it + 1, done)

    g_out, chi2_out, _, _, _, _ = jax.lax.while_loop(
        wcond, wbody,
        (g, chi2_0, lam0, 2.0, jnp.int32(0), jnp.bool_(False)),
    )
    return g_out, chi2_out


@precise
def optimize_pose_graph(
    g: PoseGraphData, phi: float, iterations: int = 20,
    gnc_init_scale: float = 1.0,
) -> PoseGraphData:
    """Gauss-Newton with DCS-reweighted closures, fixed iteration count
    (pose_graph.opt.optimize(20), submap_loop_closer.cpp:286-288).

    gnc_init_scale > 1 enables graduated non-convexity (see
    gnc_phi_schedule); the default preserves the reference's fixed-phi
    semantics."""

    def body(g_cur, phi_t):
        Hd, Hoc, Hocl, b = _assemble_posegraph(g_cur, phi_t)
        d = _posegraph_dense_solve(g_cur, Hd, Hoc, Hocl, b)
        poses = g_cur.poses + d
        poses = poses.at[:, 2].set(wrap_angle(poses[:, 2]))
        return g_cur._replace(poses=poses), None

    phis = gnc_phi_schedule(phi, iterations, gnc_init_scale).astype(
        g.poses.dtype
    )
    g_out, _ = jax.lax.scan(body, g, phis, length=iterations)
    return g_out
