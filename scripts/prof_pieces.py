"""Per-piece timing of the partitioned solver at bench scale.

The axon tunnel costs ~30 ms per jit call round-trip, so each piece is
repeated REPS times inside ONE jit via lax.scan with a threaded data
dependency; reported time is (t(REPS) - t(0)) / REPS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache

_enable_cache(tag="tpu")

from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph
from sparse_gslam_tpu.parallel import dist_solver as ds
from sparse_gslam_tpu.parallel.partition import make_partition

n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 128
REPS = 50

g, _ = make_chain_graph(
    n_poses=16000, n_closures=256, pad_to=16384, dtype=np.float32
)
plan = make_partition(
    g.poses.shape[0], n_blocks, np.asarray(g.clo_i),
    np.asarray(g.clo_j), np.asarray(g.clo_valid),
)
bg, sg = ds.split_graph(g, plan)
bg = jax.device_put(bg)
sg = jax.device_put(sg)
jax.block_until_ready(bg.poses)
P, M = bg.poses.shape[0], bg.poses.shape[1]
S = sg.sep_valid.shape[0]
K = bg.loc_sep.shape[1]
dt_ = bg.poses.dtype
print(f"P={P} M={M} S={S} K={K}", flush=True)
block_ids = jnp.arange(P, dtype=jnp.int32)


def timed(name, body, seed):
    """body: (carry) -> carry, repeated REPS times inside one jit."""

    def run(c0, n):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, c0, None, length=n)
        return c

    f_full = jax.jit(lambda c: run(c, REPS))
    f_null = jax.jit(lambda c: run(c, 0))
    out = jax.block_until_ready(f_full(seed))
    jax.block_until_ready(f_null(seed))
    outer = 5
    t0 = time.perf_counter()
    for _ in range(outer):
        out = jax.block_until_ready(f_full(seed))
    t_full = (time.perf_counter() - t0) / outer
    t0 = time.perf_counter()
    for _ in range(outer):
        jax.block_until_ready(f_null(seed))
    t_null = (time.perf_counter() - t0) / outer
    print(
        f"{name:30s}: {(t_full - t_null) / REPS * 1e3:7.3f} ms/rep",
        flush=True,
    )
    return out


with jax.default_matmul_precision("highest"):
    poses0 = bg.poses
    eye = jnp.eye(3 * S, dtype=dt_)
    sep_free = jnp.repeat(sg.sep_valid, 3)

    def one_iter(poses):
        prev_last = jnp.concatenate(
            [jnp.zeros((1, 3), dt_), poses[:-1, -1, :]], axis=0
        )
        sep_poses = poses[sg.sep_pose_block, sg.sep_pose_off]
        Sc, rc, Hss, bs, Y = ds._vmapped_pieces(
            block_ids, bg, poses, prev_last, K
        )
        Hss_c, bs_c = ds._closure_system(sep_poses, sg, 1.0, S)
        S_base = Hss_c + jnp.where(sep_free, 1e-12, 1.0) * eye
        S_dense, rhs_s = ds._locals_to_global_compact(
            S_base, bs_c, sg, Hss - Sc, bs - rc
        )
        S_dense = jnp.where(
            sep_free[:, None] & sep_free[None, :], S_dense, eye
        )
        rhs_s = jnp.where(sep_free, rhs_s, 0.0)
        d_s = ds._eq_chol_solve(S_dense, rhs_s)
        d_loc = jax.vmap(lambda ls: ds._gather_local(d_s, ls))(bg.loc_sep)
        return jax.vmap(ds._apply_updates)(poses, Y, d_loc, bg.sep_local)

    timed("full GN iteration", one_iter, poses0)

    prev_last0 = jnp.concatenate(
        [jnp.zeros((1, 3), dt_), poses0[:-1, -1, :]], axis=0
    )

    def pieces_body(poses):
        Sc, rc, Hss, bs, Y = ds._vmapped_pieces(
            block_ids, bg, poses, prev_last0, K
        )
        # fold outputs back into poses to keep the chain alive
        return poses + 0.0 * (
            Y[:, :3, 0].reshape(P, 1, 3) + bs.sum() * 1e-30
        )

    timed("  _vmapped_pieces", pieces_body, poses0)

    def asm_body(poses):
        def one(bi, pp, valid, fixed, cm, ci, cv, sl, pll):
            return ds._block_system(
                bi, pp, valid, fixed, cm, ci, cv, sl, pll, K
            )

        out = jax.vmap(one)(
            block_ids, poses, bg.valid, bg.fixed, bg.chain_meas,
            bg.chain_info, bg.chain_valid, bg.sep_local, prev_last0,
        )
        # out = (A, Db, Ob, b_i, His, Hss, b_s)
        return poses + 0.0 * (
            out[1][:, :1, 0, :] + out[3].sum() * 1e-30
        )

    timed("  block assembly only", asm_body, poses0)

    sep_poses0 = poses0[sg.sep_pose_block, sg.sep_pose_off]

    def clo_body(sp):
        Hss_c, bs_c = ds._closure_system(sp, sg, 1.0, S)
        return sp + 0.0 * (bs_c.reshape(-1, 3)[: sp.shape[0]])

    timed("  _closure_system", clo_body, sep_poses0)

    # static pieces for the remaining stages
    Sc, rc, Hss, bs, Y = ds._vmapped_pieces(
        block_ids, bg, poses0, prev_last0, K
    )
    Hss_c, bs_c = ds._closure_system(sep_poses0, sg, 1.0, S)
    S_base0 = Hss_c + jnp.where(sep_free, 1e-12, 1.0) * eye
    dHss = Hss - Sc
    dbs = bs - rc

    def l2g_body(sb):
        S_dense, rhs_s = ds._locals_to_global_compact(
            sb, bs_c, sg, dHss, dbs
        )
        return sb + 0.0 * S_dense

    timed("  _locals_to_global_compact", l2g_body, S_base0)

    S_dense0, rhs_s0 = ds._locals_to_global_compact(
        S_base0, bs_c, sg, dHss, dbs
    )
    S_dense0 = jnp.where(
        sep_free[:, None] & sep_free[None, :], S_dense0, eye
    )
    rhs_s0 = jnp.where(sep_free, rhs_s0, 0.0)

    def chol_body(rhs):
        d_s = ds._eq_chol_solve(S_dense0, rhs)
        return rhs + 0.0 * d_s

    timed("  _eq_chol_solve", chol_body, rhs_s0)

    d_s0 = ds._eq_chol_solve(S_dense0, rhs_s0)

    def apply_body(poses):
        d_loc = jax.vmap(lambda ls: ds._gather_local(d_s0, ls))(
            bg.loc_sep
        )
        return jax.vmap(ds._apply_updates)(poses, Y, d_loc, bg.sep_local)

    timed("  gather_local+apply", apply_body, poses0)
