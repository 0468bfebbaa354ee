"""Microbench: lax.scan unroll factor for the block-tridiagonal LDL
interior solve (the current bottleneck of the partitioned pose-graph
solver: ~5.4 ms of 7.2 ms per GN iteration at P=128/M=128/R=49).
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

from sparse_gslam_tpu.ops.solvers import inv3

P, M, R = 128, 128, 49
rng = np.random.default_rng(0)
D = np.tile(np.eye(3, dtype=np.float32) * 4.0, (P, M, 1, 1))
D += rng.normal(size=(P, M, 3, 3)).astype(np.float32) * 0.05
D = D + np.swapaxes(D, -1, -2)
O = rng.normal(size=(P, M, 3, 3)).astype(np.float32) * 0.1
rhs = rng.normal(size=(P, M, 3, R)).astype(np.float32)


def tridiag_unroll(D, O, rhs, unroll):
    Pn = D.shape[0]
    O = O.at[0].set(0.0)

    def fwd(carry, inp):
        S_prev_inv, y_prev = carry
        D_i, O_i, r_i = inp
        L = jnp.swapaxes(O_i, -1, -2) @ S_prev_inv
        S_i = D_i - L @ O_i
        S_inv = inv3(S_i)
        y_i = r_i - L @ y_prev
        return (S_inv, y_i), (S_inv, y_i)

    Rn = rhs.shape[-1]
    init = (jnp.zeros((3, 3), D.dtype), jnp.zeros((3, Rn), D.dtype))
    _, (S_invs, ys) = jax.lax.scan(fwd, init, (D, O, rhs), unroll=unroll)

    def bwd(x_next, inp):
        S_inv, y, O_next = inp
        x_i = S_inv @ (y - O_next @ x_next)
        return x_i, x_i

    O_next = jnp.concatenate([O[1:], jnp.zeros((1, 3, 3), D.dtype)], axis=0)
    _, xs = jax.lax.scan(
        bwd, jnp.zeros((3, Rn), D.dtype), (S_invs, ys, O_next),
        reverse=True, unroll=unroll,
    )
    return xs


def bench(unroll):
    with jax.default_matmul_precision("highest"):
        f = jax.jit(
            lambda D, O, r: jax.vmap(
                lambda d, o, rr: tridiag_unroll(d, o, rr, unroll)
            )(D, O, r)
        )
        Dj, Oj, rj = jnp.asarray(D), jnp.asarray(O), jnp.asarray(rhs)
        out = jax.block_until_ready(f(Dj, Oj, rj))
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = jax.block_until_ready(f(Dj, Oj, rj))
        dt = (time.perf_counter() - t0) / reps
        return dt, out


ref = None
for u in [1, 2, 4, 8, 16]:
    dt, out = bench(u)
    if ref is None:
        ref = np.asarray(out)
        err = 0.0
    else:
        err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"unroll={u:2d}: {dt*1e3:7.2f} ms  maxdiff={err:.2e}", flush=True)
