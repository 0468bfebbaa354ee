"""Synthetic pose-graph generators for benchmarks and the graft entry.

Produces mit-killian-scale chains with loop closures: a long noisy
trajectory (the reference's largest sequence has ~2k keyframes) with
closures between revisited segments.
"""
from __future__ import annotations

import numpy as np

from ..utils import se2


def make_chain_graph(
    n_poses: int,
    n_closures: int,
    drift: float = 0.02,
    seed: int = 0,
    dtype=np.float64,
    pad_to: int | None = None,
):
    """Returns PoseGraphData-compatible arrays (numpy): a loopy ground
    truth (figure-eight-ish), dead-reckoned initial estimates, odometry
    chain edges, and closures between poses that are far apart in time
    but close in ground-truth space."""
    from ..ops.solvers import PoseGraphData
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = n_poses
    gt = np.zeros((n, 3))
    for i in range(1, n):
        turn = 0.06 * np.sin(i * 2 * np.pi / 256.0) + 0.01
        gt[i] = se2.compose(gt[i - 1], np.array([0.5, 0.0, turn]))

    N = pad_to or n
    poses = np.zeros((N, 3), dtype)
    valid = np.zeros(N, bool)
    fixed = np.zeros(N, bool)
    chain_meas = np.zeros((N, 3), dtype)
    chain_info = np.tile(np.eye(3, dtype=dtype), (N, 1, 1))
    chain_valid = np.zeros(N, bool)
    valid[:n] = True
    fixed[0] = True
    poses[0] = gt[0]
    for i in range(1, n):
        d = se2.relative(gt[i - 1], gt[i]) + rng.normal(0, drift, 3)
        chain_meas[i] = d
        chain_info[i] = np.diag([120.0, 120.0, 400.0])
        chain_valid[i] = True
        poses[i] = se2.compose(poses[i - 1], d)

    # closures: pairs (i, j) with j - i large and gt-distance small
    d2 = None
    cand = []
    for i in range(0, n - 200, 17):
        dist = np.linalg.norm(gt[i + 150 :, :2] - gt[i, :2], axis=1)
        j_rel = np.argmin(dist)
        if dist[j_rel] < 3.0:
            cand.append((i, i + 150 + int(j_rel)))
    rng.shuffle(cand)
    cand = cand[:n_closures]
    C = max(len(cand), 1)
    Cpad = 1
    while Cpad < C:
        Cpad *= 2
    clo_i = np.zeros(Cpad, np.int32)
    clo_j = np.zeros(Cpad, np.int32)
    clo_meas = np.zeros((Cpad, 3), dtype)
    clo_info = np.tile(np.eye(3, dtype=dtype), (Cpad, 1, 1))
    clo_valid = np.zeros(Cpad, bool)
    for k, (a, b) in enumerate(cand):
        clo_i[k] = a
        clo_j[k] = b
        clo_meas[k] = se2.relative(gt[a], gt[b]) + rng.normal(0, 0.01, 3)
        clo_info[k] = np.diag([400.0, 400.0, 900.0])
        clo_valid[k] = True
    del d2
    g = PoseGraphData(
        jnp.asarray(poses), jnp.asarray(valid), jnp.asarray(fixed),
        jnp.asarray(chain_meas), jnp.asarray(chain_info),
        jnp.asarray(chain_valid), jnp.asarray(clo_i), jnp.asarray(clo_j),
        jnp.asarray(clo_meas), jnp.asarray(clo_info),
        jnp.asarray(clo_valid),
    )
    return g, gt


def graph_to_arrays(g) -> dict:
    """Dump PoseGraphData to plain numpy (for the native baseline)."""
    return {k: np.asarray(v) for k, v in g._asdict().items()}
