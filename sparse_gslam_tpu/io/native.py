"""ctypes bindings + on-demand build for the native C++ components.

The reference's runtime is C++ (SURVEY.md); here the native layer
provides (a) the CPU baseline pose-graph GN solver used by bench.py
for the throughput-vs-C++ ratio and as a host-side fallback, and
(b) a fast CARMEN log parser data loader. Built lazily with g++
(dependency-free sources in native/), cached in native/build/.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE = os.path.join(_ROOT, "native")
_BUILD = os.path.join(_NATIVE, "build")

_libs: dict[str, ctypes.CDLL] = {}


def _build(name: str, src: str) -> str:
    os.makedirs(_BUILD, exist_ok=True)
    so = os.path.join(_BUILD, f"lib{name}.so")
    src_path = os.path.join(_NATIVE, src)
    if (
        not os.path.exists(so)
        or os.path.getmtime(so) < os.path.getmtime(src_path)
    ):
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared",
            "-fPIC", "-o", so, src_path,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
    return so


def load(name: str, src: str) -> ctypes.CDLL:
    if name not in _libs:
        _libs[name] = ctypes.CDLL(_build(name, src))
    return _libs[name]


def posegraph_gn_native(g, phi: float, iterations: int) -> np.ndarray:
    """Run the native GN solver on a PoseGraphData; returns poses (N,3).

    Same semantics as ops.solvers.optimize_pose_graph (dense jax path);
    used as the bench baseline and cross-validation oracle.
    """
    lib = load("posegraph", "posegraph_solver.cpp")
    fn = lib.posegraph_gn_optimize
    fn.restype = ctypes.c_int

    poses = np.ascontiguousarray(np.asarray(g.poses), np.float64).copy()
    n = len(poses)
    cm = np.ascontiguousarray(np.asarray(g.chain_meas), np.float64)
    ci = np.ascontiguousarray(np.asarray(g.chain_info), np.float64)
    cv = np.ascontiguousarray(
        np.asarray(g.chain_valid), np.uint8
    )
    fx = np.ascontiguousarray(
        np.asarray(g.fixed) | (~np.asarray(g.valid)), np.uint8
    )
    cloi = np.ascontiguousarray(np.asarray(g.clo_i), np.int32)
    cloj = np.ascontiguousarray(np.asarray(g.clo_j), np.int32)
    clom = np.ascontiguousarray(np.asarray(g.clo_meas), np.float64)
    cloinf = np.ascontiguousarray(np.asarray(g.clo_info), np.float64)
    clov = np.ascontiguousarray(np.asarray(g.clo_valid), np.uint8)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    rc = fn(
        ctypes.c_int(n), p(poses), p(cm), p(ci), p(cv), p(fx),
        ctypes.c_int(len(cloi)), p(cloi), p(cloj), p(clom), p(cloinf),
        p(clov), ctypes.c_double(phi), ctypes.c_int(iterations),
    )
    if rc != 0:
        raise RuntimeError(f"native solver failed rc={rc}")
    return poses


def correlative_match_native(
    probs, origin, resolution: float, points, init_theta: float,
    angular_step: float, n_angular: int, n_linear: int, depth: int,
    min_score: float,
):
    """Reference-style branch-and-bound matcher on one submap
    (native/correlative_matcher.cpp). Returns (score, pose (3,)) or
    None. CPU baseline for bench.py and an independent oracle for the
    FFT exhaustive matcher (ops/matching.py)."""
    lib = load("matcher", "correlative_matcher.cpp")
    fn = lib.correlative_match
    fn.restype = ctypes.c_int
    probs = np.ascontiguousarray(np.asarray(probs), np.float32)
    pts = np.ascontiguousarray(np.asarray(points), np.float64)
    out = np.zeros(4, np.float64)
    rc = fn(
        probs.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(probs.shape[0]),
        ctypes.c_double(float(origin[0])),
        ctypes.c_double(float(origin[1])),
        ctypes.c_double(resolution),
        pts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(len(pts)),
        ctypes.c_double(init_theta),
        ctypes.c_double(angular_step),
        ctypes.c_int(n_angular),
        ctypes.c_int(n_linear),
        ctypes.c_int(depth),
        ctypes.c_double(min_score),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if rc == 0:
        return None
    return float(out[0]), out[1:4].copy()


def correlative_match_many_native(
    grids, origins, resolution: float, points, init_thetas,
    angular_step: float, n_angular: int, n_linear: int, depth: int,
    min_score: float, n_threads: int = 8,
):
    """Thread-pool fan-out over candidate submaps (the reference's
    ctpl loop_closing_threads pattern, submap_loop_closer.cpp:158-171).
    Returns (best_idx, score, pose (3,)) or None."""
    lib = load("matcher", "correlative_matcher.cpp")
    fn = lib.correlative_match_many
    fn.restype = ctypes.c_int
    grids = np.ascontiguousarray(np.asarray(grids), np.float32)
    origins = np.ascontiguousarray(np.asarray(origins), np.float64)
    pts = np.ascontiguousarray(np.asarray(points), np.float64)
    th0 = np.ascontiguousarray(np.asarray(init_thetas), np.float64)
    out = np.zeros(4, np.float64)
    best = fn(
        grids.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(grids.shape[0]),
        ctypes.c_int(grids.shape[1]),
        origins.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_double(resolution),
        pts.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int(len(pts)),
        th0.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_double(angular_step),
        ctypes.c_int(n_angular),
        ctypes.c_int(n_linear),
        ctypes.c_int(depth),
        ctypes.c_double(min_score),
        ctypes.c_int(n_threads),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    if best < 0:
        return None
    return int(best), float(out[0]), out[1:4].copy()


def parse_carmen_native(path: str):
    """Fast CARMEN log parse via the C++ loader; returns
    (times (N,), poses (N,3), ranges_flat, offsets (N+1,)).
    Same semantics as providers.CarmenLogDataProvider (time-sorted).
    """
    lib = load("carmen", "carmen_parser.cpp")
    lib.carmen_parse.restype = ctypes.c_void_p
    lib.carmen_num_frames.restype = ctypes.c_longlong
    lib.carmen_num_ranges.restype = ctypes.c_longlong
    h = lib.carmen_parse(path.encode())
    if not h:
        raise IOError(f"cannot parse {path}")
    try:
        n = lib.carmen_num_frames(ctypes.c_void_p(h))
        m = lib.carmen_num_ranges(ctypes.c_void_p(h))
        ranges = np.empty(m, np.float64)
        offsets = np.empty(n + 1, np.int64)
        poses = np.empty((n, 3), np.float64)
        times = np.empty(n, np.float64)
        lib.carmen_copy(
            ctypes.c_void_p(h),
            ranges.ctypes.data_as(ctypes.c_void_p),
            offsets.ctypes.data_as(ctypes.c_void_p),
            poses.ctypes.data_as(ctypes.c_void_p),
            times.ctypes.data_as(ctypes.c_void_p),
        )
    finally:
        lib.carmen_free(ctypes.c_void_p(h))
    return times, poses, ranges, offsets
