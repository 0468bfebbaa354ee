"""Global occupancy-map rendering from keyframe range data.

Replaces the reference's rviz Visualizer occupancy-grid topics
(src/visualizer.cpp:93-137 RangeDataInserter::rayTrace + :197-208
map publishing): re-ray-traces every keyframe's RangeData2D at the
current trajectory estimates into one log-odds grid and writes a PNG.
Uses the same jit insertion kernel as submap construction.
"""
from __future__ import annotations

import numpy as np

from ..models.range_data import RangeData2D, construct_multicloud
from ..ops.grid import GridSpec, build_submap_grid


def render_map(
    keyframes,
    estimates,
    resolution: float = 0.1,
    hit_p: float = 0.7,
    miss_p: float = 0.4,
    max_size: int = 2048,
):
    """Build a global occupancy grid from all keyframes at `estimates`.

    Returns (probs (G,G) numpy, origin (2,)).
    """
    est = np.asarray(estimates)
    n = min(len(keyframes), len(est))
    world = RangeData2D()
    for i in range(n):
        keyframes[i].data.transform_into(est[i], world)
    if len(world.points) == 0:
        return np.zeros((64, 64), np.float32), np.zeros(2), resolution
    lo = world.points.min(0)
    hi = world.points.max(0)
    extent = float(max(hi[0] - lo[0], hi[1] - lo[1])) + 4.0
    size = int(np.ceil(extent / resolution / 64.0) * 64)
    size = min(size, max_size)
    spec = GridSpec(size=size, resolution=extent / size)
    sm = build_submap_grid(world, spec, hit_p, miss_p)
    return np.asarray(sm.probs), np.asarray(sm.origin), spec.resolution


def save_map_png(path, probs, estimates=None, origin=None,
                 resolution=None):
    """PNG dump with optional trajectory overlay."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    arr = np.asarray(probs)
    img = np.where(arr > 0, 1.0 - arr, 0.5)
    fig, ax = plt.subplots(figsize=(10, 10))
    ax.imshow(
        img.T, origin="lower", cmap="gray", vmin=0, vmax=1,
        interpolation="nearest",
    )
    if estimates is not None and origin is not None and resolution:
        est = np.asarray(estimates)
        xs = (est[:, 0] - origin[0]) / resolution
        ys = (est[:, 1] - origin[1]) / resolution
        ax.plot(xs, ys, "r-", linewidth=0.8)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
