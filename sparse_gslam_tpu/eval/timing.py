"""Timing-file analysis: the calc_time.py equivalent (reference:
datasets/calc_time.py:13-49) computing the paper Table II metrics from
.ftime/.btime/.dtime streams."""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TimingStats:
    mean_data_interval: float
    max_frontend: float
    mean_frontend: float
    max_backend: float
    mean_backend: float
    mean_total_per_frame: float

    def __str__(self):
        return (
            f"interval {self.mean_data_interval:.3f}s | frontend mean "
            f"{self.mean_frontend * 1e3:.2f}ms max "
            f"{self.max_frontend * 1e3:.1f}ms | backend mean "
            f"{self.mean_backend * 1e3:.2f}ms max "
            f"{self.max_backend * 1e3:.1f}ms | total/frame "
            f"{self.mean_total_per_frame * 1e3:.2f}ms"
        )


def analyze(prefix: str) -> TimingStats:
    """prefix: path without extension (like <dir>/<dataset>)."""
    ftime = np.loadtxt(prefix + ".ftime", ndmin=1)
    try:
        btime = np.loadtxt(prefix + ".btime", ndmin=1)
    except Exception:
        btime = np.zeros(1)
    dtime = np.loadtxt(prefix + ".dtime", ndmin=1)
    if len(btime) == 0:
        btime = np.zeros(1)
    n_frames = max(len(dtime), 1)
    total = ftime.sum() + btime.sum()
    return TimingStats(
        mean_data_interval=float(np.diff(dtime).mean())
        if len(dtime) > 1
        else 0.0,
        max_frontend=float(ftime.max()) if len(ftime) else 0.0,
        mean_frontend=float(ftime.mean()) if len(ftime) else 0.0,
        max_backend=float(btime.max()),
        mean_backend=float(btime.mean()),
        mean_total_per_frame=float(total / n_frames),
    )
