"""Live Crazyflie telemetry bridge (the controller.py + converter.cpp
path of the reference).

Re-implements the maintained parts of the reference's live-robot flow
(scripts/controller.py:1-245: cflib log blocks -> RawData streams;
src/converter.cpp RawDataConverter: sync state_xyzv with
state_ranger_qxyzw into odometry + 4-beam frames) without ROS: a
LiveFrameSource accepts the two telemetry streams (from cflib when
available, or any asyncio/callback producer), approximate-time-syncs
them exactly like the rosbag provider, and yields io.providers.Frame
objects that feed SlamSystem.process_frame directly.

cflib is not bundled in this environment; CrazyflieBridge raises at
construction unless cflib is importable. The synchronization and
decoding logic (the part that matters for parity) is fully testable
without hardware via push().
"""
from __future__ import annotations

import collections
import math
import threading

import numpy as np

from .providers import Frame

STATE_VARS = ("stateEstimate.x", "stateEstimate.y", "stateEstimate.z")
RANGER_VARS = (
    "range.front", "range.left", "range.back", "range.right",
)


class LiveFrameSource:
    """Pairs the two telemetry streams by nearest timestamp (the
    message_filters ApproximateTime role, data_provider.cpp:263-264)
    and emits 4-beam frames."""

    def __init__(self, tolerance: float = 0.05, maxlen: int = 64):
        self.tolerance = tolerance
        self._state = collections.deque(maxlen=maxlen)
        self._ranger = collections.deque(maxlen=maxlen)
        self._lock = threading.Lock()
        self._out = collections.deque()

    def push_state(self, stamp: float, x: float, y: float):
        with self._lock:
            self._state.append((stamp, np.array([x, y])))
            self._try_match()

    def push_ranger(self, stamp: float, ranges, quat_xyzw):
        """ranges: 4 values in meters; quat: (qx, qy, qz, qw)."""
        qx, qy, qz, qw = quat_xyzw
        yaw = math.atan2(
            2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz)
        )
        with self._lock:
            self._ranger.append(
                (stamp, np.asarray(ranges, dtype=np.float64), yaw)
            )
            self._try_match()

    def _try_match(self):
        while self._state and self._ranger:
            ts, xy = self._state[0]
            # closest ranger sample
            best = min(
                range(len(self._ranger)),
                key=lambda i: abs(self._ranger[i][0] - ts),
            )
            tr, ranges, yaw = self._ranger[best]
            if abs(tr - ts) > self.tolerance:
                if tr < ts:
                    self._ranger.popleft()
                    continue
                break
            self._state.popleft()
            for _ in range(best + 1):
                self._ranger.popleft()
            pose = np.array([xy[0], xy[1], yaw])
            self._out.append(Frame(ts, pose, ranges))

    def frames(self):
        while True:
            with self._lock:
                if not self._out:
                    break
                yield self._out.popleft()


class CrazyflieBridge:
    """cflib log-block subscription feeding a LiveFrameSource
    (controller.py:40-120 semantics: two 10 Hz log configs)."""

    def __init__(self, uri: str, source: LiveFrameSource | None = None):
        try:
            import cflib.crtp  # noqa: F401
            from cflib.crazyflie import Crazyflie  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "cflib is not installed; live Crazyflie operation "
                "requires it (the log-replay paths do not)"
            ) from e
        self.uri = uri
        self.source = source or LiveFrameSource()

    def start(self):  # pragma: no cover - hardware path
        import time

        import cflib.crtp
        from cflib.crazyflie import Crazyflie
        from cflib.crazyflie.log import LogConfig

        cflib.crtp.init_drivers()
        cf = Crazyflie()
        cf.open_link(self.uri)

        state_cfg = LogConfig(name="state", period_in_ms=100)
        for v in STATE_VARS[:2]:
            state_cfg.add_variable(v, "float")
        ranger_cfg = LogConfig(name="ranger", period_in_ms=100)
        for v in RANGER_VARS:
            ranger_cfg.add_variable(v, "uint16_t")
        for v in ("stateEstimate.qx", "stateEstimate.qy",
                  "stateEstimate.qz", "stateEstimate.qw"):
            ranger_cfg.add_variable(v, "float")

        def on_state(ts, data, _):
            self.source.push_state(
                ts / 1000.0,
                data["stateEstimate.x"], data["stateEstimate.y"],
            )

        def on_ranger(ts, data, _):
            self.source.push_ranger(
                ts / 1000.0,
                [data[v] / 1000.0 for v in RANGER_VARS],
                (
                    data["stateEstimate.qx"], data["stateEstimate.qy"],
                    data["stateEstimate.qz"], data["stateEstimate.qw"],
                ),
            )

        cf.log.add_config(state_cfg)
        cf.log.add_config(ranger_cfg)
        state_cfg.data_received_cb.add_callback(on_state)
        ranger_cfg.data_received_cb.add_callback(on_ranger)
        state_cfg.start()
        ranger_cfg.start()
        self._cf = cf
        time.sleep(0.5)
