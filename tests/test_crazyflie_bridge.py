"""Live Crazyflie bridge: telemetry sync (converter.cpp
RawDataConverter semantics) and the command client (takeoff.py +
controller.py teleop / wall-following toggle) -- all hardware-free.
"""
import math

import numpy as np

from sparse_gslam_tpu.io.crazyflie import CommandClient, LiveFrameSource


class TestLiveFrameSource:
    def test_pairs_by_nearest_stamp(self):
        src = LiveFrameSource(tolerance=0.05)
        # quaternion for yaw=pi/2: qz=sin(pi/4), qw=cos(pi/4)
        q = (0.0, 0.0, math.sin(math.pi / 4), math.cos(math.pi / 4))
        src.push_ranger(0.00, [1.0, 2.0, 3.0, 4.0], q)
        src.push_ranger(0.10, [1.1, 2.1, 3.1, 4.1], q)
        src.push_state(0.09, 1.5, -2.5)
        frames = list(src.frames())
        assert len(frames) == 1
        f = frames[0]
        assert f.time == 0.09
        np.testing.assert_allclose(f.pose[:2], [1.5, -2.5])
        assert abs(f.pose[2] - math.pi / 2) < 1e-6
        np.testing.assert_allclose(f.ranges, [1.1, 2.1, 3.1, 4.1])

    def test_out_of_tolerance_dropped(self):
        src = LiveFrameSource(tolerance=0.05)
        q = (0.0, 0.0, 0.0, 1.0)
        src.push_ranger(0.0, [1, 1, 1, 1], q)
        src.push_state(0.5, 0.0, 0.0)  # nothing within 50 ms
        assert list(src.frames()) == []
        # a matching ranger sample later completes the pair
        src.push_ranger(0.52, [2, 2, 2, 2], q)
        frames = list(src.frames())
        assert len(frames) == 1
        np.testing.assert_allclose(frames[0].ranges, [2, 2, 2, 2])


class MockLink:
    """Records setpoints like the cflib Commander would receive."""

    def __init__(self):
        self.setpoints = []  # (vx, vy, yawrate_deg, z)
        self.stopped = False

    def send_hover_setpoint(self, vx, vy, yawrate, z):
        self.setpoints.append((vx, vy, yawrate, z))

    def send_stop_setpoint(self):
        self.stopped = True


class TestCommandClient:
    def test_takeoff_ramps_then_hovers(self):
        link = MockLink()
        cc = CommandClient(link, hover_height=0.5, takeoff_time=1.0)
        cc.takeoff()
        for _ in range(12):
            cc.step(dt=0.1)
        zs = [s[3] for s in link.setpoints]
        assert zs[0] < 0.1
        assert abs(zs[-1] - 0.5) < 1e-9
        assert all(b >= a - 1e-9 for a, b in zip(zs, zs[1:]))
        assert cc.mode == "TELEOP"  # hovers after the ramp

    def test_teleop_passthrough(self):
        link = MockLink()
        cc = CommandClient(link)
        cc._z = 0.5
        cc.set_velocity(0.3, -0.1, 0.5)
        cc.step(dt=0.1)
        vx, vy, yawdeg, z = link.setpoints[-1]
        assert (vx, vy) == (0.3, -0.1)
        assert abs(yawdeg - math.degrees(0.5)) < 1e-9
        assert z == 0.5

    def test_wall_follow_toggle_drives_and_returns(self):
        link = MockLink()
        cc = CommandClient(link)
        cc._z = 0.5
        cc.toggle_wall_following(True)
        assert cc.mode == "WALL_FOLLOW"
        # open space ahead, wall on the right at target distance:
        # the follower commands forward motion
        cc.step(ranges4=(4.0, 4.0, 4.0, 0.5), dt=0.1)
        vx, vy, yawdeg, z = link.setpoints[-1]
        assert vx > 0.0
        # frontal obstacle: it stops and turns
        cc.step(ranges4=(0.3, 4.0, 4.0, 0.5), dt=0.1)
        vx2, _, yawdeg2, _ = link.setpoints[-1]
        assert vx2 < 0.1
        assert abs(yawdeg2) > 10.0
        # toggle off -> hover in place
        cc.toggle_wall_following(False)
        cc.step(dt=0.1)
        assert link.setpoints[-1][:3] == (0.0, 0.0, 0.0)

    def test_land_descends_and_stops(self):
        link = MockLink()
        cc = CommandClient(link, hover_height=0.5, takeoff_time=1.0)
        cc._z = 0.5
        cc.land()
        for _ in range(15):
            cc.step(dt=0.1)
            if cc.mode == "IDLE":
                break
        assert link.stopped
        assert cc.mode == "IDLE"
        zs = [s[3] for s in link.setpoints]
        assert all(b <= a + 1e-9 for a, b in zip(zs, zs[1:]))
