"""Geometric correctness of the simulator's raycaster.

A sign error in ray_cast's segment parameter once mirrored every
wall's valid span about its first vertex: rays hit the REFLECTION of
each wall segment instead of the wall itself, leaving whole corridor
stretches of the sim worlds blind (every beam at range_max) and
starving the landmark frontend there. These tests pin the geometry to
closed-form answers so that can never regress.
"""
import numpy as np

from sparse_gslam_tpu.eval.simulate import killian_world, ray_cast


class TestRayCast:
    def test_square_room_distances(self):
        """From the center of a 10x10 room, beam distances are known in
        closed form regardless of wall vertex order."""
        for flip in (False, True):
            walls = np.array(
                [
                    [(0, 0), (10, 0)],
                    [(10, 0), (10, 10)],
                    [(10, 10), (0, 10)],
                    [(0, 10), (0, 0)],
                ],
                dtype=np.float64,
            )
            if flip:
                walls = walls[:, ::-1, :]
            pose = np.array([5.0, 5.0, 0.0])
            angles = np.radians(np.array([0.0, 45.0, 90.0, 180.0]))
            rs = ray_cast(pose, angles, walls, 50.0)
            want = np.array([5.0, 5.0 * np.sqrt(2), 5.0, 5.0])
            np.testing.assert_allclose(rs, want, atol=1e-9)

    def test_segment_extent_respected(self):
        """A ray passing BESIDE a finite segment must miss it."""
        walls = np.array([[(5.0, 1.0), (5.0, 3.0)]])
        pose = np.array([0.0, 0.0, 0.0])
        # along +x at y=0: the segment spans y in [1, 3] -> miss;
        # at y=2 -> hit at x=5
        r_miss = ray_cast(pose, np.array([0.0]), walls, 50.0)
        assert r_miss[0] == 50.0
        pose2 = np.array([0.0, 2.0, 0.0])
        r_hit = ray_cast(pose2, np.array([0.0]), walls, 50.0)
        np.testing.assert_allclose(r_hit, [5.0])
        # and the MIRROR of the segment about its first vertex
        # (y in [-1, 1]) must NOT be solid: this is the old bug
        pose3 = np.array([0.0, -0.5, 0.0])
        r_mirror = ray_cast(pose3, np.array([0.0]), walls, 50.0)
        assert r_mirror[0] == 50.0

    def test_killian_corridors_are_visible(self):
        """Inside the killian ring corridor the side walls are always
        within ~5 m: a forward 180-degree scan must return hits (the
        regression: poses like (79, 33.8, +90deg) saw nothing)."""
        walls = killian_world()
        angles = np.linspace(-np.pi / 2, np.pi / 2, 180)
        for pose in [
            (79.0, 33.8, np.pi / 2),
            (41.5, 35.6, -np.pi / 2),
            (42.2, 31.4, -np.pi / 2),
            (5.0, 27.0, np.pi / 2),
        ]:
            rs = ray_cast(np.asarray(pose, np.float64), angles, walls, 10.0)
            n_hits = int((rs < 10.0).sum())
            assert n_hits > 60, (pose, n_hits)
