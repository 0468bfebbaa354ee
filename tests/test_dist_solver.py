import numpy as np
import jax
import jax.numpy as jnp

from sparse_gslam_tpu.ops import solvers
from sparse_gslam_tpu.parallel import dist_solver
from sparse_gslam_tpu.parallel.partition import make_partition
from test_solvers import make_pose_graph


class TestPartition:
    def test_boundaries_first_then_closures(self):
        clo_i = np.array([3, 10], np.int32)
        clo_j = np.array([60, 20], np.int32)
        plan = make_partition(64, 4, clo_i, clo_j, np.array([True, True]))
        assert plan.block_size == 16
        # boundary slots 0..2 = poses 15, 31, 47
        assert list(plan.sep_pose[:3]) == [15, 31, 47]
        assert plan.sep_valid[:3].all()
        # closure endpoints appended
        for p in (3, 60, 10, 20):
            s = plan.sep_id_of_pose[p]
            assert s >= 0 and plan.sep_pose[s] == p
        assert plan.sep_id_of_pose[5] == -1

    def test_closure_on_boundary_dedupes(self):
        plan = make_partition(
            64, 4, np.array([15], np.int32), np.array([40], np.int32),
            np.array([True]),
        )
        assert plan.clo_sep_i[0] == 0  # reuses boundary slot


class TestBlockedSolver:
    def test_matches_dense_solver(self):
        g, gt, n = make_pose_graph(N=64, C=4, n=50)
        g_dense = solvers.optimize_pose_graph(g, phi=1.0, iterations=10)
        g_part = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=4, iterations=10
        )
        np.testing.assert_allclose(
            np.asarray(g_part.poses[:n]),
            np.asarray(g_dense.poses[:n]),
            atol=1e-6,
        )

    def test_matches_dense_with_many_closures(self):
        g, gt, n = make_pose_graph(N=64, C=8, n=60, drift=0.05, seed=7)
        # add more closures at varied positions
        clo_i = np.asarray(g.clo_i).copy()
        clo_j = np.asarray(g.clo_j).copy()
        clo_meas = np.asarray(g.clo_meas).copy()
        clo_info = np.asarray(g.clo_info).copy()
        clo_valid = np.asarray(g.clo_valid).copy()
        from sparse_gslam_tpu.utils import se2

        pairs = [(5, 40), (12, 33), (20, 55), (2, 59)]
        for k, (a, b) in enumerate(pairs, start=1):
            clo_i[k], clo_j[k] = a, b
            clo_meas[k] = se2.relative(gt[a], gt[b])
            clo_info[k] = np.eye(3) * 500.0
            clo_valid[k] = True
        g = g._replace(
            clo_i=jnp.array(clo_i), clo_j=jnp.array(clo_j),
            clo_meas=jnp.array(clo_meas), clo_info=jnp.array(clo_info),
            clo_valid=jnp.array(clo_valid),
        )
        g_dense = solvers.optimize_pose_graph(g, phi=1.0, iterations=15)
        g_part = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=8, iterations=15
        )
        np.testing.assert_allclose(
            np.asarray(g_part.poses[:n]),
            np.asarray(g_dense.poses[:n]),
            atol=1e-5,
        )

    def test_single_block_degenerate(self):
        g, gt, n = make_pose_graph(N=32, C=4, n=24)
        g_dense = solvers.optimize_pose_graph(g, phi=1.0, iterations=10)
        g_part = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=1, iterations=10
        )
        np.testing.assert_allclose(
            np.asarray(g_part.poses[:n]),
            np.asarray(g_dense.poses[:n]),
            atol=1e-6,
        )


class TestShardedSolver:
    def test_matches_dense_on_8_device_mesh(self):
        from jax.sharding import Mesh

        devs = jax.devices("cpu")
        assert len(devs) >= 8, "conftest must set 8 virtual devices"
        mesh = Mesh(np.array(devs[:8]), ("blocks",))
        g, gt, n = make_pose_graph(N=64, C=4, n=60, drift=0.05, seed=3)
        g_dense = solvers.optimize_pose_graph(g, phi=1.0, iterations=10)
        g_sh = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=8, iterations=10, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(g_sh.poses[:n]),
            np.asarray(g_dense.poses[:n]),
            atol=1e-6,
        )

    def test_sharded_matches_blocked(self):
        from jax.sharding import Mesh

        devs = jax.devices("cpu")
        mesh = Mesh(np.array(devs[:4]), ("blocks",))
        g, gt, n = make_pose_graph(N=64, C=4, n=50, seed=11)
        g_b = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=4, iterations=8
        )
        g_s = dist_solver.optimize_partitioned(
            g, phi=1.0, n_blocks=4, iterations=8, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(g_s.poses), np.asarray(g_b.poses), atol=1e-8
        )
