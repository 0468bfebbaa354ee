"""Worker process for the REAL multi-process jax.distributed test
(VERDICT r4 #6). Launched (2x) by tests/test_multiprocess.py:

    python scripts/dist_test_worker.py <pid> <nprocs> <port>

Each process owns 2 virtual CPU devices; the 2-process / 4-device
"blocks" mesh runs the keyframe-partitioned pose-graph solver
(parallel.dist_solver.optimize_pose_graph_sharded) over GLOBAL arrays
built with jax.make_array_from_callback -- the exact construction a
real multi-host pod run uses (scripts/run_multihost.py), now exercised
through the actual jax.distributed coordination + gloo collective
path instead of the single-process virtual mesh.

Exit code 0 = this process's shards of the distributed solution match
the dense single-chip reference solve to 1e-6.
"""
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    + os.environ.get("XLA_FLAGS", "")
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nprocs,
    process_id=pid,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Ps

from sparse_gslam_tpu.eval.synthetic_graphs import make_chain_graph
from sparse_gslam_tpu.parallel import dist_solver
from sparse_gslam_tpu.parallel.partition import make_partition

assert jax.process_count() == nprocs, jax.process_count()
n_global = len(jax.devices())
assert n_global == 2 * nprocs, n_global
print(
    f"proc {jax.process_index()}: {len(jax.local_devices())} local / "
    f"{n_global} global devices",
    flush=True,
)

# identical graph in every process (deterministic seed)
g, _ = make_chain_graph(
    n_poses=480, n_closures=16, pad_to=512, drift=0.02, seed=7,
    dtype=np.float32,
)
n_blocks = 8
plan = make_partition(
    512, n_blocks, np.asarray(g.clo_i), np.asarray(g.clo_j),
    np.asarray(g.clo_valid),
)
bg, sg = dist_solver.split_graph(g, plan)

# dense single-chip reference on this process's local devices only
ref = np.asarray(
    dist_solver.optimize_pose_graph_blocked(bg, sg, 1.0, iterations=12)
)

mesh = Mesh(np.array(jax.devices()), ("blocks",))


def put(tree, spec):
    def one(a):
        a = np.asarray(a)
        sh = NamedSharding(mesh, spec if a.ndim else Ps())
        return jax.make_array_from_callback(
            a.shape, sh, lambda idx: a[idx]
        )

    return jax.tree_util.tree_map(one, tree)


bg_g = put(bg, Ps("blocks"))
sg_g = put(sg, Ps())
out = dist_solver.optimize_pose_graph_sharded(
    bg_g, sg_g, 1.0, mesh, iterations=12
)
jax.block_until_ready(out)

# compare THIS process's addressable shards against the reference
n_checked = 0
for shard in out.addressable_shards:
    want = ref[shard.index]
    got = np.asarray(shard.data)
    np.testing.assert_allclose(got, want, atol=1e-6)
    n_checked += got.size
assert n_checked > 0
print(f"proc {pid}: OK ({n_checked} values checked)", flush=True)
