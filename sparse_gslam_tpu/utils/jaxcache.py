"""Persistent XLA compilation cache setup.

Remote TPU compiles (and cold CPU compiles of the bucketed solver
kernels) dominate pipeline startup; the persistent cache makes every
bucket shape a one-time cost per machine.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None, tag: str = "") -> None:
    """tag should identify the platform (e.g. "cpu", "axon"): cache
    entries are machine-code artifacts and must not be shared between
    the local CPU and the remote-compile TPU tunnel (whose host CPU has
    different ISA features -- loading its XLA:CPU AOT blobs locally can
    SIGILL)."""
    import jax

    d = cache_dir or os.environ.get(
        "SLAM_JAX_CACHE", os.path.expanduser("~/.cache/sparse_gslam_jax")
    )
    if tag:
        d = f"{d}-{tag}"
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception:
        pass  # older jax without these flags
