"""Test env: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, per the multi-chip test strategy (SURVEY.md §4).

Note: the machine's sitecustomize registers the axon TPU plugin and
sets jax_platforms='axon,cpu' programmatically, overriding the
JAX_PLATFORMS env var -- so we must override via jax.config after
import. Solvers are validated in float64 (x64) on CPU; the TPU path
runs float32 (see bench.py).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from sparse_gslam_tpu.utils.jaxcache import enable as _enable_cache  # noqa: E402

_enable_cache(tag="cpu")
