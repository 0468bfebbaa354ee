"""Test env: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, per the multi-chip test strategy (SURVEY.md §4)."""
import os

# force CPU even when the ambient env selects the TPU tunnel (axon):
# unit tests must be runnable anywhere and use the 8-device fake mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
