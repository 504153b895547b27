"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding semantics are
validated on virtual CPU devices (SURVEY.md §4 "Distributed" strategy).
"""

import os

# Must happen before jax import.  Tests always run on the simulated CPU mesh
# (override any ambient platform selection; benchmarks use the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
