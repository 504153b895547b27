"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding semantics are
validated on virtual CPU devices (SURVEY.md §4 "Distributed" strategy).

NOTE: this environment registers an out-of-tree 'axon' TPU backend that
overrides the JAX_PLATFORMS env var, so the platform must be forced through
jax.config *before* any backend is initialized.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
