"""Test configuration: run on a simulated 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding semantics are
validated on virtual CPU devices (SURVEY.md §4 "Distributed" strategy).

NOTE: this environment registers an out-of-tree 'axon' TPU backend that
overrides the JAX_PLATFORMS env var, so the platform must be forced through
jax.config *before* any backend is initialized.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite is compile-dominated (every test
# jits its own trainer/kernel closures), so warm re-runs of unchanged tests
# skip XLA compilation entirely.  Keyed on program HLO — code changes
# invalidate affected entries automatically.  Wipe with
# `rm -rf tests/.jax_cache` if it ever misbehaves.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

from rnnwavefunctions_tpu.ops import tiling  # noqa: E402


@pytest.fixture(autouse=True)
def _base_wavefront_groups(request):
    """Force the base wavefront group in the fast set.

    Group width never changes kernel numerics for a given regime, but
    interpret-mode emulation cost scales ~linearly with it, so fast tests
    validate numerics at the base group.  Caveat: the (tile, spill) pick
    accounts VMEM with the group it will run, so for configs near the
    budget edge the forced pick can select a different regime than
    production would.  The real latency-scaled policy therefore still
    runs in: tests marked `widegroup` (wide-group equality oracles and
    the production-pick assertions of test_tile_selection), every `slow`
    capacity variant, and all on-hardware validation.
    """
    if request.node.get_closest_marker("slow") or request.node.get_closest_marker(
        "widegroup"
    ):
        yield
        return
    old = tiling.FORCE_BASE_GROUP
    tiling.FORCE_BASE_GROUP = True
    try:
        yield
    finally:
        tiling.FORCE_BASE_GROUP = old
