"""PRNG seed derivation for the Pallas kernel samplers.

The on-core TPU PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) accepts
multiple int32 seed words, while JAX carries full 64-bit-plus keys.  A
single 31-bit seed per training step (rounds 1-2) hits the birthday bound
over a 20k+-step run (~9% chance some two steps replay the same hardware
stream — correlated Monte-Carlo noise, no estimator bias).  Here TWO
independently avalanched words of the key feed ``prng_seed`` (a ~62-bit
stream space: collisions are ~1e-11 at 100k steps), and grid tiles stride
the first word by a large odd constant instead of +1 so consecutive step
seeds can never alias a neighbouring tile's stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large odd int32 stride between per-tile PRNG streams (kernels compute
# ``seed + program_id * TILE_SEED_STRIDE`` with wrapping int32 arithmetic
# on the FIRST word; the second word is tile-invariant).
TILE_SEED_STRIDE = 0x3779B97F


def _avalanche(bits, init: int) -> jax.Array:
    s = jnp.uint32(init)
    for i in range(bits.shape[0]):  # static unroll; keys are 2-4 words
        s = (s ^ bits[i]) * jnp.uint32(0x85EBCA6B)
        s = s ^ jax.lax.shift_right_logical(s, jnp.uint32(13))
    return (s & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)


def seed_from_key(key: jax.Array) -> jax.Array:
    """(2,) int32 seed words, each folding ALL 32-bit words of a JAX PRNG
    key through an independent murmur-style avalanche."""
    bits = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return jnp.stack([
        _avalanche(bits, 0x9E3779B9),
        _avalanche(bits, 0x85EBCA77),
    ])


def seed_block(seed) -> jax.Array:
    """Normalize a scalar seed (tests, notebooks) or a (2,) word vector
    (``seed_from_key``) to the (1, 2) int32 SMEM block the sampler kernels
    take."""
    seed = jnp.asarray(seed, jnp.int32).reshape(-1)
    if seed.shape[0] == 1:
        seed = jnp.concatenate([seed, jnp.zeros((1,), jnp.int32)])
    return seed[:2].reshape(1, 2)
