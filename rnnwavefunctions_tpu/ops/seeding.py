"""PRNG seed derivation for the Pallas kernel samplers.

The on-core TPU PRNG (``pltpu.prng_seed`` / ``prng_random_bits``) is seeded
with a single int32 per kernel launch, while JAX carries full 64-bit-plus
keys.  Deriving the seed from only one 32-bit key word (as in round 1) left
~31 bits of entropy per training step — over a 20k+-step run the birthday
bound makes a repeated hardware PRNG stream across two steps fairly likely
(correlated Monte-Carlo noise, no estimator bias).  Here every word of the
key is mixed into the seed (murmur-style xor/multiply/shift avalanche), and
grid tiles stride the seed by a large odd constant instead of +1 so
consecutive step seeds can never alias a neighbouring tile's stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large odd int32 stride between per-tile PRNG streams (kernels compute
# ``seed + program_id * TILE_SEED_STRIDE`` with wrapping int32 arithmetic).
TILE_SEED_STRIDE = 0x3779B97F


def seed_from_key(key: jax.Array) -> jax.Array:
    """Fold ALL 32-bit words of a JAX PRNG key into one 31-bit int32 seed."""
    bits = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    s = jnp.uint32(0x9E3779B9)
    for i in range(bits.shape[0]):  # static unroll; keys are 2-4 words
        s = (s ^ bits[i]) * jnp.uint32(0x85EBCA6B)
        s = s ^ jax.lax.shift_right_logical(s, jnp.uint32(13))
    return (s & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
