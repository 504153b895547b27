"""Hidden-dimension (tensor-parallel) model sharding for the pRNN trunk.

SURVEY.md §2.4's optional rebuild component: the reference has no model
parallelism (50-unit GRUs fit anywhere), but very large hidden sizes
eventually exceed one core's VMEM/HBM arithmetic balance.  The TPU-native
recipe is Megatron-style sharding of the recurrent weights over a second
mesh axis ``tp`` orthogonal to the Monte-Carlo ``dp`` axis:

* every GRU gate block's *output* columns are split over ``tp`` — device d
  holds ``wx[:, gate, d-th slice]`` / ``wh[:, gate, d-th slice]`` and its
  slice of the biases and of the hidden state ``h``;
* one ``all_gather(h)`` over ICI per site step reassembles the full hidden
  input for the ``h @ wh`` contraction (the only cross-shard dependency);
* the softmax head's rows are split the same way and its logits are
  ``psum``'d, so every tp member sees identical conditionals — with the
  per-site PRNG key folded over ``dp`` only, all tp members draw identical
  spins and the Monte-Carlo chains stay consistent without communication.

Per-site comms: one (B, U) all-gather + one (B, 2) psum over ``tp`` — both
ride ICI.  Gradients of the sharded parameters are local to their shard
(only the ``dp`` mean is psum'd), exactly like any Megatron column-parallel
layer.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from .mesh import DP_AXIS

TP_AXIS = "tp"


def make_dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """2D mesh: Monte-Carlo chains over ``dp``, hidden dimension over ``tp``."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), (DP_AXIS, TP_AXIS))


# ---------------------------------------------------------------------------
# Parameter sharding
# ---------------------------------------------------------------------------

def _gate_cols(w: jax.Array, num_gates: int, k: int, idx) -> jax.Array:
    """Slice each of the ``num_gates`` packed gate blocks' output columns to
    tp-shard ``idx`` (static python int or traced index)."""
    u = w.shape[-1] // num_gates
    us = u // k
    parts = [
        jax.lax.dynamic_slice_in_dim(w, g * u + idx * us, us, axis=-1)
        for g in range(num_gates)
    ]
    return jnp.concatenate(parts, axis=-1)


def shard_params(params: Any, k: int, idx) -> Any:
    """Shard a PRNN1D GRU parameter pytree for tp-shard ``idx`` of ``k``.

    Layer weights keep full input rows and take 1/k of every gate's output
    columns; the head takes 1/k of its input rows.  For layers above the
    first, the input rows are the previous layer's *full* hidden (the
    all-gathered activation), so rows stay full there too.
    """
    for i, cell in enumerate(params["rnn"]):
        u = cell["wh"].shape[0]
        if u % k != 0:
            raise ValueError(
                f"hidden width {u} of layer {i} is not divisible by "
                f"tp={k}; pick units that shard evenly"
            )
    rnn = []
    for cell in params["rnn"]:
        rnn.append({
            "wx": _gate_cols(cell["wx"], 3, k, idx),
            "wh": _gate_cols(cell["wh"], 3, k, idx),
            "bx": _gate_cols(cell["bx"][None], 3, k, idx)[0],
            "bh": _gate_cols(cell["bh"][None], 3, k, idx)[0],
        })
    head = params["head"]
    u_top = params["rnn"][-1]["wh"].shape[0]
    us = u_top // k
    return {
        "rnn": rnn,
        "head": {
            "w": jax.lax.dynamic_slice_in_dim(head["w"], idx * us, us, axis=0),
            # b/k folded inside the head psum: the forward value is
            # unchanged, and because the in-trunk psum transposes to a psum,
            # every member's local gradient comes out k x its disjoint
            # slice — so pmean-over-tp (NOT a plain psum; see
            # trainer._device_step_tp and tests/test_tensor_parallel.py::
            # test_tp_inner_grad_pmean_matches_unsharded) assembles ALL
            # parameter gradients uniformly at 1x, the bias included via
            # the folded 1/k.
            "b": head["b"] / k,
        },
    }


# ---------------------------------------------------------------------------
# Sharded trunk (runs inside shard_map over a ("dp", "tp") mesh)
# ---------------------------------------------------------------------------

def _tp_gru_apply(p, x, h_shard):
    """One tp-sharded GRU step: ``h_shard`` (B, U/k) -> new (B, U/k) shard.
    The recurrent contraction consumes the all-gathered full hidden."""
    h_full = jax.lax.all_gather(h_shard, TP_AXIS, axis=-1, tiled=True)
    us = h_shard.shape[-1]
    gx = jnp.dot(x, p["wx"], preferred_element_type=h_shard.dtype) + p["bx"]
    gh = jnp.dot(h_full, p["wh"], preferred_element_type=h_shard.dtype) + p["bh"]
    r = jax.nn.sigmoid(gx[..., :us] + gh[..., :us])
    z = jax.nn.sigmoid(gx[..., us : 2 * us] + gh[..., us : 2 * us])
    c = jnp.tanh(gx[..., 2 * us :] + r * gh[..., 2 * us :])
    return z * h_shard + (1.0 - z) * c


def _tp_step_logits(params, x, hs):
    """Sharded stacked-GRU + head step.  ``hs``: per-layer (B, U/k) shards.
    Returns ((B, d) tp-replicated logits, new shards)."""
    new_hs = []
    inp = x
    for p, h in zip(params["rnn"], hs):
        h_new = _tp_gru_apply(p, inp, h)
        new_hs.append(h_new)
        # deeper layers consume the full previous-layer output
        inp = jax.lax.all_gather(h_new, TP_AXIS, axis=-1, tiled=True)
    # row-sharded head: partial products (+ b/k) reduced over the tp group
    logits = jax.lax.psum(
        jnp.dot(new_hs[-1], params["head"]["w"],
                preferred_element_type=new_hs[-1].dtype)
        + params["head"]["b"],
        TP_AXIS,
    )
    return logits, tuple(new_hs)


def tp_zero_state(batch: int, units: Sequence[int], k: int, dtype=jnp.float32):
    return tuple(jnp.zeros((batch, u // k), dtype) for u in units)


def tp_log_prob(params_shard, samples: jax.Array, units: Sequence[int],
                k: int, dtype=jnp.float32) -> jax.Array:
    """Teacher-forced joint log p(sigma) with tp-sharded parameters;
    (B, N) int -> (B,) replicated across the tp group."""
    d = 2
    s = samples.shape[0]
    onehot = jax.nn.one_hot(samples.T, d, dtype=dtype)
    inputs = jnp.concatenate(
        [jnp.zeros((1, s, d), dtype), onehot[:-1]], axis=0
    )
    targets = samples.T

    def step(hs, xs_t):
        x, tgt = xs_t
        logits, hs = _tp_step_logits(params_shard, x, hs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        site_logp = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        return hs, site_logp

    hs0 = tp_zero_state(s, units, k, dtype)
    _, site_logps = jax.lax.scan(step, hs0, (inputs, targets))
    return jnp.sum(site_logps, axis=0)


def tp_sample_with_log_prob(params_shard, key: jax.Array, num_samples: int,
                            num_sites: int, units: Sequence[int], k: int,
                            dtype=jnp.float32):
    """Autoregressive sampling with tp-sharded parameters.  ``key`` must be
    identical across the tp group (fold only the dp index into it) so every
    shard draws the same spins from the identical psum'd conditionals."""
    from ..models.prnn1d import inverse_cdf_sample

    d = 2

    def step(carry, site_key):
        x, hs = carry
        logits, hs = _tp_step_logits(params_shard, x, hs)
        logp = jax.nn.log_softmax(logits, axis=-1)
        draw = inverse_cdf_sample(site_key, jnp.exp(logp))
        x_next = jax.nn.one_hot(draw, d, dtype=dtype)
        site_logp = jnp.take_along_axis(logp, draw[:, None], axis=-1)[:, 0]
        return (x_next, hs), (draw, site_logp)

    x0 = jnp.zeros((num_samples, d), dtype)
    hs0 = tp_zero_state(num_samples, units, k, dtype)
    keys = jax.random.split(key, num_sites)
    _, (draws, site_logps) = jax.lax.scan(step, (x0, hs0), keys)
    return draws.T, jnp.sum(site_logps, axis=0)
