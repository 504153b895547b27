"""Pallas TPU kernels: fused autoregressive GRU rollouts.

Why: the jnp path (``lax.scan`` of per-site ops) round-trips the hidden
state, one-hot input, and gate activations through HBM on every site step —
at N=100 sites that dominates the VMC step time (HBM-bandwidth-bound).
These kernels fuse the *entire* site loop into one ``pallas_call``: weights
and the per-tile hidden state stay resident in VMEM for all N steps, so HBM
traffic collapses to "read the samples once, write the log-probs once".
This is the TPU-native replacement for the cuDNN GRU kernel role in the
reference (``tf.contrib.cudnn_rnn.CudnnCompatibleGRUCell``,
``/root/reference/1DTFIM/RNNwavefunction.py:8``), covering single-layer GRU +
softmax-head ansatze with on-site dimension 2.

Layout: everything is **feature-major** — hidden states (U, T) with the
batch tile on the lane dimension, spins/log-probs as (1, T) rows.  Per-site
sample access is a natural sublane slice, there are no relayouts inside the
loops, and no (x, 1) lane-padding waste.  Weights are pre-transposed at the
call boundary (wxT (3U, 2), whT (3U, U), heads (2, U), biases as columns).

Two kernels:

* ``gru_log_prob``   — teacher-forced joint log-probability of given spin
  configurations.  Exposed through a ``jax.custom_vjp`` whose backward pass
  is the jnp reference implementation's VJP, so the same entry point is used
  inside ``jax.grad`` (the differentiable surrogate path, S rows only).
* ``gru_sample``     — autoregressive sampling with the on-core PRNG
  (inverse-CDF draws per site), returning samples and their log-density.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # batch rows per grid program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gru_site_step_rows(x, x_scale, h, wxT, whT, bxT, bhT, hwT, hbT):
    """Row-layout (feature-major) GRU + head step.

    ``h`` is (U, T), ``x`` is (1, T) (previous spin in {0,1}); ``x_scale`` is
    0.0 on the first site (the chain starts from the zero *vector*, not a
    one-hot — ``1DTFIM/RNNwavefunction.py:52-56``) and 1.0 afterwards.
    The one-hot input projection is a select over the two wxT columns (no
    K=2 matmul).  Returns (h_new (U, T), l0 (1, T), l1 (1, T)).
    """
    u = h.shape[0]
    gx = x_scale * ((1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]) + bxT
    gh = jnp.dot(whT, h, preferred_element_type=jnp.float32) + bhT
    r = jax.nn.sigmoid(gx[:u] + gh[:u])
    z = jax.nn.sigmoid(gx[u : 2 * u] + gh[u : 2 * u])
    c = jnp.tanh(gx[2 * u :] + r * gh[2 * u :])
    h_new = z * h + (1.0 - z) * c
    logits = jnp.dot(hwT, h_new, preferred_element_type=jnp.float32) + hbT
    return h_new, logits[0:1, :], logits[1:2, :]


def _logp_rows(l0, l1, s):
    """Stable log-softmax probability of target s in {0,1}; (1, T) rows."""
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    return jnp.where(s > 0.5, l1, l0) - lse




def _weightsT(params):
    (cell,) = params["rnn"]
    head = params["head"]
    return (
        cell["wx"].T,           # (3U, 2)
        cell["wh"].T,           # (3U, U)
        cell["bx"][:, None],    # (3U, 1)
        cell["bh"][:, None],
        head["w"].T,            # (2, U)
        head["b"][:, None],
    )


def _weightT_specs(u):
    return [
        pl.BlockSpec((3 * u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# Teacher-forced log-probability kernel
# ---------------------------------------------------------------------------

def _log_prob_kernel(
    samples_ref,  # (N, T) int32  — sequence-major
    wxT, whT, bxT, bhT, hwT, hbT,
    out_ref,      # (1, T) f32
):
    n_sites = samples_ref.shape[0]
    t = samples_ref.shape[1]
    u = whT.shape[1]
    w = (wxT[:], whT[:], bxT[:], bhT[:], hwT[:], hbT[:])

    def body(n, carry):
        h, x, acc = carry
        s = samples_ref[pl.ds(n, 1), :].astype(jnp.float32)
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        h_new, l0, l1 = _gru_site_step_rows(x, x_scale, h, *w)
        return h_new, s, acc + _logp_rows(l0, l1, s)

    h0 = jnp.zeros((u, t), jnp.float32)
    z = jnp.zeros((1, t), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, n_sites, body, (h0, z, z))
    out_ref[:] = acc


def _log_prob_pallas(params, samples: jax.Array) -> jax.Array:
    """(B, N) int -> (B,) f32 joint log-prob. Single-layer GRU params."""
    (cell,) = params["rnn"]
    b, n = samples.shape
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(b, 8), TILE)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    out = pl.pallas_call(
        _log_prob_kernel,
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(u),
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
    )(seq, *_weightsT(params))
    return out[0, :b]


# ---------------------------------------------------------------------------
# Sampling kernel
# ---------------------------------------------------------------------------

def _sample_kernel(
    seed_ref,                                   # (1, 1) int32 SMEM
    wxT, whT, bxT, bhT, hwT, hbT,
    samples_ref,                                # (N, T) int32 out
    logp_ref,                                   # (1, T) f32 out
):
    n_sites = samples_ref.shape[0]
    t = samples_ref.shape[1]
    u = whT.shape[1]
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    w = (wxT[:], whT[:], bxT[:], bhT[:], hwT[:], hbT[:])

    def body(n, carry):
        h, x, acc = carry
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        h_new, l0, l1 = _gru_site_step_rows(x, x_scale, h, *w)
        # inverse-CDF draw over 2 classes: p0 = sigmoid(l0 - l1)
        p0 = jax.nn.sigmoid(l0 - l1)
        bits = pltpu.prng_random_bits((1, t))
        # uniform in [0, 1) from the top 23 bits (int32 path: Mosaic lacks a
        # direct uint32 -> float32 cast)
        usig = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.int32), 9
        )
        uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
        s = jnp.where(uni >= p0, 1.0, 0.0)
        acc = acc + _logp_rows(l0, l1, s)
        samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
        return h_new, s, acc

    h0 = jnp.zeros((u, t), jnp.float32)
    z = jnp.zeros((1, t), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, n_sites, body, (h0, z, z))
    logp_ref[:] = acc


def _sample_pallas(
    params, seed: jax.Array, num_samples: int, n_sites: int
) -> Tuple[jax.Array, jax.Array]:
    """Returns (samples (B, N) int32, logp (B,) f32)."""
    (cell,) = params["rnn"]
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(num_samples, 8), TILE)

    samples, logp = pl.pallas_call(
        _sample_kernel,
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weightT_specs(u),
        out_specs=(
            pl.BlockSpec((n_sites, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
    )(seed.reshape(1, 1).astype(jnp.int32), *_weightsT(params))
    return samples[:, :num_samples].T, logp[0, :num_samples]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, jnp backward
# ---------------------------------------------------------------------------

def make_log_prob_fn(jnp_log_prob):
    """Build ``log_prob(params, samples)`` that runs the Pallas kernel
    forward and differentiates through the jnp reference implementation
    (teacher-forcing BPTT) — the gradient path only ever sees the small
    S-row surrogate batch, so recompute there is cheap."""

    @jax.custom_vjp
    def log_prob(params, samples):
        return _log_prob_pallas(params, samples)

    def fwd(params, samples):
        return _log_prob_pallas(params, samples), (params, samples)

    def bwd(res, g):
        params, samples = res
        _, vjp_fn = jax.vjp(lambda p: jnp_log_prob(p, samples), params)
        (dparams,) = vjp_fn(g)
        return dparams, None

    log_prob.defvjp(fwd, bwd)
    return log_prob
