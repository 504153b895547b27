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

Two kernels:

* ``gru_log_prob``   — teacher-forced joint log-probability of given spin
  configurations (the hot op of local-energy estimation: (N+1)*S rows per
  VMC step).  Exposed through a ``jax.custom_vjp`` whose backward pass is
  the jnp reference implementation's VJP, so the same entry point is used
  inside ``jax.grad`` (the differentiable surrogate path, S rows only).
* ``gru_sample``     — autoregressive sampling with the on-core PRNG
  (inverse-CDF draws per site), returning samples and their log-density.

Layout notes: sequences are processed in (sites, batch-tile) layout so the
per-site read/write is a dynamic *sublane* slice (well supported); the
batch is tiled over the grid with per-tile hidden state as kernel-carried
values.  Gate weights are packed [reset | update | candidate] as in
``models/cells.py``; the input projection for the one-hot input is computed
as a select over the two weight rows (no K=2 matmul).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512  # batch rows per grid program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gru_site_step(x01, x_scale, h, wx, wh, bx, bh, hw, hb):
    """One fused GRU + head step on a (T, .) tile.

    x01: (T, 1) float previous spin (0/1).  x_scale is 0.0 on the first site
    (the autoregressive chain starts from the zero *vector*, not a one-hot —
    ``1DTFIM/RNNwavefunction.py:52-56``) and 1.0 afterwards.
    Returns (h_new, logit0, logit1) with logits (T, 1) each.
    """
    u = h.shape[1]
    # one-hot input projection as a select over the two rows of wx:
    # x = [1-s, s]  =>  x @ wx = (1-s) * wx[0] + s * wx[1]
    gx = x_scale * ((1.0 - x01) * wx[0:1, :] + x01 * wx[1:2, :]) + bx
    gh = (
        jnp.dot(h, wh, preferred_element_type=jnp.float32)
        + bh
    )
    r = jax.nn.sigmoid(gx[:, :u] + gh[:, :u])
    z = jax.nn.sigmoid(gx[:, u : 2 * u] + gh[:, u : 2 * u])
    c = jnp.tanh(gx[:, 2 * u :] + r * gh[:, 2 * u :])
    h_new = z * h + (1.0 - z) * c
    logits = (
        jnp.dot(h_new, hw, preferred_element_type=jnp.float32) + hb
    )  # (T, 2)
    return h_new, logits[:, 0:1], logits[:, 1:2]


def _logp_of(l0, l1, s01):
    """Stable log softmax probability of target s (0/1): (T, 1) each."""
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    lt = jnp.where(s01 > 0.5, l1, l0)
    return lt - lse


def _gru_site_step_rows(x, x_scale, h, wxT, whT, bxT, bhT, hwT, hbT):
    """Row-layout (feature-major) GRU + head step.

    All activations keep the batch on the *lane* dimension: ``h`` is (U, T),
    ``x`` is (1, T) (previous spin in {0,1}).  Weights come pre-transposed:
    wxT (3U, 2) split as columns, whT (3U, U), hwT (2, U); biases as (., 1)
    columns.  No relayouts anywhere in the loop, and no lane-padding waste on
    (x, 1) vectors.  Returns (h_new (U, T), l0 (1, T), l1 (1, T)).
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


# ---------------------------------------------------------------------------
# Teacher-forced log-probability kernel
# ---------------------------------------------------------------------------

def _log_prob_kernel(
    samples_ref,  # (N, T) int32  — sequence-major
    wx_ref, wh_ref, bx_ref, bh_ref, hw_ref, hb_ref,
    out_ref,      # (T, 1) f32
):
    n_sites = samples_ref.shape[0]
    u = wh_ref.shape[0]
    t = samples_ref.shape[1]
    wx, wh = wx_ref[:], wh_ref[:]
    bx, bh = bx_ref[:], bh_ref[:]
    hw, hb = hw_ref[:], hb_ref[:]

    def body(n, carry):
        h, x01, acc = carry
        s = samples_ref[pl.ds(n, 1), :]          # (1, T) int32
        s01 = jnp.swapaxes(s, 0, 1).astype(jnp.float32)  # (T, 1)
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        h_new, l0, l1 = _gru_site_step(x01, x_scale, h, wx, wh, bx, bh, hw, hb)
        acc = acc + _logp_of(l0, l1, s01)
        return h_new, s01, acc

    h0 = jnp.zeros((t, u), jnp.float32)
    x0 = jnp.zeros((t, 1), jnp.float32)
    acc0 = jnp.zeros((t, 1), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, n_sites, body, (h0, x0, acc0))
    out_ref[:] = acc


def _log_prob_pallas(params, samples: jax.Array) -> jax.Array:
    """(B, N) int -> (B,) f32 joint log-prob. Single-layer GRU params."""
    (cell,) = params["rnn"]
    head = params["head"]
    b, n = samples.shape
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(b, 8), TILE)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    grid = (b_pad // TILE,)
    out = pl.pallas_call(
        _log_prob_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
    )(
        seq,
        cell["wx"],
        cell["wh"],
        cell["bx"][None, :],
        cell["bh"][None, :],
        head["w"],
        head["b"][None, :],
    )
    return out[:b, 0]


# ---------------------------------------------------------------------------
# Sampling kernel
# ---------------------------------------------------------------------------

def _sample_kernel(
    seed_ref,                                   # (1, 1) int32 SMEM
    wx_ref, wh_ref, bx_ref, bh_ref, hw_ref, hb_ref,
    samples_ref,                                # (N, T) int32 out
    logp_ref,                                   # (T, 1) f32 out
):
    n_sites = samples_ref.shape[0]
    u = wh_ref.shape[0]
    t = logp_ref.shape[0]
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    wx, wh = wx_ref[:], wh_ref[:]
    bx, bh = bx_ref[:], bh_ref[:]
    hw, hb = hw_ref[:], hb_ref[:]

    def body(n, carry):
        h, x01, acc = carry
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        h_new, l0, l1 = _gru_site_step(x01, x_scale, h, wx, wh, bx, bh, hw, hb)
        # inverse-CDF draw over 2 classes: p0 = sigmoid(l0 - l1)
        p0 = jax.nn.sigmoid(l0 - l1)
        bits = pltpu.prng_random_bits((t, 1))
        # uniform in [0, 1) from the top 23 bits (int32 path: Mosaic lacks a
        # direct uint32 -> float32 cast)
        usig = jax.lax.shift_right_logical(
            pltpu.bitcast(bits, jnp.int32), 9
        )
        uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
        s01 = jnp.where(uni >= p0, 1.0, 0.0)
        acc = acc + _logp_of(l0, l1, s01)
        samples_ref[pl.ds(n, 1), :] = jnp.swapaxes(s01, 0, 1).astype(jnp.int32)
        return h_new, s01, acc

    h0 = jnp.zeros((t, u), jnp.float32)
    x0 = jnp.zeros((t, 1), jnp.float32)
    acc0 = jnp.zeros((t, 1), jnp.float32)
    _, _, acc = jax.lax.fori_loop(0, n_sites, body, (h0, x0, acc0))
    logp_ref[:] = acc


def _sample_pallas(
    params, seed: jax.Array, num_samples: int, n_sites: int
) -> Tuple[jax.Array, jax.Array]:
    """Returns (samples (B, N) int32, logp (B,) f32)."""
    (cell,) = params["rnn"]
    head = params["head"]
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(num_samples, 8), TILE)

    grid = (b_pad // TILE,)
    samples, logp = pl.pallas_call(
        _sample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_sites, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
    )(
        seed.reshape(1, 1).astype(jnp.int32),
        cell["wx"],
        cell["wh"],
        cell["bx"][None, :],
        cell["bh"][None, :],
        head["w"],
        head["b"][None, :],
    )
    return samples[:, :num_samples].T, logp[:num_samples, 0]


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
