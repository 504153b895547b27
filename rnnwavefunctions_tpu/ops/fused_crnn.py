"""Pallas TPU kernels: fused complex-cRNN rollouts with U(1) masking.

Same VMEM-residency design as ``fused_gru`` (whole site loop in one kernel,
weights + hidden state on-chip), extended for the two-head complex ansatz of
``models/crnn_u1.py`` (reference ``J1J2/ComplexRNNwavefunction.py``):

* amplitude head ``sqrt(softmax)`` and phase head ``pi * softsign``;
* the exact U(1) zero-magnetization masking semantics — heavyside with
  H(0)=1 on ``baseline - counts`` for sites ``2n >= N``, then L2
  renormalization with eps 1e-30 (``ComplexRNNwavefunction.py:85-93``);
* everything in real arithmetic: outputs are (Re log psi, Im log psi).

Log-space evaluation: with p = softmax and ``act`` the {0,1} mask,

    log ampl_t = 0.5 * (log p_t + log act_t - log(act0 p0 + act1 p1))

where ``log p_t`` comes from a stable softplus and masked-out targets get
``LOG_ZERO`` (finite stand-in for -inf so padded rows never create NaNs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import _gru_site_step, _round_up

TILE = 512
LOG_ZERO = -1e9


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _crnn_site(x01, x_scale, h, w, nf, num_up, n_sites, u1):
    """Shared per-site trunk+heads computation.

    ``nf``: (T, 1) float site index.  Returns (h_new, lp0, lp1, ph0, ph1)
    where lp_i = log of the masked, renormalized probability of class i
    (= 2 log ampl_i) and ph_i the phase.  All (T, 1).
    """
    wx, wh, bx, bh, aw, ab, pw, pb = w
    h_new, l0, l1 = _gru_site_step(x01, x_scale, h, wx, wh, bx, bh, aw, ab)
    # log softmax probabilities over 2 classes
    d = l0 - l1
    lp0 = -_softplus(-d)
    lp1 = -_softplus(d)

    if u1:
        baseline = jnp.float32(n_sites // 2 - 1)
        num_down = nf - num_up
        act_up = jnp.where(baseline - num_up >= 0, 1.0, 0.0)     # H(0)=1
        act_down = jnp.where(baseline - num_down >= 0, 1.0, 0.0)
        p0 = jnp.exp(lp0)
        p1 = jnp.exp(lp1)
        norm2 = jnp.maximum(act_down * p0 + act_up * p1, 1e-30)
        log_norm2 = jnp.log(norm2)
        mlp0 = jnp.where(act_down > 0, lp0, LOG_ZERO) - log_norm2
        mlp1 = jnp.where(act_up > 0, lp1, LOG_ZERO) - log_norm2
        active = 2 * nf >= n_sites
        lp0 = jnp.where(active, mlp0, lp0)
        lp1 = jnp.where(active, mlp1, lp1)

    # phase head: pi * softsign
    pl_ = jnp.dot(h_new, pw, preferred_element_type=jnp.float32) + pb
    ph = jnp.pi * pl_ / (1.0 + jnp.abs(pl_))
    return h_new, lp0, lp1, ph[:, 0:1], ph[:, 1:2]


def _weights(params):
    (cell,) = params["rnn"]
    return (
        cell["wx"], cell["wh"],
        cell["bx"][None, :], cell["bh"][None, :],
        params["head_ampl"]["w"], params["head_ampl"]["b"][None, :],
        params["head_phase"]["w"], params["head_phase"]["b"][None, :],
    )


def _weight_specs(u):
    return [
        pl.BlockSpec((2, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# Teacher-forced log-amplitude kernel
# ---------------------------------------------------------------------------

def _make_log_amp_kernel(n_sites: int, u1: bool):
    def kernel(samples_ref, wx, wh, bx, bh, aw, ab, pw, pb, re_ref, im_ref):
        t = re_ref.shape[0]
        u = wh.shape[0]
        w = (wx[:], wh[:], bx[:], bh[:], aw[:], ab[:], pw[:], pb[:])

        def body(n, carry):
            h, x01, num_up, re, im = carry
            s = samples_ref[pl.ds(n, 1), :]
            s01 = jnp.swapaxes(s, 0, 1).astype(jnp.float32)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = jnp.full((t, 1), 0.0) + n.astype(jnp.float32)
            h_new, lp0, lp1, ph0, ph1 = _crnn_site(
                x01, x_scale, h, w, nf, num_up, n_sites, u1
            )
            re = re + 0.5 * jnp.where(s01 > 0.5, lp1, lp0)
            im = im + jnp.where(s01 > 0.5, ph1, ph0)
            return h_new, s01, num_up + s01, re, im

        h0 = jnp.zeros((t, u), jnp.float32)
        z = jnp.zeros((t, 1), jnp.float32)
        _, _, _, re, im = jax.lax.fori_loop(
            0, n_sites, body, (h0, z, z, z, z)
        )
        re_ref[:] = re
        im_ref[:] = im

    return kernel


def crnn_log_amp_parts(params, samples: jax.Array, u1: bool):
    """(B, N) int -> (Re log psi, Im log psi), each (B,) f32."""
    b, n = samples.shape
    (cell,) = params["rnn"]
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(b, 8), TILE)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    re, im = pl.pallas_call(
        _make_log_amp_kernel(n, u1),
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((n, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weight_specs(u),
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
    )(seq, *_weights(params))
    return re[:b, 0], im[:b, 0]


# ---------------------------------------------------------------------------
# Sampling kernel
# ---------------------------------------------------------------------------

def _make_sample_kernel(n_sites: int, u1: bool):
    def kernel(seed_ref, wx, wh, bx, bh, aw, ab, pw, pb, samples_ref, lp_ref):
        t = lp_ref.shape[0]
        u = wh.shape[0]
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        w = (wx[:], wh[:], bx[:], bh[:], aw[:], ab[:], pw[:], pb[:])

        def body(n, carry):
            h, x01, num_up, acc = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = jnp.full((t, 1), 0.0) + n.astype(jnp.float32)
            h_new, lp0, lp1, _, _ = _crnn_site(
                x01, x_scale, h, w, nf, num_up, n_sites, u1
            )
            bits = pltpu.prng_random_bits((t, 1))
            usig = jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.int32), 9
            )
            uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
            p0 = jnp.exp(lp0)
            s01 = jnp.where(uni >= p0, 1.0, 0.0)
            # clamp to the allowed class: the exp/log roundtrip can leave the
            # masked class a ~1e-7 sliver of probability (p0 = 1 - eps), and
            # a forbidden draw poisons every downstream gradient.  Masked
            # classes carry lp ~ LOG_ZERO, far below any legitimate
            # log-probability.
            s01 = jnp.where(lp1 < 0.5 * LOG_ZERO, 0.0, s01)
            s01 = jnp.where(lp0 < 0.5 * LOG_ZERO, 1.0, s01)
            acc = acc + jnp.where(s01 > 0.5, lp1, lp0)
            samples_ref[pl.ds(n, 1), :] = jnp.swapaxes(s01, 0, 1).astype(
                jnp.int32
            )
            return h_new, s01, num_up + s01, acc

        h0 = jnp.zeros((t, u), jnp.float32)
        z = jnp.zeros((t, 1), jnp.float32)
        _, _, _, acc = jax.lax.fori_loop(0, n_sites, body, (h0, z, z, z))
        lp_ref[:] = acc

    return kernel


def crnn_sample(params, seed: jax.Array, num_samples: int, n_sites: int, u1: bool):
    """Returns (samples (B, N) int32, log p (B,) f32) — log p is the sampling
    density log |psi|^2."""
    (cell,) = params["rnn"]
    u = cell["wh"].shape[0]
    b_pad = _round_up(max(num_samples, 8), TILE)

    samples, lp = pl.pallas_call(
        _make_sample_kernel(n_sites, u1),
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weight_specs(u),
        out_specs=(
            pl.BlockSpec((n_sites, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
    )(seed.reshape(1, 1).astype(jnp.int32), *_weights(params))
    return samples[:, :num_samples].T, lp[:num_samples, 0]


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def make_log_amp_parts_fn(jnp_log_amp_parts, u1: bool):
    """Pallas forward, jnp backward, for (Re, Im) log-amplitude parts."""

    @jax.custom_vjp
    def log_amp_parts(params, samples):
        return crnn_log_amp_parts(params, samples, u1)

    def fwd(params, samples):
        return crnn_log_amp_parts(params, samples, u1), (params, samples)

    def bwd(res, gs):
        params, samples = res
        _, vjp_fn = jax.vjp(lambda p: jnp_log_amp_parts(p, samples), params)
        (dparams,) = vjp_fn(gs)
        return dparams, None

    log_amp_parts.defvjp(fwd, bwd)
    return log_amp_parts
