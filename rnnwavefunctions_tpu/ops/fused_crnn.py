"""Pallas TPU kernels: fused complex-cRNN rollouts with U(1) masking.

Same VMEM-residency and feature-major design as ``fused_gru`` (whole site
loop in one kernel, (U, T) hidden with the batch on lanes, (1, T) rows, no
relayouts), extended for the two-head complex ansatz of
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

from .fused_gru import _round_up
from .seeding import TILE_SEED_STRIDE

TILE = 512
LOG_ZERO = -1e9


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _crnn_site_rows(x, x_scale, h, w, nf, num_up, n_sites, u1):
    """Feature-major per-site trunk+heads computation.

    ``h`` (U, T); ``x``/``num_up`` (1, T) rows; ``x_scale`` scalar or (1, T)
    row (0 where the input is the zero vector); ``nf`` scalar or (1, T) site
    index.  Returns (h_new (U, T), lp0, lp1, ph0, ph1) where lp_i = log of
    the masked, renormalized probability of class i (= 2 log ampl_i) and
    ph_i the phase.  All rows (1, T).
    """
    wxT, whT, bxT, bhT, awT, abT, pwT, pbT = w
    u = h.shape[0]
    gx = x_scale * ((1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]) + bxT
    gh = jnp.dot(whT, h, preferred_element_type=jnp.float32) + bhT
    r = jax.nn.sigmoid(gx[:u] + gh[:u])
    z = jax.nn.sigmoid(gx[u : 2 * u] + gh[u : 2 * u])
    c = jnp.tanh(gx[2 * u :] + r * gh[2 * u :])
    h_new = z * h + (1.0 - z) * c
    la = jnp.dot(awT, h_new, preferred_element_type=jnp.float32) + abT
    l0, l1 = la[0:1, :], la[1:2, :]
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

    pl_ = jnp.dot(pwT, h_new, preferred_element_type=jnp.float32) + pbT
    ph = jnp.pi * pl_ / (1.0 + jnp.abs(pl_))
    return h_new, lp0, lp1, ph[0:1, :], ph[1:2, :]


def _weightsT(params):
    (cell,) = params["rnn"]
    return (
        cell["wx"].T, cell["wh"].T,
        cell["bx"][:, None], cell["bh"][:, None],
        params["head_ampl"]["w"].T, params["head_ampl"]["b"][:, None],
        params["head_phase"]["w"].T, params["head_phase"]["b"][:, None],
    )


def _weightT_specs(u):
    return [
        pl.BlockSpec((3 * u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * u, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


# ---------------------------------------------------------------------------
# Teacher-forced log-amplitude kernel
# ---------------------------------------------------------------------------

def _make_log_amp_kernel(n_sites: int, u1: bool):
    def kernel(samples_ref, wxT, whT, bxT, bhT, awT, abT, pwT, pbT,
               re_ref, im_ref):
        t = samples_ref.shape[1]
        u = whT.shape[1]
        w = (wxT[:], whT[:], bxT[:], bhT[:], awT[:], abT[:], pwT[:], pbT[:])

        def body(n, carry):
            h, x, num_up, re, im = carry
            s = samples_ref[pl.ds(n, 1), :].astype(jnp.float32)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = n.astype(jnp.float32)
            h_new, lp0, lp1, ph0, ph1 = _crnn_site_rows(
                x, x_scale, h, w, nf, num_up, n_sites, u1
            )
            re = re + 0.5 * jnp.where(s > 0.5, lp1, lp0)
            im = im + jnp.where(s > 0.5, ph1, ph0)
            return h_new, s, num_up + s, re, im

        h0 = jnp.zeros((u, t), jnp.float32)
        z = jnp.zeros((1, t), jnp.float32)
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
        ] + _weightT_specs(u),
        out_specs=(
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
    )(seq, *_weightsT(params))
    return re[0, :b], im[0, :b]


# ---------------------------------------------------------------------------
# Sampling kernel
# ---------------------------------------------------------------------------

def _make_sample_kernel(n_sites: int, u1: bool):
    def kernel(seed_ref, wxT, whT, bxT, bhT, awT, abT, pwT, pbT,
               samples_ref, lp_ref):
        t = lp_ref.shape[1]
        u = whT.shape[1]
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE)
        w = (wxT[:], whT[:], bxT[:], bhT[:], awT[:], abT[:], pwT[:], pbT[:])

        def body(n, carry):
            h, x, num_up, acc = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = n.astype(jnp.float32)
            h_new, lp0, lp1, _, _ = _crnn_site_rows(
                x, x_scale, h, w, nf, num_up, n_sites, u1
            )
            bits = pltpu.prng_random_bits((1, t))
            usig = jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.int32), 9
            )
            uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
            p0 = jnp.exp(lp0)
            s = jnp.where(uni >= p0, 1.0, 0.0)
            # clamp to the allowed class: the exp/log roundtrip can leave the
            # masked class a ~1e-7 sliver of probability (p0 = 1 - eps), and
            # a forbidden draw poisons every downstream gradient.
            s = jnp.where(lp1 < 0.5 * LOG_ZERO, 0.0, s)
            s = jnp.where(lp0 < 0.5 * LOG_ZERO, 1.0, s)
            acc = acc + jnp.where(s > 0.5, lp1, lp0)
            samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
            return h_new, s, num_up + s, acc

        h0 = jnp.zeros((u, t), jnp.float32)
        z = jnp.zeros((1, t), jnp.float32)
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
    return samples[:, :num_samples].T, lp[0, :num_samples]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, jnp backward
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
