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

from .compsum import kadd, kfinal
from .fused_gru import _cap_tile, _round_up
from .seeding import TILE_SEED_STRIDE, seed_block

TILE = 512
LOG_ZERO = -1e9


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


def _crnn_site_rows(x, x_scale, h_cat, w, nf, num_up, n_sites, u1):
    """Feature-major per-site trunk+heads computation (stacked trunk).

    ``h_cat`` (L*U, T) concatenated per-layer hidden states; ``x``/``num_up``
    (1, T) rows; ``x_scale`` scalar or (1, T) row (0 where the input is the
    zero vector); ``nf`` scalar or (1, T) site index.  ``w`` is
    ``(cells, awT, abT, pwT, pbT)`` with ``cells`` a list of per-layer
    (wxT, whT, bxT, bhT).  Returns (h_new (L*U, T), lp0, lp1, ph0, ph1)
    where lp_i = log of the masked, renormalized probability of class i
    (= 2 log ampl_i) and ph_i the phase.  All rows (1, T).
    """
    from .fused_gru import _gru_layer_rows

    cells, awT, abT, pwT, pbT = w
    u = awT.shape[1]
    new_hs = []
    inp = None
    for l, (wxT, whT, bxT, bhT) in enumerate(cells):
        if l == 0:
            gx = x_scale * ((1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]) + bxT
        else:
            gx = jnp.dot(wxT, inp, preferred_element_type=jnp.float32) + bxT
        h_l = _gru_layer_rows(gx, h_cat[l * u : (l + 1) * u], whT, bhT)
        new_hs.append(h_l)
        inp = h_l
    h_new = new_hs[0] if len(cells) == 1 else jnp.concatenate(new_hs, axis=0)
    la = jnp.dot(awT, inp, preferred_element_type=jnp.float32) + abT
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

    pl_ = jnp.dot(pwT, inp, preferred_element_type=jnp.float32) + pbT
    ph = jnp.pi * pl_ / (1.0 + jnp.abs(pl_))
    return h_new, lp0, lp1, ph[0:1, :], ph[1:2, :]


def _weightsT(params):
    out = []
    for cell in params["rnn"]:
        out += [cell["wx"].T, cell["wh"].T,
                cell["bx"][:, None], cell["bh"][:, None]]
    out += [
        params["head_ampl"]["w"].T, params["head_ampl"]["b"][:, None],
        params["head_phase"]["w"].T, params["head_phase"]["b"][:, None],
    ]
    return tuple(out)


def _weightT_specs(u, num_layers=1):
    full = lambda a, b: pl.BlockSpec(
        (a, b), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    specs = []
    for l in range(num_layers):
        in_dim = 2 if l == 0 else u
        specs += [full(3 * u, in_dim), full(3 * u, u),
                  full(3 * u, 1), full(3 * u, 1)]
    specs += [full(2, u), full(2, 1), full(2, u), full(2, 1)]
    return specs


def _split_w(wrefs, num_layers):
    """Group flat kernel weight refs into the _crnn_site_rows ``w`` tuple."""
    cells = [
        tuple(r[:] for r in wrefs[4 * l : 4 * l + 4])
        for l in range(num_layers)
    ]
    awT, abT, pwT, pbT = (r[:] for r in wrefs[-4:])
    return (cells, awT, abT, pwT, pbT)


# ---------------------------------------------------------------------------
# Teacher-forced log-amplitude kernel
# ---------------------------------------------------------------------------

def _make_log_amp_kernel(n_sites: int, u1: bool, num_layers: int):
    def kernel(samples_ref, *rest):
        wrefs, (re_ref, im_ref) = rest[:-2], rest[-2:]
        t = samples_ref.shape[1]
        w = _split_w(wrefs, num_layers)
        u = w[1].shape[1]  # awT (2, U)

        def body(n, carry):
            h, x, num_up, re, rec, im, imc = carry
            s = samples_ref[pl.ds(n, 1), :].astype(jnp.float32)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = n.astype(jnp.float32)
            h_new, lp0, lp1, ph0, ph1 = _crnn_site_rows(
                x, x_scale, h, w, nf, num_up, n_sites, u1
            )
            re, rec = kadd(re, rec, 0.5 * jnp.where(s > 0.5, lp1, lp0))
            im, imc = kadd(im, imc, jnp.where(s > 0.5, ph1, ph0))
            return h_new, s, num_up + s, re, rec, im, imc

        h0 = jnp.zeros((num_layers * u, t), jnp.float32)
        z = jnp.zeros((1, t), jnp.float32)
        _, _, _, re, rec, im, imc = jax.lax.fori_loop(
            0, n_sites, body, (h0, z, z, z, z, z, z)
        )
        re_ref[:] = kfinal(re, rec)
        im_ref[:] = kfinal(im, imc)

    return kernel


def crnn_log_amp_parts(params, samples: jax.Array, u1: bool):
    """(B, N) int -> (Re log psi, Im log psi), each (B,) f32."""
    b, n = samples.shape
    num_layers = len(params["rnn"])
    u = params["rnn"][0]["wh"].shape[0]
    tile = _cap_tile(b)
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    re, im = pl.pallas_call(
        _make_log_amp_kernel(n, u1, num_layers),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(u, num_layers),
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
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

def _make_sample_kernel(n_sites: int, u1: bool, num_layers: int):
    def kernel(seed_ref, *rest):
        wrefs, (samples_ref, lp_ref) = rest[:-2], rest[-2:]
        t = lp_ref.shape[1]
        pltpu.prng_seed(
            seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE,
            seed_ref[0, 1],
        )
        w = _split_w(wrefs, num_layers)
        u = w[1].shape[1]

        def body(n, carry):
            h, x, num_up, acc, cmp = carry
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
            acc, cmp = kadd(acc, cmp, jnp.where(s > 0.5, lp1, lp0))
            samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
            return h_new, s, num_up + s, acc, cmp

        h0 = jnp.zeros((num_layers * u, t), jnp.float32)
        z = jnp.zeros((1, t), jnp.float32)
        _, _, _, acc, cmp = jax.lax.fori_loop(
            0, n_sites, body, (h0, z, z, z, z)
        )
        lp_ref[:] = kfinal(acc, cmp)

    return kernel


def crnn_sample(params, seed: jax.Array, num_samples: int, n_sites: int, u1: bool):
    """Returns (samples (B, N) int32, log p (B,) f32) — log p is the sampling
    density log |psi|^2."""
    num_layers = len(params["rnn"])
    u = params["rnn"][0]["wh"].shape[0]
    tile = _cap_tile(num_samples)
    b_pad = _round_up(max(num_samples, 8), tile)

    samples, lp = pl.pallas_call(
        _make_sample_kernel(n_sites, u1, num_layers),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weightT_specs(u, num_layers),
        out_specs=(
            pl.BlockSpec((n_sites, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
    )(seed_block(seed), *_weightsT(params))
    return samples[:, :num_samples].T, lp[0, :num_samples]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, fused Pallas (or fallback jnp) backward
# ---------------------------------------------------------------------------

def make_log_amp_parts_fn(jnp_log_amp_parts, u1: bool):
    """Pallas forward for (Re, Im) log-amplitude parts; fused Pallas BPTT
    backward when the trunk history fits VMEM (``ops/fused_crnn_bwd``),
    jnp backward beyond.

    Gradients are only defined for configurations inside the U(1) sector
    (Re log psi is the LOG_ZERO stand-in for -inf outside).  The two
    backends differ out of support — the fused kernel stays finite where
    the jnp VJP propagates NaN from the -inf forward — but the sampler
    never draws such configurations, so no training path evaluates them."""
    from . import fused_crnn_bwd, fused_gru_bwd

    @jax.custom_vjp
    def log_amp_parts(params, samples):
        return crnn_log_amp_parts(params, samples, u1)

    def fwd(params, samples):
        return crnn_log_amp_parts(params, samples, u1), (params, samples)

    def bwd(res, gs):
        params, samples = res
        units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
        n = samples.shape[1]
        if fused_gru_bwd.supports(n, units, heads=2):
            g_re, g_im = gs
            return (
                fused_crnn_bwd.crnn_log_amp_bwd(
                    params, samples, g_re, g_im, u1
                ),
                None,
            )
        _, vjp_fn = jax.vjp(lambda p: jnp_log_amp_parts(p, samples), params)
        (dparams,) = vjp_fn(gs)
        return dparams, None

    log_amp_parts.defvjp(fwd, bwd)
    return log_amp_parts
