"""Pallas kernel: fused triangular J1-J2 off-diagonal estimator (cRNN).

The generic path evaluates all 2N padded spin-exchange configurations per
sample as full sequences — the in-graph analogue of the reference's
``sigmas``/``J1J2Slices`` scratch flow
(``/root/reference/J1J2/TrainingRNN_J1J2.py:234-239,255-270``).  Autoregressive
prefix sharing applies exactly as for TFIM flips: the exchange at bond
(i, i+gap) leaves sites < i untouched, so only the suffix from site i
(restarted from the stored base hidden state, with inputs/targets XOR-flipped
at the two exchanged sites) is recomputed — ~N^2 site steps instead of 2N^2,
with no exchange-configuration matrix in HBM.

Physics handled in-kernel:
* anti-alignment gating (only bonds with sigma_i != sigma_{i+gap} connect,
  ``TrainingRNN_J1J2.py:70,85``) — aligned bonds contribute exactly 0;
* matrix elements -J1/2 (Marshall) / +J1/2 and +J2/2 baked in statically;
* U(1) masking inside every suffix with the exchanged up-counts (an exchange
  preserves magnetization, so only the window between the two flipped sites
  sees a count shift);
* complex ratios as real pairs:  sum_k el_k exp(dRe_k) (cos dIm_k, sin dIm_k).

Open-boundary only (periodic bonds wrap the prefix order; the generic
estimator remains the fallback there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import _round_up
from .tfim_flip_kernel import _pick_tile
from .fused_crnn import _crnn_site, _weights, _weight_specs

TILE = 256


def _make_kernel(n_sites: int, u1: bool, el_nn: float, el_nnn: float,
                 has_nnn: bool):
    def kernel(
        samples_ref,                       # (N, T) int32
        wx, wh, bx, bh, aw, ab, pw, pb,
        eoff_re_ref, eoff_im_ref,          # (T, 1) f32
        lp_re_ref, lp_im_ref,              # (T, 1) f32 base log-amp parts
        h_hist,                            # scratch (N, U, T)
        pfx_re, pfx_im,                    # scratch (N, T): inclusive prefixes
        cup,                               # scratch (N, T): ups before site n
    ):
        t = eoff_re_ref.shape[0]
        u = wh.shape[0]
        w = (wx[:], wh[:], bx[:], bh[:], aw[:], ab[:], pw[:], pb[:])

        def read_s(n):
            return jnp.swapaxes(samples_ref[pl.ds(n, 1), :], 0, 1).astype(
                jnp.float32
            )

        # ---- base pass
        def base_body(n, carry):
            h, x01, num_up, re, im = carry
            s01 = read_s(n)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = jnp.zeros((t, 1), jnp.float32) + n.astype(jnp.float32)
            h_new, lp0, lp1, ph0, ph1 = _crnn_site(
                x01, x_scale, h, w, nf, num_up, n_sites, u1
            )
            re = re + 0.5 * jnp.where(s01 > 0.5, lp1, lp0)
            im = im + jnp.where(s01 > 0.5, ph1, ph0)
            h_hist[pl.ds(n, 1)] = jnp.swapaxes(h_new, 0, 1)[None]
            pfx_re[pl.ds(n, 1), :] = jnp.swapaxes(re, 0, 1)
            pfx_im[pl.ds(n, 1), :] = jnp.swapaxes(im, 0, 1)
            cup[pl.ds(n, 1), :] = jnp.swapaxes(num_up, 0, 1)
            return h_new, s01, num_up + s01, re, im

        h0 = jnp.zeros((t, u), jnp.float32)
        z = jnp.zeros((t, 1), jnp.float32)
        _, _, _, base_re, base_im = jax.lax.fori_loop(
            0, n_sites, base_body, (h0, z, z, z, z)
        )
        lp_re_ref[:] = base_re
        lp_im_ref[:] = base_im

        def exchange_contrib(i, gap):
            """psi-ratio (Re, Im) of the exchange at (i, i+gap), gated by
            anti-alignment; the suffix re-runs sites i..N-1 from the stored
            pre-i hidden state with XOR-flipped inputs/targets at i, i+gap."""
            s_i = read_s(i)
            s_j = read_s(i + gap)
            anti = jnp.where(s_i != s_j, 1.0, 0.0)

            p_re = jnp.where(
                i > 0,
                jnp.swapaxes(pfx_re[pl.ds(jnp.maximum(i - 1, 0), 1), :], 0, 1),
                jnp.zeros((t, 1), jnp.float32),
            )
            p_im = jnp.where(
                i > 0,
                jnp.swapaxes(pfx_im[pl.ds(jnp.maximum(i - 1, 0), 1), :], 0, 1),
                jnp.zeros((t, 1), jnp.float32),
            )
            h_i_prev = jnp.where(
                i > 0,
                jnp.swapaxes(h_hist[pl.ds(jnp.maximum(i - 1, 0), 1)][0], 0, 1),
                0.0,
            )
            num_up0 = jnp.swapaxes(cup[pl.ds(i, 1), :], 0, 1)
            x_prev = jnp.where(i > 0, read_s(jnp.maximum(i - 1, 0)), 0.0)

            def suffix_body(n, carry):
                h, x01, num_up, re, im = carry
                s = read_s(n)
                flip = jnp.where(
                    (n == i) | (n == i + gap), 1.0, 0.0
                )
                tgt = jnp.abs(s - flip)  # XOR on {0,1}
                x_scale = jnp.where(n > 0, 1.0, 0.0)
                nf = jnp.zeros((t, 1), jnp.float32) + n.astype(jnp.float32)
                h_new, lp0, lp1, ph0, ph1 = _crnn_site(
                    x01, x_scale, h, w, nf, num_up, n_sites, u1
                )
                re = re + 0.5 * jnp.where(tgt > 0.5, lp1, lp0)
                im = im + jnp.where(tgt > 0.5, ph1, ph0)
                return h_new, tgt, num_up + tgt, re, im

            # run sites i .. N-1 starting from the stored pre-i state
            _, _, _, re, im = jax.lax.fori_loop(
                i, n_sites, suffix_body,
                (h_i_prev, x_prev, num_up0, p_re, p_im),
            )
            d_re = re - base_re
            d_im = im - base_im
            mag = anti * jnp.exp(d_re)
            return mag * jnp.cos(d_im), mag * jnp.sin(d_im)

        e_re = jnp.zeros((t, 1), jnp.float32)
        e_im = jnp.zeros((t, 1), jnp.float32)

        def nn_body(i, carry):
            e_re, e_im = carry
            c_re, c_im = exchange_contrib(i, 1)
            return e_re + el_nn * c_re, e_im + el_nn * c_im

        e_re, e_im = jax.lax.fori_loop(0, n_sites - 1, nn_body, (e_re, e_im))

        if has_nnn:
            def nnn_body(i, carry):
                e_re, e_im = carry
                c_re, c_im = exchange_contrib(i, 2)
                return e_re + el_nnn * c_re, e_im + el_nnn * c_im

            e_re, e_im = jax.lax.fori_loop(
                0, n_sites - 2, nnn_body, (e_re, e_im)
            )

        eoff_re_ref[:] = e_re
        eoff_im_ref[:] = e_im

    return kernel


@functools.partial(
    jax.jit, static_argnames=("u1", "el_nn", "el_nnn", "has_nnn")
)
def j1j2_exchange_offdiag(params, samples, *, u1: bool, el_nn: float,
                          el_nnn: float, has_nnn: bool):
    """(B, N) samples -> (eoff_re, eoff_im, lp_re, lp_im), each (B,).

    eoff = sum over valid NN/NNN exchanges of el * psi(sigma')/psi(sigma),
    as real/imag parts.  lp_* are the base log-amplitude parts (free).
    """
    b, n = samples.shape
    (cell,) = params["rnn"]
    u = cell["wh"].shape[0]
    tile = _pick_tile(n, u)
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    outs = pl.pallas_call(
        _make_kernel(n, u1, el_nn, el_nnn, has_nnn),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weight_specs(u),
        out_specs=tuple(
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32) for _ in range(4)
        ),
        scratch_shapes=[
            pltpu.VMEM((n, u, tile), jnp.float32),
            pltpu.VMEM((n, tile), jnp.float32),
            pltpu.VMEM((n, tile), jnp.float32),
            pltpu.VMEM((n, tile), jnp.float32),
        ],
    )(seq, *_weights(params))
    eoff_re, eoff_im, lp_re, lp_im = outs
    return eoff_re[:b, 0], eoff_im[:b, 0], lp_re[:b, 0], lp_im[:b, 0]
