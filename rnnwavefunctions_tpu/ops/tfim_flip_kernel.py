"""Pallas kernel: fused triangular TFIM off-diagonal estimator.

For single-site-flip Hamiltonians (TFIM in any dimension with the pRNN/snake
ansatz) the generic estimator evaluates N+1 full sequences per sample —
O(N^2) site steps — after materializing an (S*(N+1), N) flip matrix in HBM
(the in-graph analogue of the reference's ``queue_samples`` scratch array,
``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:42-48,195``).

This kernel exploits autoregressive prefix sharing: flipping site i leaves
sites < i untouched, so

    log p(sigma^(i)) = P[i-1] + FL[i] + suffix_i

with P the base prefix log-prob sums, FL[i] the site-i conditional of the
*flipped* spin under the base hidden state, and only the suffix (sites > i,
restarted from the stored base hidden state with the flipped one-hot input)
recomputed.  Total work drops from N*(N+1) to ~N^2/2 site steps, and HBM
traffic to "read the S x N samples once" — no flip matrix exists at all.

Returns  sum_i exp(0.5 * (log p(sigma^(i)) - log p(sigma)))  per sample
(the pRNN amplitude-ratio sum of ``TrainingRNN_1DTFIM.py:74``) plus the base
log p as a by-product.  Everything (weights, hidden-state history, prefix
tables) stays VMEM-resident per batch tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import _gru_site_step, _logp_of, _round_up

FLIP_TILE = 256  # preferred batch rows per grid program
_MIN_TILE = 128  # Pallas TPU lane-dim block minimum
_VMEM_BUDGET = 10 * 1024 * 1024  # bytes for the (N, U, T) hidden history


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _hist_bytes(n: int, u: int, tile: int) -> int:
    # history is stored (N, U, T): U on the sublane dim (padded to 8),
    # the tile on the lane dim (exact 128-multiple) — no lane padding waste
    return n * _round8(u) * tile * 4


def _pick_tile(n: int, u: int) -> int:
    """Largest power-of-two tile (<= FLIP_TILE, >= 128) whose hidden-state
    history fits the VMEM budget."""
    tile = FLIP_TILE
    while tile > _MIN_TILE and _hist_bytes(n, u, tile) > _VMEM_BUDGET:
        tile //= 2
    return tile


def supports(n: int, u: int) -> bool:
    """True when the (N, U, MIN_TILE) hidden history fits VMEM — beyond that
    (N ~ 360 at 50 units) the generic batched estimator takes over."""
    return _hist_bytes(n, u, _MIN_TILE) <= _VMEM_BUDGET


def _tfim_flip_kernel(
    samples_ref,   # (N, T) int32
    wx_ref, wh_ref, bx_ref, bh_ref, hw_ref, hb_ref,
    eoff_ref,      # (T, 1) f32: sum_i exp(0.5 dlogp_i)
    lp_ref,        # (T, 1) f32: base log p
    h_hist,        # scratch (N, U, T): hidden AFTER site n's step
    pfx,           # scratch (N, T): prefix logp sums (inclusive)
    fl,            # scratch (N, T): site-n logp of the flipped target
):
    n_sites = samples_ref.shape[0]
    t = eoff_ref.shape[0]
    u = wh_ref.shape[0]
    wx, wh = wx_ref[:], wh_ref[:]
    bx, bh = bx_ref[:], bh_ref[:]
    hw, hb = hw_ref[:], hb_ref[:]

    # ---- base pass: store hidden history, prefix sums, flipped-site logps
    def base_body(n, carry):
        h, x01, acc = carry
        s = samples_ref[pl.ds(n, 1), :]                      # (1, T)
        s01 = jnp.swapaxes(s, 0, 1).astype(jnp.float32)      # (T, 1)
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        h_new, l0, l1 = _gru_site_step(x01, x_scale, h, wx, wh, bx, bh, hw, hb)
        acc = acc + _logp_of(l0, l1, s01)
        h_hist[pl.ds(n, 1)] = jnp.swapaxes(h_new, 0, 1)[None]
        pfx[pl.ds(n, 1), :] = jnp.swapaxes(acc, 0, 1)
        fl[pl.ds(n, 1), :] = jnp.swapaxes(_logp_of(l0, l1, 1.0 - s01), 0, 1)
        return h_new, s01, acc

    h0 = jnp.zeros((t, u), jnp.float32)
    x0 = jnp.zeros((t, 1), jnp.float32)
    acc0 = jnp.zeros((t, 1), jnp.float32)
    _, _, lp_base = jax.lax.fori_loop(0, n_sites, base_body, (h0, x0, acc0))
    lp_ref[:] = lp_base

    # ---- triangular flip pass
    def flip_body(i, eoff):
        # log p of the flipped config up to and including site i
        p_before = jnp.where(
            i > 0,
            jnp.swapaxes(pfx[pl.ds(jnp.maximum(i - 1, 0), 1), :], 0, 1),
            jnp.zeros((t, 1), jnp.float32),
        )
        acc = p_before + jnp.swapaxes(fl[pl.ds(i, 1), :], 0, 1)
        s_i = jnp.swapaxes(samples_ref[pl.ds(i, 1), :], 0, 1).astype(jnp.float32)
        x_flip = 1.0 - s_i
        h_i = jnp.swapaxes(h_hist[pl.ds(i, 1)][0], 0, 1)    # (T, U)

        def suffix_body(n, carry):
            h, x01, acc = carry
            s = jnp.swapaxes(samples_ref[pl.ds(n, 1), :], 0, 1).astype(
                jnp.float32
            )
            h_new, l0, l1 = _gru_site_step(
                x01, 1.0, h, wx, wh, bx, bh, hw, hb
            )
            acc = acc + _logp_of(l0, l1, s)
            return h_new, s, acc

        _, _, acc = jax.lax.fori_loop(
            i + 1, n_sites, suffix_body, (h_i, x_flip, acc)
        )
        return eoff + jnp.exp(0.5 * (acc - lp_base))

    eoff = jax.lax.fori_loop(
        0, n_sites, flip_body, jnp.zeros((t, 1), jnp.float32)
    )
    eoff_ref[:] = eoff


def tfim_flip_ratio_sum(params, samples: jax.Array):
    """(B, N) int samples -> (ratio_sum (B,), base_log_prob (B,)).

    ``ratio_sum[b] = sum_i psi(sigma_b with site i flipped) / psi(sigma_b)``
    for the single-layer pRNN (psi = sqrt p).
    """
    (cell,) = params["rnn"]
    head = params["head"]
    b, n = samples.shape
    u = cell["wh"].shape[0]
    tile = _pick_tile(n, u)
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    grid = (b_pad // tile,)
    eoff, lp = pl.pallas_call(
        _tfim_flip_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * u), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, u, tile), jnp.float32),
            pltpu.VMEM((n, tile), jnp.float32),
            pltpu.VMEM((n, tile), jnp.float32),
        ],
    )(
        seq,
        cell["wx"],
        cell["wh"],
        cell["bx"][None, :],
        cell["bh"][None, :],
        head["w"],
        head["b"][None, :],
    )
    return eoff[:b, 0], lp[:b, 0]
