"""Pallas TPU kernel: fused BPTT for the complex cRNN log-amplitude.

VJP of ``crnn_log_amp_parts(params, samples) -> (re, im)`` with per-sample
cotangents (g_re, g_im) — the complex surrogate loss's gradient path.  Same
shape as the GRU backward (forward replay stores the trunk history, reverse
sweep recomputes and accumulates weight cotangents in-register; both the
VMEM-resident and the HBM-chunk-streamed long-chain variants come from
``fused_gru_bwd.run_history_bptt``), plus the cRNN's two heads and the U(1)
masking chain:

* amplitude head: ``re`` accumulates ``0.5*lp_target`` with
  ``lp0 = -softplus(-d)``, ``lp1 = -softplus(d)``, ``d = l0 - l1``, so
  ``d lp0/dd = sigmoid(-d)`` and ``d lp1/dd = -sigmoid(d)``;
* U(1) renormalization (sites with 2n >= N): with raw ``p_i = exp(lp_i)``
  and ``norm2 = max(act_down*p0 + act_up*p1, 1e-30)``,

      dlp0_raw = dlp0*[act_down] - (dlp0+dlp1)*act_down*p0/norm2
      dlp1_raw = dlp1*[act_up]   - (dlp0+dlp1)*act_up*p1/norm2

  (gradient through the max passes only when unclamped); the heavyside
  activations depend on integer spin counts — data, not parameters — and
  the reverse sweep reconstructs the per-site up-count by walking the
  total backwards (``cnt_m = cnt_{m+1} - s_m``);
* phase head: ``im`` accumulates ``pi*softsign(pl_target)`` with
  ``d ph/d pl = pi/(1+|pl|)^2``.

Validated in interpret mode against ``jax.grad`` of the jnp reference path
(tests/test_fused_bwd.py); the jnp scan remains the implementation of
record (CLAUDE.md architecture invariants).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import _round_up
from .fused_gru_bwd import (
    _dotT_lhs, _dotT_rhs, _pick_chunk, _pick_tile, _rowsum,
    accumulate_grad_outputs, bptt_hist_out, bptt_scratch,
    gru_trunk_bwd_site, gru_trunk_fwd_site, run_history_bptt, supports,
)
from .fused_crnn import _split_w, _weightsT, _weightT_specs


def _make_bwd_kernel(n_sites: int, u1: bool, num_layers: int, chunk=None):
    nw = 4 * num_layers + 4

    def kernel(samples_ref, gre_ref, gim_ref, *rest):
        wrefs = rest[:nw]
        grefs = rest[nw : 2 * nw]
        aux = rest[2 * nw :]
        if chunk is None:
            (h_hist,) = aux
            spill = None
        else:
            h_hist, ring, sem_wr, sem_rd = aux
            spill = (chunk, ring, sem_wr, sem_rd)
        t = gre_ref.shape[1]
        w = _split_w(wrefs, num_layers)
        cells, awT, abT, pwT, pbT = w
        u = awT.shape[1]
        lu = num_layers * u

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        # ---- forward replay (trunk only) ---------------------------------
        def fwd_site(n, carry):
            hs, x_row = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            new_hs = gru_trunk_fwd_site(
                cells, u, num_layers, x_row, x_scale, hs
            )
            h_cat = (
                new_hs[0] if num_layers == 1
                else jnp.concatenate(new_hs, axis=0)
            )
            return h_cat, (new_hs, read_s(n))

        g_re = gre_ref[:]
        g_im = gim_ref[:]

        # ---- reverse sweep ---------------------------------------------
        def bwd_site(n, hist_n, hist_p, carry):
            dh_carry, cnt_after, accs = carry
            s_n = read_s(n)
            num_up = cnt_after - s_n  # ups among sites < n
            x_row = jnp.where(n > 0, read_s(jnp.maximum(n - 1, 0)), 0.0)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            inp = hist_n[(num_layers - 1) * u :]

            # amplitude head backward
            la = jnp.dot(awT, inp, preferred_element_type=jnp.float32) + abT
            d = la[0:1] - la[1:2]
            p0r = jax.nn.sigmoid(d)
            p1r = jax.nn.sigmoid(-d)
            glp = 0.5 * g_re
            dlp0 = glp * (1.0 - s_n)
            dlp1 = glp * s_n
            if u1:
                nf = jnp.asarray(n).astype(jnp.float32)
                baseline = jnp.float32(n_sites // 2 - 1)
                num_down = nf - num_up
                act_up = jnp.where(baseline - num_up >= 0, 1.0, 0.0)
                act_down = jnp.where(baseline - num_down >= 0, 1.0, 0.0)
                raw = act_down * p0r + act_up * p1r
                norm2 = jnp.maximum(raw, 1e-30)
                clamp = jnp.where(raw > 1e-30, 1.0, 0.0)
                gsum = (dlp0 + dlp1) * clamp / norm2
                m0 = dlp0 * act_down - gsum * act_down * p0r
                m1 = dlp1 * act_up - gsum * act_up * p1r
                active = jnp.where(2 * n >= n_sites, 1.0, 0.0)
                dlp0 = jnp.where(active > 0, m0, dlp0)
                dlp1 = jnp.where(active > 0, m1, dlp1)
            dd = dlp0 * p1r - dlp1 * p0r
            dla = jnp.concatenate([dd, -dd], axis=0)        # (2, T)
            d_top = (awT[0:1] - awT[1:2]).T * dd            # (U, T)

            # phase head backward
            pl_ = jnp.dot(pwT, inp, preferred_element_type=jnp.float32) + pbT
            dph0 = g_im * (1.0 - s_n)
            dph1 = g_im * s_n
            denom0 = 1.0 + jnp.abs(pl_[0:1])
            denom1 = 1.0 + jnp.abs(pl_[1:2])
            dpl = jnp.concatenate(
                [dph0 * jnp.pi / (denom0 * denom0),
                 dph1 * jnp.pi / (denom1 * denom1)], axis=0)  # (2, T)
            d_top = d_top + _dotT_lhs(pwT, dpl)

            new_accs = list(accs)
            new_accs[nw - 4] = accs[nw - 4] + _dotT_rhs(dla, inp)
            new_accs[nw - 3] = accs[nw - 3] + _rowsum(dla)
            new_accs[nw - 2] = accs[nw - 2] + _dotT_rhs(dpl, inp)
            new_accs[nw - 1] = accs[nw - 1] + _rowsum(dpl)

            dh_cat = gru_trunk_bwd_site(
                cells, u, num_layers, x_row, x_scale,
                hist_n, hist_p, d_top, dh_carry, new_accs,
            )
            return dh_cat, num_up, tuple(new_accs)

        hs0 = tuple(jnp.zeros((u, t), jnp.float32) for _ in range(num_layers))
        zero_row = jnp.zeros((1, t), jnp.float32)
        fwd0 = (hs0, zero_row)

        # The reverse sweep's up-count walk starts from the configuration's
        # total (cnt_m = cnt_{m+1} - s_m); the samples block is resident, so
        # the total is one cheap pass over it.
        def count_body(n, acc):
            return acc + read_s(n)
        total_up = jax.lax.fori_loop(0, n_sites, count_body, zero_row)

        accs0 = tuple(jnp.zeros_like(r[:]) for r in wrefs)
        bwd0 = (jnp.zeros((lu, t), jnp.float32), total_up, accs0)
        _, _, accs = run_history_bptt(
            n_sites, lu, fwd_site, fwd0, bwd_site, bwd0, h_hist, spill
        )
        accumulate_grad_outputs(grefs, accs)

    return kernel


def crnn_log_amp_bwd(params, samples: jax.Array, g_re: jax.Array,
                     g_im: jax.Array, u1: bool):
    """VJP of ``crnn_log_amp_parts`` w.r.t. params."""
    num_layers = len(params["rnn"])
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    assert supports(n, units, heads=2), (
        f"fused cRNN BPTT unsupported for N={n}, units={units} "
        "(resident pieces exceed the VMEM budget)"
    )
    tile, spill = _pick_tile(n, units, b, heads=2)
    chunk = _pick_chunk(n, units, tile, heads=2) if spill else None
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)
    gre = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(g_re)
    gim = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(g_im)

    wspecs = _weightT_specs(u, num_layers)
    out_specs = tuple(
        pl.BlockSpec(s.block_shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in wspecs
    )
    out_shapes = tuple(
        jax.ShapeDtypeStruct(s.block_shape, jnp.float32) for s in wspecs
    )
    hist_specs, hist_shapes = bptt_hist_out(
        n, num_layers * u, tile, b_pad // tile, chunk
    )

    outs = pl.pallas_call(
        _make_bwd_kernel(n, u1, num_layers, chunk),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=out_specs + tuple(hist_specs),
        out_shape=out_shapes + tuple(hist_shapes),
        scratch_shapes=bptt_scratch(n, num_layers * u, tile, chunk),
    )(seq, gre, gim, *_weightsT(params))

    rnn = []
    for l in range(num_layers):
        dwxT, dwhT, dbxT, dbhT = outs[4 * l : 4 * l + 4]
        rnn.append({
            "wx": dwxT.T, "wh": dwhT.T,
            "bx": dbxT[:, 0], "bh": dbhT[:, 0],
        })
    dawT, dabT, dpwT, dpbT = outs[4 * num_layers : 4 * num_layers + 4]
    return {
        "rnn": rnn,
        "head_ampl": {"w": dawT.T, "b": dabT[:, 0]},
        "head_phase": {"w": dpwT.T, "b": dpbT[:, 0]},
    }
