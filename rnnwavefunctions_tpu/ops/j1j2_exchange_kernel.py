"""Pallas kernel: fused grouped-wavefront J1-J2 off-diagonal estimator (cRNN).

The generic path evaluates all 2N padded spin-exchange configurations per
sample as full sequences — the in-graph analogue of the reference's
``sigmas``/``J1J2Slices`` scratch flow
(``/root/reference/J1J2/TrainingRNN_J1J2.py:234-239,255-270``).  The same two
structural ideas as the TFIM flip kernel apply:

* **prefix sharing** — the exchange at bond (i, i+gap) leaves sites < i
  untouched, so only the suffix from site i (restarted from the stored base
  hidden state, with inputs/targets XOR-flipped at the two exchanged sites)
  is recomputed;
* **grouped wavefront** — suffixes advance GROUP bonds per iteration with a
  single fat feature-major matmul, each bond's column block initialized from
  the VMEM hidden/prefix history at its divergence site.

Physics handled in-kernel: anti-alignment gating (aligned bonds contribute
exactly 0, ``TrainingRNN_J1J2.py:70,85``), Marshall/J2 matrix elements baked
statically, U(1) masking inside every suffix with the exchanged up-counts,
and complex ratios as real pairs
``sum_k el_k exp(dRe_k) (cos dIm_k, sin dIm_k)``.

Periodic chains are handled too: the <= 3 wrap-around bonds diverge at
site 0/1 of the prefix order, so they run as full-length trajectories in
one extra shared wavefront block (~N/G extra iterations).

Long chains whose (N, L*U, T) hidden history exceeds VMEM spill it to HBM
exactly like the TFIM flip kernel: the base pass streams history rows out
through a 2-slot DMA ring, and every wavefront column initialization DMAs
one row back through a staging buffer.  Each bond family re-reads its
divergence rows, so the read traffic is ~3N rows/tile (NN + NNN + wraps) —
still negligible against the O(N^2) wavefront matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compsum import kadd, kfinal
from .fused_gru import _round_up
from .tfim_flip_kernel import (
    _MIN_TILE, _VMEM_BUDGET, _batch_cap, _hist_bytes, _norm_units, _round8,
)
from .fused_crnn import (
    LOG_ZERO, _crnn_site_rows, _split_w, _weightsT, _weightT_specs,
)
from .seeding import TILE_SEED_STRIDE, seed_block
from .spill import hist_out as _spill_hist_out
from .spill import make_hist_io, spill_bytes, spill_scratch, window_start

GROUP = 8
# Spilled (long-chain) kernels run the minimum 128-lane tile, where the
# cRNN's long dependent per-site chain (gates -> candidate -> two heads ->
# U(1) mask -> renormalize) leaves the wavefront latency-bound: doubling
# the group amortizes it (measured N=1000 S=64: G8 1077 ms/step, G16 802,
# G32 937).  Resident configs keep G=8 (wider tiles already saturate, and
# garbage columns cost G/N).
SPILL_GROUP = 16


def _resident_bytes(n: int, units, tile: int, group: int) -> int:
    """VMEM bytes excluding the hidden history and the spill machinery:
    samples + the three (N, T) prefix/up-count rows and the six wavefront
    blocks; sized with the group the kernel will actually run."""
    lu = _round8(sum(_norm_units(units)))
    rows = 4 * n  # samples (int32) + pfx_re + pfx_im + cup
    wf = lu * group + 7 * group  # + x, xv, up, re, im, rec, imc rows
    return (rows + wf) * tile * 4


def _spill_extra_bytes(n: int, units, tile: int, group: int) -> int:
    # worst case window: the bond-pair packed variant stages 2*group rows
    return spill_bytes(sum(_norm_units(units)), tile, 2 * group, n)


def _pick_tile(n: int, units, batch=None):
    """(tile, spill) for the exchange kernel's VMEM footprint; the tile is
    capped by the actual batch (padding columns are pure waste).  Each
    regime is accounted with its own wavefront group (8 resident, 16
    spilled), the spill regime including its ring/staging buffers."""
    cap = _batch_cap(batch)
    tile = cap
    while tile > _MIN_TILE and (
        _hist_bytes(n, units, tile) + _resident_bytes(n, units, tile, GROUP)
        > _VMEM_BUDGET
    ):
        tile //= 2
    if (
        _hist_bytes(n, units, tile) + _resident_bytes(n, units, tile, GROUP)
        <= _VMEM_BUDGET
    ):
        return tile, False
    tile = cap
    while tile > _MIN_TILE and (
        _resident_bytes(n, units, tile, SPILL_GROUP)
        + _spill_extra_bytes(n, units, tile, SPILL_GROUP)
        > _VMEM_BUDGET
    ):
        tile //= 2
    return tile, True


def supports(n: int, units) -> bool:
    """True when the exchange wavefront estimator applies; the spilled
    variant covers every chain whose non-history pieces (+ ring/staging)
    fit at the minimum tile (the resident case is a strict subset)."""
    return (
        _resident_bytes(n, units, _MIN_TILE, SPILL_GROUP)
        + _spill_extra_bytes(n, units, _MIN_TILE, SPILL_GROUP)
        <= _VMEM_BUDGET
    )


def _make_kernel(n_sites: int, u1: bool, el_nn: float, el_nnn: float,
                 has_nnn: bool, periodic: bool = False,
                 sample_mode: bool = False, num_layers: int = 1,
                 spill: bool = False, group: int = GROUP,
                 pack: bool = False, ablate: str = "full"):
    # a typo'd ablate value would silently drop bond families and return a
    # physically wrong energy — fail at trace time instead
    assert ablate in ("full", "no_wrap", "nn_only", "base_only"), ablate
    """``pack=True`` (small batches: 2*B <= tile, one grid program) runs the
    bond-pair lane packing: the base pass carries two copies of the batch in
    the tile's lane halves, so each wavefront column block serves the bond
    PAIR (2m, 2m+1) — halves initialize independently by lane-mask blends
    while the shared teacher-forcing advance is unchanged (the per-lane bond
    index of the target construction simply switches from block to half
    granularity).  Halves the wavefront iterations for the N=1000 S=64
    workload that otherwise computes 50% padding lanes."""
    nw = 4 * num_layers + 4

    def kernel(*refs):
        if sample_mode:
            seed_ref = refs[0]
            wrefs = refs[1 : 1 + nw]
            rest = refs[1 + nw :]
            pltpu.prng_seed(
                seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE,
                seed_ref[0, 1],
            )
        else:
            samples_ref = refs[0]              # (N, T) int32
            wrefs = refs[1 : 1 + nw]
            rest = refs[1 + nw :]
        if sample_mode:
            samples_ref = rest[0]
            rest = rest[1:]
        # h_hist sits at the same position whether it is a VMEM scratch
        # (resident) or the extra HBM output (spill).
        if spill:
            (eoff_re_ref, eoff_im_ref, lp_re_ref, lp_im_ref,
             h_hist, pfx_re, pfx_im, cup,
             wf_h, wf_x, wf_xv, wf_up, wf_re, wf_im, wf_rec, wf_imc,
             ring, staging, sem_wr, sem_rd) = rest
        else:
            (eoff_re_ref, eoff_im_ref,         # (1, T) f32
             lp_re_ref, lp_im_ref,             # (1, T) f32 base log-amp parts
             h_hist,                           # scratch (N, L*U, T)
             pfx_re, pfx_im,                   # scratch (N, T): prefixes
             cup,                              # scratch (N, T): up-counts
             wf_h,                             # scratch (L*U, GROUP*T)
             wf_x, wf_xv,                      # scratch (1, GROUP*T)
             wf_up,                            # scratch (1, GROUP*T)
             wf_re, wf_im,                     # scratch (1, GROUP*T)
             wf_rec, wf_imc,                   # scratch: Kahan pairs
             ) = rest
        t = eoff_re_ref.shape[1]
        w = _split_w(wrefs, num_layers)
        u = w[1].shape[1]  # awT (2, U)
        lu = num_layers * u
        zero_row = jnp.zeros((1, t), jnp.float32)

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)  # (1, T)

        fpg = (2 if pack else 1) * group  # bonds covered per group
        half = t // 2
        hist_write, hist_drain, stage, read_col, read_col_blk = make_hist_io(
            spill, h_hist, wf_h, n_sites, lu, t, fpg,
            *((ring, staging, sem_wr, sem_rd) if spill else ()),
        )
        if pack:
            upper = (
                jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) >= half
            )

        # ---- base pass
        def base_body(n, carry):
            h, x, num_up, re, rec, im, imc = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            nf = n.astype(jnp.float32)
            h_new, lp0, lp1, ph0, ph1 = _crnn_site_rows(
                x, x_scale, h, w, nf, num_up, n_sites, u1
            )
            if sample_mode:
                bits = pltpu.prng_random_bits((1, t))
                usig = jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.int32), 9
                )
                uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
                p0 = jnp.exp(lp0)
                s = jnp.where(uni >= p0, 1.0, 0.0)
                # clamp to the allowed class (see fused_crnn sample kernel)
                s = jnp.where(lp1 < 0.5 * LOG_ZERO, 0.0, s)
                s = jnp.where(lp0 < 0.5 * LOG_ZERO, 1.0, s)
                if pack:
                    # mirror the lower-half draws so the base pass stays
                    # half-duplicated
                    s = jnp.where(upper, pltpu.roll(s, half, axis=1), s)
                samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
            else:
                s = read_s(n)
            re, rec = kadd(re, rec, 0.5 * jnp.where(s > 0.5, lp1, lp0))
            im, imc = kadd(im, imc, jnp.where(s > 0.5, ph1, ph0))
            hist_write(n, h_new)
            # corrected running prefixes: wavefront accumulators re-base here
            pfx_re[pl.ds(n, 1), :] = kfinal(re, rec)
            pfx_im[pl.ds(n, 1), :] = kfinal(im, imc)
            cup[pl.ds(n, 1), :] = num_up
            return h_new, s, num_up + s, re, rec, im, imc

        h0 = jnp.zeros((lu, t), jnp.float32)
        _, _, _, bre, brec, bim, bimc = jax.lax.fori_loop(
            0, n_sites, base_body,
            (h0, zero_row, zero_row, zero_row, zero_row, zero_row, zero_row),
        )
        base_re = kfinal(bre, brec)
        base_im = kfinal(bim, bimc)
        hist_drain()
        lp_re_ref[:] = base_re
        lp_im_ref[:] = base_im

        # ---- grouped wavefront over bonds of one family (fixed gap) --------
        def family(gap, num_bonds, el, eoff_re, eoff_im):
            num_groups = -(-num_bonds // fpg)

            def ws(g):
                # bonds [g0, g0+fpg) read divergence rows [g0-1, g0+fpg-2]
                return window_start(g * fpg, -1, n_sites, fpg)

            def init_col(i, slot, start):
                """Bond i diverges at site i: state/prefix from before i.
                Packed: bond pair (2m, 2m+1) shares block m; halves blend in
                by lane mask (base-pass rows are half-duplicated)."""
                if pack:
                    k = (i % fpg) // 2
                    mask = upper == (i % 2 > 0)
                else:
                    k = i % group
                    mask = None
                sl = pl.ds(k * t, t)

                @pl.when(i > 0)
                def _():
                    read_col(jnp.maximum(i - 1, 0), k, slot, start, mask)

                @pl.when(i == 0)
                def _():
                    if pack:
                        wf_h[:, sl] = jnp.where(mask, 0.0, wf_h[:, sl])
                    else:
                        wf_h[:, sl] = jnp.zeros((lu, t), jnp.float32)

                def bset(ref, val):
                    if pack:
                        ref[:, sl] = jnp.where(mask, val, ref[:, sl])
                    else:
                        ref[:, sl] = val

                bset(wf_x, jnp.where(
                    i > 0, read_s(jnp.maximum(i - 1, 0)), 0.0
                ))
                bset(wf_xv, jnp.where(i > 0, 1.0, 0.0) + zero_row)
                bset(wf_up, cup[pl.ds(i, 1), :])
                bset(wf_re, jnp.where(
                    i > 0, pfx_re[pl.ds(jnp.maximum(i - 1, 0), 1), :], zero_row
                ))
                bset(wf_im, jnp.where(
                    i > 0, pfx_im[pl.ds(jnp.maximum(i - 1, 0), 1), :], zero_row
                ))
                bset(wf_rec, zero_row)
                bset(wf_imc, zero_row)

            def group_body(g, _):
                g0 = g * fpg
                slot = g % 2
                start = ws(g)
                if spill:
                    # wait this group's staged window; prefetch the next
                    stage(slot, start, False)

                    @pl.when(g + 1 < num_groups)
                    def _():
                        stage((g + 1) % 2, ws(g + 1), True)

                init_col(g0, slot, start)

                def site_body(n, _):
                    # bonds g0+1 .. g0+fpg-1 initialize as their site comes
                    @pl.when((n > g0) & (n < jnp.minimum(g0 + fpg, num_bonds)))
                    def _():
                        init_col(n, slot, start)

                    s_n = read_s(n)
                    # per-column targets: lane segment (block, or half under
                    # packing) serves bond i, flipped where n == i or
                    # n == i+gap (one vectorized compare via a lane-indexed
                    # iota instead of a group-long unrolled select chain)
                    i_lane = g0 + jax.lax.broadcasted_iota(
                        jnp.int32, (1, group * t), 1
                    ) // (half if pack else t)
                    flip = jnp.where(
                        (n == i_lane) | (n == i_lane + gap), 1.0, 0.0
                    )
                    s_n_t = jnp.concatenate([s_n] * group, axis=1)
                    tgt = jnp.abs(s_n_t - flip)             # (1, GROUP*T)
                    nf = n.astype(jnp.float32)
                    h_new, lp0, lp1, ph0, ph1 = _crnn_site_rows(
                        wf_x[:], wf_xv[:], wf_h[:], w, nf, wf_up[:],
                        n_sites, u1,
                    )
                    wf_h[:] = h_new
                    wf_x[:] = tgt
                    wf_xv[:] = jnp.ones_like(wf_xv)
                    wf_up[:] = wf_up[:] + tgt
                    re2, rec2 = kadd(
                        wf_re[:], wf_rec[:],
                        0.5 * jnp.where(tgt > 0.5, lp1, lp0),
                    )
                    im2, imc2 = kadd(
                        wf_im[:], wf_imc[:], jnp.where(tgt > 0.5, ph1, ph0)
                    )
                    wf_re[:] = re2
                    wf_rec[:] = rec2
                    wf_im[:] = im2
                    wf_imc[:] = imc2
                    return 0

                jax.lax.fori_loop(g0, n_sites, site_body, 0)

                for k in range(group):
                    if pack:
                        a = g0 + 2 * k

                        @pl.when(a < num_bonds)
                        def _(k=k, a=a):
                            sl = pl.ds(k * t, t)
                            b = a + 1
                            bc = jnp.minimum(b, num_bonds - 1)
                            anti_a = jnp.where(
                                read_s(a) != read_s(a + gap), 1.0, 0.0
                            )
                            anti_b = jnp.where(
                                read_s(bc) != read_s(bc + gap), 1.0, 0.0
                            )
                            anti = jnp.where(upper, anti_b, anti_a)
                            live = jnp.where(
                                upper,
                                jnp.where(b < num_bonds, 1.0, 0.0),
                                1.0,
                            )
                            # clamp the dead half before exp/cos (its acc is
                            # uninitialized garbage; 0 * inf/NaN stays NaN)
                            d_re = jnp.where(
                                live > 0,
                                kfinal(wf_re[:, sl], wf_rec[:, sl]) - base_re,
                                0.0,
                            )
                            d_im = jnp.where(
                                live > 0,
                                kfinal(wf_im[:, sl], wf_imc[:, sl]) - base_im,
                                0.0,
                            )
                            mag = anti * live * jnp.exp(d_re)
                            eoff_re_ref[:] = (
                                eoff_re_ref[:] + el * mag * jnp.cos(d_im)
                            )
                            eoff_im_ref[:] = (
                                eoff_im_ref[:] + el * mag * jnp.sin(d_im)
                            )
                    else:
                        i = g0 + k

                        @pl.when(i < num_bonds)
                        def _(k=k, i=i):
                            sl = pl.ds(k * t, t)
                            anti = jnp.where(
                                read_s(i) != read_s(i + gap), 1.0, 0.0
                            )
                            d_re = kfinal(wf_re[:, sl], wf_rec[:, sl]) - base_re
                            d_im = kfinal(wf_im[:, sl], wf_imc[:, sl]) - base_im
                            mag = anti * jnp.exp(d_re)
                            eoff_re_ref[:] = (
                                eoff_re_ref[:] + el * mag * jnp.cos(d_im)
                            )
                            eoff_im_ref[:] = (
                                eoff_im_ref[:] + el * mag * jnp.sin(d_im)
                            )

                return 0

            if spill:
                stage(0, ws(0), True)
            jax.lax.fori_loop(0, num_groups, group_body, 0)

        # ---- periodic wrap bonds: trajectories diverge at site 0/1, so each
        # is a full-length rollout; <= 3 of them share one wavefront block
        # (static per-column flip pairs, unused columns masked out).
        def wrap_family(bonds):
            def init_wcol(k, i):
                sl = pl.ds(k * t, t)
                if i > 0:
                    # <=3 static rows outside any staged window: blocking read
                    read_col_blk(i - 1, k)
                else:
                    wf_h[:, sl] = jnp.zeros((lu, t), jnp.float32)
                wf_x[:, sl] = jnp.where(
                    i > 0, read_s(max(i - 1, 0)), 0.0
                )
                wf_xv[:, sl] = (1.0 if i > 0 else 0.0) + zero_row
                wf_up[:, sl] = cup[pl.ds(i, 1), :]
                wf_re[:, sl] = (
                    pfx_re[pl.ds(max(i - 1, 0), 1), :] if i > 0 else zero_row
                )
                wf_im[:, sl] = (
                    pfx_im[pl.ds(max(i - 1, 0), 1), :] if i > 0 else zero_row
                )
                wf_rec[:, sl] = zero_row
                wf_imc[:, sl] = zero_row

            for k, (a, _, _) in enumerate(bonds):
                if a == 0:
                    init_wcol(k, 0)

            def site_body(n, _):
                for k, (a, _, _) in enumerate(bonds):
                    if a > 0:
                        @pl.when(n == a)
                        def _(k=k, a=a):
                            init_wcol(k, a)

                s_n = read_s(n)
                tgts = []
                for k in range(group):
                    if k < len(bonds):
                        a, bsite, _ = bonds[k]
                        flip = jnp.where((n == a) | (n == bsite), 1.0, 0.0)
                        tgts.append(jnp.abs(s_n - flip))
                    else:
                        tgts.append(s_n)
                tgt = jnp.concatenate(tgts, axis=1)
                nf = n.astype(jnp.float32)
                h_new, lp0, lp1, ph0, ph1 = _crnn_site_rows(
                    wf_x[:], wf_xv[:], wf_h[:], w, nf, wf_up[:],
                    n_sites, u1,
                )
                wf_h[:] = h_new
                wf_x[:] = tgt
                wf_xv[:] = jnp.ones_like(wf_xv)
                wf_up[:] = wf_up[:] + tgt
                re2, rec2 = kadd(
                    wf_re[:], wf_rec[:], 0.5 * jnp.where(tgt > 0.5, lp1, lp0)
                )
                im2, imc2 = kadd(
                    wf_im[:], wf_imc[:], jnp.where(tgt > 0.5, ph1, ph0)
                )
                wf_re[:] = re2
                wf_rec[:] = rec2
                wf_im[:] = im2
                wf_imc[:] = imc2
                return 0

            jax.lax.fori_loop(0, n_sites, site_body, 0)

            for k, (a, bsite, el) in enumerate(bonds):
                sl = pl.ds(k * t, t)
                anti = jnp.where(read_s(a) != read_s(bsite), 1.0, 0.0)
                d_re = kfinal(wf_re[:, sl], wf_rec[:, sl]) - base_re
                d_im = kfinal(wf_im[:, sl], wf_imc[:, sl]) - base_im
                mag = anti * jnp.exp(d_re)
                if pack:
                    # wrap blocks stay full-width (duplicated halves); count
                    # each bond once — the caller sums the lane halves
                    mag = jnp.where(upper, 0.0, mag)
                eoff_re_ref[:] = eoff_re_ref[:] + el * mag * jnp.cos(d_im)
                eoff_im_ref[:] = eoff_im_ref[:] + el * mag * jnp.sin(d_im)

        eoff_re_ref[:] = zero_row
        eoff_im_ref[:] = zero_row
        # ``ablate`` is a measurement-only knob (scripts/exp_j1j2_stage_
        # ablation.py): stage timing by dropping whole wavefront families.
        # Production callers always pass "full".
        if ablate != "base_only":
            family(1, n_sites - 1, el_nn, eoff_re_ref, eoff_im_ref)
        if has_nnn and ablate in ("full", "no_wrap"):
            family(2, n_sites - 2, el_nnn, eoff_re_ref, eoff_im_ref)
        if periodic and ablate == "full":
            bonds = [(0, n_sites - 1, el_nn)]
            if has_nnn:
                bonds += [(0, n_sites - 2, el_nnn), (1, n_sites - 1, el_nnn)]
            wrap_family(bonds)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("u1", "el_nn", "el_nnn", "has_nnn", "periodic",
                              "ablate")
)
def j1j2_exchange_offdiag(params, samples, *, u1: bool, el_nn: float,
                          el_nnn: float, has_nnn: bool,
                          periodic: bool = False, ablate: str = "full"):
    """(B, N) samples -> (eoff_re, eoff_im, lp_re, lp_im), each (B,).

    eoff = sum over valid NN/NNN exchanges of el * psi(sigma')/psi(sigma),
    as real/imag parts.  lp_* are the base log-amplitude parts (free).
    """
    b, n = samples.shape
    num_layers = len(params["rnn"])
    u = params["rnn"][0]["wh"].shape[0]
    units = (u,) * num_layers
    assert supports(n, units), (
        f"exchange wavefront unsupported for N={n}, units={units}: "
        "resident pieces exceed the VMEM budget (use the generic estimator)"
    )
    tile, spill = _pick_tile(n, units, b)
    group = SPILL_GROUP if spill else GROUP
    pack = 2 * max(b, 8) <= tile  # one grid program; halves pack bond pairs
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)
    if pack:
        seq = seq.at[:, tile // 2 : tile // 2 + b].set(samples.T)
    hist_specs, hist_shapes = _hist_out(
        n, units, tile, b_pad // tile, spill
    )

    outs = pl.pallas_call(
        _make_kernel(n, u1, el_nn, el_nnn, has_nnn, periodic,
                     num_layers=num_layers, spill=spill, group=group,
                     pack=pack, ablate=ablate),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(u, num_layers),
        out_specs=tuple(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(4)
        ) + tuple(hist_specs),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32) for _ in range(4)
        ) + tuple(hist_shapes),
        scratch_shapes=_scratch(n, num_layers * u, tile, spill, group, pack),
    )(seq, *_weightsT(params))
    eoff_re, eoff_im, lp_re, lp_im = outs[:4]
    if pack:
        h = tile // 2
        return (
            eoff_re[0, :b] + eoff_re[0, h : h + b],
            eoff_im[0, :b] + eoff_im[0, h : h + b],
            lp_re[0, :b], lp_im[0, :b],
        )
    return eoff_re[0, :b], eoff_im[0, :b], lp_re[0, :b], lp_im[0, :b]


def _hist_out(n, units, tile, num_tiles, spill):
    return _spill_hist_out(sum(_norm_units(units)), n, tile, num_tiles, spill)


def _scratch(n, lu, tile, spill=False, group=GROUP, pack=False):
    hist = [] if spill else [pltpu.VMEM((n, lu, tile), jnp.float32)]
    out = hist + [
        pltpu.VMEM((n, tile), jnp.float32),
        pltpu.VMEM((n, tile), jnp.float32),
        pltpu.VMEM((n, tile), jnp.float32),
        pltpu.VMEM((lu, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),  # wf_rec (Kahan pair)
        pltpu.VMEM((1, group * tile), jnp.float32),  # wf_imc (Kahan pair)
    ]
    if spill:
        out += spill_scratch(lu, tile, (2 if pack else 1) * group, n)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("num_samples", "n_sites", "u1", "el_nn", "el_nnn",
                     "has_nnn", "periodic"),
)
def j1j2_sample_and_exchange(params, seed, num_samples: int, n_sites: int, *,
                             u1: bool, el_nn: float, el_nnn: float,
                             has_nnn: bool, periodic: bool = False):
    """Fully fused: draw the U(1)-masked Monte-Carlo batch AND estimate the
    exchange off-diagonal sums in one kernel launch (the sampling rollout
    doubles as the base pass; the separate ``crnn_sample`` launch and its
    re-rollout disappear — the one-pass-per-step structure of
    ``TrainingRNN_J1J2.py:247-279`` without the host ping-pong).

    Returns (samples (B, N) int32, eoff_re, eoff_im, lp_re, lp_im), the lp_*
    being the base log-amplitude parts of the drawn samples.
    """
    num_layers = len(params["rnn"])
    u = params["rnn"][0]["wh"].shape[0]
    units = (u,) * num_layers
    assert supports(n_sites, units), (
        f"exchange wavefront unsupported for N={n_sites}, units={units}: "
        "resident pieces exceed the VMEM budget (use the generic estimator)"
    )
    tile, spill = _pick_tile(n_sites, units, num_samples)
    group = SPILL_GROUP if spill else GROUP
    pack = 2 * max(num_samples, 8) <= tile
    b_pad = _round_up(max(num_samples, 8), tile)
    hist_specs, hist_shapes = _hist_out(
        n_sites, units, tile, b_pad // tile, spill
    )

    outs = pl.pallas_call(
        _make_kernel(n_sites, u1, el_nn, el_nnn, has_nnn, periodic,
                     sample_mode=True, num_layers=num_layers, spill=spill,
                     group=group, pack=pack),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weightT_specs(u, num_layers),
        out_specs=(
            pl.BlockSpec((n_sites, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ) + tuple(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
            for _ in range(4)
        ) + tuple(hist_specs),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
        ) + tuple(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32) for _ in range(4)
        ) + tuple(hist_shapes),
        scratch_shapes=_scratch(n_sites, num_layers * u, tile, spill, group,
                                pack),
    )(seed_block(seed), *_weightsT(params))
    seq, eoff_re, eoff_im, lp_re, lp_im = outs[:5]
    b = num_samples
    if pack:
        h = tile // 2
        return (seq[:, :b].T,
                eoff_re[0, :b] + eoff_re[0, h : h + b],
                eoff_im[0, :b] + eoff_im[0, h : h + b],
                lp_re[0, :b], lp_im[0, :b])
    return (seq[:, :b].T, eoff_re[0, :b], eoff_im[0, :b],
            lp_re[0, :b], lp_im[0, :b])
