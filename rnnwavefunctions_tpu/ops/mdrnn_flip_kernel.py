"""Pallas kernel: fused grouped-wavefront TFIM flip estimator for the 2D
MDRNN wavefunction.

The generic estimator evaluates Nx*Ny+1 full boustrophedon sweeps per sample
(the reference queues every single-spin flip through ``log_probability``,
``/root/reference/2DTFIM_2DRNN/Training2DRNN_2DTFIM.py:54-75``).  The same
prefix-sharing + grouped-wavefront structure as the 1D kernels applies in
*visit order* (the MDRNN is autoregressive in the boustrophedon ordering):
flipping the spin at visit position f leaves all conditionals at positions
< f untouched, so only the suffix from f is recomputed, G flips at a time.

Key structural fact: the MDRNN cell output is simultaneously the horizontal
state for the next visit position and the vertical state for the site below
(``MDRNNcell.py:62-66``), so the whole base pass is captured by ONE
per-position cell-output history.  Each wavefront trajectory additionally
carries a rolling row buffer of its own recomputed states; the vertical
state at position m selects between that buffer (source position diverged,
``vis_up(m) >= f``) and the shared base history (prefix, unchanged).
Vertical *inputs* are pure functions of the (XOR-flipped) samples.

Unlike the 1D kernels, the 2D wavefront re-reads the base history at every
site (the vertical prefix state lives one lattice row up), so the
HBM-spilled variant (lattices beyond VMEM reach — 20x20+) keeps a 3-slot
circular window of lattice-row chunks in VMEM: the base pass writes rows
into the window and streams completed rows out (write of row r waited when
its slot is reclaimed at row r+3), and each wavefront group stages its
starting rows then prefetches row yy+1 while sweeping row yy — every
history access (vertical state, column init) stays within the resident
window {yy-1, yy, (yy+1 in flight)}.  Traffic is one extra history
read-back per group (~NS*NY/G rows per tile), trivially hidden under the
O(NS^2/G) wavefront matmuls.

Small batches (2B <= tile) additionally run the flip-pair lane packing of
the 1D kernels (``_pack_for``): the base pass carries two copies of the
batch in the tile's lane halves and each wavefront column block serves the
flip pair (2m, 2m+1), halving the serial advances a 64-sample batch would
otherwise spend on padding lanes.

Inputs/outputs are in visit order: callers pre-permute the (B, Nx, Ny)
lattice samples with the boustrophedon index map (see
``mdrnn_flip_ratio_sum``).  Returns the flip-ratio sums
``sum_f psi(sigma^(f))/psi(sigma)`` (psi = sqrt p) and the base log-probs.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compsum import kadd, kfinal
from .fused_gru import _logp_rows, _round_up
from .fused_mdrnn import _mdrnn_site_rows, _mdrnn_weightsT, _mdrnn_weightT_specs
from .seeding import TILE_SEED_STRIDE, seed_block
from . import tiling
from .tiling import MIN_TILE as _MIN_TILE
from .tiling import round8 as _round8

GROUP = 8
# The 2D wavefront's serial site-advance has the same fixed-latency floor
# as the 1D kernels (ops/tfim_flip_kernel.py): narrow tiles widen the group
# to keep each advance serving ~4k lanes, capped so the dead-column
# overhead (~G/NS) stays small on tiny lattices.  Measured at 24x24 S=128
# t128: g8 66.5 -> g32 76.4 steps/s (+15%); 16x16 S=500 t256: g8 126 ->
# g16 132 (+5%); 6x6 (NS=36, the cap binding): g8 2083 > g16 1981.
_WAVEFRONT_LANES = 4 * 1024
_WIN = 3  # circular lattice-row window slots (spill variant)
# Joint budget for the cell-output history + per-trajectory row buffer.
# The kernel-bearing jits forward a 64 MiB scoped-VMEM limit
# (``ops/tiling.py``); 48 MiB (16 MiB co-residency headroom, same margin as
# the TFIM kernels) keeps the history VMEM-resident through 32x32 at 50
# units — measured +8% over the row-window spill at 24x24 S=128 (66.9 vs
# 62.0 steps/s); the spill remains the beyond-budget fallback.
_VMEM_BUDGET = 48 * 1024 * 1024



def _group_for(tile: int, u: int, ns: int) -> int:
    """Wavefront group for a (tile, units, lattice-size) triple: the
    latency-scaling policy above."""
    if tiling.force_base_group() or _round8(u) >= 128:
        return GROUP
    g = max(GROUP, _WAVEFRONT_LANES // tile)
    return max(GROUP, min(g, _round8(max(ns // 8, 1))))


def _base_bytes(nx: int, ny: int, u: int, tile: int, group: int) -> int:
    """Non-history pieces: samples + pfx rows, the per-trajectory row
    buffer, and the wavefront blocks — sized with the group the kernel
    will actually run (callers pass it explicitly; an implicit
    ``_group_for`` fallback would silently track the test-forcing flag)."""
    ns = nx * ny
    up = _round8(u)
    rows = 2 * ns * tile * 4                      # samples (int32) + pfx
    rowbuf = nx * up * group * tile * 4
    wf = (up + 3) * group * tile * 4              # + wf_x, wf_acc, wf_cmp
    return rows + rowbuf + wf


def _hist_bytes(nx: int, ny: int, u: int, tile: int) -> int:
    return nx * ny * _round8(u) * tile * 4


def _win_bytes(nx: int, u: int, tile: int) -> int:
    return _WIN * nx * _round8(u) * tile * 4


def _candidate_groups(tile: int, u: int, ns: int):
    """Latency-scaled group first, stepping down toward the base GROUP via
    3g/4 then g/2 (nothing requires a power-of-two group; lanes stay
    128-multiples for any multiple-of-8 group) — the per-trajectory row
    buffer scales with the group, so a wide group that blows the budget
    degrades gracefully instead of forcing a spill.  Measured at 48x48
    S=64 spilled (the g32 rowbuf misses the budget): g24 15.3 vs g16 14.6
    steps/s full step."""
    g = _group_for(tile, u, ns)
    out = []
    while True:
        out.append(g)
        if g <= GROUP:
            return out
        q = 3 * g // 4
        if q > GROUP and q % 8 == 0:
            out.append(q)
        g = max(GROUP, g // 2)


def _pick(nx: int, ny: int, u: int, batch=None):
    """(tile, spill, group): widest tile, then the widest latency-scaled
    group, whose history (resident) or row window (spilled) plus base
    pieces fit the VMEM budget."""
    from .tfim_flip_kernel import _batch_cap

    cap = min(256, _batch_cap(batch))
    ns = nx * ny
    tile = cap
    while True:
        for g in _candidate_groups(tile, u, ns):
            if (
                _hist_bytes(nx, ny, u, tile)
                + _base_bytes(nx, ny, u, tile, g)
                <= _VMEM_BUDGET
            ):
                return tile, False, g
        if tile <= _MIN_TILE:
            break
        tile //= 2
    tile = cap
    while True:
        for g in _candidate_groups(tile, u, ns):
            if (
                _win_bytes(nx, u, tile) + _base_bytes(nx, ny, u, tile, g)
                <= _VMEM_BUDGET
            ):
                return tile, True, g
        if tile <= _MIN_TILE:
            break
        tile //= 2
    return _MIN_TILE, True, GROUP


def _pick_tile(nx: int, ny: int, u: int, batch=None):
    """(tile, spill) — see ``_pick`` (kept as the stable test surface)."""
    tile, spill, _ = _pick(nx, ny, u, batch)
    return tile, spill


def supports(nx: int, ny: int, u: int) -> bool:
    """Wavefront reach: resident or row-window spilled.  (An earlier
    >=25-site crossover gate reflected the pre-vectorization select chain;
    with lane-indexed iota selects the wavefront wins even at 4x4 — 2333 vs
    1855 steps/s at 50 units, S=500.)  Lattices with a single row or column
    have no vertical/horizontal neighbor structure worth the wavefront;
    they fall back."""
    return (
        nx >= 2
        and ny >= 2
        and _win_bytes(nx, u, _MIN_TILE)
        + _base_bytes(nx, ny, u, _MIN_TILE, GROUP)
        <= _VMEM_BUDGET
    )


def visit_order(nx: int, ny: int):
    """Boustrophedon (visit-order) lattice coordinates: arrays (NS,) of x, y."""
    yy = np.repeat(np.arange(ny), nx)
    kk = np.tile(np.arange(nx), ny)
    xx = np.where(yy % 2 == 0, kk, nx - 1 - kk)
    return xx, yy


def _pack_for(b, tile: int) -> bool:
    """Flip-pair lane packing (same policy as the 1D kernels,
    ``tfim_flip_kernel``): when the batch fills at most half the 128-lane
    minimum tile (2B <= tile, one grid program), the base pass carries two
    copies of the batch in the tile's lane halves and every wavefront
    column block serves the flip PAIR (2m, 2m+1) — halving the serial
    wavefront advances that otherwise compute 50% padding lanes."""
    return b is not None and 2 * max(b, 8) <= tile


def _make_kernel(nx: int, ny: int, sample_mode: bool = False,
                 spill: bool = False, group: int = GROUP,
                 pack: bool = False):
    ns = nx * ny
    fpg = (2 if pack else 1) * group  # flips covered per wavefront group

    def kernel(*refs):
        if sample_mode:
            seed_ref = refs[0]
            uhT, uvT, whT, wvT, bT, hwT, hbT = refs[1:8]
            rest = refs[8:]
            pltpu.prng_seed(
                seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE,
                seed_ref[0, 1],
            )
            samples_ref = rest[0]
            rest = rest[1:]
        else:
            samples_ref = refs[0]
            uhT, uvT, whT, wvT, bT, hwT, hbT = refs[1:8]
            rest = refs[8:]
        if spill:
            (eoff_ref, lp_ref, h_hist,
             pfx, rowwin, rowbuf, wf_h, wf_x, wf_acc, wf_cmp,
             sem_wr, sem_rd) = rest
        else:
            (eoff_ref, lp_ref,
             cell_hist, pfx, rowbuf, wf_h, wf_x, wf_acc, wf_cmp) = rest
        t = eoff_ref.shape[1]
        u = whT.shape[0]
        w = (uhT[:], uvT[:], whT[:], wvT[:], bT[:], hwT[:], hbT[:])
        zero_row = jnp.zeros((1, t), jnp.float32)
        tid = pl.program_id(0)
        half = t // 2
        if pack:
            upper = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) >= half

        def read_s(m):
            return samples_ref[pl.ds(m, 1), :].astype(jnp.float32)  # (1, T)

        def coords(m):
            yy = m // nx
            k = m % nx
            even = yy % 2 == 0
            xx = jnp.where(even, k, nx - 1 - k)
            vis_up = (yy - 1) * nx + jnp.where(even, nx - 1 - xx, xx)
            return yy, k, xx, vis_up

        # ---- history placement ------------------------------------------
        if spill:
            def row_dma(yy, sem):
                slot = (yy % _WIN) * nx
                return pltpu.make_async_copy(
                    rowwin.at[pl.ds(slot, nx)],
                    h_hist.at[tid, yy],
                    sem.at[yy % _WIN],
                ) if sem is sem_wr else pltpu.make_async_copy(
                    h_hist.at[tid, yy],
                    rowwin.at[pl.ds(slot, nx)],
                    sem.at[yy % _WIN],
                )

            def hist_write(m, yy, off, h_new):
                @pl.when((off == 0) & (yy >= _WIN))
                def _():
                    row_dma(yy - _WIN, sem_wr).wait()

                rowwin[pl.ds((yy % _WIN) * nx + off, 1), 0:u, :] = h_new[None]

                @pl.when(off == nx - 1)
                def _():
                    row_dma(yy, sem_wr).start()

            def base_drain():
                for d in range(min(_WIN, ny)):
                    row_dma(ny - 1 - d, sem_wr).wait()

            def hist_read(pos):
                """History row at visit position ``pos`` — must lie in the
                resident window {row-1, row} of the current sweep."""
                yy = pos // nx
                off = pos % nx
                return rowwin[pl.ds((yy % _WIN) * nx + off, 1)][0][0:u, :]
        else:
            def hist_write(m, yy, off, h_new):
                cell_hist[pl.ds(m, 1)] = h_new[None]

            def base_drain():
                pass

            def hist_read(pos):
                return cell_hist[pl.ds(pos, 1)][0]

        # ---- base pass (visit order) ------------------------------------
        def base_body(m, carry):
            h_h, x_h, acc, cmp = carry
            yy, k, xx, vis_up = coords(m)
            sh = jnp.where(k > 0, 1.0, 0.0)
            sv = jnp.where(yy > 0, 1.0, 0.0)
            h_h = jnp.where(k > 0, h_h, 0.0)
            x_h = jnp.where(k > 0, x_h, 0.0)
            h_v = jnp.where(
                yy > 0, hist_read(jnp.maximum(vis_up, 0)), 0.0
            )
            x_v = jnp.where(yy > 0, read_s(jnp.maximum(vis_up, 0)), 0.0)
            h_new, l0, l1 = _mdrnn_site_rows(x_h, sh, x_v, sv, h_h, h_v, w)
            if sample_mode:
                p0 = jax.nn.sigmoid(l0 - l1)
                bits = pltpu.prng_random_bits((1, t))
                usig = jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.int32), 9
                )
                uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
                s = jnp.where(uni >= p0, 1.0, 0.0)
                if pack:
                    # mirror the lower-half draws so both lane halves carry
                    # the same batch (teacher-forced inputs arrive
                    # pre-duplicated; drawn ones are mirrored here)
                    s = jnp.where(upper, pltpu.roll(s, half, axis=1), s)
                samples_ref[pl.ds(m, 1), :] = s.astype(jnp.int32)
            else:
                s = read_s(m)
            acc, cmp = kadd(acc, cmp, _logp_rows(l0, l1, s))
            hist_write(m, yy, k, h_new)
            # corrected running prefix: wavefront accumulators re-base here
            pfx[pl.ds(m, 1), :] = kfinal(acc, cmp)
            return h_new, s, acc, cmp

        h0 = jnp.zeros((u, t), jnp.float32)
        _, _, lp_acc, lp_cmp = jax.lax.fori_loop(
            0, ns, base_body, (h0, zero_row, zero_row, zero_row)
        )
        lp_base = kfinal(lp_acc, lp_cmp)
        base_drain()
        lp_ref[:] = lp_base

        # ---- grouped wavefront over flips (flip index f = visit position) --
        num_groups = -(-ns // fpg)

        def init_col(f):
            """Flip f's suffix starts AT position f (flipped target there).
            Packed: flip pair (2m, 2m+1) shares column block m; the half
            being initialized is blended in by lane mask (base-pass rows
            are half-duplicated, so both halves of every source already
            carry f's values)."""
            if pack:
                k = (f % fpg) // 2
                mask = upper == (f % 2 > 0)            # bool (1, T)
            else:
                k = f % group
            sl = pl.ds(k * t, t)
            _, kf, _, _ = coords(f)
            h_new = jnp.where(
                kf > 0, hist_read(jnp.maximum(f - 1, 0)), 0.0
            )
            x_new = jnp.where(
                kf > 0, read_s(jnp.maximum(f - 1, 0)), 0.0
            )
            acc_new = jnp.where(
                f > 0, pfx[pl.ds(jnp.maximum(f - 1, 0), 1), :], zero_row
            )
            if pack:
                wf_h[:, sl] = jnp.where(mask, h_new, wf_h[:, sl])
                wf_x[:, sl] = jnp.where(mask, x_new, wf_x[:, sl])
                wf_acc[:, sl] = jnp.where(mask, acc_new, wf_acc[:, sl])
                wf_cmp[:, sl] = jnp.where(mask, 0.0, wf_cmp[:, sl])
            else:
                wf_h[:, sl] = h_new
                wf_x[:, sl] = x_new
                wf_acc[:, sl] = acc_new
                wf_cmp[:, sl] = zero_row

        def group_body(g, _):
            g0 = g * fpg
            if spill:
                # stage the group's starting rows, prefetch the next one
                yy0 = g0 // nx

                @pl.when(yy0 >= 1)
                def _():
                    row_dma(yy0 - 1, sem_rd).start()

                row_dma(yy0, sem_rd).start()

                @pl.when(yy0 >= 1)
                def _():
                    row_dma(yy0 - 1, sem_rd).wait()

                row_dma(yy0, sem_rd).wait()

                @pl.when(yy0 + 1 < ny)
                def _():
                    row_dma(yy0 + 1, sem_rd).start()

            init_col(g0)

            def site_body(m, _):
                yy, k, xx, vis_up = coords(m)
                if spill:
                    # row boundary: the prefetched chunk becomes current;
                    # start the next one
                    @pl.when((k == 0) & (m > g0))
                    def _():
                        row_dma(yy, sem_rd).wait()

                        @pl.when(yy + 1 < ny)
                        def _():
                            row_dma(yy + 1, sem_rd).start()

                @pl.when((m > g0) & (m < jnp.minimum(g0 + fpg, ns)))
                def _():
                    init_col(m)

                sh = jnp.where(k > 0, 1.0, 0.0)
                sv = jnp.where(yy > 0, 1.0, 0.0)
                s_m = read_s(m)
                s_up = jnp.where(yy > 0, read_s(jnp.maximum(vis_up, 0)), 0.0)
                h_v_base = jnp.where(
                    yy > 0,
                    hist_read(jnp.maximum(vis_up, 0)),
                    0.0,
                )                                             # (U, T)
                h_v_wf = rowbuf[pl.ds(xx, 1)][0]              # (U, G*T)

                # per-column flip index as a lane-indexed iota: column block
                # k serves flip f = g0 + k (packed: the pair g0 + 2k + half),
                # so one vectorized compare per quantity replaces a
                # group-long unrolled select chain
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, group * t), 1
                )
                if pack:
                    f_lane = g0 + 2 * (lane // t) + jnp.where(
                        lane % t >= half, 1, 0
                    )                                         # (1, G*T)
                else:
                    f_lane = g0 + lane // t                   # (1, G*T)
                s_m_t = jnp.concatenate([s_m] * group, axis=1)
                s_up_t = jnp.concatenate([s_up] * group, axis=1)
                flip_here = jnp.where(m == f_lane, 1.0, 0.0)
                tgt = jnp.abs(s_m_t - flip_here)              # (1, G*T)
                flip_up = jnp.where(vis_up == f_lane, 1.0, 0.0)
                x_v = jnp.abs(s_up_t - sv * flip_up)
                # vertical state: wavefront-recomputed iff source >= f
                h_v = jnp.where(
                    vis_up >= f_lane,
                    h_v_wf,
                    jnp.concatenate([h_v_base] * group, axis=1),
                )

                h_h = jnp.where(k > 0, wf_h[:], 0.0)
                x_h = jnp.where(k > 0, wf_x[:], 0.0)
                h_new, l0, l1 = _mdrnn_site_rows(
                    x_h, sh, x_v, sv, h_h, h_v, w
                )
                wf_h[:] = h_new
                wf_x[:] = tgt
                acc, cmp = kadd(
                    wf_acc[:], wf_cmp[:], _logp_rows(l0, l1, tgt)
                )
                wf_acc[:] = acc
                wf_cmp[:] = cmp
                rowbuf[pl.ds(xx, 1)] = h_new[None]
                return 0

            jax.lax.fori_loop(g0, ns, site_body, 0)

            for kk_ in range(group):
                f = g0 + (2 * kk_ if pack else kk_)

                @pl.when(f < ns)
                def _(kk_=kk_, f=f):
                    acc = kfinal(
                        wf_acc[:, pl.ds(kk_ * t, t)],
                        wf_cmp[:, pl.ds(kk_ * t, t)],
                    )
                    contrib = jnp.exp(0.5 * (acc - lp_base))
                    if pack:
                        # odd flip count: the block's upper half (flip f+1)
                        # was never initialized this group — drop it
                        contrib = jnp.where(
                            jnp.logical_and(upper, f + 1 >= ns), 0.0, contrib
                        )
                    eoff_ref[:] = eoff_ref[:] + contrib

            return 0

        eoff_ref[:] = zero_row
        jax.lax.fori_loop(0, num_groups, group_body, 0)
        if pack:
            # fold the upper-half flips' contributions onto the lower-half
            # sample lanes (the halves carry the same batch; only the lower
            # half is read by the host)
            e = eoff_ref[:]
            eoff_ref[:] = e + pltpu.roll(e, half, axis=1)

    return kernel


def _scratch(nx, ny, u, tile, spill=False, group=GROUP):
    ns = nx * ny
    up = _round8(u)
    if spill:
        return [
            pltpu.VMEM((ns, tile), jnp.float32),                 # pfx
            pltpu.VMEM((_WIN * nx, up, tile), jnp.float32),      # rowwin
            pltpu.VMEM((nx, u, group * tile), jnp.float32),      # rowbuf
            pltpu.VMEM((u, group * tile), jnp.float32),          # wf_h
            pltpu.VMEM((1, group * tile), jnp.float32),          # wf_x
            pltpu.VMEM((1, group * tile), jnp.float32),          # wf_acc
            pltpu.VMEM((1, group * tile), jnp.float32),          # wf_cmp
            pltpu.SemaphoreType.DMA((_WIN,)),
            pltpu.SemaphoreType.DMA((_WIN,)),
        ]
    return [
        pltpu.VMEM((ns, u, tile), jnp.float32),
        pltpu.VMEM((ns, tile), jnp.float32),
        pltpu.VMEM((nx, u, group * tile), jnp.float32),
        pltpu.VMEM((u, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),  # wf_cmp (Kahan pair)
    ]


def _hist_out(nx, ny, u, tile, num_tiles, spill):
    if not spill:
        return [], []
    return (
        [pl.BlockSpec(memory_space=pltpu.HBM)],
        [jax.ShapeDtypeStruct(
            (num_tiles, ny, nx, _round8(u), tile), jnp.float32
        )],
    )


def mdrnn_flip_ratio_sum(params, samples: jax.Array, nx: int, ny: int):
    """samples (B, Nx, Ny) int -> (ratio_sum (B,), base_log_prob (B,))."""
    b = samples.shape[0]
    u = params["cell"]["wh"].shape[0]
    ns = nx * ny
    tile, spill, group = _pick(nx, ny, u, b)
    pack = _pack_for(b, tile)
    b_pad = _round_up(max(b, 8), tile)
    xx, yy = visit_order(nx, ny)
    seq_v = samples[:, xx, yy].T  # (NS, B), visit order
    seq = jnp.zeros((ns, b_pad), jnp.int32).at[:, :b].set(seq_v)
    if pack:
        # base-pass rows arrive half-duplicated (see _pack_for)
        seq = seq.at[:, tile // 2 : tile // 2 + b].set(seq_v)
    hist_specs, hist_shapes = _hist_out(nx, ny, u, tile, b_pad // tile, spill)

    outs = pl.pallas_call(
        _make_kernel(nx, ny, spill=spill, group=group, pack=pack),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((ns, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *hist_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            *hist_shapes,
        ),
        scratch_shapes=_scratch(nx, ny, u, tile, spill, group),
    )(seq, *_mdrnn_weightsT(params))
    eoff, lp = outs[0], outs[1]
    return eoff[0, :b], lp[0, :b]


def mdrnn_sample_and_flip_sum(params, seed: jax.Array, num_samples: int,
                              nx: int, ny: int):
    """Fully fused: draw the Monte-Carlo batch (boustrophedon sweep with the
    on-core PRNG) AND estimate the flip-ratio sums in one kernel launch —
    the sampling sweep doubles as the wavefront estimator's base pass, so
    the separate sampler launch and its re-rollout disappear.

    Returns (samples (B, Nx, Ny) int32, base_log_prob (B,), ratio_sum (B,)).
    """
    u = params["cell"]["wh"].shape[0]
    ns = nx * ny
    tile, spill, group = _pick(nx, ny, u, num_samples)
    pack = _pack_for(num_samples, tile)
    b_pad = _round_up(max(num_samples, 8), tile)
    hist_specs, hist_shapes = _hist_out(nx, ny, u, tile, b_pad // tile, spill)

    outs = pl.pallas_call(
        _make_kernel(nx, ny, sample_mode=True, spill=spill, group=group,
                     pack=pack),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=(
            pl.BlockSpec((ns, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *hist_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ns, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            *hist_shapes,
        ),
        scratch_shapes=_scratch(nx, ny, u, tile, spill, group),
    )(seed_block(seed), *_mdrnn_weightsT(params))
    seq, eoff, lp = outs[0], outs[1], outs[2]
    # visit order (NS, B) -> lattice (B, Nx, Ny)
    xx, yy = visit_order(nx, ny)
    samples = (
        jnp.zeros((num_samples, nx, ny), jnp.int32)
        .at[:, xx, yy]
        .set(seq[:, :num_samples].T)
    )
    return samples, lp[0, :num_samples], eoff[0, :num_samples]
