"""Pallas kernel: fused grouped-wavefront TFIM off-diagonal estimator.

For single-site-flip Hamiltonians (TFIM in any dimension with the pRNN/snake
ansatz) the generic estimator evaluates N+1 full sequences per sample —
O(N^2) site steps — after materializing an (S*(N+1), N) flip matrix in HBM
(the in-graph analogue of the reference's ``queue_samples`` scratch array,
``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:42-48,195``).

Three structural ideas cut this down:

1. **Prefix sharing** (triangular): flipping site i leaves sites < i
   untouched, so ``log p(sigma^(i)) = P[i-1] + FL[i] + suffix_i`` with only
   the suffix (sites > i, restarted from the stored base hidden state with
   the flipped one-hot input) recomputed — half the site steps, and no flip
   matrix in HBM at all.
2. **Grouped wavefront**: suffixes are batched G flips at a time.  One
   iteration per lattice site advances all G diverged trajectories with a
   single (3U, U) x (U, G*T) matmul per layer; each flip's column block is
   (re)initialized from the VMEM hidden-state history the moment its
   divergence site comes up — ~N^2/(2G) fat MXU iterations instead of
   ~N^2/2 tiny latency-bound ones (uninitialized columns compute ignored
   garbage for at most G-1 iterations, a G/N overhead fraction).
3. **Feature-major layout**: every activation keeps the batch on the lane
   dimension ((L*U, T) stacked hidden, (1, T) spins/accumulators), so
   per-site reads are natural row slices, there are no relayouts in the
   loop, and no (x, 1) lane-padding waste.

Multi-layer stacks (the ``tf.nn.rnn_cell.MultiRNNCell`` capability,
``1DTFIM/RNNwavefunction.py:32``) are handled by concatenating the L
per-layer hidden states along the sublane (feature) dimension — the history
and wavefront scratch carry (L*U, T) blocks and the site step peels static
(U, T) slices per layer.

Histories beyond the VMEM budget (deep stacks, very long chains) spill to
HBM via ``ops/spill.py``: the base pass streams rows out through a write
ring, and the wavefront prefetches each group's divergence-row window back
through a double-buffered staging block — one fat DMA per group, started a
full group ahead.  Under the raised scoped-VMEM limit (``ops/tiling.py``)
the N=1000 published workload stays VMEM-resident; the wavefront group
scales with tile and state width either way (``_group_for``) because the
serial matmul-chain latency floor dominates narrow tiles.

Returns  sum_i exp(0.5 * (log p(sigma^(i)) - log p(sigma)))  per sample
(the pRNN amplitude-ratio sum of ``TrainingRNN_1DTFIM.py:74``) plus the base
log p as a by-product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compsum import kadd, kfinal
from .fused_gru import (
    STATE_ROWS,
    _cell_kind,
    _round_up,
    _split_cells,
    _stacked_site_step_rows,
    _weightsT,
    _weightT_specs,
)
from .seeding import TILE_SEED_STRIDE, seed_block
from .spill import hist_out as _spill_hist_out
from .spill import make_hist_io, spill_bytes, spill_scratch, window_start
from . import tiling
from .tiling import MIN_TILE as _MIN_TILE
from .tiling import round8 as _round8
from .tiling import cap_tile

FLIP_TILE = 512  # max sample rows per grid program
GROUP = 8        # flips advanced together per wavefront iteration (resident)
SPILL_GROUP = 16  # spilled-history floor (staging window sizing)
# The serial per-site advance is a fixed-latency dependent matmul
# ((3U, U) x (U, G*T), ~1 us floor measured in
# scripts/exp_wavefront_pipeline.py).  When BOTH the state block and the
# tile are narrow the chain is latency-bound, so the group widens to keep
# each advance serving >= ~4k lanes (6k spilled, hiding the staging DMA):
# measured on-chip at N=1000 S=64 t128, g16 -> g32/g48 is +5-7% (spill and
# resident alike), while at U=256 t256 the matmul is already MXU-bound and
# g8 beats g16 by 3%.  Wider tiles amortize the same floor (512-row
# flagship tile: +4.5% over 256 back-to-back on-chip).
_WAVEFRONT_LANES = 4 * 1024
_SPILL_WAVEFRONT_LANES = 6 * 1024
# Joint budget for history + resident scratch.  The kernel-bearing jits
# forward a 64 MiB scoped-VMEM limit (``ops/tiling.py``: v5e has 128 MiB
# physical VMEM; the 16 MiB compiler default is what the *accounting noise*
# margin used to be sized for); 48 MiB keeps ~16 MiB of headroom for the
# program-level co-residency the scoped stack also counts (VMEM-pinned
# outputs, prefetched operands — measured ~5 MiB on the training step).
# Raising it keeps wide-hidden and long-chain histories VMEM-resident:
# U=256 S=500 rides a (256, resident) tile (+12% over t128), N=1000 S=64
# stays resident at t128/g32 (on par with the spilled g48 variant, 38.2 vs
# 38.7 steps/s, both +6% over the old g16 spill).
_VMEM_BUDGET = 48 * 1024 * 1024


def _group_for(tile: int, units, kind: str, spill: bool) -> int:
    """Wavefront group for a (tile, state-width) pair: the latency-scaling
    policy above.  Wide state blocks (L*U >= 128 rows) keep the base group
    — their advance matmul is MXU-bound at any tile."""
    base = SPILL_GROUP if spill else GROUP
    if tiling.force_base_group() or _state_lu(units, kind) >= 128:
        return base
    lanes = _SPILL_WAVEFRONT_LANES if spill else _WAVEFRONT_LANES
    return max(base, lanes // tile)



def _norm_units(units) -> tuple:
    return (units,) if isinstance(units, int) else tuple(units)


def _state_lu(units, kind: str) -> int:
    """Rows of the concatenated per-site state block: L*U for GRU, 2*L*U
    for LSTM ([h; c] per layer — the wavefront must restart both)."""
    return STATE_ROWS[kind] * sum(_norm_units(units))


def _hist_bytes(n: int, units, tile: int, kind: str = "gru") -> int:
    return n * _round8(_state_lu(units, kind)) * tile * 4


def _resident_bytes(n: int, units, tile: int, group: int = GROUP,
                    kind: str = "gru") -> int:
    """VMEM bytes excluding the hidden history and the spill machinery:
    samples + pfx + fl rows and the wavefront blocks."""
    lu = _round8(_state_lu(units, kind))
    rows = 3 * n  # samples (int32) + pfx + fl
    wf = lu * group + 3 * group  # wf_h + (wf_x, wf_acc, wf_cmp) rows
    return (rows + wf) * tile * 4


def _spill_extra_bytes(n: int, units, tile: int, group: int,
                       kind: str = "gru") -> int:
    lu = _state_lu(units, kind)
    # worst case window: the flip-pair packed variant stages 2*group rows
    return spill_bytes(lu, tile, 2 * group, n)


def _batch_cap(batch) -> int:
    """Batch-capped tile (shared policy, ``ops/tiling.py``): tiles wider
    than the batch only compute padding columns (at small-sample spill
    configs, e.g. N=1000 S=64, an uncapped 512-tile wastes 8x the lanes —
    measured 1.8x slower than the capped kernel)."""
    return cap_tile(batch, FLIP_TILE)


def _pick_tile(n: int, units, batch=None, kind: str = "gru"):
    """(tile, spill): largest power-of-two tile (<= FLIP_TILE, >= 128,
    <= the batch cap) whose hidden-state history PLUS resident scratch fits
    the VMEM budget; when even the minimum tile cannot hold the history,
    spill it to HBM (manual DMA) and size the tile by the VMEM-resident
    pieces plus the ring/staging buffers (each regime accounted with the
    group it actually runs)."""
    cap = _batch_cap(batch)

    def _resident_total(tile):
        g = _group_for(tile, units, kind, spill=False)
        return _hist_bytes(n, units, tile, kind) + _resident_bytes(
            n, units, tile, g, kind
        )

    def _spill_total(tile):
        g = _group_for(tile, units, kind, spill=True)
        return _resident_bytes(n, units, tile, g, kind) + _spill_extra_bytes(
            n, units, tile, g, kind
        )

    tile = cap
    while tile > _MIN_TILE and _resident_total(tile) > _VMEM_BUDGET:
        tile //= 2
    if _resident_total(tile) <= _VMEM_BUDGET:
        return tile, False
    tile = cap
    while tile > _MIN_TILE and _spill_total(tile) > _VMEM_BUDGET:
        tile //= 2
    return tile, True


def supports(n: int, units, kind: str = "gru") -> bool:
    """True when the wavefront estimator applies.  The spilled variant
    (history in HBM via DMA — covers the reference's largest published
    chains, N=1000) only needs the VMEM-resident pieces + ring/staging to
    fit at the minimum tile; the history-resident case is a strict subset
    of that, so one check suffices."""
    g = _group_for(_MIN_TILE, units, kind, spill=True)
    return (
        _resident_bytes(n, units, _MIN_TILE, g, kind)
        + _spill_extra_bytes(n, units, _MIN_TILE, g, kind)
        <= _VMEM_BUDGET
    )


def _logp_rows(l0, l1, s):
    """Stable log-softmax prob of target s in {0,1}; all (1, T) rows."""
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    return jnp.where(s > 0.5, l1, l0) - lse


def _concat_step(x, x_scale, h_cat, cells, hwT, hbT, u, kind="gru"):
    """Stacked RNN + head step over a concatenated (STATE_ROWS*L*U, T)
    state block ([h] rows per layer for GRU, [h; c] for LSTM)."""
    su = STATE_ROWS[kind] * u
    hs = tuple(h_cat[l * su : (l + 1) * su] for l in range(len(cells)))
    hs, l0, l1 = _stacked_site_step_rows(x, x_scale, hs, cells, hwT, hbT, kind)
    h_new = hs[0] if len(cells) == 1 else jnp.concatenate(hs, axis=0)
    return h_new, l0, l1


def _make_flip_kernel(num_layers: int, sample_mode: bool,
                      per_flip: bool = False, spill: bool = False,
                      group: int = GROUP, pack: bool = False,
                      kind: str = "gru"):
    """Kernel factory: teacher-forced (``sample_mode=False``, reads a given
    sample batch) or fully fused sample-and-estimate (``sample_mode=True``,
    draws the batch in-kernel — the base pass doubles as the autoregressive
    sampler, so one kernel launch produces samples, their log-probs, AND the
    flip-ratio sums with no re-rollout).  With ``per_flip=True`` the first
    output is the (N, T) matrix of flipped-configuration log-probs instead of
    the ratio sum (needed by the parity-symmetrized estimator, which combines
    forward and reversed chains per flip).

    ``spill=True`` keeps the (N, L*U, T) hidden history in HBM (long chains,
    SURVEY.md §5's N=1000 case) via the ``ops/spill.py`` protocol: the base
    pass streams rows out through the write ring, the wavefront prefetches
    each group's divergence-row window one group ahead — ~N * 4*L*U*T bytes
    of traffic per tile, negligible against the O(N^2/2) wavefront matmuls,
    and no blocking DMA on the wavefront critical path.

    ``pack=True`` (small batches: 2*B <= tile, one grid program) runs the
    flip-pair lane packing: the base pass carries TWO copies of the batch
    in the tile's lane halves (teacher-forced inputs arrive pre-duplicated;
    sampled draws are mirrored in-kernel), so every base-pass row — prefix
    sums, flip log-probs, hidden history — is half-duplicated, and each
    wavefront column block serves the flip PAIR (2m, 2m+1): halves
    initialize independently via lane-mask blends (the duplicated rows
    already carry the right values in both halves) while the shared
    teacher-forcing advance is unchanged.  Iterations halve — without this,
    a 64-sample chain on the 128-lane minimum tile computes 50% padding
    and caps at half the achievable MFU."""
    nw = 4 * num_layers + 2

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
            samples_ref = refs[0]
            wrefs = refs[1 : 1 + nw]
            rest = refs[1 + nw :]
        if sample_mode:
            samples_ref = rest[0]
            rest = rest[1:]
        if spill:
            (eoff_ref, lp_ref, h_hist, pfx, fl, wf_h, wf_x, wf_acc, wf_cmp,
             ring, staging, sem_wr, sem_rd) = rest
        else:
            (eoff_ref, lp_ref, h_hist, pfx, fl,
             wf_h, wf_x, wf_acc, wf_cmp) = rest
        n_sites = samples_ref.shape[0]
        t = eoff_ref.shape[1]
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        lu = STATE_ROWS[kind] * num_layers * u
        zero_row = jnp.zeros((1, t), jnp.float32)

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)  # (1, T)

        def step(x, x_scale, h_cat):
            return _concat_step(x, x_scale, h_cat, cells, hwT, hbT, u, kind)

        window = (2 if pack else 1) * group
        hist_write, hist_drain, stage, read_col, _ = make_hist_io(
            spill, h_hist, wf_h, n_sites, lu, t, window,
            *((ring, staging, sem_wr, sem_rd) if spill else ()),
        )
        if pack:
            upper = (
                jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) >= t // 2
            )

        # ---- base pass: (draw and) store hidden history, prefix sums,
        # flipped-site logps
        def base_body(n, carry):
            h, x, acc, cmp = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            h_new, l0, l1 = step(x, x_scale, h)
            if sample_mode:
                p0 = jax.nn.sigmoid(l0 - l1)
                bits = pltpu.prng_random_bits((1, t))
                usig = jax.lax.shift_right_logical(
                    pltpu.bitcast(bits, jnp.int32), 9
                )
                uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
                s = jnp.where(uni >= p0, 1.0, 0.0)
                if pack:
                    # mirror the lower-half draws into the upper half so the
                    # whole base pass stays half-duplicated
                    s = jnp.where(upper, pltpu.roll(s, t // 2, axis=1), s)
                samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
            else:
                s = read_s(n)
            acc, cmp = kadd(acc, cmp, _logp_rows(l0, l1, s))
            hist_write(n, h_new)
            # store the corrected running prefix: the wavefront re-bases
            # flip accumulators on these rows
            pfx[pl.ds(n, 1), :] = kfinal(acc, cmp)
            fl[pl.ds(n, 1), :] = _logp_rows(l0, l1, 1.0 - s)
            return h_new, s, acc, cmp

        h0 = jnp.zeros((lu, t), jnp.float32)
        _, _, lp_acc, lp_cmp = jax.lax.fori_loop(
            0, n_sites, base_body, (h0, zero_row, zero_row, zero_row)
        )
        lp_base = kfinal(lp_acc, lp_cmp)
        hist_drain()
        lp_ref[:] = lp_base
        _flip_wavefront(
            step, eoff_ref, lp_base, stage, read_col, pfx, fl,
            wf_h, wf_x, wf_acc, wf_cmp, n_sites, t, read_s, zero_row,
            per_flip, group, spill, pack,
        )

    return kernel


def _flip_wavefront(
    step, eoff_ref, lp_base, stage, read_col, pfx, fl,
    wf_h, wf_x, wf_acc, wf_cmp, n_sites, t, read_s, zero_row, per_flip,
    group, spill, pack=False,
):

    # ---- grouped wavefront over flips --------------------------------------
    fpg = (2 if pack else 1) * group  # flips covered per group
    num_groups = -(-n_sites // fpg)
    half = t // 2
    if pack:
        upper = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) >= half

    def ws(g):
        return window_start(g * fpg, 0, n_sites, fpg)

    def init_col(f, slot, start):
        """Initialize flip ``f``'s wavefront column (suffix starts f+1).
        Packed: flip pair (2m, 2m+1) shares block m; the half being
        initialized is blended in by lane mask (base-pass rows are
        half-duplicated, so both halves of the source carry f's values)."""
        if pack:
            k = (f % fpg) // 2
            h = f % 2
            mask = upper == (h > 0)            # bool (1, T)
        else:
            k = f % group
            mask = None
        sl = pl.ds(k * t, t)
        read_col(f, k, slot, start, mask)
        x_new = 1.0 - read_s(f)
        acc_new = jnp.where(
            f > 0, pfx[pl.ds(jnp.maximum(f - 1, 0), 1), :], zero_row
        ) + fl[pl.ds(f, 1), :]
        if pack:
            wf_x[:, sl] = jnp.where(mask, x_new, wf_x[:, sl])
            wf_acc[:, sl] = jnp.where(mask, acc_new, wf_acc[:, sl])
            wf_cmp[:, sl] = jnp.where(mask, 0.0, wf_cmp[:, sl])
        else:
            wf_x[:, sl] = x_new
            wf_acc[:, sl] = acc_new
            wf_cmp[:, sl] = jnp.zeros_like(acc_new)

    def wavefront_step(n):
        """Advance all GROUP trajectory blocks one site with fat matmuls."""
        s_n = read_s(n)                                   # (1, T)
        tgt = jnp.concatenate([s_n] * group, axis=1)      # (1, GROUP*T)
        h_new, l0, l1 = step(wf_x[:], 1.0, wf_h[:])
        wf_h[:] = h_new
        wf_x[:] = tgt
        acc, cmp = kadd(wf_acc[:], wf_cmp[:], _logp_rows(l0, l1, tgt))
        wf_acc[:] = acc
        wf_cmp[:] = cmp

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

        wf_h[:] = jnp.zeros_like(wf_h)
        wf_x[:] = jnp.zeros_like(wf_x)
        wf_acc[:] = jnp.zeros_like(wf_acc)
        wf_cmp[:] = jnp.zeros_like(wf_cmp)
        init_col(g0, slot, start)  # flip g0 diverges first, at site g0+1

        def site_body(n, _):
            @pl.when((n - 1 > g0) & (n - 1 < jnp.minimum(g0 + fpg, n_sites)))
            def _():
                init_col(n - 1, slot, start)

            wavefront_step(n)
            return 0

        jax.lax.fori_loop(g0 + 1, n_sites, site_body, 0)

        # the last flip of the chain (empty suffix) never initializes in the
        # site loop — its init site would be n_sites
        @pl.when((n_sites - 1 >= g0) & (n_sites - 1 < g0 + fpg))
        def _():
            init_col(n_sites - 1, slot, start)

        for k in range(group):
            sl = pl.ds(k * t, t)
            if pack:
                a = g0 + 2 * k

                @pl.when(a < n_sites)
                def _(k=k, sl=sl, a=a):
                    acc = kfinal(wf_acc[:, sl], wf_cmp[:, sl])
                    if per_flip:
                        eoff_ref[pl.ds(a, 1), :] = acc

                        @pl.when(a + 1 < n_sites)
                        def _():
                            eoff_ref[pl.ds(a + 1, 1), :] = pltpu.roll(
                                acc, half, axis=1
                            )
                    else:
                        # mask the upper half when its flip is out of range,
                        # and clamp it BEFORE the exp (its acc is
                        # uninitialized garbage that can overflow f32;
                        # 0 * inf/NaN stays NaN — same idiom as
                        # j1j2_exchange_kernel's dead-half clamp)
                        live = jnp.where(
                            upper, jnp.where(a + 1 < n_sites, 1.0, 0.0), 1.0
                        )
                        d = jnp.where(live > 0, acc - lp_base, 0.0)
                        eoff_ref[:] = eoff_ref[:] + jnp.exp(0.5 * d) * live
            else:
                i = g0 + k

                @pl.when(i < n_sites)
                def _(i=i, sl=sl):
                    acc = kfinal(wf_acc[:, sl], wf_cmp[:, sl])
                    if per_flip:
                        eoff_ref[pl.ds(i, 1), :] = acc
                    else:
                        eoff_ref[:] = eoff_ref[:] + jnp.exp(
                            0.5 * (acc - lp_base)
                        )

        return 0

    if not per_flip:
        eoff_ref[:] = zero_row
    if spill:
        stage(0, ws(0), True)
    jax.lax.fori_loop(0, num_groups, group_body, 0)


def _hist_out(n, units, tile, num_tiles, spill, kind="gru"):
    return _spill_hist_out(_state_lu(units, kind), n, tile, num_tiles, spill)


def tfim_flip_ratio_sum(params, samples: jax.Array):
    """(B, N) int samples -> (ratio_sum (B,), base_log_prob (B,)).

    ``ratio_sum[b] = sum_i psi(sigma_b with site i flipped) / psi(sigma_b)``
    for the (stacked) pRNN (psi = sqrt p).
    """
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    tile, spill = _pick_tile(n, units, b, kind)
    group = _group_for(tile, units, kind, spill)
    pack = 2 * max(b, 8) <= tile  # one grid program; halves pack flip pairs
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)
    if pack:
        seq = seq.at[:, tile // 2 : tile // 2 + b].set(samples.T)
    hist_specs, hist_shapes = _hist_out(
        n, units, tile, b_pad // tile, spill, kind
    )

    outs = pl.pallas_call(
        _make_flip_kernel(num_layers, sample_mode=False, spill=spill,
                          group=group, pack=pack, kind=kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(units[0], num_layers, kind),
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
        scratch_shapes=_flip_scratch(n, units, tile, spill, group, pack, kind),
    )(seq, *_weightsT(params))
    eoff, lp = outs[0], outs[1]
    if pack:
        # each lane half accumulated its own flips' ratios
        return (
            eoff[0, :b] + eoff[0, tile // 2 : tile // 2 + b],
            lp[0, :b],
        )
    return eoff[0, :b], lp[0, :b]


def tfim_flip_log_probs(params, samples: jax.Array):
    """(B, N) int samples -> (lp_flips (B, N), base_log_prob (B,)).

    ``lp_flips[b, i] = log p(sigma_b with site i flipped)`` — the per-flip
    variant used by the parity-symmetrized estimator (the symmetrized
    density sums forward and reversed chains *before* the ratio, so ratio
    sums don't decompose per direction)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    tile, spill = _pick_tile(n, units, b, kind)
    group = _group_for(tile, units, kind, spill)
    pack = 2 * max(b, 8) <= tile
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)
    if pack:
        seq = seq.at[:, tile // 2 : tile // 2 + b].set(samples.T)
    hist_specs, hist_shapes = _hist_out(
        n, units, tile, b_pad // tile, spill, kind
    )

    outs = pl.pallas_call(
        _make_flip_kernel(num_layers, sample_mode=False, per_flip=True,
                          spill=spill, group=group, pack=pack, kind=kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(units[0], num_layers, kind),
        out_specs=(
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *hist_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            *hist_shapes,
        ),
        scratch_shapes=_flip_scratch(n, units, tile, spill, group, pack, kind),
    )(seq, *_weightsT(params))
    lpf, lp = outs[0], outs[1]
    return lpf[:, :b].T, lp[0, :b]


def tfim_sample_and_flip_sum(params, seed: jax.Array, num_samples: int,
                             n_sites: int, per_flip: bool = False):
    """Fully fused: draw the Monte-Carlo batch AND estimate the flip
    log-probs in one kernel launch (the sampling rollout doubles as the base
    pass of the wavefront estimator — no separate sample + re-rollout).

    Returns (samples (B, N) int32, base_log_prob (B,), ratio_sum (B,)) —
    or, with ``per_flip=True`` (the parity-symmetrized combination needs the
    per-flip log-probs), (samples, base_log_prob, lp_flips (B, N)).
    """
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    tile, spill = _pick_tile(n_sites, units, num_samples, kind)
    group = _group_for(tile, units, kind, spill)
    pack = 2 * max(num_samples, 8) <= tile
    b_pad = _round_up(max(num_samples, 8), tile)
    eoff_rows = n_sites if per_flip else 1
    hist_specs, hist_shapes = _hist_out(
        n_sites, units, tile, b_pad // tile, spill, kind
    )

    outs = pl.pallas_call(
        _make_flip_kernel(num_layers, sample_mode=True, per_flip=per_flip,
                          spill=spill, group=group, pack=pack, kind=kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weightT_specs(units[0], num_layers, kind),
        out_specs=(
            pl.BlockSpec((n_sites, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((eoff_rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            *hist_specs,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((eoff_rows, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            *hist_shapes,
        ),
        scratch_shapes=_flip_scratch(
            n_sites, units, tile, spill, group, pack, kind
        ),
    )(seed_block(seed), *_weightsT(params))
    samples, eoff, lp = outs[0], outs[1], outs[2]
    if per_flip:
        out = eoff[:, :num_samples].T
    elif pack:
        out = (
            eoff[0, :num_samples]
            + eoff[0, tile // 2 : tile // 2 + num_samples]
        )
    else:
        out = eoff[0, :num_samples]
    return samples[:, :num_samples].T, lp[0, :num_samples], out


def _flip_scratch(n, units, tile, spill=False, group=GROUP, pack=False,
                  kind="gru"):
    lu = _state_lu(units, kind)
    hist = [] if spill else [pltpu.VMEM((n, lu, tile), jnp.float32)]
    out = hist + [
        pltpu.VMEM((n, tile), jnp.float32),
        pltpu.VMEM((n, tile), jnp.float32),
        pltpu.VMEM((lu, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),
        pltpu.VMEM((1, group * tile), jnp.float32),  # wf_cmp (Kahan pair)
    ]
    if spill:
        out += spill_scratch(lu, tile, (2 if pack else 1) * group, n)
    return out
