"""Pallas TPU kernel: fused per-sample jacobian sweep for minSR rows.

``vmc/jacobian.py`` computes the minSR O matrix with two jnp ``lax.scan``s
(forward rollout stashing every pre-step state, reverse sweep emitting the
per-step gate cotangents) followed by MXU einsums.  The scans are the
latency floor of a minSR step: N sequential small-matmul steps each paying
XLA per-step scan overhead, twice — measured as the bulk of the ~1.2x-1.5x
minSR-vs-Adam per-step premium at the flagship shapes (BENCHMARKS.md
"stash-and-contract minSR jacobian").

This kernel fuses both sweeps into one launch per batch tile (the same
forward-replay / reverse-sweep skeleton as the fused BPTT kernel,
``ops/fused_gru_bwd.run_history_bptt``), with two differences:

* the state history is written to an OUTPUT (the per-sample weight-row
  einsums outside need every pre-step state), not a private scratch;
* the reverse sweep EMITS per-site gate cotangents instead of accumulating
  batch-reduced weight cotangents (batch reduction is exactly what minSR
  must not do — it needs one row per sample).

Per site the emitted block packs, per GRU layer, ``[da (3U); dgh_c (U)]``
(``da``/``dgh`` share their first 2U rows, so only 4U rows are stored, not
6U) and per LSTM layer ``da (4U)``; the 2-class head cotangent is the
single ``dl1`` row (``dlogits = [-dl1; dl1]``).  The per-sample weight rows
then come from one batched site-axis contraction per weight tensor on the
MXU (``_contract``), identical in value and layout to
``vmc/jacobian._contract_layer``.

Gate math mirrors ``ops/fused_gru_bwd.gru_trunk_bwd_site`` /
``lstm_trunk_bwd_site`` (the semantics source — keep in sync); equality
with the jnp rows is pinned row-for-row in tests/test_fused_jac.py and
tests/test_minsr.py's vmap-of-grad oracles.

Reference context: none — the reference has no natural-gradient method
(Adam only, ``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:113``); this
kernel serves the beyond-reference minSR optimizer (``vmc/minsr.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import (
    STATE_ROWS,
    _cell_kind,
    _round_up,
    _split_cells,
    _split_trunk,
    _trunk_specs,
    _weightsT,
    _weightsT_trunk,
    _weightT_specs,
)
from .fused_gru_bwd import (
    _dotT_lhs,
    _weight_bytes,
    gru_gates_recompute,
    gru_trunk_fwd_site,
    lstm_gates_recompute,
    lstm_trunk_fwd_site,
    run_history_bptt,
)
from .tiling import MIN_TILE as _MIN_TILE
from .tiling import cap_tile
from .tiling import round8 as _round8

# The jacobian tile budget rides the scoped-VMEM unlock
# (ops/tiling.tpu_compiler_options, 64 MiB scoped): history + dgates blocks
# are large, and Pallas double-buffers in/out blocks across grid steps.
_VMEM_BUDGET = 44 * 1024 * 1024
_MAX_TILE = 256
_SPILL_MIN_CHUNK = 8    # smallest spill-ring chunk (sites per DMA)
_SPILL_MAX_CHUNK = 128


def _dg_rows(units, kind: str) -> int:
    """Emitted cotangent rows per site: 4U per layer for both kinds
    (GRU [da(3U); dgh_c(U)], LSTM da(4U))."""
    return 4 * sum(units)


def _resident_bytes(n: int, units, tile: int, kind: str) -> int:
    """Joint VMEM footprint at one tile: double-buffered in/out blocks
    (samples, history, dgates, dl1) + weights (input refs + the fori-loop
    carry copy) + the state/cotangent carries.  Second-minor dims carry the
    (8, 128)-unit sublane padding (tiling.round8), matching every other
    kernel's accounting."""
    lu = _round8(STATE_ROWS[kind] * sum(units))
    blocks = (
        _round8(n) * tile * 4  # samples (sublane dim n)
        + n * lu * tile * 4  # history out
        + n * _round8(_dg_rows(units, kind)) * tile * 4  # dgates out
        + _round8(n) * tile * 4  # dl1 out
    )
    return 2 * blocks + 2 * _weight_bytes(units, 1, kind) + 4 * lu * tile * 4


def _pick_tile(n: int, units, batch: int, kind: str) -> int:
    tile = cap_tile(batch, _MAX_TILE)
    while tile > _MIN_TILE and _resident_bytes(n, units, tile, kind) > _VMEM_BUDGET:
        tile //= 2
    return tile


def _spill_bytes(n: int, units, tile: int, chunk: int, kind: str) -> int:
    """Joint VMEM footprint of the HBM-streamed sweep at one (tile, chunk):
    the history/dgates blocks leave VMEM (only the two chunk-deep
    double-buffered rings remain), so reach becomes independent of N —
    samples + dl1 blocks (double-buffered), weights (input refs + the
    fori carry copy), the fwd/bwd state carries, and the two rings."""
    lu_pad = _round8(STATE_ROWS[kind] * sum(units))
    dgr_pad = _round8(_dg_rows(units, kind))
    return (
        2 * 2 * _round8(n) * tile * 4  # samples in + dl1 out, double-buffered
        + 2 * _weight_bytes(units, 1, kind)
        + 4 * lu_pad * tile * 4        # fwd/bwd state carries
        + 2 * chunk * lu_pad * tile * 4   # history ring
        + 2 * chunk * dgr_pad * tile * 4  # dgates ring
    )


def _plan(n: int, units, batch: int, kind: str):
    """(variant, tile, chunk): ``("resident", tile, None)`` whenever the
    whole history + dgates blocks fit VMEM at any lane-width tile (the
    round-3 behavior, preserved exactly on all previously-supported
    shapes), else ``("spill", tile, chunk)`` — the HBM-streamed sweep whose
    reach is N-independent (N=1000 chains, U=256 hidden)."""
    if _resident_bytes(n, units, _MIN_TILE, kind) <= _VMEM_BUDGET:
        return "resident", _pick_tile(n, units, batch, kind), None
    sp_tile = cap_tile(batch, _MAX_TILE)
    while sp_tile > _MIN_TILE and (
        _spill_bytes(n, units, sp_tile, _SPILL_MIN_CHUNK, kind) > _VMEM_BUDGET
    ):
        sp_tile //= 2
    chunk = _SPILL_MIN_CHUNK
    while (
        2 * chunk <= _SPILL_MAX_CHUNK
        and 2 * chunk < n
        and _spill_bytes(n, units, sp_tile, 2 * chunk, kind) <= _VMEM_BUDGET
    ):
        chunk *= 2
    return "spill", sp_tile, chunk


def supports(n: int, units, kind: str = "gru") -> bool:
    """True when a fused jacobian sweep is available: history-resident or
    the HBM-spilled variant (whose reach is N-independent — the rings only
    depend on the chunk depth)."""
    return len(set(units)) == 1 and (
        _resident_bytes(n, units, _MIN_TILE, kind) <= _VMEM_BUDGET
        or _spill_bytes(n, units, _MIN_TILE, _SPILL_MIN_CHUNK, kind)
        <= _VMEM_BUDGET
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _gru_trunk_bwd_rows(cells, u, num_layers, x_row, x_scale,
                        hist_n, hist_p, d_top, dh_carry, emit):
    """Backward through the stacked GRU trunk at one site, emitting
    ``(l, da, dgh_c)`` per layer instead of accumulating weight cotangents
    (gradient math: ops/fused_gru_bwd.gru_trunk_bwd_site)."""
    d_inp = None
    new_dh = []
    for l in range(num_layers - 1, -1, -1):
        wxT, whT, _, _ = cells[l]
        h_prev = hist_p[l * u : (l + 1) * u]
        inp = hist_n[(l - 1) * u : l * u] if l > 0 else None
        r, z, c, gh_c = gru_gates_recompute(
            cells, u, l, x_row, inp, x_scale, h_prev
        )

        dh = dh_carry[l * u : (l + 1) * u]
        if l == num_layers - 1:
            dh = dh + d_top
        if d_inp is not None:
            dh = dh + d_inp

        dz = dh * (h_prev - c)
        dc = dh * (1.0 - z)
        dac = dc * (1.0 - c * c)
        dr = dac * gh_c
        dgh_c = dac * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        da = jnp.concatenate([da_r, da_z, dac], axis=0)     # (3U, T)
        dgh = jnp.concatenate([da_r, da_z, dgh_c], axis=0)  # (3U, T)

        new_dh.append(dh * z + _dotT_lhs(whT, dgh))
        if l:
            d_inp = _dotT_lhs(wxT, da)
        emit(l, da, dgh_c)

    new_dh.reverse()
    return new_dh[0] if num_layers == 1 else jnp.concatenate(new_dh, axis=0)


def _lstm_trunk_bwd_rows(cells, u, num_layers, x_row, x_scale,
                         hist_n, hist_p, d_top, dhc_carry, emit):
    """LSTM twin of ``_gru_trunk_bwd_rows`` emitting ``(l, da, None)``
    (gradient math: ops/fused_gru_bwd.lstm_trunk_bwd_site)."""
    d_inp = None
    new_dh, new_dc = [], []
    for l in range(num_layers - 1, -1, -1):
        wxT, whT, _, _ = cells[l]
        h_prev = hist_p[2 * l * u : (2 * l + 1) * u]
        c_prev = hist_p[(2 * l + 1) * u : (2 * l + 2) * u]
        c_new = hist_n[(2 * l + 1) * u : (2 * l + 2) * u]
        inp = hist_n[2 * (l - 1) * u : (2 * l - 1) * u] if l > 0 else None
        si, tj, sf, so = lstm_gates_recompute(
            cells, u, l, x_row, inp, x_scale, h_prev
        )

        dh = dhc_carry[2 * l * u : (2 * l + 1) * u]
        dc = dhc_carry[(2 * l + 1) * u : (2 * l + 2) * u]
        if l == num_layers - 1:
            dh = dh + d_top
        if d_inp is not None:
            dh = dh + d_inp

        tc = jnp.tanh(c_new)
        da_o = dh * tc * so * (1.0 - so)
        dc = dc + dh * so * (1.0 - tc * tc)
        da_f = dc * c_prev * sf * (1.0 - sf)
        da_i = dc * tj * si * (1.0 - si)
        da_j = dc * si * (1.0 - tj * tj)
        da = jnp.concatenate([da_i, da_j, da_f, da_o], axis=0)  # (4U, T)

        new_dh.append(_dotT_lhs(whT, da))
        new_dc.append(dc * sf)
        if l:
            d_inp = _dotT_lhs(wxT, da)
        emit(l, da, None)

    new_dh.reverse()
    new_dc.reverse()
    return jnp.concatenate(
        [r for pair in zip(new_dh, new_dc) for r in pair], axis=0
    )


def _build_fwd_site(cells, u, num_layers, kind, read_s):
    def fwd_site(n, carry):
        hs, x_row = carry
        x_scale = jnp.where(n > 0, 1.0, 0.0)
        if kind == "gru":
            new_hs = gru_trunk_fwd_site(
                cells, u, num_layers, x_row, x_scale, hs
            )
            blocks = new_hs
        else:
            new_hs = lstm_trunk_fwd_site(
                cells, u, num_layers, x_row, x_scale, hs
            )
            blocks = [r for (h, c) in new_hs for r in (h, c)]
        h_cat = (
            blocks[0] if len(blocks) == 1
            else jnp.concatenate(blocks, axis=0)
        )
        return h_cat, (new_hs, read_s(n))

    return fwd_site


def _build_bwd_site(cells, hwT, hbT, u, num_layers, kind, read_s,
                    write_dl1, emit_dg):
    """Backward site closure shared by the resident and spilled kernels:
    ``write_dl1(n, row)`` stores the head cotangent, ``emit_dg(n, lo, blk)``
    stores rows [lo, lo+rows(blk)) of site n's dgates block."""

    def bwd_site(n, hist_n, hist_p, dh_carry):
        s_n = read_s(n)
        x_row = jnp.where(n > 0, read_s(jnp.maximum(n - 1, 0)), 0.0)
        x_scale = jnp.where(n > 0, 1.0, 0.0)

        if kind == "gru":
            h_top = hist_n[(num_layers - 1) * u :]
        else:
            h_top = hist_n[
                2 * (num_layers - 1) * u : (2 * num_layers - 1) * u
            ]
        logits = jnp.dot(
            hwT, h_top, preferred_element_type=jnp.float32
        ) + hbT
        p1 = jax.nn.sigmoid(logits[1:2] - logits[0:1])
        dl1 = s_n - p1                                  # (1, T)
        d_top = (hwT[1:2] - hwT[0:1]).T * dl1           # (U, T)
        write_dl1(n, dl1)

        def emit(l, da, dgh_c):
            # one shared mapping onto the packed 4U-per-layer dgates rows
            # (kept in sync with the split-sweep spill kernel by sharing
            # _emit_rows)
            _emit_rows(emit_dg, n, l, u, da, dgh_c)

        trunk = _gru_trunk_bwd_rows if kind == "gru" else _lstm_trunk_bwd_rows
        return trunk(
            cells, u, num_layers, x_row, x_scale,
            hist_n, hist_p, d_top, dh_carry, emit,
        )

    return bwd_site


def _zero_carries(u, num_layers, kind, t):
    if kind == "gru":
        hs0 = tuple(
            jnp.zeros((u, t), jnp.float32) for _ in range(num_layers)
        )
    else:
        z = jnp.zeros((u, t), jnp.float32)
        hs0 = tuple((z, z) for _ in range(num_layers))
    fwd0 = (hs0, jnp.zeros((1, t), jnp.float32))
    bwd0 = jnp.zeros((STATE_ROWS[kind] * num_layers * u, t), jnp.float32)
    return fwd0, bwd0


def _make_jac_kernel(num_layers: int, kind: str):
    nw = 4 * num_layers + 2
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, *rest):
        wrefs = rest[:nw]
        hist_ref, dg_ref, dl1_ref = rest[nw : nw + 3]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        lu = sr * num_layers * u

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)  # (1, T)

        def write_dl1(n, dl1):
            dl1_ref[pl.ds(n, 1), :] = dl1

        def emit_dg(n, lo, blk):
            dg_ref[pl.ds(n, 1), lo : lo + blk.shape[0], :] = blk[None]

        fwd_site = _build_fwd_site(cells, u, num_layers, kind, read_s)
        bwd_site = _build_bwd_site(
            cells, hwT, hbT, u, num_layers, kind, read_s, write_dl1, emit_dg
        )
        fwd0, bwd0 = _zero_carries(u, num_layers, kind, t)
        run_history_bptt(
            n_sites, lu, fwd_site, fwd0, bwd_site, bwd0, hist_ref, None
        )

    return kernel


def _make_jac_spill_kernel(num_layers: int, kind: str, chunk: int):
    """HBM-streamed twin of ``_make_jac_kernel``: the history AND dgates
    blocks stream through chunk-deep double-buffered VMEM rings (protocol
    of ``fused_gru_bwd.run_history_bptt``'s spill mode, with two
    differences: every history chunk is written out — the contraction
    outside needs all of it — and the reverse sweep streams its dgates
    OUT through a second ring)."""
    nw = 4 * num_layers + 2
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, *rest):
        wrefs = rest[:nw]
        hist_hbm, dg_hbm, dl1_ref = rest[nw : nw + 3]
        hring, dgring, sem_hw, sem_hr, sem_dw = rest[nw + 3 :]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        lu = sr * num_layers * u
        nchunks = -(-n_sites // chunk)
        tid = pl.program_id(0)

        def h_wr(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                hring.at[pl.ds(slot * chunk, chunk)],
                hist_hbm.at[tid, idx],
                sem_hw.at[slot],
            )

        def h_rd(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                hist_hbm.at[tid, idx],
                hring.at[pl.ds(slot * chunk, chunk)],
                sem_hr.at[slot],
            )

        def dg_wr(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                dgring.at[pl.ds(slot * chunk, chunk)],
                dg_hbm.at[tid, idx],
                sem_dw.at[slot],
            )

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)  # (1, T)

        def write_dl1(n, dl1):
            dl1_ref[pl.ds(n, 1), :] = dl1

        fwd_site = _build_fwd_site(cells, u, num_layers, kind, read_s)
        fwd0, bwd0 = _zero_carries(u, num_layers, kind, t)

        # ---- forward: fill ring slots chunk by chunk, streaming EVERY
        # filled chunk out (unlike the BPTT spill, the last two are needed
        # in HBM too — the weight-row contraction outside consumes them).
        # TWIN: _make_rollout_spill_kernel's forward fill is the same ring
        # protocol — a wait-ordering or slot-accounting fix here must be
        # mirrored there (and vice versa).
        carry = fwd0
        for idx in range(nchunks):
            rows = min(chunk, n_sites - idx * chunk)
            base = (idx % 2) * chunk
            if idx >= 2:
                h_wr(idx - 2).wait()

            def fbody(r, carry, idx=idx, base=base):
                h_cat, carry = fwd_site(idx * chunk + r, carry)
                hring[pl.ds(base + r, 1), 0:lu, :] = h_cat[None]
                return carry

            carry = jax.lax.fori_loop(0, rows, fbody, carry)
            h_wr(idx).start()
        # drain the in-flight tail before backward prefetches reuse slots
        for idx in range(max(0, nchunks - 2), nchunks):
            h_wr(idx).wait()

        # ---- backward: chunks in reverse (the last two are still
        # ring-resident); chunk idx-2 prefetches into the slot chunk idx
        # vacates; dgates rows fill the second ring and stream out per
        # chunk.
        carry = bwd0
        for ci in range(nchunks):
            idx = nchunks - 1 - ci
            rows = min(chunk, n_sites - idx * chunk)
            base = (idx % 2) * chunk
            ob = ((idx - 1) % 2) * chunk
            needs_wait = 0 < idx <= nchunks - 2
            if idx + 2 <= nchunks - 1:  # dgring slot's previous occupant
                dg_wr(idx + 2).wait()

            def emit_dg(n, lo, blk, idx=idx, base=base):
                r = n - idx * chunk
                dgring[pl.ds(base + r, 1), lo : lo + blk.shape[0], :] = (
                    blk[None]
                )

            bwd_site = _build_bwd_site(
                cells, hwT, hbT, u, num_layers, kind, read_s,
                write_dl1, emit_dg,
            )

            def bbody(i2, carry, idx=idx, rows=rows, base=base, ob=ob,
                      needs_wait=needs_wait, bwd_site=bwd_site):
                r = rows - 1 - i2
                n = idx * chunk + r
                if needs_wait:
                    @pl.when(r == 0)
                    def _():
                        h_rd(idx - 1).wait()

                hist_n = hring[pl.ds(base + r, 1)][0][0:lu]
                if idx == 0:
                    hist_p = jnp.where(
                        r > 0,
                        hring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu],
                        0.0,
                    )
                else:
                    hp_in = hring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu]
                    hp_bd = hring[pl.ds(ob + chunk - 1, 1)][0][0:lu]
                    hist_p = jnp.where(r > 0, hp_in, hp_bd)
                return bwd_site(n, hist_n, hist_p, carry)

            carry = jax.lax.fori_loop(0, rows, bbody, carry)
            dg_wr(idx).start()
            if idx >= 2:
                h_rd(idx - 2).start()
        for idx in range(min(2, nchunks)):
            dg_wr(idx).wait()

    return kernel


def jac_sweep(params, samples: jax.Array):
    """Run the fused sweep: ``(hist, dgates, dl1)`` with shapes
    (N, STATE_ROWS*L*U, B), (N, 4*L*U, B), (N, B) — feature-major, batch on
    lanes, B the padded batch.  ``hist[n]`` holds the POST-step states of
    site n; the site-n PRE-step state is ``hist[n-1]`` (zeros at n=0).
    Dispatches between the VMEM-resident kernel and the HBM-streamed spill
    kernel by the ``_plan`` accounting (same values either way; spill
    equality pinned in tests/test_fused_jac.py)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    assert supports(n, units, kind), (
        f"fused jacobian sweep unsupported for N={n}, units={units} "
        "(resident blocks and the spill rings both exceed the VMEM budget)"
    )
    variant, tile, chunk = _plan(n, units, b, kind)
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    lu = STATE_ROWS[kind] * num_layers * u
    dgr = _dg_rows(units, kind)
    wspecs = _weightT_specs(u, num_layers, kind)

    if variant == "spill":
        return _jac_sweep_spill(
            params, seq, b, n, lu, dgr, units, tile, chunk,
            num_layers, kind, wspecs,
        )

    hist, dg, dl1 = pl.pallas_call(
        _make_jac_kernel(num_layers, kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=(
            pl.BlockSpec((n, lu, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, dgr, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, lu, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, dgr, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
        ),
    )(seq, *_weightsT(params))
    return hist[:, :, :b], dg[:, :, :b], dl1[:, :b]


def _jac_sweep_spill(params, seq, b, n, lu, dgr, units, tile, chunk,
                     num_layers, kind, wspecs):
    """Spill-variant launch: history/dgates land in HBM chunk-major
    ((tiles, nchunks, chunk, rows_pad, tile)) and are re-laid to the
    resident layout outside (one transpose+reshape pass in HBM)."""
    b_pad = seq.shape[1]
    num_tiles = b_pad // tile
    nchunks = -(-n // chunk)
    lu_pad = _round8(lu)
    dgr_pad = _round8(dgr)

    hist_o, dg_o, dl1 = pl.pallas_call(
        _make_jac_spill_kernel(num_layers, kind, chunk),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (num_tiles, nchunks, chunk, lu_pad, tile), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (num_tiles, nchunks, chunk, dgr_pad, tile), jnp.float32
            ),
            jax.ShapeDtypeStruct((n, b_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2 * chunk, lu_pad, tile), jnp.float32),
            pltpu.VMEM((2 * chunk, dgr_pad, tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(seq, *_weightsT(params))

    return (
        _relay_out(hist_o, nchunks, chunk, n, lu, b_pad, b),
        _relay_out(dg_o, nchunks, chunk, n, dgr, b_pad, b),
        dl1[:, :b],
    )


# ---------------------------------------------------------------------------
# split kernels for multi-head trunks (CRNNU1): rollout-only + dout-seeded
# reverse sweep.  The head seeds need the trunk outputs (chicken-and-egg for
# a single launch) and carry the U(1)-mask vjp, which stays in jnp
# (vmc/jacobian.crnn_head_seeds); the two seed sets are stacked along the
# batch LANES for the sweep — each lane's reverse recursion is independent,
# so the joint two-part sweep costs one kernel pass.
# ---------------------------------------------------------------------------


def _make_rollout_kernel(num_layers: int, kind: str):
    nt = 4 * num_layers

    def kernel(samples_ref, *rest):
        wrefs = rest[:nt]
        hist_ref = rest[nt]
        t = samples_ref.shape[1]
        cells = _split_trunk(wrefs, num_layers)
        u = cells[0][1].shape[1]

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        # TWIN: this resident rollout body and _make_rollout_spill_kernel's
        # _build_fwd_site/_zero_carries express the same forward step —
        # a semantics fix (x_scale site-0 handling, LSTM (h, c) interleave)
        # must land in both.
        def fbody(n, carry):
            hs, x_row = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            if kind == "gru":
                new_hs = gru_trunk_fwd_site(
                    cells, u, num_layers, x_row, x_scale, hs
                )
                blocks = new_hs
            else:
                new_hs = lstm_trunk_fwd_site(
                    cells, u, num_layers, x_row, x_scale, hs
                )
                blocks = [r for (h, c) in new_hs for r in (h, c)]
            h_cat = (
                blocks[0] if len(blocks) == 1
                else jnp.concatenate(blocks, axis=0)
            )
            hist_ref[pl.ds(n, 1)] = h_cat[None]
            return new_hs, read_s(n)

        if kind == "gru":
            hs0 = tuple(
                jnp.zeros((u, t), jnp.float32) for _ in range(num_layers)
            )
        else:
            z = jnp.zeros((u, t), jnp.float32)
            hs0 = tuple((z, z) for _ in range(num_layers))
        jax.lax.fori_loop(
            0, samples_ref.shape[0], fbody,
            (hs0, jnp.zeros((1, t), jnp.float32)),
        )

    return kernel


def _make_sweep_kernel(num_layers: int, kind: str):
    nt = 4 * num_layers
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, dout_ref, *rest):
        wrefs = rest[:nt]
        hist_ref, dg_ref = rest[nt : nt + 2]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells = _split_trunk(wrefs, num_layers)
        u = cells[0][1].shape[1]
        lu = sr * num_layers * u

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        def bbody(i, dh_carry):
            n = n_sites - 1 - i
            hist_n = hist_ref[pl.ds(n, 1)][0]
            hist_p = jnp.where(
                n > 0, hist_ref[pl.ds(jnp.maximum(n - 1, 0), 1)][0], 0.0
            )
            d_top = dout_ref[pl.ds(n, 1)][0]  # (U, T)
            x_row = jnp.where(n > 0, read_s(jnp.maximum(n - 1, 0)), 0.0)
            x_scale = jnp.where(n > 0, 1.0, 0.0)

            def emit(l, da, dgh_c):
                # TWIN of _emit_rows (the shared 4U-per-layer packed-row
                # mapping): a layout change there must be mirrored here, or
                # the resident CRNN sweep writes the old layout while
                # trunk_rows_from_sweep reads the new one.
                base = 4 * u * l
                if dgh_c is None:
                    dg_ref[pl.ds(n, 1), base : base + 4 * u, :] = da[None]
                else:
                    dg_ref[pl.ds(n, 1), base : base + 3 * u, :] = da[None]
                    dg_ref[pl.ds(n, 1), base + 3 * u : base + 4 * u, :] = (
                        dgh_c[None]
                    )

            trunk = _gru_trunk_bwd_rows if kind == "gru" else _lstm_trunk_bwd_rows
            return trunk(
                cells, u, num_layers, x_row, x_scale,
                hist_n, hist_p, d_top, dh_carry, emit,
            )

        jax.lax.fori_loop(
            0, n_sites, bbody, jnp.zeros((lu, t), jnp.float32)
        )

    return kernel


def _make_rollout_spill_kernel(num_layers: int, kind: str, chunk: int):
    """HBM-streamed rollout: forward chunks fill a double-buffered ring and
    every chunk streams out (protocol of ``_make_jac_spill_kernel``'s
    forward half)."""
    nt = 4 * num_layers
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, *rest):
        wrefs = rest[:nt]
        hist_hbm = rest[nt]
        hring, sem_hw = rest[nt + 1 :]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells = _split_trunk(wrefs, num_layers)
        u = cells[0][1].shape[1]
        lu = sr * num_layers * u
        nchunks = -(-n_sites // chunk)
        tid = pl.program_id(0)

        def h_wr(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                hring.at[pl.ds(slot * chunk, chunk)],
                hist_hbm.at[tid, idx],
                sem_hw.at[slot],
            )

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        fwd_site = _build_fwd_site(cells, u, num_layers, kind, read_s)
        fwd0, _ = _zero_carries(u, num_layers, kind, t)

        carry = fwd0
        for idx in range(nchunks):
            rows = min(chunk, n_sites - idx * chunk)
            base = (idx % 2) * chunk
            if idx >= 2:
                h_wr(idx - 2).wait()

            def fbody(r, carry, idx=idx, base=base):
                h_cat, carry = fwd_site(idx * chunk + r, carry)
                hring[pl.ds(base + r, 1), 0:lu, :] = h_cat[None]
                return carry

            carry = jax.lax.fori_loop(0, rows, fbody, carry)
            h_wr(idx).start()
        for idx in range(max(0, nchunks - 2), nchunks):
            h_wr(idx).wait()

    return kernel


def _make_sweep_spill_kernel(num_layers: int, kind: str, chunk: int):
    """HBM-streamed reverse sweep: history and dout chunks prefetch through
    double-buffered rings (two chunks ahead, as the BPTT spill backward),
    dgates stream out through a third ring."""
    nt = 4 * num_layers
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, dout_hbm, *rest):
        wrefs = rest[:nt]
        hist_hbm, dg_hbm = rest[nt : nt + 2]
        hring, doring, dgring, sem_hr, sem_dor, sem_dgw = rest[nt + 2 :]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells = _split_trunk(wrefs, num_layers)
        u = cells[0][1].shape[1]
        lu = sr * num_layers * u
        nchunks = -(-n_sites // chunk)
        tid = pl.program_id(0)

        def h_rd(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                hist_hbm.at[tid, idx],
                hring.at[pl.ds(slot * chunk, chunk)],
                sem_hr.at[slot],
            )

        def do_rd(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                dout_hbm.at[tid, idx],
                doring.at[pl.ds(slot * chunk, chunk)],
                sem_dor.at[slot],
            )

        def dg_wr(idx):
            slot = idx % 2
            return pltpu.make_async_copy(
                dgring.at[pl.ds(slot * chunk, chunk)],
                dg_hbm.at[tid, idx],
                sem_dgw.at[slot],
            )

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        # initial loads: the newest chunk blocking, its predecessor
        # prefetched (from here on the protocol matches the jac spill
        # backward: wait rd(idx-1) at r==0, start rd(idx-2) after a chunk)
        h_rd(nchunks - 1).start()
        do_rd(nchunks - 1).start()
        h_rd(nchunks - 1).wait()
        do_rd(nchunks - 1).wait()
        if nchunks >= 2:
            h_rd(nchunks - 2).start()
            do_rd(nchunks - 2).start()

        _, bwd0 = _zero_carries(u, num_layers, kind, t)
        carry = bwd0
        for ci in range(nchunks):
            idx = nchunks - 1 - ci
            rows = min(chunk, n_sites - idx * chunk)
            base = (idx % 2) * chunk
            ob = ((idx - 1) % 2) * chunk
            # EVERY predecessor chunk arrives by prefetch here (unlike the
            # jac/BPTT kernels, where the last two chunks stay ring-resident
            # from the forward pass), so the r==0 boundary wait covers
            # idx = nchunks-1 as well
            needs_wait = idx > 0
            if idx + 2 <= nchunks - 1:  # dgring slot's previous occupant
                dg_wr(idx + 2).wait()

            def emit_dg(n, lo, blk, idx=idx, base=base):
                r = n - idx * chunk
                dgring[pl.ds(base + r, 1), lo : lo + blk.shape[0], :] = (
                    blk[None]
                )

            def bbody(i2, carry, idx=idx, rows=rows, base=base, ob=ob,
                      needs_wait=needs_wait, emit_dg=emit_dg):
                r = rows - 1 - i2
                n = idx * chunk + r
                if needs_wait:
                    @pl.when(r == 0)
                    def _():
                        h_rd(idx - 1).wait()
                        do_rd(idx - 1).wait()

                hist_n = hring[pl.ds(base + r, 1)][0][0:lu]
                if idx == 0:
                    hist_p = jnp.where(
                        r > 0,
                        hring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu],
                        0.0,
                    )
                else:
                    hp_in = hring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu]
                    hp_bd = hring[pl.ds(ob + chunk - 1, 1)][0][0:lu]
                    hist_p = jnp.where(r > 0, hp_in, hp_bd)
                d_top = doring[pl.ds(base + r, 1)][0][0:u]  # (U, T)
                x_row = jnp.where(n > 0, read_s(jnp.maximum(n - 1, 0)), 0.0)
                x_scale = jnp.where(n > 0, 1.0, 0.0)

                trunk = (
                    _gru_trunk_bwd_rows if kind == "gru"
                    else _lstm_trunk_bwd_rows
                )
                return trunk(
                    cells, u, num_layers, x_row, x_scale,
                    hist_n, hist_p, d_top, carry,
                    lambda l, da, dgh_c: _emit_rows(
                        emit_dg, n, l, u, da, dgh_c
                    ),
                )

            carry = jax.lax.fori_loop(0, rows, bbody, carry)
            dg_wr(idx).start()
            if idx >= 2:
                h_rd(idx - 2).start()
                do_rd(idx - 2).start()
        for idx in range(min(2, nchunks)):
            dg_wr(idx).wait()

    return kernel


def _emit_rows(emit_dg, n, l, u, da, dgh_c):
    """Map one layer's trunk emission onto the packed 4U-per-layer dgates
    rows (layout of ``jac_sweep``'s dg output)."""
    base = 4 * u * l
    if dgh_c is None:  # lstm: da is the full 4U block
        emit_dg(n, base, da)
    else:
        emit_dg(n, base, da)
        emit_dg(n, base + 3 * u, dgh_c)


def _sweep_bytes(n: int, units, tile: int, kind: str) -> int:
    """Joint VMEM footprint of the reverse-sweep kernel at one tile
    (sublane dims round8-padded, as in ``_resident_bytes``)."""
    lu = _round8(STATE_ROWS[kind] * sum(units))
    blocks = (
        _round8(n) * tile * 4  # samples
        + n * _round8(units[0]) * tile * 4  # dout
        + n * lu * tile * 4  # hist in
        + n * _round8(_dg_rows(units, kind)) * tile * 4  # dgates out
    )
    return 2 * blocks + 2 * _weight_bytes(units, 1, kind) + 4 * lu * tile * 4


def _rollout_bytes(n: int, units, tile: int, kind: str) -> int:
    """Joint VMEM footprint of the rollout-only kernel at one tile: samples
    in + history out (double-buffered), trunk weights (input refs + the
    fori-loop carry copy), and the forward state carry."""
    lu = _round8(STATE_ROWS[kind] * sum(units))
    blocks = _round8(n) * tile * 4 + n * lu * tile * 4
    return 2 * blocks + 2 * _weight_bytes(units, 0, kind) + 2 * lu * tile * 4


def _sweep_spill_bytes(n: int, units, tile: int, chunk: int,
                       kind: str) -> int:
    """Joint VMEM footprint of the HBM-streamed reverse sweep: samples
    block (double-buffered), trunk weights, the backward carry, and the
    three chunk rings (hist in, dout in, dgates out)."""
    lu_pad = _round8(STATE_ROWS[kind] * sum(units))
    u_pad = _round8(units[0])
    dgr_pad = _round8(_dg_rows(units, kind))
    return (
        2 * _round8(n) * tile * 4
        + 2 * _weight_bytes(units, 0, kind)
        + 2 * lu_pad * tile * 4
        + 2 * chunk * (lu_pad + u_pad + dgr_pad) * tile * 4
    )


def _plan_split(n: int, units, batch, kind: str):
    """(variant, tile, chunk) for the rollout + sweep pair, sized by the
    sweep (the larger kernel), mirroring ``_plan``'s resident-first
    preference."""
    if _sweep_bytes(n, units, _MIN_TILE, kind) <= _VMEM_BUDGET:
        res_tile = cap_tile(batch, _MAX_TILE)
        while res_tile > _MIN_TILE and (
            _sweep_bytes(n, units, res_tile, kind) > _VMEM_BUDGET
        ):
            res_tile //= 2
        return "resident", res_tile, None
    sp_tile = cap_tile(batch, _MAX_TILE)
    while sp_tile > _MIN_TILE and (
        _sweep_spill_bytes(n, units, sp_tile, _SPILL_MIN_CHUNK, kind)
        > _VMEM_BUDGET
    ):
        sp_tile //= 2
    chunk = _SPILL_MIN_CHUNK
    while (
        2 * chunk <= _SPILL_MAX_CHUNK
        and 2 * chunk < n
        and _sweep_spill_bytes(n, units, sp_tile, 2 * chunk, kind)
        <= _VMEM_BUDGET
    ):
        chunk *= 2
    return "spill", sp_tile, chunk


def supports_split(n: int, units, kind: str = "gru") -> bool:
    """Reach of the rollout + dout-seeded sweep pair (the CRNNU1 jacobian
    path): VMEM-resident or the HBM-streamed spill variant (the rollout
    kernel is strictly smaller than the sweep in both regimes)."""
    return len(set(units)) == 1 and (
        _sweep_bytes(n, units, _MIN_TILE, kind) <= _VMEM_BUDGET
        or _sweep_spill_bytes(n, units, _MIN_TILE, _SPILL_MIN_CHUNK, kind)
        <= _VMEM_BUDGET
    )


def _relay_out(a, nchunks, chunk, n, rows, b_pad, b):
    """(tiles, nchunks, chunk, R_pad, tile) chunk-major kernel output ->
    (N, rows, B) resident layout (one transpose+reshape pass in HBM)."""
    a = jnp.transpose(a, (1, 2, 3, 0, 4))
    return a.reshape(nchunks * chunk, a.shape[2], b_pad)[:n, :rows, :b]


def _relay_in(a, rows_pad, nchunks, chunk, tile, n):
    """(N, rows, B_total) resident layout -> (tiles, nchunks, chunk,
    rows_pad, tile) chunk-major kernel input (zero-padded)."""
    rows, total = a.shape[1], a.shape[2]
    num_tiles = total // tile
    out = jnp.zeros((nchunks * chunk, rows_pad, total), a.dtype)
    out = out.at[:n, :rows, :].set(a)
    out = out.reshape(nchunks, chunk, rows_pad, num_tiles, tile)
    return jnp.transpose(out, (3, 0, 1, 2, 4))


def rollout_hist(params, samples: jax.Array) -> jax.Array:
    """Fused teacher-forced rollout: the (N, STATE_ROWS*L*U, S) post-step
    state history of every site (the jnp twin is vmc/jacobian._rollout).
    Beyond-VMEM shapes stream the history out through the chunk ring
    (``_make_rollout_spill_kernel``)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    assert supports_split(n, units, kind)
    variant, tile, chunk = _plan_split(n, units, b, kind)
    lu = STATE_ROWS[kind] * num_layers * u
    if variant == "resident":
        # the rollout kernel is smaller than the sweep: it can often take a
        # wider tile than the plan's sweep-sized one
        tile = cap_tile(b, _MAX_TILE)
        while tile > _MIN_TILE and (
            _rollout_bytes(n, units, tile, kind) > _VMEM_BUDGET
        ):
            tile //= 2
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    if variant == "spill":
        num_tiles = b_pad // tile
        nchunks = -(-n // chunk)
        lu_pad = _round8(lu)
        hist_o = pl.pallas_call(
            _make_rollout_spill_kernel(num_layers, kind, chunk),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + _trunk_specs(u, num_layers, kind),
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct(
                (num_tiles, nchunks, chunk, lu_pad, tile), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * chunk, lu_pad, tile), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(seq, *_weightsT_trunk(params))
        return _relay_out(hist_o, nchunks, chunk, n, lu, b_pad, b)

    hist = pl.pallas_call(
        _make_rollout_kernel(num_layers, kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _trunk_specs(u, num_layers, kind),
        out_specs=pl.BlockSpec(
            (n, lu, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, lu, b_pad), jnp.float32),
    )(seq, *_weightsT_trunk(params))
    return hist[:, :, :b]


def sweep_dgates(params, samples: jax.Array, hist: jax.Array, douts):
    """Reverse sweep for one or more top-output cotangent sets.

    ``douts`` is a list of (N, U_top, S) feature-major seed blocks sharing
    the primal ``hist``; the parts are packed side-by-side on the batch
    lanes (each lane's reverse recursion is independent) so P parts cost
    one kernel pass.  Returns one (N, 4*L*U, S) dgates block per part
    (row packing as in ``jac_sweep``)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    assert supports_split(n, units, kind)
    p_parts = len(douts)

    # Tile caps at ONE part's lane count: each part is padded to s_pad (a
    # tile multiple) independently, so a tile wider than b can only add
    # padding lanes — the waste cap_tile exists to prevent.
    variant, tile, chunk = _plan_split(n, units, b, kind)
    s_pad = _round_up(max(b, 8), tile)
    total = p_parts * s_pad

    lu = STATE_ROWS[kind] * num_layers * u
    dgr = _dg_rows(units, kind)

    seq1 = jnp.zeros((n, s_pad), jnp.int32).at[:, :b].set(samples.T)
    seq = jnp.concatenate([seq1] * p_parts, axis=1)
    hist1 = jnp.zeros((n, lu, s_pad), jnp.float32).at[:, :, :b].set(hist)
    hist_in = jnp.concatenate([hist1] * p_parts, axis=2)
    dout_in = jnp.concatenate(
        [
            jnp.zeros((n, u, s_pad), jnp.float32).at[:, :, :b].set(d)
            for d in douts
        ],
        axis=2,
    )

    if variant == "spill":
        num_tiles = total // tile
        nchunks = -(-n // chunk)
        lu_pad, u_pad, dgr_pad = _round8(lu), _round8(u), _round8(dgr)
        dg_o = pl.pallas_call(
            _make_sweep_spill_kernel(num_layers, kind, chunk),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ] + _trunk_specs(u, num_layers, kind) + [
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            out_shape=jax.ShapeDtypeStruct(
                (num_tiles, nchunks, chunk, dgr_pad, tile), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * chunk, lu_pad, tile), jnp.float32),
                pltpu.VMEM((2 * chunk, u_pad, tile), jnp.float32),
                pltpu.VMEM((2 * chunk, dgr_pad, tile), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(
            seq,
            _relay_in(dout_in, u_pad, nchunks, chunk, tile, n),
            *_weightsT_trunk(params),
            _relay_in(hist_in, lu_pad, nchunks, chunk, tile, n),
        )
        dg = _relay_out(dg_o, nchunks, chunk, n, dgr, total, total)
        return [
            dg[:, :, p * s_pad : p * s_pad + b] for p in range(p_parts)
        ]

    dg = pl.pallas_call(
        _make_sweep_kernel(num_layers, kind),
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, u, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + _trunk_specs(u, num_layers, kind) + [
            pl.BlockSpec((n, lu, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n, dgr, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, dgr, total), jnp.float32),
    )(seq, dout_in, *_weightsT_trunk(params), hist_in)
    return [
        dg[:, :, p * s_pad : p * s_pad + b] for p in range(p_parts)
    ]


# ---------------------------------------------------------------------------
# outside contraction: emitted blocks -> per-sample rows (MXU)
# ---------------------------------------------------------------------------


def _con(x, dg):
    """Site-axis contraction: (N, I, S), (N, G, S) -> (S, I, G) per-sample
    rows (the feature-major twin of vmc/jacobian._contract_layer's
    ``einsum('tsi,tsg->sig')``)."""
    return jnp.einsum("nis,ngs->sig", x, dg)


def _shift_sites(a):
    """Site n -> its predecessor's block (zeros at n=0)."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def input_onehot_rows(samples: jax.Array) -> jax.Array:
    """Layer-0 input one-hots, feature-major (N, 2, S): the one-hot of the
    previous site's spin, zeros at site 0."""
    b, n = samples.shape
    s_f = samples.T.astype(jnp.float32)  # (N, S)
    x_prev = _shift_sites(s_f[:, None, :])[:, 0]  # (N, S)
    scale = jnp.concatenate(
        [jnp.zeros((1, b), jnp.float32), jnp.ones((n - 1, b), jnp.float32)]
    )
    return jnp.stack([(1.0 - x_prev) * scale, x_prev * scale], axis=1)


def trunk_rows_from_sweep(params, hist: jax.Array, dg: jax.Array,
                          x0: jax.Array):
    """Per-sample trunk weight rows from one sweep's emitted blocks: the
    list of per-layer dicts matching ``vmc/jacobian._contract_layer``'s
    values and layout."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    u = params["rnn"][0]["wh"].shape[0]
    hist_p = _shift_sites(hist)
    rows = []
    for l in range(num_layers):
        base = 4 * u * l
        if kind == "gru":
            h_prev = hist_p[:, l * u : (l + 1) * u]
            da = dg[:, base : base + 3 * u]
            dgh_c = dg[:, base + 3 * u : base + 4 * u]
            x = x0 if l == 0 else hist[:, (l - 1) * u : l * u]
            # dgh = [da_r; da_z; dgh_c]: contract its shared 2U block from
            # da and the c-gate block from dgh_c, concatenated on the g axis
            wh = jnp.concatenate(
                [_con(h_prev, da[:, : 2 * u]), _con(h_prev, dgh_c)], axis=-1
            )
            rows.append({
                "wx": _con(x, da),
                "wh": wh,
                "bx": jnp.sum(da, axis=0).T,
                "bh": jnp.concatenate(
                    [jnp.sum(da[:, : 2 * u], axis=0),
                     jnp.sum(dgh_c, axis=0)], axis=0
                ).T,
            })
        else:
            h_prev = hist_p[:, 2 * l * u : (2 * l + 1) * u]
            da = dg[:, base : base + 4 * u]
            x = x0 if l == 0 else hist[:, 2 * (l - 1) * u : (2 * l - 1) * u]
            rows.append({
                "wx": _con(x, da),
                "wh": _con(h_prev, da),
                "b": jnp.sum(da, axis=0).T,
            })
    return rows


def top_rows(params, hist: jax.Array) -> jax.Array:
    """The top layer's post-step h rows, (N, U, S)."""
    num_layers = len(params["rnn"])
    u = params["rnn"][0]["wh"].shape[0]
    if _cell_kind(params) == "gru":
        return hist[:, (num_layers - 1) * u :]
    return hist[:, 2 * (num_layers - 1) * u : (2 * num_layers - 1) * u]


def prnn1d_rows(ansatz, params, samples: jax.Array):
    """Fused twin of ``vmc/jacobian._prnn1d_log_prob_rows``: the plain
    autoregressive density's ``(log_prob, per-sample grad rows)`` with the
    two jnp scans replaced by one ``jac_sweep`` launch (same values, same
    row layout; equality pinned in tests/test_fused_jac.py)."""
    hist, dg, dl1 = jac_sweep(params, samples)
    rnn_rows = trunk_rows_from_sweep(
        params, hist, dg, input_onehot_rows(samples)
    )

    top = top_rows(params, hist)
    s_f = samples.T.astype(jnp.float32)  # (N, S)
    dlogits = jnp.stack([-dl1, dl1], axis=1)  # (N, 2, S)
    head_rows = {
        "w": _con(top, dlogits),
        "b": jnp.sum(dlogits, axis=0).T,
    }

    # log p from the stashed top states (one MXU matmul + the same
    # accum-dtype site sum as the jnp path)
    logits = jnp.einsum("nus,ud->nds", top, params["head"]["w"]) + params[
        "head"
    ]["b"][None, :, None]
    l0, l1 = logits[:, 0], logits[:, 1]
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    lp_site = jnp.where(s_f > 0.5, l1, l0) - lse  # (N, S)
    log_prob = jnp.sum(
        lp_site.astype(ansatz.accum_dtype), axis=0
    ).astype(ansatz.dtype)

    return log_prob, {"rnn": rnn_rows, "head": head_rows}
