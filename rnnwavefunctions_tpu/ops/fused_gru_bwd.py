"""Pallas TPU kernel: fused BPTT for the teacher-forced GRU log-probability.

The surrogate-loss gradient differentiates ``log_prob(params, samples)``
with a per-sample cotangent (the REINFORCE weighting).  The jnp VJP path
re-runs the site scan twice (forward recompute + reverse accumulation) with
every activation round-tripping through HBM and XLA's per-step scan
overhead; at N=100/S=500 that is ~0.44 ms of a 2.6 ms step, and ~50% of
the (much smaller) MDRNN steps.  This kernel fuses the whole VJP into one
launch: a forward replay stores the (N, L*U, T) hidden history, then a
reverse sweep recomputes the gates per site and accumulates all weight
cotangents in-register — HBM traffic is "read samples + cotangent once,
write one weight-shaped gradient per tile".

Two history placements, selected by VMEM reach:

* **resident** — the whole (N, L*U, T) history lives in a VMEM scratch
  buffer (short chains; the N=100 flagship).
* **spilled** — long chains (the reference's N=1000 published workload,
  ``/root/reference/Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`` cell 24)
  stream the history through HBM in C-site chunks with a double-buffered
  VMEM ring: the forward replay DMAs each filled chunk out while the next
  chunk computes, the reverse sweep prefetches chunk i-2 while chunk i is
  consumed, and the last two chunks are never written at all (the reverse
  sweep starts on them while they are still ring-resident).  HBM traffic
  is 2 x history bytes per tile — the same as XLA's scan VJP — but with
  none of the per-step scan dispatch overhead, no gate-activation
  round-trips (gates recompute in-register), and full DMA/compute overlap.

Gradient math (reset-after GRU, gate rows [r; z; c] as in ``fused_gru``):

    h' = z*h + (1-z)*c,  c = tanh(gx_c + r*gh_c),  r/z = sigmoid(gx + gh)
    dz = dh*(h - c);  dc = dh*(1-z);  dac = dc*(1-c^2)
    dr = dac*gh_c;    dgh_c = dac*r
    da_r = dr*r*(1-r);  da_z = dz*z*(1-z)
    da  = [da_r; da_z; dac]    (gx cotangent -> wx, bx)
    dgh = [da_r; da_z; dgh_c]  (gh cotangent -> wh, bh)
    dh_prev = dh*z + whT^T dgh

and for the 2-class softmax head, ``dlogit_1 = g*(s - p1) = -dlogit_0``.

Weight cotangents come out in the same transposed layout ``_weightsT``
feeds the kernels ((3U, in), (3U, U), (3U, 1), (3U, 1) per layer + head
(2, U), (2, 1)), summed over the batch; grid programs beyond the first
accumulate into the same output blocks.  Used by ``make_log_prob_fn``'s
backward (and, via the shared trunk helpers and ``run_history_bptt``, by
the cRNN backward in ``ops/fused_crnn_bwd``).

Validated in interpret mode against ``jax.grad`` of the jnp reference path
(tests/test_fused_bwd.py) — the reference implementation of record
stays the jnp scan (CLAUDE.md architecture invariants).  Reference role:
the upstream codebase leaves this step to TF1 graph autodiff
(``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:160-164``
``optimizer.compute_gradients``); this is its TPU-native counterpart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import (
    GATE_ROWS,
    STATE_ROWS,
    TILE,
    _cell_kind,
    _round_up,
    _split_cells,
    _weightsT,
    _weightT_specs,
)

from .tiling import MIN_TILE as _MIN_TILE
from .tiling import round8 as _round8
from .tiling import cap_tile

_VMEM_BUDGET = 13 * 1024 * 1024
_MIN_CHUNK = 8    # smallest spill-ring chunk (sites per DMA)
_MAX_CHUNK = 256



# ---------------------------------------------------------------------------
# VMEM accounting (joint: history/ring + every resident piece)
# ---------------------------------------------------------------------------

def _weight_bytes(units, heads: int = 1, kind: str = "gru") -> int:
    """Bytes of one transposed weight set (per-layer gate mats + biases,
    plus ``heads`` 2-logit output heads)."""
    u = units[0]
    gr = GATE_ROWS[kind]
    total = 0
    for l in range(len(units)):
        in_dim = 2 if l == 0 else u
        total += gr * u * in_dim + gr * u * u + 2 * gr * u
    total += heads * (2 * u + 2)
    return total * 4


def _base_bytes(n: int, units, tile: int, heads: int = 1,
                kind: str = "gru") -> int:
    """VMEM-resident pieces excluding the history: the samples block, the
    cotangent row(s), the double-buffered state-cotangent carry ((L*U, T)
    dh for GRU, (2*L*U, T) [dh; dc] for LSTM), and four weight-shaped sets
    (input refs, output refs, and the two in-flight fori-loop accumulator
    carries)."""
    lu_pad = _round8(STATE_ROWS[kind] * sum(units))
    return (
        (n + heads) * tile * 4
        + 2 * lu_pad * tile * 4
        + 4 * _weight_bytes(units, heads, kind)
    )


def _hist_bytes(n: int, units, tile: int, kind: str = "gru") -> int:
    return n * _round8(STATE_ROWS[kind] * sum(units)) * tile * 4


def _ring_bytes(units, tile: int, chunk: int, kind: str = "gru") -> int:
    return 2 * chunk * _round8(STATE_ROWS[kind] * sum(units)) * tile * 4


def _pick_tile(n: int, units, batch, heads: int = 1, kind: str = "gru"):
    """(tile, spill): largest power-of-two tile (>= 128, <= the batch cap)
    whose history + resident pieces fit the VMEM budget; when even the
    minimum tile cannot hold the history, spill it to HBM and size the
    tile by the resident pieces + the minimum ring."""
    tile = cap_tile(batch, TILE)
    while tile > _MIN_TILE and (
        _base_bytes(n, units, tile, heads, kind)
        + _hist_bytes(n, units, tile, kind)
        > _VMEM_BUDGET
    ):
        tile //= 2
    if (
        _base_bytes(n, units, tile, heads, kind)
        + _hist_bytes(n, units, tile, kind)
        <= _VMEM_BUDGET
    ):
        return tile, False
    tile = cap_tile(batch, TILE)
    while tile > _MIN_TILE and (
        _base_bytes(n, units, tile, heads, kind)
        + _ring_bytes(units, tile, _MIN_CHUNK, kind)
        > _VMEM_BUDGET
    ):
        tile //= 2
    return tile, True


def _pick_chunk(n: int, units, tile: int, heads: int = 1,
                kind: str = "gru") -> int:
    """Largest power-of-two chunk whose double-buffered ring still fits the
    budget next to the resident pieces (bigger chunks mean fewer, fatter
    DMAs and longer prefetch windows)."""
    c = _MIN_CHUNK
    while (
        2 * c <= _MAX_CHUNK
        and 2 * c < n
        and _base_bytes(n, units, tile, heads, kind)
        + _ring_bytes(units, tile, 2 * c, kind)
        <= _VMEM_BUDGET
    ):
        c *= 2
    return c


def supports(n: int, units, heads: int = 1, kind: str = "gru") -> bool:
    """True when a fused backward is available: either history-resident or
    the HBM-spilled variant (which only needs the resident pieces plus the
    minimum ring to fit at the minimum tile)."""
    return (
        _base_bytes(n, units, _MIN_TILE, heads, kind)
        + _ring_bytes(units, _MIN_TILE, _MIN_CHUNK, kind)
        <= _VMEM_BUDGET
    )


# ---------------------------------------------------------------------------
# Shared forward-replay / reverse-sweep skeleton
# ---------------------------------------------------------------------------

def run_history_bptt(n_sites, lu, fwd_site, fwd_carry0, bwd_site,
                     bwd_carry0, h_hist, spill=None):
    """Forward replay storing one (lu, t) state row per site, then a
    reverse sweep feeding each site its own and its predecessor's rows.

    ``fwd_site(n, carry) -> (h_cat, carry)``;
    ``bwd_site(n, hist_n, hist_p, carry) -> carry`` (``hist_p`` is zeros at
    site 0).  Returns the final backward carry.

    Resident (``spill is None``): ``h_hist`` is a VMEM (n, lu, t) scratch.
    Spilled: ``h_hist`` is an HBM (tiles, nchunks, C, lu_pad, t) output and
    ``spill = (chunk, ring, sem_wr, sem_rd)`` with ``ring`` a VMEM
    (2*chunk, lu_pad, t) double buffer; chunks stream out during the
    forward pass and prefetch back two chunks ahead of the reverse sweep,
    and the last two chunks are never written (the sweep starts on them
    while still ring-resident).
    """
    if spill is None:
        def fbody(n, carry):
            h_cat, carry = fwd_site(n, carry)
            h_hist[pl.ds(n, 1)] = h_cat[None]
            return carry

        jax.lax.fori_loop(0, n_sites, fbody, fwd_carry0)

        def bbody(i, carry):
            n = n_sites - 1 - i
            hist_n = h_hist[pl.ds(n, 1)][0]
            hist_p = jnp.where(
                n > 0, h_hist[pl.ds(jnp.maximum(n - 1, 0), 1)][0], 0.0
            )
            return bwd_site(n, hist_n, hist_p, carry)

        return jax.lax.fori_loop(0, n_sites, bbody, bwd_carry0)

    chunk, ring, sem_wr, sem_rd = spill
    nchunks = -(-n_sites // chunk)
    tid = pl.program_id(0)

    def wr_dma(idx):
        slot = idx % 2
        return pltpu.make_async_copy(
            ring.at[pl.ds(slot * chunk, chunk)],
            h_hist.at[tid, idx],
            sem_wr.at[slot],
        )

    def rd_dma(idx):
        slot = idx % 2
        return pltpu.make_async_copy(
            h_hist.at[tid, idx],
            ring.at[pl.ds(slot * chunk, chunk)],
            sem_rd.at[slot],
        )

    # ---- forward: fill ring slots chunk by chunk, streaming filled chunks
    # out while the next computes.  Chunk j reuses the slot of j-2, so its
    # write is waited there; the last two chunks are never written.
    carry = fwd_carry0
    for idx in range(nchunks):
        rows = min(chunk, n_sites - idx * chunk)
        base = (idx % 2) * chunk
        if idx >= 2:
            wr_dma(idx - 2).wait()

        def fbody(r, carry, idx=idx, base=base):
            h_cat, carry = fwd_site(idx * chunk + r, carry)
            ring[pl.ds(base + r, 1), 0:lu, :] = h_cat[None]
            return carry

        carry = jax.lax.fori_loop(0, rows, fbody, carry)
        if idx <= nchunks - 3:
            wr_dma(idx).start()

    # ---- backward: chunks in reverse; chunk idx-2 prefetches into the
    # slot chunk idx just vacated while chunk idx-1 is consumed.  Each
    # prefetch is waited exactly once — at the chunk-boundary read (site 0
    # of the chunk above it), i.e. after nearly a full chunk of overlap.
    carry = bwd_carry0
    for ci in range(nchunks):
        idx = nchunks - 1 - ci
        rows = min(chunk, n_sites - idx * chunk)
        base = (idx % 2) * chunk
        ob = ((idx - 1) % 2) * chunk
        # recv(idx-1) exists only for prefetched chunks (idx-1 <= nchunks-3)
        needs_wait = 0 < idx <= nchunks - 2

        def bbody(i2, carry, idx=idx, rows=rows, base=base, ob=ob,
                  needs_wait=needs_wait):
            r = rows - 1 - i2
            n = idx * chunk + r
            if needs_wait:
                @pl.when(r == 0)
                def _():
                    rd_dma(idx - 1).wait()

            hist_n = ring[pl.ds(base + r, 1)][0][0:lu]
            if idx == 0:
                hist_p = jnp.where(
                    r > 0,
                    ring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu],
                    0.0,
                )
            else:
                hp_in = ring[pl.ds(base + jnp.maximum(r - 1, 0), 1)][0][0:lu]
                hp_bd = ring[pl.ds(ob + chunk - 1, 1)][0][0:lu]
                hist_p = jnp.where(r > 0, hp_in, hp_bd)
            return bwd_site(n, hist_n, hist_p, carry)

        carry = jax.lax.fori_loop(0, rows, bbody, carry)
        if idx >= 2:
            rd_dma(idx - 2).start()
    return carry


def bptt_scratch(n, lu, tile, chunk=None):
    """Scratch list for a history-BPTT kernel: the VMEM history buffer for
    the resident variant, or the chunk ring + DMA semaphores for spill."""
    if chunk is None:
        return [pltpu.VMEM((n, lu, tile), jnp.float32)]
    return [
        pltpu.VMEM((2 * chunk, _round8(lu), tile), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def bptt_hist_out(n, lu, tile, num_tiles, chunk=None):
    """(out_specs, out_shapes) for the spilled history HBM buffer (empty
    for the resident variant)."""
    if chunk is None:
        return [], []
    nchunks = -(-n // chunk)
    return (
        [pl.BlockSpec(memory_space=pltpu.HBM)],
        [jax.ShapeDtypeStruct(
            (num_tiles, nchunks, chunk, _round8(lu), tile), jnp.float32
        )],
    )


def _rowsum(a):
    return jnp.sum(a, axis=1, keepdims=True)


def _dotT_lhs(w, x):
    """w^T @ x contracting the leading (sublane) dims: (K, M), (K, T) -> (M, T)."""
    return jax.lax.dot_general(
        w, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotT_rhs(a, b):
    """a @ b^T contracting the lane dims: (M, T), (K, T) -> (M, K)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def gru_gates_recompute(cells, u, l, x_row, inp, x_scale, h_prev):
    """Recompute (r, z, c, gh_c) for layer l at one site (fused_gru gate
    order [r; z; c], reset-after)."""
    wxT, whT, bxT, bhT = cells[l]
    if l == 0:
        gx = x_scale * (
            (1.0 - x_row) * wxT[:, 0:1] + x_row * wxT[:, 1:2]
        ) + bxT
    else:
        gx = jnp.dot(wxT, inp, preferred_element_type=jnp.float32) + bxT
    gh = jnp.dot(whT, h_prev, preferred_element_type=jnp.float32) + bhT
    r = jax.nn.sigmoid(gx[:u] + gh[:u])
    z = jax.nn.sigmoid(gx[u : 2 * u] + gh[u : 2 * u])
    c = jnp.tanh(gx[2 * u :] + r * gh[2 * u :])
    return r, z, c, gh[2 * u :]


def gru_trunk_fwd_site(cells, u, num_layers, x_row, x_scale, hs):
    """One stacked-trunk forward step from per-layer states ``hs``; returns
    the new states tuple."""
    new_hs = []
    inp = None
    for l in range(num_layers):
        r, z, c, _ = gru_gates_recompute(cells, u, l, x_row, inp, x_scale, hs[l])
        h_new = z * hs[l] + (1.0 - z) * c
        new_hs.append(h_new)
        inp = h_new
    return tuple(new_hs)


def gru_trunk_bwd_site(cells, u, num_layers, x_row, x_scale,
                       hist_n, hist_p, d_top, dh_carry, accs, acc_base=0):
    """Backward through the stacked trunk at one site.

    ``hist_n``/``hist_p`` are the (L*U, T) state blocks at this and the
    previous site; ``d_top`` the cotangent into the top-layer output from
    the head(s); ``dh_carry`` the (L*U, T) recurrent cotangent.  Updates
    ``accs`` (list) in place at indices ``acc_base + 4l .. +3`` and returns
    the new (L*U, T) recurrent cotangent."""
    def layer_rows(block, l):
        return block[l * u : (l + 1) * u]

    d_inp = None
    new_dh = []
    for l in range(num_layers - 1, -1, -1):
        wxT, whT, _, _ = cells[l]
        h_prev = layer_rows(hist_p, l)
        inp = layer_rows(hist_n, l - 1) if l > 0 else None
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

        dh_prev = dh * z + _dotT_lhs(whT, dgh)
        new_dh.append(dh_prev)

        k = acc_base + 4 * l
        if l == 0:
            dwx0 = _rowsum(da * (x_scale * (1.0 - x_row)))
            dwx1 = _rowsum(da * (x_scale * x_row))
            dwx = jnp.concatenate([dwx0, dwx1], axis=1)     # (3U, 2)
            d_inp = None
        else:
            dwx = _dotT_rhs(da, inp)                        # (3U, U)
            d_inp = _dotT_lhs(wxT, da)                      # (U, T)
        accs[k] = accs[k] + dwx
        accs[k + 1] = accs[k + 1] + _dotT_rhs(dgh, h_prev)
        accs[k + 2] = accs[k + 2] + _rowsum(da)
        accs[k + 3] = accs[k + 3] + _rowsum(dgh)

    new_dh.reverse()
    return new_dh[0] if num_layers == 1 else jnp.concatenate(new_dh, axis=0)


def lstm_gates_recompute(cells, u, l, x_row, inp, x_scale, h_prev):
    """Recompute (si, tj, sf, so) for LSTM layer l at one site (fused_gru
    gate order [i | j | f | o], TF forget_bias = 1.0; the single TF bias is
    carried in the bxT slot, bhT is identically zero)."""
    wxT, whT, bxT, bhT = cells[l]
    if l == 0:
        gx = x_scale * (
            (1.0 - x_row) * wxT[:, 0:1] + x_row * wxT[:, 1:2]
        ) + bxT
    else:
        gx = jnp.dot(wxT, inp, preferred_element_type=jnp.float32) + bxT
    g = gx + jnp.dot(whT, h_prev, preferred_element_type=jnp.float32) + bhT
    si = jax.nn.sigmoid(g[:u])
    tj = jnp.tanh(g[u : 2 * u])
    sf = jax.nn.sigmoid(g[2 * u : 3 * u] + 1.0)
    so = jax.nn.sigmoid(g[3 * u :])
    return si, tj, sf, so


def lstm_trunk_fwd_site(cells, u, num_layers, x_row, x_scale, hcs):
    """One stacked LSTM forward step from per-layer (h, c) pairs; returns
    the new pairs tuple."""
    new = []
    inp = None
    for l in range(num_layers):
        h_prev, c_prev = hcs[l]
        si, tj, sf, so = lstm_gates_recompute(
            cells, u, l, x_row, inp, x_scale, h_prev
        )
        c_new = c_prev * sf + si * tj
        h_new = jnp.tanh(c_new) * so
        new.append((h_new, c_new))
        inp = h_new
    return tuple(new)


def lstm_trunk_bwd_site(cells, u, num_layers, x_row, x_scale,
                        hist_n, hist_p, d_top, dhc_carry, accs,
                        acc_base=0):
    """Backward through the stacked LSTM trunk at one site.

    ``hist_n``/``hist_p`` are (2*L*U, T) [h; c]-per-layer blocks at this
    and the previous site; ``dhc_carry`` the (2*L*U, T) [dh; dc] recurrent
    cotangent.  Gradient math (TF LSTMCell, forget_bias = 1.0):

        c' = c*sf + si*tj,  h' = tanh(c')*so
        dso = dh*tanh(c');           da_o = dso*so*(1-so)
        dc  = dh*so*(1-tanh(c')^2) + dc_carry
        da_f = dc*c * sf*(1-sf);     da_i = dc*tj * si*(1-si)
        da_j = dc*si * (1-tj^2);     dc_prev = dc*sf
        dh_prev = wh^T [da_i; da_j; da_f; da_o]

    Updates ``accs`` in place and returns the new (2*L*U, T) cotangent."""
    def h_rows(block, l):
        return block[2 * l * u : (2 * l + 1) * u]

    def c_rows(block, l):
        return block[(2 * l + 1) * u : (2 * l + 2) * u]

    d_inp = None
    new_dh, new_dc = [], []
    for l in range(num_layers - 1, -1, -1):
        wxT, whT, _, _ = cells[l]
        h_prev = h_rows(hist_p, l)
        c_prev = c_rows(hist_p, l)
        c_new = c_rows(hist_n, l)
        inp = h_rows(hist_n, l - 1) if l > 0 else None
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

        k = acc_base + 4 * l
        if l == 0:
            dwx0 = _rowsum(da * (x_scale * (1.0 - x_row)))
            dwx1 = _rowsum(da * (x_scale * x_row))
            dwx = jnp.concatenate([dwx0, dwx1], axis=1)     # (4U, 2)
            d_inp = None
        else:
            dwx = _dotT_rhs(da, inp)                        # (4U, U)
            d_inp = _dotT_lhs(wxT, da)                      # (U, T)
        accs[k] = accs[k] + dwx
        accs[k + 1] = accs[k + 1] + _dotT_rhs(da, h_prev)
        accs[k + 2] = accs[k + 2] + _rowsum(da)
        # accs[k + 3] is the artificial all-zero bhT slot: leave it zero

    new_dh.reverse()
    new_dc.reverse()
    return jnp.concatenate(
        [r for pair in zip(new_dh, new_dc) for r in pair], axis=0
    )


def accumulate_grad_outputs(grefs, accs):
    """Write per-tile accumulators to the gradient outputs: program 0
    initializes, later programs accumulate."""
    first = pl.program_id(0) == 0
    for ref, acc in zip(grefs, accs):
        @pl.when(first)
        def _(ref=ref, acc=acc):
            ref[:] = acc

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, acc=acc):
            ref[:] = ref[:] + acc


def _make_bwd_kernel(num_layers: int, chunk=None, kind: str = "gru"):
    nw = 4 * num_layers + 2
    sr = STATE_ROWS[kind]

    def kernel(samples_ref, g_ref, *rest):
        wrefs = rest[:nw]
        grefs = rest[nw : 2 * nw]
        aux = rest[2 * nw :]
        if chunk is None:
            (h_hist,) = aux
            spill = None
        else:
            h_hist, ring, sem_wr, sem_rd = aux
            spill = (chunk, ring, sem_wr, sem_rd)
        n_sites = samples_ref.shape[0]
        t = g_ref.shape[1]
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        lu = sr * num_layers * u

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)  # (1, T)

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

        g = g_ref[:]  # (1, T) per-sample cotangent

        def bwd_site(n, hist_n, hist_p, carry):
            dh_carry, accs = carry
            s_n = read_s(n)
            x_row = jnp.where(n > 0, read_s(jnp.maximum(n - 1, 0)), 0.0)
            x_scale = jnp.where(n > 0, 1.0, 0.0)

            # head: logits from the top-layer h state
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
            dl1 = g * (s_n - p1)
            dlogits = jnp.concatenate([-dl1, dl1], axis=0)  # (2, T)
            d_top = (hwT[1:2] - hwT[0:1]).T * dl1           # (U, T)

            new_accs = list(accs)
            new_accs[nw - 2] = accs[nw - 2] + _dotT_rhs(dlogits, h_top)
            new_accs[nw - 1] = accs[nw - 1] + _rowsum(dlogits)

            trunk_bwd = (
                gru_trunk_bwd_site if kind == "gru" else lstm_trunk_bwd_site
            )
            dh_cat = trunk_bwd(
                cells, u, num_layers, x_row, x_scale,
                hist_n, hist_p, d_top, dh_carry, new_accs,
            )
            return dh_cat, tuple(new_accs)

        if kind == "gru":
            hs0 = tuple(
                jnp.zeros((u, t), jnp.float32) for _ in range(num_layers)
            )
        else:
            z = jnp.zeros((u, t), jnp.float32)
            hs0 = tuple((z, z) for _ in range(num_layers))
        fwd0 = (hs0, jnp.zeros((1, t), jnp.float32))
        accs0 = tuple(jnp.zeros_like(r[:]) for r in wrefs)
        bwd0 = (jnp.zeros((lu, t), jnp.float32), accs0)
        _, accs = run_history_bptt(
            n_sites, lu, fwd_site, fwd0, bwd_site, bwd0, h_hist, spill
        )
        accumulate_grad_outputs(grefs, accs)

    return kernel


def gru_log_prob_bwd(params, samples: jax.Array, g: jax.Array):
    """VJP of ``log_prob(params, samples)`` w.r.t. params for cotangent
    ``g`` (B,).  Returns a params-pytree of gradients."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
    assert supports(n, units, kind=kind), (
        f"fused {kind} BPTT unsupported for N={n}, units={units} "
        "(resident pieces exceed the VMEM budget)"
    )
    tile, spill = _pick_tile(n, units, b, kind=kind)
    chunk = _pick_chunk(n, units, tile, kind=kind) if spill else None
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)
    g_row = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(g)

    wspecs = _weightT_specs(u, num_layers, kind)
    wshapes = [
        jax.ShapeDtypeStruct(s.block_shape, jnp.float32) for s in wspecs
    ]
    out_specs = tuple(
        pl.BlockSpec(s.block_shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in wspecs
    )
    lu = STATE_ROWS[kind] * num_layers * u
    hist_specs, hist_shapes = bptt_hist_out(n, lu, tile, b_pad // tile, chunk)

    outs = pl.pallas_call(
        _make_bwd_kernel(num_layers, chunk, kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=out_specs + tuple(hist_specs),
        out_shape=tuple(wshapes) + tuple(hist_shapes),
        scratch_shapes=bptt_scratch(n, lu, tile, chunk),
    )(seq, g_row, *_weightsT(params))

    rnn = []
    for l in range(num_layers):
        dwxT, dwhT, dbxT, _ = outs[4 * l : 4 * l + 4]
        if kind == "lstm":
            # the single TF bias rides the bxT slot (bhT is the artificial
            # zero weight — its cotangent is dropped, matching _weightsT)
            rnn.append({"wx": dwxT.T, "wh": dwhT.T, "b": dbxT[:, 0]})
        else:
            dbhT = outs[4 * l + 3]
            rnn.append({
                "wx": dwxT.T, "wh": dwhT.T,
                "bx": dbxT[:, 0], "bh": dbhT[:, 0],
            })
    dhwT, dhbT = outs[4 * num_layers], outs[4 * num_layers + 1]
    return {"rnn": rnn, "head": {"w": dhwT.T, "b": dhbT[:, 0]}}
