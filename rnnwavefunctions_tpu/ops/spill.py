"""Shared HBM-spill machinery for the wavefront estimator kernels.

Long chains whose per-site hidden-state history exceeds VMEM keep it in HBM
(as an extra kernel output indexed by the grid program id):

* the base pass streams history rows out through a ``RING_DEPTH``-slot VMEM
  ring (the DMA of site n-D completes while site n computes);
* the wavefront reads the history back **one group window at a time**
  through a double-buffered staging block — one fat DMA of up to GROUP
  contiguous rows per group, prefetched a full group ahead, instead of one
  blocking row DMA per column initialization (the round-2 protocol; at
  N=1000 that was ~N serial DMA latencies on the critical path).

Both the TFIM flip kernels and the cRNN exchange kernel use exactly this
protocol; it lives here once so a ring/accounting fix cannot silently
diverge between them.
"""

from __future__ import annotations

import jax

from .tiling import round8 as _round8
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING_DEPTH = 4  # base-pass write ring slots



def hist_out(lu: int, n: int, tile: int, num_tiles: int, spill: bool):
    """Extra HBM output carrying the spilled history ((tiles, N, LU_pad, T));
    empty for the VMEM-resident variant.  Returns (block_specs, shapes)."""
    if not spill:
        return [], []
    return (
        [pl.BlockSpec(memory_space=pltpu.HBM)],
        [jax.ShapeDtypeStruct((num_tiles, n, _round8(lu), tile), jnp.float32)],
    )


def spill_scratch(lu: int, tile: int, group: int, n: int):
    """Scratch the spill variant appends: base write ring, the
    double-buffered group staging block, and their semaphores."""
    lu_pad = _round8(lu)
    win = min(group, n)
    return [
        pltpu.VMEM((RING_DEPTH * lu_pad, tile), jnp.float32),
        pltpu.VMEM((2 * win, lu_pad, tile), jnp.float32),
        pltpu.SemaphoreType.DMA((RING_DEPTH,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]


def spill_bytes(lu: int, tile: int, group: int, n: int) -> int:
    """VMEM bytes of ``spill_scratch`` (for the kernels' joint accounting)."""
    lu_pad = _round8(lu)
    win = min(group, n)
    return (RING_DEPTH + 2 * win) * lu_pad * tile * 4


def make_hist_io(spill, h_hist, wf_h, n_sites, lu, t, group,
                 ring=None, staging=None, sem_wr=None, sem_rd=None):
    """History I/O closures over either the VMEM-resident scratch or the HBM
    ring protocol.  Returns ``(hist_write, hist_drain, stage, read_col,
    read_col_blocking)``:

    ``hist_write(n, h_new)`` stores the (LU, T) state after site n;
    ``hist_drain()`` must run after the base pass (waits in-flight writes);
    ``stage(slot, start, begin)`` starts (``begin=True``) or waits the
    staging DMA of history rows [start, start+W) into staging buffer
    ``slot`` (W = min(group, N)); no-op when resident — callers drive the
    double-buffer: wait slot g%2 for group g, then start (g+1)%2;
    ``read_col(i, k, slot, start, mask=None)`` loads history row i into
    wavefront column block k from the staged window; with ``mask`` (a
    (1, T) bool row) only the masked lanes are written (the flip-pair
    lane-packing blend — small batches pack two flips per 128-lane block);
    ``read_col_blocking(i, k)`` is the slow single-row path for reads
    outside any window (the <=3 periodic wrap bonds).
    """
    def _blend(dst_slice, src, mask):
        if mask is None:
            wf_h[:, dst_slice] = src
        else:
            wf_h[:, dst_slice] = jnp.where(mask, src, wf_h[:, dst_slice])

    if not spill:
        def hist_write(n, h_new):
            h_hist[pl.ds(n, 1)] = h_new[None]

        def hist_drain():
            pass

        def stage(slot, start, begin):
            pass

        def read_col(i, k, slot=0, start=0, mask=None):
            _blend(pl.ds(k * t, t), h_hist[pl.ds(i, 1)][0], mask)

        return hist_write, hist_drain, stage, read_col, read_col

    lu_pad = _round8(lu)
    win = min(group, n_sites)
    tid = pl.program_id(0)

    def _ring_dma(slot, i):
        return pltpu.make_async_copy(
            ring.at[pl.ds(slot * lu_pad, lu_pad)],
            h_hist.at[tid, i],
            sem_wr.at[slot],
        )

    def hist_write(n, h_new):
        slot = n % RING_DEPTH
        # the slot's previous DMA (site n-DEPTH) must have drained
        @pl.when(n >= RING_DEPTH)
        def _():
            _ring_dma(slot, n - RING_DEPTH).wait()

        ring[pl.ds(slot * lu_pad, lu), :] = h_new
        _ring_dma(slot, n).start()

    def hist_drain():
        for d in range(RING_DEPTH):
            i = n_sites - RING_DEPTH + d
            if i >= 0:
                _ring_dma(i % RING_DEPTH, i).wait()

    def _stage_dma(slot, start):
        return pltpu.make_async_copy(
            h_hist.at[tid, pl.ds(start, win)],
            staging.at[pl.ds(slot * win, win)],
            sem_rd.at[slot],
        )

    def stage(slot, start, begin):
        dma = _stage_dma(slot, start)
        if begin:
            dma.start()
        else:
            dma.wait()

    def read_col(i, k, slot, start, mask=None):
        _blend(
            pl.ds(k * t, t),
            staging[pl.ds(slot * win + (i - start), 1)][0][0:lu, :],
            mask,
        )

    def read_col_blocking(i, k, mask=None):
        cp = pltpu.make_async_copy(
            h_hist.at[tid, i], staging.at[0], sem_rd.at[0]
        )
        cp.start()
        cp.wait()
        _blend(pl.ds(k * t, t), staging[pl.ds(0, 1)][0][0:lu, :], mask)

    return hist_write, hist_drain, stage, read_col, read_col_blocking


def window_start(g0: int, offset: int, n_sites: int, group: int):
    """Clamped start row of a group's staged history window: rows
    [start, start+W) with W = min(group, N) always inside [0, N)."""
    win = min(group, n_sites)
    s = jnp.maximum(g0 + offset, 0)
    return jnp.minimum(s, n_sites - win)
