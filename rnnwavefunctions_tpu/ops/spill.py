"""Shared HBM-spill machinery for the wavefront estimator kernels.

Long chains whose per-site hidden-state history exceeds VMEM keep it in HBM
(as an extra kernel output indexed by the grid program id): the base pass
streams history rows out through a 2-slot VMEM ring (the DMA of site n-2
completes while site n computes), and each wavefront column initialization
DMAs one row back through a staging buffer.  Both the TFIM flip kernels and
the cRNN exchange kernel use exactly this protocol; it lives here once so a
ring/accounting fix cannot silently diverge between them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def hist_out(lu: int, n: int, tile: int, num_tiles: int, spill: bool):
    """Extra HBM output carrying the spilled history ((tiles, N, LU_pad, T));
    empty for the VMEM-resident variant.  Returns (block_specs, shapes)."""
    if not spill:
        return [], []
    return (
        [pl.BlockSpec(memory_space=pltpu.HBM)],
        [jax.ShapeDtypeStruct((num_tiles, n, _round8(lu), tile), jnp.float32)],
    )


def spill_scratch(lu: int, tile: int):
    """Scratch the spill variant appends: base DMA ring, read staging, and
    their semaphores."""
    lu_pad = _round8(lu)
    return [
        pltpu.VMEM((2 * lu_pad, tile), jnp.float32),
        pltpu.VMEM((lu_pad, tile), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA,
    ]


def make_hist_io(spill, h_hist, wf_h, n_sites, lu, t,
                 ring=None, staging=None, sem_wr=None, sem_rd=None):
    """(hist_write, hist_drain, hist_read_into_wf) closures over either the
    VMEM-resident history scratch or the HBM ring protocol.

    ``hist_write(n, h_new)`` stores the (LU, T) state after site n;
    ``hist_drain()`` must run after the base pass (waits the in-flight ring
    DMAs); ``hist_read_into_wf(i, k)`` loads history row i into wavefront
    column block k (callers guard i >= 0).
    """
    if not spill:
        def hist_write(n, h_new):
            h_hist[pl.ds(n, 1)] = h_new[None]

        def hist_drain():
            pass

        def hist_read_into_wf(i, k):
            wf_h[:, pl.ds(k * t, t)] = h_hist[pl.ds(i, 1)][0]

        return hist_write, hist_drain, hist_read_into_wf

    lu_pad = _round8(lu)
    tid = pl.program_id(0)

    def _ring_dma(slot, i):
        return pltpu.make_async_copy(
            ring.at[pl.ds(slot * lu_pad, lu_pad)],
            h_hist.at[tid, i],
            sem_wr.at[slot],
        )

    def hist_write(n, h_new):
        slot = n % 2
        # the slot's previous DMA (site n-2) must have drained
        @pl.when(n >= 2)
        def _():
            _ring_dma(slot, n - 2).wait()

        ring[pl.ds(slot * lu_pad, lu), :] = h_new
        _ring_dma(slot, n).start()

    def hist_drain():
        @pl.when(n_sites >= 2)
        def _():
            _ring_dma((n_sites - 2) % 2, n_sites - 2).wait()

        @pl.when(n_sites >= 1)
        def _():
            _ring_dma((n_sites - 1) % 2, n_sites - 1).wait()

    def hist_read_into_wf(i, k):
        cp = pltpu.make_async_copy(h_hist.at[tid, i], staging, sem_rd)
        cp.start()
        cp.wait()
        wf_h[:, pl.ds(k * t, t)] = staging[0:lu, :]

    return hist_write, hist_drain, hist_read_into_wf
