"""Pallas TPU kernel: fused BPTT for the 2D MDRNN log-probability.

The MDRNN gradient is ~50% of small-lattice VMC steps on the jnp VJP path
(scan-of-scans forward recompute + reverse, every activation through HBM).
This kernel fuses the VJP into one launch: a boustrophedon forward replay
stores the (NS, U, T) cell-output history, then a reverse sweep recomputes
each site's pre-activation and routes cotangents along both autoregressive
links — horizontal (to the previous visit position, a loop carry) and
vertical (to the same column in the row above, a per-column buffer,
mirroring the forward's carried row of vertical states).

Per site (``fused_mdrnn._mdrnn_site_rows`` conventions):

    pre = sh*onehot(x_h)·Uh + sv*onehot(x_v)·Uv + Wh·h_h + Wv·h_v + b
    h = elu(pre);  elu'(pre) = 1 if h > 0 else h + 1   (recomputed from h)
    dpre = dh * elu'(pre)
    dh_h = Wh^T dpre (k > 0);  d vh[xx] = sv * Wv^T dpre
    dUh/dUv via one-hot row sums, dWh += dpre h_h^T, dWv += dpre h_v^T

plus the 2-class softmax head backward (``dlogit_1 = g*(s - p1)``).
Weight cotangents accumulate across grid programs in the transposed
kernel layout.  Validated against ``jax.grad`` of the jnp reference path
(tests/test_fused_bwd.py) — the jnp scan stays the implementation of
record (CLAUDE.md architecture invariants).

History placement mirrors the 1D BPTT kernels (``fused_gru_bwd``):
VMEM-resident through ~40x40 at 50 units under the 48 MiB budget, and an
HBM-spilled variant beyond — row-granular chunks (``crows`` whole lattice
rows per chunk, so every horizontal link and all but the first row's
vertical links stay chunk-local) stream out through a 2-slot VMEM ring
during the forward replay and prefetch back one chunk ahead of the reverse
sweep; the chunk boundary's vertical reads (first row of chunk ``i`` into
the last row of chunk ``i-1``) ride the slot the neighbour chunk still
occupies.  The boustrophedon visit order makes the up-neighbour offset
uniform across parities: ``vis_up = m - 2*(m % nx) - 1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_gru import _round_up
from .fused_gru_bwd import (
    _MIN_TILE, _dotT_lhs, _dotT_rhs, _round8, _rowsum,
)
from .fused_mdrnn import TILE, _mdrnn_weightsT, _mdrnn_weightT_specs
from .tiling import cap_tile

# Same raised budget as the flip kernels (mdrnn_flip_kernel/tfim_flip_kernel):
# assumes every kernel-bearing jit forwards tiling.tpu_compiler_options()
# (64 MiB scoped-VMEM limit; ~5 MiB program co-residency measured on the
# training step).  Keeps the (NS, U, T) history resident through 40x40 at 50
# units — measured +26%/+19% full-step over the jnp scan-of-scans VJP at
# 24x24/32x32 S=128 (scripts/exp_scoped_budget.py mdrnn_bwd) — with the
# row-chunk HBM spill covering lattices beyond.
_VMEM_BUDGET = 48 * 1024 * 1024


def _weight_bytes(u: int) -> int:
    """One transposed weight set: uh/uv (U,2), wh/wv (U,U), b (U,1), plus
    the 2-logit head (2,U)+(2,1) — second-to-last dims pad to 8 sublanes,
    last dims to 128 lanes."""
    up, lane = _round8(u), 128
    return (2 * up * lane + 2 * up * _round_up(u, lane)
            + up * lane + 2 * 8 * lane) * 4


def _base_bytes(nx: int, ny: int, u: int, tile: int) -> int:
    """VMEM-resident pieces excluding history and the vertical-cotangent
    buffer: the samples block, the cotangent row, the dh loop carry, and
    four weight-shaped sets (input refs, output refs, and the two in-flight
    fori accumulator carries)."""
    return ((nx * ny + 8) * tile * 4 + _round8(u) * tile * 4
            + 4 * _weight_bytes(u))


def _dv_bytes(nx: int, u: int, tile: int) -> int:
    # per-column vertical cotangent buffer (always resident)
    return nx * _round8(u) * tile * 4


def _hist_bytes(nx: int, ny: int, u: int, tile: int) -> int:
    # cell-output history (resident variant only)
    return nx * ny * _round8(u) * tile * 4


def _ring_bytes(nx: int, u: int, tile: int, crows: int) -> int:
    # 2-slot row-chunk ring (spill variant only)
    return 2 * crows * nx * _round8(u) * tile * 4


def _resident_bytes(nx: int, ny: int, u: int, tile: int) -> int:
    return (_base_bytes(nx, ny, u, tile) + _dv_bytes(nx, u, tile)
            + _hist_bytes(nx, ny, u, tile))


def _spill_bytes(nx: int, ny: int, u: int, tile: int, crows: int) -> int:
    return (_base_bytes(nx, ny, u, tile) + _dv_bytes(nx, u, tile)
            + _ring_bytes(nx, u, tile, crows))


def _pick(nx: int, ny: int, u: int, batch):
    """(tile, crows): largest power-of-two tile whose resident footprint
    fits the budget (``crows=None``); beyond that, re-derive the tile from
    the spill footprint at the minimum ring and grow the chunk (rows per
    DMA) while the ring fits — bigger chunks mean fewer, fatter DMAs and a
    longer reverse-sweep prefetch window."""
    tile = cap_tile(batch, TILE)
    while tile > _MIN_TILE and _resident_bytes(nx, ny, u, tile) > _VMEM_BUDGET:
        tile //= 2
    if _resident_bytes(nx, ny, u, tile) <= _VMEM_BUDGET:
        return tile, None
    tile = cap_tile(batch, TILE)
    while tile > _MIN_TILE and _spill_bytes(nx, ny, u, tile, 1) > _VMEM_BUDGET:
        tile //= 2
    crows = 1
    while (2 * crows < ny
           and _spill_bytes(nx, ny, u, tile, 2 * crows) <= _VMEM_BUDGET):
        crows *= 2
    return tile, crows


def _pick_tile(nx: int, ny: int, u: int, batch) -> int:
    return _pick(nx, ny, u, batch)[0]


def supports(nx: int, ny: int, u: int) -> bool:
    """True when a fused backward is available: resident or row-chunk
    spilled (which only needs the resident pieces plus the minimum
    one-row ring to fit at the minimum tile)."""
    return _spill_bytes(nx, ny, u, _MIN_TILE, 1) <= _VMEM_BUDGET


def _make_bwd_kernel(nx: int, ny: int, crows=None, nchunks=None):
    ns = nx * ny

    def kernel(samples_ref, g_ref, *rest):
        wrefs = rest[:7]
        grefs = rest[7:14]
        if crows is None:
            hist, dv = rest[14], rest[15]
        else:
            hist_hbm, dv = rest[14], rest[15]
            ring, sem_wr, sem_rd = rest[16], rest[17], rest[18]
        t = g_ref.shape[1]
        u = wrefs[2].shape[0]
        uhT, uvT, whT, wvT, bT, hwT, hbT = (r[:] for r in wrefs)

        def coords(m):
            yy = m // nx
            k = m % nx
            even = yy % 2 == 0
            xx = jnp.where(even, k, nx - 1 - k)
            # up-neighbour's visit index: uniform across row parities
            vis_up = m - 2 * k - 1
            return yy, k, xx, vis_up

        def read_s(m):
            """Spin at visit position m (samples are stored lattice-flat)."""
            yy, _, xx, _ = coords(m)
            return samples_ref[
                pl.ds(yy * nx + xx, 1), :
            ].astype(jnp.float32)

        def pre_act(h_h, h_v, sh, sv, x_h, x_v):
            return (
                sh * ((1.0 - x_h) * uhT[:, 0:1] + x_h * uhT[:, 1:2])
                + sv * ((1.0 - x_v) * uvT[:, 0:1] + x_v * uvT[:, 1:2])
                + jnp.dot(whT, h_h, preferred_element_type=jnp.float32)
                + jnp.dot(wvT, h_v, preferred_element_type=jnp.float32)
                + bT
            )

        def neigh(m):
            """Masks and neighbour spins at visit m (history reads are the
            caller's: they differ between the resident and spill layouts).
            Raw history reads may be uninitialized (NaN) at the lattice
            boundary — masked with hard selects, never arithmetic."""
            yy, k, xx, vis_up = coords(m)
            sh = jnp.where(k > 0, 1.0, 0.0)
            sv = jnp.where(yy > 0, 1.0, 0.0)
            x_h = jnp.where(k > 0, read_s(jnp.maximum(m - 1, 0)), 0.0)
            x_v = jnp.where(yy > 0, read_s(jnp.maximum(vis_up, 0)), 0.0)
            return yy, k, xx, sh, sv, x_h, x_v

        def site_fwd(m, hh_raw, hv_raw):
            yy, k, xx, sh, sv, x_h, x_v = neigh(m)
            h_h = jnp.where(k > 0, hh_raw, 0.0)
            h_v = jnp.where(yy > 0, hv_raw, 0.0)
            pre = pre_act(h_h, h_v, sh, sv, x_h, x_v)
            return jnp.where(
                pre > 0, pre, jnp.exp(jnp.minimum(pre, 0.0)) - 1.0
            )

        g = g_ref[:]

        def site_bwd(m, h, hh_raw, hv_raw, carry):
            dh_carry, accs = carry
            yy, k, xx, sh, sv, x_h, x_v = neigh(m)
            h_h = jnp.where(k > 0, hh_raw, 0.0)
            h_v = jnp.where(yy > 0, hv_raw, 0.0)
            s_m = read_s(m)

            logits = jnp.dot(hwT, h, preferred_element_type=jnp.float32) + hbT
            p1 = jax.nn.sigmoid(logits[1:2] - logits[0:1])
            dl1 = g * (s_m - p1)
            dlogits = jnp.concatenate([-dl1, dl1], axis=0)

            dh = (hwT[1:2] - hwT[0:1]).T * dl1
            dh = dh + jnp.where(k < nx - 1, dh_carry, 0.0)
            dh = dh + jnp.where(yy < ny - 1, dv[pl.ds(xx, 1)][0], 0.0)

            dpre = dh * jnp.where(h > 0, 1.0, h + 1.0)

            new_carry = jnp.where(k > 0, _dotT_lhs(whT, dpre), 0.0)
            dv[pl.ds(xx, 1)] = (sv * _dotT_lhs(wvT, dpre))[None]

            duh = jnp.concatenate(
                [_rowsum(dpre * (sh * (1.0 - x_h))),
                 _rowsum(dpre * (sh * x_h))], axis=1)          # (U, 2)
            duv = jnp.concatenate(
                [_rowsum(dpre * (sv * (1.0 - x_v))),
                 _rowsum(dpre * (sv * x_v))], axis=1)
            a = list(accs)
            a[0] = accs[0] + duh
            a[1] = accs[1] + duv
            a[2] = accs[2] + _dotT_rhs(dpre, h_h)              # (U, U)
            a[3] = accs[3] + _dotT_rhs(dpre, h_v)
            a[4] = accs[4] + _rowsum(dpre)
            a[5] = accs[5] + _dotT_rhs(dlogits, h)             # (2, U)
            a[6] = accs[6] + _rowsum(dlogits)
            return new_carry, tuple(a)

        accs0 = tuple(jnp.zeros_like(r[:]) for r in wrefs)
        dh0 = jnp.zeros((u, t), jnp.float32)

        if crows is None:
            # ---- resident: full history in VMEM --------------------------
            def h_at(m):
                return hist[pl.ds(jnp.maximum(m, 0), 1)][0]

            def fwd_body(m, _):
                _, _, _, vis_up = coords(m)
                h = site_fwd(m, h_at(m - 1), h_at(vis_up))
                hist[pl.ds(m, 1)] = h[None]
                return 0

            jax.lax.fori_loop(0, ns, fwd_body, 0)

            def bwd_body(i, carry):
                m = ns - 1 - i
                _, _, _, vis_up = coords(m)
                return site_bwd(
                    m, h_at(m), h_at(m - 1), h_at(vis_up), carry
                )

            _, accs = jax.lax.fori_loop(0, ns, bwd_body, (dh0, accs0))
        else:
            # ---- spilled: row chunks stream through a 2-slot ring --------
            cs = crows * nx
            tid = pl.program_id(0)

            def wr_dma(idx):
                slot = idx % 2
                return pltpu.make_async_copy(
                    ring.at[pl.ds(slot * cs, cs)],
                    hist_hbm.at[tid, idx],
                    sem_wr.at[slot],
                )

            def rd_dma(idx):
                slot = idx % 2
                return pltpu.make_async_copy(
                    hist_hbm.at[tid, idx],
                    ring.at[pl.ds(slot * cs, cs)],
                    sem_rd.at[slot],
                )

            def ring_reads(r, sb, ob):
                """(h_h, h_v) raw rows for chunk-local offset r: horizontal
                links are always chunk-local (chunks are whole rows); the
                vertical link crosses into the neighbour chunk's slot only
                from the chunk's first row."""
                _, k, _, _ = coords(r)  # r % nx == m % nx (cs multiple of nx)
                hh = ring[pl.ds(sb + jnp.maximum(r - 1, 0), 1)][0][0:u]
                up = jnp.where(r >= nx, sb + r - 2 * k - 1, ob + cs - r - 1)
                hv = ring[pl.ds(up, 1)][0][0:u]
                return hh, hv

            # forward replay: fill ring slots chunk by chunk, streaming
            # filled chunks out while the next computes.  Chunk j reuses the
            # slot of j-2 (its write is waited there); the last two chunks
            # are never written — the reverse sweep starts on them resident.
            for idx in range(nchunks):
                rows = min(cs, ns - idx * cs)
                sb = (idx % 2) * cs
                ob = ((idx - 1) % 2) * cs
                if idx >= 2:
                    wr_dma(idx - 2).wait()

                def fbody(r, _, idx=idx, sb=sb, ob=ob):
                    hh, hv = ring_reads(r, sb, ob)
                    h = site_fwd(idx * cs + r, hh, hv)
                    ring[pl.ds(sb + r, 1), 0:u, :] = h[None]
                    return 0

                jax.lax.fori_loop(0, rows, fbody, 0)
                if idx <= nchunks - 3:
                    wr_dma(idx).start()

            # reverse sweep: chunks in reverse; chunk idx-2 prefetches into
            # the slot chunk idx just vacated while chunk idx-1 is consumed.
            # Each prefetch is waited exactly once — on entering the
            # consuming chunk's first row (r == nx-1), the only rows whose
            # vertical reads cross the chunk boundary.
            carry = (dh0, accs0)
            for ci in range(nchunks):
                idx = nchunks - 1 - ci
                rows = min(cs, ns - idx * cs)
                sb = (idx % 2) * cs
                ob = ((idx - 1) % 2) * cs
                # recv(idx-1) exists only for prefetched chunks
                needs_wait = 0 < idx <= nchunks - 2

                def bbody(i2, carry, idx=idx, rows=rows, sb=sb, ob=ob,
                          needs_wait=needs_wait):
                    r = rows - 1 - i2
                    if needs_wait:
                        @pl.when(r == nx - 1)
                        def _():
                            rd_dma(idx - 1).wait()
                    h = ring[pl.ds(sb + r, 1)][0][0:u]
                    hh, hv = ring_reads(r, sb, ob)
                    return site_bwd(idx * cs + r, h, hh, hv, carry)

                carry = jax.lax.fori_loop(0, rows, bbody, carry)
                if idx >= 2:
                    rd_dma(idx - 2).start()
            _, accs = carry

        first = pl.program_id(0) == 0
        for ref, acc in zip(grefs, accs):
            @pl.when(first)
            def _(ref=ref, acc=acc):
                ref[:] = acc

            @pl.when(jnp.logical_not(first))
            def _(ref=ref, acc=acc):
                ref[:] = ref[:] + acc

    return kernel


def mdrnn_log_prob_bwd(params, samples: jax.Array, g: jax.Array,
                       nx: int, ny: int):
    """VJP of ``mdrnn_log_prob`` w.r.t. params for cotangent ``g`` (B,)."""
    b = samples.shape[0]
    u = params["cell"]["wh"].shape[0]
    assert supports(nx, ny, u), (
        f"mdrnn_log_prob_bwd: {nx}x{ny} at {u} units exceeds the VMEM "
        "budget even row-chunk-spilled at the minimum tile — gate callers "
        "on supports() (the custom_vjp wrapper falls back to the jnp VJP)"
    )
    tile, crows = _pick(nx, ny, u, b)
    b_pad = _round_up(max(b, 8), tile)
    flat = jnp.transpose(samples, (2, 1, 0)).reshape(ny * nx, b)
    seq = jnp.zeros((ny * nx, b_pad), jnp.int32).at[:, :b].set(flat)
    g_row = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(g)

    wspecs = _mdrnn_weightT_specs(u)
    out_specs = [
        pl.BlockSpec(s.block_shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for s in wspecs
    ]
    out_shapes = [
        jax.ShapeDtypeStruct(s.block_shape, jnp.float32) for s in wspecs
    ]

    if crows is None:
        nchunks = None
        scratch = [
            pltpu.VMEM((ny * nx, u, tile), jnp.float32),
            pltpu.VMEM((nx, u, tile), jnp.float32),
        ]
    else:
        cs = crows * nx
        nchunks = -(-ny * nx // cs)
        out_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (b_pad // tile, nchunks, cs, _round8(u), tile), jnp.float32
        ))
        scratch = [
            pltpu.VMEM((nx, u, tile), jnp.float32),
            pltpu.VMEM((2 * cs, _round8(u), tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    outs = pl.pallas_call(
        _make_bwd_kernel(nx, ny, crows, nchunks),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((ny * nx, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + wspecs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
    )(seq, g_row, *_mdrnn_weightsT(params))

    duhT, duvT, dwhT, dwvT, dbT, dhwT, dhbT = outs[:7]
    return {
        "cell": {
            "uh": duhT.T, "uv": duvT.T, "wh": dwhT.T, "wv": dwvT.T,
            "b": dbT[:, 0],
        },
        "head": {"w": dhwT.T, "b": dhbT[:, 0]},
    }
