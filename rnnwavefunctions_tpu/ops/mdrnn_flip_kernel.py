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

from .fused_gru import _logp_rows, _round_up
from .fused_mdrnn import _mdrnn_site_rows, _mdrnn_weightsT, _mdrnn_weightT_specs
from .seeding import TILE_SEED_STRIDE

GROUP = 8
_MIN_TILE = 128
# Joint budget for the cell-output history + per-trajectory row buffer
# (VMEM ~16 MB/core; the TFIM kernels run at 14 MB accounted).  14 MB
# reaches 18x18 lattices at 50 units with the minimum tile (13.4 MB).
_VMEM_BUDGET = 14 * 1024 * 1024


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _bytes(nx: int, ny: int, u: int, tile: int) -> int:
    ns = nx * ny
    hist = ns * _round8(u) * tile * 4
    rowbuf = nx * _round8(u) * GROUP * tile * 4
    return hist + rowbuf


def _pick_tile(nx: int, ny: int, u: int, batch=None) -> int:
    from .tfim_flip_kernel import _batch_cap

    tile = min(256, _batch_cap(batch))
    while tile > _MIN_TILE and _bytes(nx, ny, u, tile) > _VMEM_BUDGET:
        tile //= 2
    return tile


def supports(nx: int, ny: int, u: int) -> bool:
    """VMEM reach.  (An earlier >=25-site crossover gate reflected the
    pre-vectorization select chain; with lane-indexed iota selects the
    wavefront wins even at 4x4 — 2333 vs 1855 steps/s at 50 units, S=500.)
    Lattices with a single row or column have no vertical/horizontal
    neighbor structure worth the wavefront; they fall back too."""
    return nx >= 2 and ny >= 2 and _bytes(nx, ny, u, _MIN_TILE) <= _VMEM_BUDGET


def visit_order(nx: int, ny: int):
    """Boustrophedon (visit-order) lattice coordinates: arrays (NS,) of x, y."""
    yy = np.repeat(np.arange(ny), nx)
    kk = np.tile(np.arange(nx), ny)
    xx = np.where(yy % 2 == 0, kk, nx - 1 - kk)
    return xx, yy


def _make_kernel(nx: int, ny: int, sample_mode: bool = False):
    ns = nx * ny

    def kernel(*refs):
        if sample_mode:
            (seed_ref, uhT, uvT, whT, wvT, bT, hwT, hbT,
             samples_ref, eoff_ref, lp_ref,
             cell_hist, pfx, rowbuf, wf_h, wf_x, wf_acc) = refs
            pltpu.prng_seed(
                seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE
            )
        else:
            (samples_ref, uhT, uvT, whT, wvT, bT, hwT, hbT,
             eoff_ref, lp_ref,
             cell_hist, pfx, rowbuf, wf_h, wf_x, wf_acc) = refs
        t = eoff_ref.shape[1]
        u = whT.shape[0]
        w = (uhT[:], uvT[:], whT[:], wvT[:], bT[:], hwT[:], hbT[:])
        zero_row = jnp.zeros((1, t), jnp.float32)

        def read_s(m):
            return samples_ref[pl.ds(m, 1), :].astype(jnp.float32)  # (1, T)

        def coords(m):
            yy = m // nx
            k = m % nx
            even = yy % 2 == 0
            xx = jnp.where(even, k, nx - 1 - k)
            vis_up = (yy - 1) * nx + jnp.where(even, nx - 1 - xx, xx)
            return yy, k, xx, vis_up

        # ---- base pass (visit order) ------------------------------------
        def base_body(m, carry):
            h_h, x_h, acc = carry
            yy, k, xx, vis_up = coords(m)
            sh = jnp.where(k > 0, 1.0, 0.0)
            sv = jnp.where(yy > 0, 1.0, 0.0)
            h_h = jnp.where(k > 0, h_h, 0.0)
            x_h = jnp.where(k > 0, x_h, 0.0)
            h_v = jnp.where(
                yy > 0, cell_hist[pl.ds(jnp.maximum(vis_up, 0), 1)][0], 0.0
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
                samples_ref[pl.ds(m, 1), :] = s.astype(jnp.int32)
            else:
                s = read_s(m)
            acc = acc + _logp_rows(l0, l1, s)
            cell_hist[pl.ds(m, 1)] = h_new[None]
            pfx[pl.ds(m, 1), :] = acc
            return h_new, s, acc

        h0 = jnp.zeros((u, t), jnp.float32)
        _, _, lp_base = jax.lax.fori_loop(
            0, ns, base_body, (h0, zero_row, zero_row)
        )
        lp_ref[:] = lp_base

        # ---- grouped wavefront over flips (flip index f = visit position) --
        num_groups = -(-ns // GROUP)

        def init_col(f):
            """Flip f's suffix starts AT position f (flipped target there)."""
            k = f % GROUP
            sl = pl.ds(k * t, t)
            _, kf, _, _ = coords(f)
            wf_h[:, sl] = jnp.where(
                kf > 0, cell_hist[pl.ds(jnp.maximum(f - 1, 0), 1)][0], 0.0
            )
            wf_x[:, sl] = jnp.where(
                kf > 0, read_s(jnp.maximum(f - 1, 0)), 0.0
            )
            wf_acc[:, sl] = jnp.where(
                f > 0, pfx[pl.ds(jnp.maximum(f - 1, 0), 1), :], zero_row
            )

        def group_body(g, _):
            g0 = g * GROUP
            init_col(g0)

            def site_body(m, _):
                @pl.when((m > g0) & (m < jnp.minimum(g0 + GROUP, ns)))
                def _():
                    init_col(m)

                yy, k, xx, vis_up = coords(m)
                sh = jnp.where(k > 0, 1.0, 0.0)
                sv = jnp.where(yy > 0, 1.0, 0.0)
                s_m = read_s(m)
                s_up = jnp.where(yy > 0, read_s(jnp.maximum(vis_up, 0)), 0.0)
                h_v_base = jnp.where(
                    yy > 0,
                    cell_hist[pl.ds(jnp.maximum(vis_up, 0), 1)][0],
                    0.0,
                )                                             # (U, T)
                h_v_wf = rowbuf[pl.ds(xx, 1)][0]              # (U, GROUP*T)

                # per-column flip index as a lane-indexed iota: column block
                # k serves flip f = g0 + k, so one vectorized compare per
                # quantity replaces a GROUP-long unrolled select chain
                f_lane = g0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, GROUP * t), 1
                ) // t                                        # (1, G*T)
                s_m_t = jnp.concatenate([s_m] * GROUP, axis=1)
                s_up_t = jnp.concatenate([s_up] * GROUP, axis=1)
                flip_here = jnp.where(m == f_lane, 1.0, 0.0)
                tgt = jnp.abs(s_m_t - flip_here)              # (1, G*T)
                flip_up = jnp.where(vis_up == f_lane, 1.0, 0.0)
                x_v = jnp.abs(s_up_t - sv * flip_up)
                # vertical state: wavefront-recomputed iff source >= f
                h_v = jnp.where(
                    vis_up >= f_lane,
                    h_v_wf,
                    jnp.concatenate([h_v_base] * GROUP, axis=1),
                )

                h_h = jnp.where(k > 0, wf_h[:], 0.0)
                x_h = jnp.where(k > 0, wf_x[:], 0.0)
                h_new, l0, l1 = _mdrnn_site_rows(
                    x_h, sh, x_v, sv, h_h, h_v, w
                )
                wf_h[:] = h_new
                wf_x[:] = tgt
                wf_acc[:] = wf_acc[:] + _logp_rows(l0, l1, tgt)
                rowbuf[pl.ds(xx, 1)] = h_new[None]
                return 0

            jax.lax.fori_loop(g0, ns, site_body, 0)

            for kk_ in range(GROUP):
                f = g0 + kk_

                @pl.when(f < ns)
                def _():
                    acc = wf_acc[:, pl.ds(kk_ * t, t)]
                    eoff_ref[:] = eoff_ref[:] + jnp.exp(
                        0.5 * (acc - lp_base)
                    )

            return 0

        eoff_ref[:] = zero_row
        jax.lax.fori_loop(0, num_groups, group_body, 0)

    return kernel


def _scratch(nx, ny, u, tile):
    ns = nx * ny
    return [
        pltpu.VMEM((ns, u, tile), jnp.float32),
        pltpu.VMEM((ns, tile), jnp.float32),
        pltpu.VMEM((nx, u, GROUP * tile), jnp.float32),
        pltpu.VMEM((u, GROUP * tile), jnp.float32),
        pltpu.VMEM((1, GROUP * tile), jnp.float32),
        pltpu.VMEM((1, GROUP * tile), jnp.float32),
    ]


def mdrnn_flip_ratio_sum(params, samples: jax.Array, nx: int, ny: int):
    """samples (B, Nx, Ny) int -> (ratio_sum (B,), base_log_prob (B,))."""
    b = samples.shape[0]
    u = params["cell"]["wh"].shape[0]
    ns = nx * ny
    tile = _pick_tile(nx, ny, u, b)
    b_pad = _round_up(max(b, 8), tile)
    xx, yy = visit_order(nx, ny)
    seq_v = samples[:, xx, yy].T  # (NS, B), visit order
    seq = jnp.zeros((ns, b_pad), jnp.int32).at[:, :b].set(seq_v)

    eoff, lp = pl.pallas_call(
        _make_kernel(nx, ny),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((ns, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
        scratch_shapes=_scratch(nx, ny, u, tile),
    )(seq, *_mdrnn_weightsT(params))
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
    tile = _pick_tile(nx, ny, u, num_samples)
    b_pad = _round_up(max(num_samples, 8), tile)

    seq, eoff, lp = pl.pallas_call(
        _make_kernel(nx, ny, sample_mode=True),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=(
            pl.BlockSpec((ns, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ns, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
        scratch_shapes=_scratch(nx, ny, u, tile),
    )(seed.reshape(1, 1).astype(jnp.int32), *_mdrnn_weightsT(params))
    # visit order (NS, B) -> lattice (B, Nx, Ny)
    xx, yy = visit_order(nx, ny)
    samples = (
        jnp.zeros((num_samples, nx, ny), jnp.int32)
        .at[:, xx, yy]
        .set(seq[:, :num_samples].T)
    )
    return samples, lp[0, :num_samples], eoff[0, :num_samples]
