"""Pallas TPU kernels: fused 2D MDRNN boustrophedon sweeps.

The TPU-native replacement for the reference's custom 2D cell + doubly
unrolled TF1 graph (``/root/reference/2DTFIM_2DRNN/MDRNNcell.py:51-66``,
``RNNwavefunction.py:90-113``): one kernel walks the whole Nx x Ny lattice
in visit order (left-to-right on even rows, right-to-left on odd rows),
keeping the cell weights, the carried row of vertical hidden states, and the
row of previous-row spins resident in VMEM for the entire sweep.  Lattice
boundary conditions (zero state and zero *vector* input — not a one-hot —
outside the lattice) are realized with per-site scale flags and hard selects
(the scratch is uninitialized on the first row).

Feature-major layout throughout: hidden states are (U, T) with the batch
tile on lanes, spins/log-probs are (1, T) rows, the vertical-state history is
(Nx, U, T) — per-column access is a natural leading-dim slice with no
relayouts.  Samples cross HBM once, in lattice order (flat index ny*Nx+nx);
the direction alternation is pure index arithmetic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compsum import kadd, kfinal
from .fused_gru import _logp_rows, _round_up
from .seeding import TILE_SEED_STRIDE, seed_block
from .tiling import round8 as _round8

TILE = 256
# Rollout scratch budget (same 48 MiB convention as the flip/BPTT kernels
# under the 64 MiB scoped-VMEM limit, ops/tiling.py).
_VMEM_BUDGET = 48 * 1024 * 1024


def supports(nx: int, ny: int, u: int) -> bool:
    """Rollout (sample / teacher-forced sweep) VMEM gate: the carried
    row-of-states scratch plus the resident u x u recurrent weights must
    fit — wide hidden states (u ~ 1024 on large rows) fall back to the
    jnp sweep instead of dying in a Mosaic scoped-VMEM compile error."""
    scratch = nx * _round8(u) * TILE * 4 + nx * TILE * 4
    weights = (2 * u * u + 6 * u + 4) * 4
    return scratch + weights <= _VMEM_BUDGET


def _mdrnn_site_rows(x_h, sh, x_v, sv, h_h, h_v, w):
    """One fused MDRNN cell + head step, feature-major.

    x_h/x_v: (1, T) neighbour spins; sh/sv scale flags (0 at the lattice
    boundary); h_h/h_v: (U, T).  Returns (h_new (U, T), l0, l1 (1, T)).
    """
    uhT, uvT, whT, wvT, bT, hwT, hbT = w
    pre = (
        sh * ((1.0 - x_h) * uhT[:, 0:1] + x_h * uhT[:, 1:2])
        + sv * ((1.0 - x_v) * uvT[:, 0:1] + x_v * uvT[:, 1:2])
        + jnp.dot(whT, h_h, preferred_element_type=jnp.float32)
        + jnp.dot(wvT, h_v, preferred_element_type=jnp.float32)
        + bT
    )
    # elu without expm1 (no Mosaic lowering for it); exp(x)-1 loses only
    # sub-1e-7 accuracy for |x| < 1e-7, irrelevant at f32 activations
    h_new = jnp.where(pre > 0, pre, jnp.exp(jnp.minimum(pre, 0.0)) - 1.0)
    logits = jnp.dot(hwT, h_new, preferred_element_type=jnp.float32) + hbT
    return h_new, logits[0:1, :], logits[1:2, :]


def _make_sweep_kernel(nx: int, ny: int, sample_mode: bool):
    """Kernel body shared by the teacher-forced and sampling variants."""

    def kernel(*refs):
        if sample_mode:
            (seed_ref, uhT, uvT, whT, wvT, bT, hwT, hbT,
             samples_ref, lp_ref, vh, vx) = refs
            pltpu.prng_seed(
                seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE,
                seed_ref[0, 1],
            )
        else:
            (samples_ref, uhT, uvT, whT, wvT, bT, hwT, hbT,
             lp_ref, vh, vx) = refs
        t = lp_ref.shape[1]
        u = whT.shape[0]
        w = (uhT[:], uvT[:], whT[:], wvT[:], bT[:], hwT[:], hbT[:])

        def row_body(yy, acc_cmp):
            sv_scale = jnp.where(yy > 0, 1.0, 0.0)
            even = yy % 2 == 0

            def col_body(k, carry):
                h_h, x_h, acc, cmp = carry
                xx = jnp.where(even, k, nx - 1 - k)
                flat = yy * nx + xx
                sh_scale = jnp.where(k > 0, 1.0, 0.0)
                # scratch is uninitialized on the first row: hard-select zero
                # state/input at the vertical boundary (0 * NaN would be NaN)
                h_v = jnp.where(sv_scale > 0, vh[pl.ds(xx, 1)][0], 0.0)
                x_v = jnp.where(sv_scale > 0, vx[pl.ds(xx, 1), :], 0.0)
                h_new, l0, l1 = _mdrnn_site_rows(
                    x_h, sh_scale, x_v, sv_scale, h_h, h_v, w
                )
                if sample_mode:
                    bits = pltpu.prng_random_bits((1, t))
                    usig = jax.lax.shift_right_logical(
                        pltpu.bitcast(bits, jnp.int32), 9
                    )
                    uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
                    p0 = jax.nn.sigmoid(l0 - l1)
                    s = jnp.where(uni >= p0, 1.0, 0.0)
                    samples_ref[pl.ds(flat, 1), :] = s.astype(jnp.int32)
                else:
                    s = samples_ref[pl.ds(flat, 1), :].astype(jnp.float32)
                acc, cmp = kadd(acc, cmp, _logp_rows(l0, l1, s))
                vh[pl.ds(xx, 1)] = h_new[None]
                vx[pl.ds(xx, 1), :] = s
                return h_new, s, acc, cmp

            h0 = jnp.zeros((u, t), jnp.float32)
            x0 = jnp.zeros((1, t), jnp.float32)
            acc, cmp = acc_cmp
            _, _, acc, cmp = jax.lax.fori_loop(
                0, nx, col_body, (h0, x0, acc, cmp)
            )
            return acc, cmp

        z = jnp.zeros((1, t), jnp.float32)
        lp_ref[:] = kfinal(
            *jax.lax.fori_loop(0, ny, row_body, (z, z))
        )

    return kernel


def _mdrnn_weightsT(params):
    c = params["cell"]
    h = params["head"]
    return (
        c["uh"].T, c["uv"].T, c["wh"].T, c["wv"].T, c["b"][:, None],
        h["w"].T, h["b"][:, None],
    )


def _mdrnn_weightT_specs(u):
    return [
        pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, u), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def mdrnn_log_prob(params, samples: jax.Array, nx: int, ny: int):
    """samples (B, Nx, Ny) int -> (B,) f32 joint log-prob."""
    b = samples.shape[0]
    u = params["cell"]["wh"].shape[0]
    b_pad = _round_up(max(b, 8), TILE)
    # lattice order (ny*Nx + nx, batch): samples[b, x, y] -> seq[y*nx+x, b]
    flat = jnp.transpose(samples, (2, 1, 0)).reshape(ny * nx, b)
    seq = jnp.zeros((ny * nx, b_pad), jnp.int32).at[:, :b].set(flat)

    lp = pl.pallas_call(
        _make_sweep_kernel(nx, ny, sample_mode=False),
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((ny * nx, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nx, u, TILE), jnp.float32),
            pltpu.VMEM((nx, TILE), jnp.float32),
        ],
    )(seq, *_mdrnn_weightsT(params))
    return lp[0, :b]


def mdrnn_sample(params, seed: jax.Array, num_samples: int, nx: int, ny: int):
    """Returns (samples (B, Nx, Ny) int32, log p (B,) f32)."""
    u = params["cell"]["wh"].shape[0]
    b_pad = _round_up(max(num_samples, 8), TILE)

    seq, lp = pl.pallas_call(
        _make_sweep_kernel(nx, ny, sample_mode=True),
        grid=(b_pad // TILE,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _mdrnn_weightT_specs(u),
        out_specs=(
            pl.BlockSpec((ny * nx, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ny * nx, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nx, u, TILE), jnp.float32),
            pltpu.VMEM((nx, TILE), jnp.float32),
        ],
    )(seed_block(seed), *_mdrnn_weightsT(params))
    samples = jnp.transpose(
        seq[:, :num_samples].reshape(ny, nx, num_samples), (2, 1, 0)
    )
    return samples, lp[0, :num_samples]


def make_mdrnn_log_prob_fn(jnp_log_prob, nx: int, ny: int):
    """Pallas forward; fused Pallas BPTT backward (``ops/fused_mdrnn_bwd``:
    VMEM-resident history, or row-chunk HBM-spilled beyond ~40x40), jnp
    backward only past the spill variant's own reach."""
    from . import fused_mdrnn_bwd

    @jax.custom_vjp
    def log_prob(params, samples):
        return mdrnn_log_prob(params, samples, nx, ny)

    def fwd(params, samples):
        return mdrnn_log_prob(params, samples, nx, ny), (params, samples)

    def bwd(res, g):
        params, samples = res
        u = params["cell"]["wh"].shape[0]
        if fused_mdrnn_bwd.supports(nx, ny, u):
            return (
                fused_mdrnn_bwd.mdrnn_log_prob_bwd(params, samples, g, nx, ny),
                None,
            )
        _, vjp_fn = jax.vjp(lambda p: jnp_log_prob(p, samples), params)
        (dparams,) = vjp_fn(g)
        return dparams, None

    log_prob.defvjp(fwd, bwd)
    return log_prob
