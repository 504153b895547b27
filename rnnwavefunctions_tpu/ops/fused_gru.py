"""Pallas TPU kernels: fused autoregressive GRU rollouts.

Why: the jnp path (``lax.scan`` of per-site ops) round-trips the hidden
state, one-hot input, and gate activations through HBM on every site step —
at N=100 sites that dominates the VMC step time (HBM-bandwidth-bound).
These kernels fuse the *entire* site loop into one ``pallas_call``: weights
and the per-tile hidden state stay resident in VMEM for all N steps, so HBM
traffic collapses to "read the samples once, write the log-probs once".
This is the TPU-native replacement for the cuDNN GRU kernel role in the
reference (``tf.contrib.cudnn_rnn.CudnnCompatibleGRUCell``,
``/root/reference/1DTFIM/RNNwavefunction.py:8``), covering uniform-width
stacked GRU and LSTM trunks + softmax head with on-site dimension 2 (the
cell kind is inferred from the parameter pytree, ``_cell_kind``).

Layout: everything is **feature-major** — hidden states (U, T) with the
batch tile on the lane dimension, spins/log-probs as (1, T) rows.  Per-site
sample access is a natural sublane slice, there are no relayouts inside the
loops, and no (x, 1) lane-padding waste.  Weights are pre-transposed at the
call boundary (wxT (3U, 2), whT (3U, U), heads (2, U), biases as columns).

Two kernels:

* ``gru_log_prob``   — teacher-forced joint log-probability of given spin
  configurations.  Exposed through a ``jax.custom_vjp`` whose backward is
  the fused Pallas BPTT kernel (``ops/fused_gru_bwd``) within VMEM reach
  and the jnp reference VJP beyond, so the same entry point is used inside
  ``jax.grad`` (the differentiable surrogate path, S rows only).
* ``gru_sample``     — autoregressive sampling with the on-core PRNG
  (inverse-CDF draws per site), returning samples and their log-density.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .compsum import kadd, kfinal
from .seeding import TILE_SEED_STRIDE, seed_block
from .tiling import cap_tile

TILE = 512  # max batch rows per grid program

# Cell kinds sharing the same fused-kernel skeleton.  Per layer the kernels
# carry a (STATE_ROWS*U, T) feature-major state block ([h] for GRU,
# [h; c] for LSTM) and a (GATE_ROWS*U, ...) packed gate pre-activation.
# LSTM weights reuse the 4-tensor-per-layer wire format by carrying the
# single TF bias as ``bx`` and an all-zero ``bh`` (the gate math adds both).
STATE_ROWS = {"gru": 1, "lstm": 2}
GATE_ROWS = {"gru": 3, "lstm": 4}


def _cell_kind(params) -> str:
    """Infer the cell kind from the parameter pytree (LSTM layers carry the
    fused TF bias ``b``; GRU layers split ``bx``/``bh`` —
    ``models/cells.py:lstm_init/gru_init``)."""
    return "lstm" if "b" in params["rnn"][0] else "gru"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _cap_tile(batch: int) -> int:
    """Batch-capped tile (shared policy, ``ops/tiling.py``) — tiles wider
    than the batch only compute padding lanes (an S=64 long-chain batch on
    the fixed 512 tile wastes 8x)."""
    return cap_tile(batch, TILE)


def _gru_layer_rows(gx, h, whT, bhT):
    """One GRU layer given the (3U, T) input-gate pre-activation ``gx``."""
    u = h.shape[0]
    gh = jnp.dot(whT, h, preferred_element_type=jnp.float32) + bhT
    r = jax.nn.sigmoid(gx[:u] + gh[:u])
    z = jax.nn.sigmoid(gx[u : 2 * u] + gh[u : 2 * u])
    c = jnp.tanh(gx[2 * u :] + r * gh[2 * u :])
    return z * h + (1.0 - z) * c


def _lstm_layer_rows(gx, hc, whT, bhT):
    """One LSTM layer, row layout: ``hc`` is the (2U, T) [h; c] state block,
    ``gx`` the (4U, T) input pre-activation (bias included).  TF LSTMCell
    semantics with forget_bias = 1.0, gates packed [i | j | f | o]
    (``models/cells.py:lstm_apply``).  Returns the new (2U, T) block."""
    u = whT.shape[1]
    h, c = hc[:u], hc[u:]
    g = gx + jnp.dot(whT, h, preferred_element_type=jnp.float32) + bhT
    i, j = g[:u], g[u : 2 * u]
    f, o = g[2 * u : 3 * u], g[3 * u :]
    c_new = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    h_new = jnp.tanh(c_new) * jax.nn.sigmoid(o)
    return jnp.concatenate([h_new, c_new], axis=0)


def _gru_site_step_rows(x, x_scale, h, wxT, whT, bxT, bhT, hwT, hbT):
    """Row-layout (feature-major) GRU + head step, single layer.

    ``h`` is (U, T), ``x`` is (1, T) (previous spin in {0,1}); ``x_scale`` is
    0.0 on the first site (the chain starts from the zero *vector*, not a
    one-hot — ``1DTFIM/RNNwavefunction.py:52-56``) and 1.0 afterwards.
    The one-hot input projection is a select over the two wxT columns (no
    K=2 matmul).  Returns (h_new (U, T), l0 (1, T), l1 (1, T)).
    """
    gx = x_scale * ((1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]) + bxT
    h_new = _gru_layer_rows(gx, h, whT, bhT)
    logits = jnp.dot(hwT, h_new, preferred_element_type=jnp.float32) + hbT
    return h_new, logits[0:1, :], logits[1:2, :]


def _stacked_site_step_rows(x, x_scale, hs, cells, hwT, hbT, kind="gru"):
    """Stacked RNN + head step: ``hs`` is a tuple of L (STATE_ROWS*U, T)
    state blocks; ``cells`` a list of (wxT, whT, bxT, bhT) per layer (layer 0
    has the 2-column one-hot projection, deeper layers a (GATE_ROWS*U, U)
    input matrix).  Returns (new states tuple, l0, l1)."""
    new_hs = []
    inp = None
    for l, (wxT, whT, bxT, bhT) in enumerate(cells):
        if l == 0:
            gx = x_scale * ((1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]) + bxT
        else:
            gx = jnp.dot(wxT, inp, preferred_element_type=jnp.float32) + bxT
        if kind == "gru":
            st_new = _gru_layer_rows(gx, hs[l], whT, bhT)
            inp = st_new
        else:
            st_new = _lstm_layer_rows(gx, hs[l], whT, bhT)
            inp = st_new[: whT.shape[1]]
        new_hs.append(st_new)
    logits = jnp.dot(hwT, inp, preferred_element_type=jnp.float32) + hbT
    return tuple(new_hs), logits[0:1, :], logits[1:2, :]


def _logp_rows(l0, l1, s):
    """Stable log-softmax probability of target s in {0,1}; (1, T) rows."""
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    return jnp.where(s > 0.5, l1, l0) - lse




def _weightsT_trunk(params):
    """Flat tuple of pre-transposed trunk weights: per-layer (wxT, whT, bxT,
    bhT), no head.  Layer 0's wxT is the (GATE_ROWS*U, 2) one-hot
    projection; deeper layers carry a (GATE_ROWS*U, U) input matrix.  LSTM
    layers map their single fused bias to ``bxT`` and an all-zero ``bhT``
    (models/cells.py:lstm_init packing).  The ONE statement of the kernel
    weight packing — the head-bearing ``_weightsT`` and the jacobian
    kernels (ops/fused_jac.py) both build on it."""
    out = []
    for cell in params["rnn"]:
        if "b" in cell:  # lstm packing (models/cells.py:lstm_init)
            out += [cell["wx"].T, cell["wh"].T, cell["b"][:, None],
                    jnp.zeros((cell["b"].shape[0], 1), cell["b"].dtype)]
        else:
            out += [cell["wx"].T, cell["wh"].T,
                    cell["bx"][:, None], cell["bh"][:, None]]
    return tuple(out)


def _weightsT(params):
    """``_weightsT_trunk`` plus the trailing 2-logit head (hwT, hbT)."""
    head = params["head"]
    return _weightsT_trunk(params) + (head["w"].T, head["b"][:, None])


def _trunk_specs(u, num_layers, kind="gru"):
    """BlockSpecs matching ``_weightsT_trunk``'s flat layout."""
    full = lambda a, b: pl.BlockSpec(
        (a, b), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    gr = GATE_ROWS[kind]
    specs = []
    for l in range(num_layers):
        in_dim = 2 if l == 0 else u
        specs += [full(gr * u, in_dim), full(gr * u, u),
                  full(gr * u, 1), full(gr * u, 1)]
    return specs


def _weightT_specs(u, num_layers, kind="gru"):
    full = lambda a, b: pl.BlockSpec(
        (a, b), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return _trunk_specs(u, num_layers, kind) + [full(2, u), full(2, 1)]


def _split_trunk(wrefs, num_layers):
    """Per-layer (wxT, whT, bxT, bhT) ref tuples from the leading trunk
    entries of a flat kernel weight-ref list."""
    return [
        tuple(r[:] for r in wrefs[4 * l : 4 * l + 4])
        for l in range(num_layers)
    ]


def _split_cells(wrefs, num_layers):
    """Group the flat kernel weight refs back into per-layer tuples + head."""
    hwT, hbT = wrefs[-2][:], wrefs[-1][:]
    return _split_trunk(wrefs, num_layers), hwT, hbT


# ---------------------------------------------------------------------------
# Teacher-forced log-probability kernel
# ---------------------------------------------------------------------------

def _make_log_prob_kernel(num_layers: int, kind: str = "gru"):
    def kernel(samples_ref, *rest):
        wrefs, out_ref = rest[:-1], rest[-1]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        sr = STATE_ROWS[kind]

        def body(n, carry):
            hs, x, acc, cmp = carry
            s = samples_ref[pl.ds(n, 1), :].astype(jnp.float32)
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            hs, l0, l1 = _stacked_site_step_rows(
                x, x_scale, hs, cells, hwT, hbT, kind
            )
            acc, cmp = kadd(acc, cmp, _logp_rows(l0, l1, s))
            return hs, s, acc, cmp

        hs0 = tuple(
            jnp.zeros((sr * u, t), jnp.float32) for _ in range(num_layers)
        )
        z = jnp.zeros((1, t), jnp.float32)
        _, _, acc, cmp = jax.lax.fori_loop(0, n_sites, body, (hs0, z, z, z))
        out_ref[:] = kfinal(acc, cmp)

    return kernel


def _log_prob_pallas(params, samples: jax.Array) -> jax.Array:
    """(B, N) int -> (B,) f32 joint log-prob (uniform-width GRU/LSTM stack)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    b, n = samples.shape
    u = params["rnn"][0]["wh"].shape[0]
    tile = _cap_tile(b)
    b_pad = _round_up(max(b, 8), tile)
    seq = jnp.zeros((n, b_pad), jnp.int32).at[:, :b].set(samples.T)

    out = pl.pallas_call(
        _make_log_prob_kernel(num_layers, kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((n, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ] + _weightT_specs(u, num_layers, kind),
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
    )(seq, *_weightsT(params))
    return out[0, :b]


# ---------------------------------------------------------------------------
# Sampling kernel
# ---------------------------------------------------------------------------

def _make_sample_kernel(num_layers: int, kind: str = "gru"):
    def kernel(seed_ref, *rest):
        wrefs, samples_ref, logp_ref = rest[:-2], rest[-2], rest[-1]
        n_sites = samples_ref.shape[0]
        t = samples_ref.shape[1]
        pltpu.prng_seed(
            seed_ref[0, 0] + pl.program_id(0) * TILE_SEED_STRIDE,
            seed_ref[0, 1],
        )
        cells, hwT, hbT = _split_cells(wrefs, num_layers)
        u = hwT.shape[1]
        sr = STATE_ROWS[kind]

        def body(n, carry):
            hs, x, acc, cmp = carry
            x_scale = jnp.where(n > 0, 1.0, 0.0)
            hs, l0, l1 = _stacked_site_step_rows(
                x, x_scale, hs, cells, hwT, hbT, kind
            )
            # inverse-CDF draw over 2 classes: p0 = sigmoid(l0 - l1)
            p0 = jax.nn.sigmoid(l0 - l1)
            bits = pltpu.prng_random_bits((1, t))
            # uniform in [0, 1) from the top 23 bits (int32 path: Mosaic
            # lacks a direct uint32 -> float32 cast)
            usig = jax.lax.shift_right_logical(
                pltpu.bitcast(bits, jnp.int32), 9
            )
            uni = usig.astype(jnp.float32) * (1.0 / (1 << 23))
            s = jnp.where(uni >= p0, 1.0, 0.0)
            acc, cmp = kadd(acc, cmp, _logp_rows(l0, l1, s))
            samples_ref[pl.ds(n, 1), :] = s.astype(jnp.int32)
            return hs, s, acc, cmp

        hs0 = tuple(
            jnp.zeros((sr * u, t), jnp.float32) for _ in range(num_layers)
        )
        z = jnp.zeros((1, t), jnp.float32)
        _, _, acc, cmp = jax.lax.fori_loop(0, n_sites, body, (hs0, z, z, z))
        logp_ref[:] = kfinal(acc, cmp)

    return kernel


def _sample_pallas(
    params, seed: jax.Array, num_samples: int, n_sites: int
) -> Tuple[jax.Array, jax.Array]:
    """Returns (samples (B, N) int32, logp (B,) f32)."""
    num_layers = len(params["rnn"])
    kind = _cell_kind(params)
    u = params["rnn"][0]["wh"].shape[0]
    tile = _cap_tile(num_samples)
    b_pad = _round_up(max(num_samples, 8), tile)

    samples, logp = pl.pallas_call(
        _make_sample_kernel(num_layers, kind),
        grid=(b_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + _weightT_specs(u, num_layers, kind),
        out_specs=(
            pl.BlockSpec((n_sites, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_sites, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ),
    )(seed_block(seed), *_weightsT(params))
    return samples[:, :num_samples].T, logp[0, :num_samples]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, fused Pallas (or fallback jnp) backward
# ---------------------------------------------------------------------------

def make_log_prob_fn(jnp_log_prob):
    """Build ``log_prob(params, samples)`` that runs the Pallas kernel
    forward and the fused Pallas BPTT kernel backward (one launch;
    ``ops/fused_gru_bwd`` keeps the history VMEM-resident within reach and
    streams it through an HBM chunk ring beyond — the N=1000 class).  Only
    configurations whose resident pieces exceed even the spill budget fall
    back to differentiating the jnp reference implementation."""
    from . import fused_gru_bwd

    @jax.custom_vjp
    def log_prob(params, samples):
        return _log_prob_pallas(params, samples)

    def fwd(params, samples):
        return _log_prob_pallas(params, samples), (params, samples)

    def bwd(res, g):
        params, samples = res
        units = tuple(cell["wh"].shape[0] for cell in params["rnn"])
        n = samples.shape[1]
        kind = _cell_kind(params)
        if fused_gru_bwd.supports(n, units, kind=kind):
            return fused_gru_bwd.gru_log_prob_bwd(params, samples, g), None
        _, vjp_fn = jax.vjp(lambda p: jnp_log_prob(p, samples), params)
        (dparams,) = vjp_fn(g)
        return dparams, None

    log_prob.defvjp(fwd, bwd)
    return log_prob
