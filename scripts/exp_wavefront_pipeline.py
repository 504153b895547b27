"""Experiment: MXU/VPU software pipelining in the wavefront flip kernel.

The grouped-wavefront estimator (ops/tfim_flip_kernel.py) is VPU-bound: per
site-advance the (3U, U) x (U, G*T) recurrent matmul costs ~0.6 us of MXU
time while the GRU gate math (2 sigmoids + tanh + pointwise on (3U, G*T))
costs ~1.4 us of VPU time, and the two are serialized by the recurrence
h -> matmul -> gates -> h.

Hypothesis: splitting the G*T wavefront block into two independent
half-chains A and B and carrying B's gate pre-activation across the site
loop lets Mosaic overlap MXU(A matmul) with VPU(B gates) and vice versa:

    per iteration:  preA = whT @ hA      # MXU   | overlaps
                    hB   = gates(preB)   # VPU   |
                    preB = whT @ hB      # MXU   | overlaps
                    hA   = gates(preA)   # VPU   |

steady-state 2*max(m, v) instead of 2*(m + v)  (up to ~1.5x at v ~ 2m).

Variants timed (N=100, U=50, B=512 — the flagship shape):
  v0  current structure (one fused G*T block per site)
  v1  v0 with sigmoids/tanh replaced by cheap polynomials (WRONG numerics —
      isolates the transcendental share of the iteration)
  v2  two half-chains, op-ordered within the iteration (no carry)
  v3  two half-chains with the cross-iteration pre-activation carry
  ... (v4-v15: bf16 matmuls, skeletons, unrolls, merged head, paired
      chains — see the flags in make_kernel)
  v16 bf16 GATE-MATH temps: gx/gh/h stored bf16, transcendentals upcast
      f32 in-pass (Mosaic cannot lower bf16 logistic/tanh directly).
      Probes whether halving elementwise VMEM traffic recovers the v1 gap.
      MEASURED (t512): 0.75x — 25% SLOWER.  The cast passes and bf16
      layouts cost more than the halved bytes save; intermediate-traffic
      recovery via dtype is a dead end.
  v17 bit-near-equivalent fewer-pass gates (one fused [r;z] 2U-row
      sigmoid; h_new = c + z*(h-c)).  MEASURED (t512): 0.99x — neutral;
      Mosaic already extracts whatever fusion is available, per-op pass
      count is not the bound at this width.
  v18 v16 + v17 combined.
  v19 EXACT merged steady-state matmul: the head matmul of site n and the
      recurrence matmul of site n+1 both read h_new -> fuse into ONE
      [hwT; whT] @ h_new per advance, carrying the pre-activation in a
      (3U, G*T) scratch ref (column inits refresh just their slot).
      Bit-identical results (max|e-e_ref| = 0.0).  MEASURED (t512):
      0.917x — 8% SLOWER.  The extra scratch round trip (write + read
      2.4 MB of pre-activations per site) costs more than the saved
      small head matmul; Mosaic evidently keeps v0's gh producer-consumer
      chain tighter than an explicit cross-iteration ref.  v9 (steady
      loop advancing 2 sites/iteration) measured 0.993x — neutral.
      Multi-site fusion of the advance is REJECTED on measurement; the
      shipped v0 structure stands.

Run on the real chip: python scripts/exp_wavefront_pipeline.py \
    [v0-t512 v16-t512 ...]  (default: v0 at t256 and t512)
"""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 100
U = 50
B = 512
TILE = 256
GROUP = 8
TRIALS = 7
REPS = 20  # kernel launches per timed trial


def make_weights(key):
    ks = jax.random.split(key, 6)
    s = 0.2
    return dict(
        wxT=s * jax.random.normal(ks[0], (3 * U, 2), jnp.float32),
        whT=s * jax.random.normal(ks[1], (3 * U, U), jnp.float32),
        bxT=s * jax.random.normal(ks[2], (3 * U, 1), jnp.float32),
        bhT=s * jax.random.normal(ks[3], (3 * U, 1), jnp.float32),
        hwT=s * jax.random.normal(ks[4], (2, U), jnp.float32),
        hbT=s * jax.random.normal(ks[5], (2, 1), jnp.float32),
    )


def gru_gates(gx, gh, h):
    r = jax.nn.sigmoid(gx[:U] + gh[:U])
    z = jax.nn.sigmoid(gx[U : 2 * U] + gh[U : 2 * U])
    c = jnp.tanh(gx[2 * U :] + r * gh[2 * U :])
    return z * h + (1.0 - z) * c


def gru_gates_cheap(gx, gh, h):
    # NOT a GRU: linear stand-ins for sigmoid/tanh to measure the
    # transcendental share of the VPU time.
    r = 0.5 + 0.25 * (gx[:U] + gh[:U])
    z = 0.5 + 0.25 * (gx[U : 2 * U] + gh[U : 2 * U])
    c = gx[2 * U :] + r * gh[2 * U :]
    return z * h + (1.0 - z) * c


def gru_gates_lp(gx, gh, h):
    # gx, gh, h arrive bf16; Mosaic cannot lower bf16 logistic/tanh, so the
    # transcendentals upcast to f32 in their input pass and truncate on the
    # way out — every stored wide temp stays bf16 (half VMEM traffic).
    pre = (gx[: 2 * U] + gh[: 2 * U]).astype(jnp.float32)
    rz = jax.nn.sigmoid(pre).astype(jnp.bfloat16)
    cpre = (gx[2 * U :] + rz[:U] * gh[2 * U :]).astype(jnp.float32)
    c = jnp.tanh(cpre).astype(jnp.bfloat16)
    return c + rz[U:] * (h - c)


def gru_gates_fewpass(gx, gh, h):
    # Bit-equivalent GRU with fewer elementwise passes: one fused
    # sigmoid over the [r; z] 2U-row block, and h_new = c + z*(h - c)
    # (3 passes instead of 4 for the blend).  Probes whether the VPU
    # share is per-op overhead or pure bandwidth.
    rz = jax.nn.sigmoid(gx[: 2 * U] + gh[: 2 * U])
    c = jnp.tanh(gx[2 * U :] + rz[:U] * gh[2 * U :])
    return c + rz[U:] * (h - c)


def logp_rows(l0, l1, s):
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    return jnp.where(s > 0.5, l1, l0) - lse


def make_kernel(variant):
    # Ablations: v1 cheap gates (no transcendentals); v2/v3 split half-chain
    # (software pipelining attempts); v4 genuine bf16 matmuls; v5 no one-hot
    # input path (gx = bias only); v6 = v5 + cheap gates; v7 skeleton
    # (matmuls + loop structure only, no gate math at all).
    gates = gru_gates_cheap if variant in ("v1", "v6") else gru_gates
    if variant == "v17":
        gates = gru_gates_fewpass
    elif variant in ("v16", "v18"):
        gates = gru_gates_lp
    # v16/v18: the GATE MATH itself runs in bf16 — gh comes out of the MXU
    # as bf16, gx is built natively bf16, sigmoid/tanh read and write bf16
    # — halving the VMEM traffic of every (3U, G*T) elementwise pass (the
    # measured residual after v1: intermediate-array bandwidth, not
    # transcendental latency).  Distinct from v4/v8, which only fed the
    # MXU bf16 operands while the VPU stayed f32.
    gates_lp = variant in ("v16", "v18")
    split = variant in ("v2", "v3")
    carry_pre = variant == "v3"
    # both matmul operands bf16, f32 accum
    bf16 = variant in ("v4", "v8", "v16", "v18")
    no_gx = variant in ("v5", "v6", "v7", "v8", "v10", "v11")
    skeleton = variant in ("v7", "v8", "v10", "v11")
    unroll2 = variant == "v9"  # ramp with inits, steady loop 2 sites/iter
    no_head = variant == "v10"   # skeleton minus the head matmul
    merged_head = variant == "v11"  # head rows folded into the main matmul
    paired = variant in ("v13", "v14", "v15")  # two full-width chains
    pair_carry = variant == "v13"  # v13 carries pre-acts; v14 all in-body
    pair_hcarry = variant == "v15"  # v15: branch-free steady, h as carries
    # v19: EXACT merged steady-state matmul.  Per advance, v0 issues TWO
    # matmuls reading h_new: the head (hwT @ h_new, logits of site n) and
    # the next recurrence (whT @ h_new, site n+1's pre-activation).  v19
    # fuses them into ONE [hwT; whT] @ h_new per advance (same numerics,
    # unlike the v11 probe which took logits of the wrong state): the
    # pre-activation rides a (3U, G*T) scratch ref across iterations, and
    # a column init refreshes just that slot's pre block.
    merged2 = variant == "v19"
    half = GROUP // 2

    def kernel(samples_ref, wxT, whT, bxT, bhT, hwT, hbT,
               eoff_ref, lp_ref, h_hist, pfx, fl, wf_h, wf_x, wf_acc,
               *extra):
        t = eoff_ref.shape[1]
        zero_row = jnp.zeros((1, t), jnp.float32)
        # With bf16, the weight refs arrive as bf16 and the hidden-state
        # scratch (h_hist, wf_h) is bf16, so the dot operands are genuinely
        # bf16 — casting f32->bf16 inside the kernel right before a
        # f32-accumulating dot gets canonicalized away (bit-identical
        # results, no speedup).
        hdt = jnp.bfloat16 if bf16 else jnp.float32

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        def gx_of(x, x_scale):
            if no_gx:
                return bxT[:]
            if gates_lp:
                # natively bf16: the (3U, T) temp and its consumers halve
                xb = x.astype(jnp.bfloat16)
                sb = jnp.asarray(x_scale, jnp.float32).astype(jnp.bfloat16)
                return sb * (
                    (1.0 - xb) * wxT[:, 0:1].astype(jnp.bfloat16)
                    + xb * wxT[:, 1:2].astype(jnp.bfloat16)
                ) + bxT[:].astype(jnp.bfloat16)
            return x_scale * (
                (1.0 - x) * wxT[:, 0:1].astype(jnp.float32)
                + x * wxT[:, 1:2].astype(jnp.float32)
            ) + bxT[:]

        def mm_h(h):
            return jnp.dot(whT[:], h.astype(hdt),
                           preferred_element_type=jnp.float32)

        def mm_head(h):
            return jnp.dot(hwT[:], h.astype(hdt),
                           preferred_element_type=jnp.float32)

        def full_step(x, x_scale, h):
            # h arrives in hdt (from the hdt scratch refs / loop carry) and
            # h_new is returned in hdt so every store/dot stays natively hdt.
            if merged_head:
                # ONE matmul per step: [whT; hwT] @ h — timing probe for the
                # deferred-head restructure (logits here are of h, not h_new;
                # wrong numerics, representative schedule).
                big = jnp.concatenate(
                    [whT[:].astype(jnp.float32), hwT[:].astype(jnp.float32)],
                    axis=0,
                ).astype(hdt)
                out = jnp.dot(big, h.astype(hdt),
                              preferred_element_type=jnp.float32)
                gh = out[: 3 * U] + bhT[:]
                h_new = (gh[:U] * 0.2).astype(hdt)
                logits = out[3 * U :] + hbT[:]
                return h_new, logits[0:1, :], logits[1:2, :]
            if gates_lp:
                # MXU accumulates f32 (Mosaic requires 32-bit acc); the
                # bias-add pass truncates to bf16 in the same pass, and
                # every downstream gate op reads/writes bf16
                gh = (mm_h(h) + bhT[:]).astype(jnp.bfloat16)
            else:
                gh = mm_h(h) + bhT[:]
            if skeleton:
                h_new = (gh[:U] * 0.2).astype(hdt)
            elif gates_lp:
                h_new = gates(gx_of(x, x_scale), gh, h)
            else:
                gx = gx_of(x, x_scale)
                h_new = gates(gx, gh, h.astype(jnp.float32)).astype(hdt)
            if no_head:
                logits = gh[:2] + hbT[:]
            else:
                logits = mm_head(h_new) + hbT[:]
            return h_new, logits[0:1, :], logits[1:2, :]

        # ---- base pass
        def base_body(n, carry):
            h, x, acc = carry
            h_new, l0, l1 = full_step(x, jnp.where(n > 0, 1.0, 0.0), h)
            s = read_s(n)
            acc = acc + logp_rows(l0, l1, s)
            h_hist[pl.ds(n, 1)] = h_new[None]
            pfx[pl.ds(n, 1), :] = acc
            fl[pl.ds(n, 1), :] = logp_rows(l0, l1, 1.0 - s)
            return h_new, s, acc

        h0 = jnp.zeros((U, t), hdt)
        _, _, lp_base = jax.lax.fori_loop(
            0, N, base_body, (h0, zero_row, zero_row)
        )
        lp_ref[:] = lp_base

        # ---- wavefront
        num_groups = -(-N // GROUP)

        def init_col(i):
            k = i % GROUP
            wf_h[:, pl.ds(k * t, t)] = h_hist[pl.ds(i, 1)][0]
            wf_x[:, pl.ds(k * t, t)] = 1.0 - read_s(i)
            p_before = jnp.where(
                i > 0, pfx[pl.ds(jnp.maximum(i - 1, 0), 1), :], zero_row
            )
            wf_acc[:, pl.ds(k * t, t)] = p_before + fl[pl.ds(i, 1), :]

        def wavefront_step_fused(n):
            s_n = read_s(n)
            tgt = jnp.concatenate([s_n] * GROUP, axis=1)
            h_new, l0, l1 = full_step(wf_x[:], 1.0, wf_h[:])
            wf_h[:] = h_new
            wf_x[:] = tgt
            wf_acc[:] = wf_acc[:] + logp_rows(l0, l1, tgt)

        def wavefront_step_split(n):
            s_n = read_s(n)
            tgt = jnp.concatenate([s_n] * half, axis=1)
            ht = half * t
            hA, hB = wf_h[:, :ht], wf_h[:, ht:]
            xA, xB = wf_x[:, :ht], wf_x[:, ht:]
            gxA, gxB = gx_of(xA, 1.0), gx_of(xB, 1.0)
            preA = jnp.dot(whT[:], hA,
                           preferred_element_type=jnp.float32) + bhT[:]
            preB = jnp.dot(whT[:], hB,
                           preferred_element_type=jnp.float32) + bhT[:]
            hA_new = gates(gxA, preA, hA)
            hB_new = gates(gxB, preB, hB)
            lA = jnp.dot(hwT[:], hA_new,
                         preferred_element_type=jnp.float32) + hbT[:]
            lB = jnp.dot(hwT[:], hB_new,
                         preferred_element_type=jnp.float32) + hbT[:]
            wf_h[:, :ht] = hA_new
            wf_h[:, ht:] = hB_new
            wf_x[:, :ht] = tgt
            wf_x[:, ht:] = tgt
            wf_acc[:, :ht] = wf_acc[:, :ht] + logp_rows(
                lA[0:1], lA[1:2], tgt
            )
            wf_acc[:, ht:] = wf_acc[:, ht:] + logp_rows(
                lB[0:1], lB[1:2], tgt
            )

        def group_body(g, _):
            g0 = g * GROUP
            wf_h[:] = jnp.zeros_like(wf_h)
            wf_x[:] = jnp.zeros_like(wf_x)
            wf_acc[:] = jnp.zeros_like(wf_acc)
            init_col(g0)

            if merged2:
                pre_ref = extra[0]
                fusedW = jnp.concatenate(
                    [hwT[:].astype(jnp.float32), whT[:].astype(jnp.float32)],
                    axis=0,
                )
                pre_ref[:] = jnp.dot(
                    whT[:], wf_h[:], preferred_element_type=jnp.float32
                )

                def site_body(n, _):
                    @pl.when((n - 1 > g0) & (n - 1 < jnp.minimum(g0 + GROUP, N)))
                    def _():
                        init_col(n - 1)
                        sl = pl.ds(((n - 1) % GROUP) * t, t)
                        pre_ref[:, sl] = jnp.dot(
                            whT[:], wf_h[:, sl],
                            preferred_element_type=jnp.float32,
                        )

                    s_n = read_s(n)
                    tgt = jnp.concatenate([s_n] * GROUP, axis=1)
                    h_new = gates(
                        gx_of(wf_x[:], 1.0), pre_ref[:] + bhT[:], wf_h[:]
                    )
                    big = jnp.dot(
                        fusedW, h_new, preferred_element_type=jnp.float32
                    )
                    logits = big[:2] + hbT[:]
                    pre_ref[:] = big[2:]
                    wf_h[:] = h_new
                    wf_x[:] = tgt
                    wf_acc[:] = wf_acc[:] + logp_rows(
                        logits[0:1], logits[1:2], tgt
                    )
                    return 0

                jax.lax.fori_loop(g0 + 1, N, site_body, 0)
            elif unroll2:
                # ramp with the init branches, then a steady loop advancing
                # 2 sites per fori iteration (halves scalar loop overhead).
                ramp_end = jnp.minimum(g0 + 1 + GROUP, N)

                def ramp_body(n, _):
                    @pl.when((n - 1 > g0) & (n - 1 < jnp.minimum(g0 + GROUP, N)))
                    def _():
                        init_col(n - 1)

                    wavefront_step_fused(n)
                    return 0

                jax.lax.fori_loop(g0 + 1, ramp_end, ramp_body, 0)

                def pair_body(i, _):
                    n = ramp_end + 2 * i
                    wavefront_step_fused(n)

                    @pl.when(n + 1 < N)
                    def _():
                        wavefront_step_fused(n + 1)

                    return 0

                jax.lax.fori_loop(0, (N - ramp_end + 1) // 2, pair_body, 0)
            elif not carry_pre:
                step_fn = (
                    wavefront_step_split if split else wavefront_step_fused
                )

                def site_body(n, _):
                    @pl.when((n - 1 > g0) & (n - 1 < jnp.minimum(g0 + GROUP, N)))
                    def _():
                        init_col(n - 1)

                    step_fn(n)
                    return 0

                jax.lax.fori_loop(g0 + 1, N, site_body, 0)
            else:
                # ramp-up with inits (fused steps), then the software-
                # pipelined steady loop with B's pre-activation carried.
                ramp_end = jnp.minimum(g0 + 1 + GROUP, N)

                def ramp_body(n, _):
                    @pl.when((n - 1 > g0) & (n - 1 < jnp.minimum(g0 + GROUP, N)))
                    def _():
                        init_col(n - 1)

                    wavefront_step_fused(n)
                    return 0

                jax.lax.fori_loop(g0 + 1, ramp_end, ramp_body, 0)

                ht = half * TILE

                def steady_body(n, preB):
                    s_n = read_s(n)
                    tgt = jnp.concatenate([s_n] * half, axis=1)
                    hA = wf_h[:, :ht]
                    # MXU: A's recurrent matmul; VPU: B's gates (independent)
                    preA = jnp.dot(whT[:], hA,
                                   preferred_element_type=jnp.float32) + bhT[:]
                    gxB = gx_of(wf_x[:, ht:], 1.0)
                    hB_new = gates(gxB, preB, wf_h[:, ht:])
                    # MXU: B's next matmul; VPU: A's gates (independent)
                    preB_next = jnp.dot(whT[:], hB_new,
                                        preferred_element_type=jnp.float32
                                        ) + bhT[:]
                    gxA = gx_of(wf_x[:, :ht], 1.0)
                    hA_new = gates(gxA, preA, hA)
                    lA = jnp.dot(hwT[:], hA_new,
                                 preferred_element_type=jnp.float32) + hbT[:]
                    lB = jnp.dot(hwT[:], hB_new,
                                 preferred_element_type=jnp.float32) + hbT[:]
                    wf_h[:, :ht] = hA_new
                    wf_h[:, ht:] = hB_new
                    wf_acc[:, :ht] = wf_acc[:, :ht] + logp_rows(
                        lA[0:1], lA[1:2], tgt
                    )
                    wf_acc[:, ht:] = wf_acc[:, ht:] + logp_rows(
                        lB[0:1], lB[1:2], tgt
                    )
                    wf_x[:, :ht] = tgt
                    wf_x[:, ht:] = tgt
                    return preB_next

                preB0 = jnp.dot(
                    whT[:], wf_h[:, ht:], preferred_element_type=jnp.float32
                ) + bhT[:]
                jax.lax.fori_loop(ramp_end, N, steady_body, preB0)

            for k in range(GROUP):
                i = g0 + k

                @pl.when(i < N)
                def _():
                    @pl.when(i >= N - 1)
                    def _():
                        init_col(i)

                    acc = wf_acc[:, pl.ds(k * t, t)]
                    eoff_ref[:] = eoff_ref[:] + jnp.exp(0.5 * (acc - lp_base))

            return 0

        eoff_ref[:] = zero_row
        if paired:
            # Two full-width chains (groups 2p, 2p+1) advance in one site
            # loop; each chain's recurrent-matmul latency hides under the
            # other chain's gate math (carried pre-activations).
            wf_h2, wf_x2, wf_acc2 = extra
            A = (wf_h, wf_x, wf_acc)
            Bc = (wf_h2, wf_x2, wf_acc2)

            def init_c(refs, i):
                h_ref, x_ref, acc_ref = refs
                sl = pl.ds((i % GROUP) * t, t)
                h_ref[:, sl] = h_hist[pl.ds(i, 1)][0]
                x_ref[:, sl] = 1.0 - read_s(i)
                p_before = jnp.where(
                    i > 0, pfx[pl.ds(jnp.maximum(i - 1, 0), 1), :], zero_row
                )
                acc_ref[:, sl] = p_before + fl[pl.ds(i, 1), :]

            def step_c(refs, n):
                h_ref, x_ref, acc_ref = refs
                s_n = read_s(n)
                tgt = jnp.concatenate([s_n] * GROUP, axis=1)
                h_new, l0, l1 = full_step(x_ref[:], 1.0, h_ref[:])
                h_ref[:] = h_new
                x_ref[:] = tgt
                acc_ref[:] = acc_ref[:] + logp_rows(l0, l1, tgt)

            def epilogue(refs, g0):
                acc_ref = refs[2]
                for k in range(GROUP):
                    i = g0 + k

                    @pl.when(i < N)
                    def _(k=k, i=i):
                        @pl.when(i >= N - 1)
                        def _():
                            init_c(refs, i)

                        acc = acc_ref[:, pl.ds(k * t, t)]
                        eoff_ref[:] = eoff_ref[:] + jnp.exp(
                            0.5 * (acc - lp_base)
                        )

            npairs = num_groups // 2

            def pair_body(p, _):
                gA = 2 * p * GROUP
                gB = gA + GROUP
                for refs in (A, Bc):
                    refs[0][:] = jnp.zeros_like(refs[0])
                    refs[1][:] = jnp.zeros_like(refs[1])
                    refs[2][:] = jnp.zeros_like(refs[2])
                init_c(A, gA)

                ramp_end = jnp.minimum(gB + GROUP + 1, N)

                def ramp_body(n, _):
                    @pl.when(
                        (n - 1 > gA) & (n - 1 < jnp.minimum(gA + GROUP, N))
                    )
                    def _():
                        init_c(A, n - 1)

                    @pl.when(
                        (n - 1 >= gB) & (n - 1 < jnp.minimum(gB + GROUP, N))
                    )
                    def _():
                        init_c(Bc, n - 1)

                    step_c(A, n)
                    step_c(Bc, n)
                    return 0

                def dual_body(n, _):
                    # both matmuls issued before either chain's gate math:
                    # each MXU drain hides under the other chain's VPU work.
                    @pl.when(
                        (n - 1 > gA) & (n - 1 < jnp.minimum(gA + GROUP, N))
                    )
                    def _():
                        init_c(A, n - 1)

                    @pl.when(
                        (n - 1 >= gB) & (n - 1 < jnp.minimum(gB + GROUP, N))
                    )
                    def _():
                        init_c(Bc, n - 1)

                    s_n = read_s(n)
                    tgt = jnp.concatenate([s_n] * GROUP, axis=1)
                    hA, hB = wf_h[:], wf_h2[:]
                    xA, xB = wf_x[:], wf_x2[:]
                    preA = mm_h(hA) + bhT[:]
                    preB = mm_h(hB) + bhT[:]
                    hA_new = gates(
                        gx_of(xA, 1.0), preA, hA.astype(jnp.float32)
                    ).astype(hdt)
                    hB_new = gates(
                        gx_of(xB, 1.0), preB, hB.astype(jnp.float32)
                    ).astype(hdt)
                    lA = mm_head(hA_new) + hbT[:]
                    lB = mm_head(hB_new) + hbT[:]
                    wf_h[:] = hA_new
                    wf_h2[:] = hB_new
                    wf_acc[:] = wf_acc[:] + logp_rows(lA[0:1], lA[1:2], tgt)
                    wf_acc2[:] = wf_acc2[:] + logp_rows(lB[0:1], lB[1:2], tgt)
                    wf_x[:] = tgt
                    wf_x2[:] = tgt
                    return 0

                if pair_hcarry:
                    # ramp with refs/branches, then a branch-free steady
                    # loop carrying (hA, hB, accA, accB, x) as VALUES — the
                    # structure that overlapped in the mm_floor probe.
                    jax.lax.fori_loop(gA + 1, ramp_end, ramp_body, 0)

                    def steady_v(n, carry):
                        hA, hB, accA, accB, x = carry
                        s_n = read_s(n)
                        tgt = jnp.concatenate([s_n] * GROUP, axis=1)
                        preA = mm_h(hA) + bhT[:]
                        preB = mm_h(hB) + bhT[:]
                        gx = gx_of(x, 1.0)
                        hA2 = gates(
                            gx, preA, hA.astype(jnp.float32)
                        ).astype(hdt)
                        hB2 = gates(
                            gx, preB, hB.astype(jnp.float32)
                        ).astype(hdt)
                        lA = mm_head(hA2) + hbT[:]
                        lB = mm_head(hB2) + hbT[:]
                        accA = accA + logp_rows(lA[0:1], lA[1:2], tgt)
                        accB = accB + logp_rows(lB[0:1], lB[1:2], tgt)
                        return hA2, hB2, accA, accB, tgt

                    hA, hB, accA, accB, x = jax.lax.fori_loop(
                        ramp_end, N, steady_v,
                        (wf_h[:], wf_h2[:], wf_acc[:], wf_acc2[:],
                         wf_x[:]),
                    )
                    wf_acc[:] = accA
                    wf_acc2[:] = accB
                    epilogue(A, gA)
                    epilogue(Bc, gB)
                    return 0

                if not pair_carry:
                    jax.lax.fori_loop(gA + 1, N, dual_body, 0)
                    epilogue(A, gA)
                    epilogue(Bc, gB)
                    return 0

                jax.lax.fori_loop(gA + 1, ramp_end, ramp_body, 0)

                def steady_body(n, carry):
                    preA, preB = carry
                    s_n = read_s(n)
                    tgt = jnp.concatenate([s_n] * GROUP, axis=1)
                    gxA = gx_of(wf_x[:], 1.0)
                    hA_new = gates(
                        gxA, preA, wf_h[:].astype(jnp.float32)
                    ).astype(hdt)
                    preA_next = mm_h(hA_new) + bhT[:]
                    gxB = gx_of(wf_x2[:], 1.0)
                    hB_new = gates(
                        gxB, preB, wf_h2[:].astype(jnp.float32)
                    ).astype(hdt)
                    preB_next = mm_h(hB_new) + bhT[:]
                    lA = mm_head(hA_new) + hbT[:]
                    lB = mm_head(hB_new) + hbT[:]
                    wf_h[:] = hA_new
                    wf_h2[:] = hB_new
                    wf_acc[:] = wf_acc[:] + logp_rows(lA[0:1], lA[1:2], tgt)
                    wf_acc2[:] = wf_acc2[:] + logp_rows(lB[0:1], lB[1:2], tgt)
                    wf_x[:] = tgt
                    wf_x2[:] = tgt
                    return preA_next, preB_next

                jax.lax.fori_loop(
                    ramp_end, N, steady_body,
                    (mm_h(wf_h[:]) + bhT[:], mm_h(wf_h2[:]) + bhT[:]),
                )
                epilogue(A, gA)
                epilogue(Bc, gB)
                return 0

            jax.lax.fori_loop(0, npairs, pair_body, 0)
            jax.lax.fori_loop(2 * npairs, num_groups, group_body, 0)
        else:
            jax.lax.fori_loop(0, num_groups, group_body, 0)

    return kernel


def build(variant, tile=TILE):
    kern = make_kernel(variant)
    hdt = (jnp.bfloat16 if variant in ("v4", "v8", "v16", "v18")
           else jnp.float32)
    w_specs = [
        pl.BlockSpec((3 * U, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

    def run(seq, w):
        return pl.pallas_call(
            kern,
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((N, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + w_specs,
            out_specs=(
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((N, U, tile), hdt),
                pltpu.VMEM((N, tile), jnp.float32),
                pltpu.VMEM((N, tile), jnp.float32),
                pltpu.VMEM((U, GROUP * tile), hdt),
                pltpu.VMEM((1, GROUP * tile), jnp.float32),
                pltpu.VMEM((1, GROUP * tile), jnp.float32),
            ] + ([
                pltpu.VMEM((U, GROUP * tile), hdt),
                pltpu.VMEM((1, GROUP * tile), jnp.float32),
                pltpu.VMEM((1, GROUP * tile), jnp.float32),
            ] if variant in ("v13", "v14", "v15") else []) + ([
                pltpu.VMEM((3 * U, GROUP * tile), jnp.float32),
            ] if variant == "v19" else []),
        )(seq, w["wxT"], w["whT"].astype(hdt), w["bxT"], w["bhT"],
          w["hwT"].astype(hdt), w["hbT"])

    run_once = jax.jit(run, compiler_options=tpu_compiler_options())

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def run_reps(seq, w):
        # optimization_barrier ties the (loop-invariant) inputs to the scan
        # carry so XLA cannot hoist the pallas_call out of the loop — without
        # it the whole scan CSEs to a single kernel launch and the "timing"
        # is pure dispatch noise.
        def body(carry, _):
            seq_b, c = jax.lax.optimization_barrier((seq, carry))
            e, lp = run(seq_b, w)
            return c + e[0, 0] + lp[0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, None, length=REPS)
        return acc

    return run_once, run_reps


def overlap_probe(steps=1526, lanes=GROUP * TILE, mode="both"):
    """Can Mosaic overlap MXU and VPU work from independent chains?
    mode: "mm" = matmul chain only, "vpu" = gate-math chain only,
    "both" = the two interleaved.  both ~= max(mm, vpu) -> overlap works;
    both ~= mm + vpu -> strictly serial issue."""

    def vpu_work(g):
        # roughly one GRU step's worth of gate math on (3U, lanes)
        r = jax.nn.sigmoid(g[:U])
        z = jax.nn.sigmoid(g[U : 2 * U])
        c = jnp.tanh(g[2 * U :] + r * g[2 * U :])
        out = z * c + (1.0 - z) * r
        return jnp.concatenate([out, out, out], axis=0) * 0.2 + 0.1

    def kernel(whT, out_ref):
        def body(i, carry):
            h, g = carry
            if mode in ("mm", "both"):
                h = (jnp.dot(whT[:], h,
                             preferred_element_type=jnp.float32)[:U] * 0.2)
            if mode in ("vpu", "both"):
                g = vpu_work(g)
            return h, g

        h0 = jnp.full((U, lanes), 0.01, jnp.float32)
        g0 = jnp.full((3 * U, lanes), 0.3, jnp.float32)
        h, g = jax.lax.fori_loop(0, steps, body, (h0, g0))
        out_ref[:] = h + g[:U]

    @jax.jit
    def run(w):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((3 * U, U), lambda: (0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((U, lanes), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((U, lanes), jnp.float32),
        )(w)

    @jax.jit
    def run_reps(w):
        def body(carry, _):
            w_b, c = jax.lax.optimization_barrier((w, carry))
            o = run(w_b)
            return c + o[0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, None, length=REPS)
        return acc

    w = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (3 * U, U))
    float(run_reps(w))
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(run_reps(w))
        times.append((time.perf_counter() - t0) / REPS)
    med = sorted(times)[len(times) // 2]
    print(f"overlap_probe(mode={mode}, lanes={lanes}): "
          f"{med / steps * 1e6:.3f} us/step")
    return med / steps


def mm_floor(steps=1526, bf16=False, lanes=GROUP * TILE, chains=1,
             unroll=1):
    """Serial-matmul chains: h_c <- 0.2 * (whT @ h_c)[:U] for ``chains``
    independent states of (U, lanes), nothing else.  The per-step time is
    the hard floor of any wavefront site-advance; scaling in ``lanes`` and
    ``chains`` separates MXU latency from feed/throughput limits."""
    hdt = jnp.bfloat16 if bf16 else jnp.float32

    def kernel(whT, out_ref):
        def body(i, hs):
            for _ in range(unroll):
                outs = tuple(
                    jnp.dot(whT[:], h, preferred_element_type=jnp.float32)
                    for h in hs
                )
                hs = tuple((o[:U] * 0.2).astype(hdt) for o in outs)
            return hs

        h0 = tuple(
            jnp.full((U, lanes), 0.01 * (c + 1), hdt)
            for c in range(chains)
        )
        hs = jax.lax.fori_loop(0, steps // unroll, body, h0)
        acc = hs[0]
        for h in hs[1:]:
            acc = acc + h
        out_ref[:] = acc.astype(jnp.float32)

    @jax.jit
    def run(w):
        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((3 * U, U), lambda: (0, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((U, lanes), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((U, lanes), jnp.float32),
        )(w.astype(hdt))

    @jax.jit
    def run_reps(w):
        def body(carry, _):
            w_b, c = jax.lax.optimization_barrier((w, carry))
            o = run(w_b)
            return c + o[0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, None, length=REPS)
        return acc

    w = 0.05 * jax.random.normal(jax.random.PRNGKey(3), (3 * U, U))
    float(run_reps(w))
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(run_reps(w))
        times.append((time.perf_counter() - t0) / REPS)
    med = sorted(times)[len(times) // 2]
    per = med / steps * 1e6
    print(
        f"mm_floor(bf16={int(bf16)}, lanes={lanes}, chains={chains}): "
        f"{per:.3f} us/step ({per / chains / (lanes / 2048):.3f} us per "
        f"2048-lane chain-step)"
    )


def main():
    import sys

    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    w = make_weights(key)
    seq = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (N, B)
    ).astype(jnp.int32)

    # each spec is "vN" (tile 256) or "vN-t512"; v0 first = numeric ref
    specs = sys.argv[1:] or ["v0", "v0-t512"]
    results = {}
    ref = None
    base = None
    for spec in specs:
        variant = spec.split("-")[0]
        tile = int(spec.split("-t")[1]) if "-t" in spec else 256
        run, run_reps = build(variant, tile=tile)
        e, lp = run(seq, w)
        e = jax.device_get(e)
        if ref is None:
            ref = e
        err = float(jnp.max(jnp.abs(e - ref)))
        float(run_reps(seq, w))  # warm
        times = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(run_reps(seq, w))
            times.append((time.perf_counter() - t0) / REPS)
        med = sorted(times)[len(times) // 2]
        results[spec] = med
        if base is None:
            base = med
        print(
            f"{spec}: {med * 1e3:.3f} ms/launch   "
            f"(vs {specs[0]}: {base / med:.3f}x)   max|e-e_ref|={err:.2e}"
        )


if __name__ == "__main__":
    main()
