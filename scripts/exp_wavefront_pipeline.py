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

Run on the real chip: python scripts/exp_wavefront_pipeline.py
"""

import functools
import time

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


def logp_rows(l0, l1, s):
    m = jnp.maximum(l0, l1)
    lse = m + jnp.log(jnp.exp(l0 - m) + jnp.exp(l1 - m))
    return jnp.where(s > 0.5, l1, l0) - lse


def make_kernel(variant):
    gates = gru_gates_cheap if variant == "v1" else gru_gates
    split = variant in ("v2", "v3")
    carry_pre = variant == "v3"
    half = GROUP // 2

    def kernel(samples_ref, wxT, whT, bxT, bhT, hwT, hbT,
               eoff_ref, lp_ref, h_hist, pfx, fl, wf_h, wf_x, wf_acc):
        t = eoff_ref.shape[1]
        zero_row = jnp.zeros((1, t), jnp.float32)

        def read_s(n):
            return samples_ref[pl.ds(n, 1), :].astype(jnp.float32)

        def gx_of(x, x_scale):
            return x_scale * (
                (1.0 - x) * wxT[:, 0:1] + x * wxT[:, 1:2]
            ) + bxT[:]

        def full_step(x, x_scale, h):
            gx = gx_of(x, x_scale)
            gh = jnp.dot(whT[:], h, preferred_element_type=jnp.float32) + bhT[:]
            h_new = gates(gx, gh, h)
            logits = jnp.dot(hwT[:], h_new,
                             preferred_element_type=jnp.float32) + hbT[:]
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

        h0 = jnp.zeros((U, t), jnp.float32)
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

            if not carry_pre:
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
        jax.lax.fori_loop(0, num_groups, group_body, 0)

    return kernel


def build(variant):
    kern = make_kernel(variant)
    w_specs = [
        pl.BlockSpec((3 * U, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * U, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, U), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    @jax.jit
    def run(seq, w):
        return pl.pallas_call(
            kern,
            grid=(B // TILE,),
            in_specs=[
                pl.BlockSpec((N, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + w_specs,
            out_specs=(
                pl.BlockSpec((1, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((N, U, TILE), jnp.float32),
                pltpu.VMEM((N, TILE), jnp.float32),
                pltpu.VMEM((N, TILE), jnp.float32),
                pltpu.VMEM((U, GROUP * TILE), jnp.float32),
                pltpu.VMEM((1, GROUP * TILE), jnp.float32),
                pltpu.VMEM((1, GROUP * TILE), jnp.float32),
            ],
        )(seq, w["wxT"], w["whT"], w["bxT"], w["bhT"], w["hwT"], w["hbT"])

    @jax.jit
    def run_reps(seq, w):
        def body(carry, _):
            e, lp = run(seq, w)
            return carry + e[0, 0] + lp[0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, None, length=REPS)
        return acc

    return run, run_reps


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    w = make_weights(key)
    seq = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (N, B)
    ).astype(jnp.int32)

    results = {}
    ref = None
    for variant in ("v0", "v1", "v2", "v3"):
        run, run_reps = build(variant)
        e, lp = run(seq, w)
        e = jax.device_get(e)
        if variant == "v0":
            ref = e
        err = (
            float(jnp.max(jnp.abs(e - ref))) if ref is not None else float("nan")
        )
        float(run_reps(seq, w))  # warm
        times = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(run_reps(seq, w))
            times.append((time.perf_counter() - t0) / REPS)
        med = sorted(times)[len(times) // 2]
        results[variant] = med
        print(
            f"{variant}: {med * 1e3:.3f} ms/launch   "
            f"(vs v0: {results['v0'] / med:.3f}x)   max|e-e_v0|={err:.2e}"
        )


if __name__ == "__main__":
    main()
