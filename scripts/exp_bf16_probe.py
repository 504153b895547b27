"""Probe: does a bf16 MXU path speed up the fused GRU rollout shape?

Times a standalone Pallas kernel that mimics the fused rollout inner loop
(``ops/fused_gru._gru_layer_rows`` at U=50, T=4096, N sites) with the matmul
operands in f32 vs bf16 (f32 accumulation either way).  The v5e MXU runs
bf16 at 4x the f32 pass rate; this measures how much of that shows up at the
framework's actual (3U x U) @ (U x T) shape, where K = U = 50 underfills the
128-deep systolic array.

N must be large enough that one launch's compute dominates the ~16 ms
relay dispatch latency (N=400 is ~1.6 ms of compute — pure noise; N=20000
is ~60 ms).  Synchronize by fetching a scalar, per CLAUDE.md.

MEASURED (one v5e chip, 2026-08-17): f32 21.43 TFLOP/s, bf16 21.37 TFLOP/s
— speedup 1.00x.  At K = U = 50 the systolic array is depth-starved and the
rollout sits at its shape roof either way; casting the fused kernels'
operands to bf16 buys nothing (and would cost hidden-state precision), so
the framework keeps f32 operands everywhere.  This is the negative result
behind not shipping a bf16 hidden path.

Run on the real chip: ``timeout 580 python scripts/exp_bf16_probe.py``.
"""

import argparse
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# defaults probe the flagship U=50 shape; pass --units 256 to probe the
# wide-hidden row where K=256 fills the 128-deep systolic array and the
# bf16 4x pass rate could actually surface
_args = argparse.ArgumentParser()
_args.add_argument("--units", type=int, default=50)
_args.add_argument("--seqlen", type=int, default=4096)
_args.add_argument("--sites", type=int, default=None,
                   help="site steps per launch (default: scaled so one "
                        "launch is ~50 ms of compute)")
_a = _args.parse_args()

U = _a.units
T = _a.seqlen
# keep compute per launch roughly constant as U grows (flops ~ N*U^2)
N = _a.sites if _a.sites is not None else max(200, 20000 * 50 * 50 // (U * U))
REPS = 3


def make_kernel(dtype):
    def kernel(whT_ref, hwT_ref, out_ref):
        whT = whT_ref[:]
        hwT = hwT_ref[:]

        def body(n, carry):
            h, acc = carry
            gh = jnp.dot(
                whT, h.astype(dtype), preferred_element_type=jnp.float32
            )
            r = jax.nn.sigmoid(gh[:U])
            z = jax.nn.sigmoid(gh[U : 2 * U])
            c = jnp.tanh(r * gh[2 * U :])
            h = z * h + (1.0 - z) * c
            logits = jnp.dot(
                hwT, h.astype(dtype), preferred_element_type=jnp.float32
            )
            return h, acc + logits[0:1, :]

        h0 = jnp.full((U, T), 0.01, jnp.float32)
        z0 = jnp.zeros((1, T), jnp.float32)
        _, acc = jax.lax.fori_loop(0, N, body, (h0, z0))
        out_ref[:] = acc

    return kernel


def run(dtype):
    whT = jnp.full((3 * U, U), 0.02, dtype)
    hwT = jnp.full((2, U), 0.03, dtype)
    fn = pl.pallas_call(
        make_kernel(dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32),
    )
    jit_fn = jax.jit(lambda a, b: fn(a, b))
    float(jit_fn(whT, hwT)[0, 0])  # compile + sync
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jit_fn(whT, hwT)
        float(out[0, 0])
        times.append((time.perf_counter() - t0) / REPS)
    dt = sorted(times)[len(times) // 2]
    flops = N * (2 * 3 * U * U * T + 2 * 2 * U * T)
    print(
        f"{jnp.dtype(dtype).name:9s}  {dt*1e6:8.1f} us/launch   "
        f"{flops/dt/1e12:6.2f} TFLOP/s"
    )
    return dt


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  shape: U={U} T={T} N={N}")
    t32 = run(jnp.float32)
    tbf = run(jnp.bfloat16)
    print(f"bf16 speedup: {t32/tbf:.2f}x")
