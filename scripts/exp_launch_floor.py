"""Pin the per-op/launch latency floor that bounds the SR solve stage.

Every solver variant for the (500, 500) SPD system measures ~0.6 ms
through the K=50 scanned harness (scripts/exp_sr_solver.py) — including a
fully fused Pallas CG whose iteration count barely moves the number.  This
probe times, through the same harness:

  - an IDENTITY Pallas kernel on the same operands (pure launch cost)
  - a single in-kernel matvec (launch + 1 iteration)
  - fused CG at 8 vs 64 iterations (loop slope)
  - the same scan with NO kernel at all (harness floor)

Run from /root/repo:  timeout 580 python scripts/exp_launch_floor.py
"""

import functools
import os
import sys, time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rnnwavefunctions_tpu.ops import sr_cg
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

SP, K = 512, 400


def _sync(x):
    float(jnp.ravel(x)[0])


def bench(label, fn, *args):
    _sync(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"  {label:40s} {ts[len(ts)//2]/K*1e3:8.3f} ms/iter")


def scanned(fn):
    def run(t, c):
        def body(carry, _):
            out = fn(t + carry * 1e-30, c)
            return carry + jnp.sum(out).astype(jnp.float32), None

        carry, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=K
        )
        return carry

    return jax.jit(run, compiler_options=tpu_compiler_options())


def _identity_kernel(t_ref, c_ref, o_ref):
    o_ref[...] = c_ref[...] + t_ref[0:1, :]


def identity(t, c):
    return pl.pallas_call(
        _identity_kernel,
        out_shape=jax.ShapeDtypeStruct((1, SP), jnp.float32),
    )(t, c[None, :])[0]


def _matvec_kernel(t_ref, c_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        c_ref[...], t_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def matvec(t, c):
    return pl.pallas_call(
        _matvec_kernel,
        out_shape=jax.ShapeDtypeStruct((1, SP), jnp.float32),
    )(t, c[None, :])[0]


def main():
    t = jax.random.normal(jax.random.PRNGKey(0), (SP, SP), jnp.float32)
    t = t @ t.T / SP + 5.0 * jnp.eye(SP)
    c = jax.random.normal(jax.random.PRNGKey(1), (SP,), jnp.float32)

    bench("no kernel (harness floor)", scanned(lambda tt, cc: cc * 2.0), t, c)
    bench("identity pallas kernel", scanned(identity), t, c)
    bench("single in-kernel matvec", scanned(matvec), t, c)
    for it in (8, 64):
        bench(
            f"fused cg {it}",
            scanned(lambda tt, cc, it=it: sr_cg.sr_cg_solve(
                tt, cc, iters=it)),
            t, c,
        )


if __name__ == "__main__":
    main()
