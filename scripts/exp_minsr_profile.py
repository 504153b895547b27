"""Where does the minSR step spend its time?  (experiment harness)

Times, on the real chip at the flagship shape (N=100, U=50, S=500):
  1. the Adam full step (baseline, fused everything)
  2. the minSR full step
  3. the per-sample jacobian alone (current vmap-of-grad jnp path)
  4. the sample-space solve alone (given a precomputed O matrix)

Run from /root/repo:  timeout 580 python scripts/exp_minsr_profile.py
"""

import os
import sys, time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.hamiltonians.tfim1d import TFIM1D
from rnnwavefunctions_tpu.vmc.trainer import VMCTrainer, TrainConfig
from rnnwavefunctions_tpu.vmc import minsr
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

N, U, S = 100, 50, 500
K = 20  # steps per dispatch


def _sync(out):
    """One scalar value-fetch = one link RTT (block_until_ready is
    unreliable through the relay; per-leaf fetches would pay one RTT each)."""
    leaf = jax.tree.leaves(out)[0]
    float(jnp.ravel(leaf)[0].astype(jnp.float32))


def bench(label, fn, *args):
    _sync(fn(*args))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:34s} {ts[len(ts)//2]*1e3:9.2f} ms (median of 5)")
    return ts[len(ts) // 2]


def main():
    ansatz = PRNN1D(num_sites=N, units=(U,))
    ham = TFIM1D(num_sites=N, bx=1.0)

    for opt in ("adam", "minsr"):
        cfg = TrainConfig(num_samples=S, learning_rate=1e-3, optimizer=opt)
        tr = VMCTrainer(ansatz, ham, cfg)
        st = tr.init()
        t = bench(f"full step x{K} [{opt}]",
                  lambda s: tr.run_steps(s, jax.random.PRNGKey(0), K)[0], st)
        print(f"  -> {K / t:8.1f} steps/s")

    params = ansatz.init(jax.random.PRNGKey(1))
    samples = ansatz.sample(params, jax.random.PRNGKey(2), S)
    samples = jax.device_put(samples)

    jac = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grads(ansatz, p, s)[0],
        compiler_options=tpu_compiler_options(),
    )
    t_jac = bench("jacobian alone (vmap-of-grad)", jac, params, samples)

    o_re = jac(params, samples)
    e = jnp.ones((S,), jnp.float32)

    solve = jax.jit(
        lambda o, ee: minsr.minsr_direction(
            o, None, ee, None, jnp.mean(ee), None, 1e-3
        ),
        compiler_options=tpu_compiler_options(),
    )
    bench("solve alone (given O)", solve, o_re, e)

    print(f"\njacobian share of a minSR step: {t_jac*1e3:.2f} ms")


if __name__ == "__main__":
    main()
