"""Verify drive: LSTM fused rollout kernels end-to-end on the real TPU.

Runs (1) a short GRU VMC convergence check (regression of the flagship
path), (2) an LSTM VMC convergence check through the public API — the LSTM
sampler/log-prob now ride the fused Pallas rollouts, the estimator takes
the generic connected path, gradients the jnp VJP — and (3) an on-chip
LSTM sampler goodness-of-fit check against exact autoregressive
probabilities (the real-PRNG case interpret mode cannot cover).
"""

import sys, time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer
from rnnwavefunctions_tpu.ed import exact


def converge(cell, n=10, steps=300, units=(50,)):
    e_exact = exact.ground_state_energy(exact.tfim1d_dense(n, 1.0))
    trainer = VMCTrainer(
        PRNN1D(num_sites=n, units=units, cell=cell),
        TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=512),
    )
    state = trainer.init()
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for _ in range(steps):
        state, m = trainer.step(state, key)
    e = float(m["mean_energy"])
    dt = time.time() - t0
    rel = abs(e - e_exact) / abs(e_exact)
    print(f"[{cell}] E={e:.6f} exact={e_exact:.6f} rel_err={rel:.2e} "
          f"({steps} steps in {dt:.1f}s, {steps/dt:.0f} steps/s)")
    return rel


def lstm_gof(n=3, draws=20000):
    from rnnwavefunctions_tpu.ops import fused_gru

    ansatz = PRNN1D(num_sites=n, units=(12,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(2))
    samples, logp = fused_gru._sample_pallas(params, jnp.int32(7), draws, n)
    codes = np.asarray(samples) @ (2 ** np.arange(n))
    freq = np.bincount(codes, minlength=2**n) / draws
    basis = jnp.asarray(
        [[(c >> i) & 1 for i in range(n)] for c in range(2**n)]
    )
    probs = np.exp(np.asarray(ansatz.log_prob(params, basis)))
    err = np.max(np.abs(freq - probs))
    # sampler's own log-density vs teacher-forced recompute
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    lp_err = np.max(np.abs(np.asarray(logp) - want))
    print(f"[lstm gof] max|freq-p|={err:.4f} (tol 0.02), "
          f"max|logp-recompute|={lp_err:.2e}")
    assert err < 0.02, "LSTM fused sampler distribution mismatch"
    assert lp_err < 1e-3


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    rel_g = converge("gru")
    rel_l = converge("lstm")
    lstm_gof()
    assert rel_g < 1e-3 and rel_l < 1e-3
    print("VERIFY OK")
