"""Cost of matmul precision on the full fused VMC step (real chip).

Times the flagship 1DTFIM N=100 S=500 trainer step and the N=1000 S=64
spill-path step under ambient ``jax.default_matmul_precision`` settings.
The context is read at trace time, so wrapping the first ``run_steps`` call
pins the precision of every matmul in the jitted program (including inside
the Pallas kernels).

Run: timeout 580 python scripts/exp_precision_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(prec, n, s, steps):
    from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer

    wf = PRNN1D(num_sites=n, units=(50,))
    ham = TFIM1D(num_sites=n, bx=1.0)
    cfg = TrainConfig(num_samples=s, learning_rate=5e-3)
    trainer = VMCTrainer(wf, ham, cfg)
    key = jax.random.PRNGKey(0)
    with jax.default_matmul_precision(prec):
        state = trainer.init()
        state, m = trainer.run_steps(state, key, steps)
        float(m["mean_energy"][-1])
        rates = []
        for _ in range(5):
            t0 = time.perf_counter()
            state, m = trainer.run_steps(state, key, steps)
            e = float(m["mean_energy"][-1])
            rates.append(steps / (time.perf_counter() - t0))
    r = sorted(rates)[2]
    print(f"N={n:5d} S={s:4d} precision={prec:8s} {r:8.1f} steps/s  E={e:.3f}")
    return r


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for n, s, steps in ((100, 500, 100), (1000, 64, 20)):
        rd = measure("default", n, s, steps)
        rh = measure("highest", n, s, steps)
        print(f"  -> highest/default = {rh/rd:.3f}x")
