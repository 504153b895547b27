"""Benchmark harness: flagship VMC throughput on the reference headline config.

Workload: 1D TFIM, N=100 sites, 1x50 GRU units, 500 Monte-Carlo samples per
step — the reference's largest published 1DTFIM configuration
(``/root/reference/1DTFIM/run_1dTFIM.py:9`` scaled to the N=100 DMRG anchor,
``Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`` cell 24).  One full VMC step =
autoregressive sampling + (N+1)*S off-diagonal log-prob evaluations + policy
gradient + Adam update, all in one jitted program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md).  TF1
1.13 on a Colab-class GPU runs this config at roughly 1-2 s/step (unrolled
100-step graph sampling + three chunked 25k-row session feeds + BPTT), i.e.
~250-500 samples/s.  We use 500 samples/s as the reference estimate, so
``vs_baseline`` is a conservative speedup multiplier.
"""

import json
import time

import jax

REFERENCE_SAMPLES_PER_SEC_EST = 500.0

N_SITES = 100
UNITS = (50,)
NUM_SAMPLES = 500
WARMUP_STEPS = 3
STEPS_PER_TRIAL = 20
NUM_TRIALS = 5


def main():
    from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer

    trainer = VMCTrainer(
        PRNN1D(num_sites=N_SITES, units=UNITS),
        TFIM1D(num_sites=N_SITES, bx=1.0),
        TrainConfig(num_samples=NUM_SAMPLES, learning_rate=5e-3),
    )
    state = trainer.init()
    key = jax.random.PRNGKey(0)

    # warmup + compile of the device-side multi-step (one dispatch runs
    # STEPS_PER_TRIAL full VMC updates in a lax.scan)
    state, metrics = trainer.run_steps(state, key, STEPS_PER_TRIAL)
    float(metrics["mean_energy"][-1])  # value fetch = hard synchronization

    # The device link in this environment has variable latency (and
    # block_until_ready has proven unreliable through the relay); synchronize
    # each trial by fetching the energy value, and report the median rate.
    rates = []
    for _ in range(NUM_TRIALS):
        t0 = time.perf_counter()
        state, metrics = trainer.run_steps(state, key, STEPS_PER_TRIAL)
        energy = float(metrics["mean_energy"][-1])
        rates.append(STEPS_PER_TRIAL / (time.perf_counter() - t0))
    assert energy < 0.0  # sanity: a real TFIM energy was computed

    steps_per_sec = sorted(rates)[len(rates) // 2]
    samples_per_sec = steps_per_sec * NUM_SAMPLES
    print(
        json.dumps(
            {
                "metric": "1dtfim_n100_vmc_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(
                    samples_per_sec / REFERENCE_SAMPLES_PER_SEC_EST, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
