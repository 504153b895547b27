"""Accuracy-anchor validation harness (run on real TPU hardware).

Trains the flagship configurations against the published ground-truth
energies from the reference tutorials (BASELINE.md): DMRG values for the 1D
TFIM at several system sizes and for the J1-J2 chain at N=100, plus exact
values from the ED oracles for small systems.  Prints one JSON line per
anchor with the relative error and wall-clock.

Usage:  python scripts/validate_anchors.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from rnnwavefunctions_tpu import (
    CRNNU1, J1J2, PRNN1D, TFIM1D, TrainConfig, VMCTrainer,
)
from rnnwavefunctions_tpu.vmc.observables import energy_estimate

# DMRG anchors from Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb cell 24 and
# Tutorials/J1J2/Tutorial_1DJ1J2.ipynb cell 25 (BASELINE.md).
TFIM_DMRG = {
    20: -25.1077971081,
    40: -50.5694337844,
    100: -126.9618766964,
}
J1J2_DMRG_N100 = {0.0: -44.127739860, 0.2: -40.73881897}


def run_tfim(n, steps, num_samples=500):
    trainer = VMCTrainer(
        PRNN1D(num_sites=n, units=(50,)),
        TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=num_samples, learning_rate=5e-3),
    )
    state = trainer.init()
    key = jax.random.PRNGKey(0)
    means, varis = [], []
    chunk = 500
    for _ in range(max(steps // chunk, 1)):
        state, ms = trainer.run_steps(state, key, chunk)
        means.extend(np.asarray(ms["mean_energy"]).tolist())
        varis.extend(np.asarray(ms["var_energy"]).tolist())
    return energy_estimate(means, varis, num_samples)


def run_j1j2(n, j2, steps, num_samples=512):
    trainer = VMCTrainer(
        CRNNU1(num_sites=n, units=(50,)),
        J1J2(num_sites=n, j1=1.0, j2=j2, marshall_sign=True),
        TrainConfig(num_samples=num_samples, learning_rate=2e-3),
    )
    state = trainer.init()
    key = jax.random.PRNGKey(0)
    means, varis = [], []
    chunk = 500
    for _ in range(max(steps // chunk, 1)):
        state, ms = trainer.run_steps(state, key, chunk)
        means.extend(np.asarray(ms["mean_energy"]).tolist())
        varis.extend(np.asarray(ms["var_energy"]).tolist())
    return energy_estimate(means, varis, num_samples)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="fewer steps / fewer anchors")
    args = p.parse_args(argv)

    anchors = []
    tfim_ns = [20, 100] if args.quick else [20, 40, 100]
    steps = 3000 if args.quick else 8000
    for n in tfim_ns:
        t0 = time.time()
        est, err = run_tfim(n, steps)
        ref = TFIM_DMRG[n]
        anchors.append({
            "anchor": f"1dtfim_n{n}_dmrg",
            "reference": ref,
            "estimate": est,
            "err_bar": err,
            "rel_error": abs(est - ref) / abs(ref),
            "steps": steps,
            "wall_s": round(time.time() - t0, 1),
        })
        print(json.dumps(anchors[-1]), flush=True)

    if not args.quick:
        for j2, ref in J1J2_DMRG_N100.items():
            t0 = time.time()
            est, err = run_j1j2(100, j2, steps)
            anchors.append({
                "anchor": f"j1j2_n100_j2_{j2}_dmrg",
                "reference": ref,
                "estimate": est,
                "err_bar": err,
                "rel_error": abs(est - ref) / abs(ref),
                "steps": steps,
                "wall_s": round(time.time() - t0, 1),
            })
            print(json.dumps(anchors[-1]), flush=True)

    worst = max(a["rel_error"] for a in anchors)
    print(json.dumps({"worst_rel_error": worst, "n_anchors": len(anchors)}))
    return anchors


if __name__ == "__main__":
    main()
