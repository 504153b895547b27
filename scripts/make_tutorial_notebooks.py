"""Generate the tutorial notebooks (the reference L5 deliverable format:
``Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`` and
``Tutorials/J1J2/Tutorial_1DJ1J2.ipynb`` are runnable Colab notebooks; these
mirror their flow — ED oracle, small-N VMC training, comparison with the
notebook error-bar convention, DMRG anchors for large N — on this package's
API).  Run this script to (re)emit ``examples/Tutorial_1DTFIM.ipynb`` and
``examples/Tutorial_1DJ1J2.ipynb``; tests/test_tutorials.py executes every
code cell.
"""

import json
import os

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def md(source: str):
    return {"cell_type": "markdown", "metadata": {},
            "source": source.splitlines(keepends=True)}


def code(source: str):
    return {"cell_type": "code", "metadata": {}, "execution_count": None,
            "outputs": [], "source": source.splitlines(keepends=True)}


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


COMMON_SETUP = """\
import os, sys
if os.path.exists(os.path.join("..", "rnnwavefunctions_tpu")):
    sys.path.insert(0, "..")  # running from examples/

import jax
import jax.numpy as jnp
import numpy as np
"""

TFIM_CELLS = [
    md("""\
# Tutorial: 1D TFIM ground state with an RNN wavefunction

TPU-native equivalent of the reference tutorial
(`Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`): find the ground state of the
open-boundary transverse-field Ising chain

$$H = -\\sum_i \\sigma^z_i \\sigma^z_{i+1} - B_x \\sum_i \\sigma^x_i$$

with a positive RNN wavefunction $\\psi(\\sigma) = \\sqrt{p(\\sigma)}$
trained by Variational Monte Carlo, then validate against exact
diagonalization.  On a TPU the whole VMC step (autoregressive sampling,
all $N$ spin-flip amplitude ratios, gradient, Adam update) runs as fused
Pallas kernels inside one jitted program; on CPU the same API runs the
`lax.scan` reference path.
"""),
    code(COMMON_SETUP + """\
from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer
from rnnwavefunctions_tpu.ed import exact
from rnnwavefunctions_tpu.vmc.observables import energy_estimate

N = 10           # sites (keep <= 16: the ED oracle is dense 2^N)
BX = 1.0         # transverse field (the critical point)
NUM_UNITS = 20
NUM_SAMPLES = 256
NUM_STEPS = 800
"""),
    md("""\
## Exact diagonalization oracle

Dense $2^N \\times 2^N$ Hamiltonian, as in the reference notebook's
`ED_1DTFIM` cell (our `ed/native.py` C++ Lanczos reaches $N \\sim 24$ when
the dense build gets too big).
"""),
    code("""\
e_exact = exact.ground_state_energy(exact.tfim1d_dense(N, BX))
print(f"E_exact = {e_exact:.8f}")
"""),
    md("""\
## Train the pRNN wavefunction by VMC
"""),
    code("""\
trainer = VMCTrainer(
    PRNN1D(num_sites=N, units=(NUM_UNITS,)),
    TFIM1D(num_sites=N, bx=BX),
    TrainConfig(num_samples=NUM_SAMPLES, learning_rate=5e-3, seed=111),
)
state = trainer.init()
key = jax.random.PRNGKey(111)

mean_energy, var_energy = [], []
block = 50  # steps per device dispatch (one lax.scan)
for it in range(0, NUM_STEPS, block):
    state, ms = trainer.run_steps(state, key, block)
    mean_energy.extend(np.asarray(ms["mean_energy"]).tolist())
    var_energy.extend(np.asarray(ms["var_energy"]).tolist())
    print(f"step {it + block:5d}  mean(E) = {mean_energy[-1]:+.6f}  "
          f"var(E) = {var_energy[-1]:.4f}")
"""),
    md("""\
## Compare with ED

The reference notebook's estimator convention (cell 18):
$E \\approx \\mathrm{mean}(E_{[-100:]}) \\pm
\\sqrt{\\max(\\mathrm{var}E_{[-100:]}) / (100\\,S)}$.
"""),
    code("""\
est, err = energy_estimate(mean_energy, var_energy, NUM_SAMPLES, window=100)
rel = abs(est - e_exact) / abs(e_exact)
print(f"VMC estimate : {est:.8f} +- {err:.1e}")
print(f"ED reference : {e_exact:.8f}")
print(f"rel. error   : {rel:.2e}")
assert rel < 5e-3, "training did not converge to the ED energy"
"""),
    code("""\
try:
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 2, figsize=(10, 3))
    ax[0].plot(mean_energy); ax[0].axhline(e_exact, ls="--", c="k")
    ax[0].set(xlabel="VMC step", ylabel="mean energy")
    ax[1].semilogy(var_energy)
    ax[1].set(xlabel="VMC step", ylabel="var energy")
    fig.tight_layout()
except ImportError:
    print("matplotlib not installed; skipping the plot")
"""),
    md("""\
## Scaling up

DMRG anchors for large chains (reference notebook cell 24) to validate
production runs — use the CLI for those
(`python -m rnnwavefunctions_tpu.cli.run_1dtfim --systemsize 100 ...`):

| N | E(DMRG) |
|---|---------|
| 20 | -25.1077971081 |
| 50 | -63.3011891370 |
| 100 | -126.9618766964 |
| 1000 | -1272.8762945220 |

Measured in this repo (BENCHMARKS.md): N=100 converges to rel. error
3.1e-5 in 8000 steps (~26 s on one v5e chip).
"""),
]

J1J2_CELLS = [
    md("""\
# Tutorial: 1D J1-J2 ground state with a complex RNN wavefunction

TPU-native equivalent of the reference tutorial
(`Tutorials/J1J2/Tutorial_1DJ1J2.ipynb`): the frustrated Heisenberg chain

$$H = J_1 \\sum_i \\mathbf{S}_i \\cdot \\mathbf{S}_{i+1}
    + J_2 \\sum_i \\mathbf{S}_i \\cdot \\mathbf{S}_{i+2}$$

has a sign-structured ground state, so the ansatz is a *complex* RNN
wavefunction $\\psi = \\sqrt{p}\\, e^{i\\phi}$ with two heads over a shared
GRU trunk and an exact U(1) zero-magnetization constraint built into the
conditionals (the reference's heavyside masking, preserved bit-for-bit).
"""),
    code(COMMON_SETUP + """\
from rnnwavefunctions_tpu import CRNNU1, J1J2, TrainConfig, VMCTrainer
from rnnwavefunctions_tpu.ed import exact
from rnnwavefunctions_tpu.vmc.observables import energy_estimate

N = 10
J2 = 0.2
NUM_UNITS = 16
NUM_SAMPLES = 256
NUM_STEPS = 1000
"""),
    code("""\
e_exact = exact.ground_state_energy(exact.j1j2_dense(N, 1.0, J2))
print(f"E_exact = {e_exact:.8f}")
"""),
    md("""\
## Train

The local energies contract all $\\le 2N$ spin-exchange configurations per
sample in-graph (on TPU: a single fused wavefront kernel that also draws
the samples); the reference round-tripped every batch through host NumPy
and chunked `sess.run` feeds.
"""),
    code("""\
trainer = VMCTrainer(
    CRNNU1(num_sites=N, units=(NUM_UNITS,)),
    J1J2(num_sites=N, j1=1.0, j2=J2),
    TrainConfig(num_samples=NUM_SAMPLES, learning_rate=2e-3, seed=111),
)
state = trainer.init()
key = jax.random.PRNGKey(111)

mean_energy, var_energy = [], []
block = 50
for it in range(0, NUM_STEPS, block):
    state, ms = trainer.run_steps(state, key, block)
    mean_energy.extend(np.asarray(ms["mean_energy"]).tolist())
    var_energy.extend(np.asarray(ms["var_energy"]).tolist())
    print(f"step {it + block:5d}  mean(E) = {mean_energy[-1]:+.6f}  "
          f"var(E) = {var_energy[-1]:.4f}")
"""),
    code("""\
est, err = energy_estimate(mean_energy, var_energy, NUM_SAMPLES, window=100)
rel = abs(est - e_exact) / abs(e_exact)
print(f"VMC estimate : {est:.8f} +- {err:.1e}")
print(f"ED reference : {e_exact:.8f}")
print(f"rel. error   : {rel:.2e}")
# smoke threshold for short runs; the 30k-step schedule reaches ~1e-4
assert rel < 5e-2, "training did not move toward the ED energy"
"""),
    code("""\
# every drawn configuration obeys the U(1) zero-magnetization constraint
samples = trainer.ansatz.sample(state.params, jax.random.PRNGKey(7), 512)
assert (np.asarray(samples).sum(axis=1) == N // 2).all()
print("all samples have zero magnetization")
"""),
    md("""\
## Scaling up

DMRG anchors at N=100 (reference notebook cell 25); production runs via
`python -m rnnwavefunctions_tpu.cli.run_j1j2`:

| J2 | E(DMRG) |
|----|---------|
| 0.0 | -44.127739860 |
| 0.2 | -40.73881897 |
| 0.5 | -37.5 (exact, Majumdar-Ghosh) |
| 0.8 | -42.07006 |

Measured in this repo (BENCHMARKS.md): rel. error 6.5e-5 (J2=0) and
1.1e-4 (J2=0.2) with the 30k-step schedule.  Note the reference code's
Marshall-sign flag was silently landing in its `periodic` parameter
(`TrainingRNN_J1J2.py:118`); both flags are wired correctly here.
"""),
]


def main():
    for name, cells in [
        ("Tutorial_1DTFIM.ipynb", TFIM_CELLS),
        ("Tutorial_1DJ1J2.ipynb", J1J2_CELLS),
    ]:
        path = os.path.join(OUT_DIR, name)
        with open(path, "w") as f:
            json.dump(notebook(cells), f, indent=1)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
