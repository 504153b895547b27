"""On-chip step rates for the joint two-seed cRNN BPTT sweep (experiment).

Measures, same session: Adam vs minSR full-step rates for the J1J2 N=100
flagship (CRNNU1, the two-head ansatz the joint sweep targets) and for
1DTFIM N=100 (single-head PRNN1D — should be neutral under the parts-axis
generalization of vmc/jacobian._bptt).

Run from /root/repo:  timeout 580 python scripts/exp_minsr_joint_bptt.py
"""

import os
import sys, time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
from rnnwavefunctions_tpu.hamiltonians.tfim1d import TFIM1D
from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
from rnnwavefunctions_tpu.vmc.trainer import VMCTrainer, TrainConfig

N, U, S = 100, 50, 500
K = 20


def _sync(out):
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
    med = ts[len(ts) // 2]
    print(f"{label:30s} {med*1e3:9.2f} ms/dispatch -> {K/med:7.1f} steps/s")
    return K / med


def main():
    workloads = [
        ("j1j2_n100", CRNNU1(num_sites=N, units=(U,)),
         J1J2(num_sites=N, j2=0.2)),
        ("1dtfim_n100", PRNN1D(num_sites=N, units=(U,)),
         TFIM1D(num_sites=N, bx=1.0)),
    ]
    for name, ansatz, ham in workloads:
        rates = {}
        for opt in ("adam", "minsr"):
            cfg = TrainConfig(num_samples=S, learning_rate=1e-3, optimizer=opt)
            tr = VMCTrainer(ansatz, ham, cfg)
            st = tr.init()
            rates[opt] = bench(
                f"{name} [{opt}] x{K}",
                lambda s, tr=tr: tr.run_steps(s, jax.random.PRNGKey(0), K)[0],
                st,
            )
        print(f"  {name}: minSR/Adam step-rate ratio = "
              f"{rates['minsr']/rates['adam']:.2f}\n")


if __name__ == "__main__":
    main()
