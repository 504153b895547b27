"""minSR vs Adam full-step head-to-head, same session, both 1D families.

The honest metric for the optimizer premium (the link is ~5x variable
day-to-day): per-step rate RATIO minSR/Adam at the flagship shapes,
measured back-to-back via run_steps(K) device-side scans.

Run from /root/repo:  timeout 580 python scripts/exp_minsr_headtohead.py
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
K = 100


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.ravel(leaf)[0].astype(jnp.float32))


def bench(label, fn, *args):
    _sync(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"  {label:44s} {K/med:8.1f} steps/s")
    return med


def family(tag, ansatz, ham, **cfg_kw):
    print(tag)
    rates = {}
    variants = [
        ("adam", {}),
        ("minsr[chol]", dict(optimizer="minsr", sr_solver="chol")),
        ("minsr[cg64]", dict(optimizer="minsr", sr_solver="cg")),
    ]
    for label, kw in variants:
        cfg = TrainConfig(
            num_samples=S, learning_rate=1e-3,
            **{"optimizer": "adam", **kw, **cfg_kw},
        )
        tr = VMCTrainer(ansatz, ham, cfg)
        st = tr.init()
        t = bench(f"full step x{K} [{label}]",
                  lambda s: tr.run_steps(s, jax.random.PRNGKey(0), K)[0], st)
        rates[label] = K / t
    for label in ("minsr[chol]", "minsr[cg64]"):
        print(f"  ratio {label}/adam: {rates[label]/rates['adam']:.3f}")


def main():
    family("1DTFIM PRNN1D N=100 U=50 S=500",
           PRNN1D(num_sites=N, units=(U,)), TFIM1D(num_sites=N, bx=1.0))
    family("J1J2 CRNNU1 N=100 U=50 S=500",
           CRNNU1(num_sites=N, units=(U,)),
           J1J2(num_sites=N, j2=0.2))


if __name__ == "__main__":
    main()
