"""Group-width sweep for the J1-J2 exchange wavefront at N=100 (round 5).

The round-3 sweep covered only the N=1000 spill/packed regime (g8/g16/g32:
91.8/91.4/91.2 ms — flat, "bound elsewhere").  The round-5 stage ablation
(exp_j1j2_stage_ablation.py) then showed the RESIDENT N=100 config is
latency-bound on the dependent site chain: per-site-step cost is ~flat
from 512 lanes (base pass) to 4096 lanes (G=8 wavefront), so halving the
wavefront iteration count by doubling GROUP should cut family cost well
below 2:1 matmul scaling.  This harness measures the full estimator
(both the offdiag and the fused sample+exchange variants) at G in
{8, 16, 32} for the bench shapes.

Run from /root/repo:  timeout 580 python scripts/exp_j1j2_group_sweep.py
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (no PYTHONPATH)
sys.path.insert(0, _HERE)                   # scripts/ for benchlib

import jax

from benchlib import make_scanned, run_timed
from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
from rnnwavefunctions_tpu.ops import j1j2_exchange_kernel as jk

K = 50


def bench(label, fn, params, samples):
    return run_timed(label, make_scanned(fn, K), params, samples, k=K)


def main():
    print(f"J1-J2 exchange group sweep; K={K}; devices={jax.devices()}")
    for n, u, s, periodic in [(100, 50, 500, False), (100, 50, 500, True)]:
        ansatz = CRNNU1(num_sites=n, units=(u,))
        params = ansatz.init(jax.random.PRNGKey(0))
        samples = ansatz.sample(params, jax.random.PRNGKey(1), s)
        print(f"\nN={n} U={u} S={s} periodic={periodic}")
        for g in (8, 16, 32):
            jk.GROUP = g
            jk.j1j2_exchange_offdiag.clear_cache()

            def fn(p, smp):
                return jk.j1j2_exchange_offdiag(
                    p, smp, u1=True, el_nn=0.5, el_nnn=0.1, has_nnn=True,
                    periodic=periodic,
                )

            bench(f"offdiag G={g}", fn, params, samples)
        jk.GROUP = 8
        jk.j1j2_exchange_offdiag.clear_cache()


if __name__ == "__main__":
    main()
