"""On-chip stage ablation of the J1-J2 exchange wavefront kernel (round 5).

The J1-J2 rows are the slowest 1D band (roof_frac ~0.20-0.23 vs 0.24-0.25
for the TFIM/parity rows) and the only kernel family that never had the
structured variant-search treatment (VERDICT r4 weak item 5: "bound
elsewhere" was never located).  This harness decomposes the estimator
launch into its serial stages by ablating whole wavefront families via the
measurement-only ``ablate`` knob of ``ops/j1j2_exchange_kernel``:

  base_only   sampling-free base rollout (prefix/up-count/history build)
  nn_only     + the gap-1 (J1) grouped wavefront
  no_wrap     + the gap-2 (J2) wavefront          [= full for OBC]
  full        + the <= 3 wrap trajectories        [PBC only]

Stage cost = difference between consecutive rows.  Each variant runs
K-scanned per dispatch (carry perturbation defeats hoisting, scalar fetch
syncs through the relay — protocol of exp_minsr_jac_split.py).  A crude
per-stage model for the wavefront families: each advances ~N + fpg
site-steps per group over ceil(B_bonds/fpg) groups, each site-step one
(LU x 3LU)-ish gate matmul over GROUP*TILE lanes plus the cRNN's
two-head/U(1)/Kahan VPU tail — if the measured family cost tracks the
site-step count, the kernel is latency/VPU-bound on the dependent per-site
chain, not matmul-bound.

Run from /root/repo:  timeout 580 python scripts/exp_j1j2_stage_ablation.py
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (no PYTHONPATH)
sys.path.insert(0, _HERE)                   # scripts/ for benchlib

import jax

from benchlib import make_scanned, run_timed
from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
    GROUP, SPILL_GROUP, _pick_tile, j1j2_exchange_offdiag,
)

K = 50


def bench(label, fn, params, samples):
    return run_timed(label, make_scanned(fn, K), params, samples, k=K)


def run_shape(n, u, s, periodic):
    tile, spill = _pick_tile(n, (u,), s)
    group = SPILL_GROUP if spill else GROUP
    pack = 2 * max(s, 8) <= tile
    fpg = (2 if pack else 1) * group
    print(f"\nN={n} U={u} S={s} periodic={periodic}: tile={tile} "
          f"spill={spill} group={group} pack={pack} (fpg={fpg})")
    ansatz = CRNNU1(num_sites=n, units=(u,))
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), s)

    stages = ["base_only", "nn_only", "no_wrap"]
    if periodic:
        stages.append("full")
    rows = {}
    for ab in stages:
        def fn(p, smp, ab=ab):
            return j1j2_exchange_offdiag(
                p, smp, u1=True, el_nn=0.5, el_nnn=0.1, has_nnn=True,
                periodic=periodic, ablate=ab,
            )
        rows[ab] = bench(ab, fn, params, samples)

    # stage deltas + the site-step count model
    def groups(bonds):
        return -(-bonds // fpg)

    base = rows["base_only"]
    nn = rows["nn_only"] - rows["base_only"]
    nnn = rows["no_wrap"] - rows["nn_only"]
    print(f"  stage deltas: base={base:.3f}  nn_family={nn:.3f}  "
          f"nnn_family={nnn:.3f}", end="")
    full_key = "full" if periodic else "no_wrap"
    if periodic:
        print(f"  wrap={rows['full'] - rows['no_wrap']:.3f}", end="")
    print()
    # site-steps: base = N; family(gap) sums (N - g0) over groups
    def fam_steps(bonds):
        return sum(n - g * fpg for g in range(groups(bonds)))

    s_base, s_nn, s_nnn = n, fam_steps(n - 1), fam_steps(n - 2)
    tot = rows[full_key]
    print(f"  site-step model: base={s_base} nn={s_nn} nnn={s_nnn} "
          f"-> per-site-step us: base={base / s_base * 1e3:.2f} "
          f"nn={nn / s_nn * 1e3:.2f} nnn={nnn / s_nnn * 1e3:.2f}")
    print(f"  total {tot:.3f} ms/iter")
    return rows


def main():
    print(f"J1-J2 exchange stage ablation; K={K} scanned iters/dispatch, "
          f"median of 5 dispatches")
    print(f"devices: {jax.devices()}")
    run_shape(100, 50, 500, periodic=False)
    run_shape(100, 50, 500, periodic=True)
    run_shape(1000, 50, 64, periodic=False)


if __name__ == "__main__":
    main()
