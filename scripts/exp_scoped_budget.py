"""Measure what the raised scoped-VMEM limit (ops/tiling.py) buys.

With ``xla_tpu_scoped_vmem_limit_kib=65536`` forwarded by the trainer's jits
(commit "Raise the TPU scoped-VMEM limit"), hidden-state histories that used
to exceed the 14 MiB budget can stay VMEM-resident instead of spilling to
HBM, and tiles can widen.  This experiment times the candidate regimes per
workload by monkeypatching each kernel module's pick function (the joint
``_pick`` where the module has one — e.g. ``fused_mdrnn_bwd`` reads
``_pick``, not ``_pick_tile`` — else ``_pick_tile``) and running the full
training step (fwd estimator + BPTT backward both re-pick).

Run from /root/repo:  timeout 580 python scripts/exp_scoped_budget.py [case]
"""

import statistics
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

from rnnwavefunctions_tpu import (
    MDRNN2D,
    PRNN1D,
    TFIM1D,
    TFIM2D,
    TrainConfig,
    VMCTrainer,
)
from rnnwavefunctions_tpu.ops import fused_gru_bwd as bk
from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk
from rnnwavefunctions_tpu.ops import tfim_flip_kernel as tk


def measure(ansatz, ham, samples, steps, trials=5):
    trainer = VMCTrainer(ansatz, ham, TrainConfig(num_samples=samples))
    state = trainer.init()
    key = jax.random.PRNGKey(0)
    state, ms = trainer.run_steps(state, key, steps)  # compile + warm
    float(ms["mean_energy"][-1])
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        state, ms = trainer.run_steps(state, key, steps)
        float(ms["mean_energy"][-1])  # sync (block_until_ready unreliable)
        times.append(time.perf_counter() - t0)
    return steps / statistics.median(times)


def run(label, fn):
    try:
        sps = fn()
        print(f"{label}: {sps:.1f} steps/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


def with_pick(mod, pick):
    orig = mod._pick_tile

    class _Ctx:
        def __enter__(self):
            mod._pick_tile = pick

        def __exit__(self, *a):
            mod._pick_tile = orig

    return _Ctx()


def case_n1000():
    mk_a = lambda: PRNN1D(num_sites=1000, units=(50,))
    h = TFIM1D(num_sites=1000, bx=1.0)
    run("n1000 current (flip spill g16 / bwd spill)",
        lambda: measure(mk_a(), h, 64, 30))
    with with_pick(tk, lambda *a, **k: (128, False)):
        run("n1000 flip RESIDENT t128 (bwd current)",
            lambda: measure(mk_a(), h, 64, 30))
    with with_pick(bk, lambda *a, **k: (128, False)):
        run("n1000 bwd RESIDENT t128 (flip current)",
            lambda: measure(mk_a(), h, 64, 30))
    with with_pick(tk, lambda *a, **k: (128, False)), \
         with_pick(bk, lambda *a, **k: (128, False)):
        run("n1000 BOTH RESIDENT t128",
            lambda: measure(mk_a(), h, 64, 30))


def case_u256():
    mk_a = lambda: PRNN1D(num_sites=100, units=(256,))
    h = TFIM1D(num_sites=100, bx=1.0)
    run("u256 current (flip t128 resident)", lambda: measure(mk_a(), h, 500, 50))
    with with_pick(tk, lambda *a, **k: (256, False)):
        run("u256 flip t256 resident", lambda: measure(mk_a(), h, 500, 50))
    with with_pick(tk, lambda *a, **k: (512, False)):
        run("u256 flip t512 resident", lambda: measure(mk_a(), h, 500, 50))


def with_pick3(mod, pick):
    # the MDRNN entry points consume the joint (tile, spill, group) `_pick`
    orig = mod._pick

    class _Ctx:
        def __enter__(self):
            mod._pick = pick

        def __exit__(self, *a):
            mod._pick = orig

    return _Ctx()


def case_mdrnn24():
    mk_a = lambda: MDRNN2D(nx=24, ny=24, units=50)
    h = TFIM2D(nx=24, ny=24, bx=3.0, encoding="grid")
    run("mdrnn24 current", lambda: measure(mk_a(), h, 128, 10))
    ns = 24 * 24
    with with_pick3(mk, lambda *a, **k: (128, False,
                                         mk._group_for(128, 50, ns))):
        run("mdrnn24 RESIDENT t128", lambda: measure(mk_a(), h, 128, 10))
    with with_pick3(mk, lambda *a, **k: (128, True,
                                         mk._group_for(128, 50, ns))):
        run("mdrnn24 SPILL t128", lambda: measure(mk_a(), h, 128, 10))


def case_mdrnn_bwd():
    """The 2D BPTT kernel at large lattices (fused_mdrnn_bwd now carries
    the 48 MB budget, resident through 40x40 at 50 units): default pick vs
    the forced fused/jnp backends.  Measured: jnp VJP 77.8/32.1 steps/s at
    24x24/32x32 S=128, fused 98.4/38.2 (+26%/+19%)."""
    from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as mbk

    for n, s in ((24, 128), (32, 128), (32, 64)):
        mk_a = lambda: MDRNN2D(nx=n, ny=n, units=50)
        h = TFIM2D(nx=n, ny=n, bx=3.0, encoding="grid")
        run(f"mdrnn{n} S={s} default pick",
            lambda: measure(mk_a(), h, s, 10))
        orig_sup, orig_pick = mbk.supports, mbk._pick
        try:
            mbk.supports = lambda *a, **k: False
            run(f"mdrnn{n} S={s} forced jnp bwd",
                lambda: measure(mk_a(), h, s, 10))
            mbk.supports = lambda *a, **k: True
            mbk._pick = lambda *a, **k: (128, None)
            run(f"mdrnn{n} S={s} forced FUSED bwd t128 resident",
                lambda: measure(mk_a(), h, s, 10))
        finally:
            mbk.supports, mbk._pick = orig_sup, orig_pick


def case_mdrnn_bwd_spill():
    """Beyond the fused backward's resident bound (~40x40 at 50 units) the
    row-chunk HBM spill takes over from the jnp scan-of-scans VJP."""
    from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as mbk

    for n, s, steps in ((48, 64, 5),):
        mk_a = lambda: MDRNN2D(nx=n, ny=n, units=50)
        h = TFIM2D(nx=n, ny=n, bx=3.0, encoding="grid")
        print(f"mdrnn{n} bwd pick: {mbk._pick(n, n, 50, s)}", flush=True)
        run(f"mdrnn{n} S={s} default (spilled fused bwd)",
            lambda: measure(mk_a(), h, s, steps, trials=3))
        orig = mbk.supports
        try:
            mbk.supports = lambda *a, **k: False
            run(f"mdrnn{n} S={s} forced jnp bwd",
                lambda: measure(mk_a(), h, s, steps, trials=3))
        finally:
            mbk.supports = orig


CASES = {"n1000": case_n1000, "u256": case_u256, "mdrnn24": case_mdrnn24,
         "mdrnn_bwd": case_mdrnn_bwd, "mdrnn_bwd_spill": case_mdrnn_bwd_spill}

if __name__ == "__main__":
    which = sys.argv[1:] or list(CASES)
    for c in which:
        CASES[c]()
