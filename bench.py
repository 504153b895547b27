"""Benchmark harness: VMC throughput + MFU on the reference workloads.

Flagship: 1D TFIM, N=100 sites, 1x50 GRU units, 500 Monte-Carlo samples per
step — the reference's largest published 1DTFIM configuration
(``/root/reference/1DTFIM/run_1dTFIM.py:9`` scaled to the N=100 DMRG anchor,
``Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`` cell 24).  One full VMC step =
autoregressive sampling + (N+1)*S off-diagonal log-prob evaluations + policy
gradient + Adam update, all in one jitted program.  Also measured: the
parity-symmetrized N=100 chain, the complex J1-J2 N=100 chain, and the 2D
MDRNN on 6x6 — one row per fused estimator family, so regressions on any
path are visible in ``BENCH_r*.json``.

Driver contract (round-5 fix): the FINAL stdout line is a COMPACT headline
JSON — metric/value/unit/vs_baseline/mfu/roof_frac, the row-timeout count,
and a small accuracy anchor — sized well under the driver's 2000-char tail
window (round 4's record embedded all 22 workload rows in the last line and
the tail capture truncated the headline away: BENCH_r04.json ``parsed:
null``).  The full per-workload record is written to ``BENCH_DETAIL.json``
next to this file AND printed as an *earlier* stdout line, so it survives in
logs and in the repo without ever risking the headline.

Isolation (round-4 redesign): every workload row runs in its OWN
subprocess (``python bench.py --row NAME``) under a hard kill.  The device
tunnel's worst failure mode is a hang inside a GIL-holding C call, which
neither SIGALRM nor watchdog threads can interrupt in-process — a
subprocess kill is the only mechanism that bounds it (CLAUDE.md).  A row
timeout therefore costs exactly one row: the parent re-probes the device
and continues with the remaining rows (round 3 lost the whole 20-row
record to a single 420 s stall under the old skip-all policy).  Rows share
the persistent XLA compilation cache (``cli/run_loop.enable_persistent_cache``)
so repeat shapes skip the 20-40 s compiles, and a tiny warm *canary* row
runs first to absorb tunnel wake-up + cache-infrastructure cold start.

MFU convention: model FLOPs count matmul FLOPs only (2*M*N*K), summed over
the passes a step actually executes — base/sampling rollouts, wavefront
iterations (G columns each), the loss forward, and its BPTT backward counted
as 3x a forward rollout (vjp forward recompute + ~2x for the two backward
matmul chains).  Peak is the v5e MXU bf16 rate, 197 TFLOP/s: under the
default matmul precision f32 operands execute as single-pass bf16 with f32
accumulation — proven on-chip by the U=256 row, whose model rate (108
TFLOP/s) exceeds the 8-pass f32 rate (49.2) that an earlier revision of
this file used as the denominator (it reported MFU > 1; corrected in round
3 — historical rows rescale by 49.2/197 ~ 0.25x).  Each row also reports
``roof_frac``: the same rate against the *shape* roof peak*min(U,128)/128,
since a K=U contraction underfills the 128-deep systolic array — at U=50
the roof is 77 TFLOP/s and the serial per-site latency floor binds well
below it (scripts/exp_wavefront_pipeline.py).

Baseline: the reference publishes no throughput numbers (BASELINE.md).  TF1
1.13 on a Colab-class GPU runs the flagship config at roughly 1-2 s/step
(unrolled 100-step graph sampling + three chunked 25k-row session feeds +
BPTT), i.e. ~250-500 samples/s.  We use 500 samples/s as the reference
estimate, so ``vs_baseline`` is a conservative speedup multiplier.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REFERENCE_SAMPLES_PER_SEC_EST = 500.0
PEAK_BF16_FLOPS = 197e12  # v5e MXU bf16 (what default-precision f32 runs as)

NUM_SAMPLES = 500
# Trial length trades compile time against amortizing the dev-link's
# synchronization RTT (~25 ms per value fetch through the relay): at 20
# steps/dispatch the flagship reads ~275 steps/s, at 100 steps/dispatch the
# true device rate ~400 steps/s.  Slow workloads (N=1000, ~100 ms/step)
# keep short trials.
STEPS_PER_TRIAL = 100
SLOW_STEPS_PER_TRIAL = 20
NUM_TRIALS = 5
GROUP = 8  # wavefront group width (ops/tfim_flip_kernel.GROUP)
ROW_TIMEOUT_S = int(os.environ.get("BENCH_ROW_TIMEOUT_S", "420"))
CANARY_TIMEOUT_S = int(os.environ.get("BENCH_CANARY_TIMEOUT_S", "300"))
# Global wall budget: once exhausted, remaining rows are marked skipped and
# the record (with every row measured so far) still prints.  The flagship
# runs right after the canary, so the headline lands within ~2 rows even on
# a bad-link day.
TOTAL_BUDGET_S = int(os.environ.get("BENCH_TOTAL_BUDGET_S", "5400"))
CACHE_DIR = os.environ.get(
    "BENCH_JAX_CACHE_DIR",
    os.path.join("~", ".cache", "rnnwavefunctions_tpu", "jax"),
)


def _device_reachable(timeout_s: int = 150, retries: int = 2) -> bool:
    """Probe backend init in a SUBPROCESS with a hard kill: the tunnel's
    failure mode is a hang inside a GIL-holding C call, which neither
    SIGALRM nor a watchdog thread can interrupt in-process.  Retried once
    (CLAUDE.md: transient tunnel hangs clear on a second attempt)."""
    probe = ("import jax, jax.numpy as jnp; jax.devices(); "
             "print(float(jnp.ones((2, 2)).sum()))")
    for _ in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=timeout_s, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _wavefront_cols(n_bonds, n_sites, first_site, group=GROUP):
    """Total wavefront (iteration, column-block) site-advances: every group
    of ``group`` trajectories advances together from its first divergence
    site to the end of the chain."""
    total = 0
    g0 = 0
    while g0 < n_bonds:
        total += max(0, n_sites - (g0 + first_site)) * group
        g0 += group
    return total


def flops_tfim_plain(n, u, s, layers=1):
    # per site-column matmul cost of an L-layer stack: layer 0 consumes the
    # 2-dim one-hot (3U x U recurrent only), deeper layers add a 3U x U
    # input matmul as well
    c = 6 * u * u * (2 * layers - 1) + 4 * u
    base = n * c                       # fused sample + base pass
    wf = _wavefront_cols(n, n, 1) * c  # flip suffixes
    loss = 4 * n * c                   # pallas fwd + fused BPTT (replay + 2x)
    return s * (base + wf + loss)


def flops_tfim_lstm(n, u, s):
    # LSTM site-column: (4U, U) recurrent matmul (8u^2) + head; the input
    # projection is a 2-column select like the GRU kernels.  The loss
    # backward is the jnp VJP (recompute + 2 backward chains ~ 3 rollouts),
    # same 4x-forward convention as the fused BPTT rows.
    c = 8 * u * u + 4 * u
    base = n * c
    wf = _wavefront_cols(n, n, 1) * c
    loss = 4 * n * c
    return s * (base + wf + loss)


def flops_tfim_parity(n, u, s):
    c = 6 * u * u + 4 * u
    one_dir = n * c + _wavefront_cols(n, n, 1) * c
    loss = 2 * 4 * n * c  # both chain directions
    return s * (2 * one_dir + loss)


def flops_j1j2(n, u, s, group=GROUP, periodic=False):
    c = 6 * u * u + 8 * u  # two heads
    base = n * c
    wf = (
        _wavefront_cols(n - 1, n, 0, group)
        + _wavefront_cols(n - 2, n, 0, group)
    ) * c
    if periodic:
        # the 3 wrap-around bonds run as full-length trajectories in one
        # extra group-wide wavefront block (hamiltonians/j1j2.py)
        wf += group * n * c
    loss = 4 * n * c
    return s * (base + wf + loss)


def flops_mdrnn(nx, ny, u, s):
    ns = nx * ny
    c = 4 * u * u + 4 * u  # Wh, Wv matmuls + head
    base = ns * c
    wf = _wavefront_cols(ns, ns, 0) * c
    loss = 4 * ns * c
    return s * (base + wf + loss)


# ---------------------------------------------------------------------------
# Workload table.  Static metadata only (names, sizes, FLOPs, trial config)
# — the parent process reads this without ever importing jax/the package;
# ansatz/hamiltonian construction happens in the per-row subprocess via
# ``_build_trainer``.  Row schema:
#   (name, num_samples, steps_per_trial, flops_per_step, units, cfg_overrides)
# ---------------------------------------------------------------------------
WORKLOADS = [
    # warm canary: tiny shapes, absorbs tunnel wake-up + persistent-cache
    # cold start before any row that counts (excluded from the record's
    # flagship; kept in "workloads" for visibility)
    ("canary_n10", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(10, 50, NUM_SAMPLES), 50, None),
    ("1dtfim_n100", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_tfim_plain(100, 50, NUM_SAMPLES), 50, None),
    ("parity_n100", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_tfim_parity(100, 50, NUM_SAMPLES), 50, None),
    ("j1j2_n100", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_j1j2(100, 50, NUM_SAMPLES), 50, None),
    ("mdrnn_6x6", NUM_SAMPLES, 4 * STEPS_PER_TRIAL,
     flops_mdrnn(6, 6, 50, NUM_SAMPLES), 50, None),
    ("1dtfim_lstm_n100", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_tfim_lstm(100, 50, NUM_SAMPLES), 50, None),
    ("1dtfim_2layer_n100", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_tfim_plain(100, 50, NUM_SAMPLES, layers=2), 50, None),
    ("snake2d_4x4", NUM_SAMPLES, 4 * STEPS_PER_TRIAL,
     flops_tfim_plain(16, 50, NUM_SAMPLES), 50, None),
    # reference runs 4x4 (run_2dTFIM.py:10); 10x10 shows the family's
    # kernel throughput once past the dispatch floor
    ("snake2d_10x10", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_tfim_plain(100, 50, NUM_SAMPLES), 50, None),
    ("mdrnn_16x16", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_mdrnn(16, 16, 50, NUM_SAMPLES), 50, None),
    ("mdrnn_32x32_s128", 128, SLOW_STEPS_PER_TRIAL,
     flops_mdrnn(32, 32, 50, 128), 50, None),
    ("mdrnn_24x24_s128", 128, SLOW_STEPS_PER_TRIAL,
     flops_mdrnn(24, 24, 50, 128), 50, None),
    # beyond the 2D resident bound: row-window forward spill + the
    # row-chunk-spilled fused BPTT backward (both HBM-streamed paths)
    ("mdrnn_48x48_s64", 64, SLOW_STEPS_PER_TRIAL,
     flops_mdrnn(48, 48, 50, 64), 50, None),
    ("j1j2_n100_pbc", NUM_SAMPLES, STEPS_PER_TRIAL,
     flops_j1j2(100, 50, NUM_SAMPLES, periodic=True), 50, None),
    ("1dtfim_n100_u256", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(100, 256, NUM_SAMPLES), 256, None),
    ("1dtfim_n1000_s64", 64, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(1000, 50, 64), 50, None),
    ("parity_n1000_s64", 64, SLOW_STEPS_PER_TRIAL,
     flops_tfim_parity(1000, 50, 64), 50, None),
    ("j1j2_n1000_s64", 64, SLOW_STEPS_PER_TRIAL,
     flops_j1j2(1000, 50, 64, group=8), 50, None),  # resident regime group
    # minSR optimizer rows: regress the stash-and-contract per-sample
    # jacobian paths (vmc/jacobian.py — real PRNN1D and complex CRNNU1
    # two-head seeding) + the sample-space solve (vmc/minsr.py).
    # FLOPs model = the model's useful work (as every row), so mfu here
    # is goodput — the jacobian is optimizer overhead by construction;
    # the rows' value is steps/s (convergence per step is the feature:
    # 2.2-3.5x fewer steps to the anchors, 5-seed medians — BENCHMARKS.md
    # round 5).
    ("1dtfim_n100_minsr", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(100, 50, NUM_SAMPLES), 50,
     {"optimizer": "minsr", "learning_rate": 5e-2}),
    ("j1j2_n100_minsr", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_j1j2(100, 50, NUM_SAMPLES), 50,
     {"optimizer": "minsr", "learning_rate": 5e-2}),
    ("mdrnn_8x8_minsr", NUM_SAMPLES, SLOW_STEPS_PER_TRIAL,
     flops_mdrnn(8, 8, 50, NUM_SAMPLES), 50,
     {"optimizer": "minsr", "learning_rate": 5e-2}),
    # round-5 rows (VERDICT r4 items 2+5):
    # - n1000 minSR exercises the HBM-spilled fused jacobian sweep
    #   (ops/fused_jac.py _plan spill regime engages at N=1000/U=50) — the
    #   reference's long-chain regime (Tutorial_1DTFIM.ipynb cell 24 scale)
    #   under the second-order optimizer, measured on chip for the first
    #   time here.
    ("1dtfim_n1000_minsr", 64, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(1000, 50, 64), 50,
     {"optimizer": "minsr", "learning_rate": 5e-2}),
    # - large-batch rows: MC error ~ 1/sqrt(S) makes batch the physics
    #   lever; these show what a filled batch dimension does to samples/s
    #   and roof_frac vs the reference-default S=500.
    ("1dtfim_n100_s4096", 4096, SLOW_STEPS_PER_TRIAL,
     flops_tfim_plain(100, 50, 4096), 50, None),
    ("j1j2_n100_s2048", 2048, SLOW_STEPS_PER_TRIAL,
     flops_j1j2(100, 50, 2048), 50, None),
]

# Accuracy probe (VERDICT r4 item 9): a driver-checkable physics number in
# the headline record.  N=20 TFIM, minSR, trained in 50-step device blocks
# until the trailing-50 mean energy is within 1e-3 relative of the DMRG
# anchor (Tutorial_1DTFIM.ipynb cell 24) — ~50 minSR steps, seconds of
# device time after compile.
ACCURACY_ANCHOR_N20 = -25.1077971081
ACCURACY_MAX_STEPS = 600
ACCURACY_BLOCK = 50
ACCURACY_RTOL = 1e-3


def _build_trainer(name, num_samples, cfg_overrides):
    """Construct (ansatz, hamiltonian, trainer) for a named row.  Imports
    the package — subprocess side only."""
    from rnnwavefunctions_tpu import (
        CRNNU1, J1J2, MDRNN2D, PRNN1D, TFIM1D, TFIM2D, TrainConfig,
        VMCTrainer,
    )
    from rnnwavefunctions_tpu.models.prnn_snake2d import PRNNSnake2D

    builders = {
        "canary_n10": lambda: (PRNN1D(num_sites=10, units=(50,)),
                               TFIM1D(num_sites=10, bx=1.0)),
        "1dtfim_n100": lambda: (PRNN1D(num_sites=100, units=(50,)),
                                TFIM1D(num_sites=100, bx=1.0)),
        "parity_n100": lambda: (
            PRNN1D(num_sites=100, units=(50,), parity=True),
            TFIM1D(num_sites=100, bx=1.0)),
        "j1j2_n100": lambda: (CRNNU1(num_sites=100, units=(50,)),
                              J1J2(num_sites=100, j2=0.2)),
        "mdrnn_6x6": lambda: (MDRNN2D(nx=6, ny=6, units=50),
                              TFIM2D(nx=6, ny=6, bx=3.0, encoding="grid")),
        "1dtfim_lstm_n100": lambda: (
            PRNN1D(num_sites=100, units=(50,), cell="lstm"),
            TFIM1D(num_sites=100, bx=1.0)),
        "1dtfim_2layer_n100": lambda: (
            PRNN1D(num_sites=100, units=(50, 50)),
            TFIM1D(num_sites=100, bx=1.0)),
        "snake2d_4x4": lambda: (
            PRNNSnake2D(nx=4, ny=4, units=(50,)),
            TFIM2D(nx=4, ny=4, bx=3.0, encoding="flat")),
        "snake2d_10x10": lambda: (
            PRNNSnake2D(nx=10, ny=10, units=(50,)),
            TFIM2D(nx=10, ny=10, bx=3.0, encoding="flat")),
        "mdrnn_16x16": lambda: (
            MDRNN2D(nx=16, ny=16, units=50),
            TFIM2D(nx=16, ny=16, bx=3.0, encoding="grid")),
        "mdrnn_32x32_s128": lambda: (
            MDRNN2D(nx=32, ny=32, units=50),
            TFIM2D(nx=32, ny=32, bx=3.0, encoding="grid")),
        "mdrnn_24x24_s128": lambda: (
            MDRNN2D(nx=24, ny=24, units=50),
            TFIM2D(nx=24, ny=24, bx=3.0, encoding="grid")),
        "mdrnn_48x48_s64": lambda: (
            MDRNN2D(nx=48, ny=48, units=50),
            TFIM2D(nx=48, ny=48, bx=3.0, encoding="grid")),
        "j1j2_n100_pbc": lambda: (
            CRNNU1(num_sites=100, units=(50,)),
            J1J2(num_sites=100, j2=0.2, periodic=True)),
        "1dtfim_n100_u256": lambda: (
            PRNN1D(num_sites=100, units=(256,)),
            TFIM1D(num_sites=100, bx=1.0)),
        "1dtfim_n1000_s64": lambda: (
            PRNN1D(num_sites=1000, units=(50,)),
            TFIM1D(num_sites=1000, bx=1.0)),
        "parity_n1000_s64": lambda: (
            PRNN1D(num_sites=1000, units=(50,), parity=True),
            TFIM1D(num_sites=1000, bx=1.0)),
        "j1j2_n1000_s64": lambda: (
            CRNNU1(num_sites=1000, units=(50,)),
            J1J2(num_sites=1000, j2=0.2)),
        "1dtfim_n100_minsr": lambda: (
            PRNN1D(num_sites=100, units=(50,)),
            TFIM1D(num_sites=100, bx=1.0)),
        "j1j2_n100_minsr": lambda: (
            CRNNU1(num_sites=100, units=(50,)),
            J1J2(num_sites=100, j2=0.2)),
        "mdrnn_8x8_minsr": lambda: (
            MDRNN2D(nx=8, ny=8, units=50),
            TFIM2D(nx=8, ny=8, bx=3.0, encoding="grid")),
        "1dtfim_n1000_minsr": lambda: (
            PRNN1D(num_sites=1000, units=(50,)),
            TFIM1D(num_sites=1000, bx=1.0)),
        "1dtfim_n100_s4096": lambda: (
            PRNN1D(num_sites=100, units=(50,)),
            TFIM1D(num_sites=100, bx=1.0)),
        "j1j2_n100_s2048": lambda: (
            CRNNU1(num_sites=100, units=(50,)),
            J1J2(num_sites=100, j2=0.2)),
    }
    ansatz, ham = builders[name]()
    cfg_kw = {"num_samples": num_samples, "learning_rate": 5e-3}
    cfg_kw.update(cfg_overrides or {})
    cfg = TrainConfig(**cfg_kw)
    return VMCTrainer(ansatz, ham, cfg)


def measure(trainer, steps=STEPS_PER_TRIAL):
    import jax

    state = trainer.init()
    key = jax.random.PRNGKey(0)
    # warmup + compile of the device-side multi-step at the trial length
    # (one dispatch runs ``steps`` full VMC updates in a lax.scan)
    state, metrics = trainer.run_steps(state, key, steps)
    float(metrics["mean_energy"][-1])  # value fetch = hard synchronization

    # The device link in this environment has variable latency (and
    # block_until_ready has proven unreliable through the relay); synchronize
    # each trial by fetching the energy value, and report the median rate.
    rates = []
    for _ in range(NUM_TRIALS):
        t0 = time.perf_counter()
        state, metrics = trainer.run_steps(state, key, steps)
        energy = float(metrics["mean_energy"][-1])
        rates.append(steps / (time.perf_counter() - t0))
    assert energy < 0.0  # sanity: a real energy was computed
    return sorted(rates)[len(rates) // 2]


def run_accuracy_probe():
    """Subprocess entry for the headline accuracy anchor: train the N=20
    TFIM chain with minSR until the trailing-block mean energy is within
    ``ACCURACY_RTOL`` relative of the DMRG anchor; print one JSON line with
    the step count and final relative error."""
    try:
        from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer
        from rnnwavefunctions_tpu.cli.run_loop import enable_persistent_cache

        enable_persistent_cache(CACHE_DIR)
        import jax
        import numpy as np

        trainer = VMCTrainer(
            PRNN1D(num_sites=20, units=(50,)),
            TFIM1D(num_sites=20, bx=1.0),
            TrainConfig(num_samples=NUM_SAMPLES, learning_rate=5e-2,
                        optimizer="minsr"),
        )
        state = trainer.init()
        key = jax.random.PRNGKey(0)
        steps_done, rel = 0, float("inf")
        while steps_done < ACCURACY_MAX_STEPS and rel > ACCURACY_RTOL:
            state, ms = trainer.run_steps(state, key, ACCURACY_BLOCK)
            steps_done += ACCURACY_BLOCK
            est = float(np.asarray(ms["mean_energy"]).mean())
            rel = abs(est - ACCURACY_ANCHOR_N20) / abs(ACCURACY_ANCHOR_N20)
    except Exception as e:
        print(json.dumps(
            {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}))
        return 1
    print(json.dumps({
        "ok": True,
        "steps_to_rtol": steps_done,
        "rel_error": float(rel),
        "converged": bool(rel <= ACCURACY_RTOL),
    }))
    return 0


def run_row(name):
    """Subprocess entry for one workload row: enable the persistent compile
    cache, build the trainer, measure, and print one JSON line."""
    if name == "accuracy_n20_minsr":
        return run_accuracy_probe()
    spec = next((w for w in WORKLOADS if w[0] == name), None)
    if spec is None:
        print(json.dumps({"ok": False, "error": f"unknown row {name!r}"}))
        return 2
    _, num_samples, steps, _, _, cfg_overrides = spec
    try:
        from rnnwavefunctions_tpu.cli.run_loop import enable_persistent_cache
        enable_persistent_cache(CACHE_DIR)
        trainer = _build_trainer(name, num_samples, cfg_overrides)
        steps_per_sec = measure(trainer, steps=steps)
    except Exception as e:
        print(json.dumps(
            {"ok": False, "error": f"{type(e).__name__}: {e}"[:200]}))
        return 1
    print(json.dumps({"ok": True, "steps_per_sec": steps_per_sec}))
    return 0


def _last_good_onchip():
    """Newest measured flagship record, for the dead-tunnel fallback so a
    tunnel outage at bench time never erases the measured history.
    Preference order: the committed ``BENCH_DETAIL.json`` (the most recent
    FULL on-chip run — the driver's ``BENCH_r*.json`` archives can lag it,
    e.g. rounds whose tail capture truncated), then the newest driver
    archive whose run actually reached the device (value > 0)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "BENCH_DETAIL.json")) as f:
            det = json.load(f)
        if det.get("value", 0) > 0:
            return {
                "source": "BENCH_DETAIL.json (committed full-run record)",
                "metric": det["metric"],
                "value": det["value"],
                "unit": det["unit"],
                "vs_baseline": det["vs_baseline"],
                "accuracy_n20_minsr": det.get("accuracy_n20_minsr"),
                "full_tables": "BENCHMARKS.md (measured on-chip "
                               "pre-outage; see Round sections)",
            }
    except Exception:
        pass
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                       reverse=True):
        try:
            with open(path) as f:
                rec = json.load(f)
            line = [l for l in rec.get("tail", "").splitlines()
                    if l.startswith("{")][-1]
            flag = json.loads(line)
            if flag.get("value", 0) > 0 and "error" not in flag:
                return {
                    "source": os.path.basename(path),
                    "metric": flag["metric"],
                    "value": flag["value"],
                    "unit": flag["unit"],
                    "vs_baseline": flag["vs_baseline"],
                    "full_tables": "BENCHMARKS.md (measured on-chip "
                                   "pre-outage; see Round sections)",
                }
        except Exception:
            continue
    return None


def _spawn_row(name, timeout_s):
    """Run one row in a subprocess with a hard kill.  Returns a row dict
    fragment: {"steps_per_sec": X} or {"error": "..."}."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--row", name],
            timeout=timeout_s, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return {"error": f"timeout: row killed after {timeout_s}s"}
    if r.stderr:
        sys.stderr.write(r.stderr[-2000:])
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"error": f"row subprocess rc={r.returncode}, no output"}
    try:
        out = json.loads(lines[-1])
    except json.JSONDecodeError:
        return {"error": f"row subprocess rc={r.returncode}, bad output"}
    if not out.get("ok"):
        return {"error": out.get("error", "unknown row failure")[:200]}
    out.pop("ok", None)
    return out


def _format_row(steps_per_sec, num_samples, flops_per_step, units):
    tflops = steps_per_sec * flops_per_step / 1e12
    roof = PEAK_BF16_FLOPS * min(units, 128) / 128
    return {
        "steps_per_sec": round(steps_per_sec, 1),
        "samples_per_sec": round(steps_per_sec * num_samples, 1),
        "model_tflops_per_sec": round(tflops, 2),
        "mfu": round(tflops * 1e12 / PEAK_BF16_FLOPS, 4),
        "roof_frac": round(tflops * 1e12 / roof, 4),
    }


def main():
    if not _device_reachable():
        # still print the one-line driver contract so the record exists;
        # value stays 0.0 (no fresh measurement) but carry the last good
        # on-chip numbers, clearly marked stale, so the record is usable
        print("device unreachable: tunnel hang on backend init (probed in "
              "a subprocess, 2x150s)", file=sys.stderr)
        print(json.dumps({
            "metric": "1dtfim_n100_vmc_samples_per_sec",
            "value": 0.0,
            "unit": "samples/s",
            "vs_baseline": 0.0,
            "error": "device unreachable (tunnel hang on backend init)",
            "stale_last_good_onchip": _last_good_onchip(),
        }))
        return

    t_start = time.monotonic()
    rows = {}
    timeouts = 0
    accuracy = {"error": "probe never ran"}
    for name, num_samples, steps, flops_per_step, units, _cfg in WORKLOADS:
        elapsed = time.monotonic() - t_start
        if elapsed > TOTAL_BUDGET_S:
            rows[name] = {"error": "skipped: global wall budget exhausted"}
            continue
        timeout_s = CANARY_TIMEOUT_S if name == "canary_n10" else ROW_TIMEOUT_S
        frag = _spawn_row(name, timeout_s)
        if "error" in frag and frag["error"].startswith("timeout"):
            timeouts += 1
            print(f"{name}: TIMED OUT (row killed after {timeout_s}s); "
                  f"re-probing device", file=sys.stderr)
            rows[name] = frag
            # one hang costs one row: re-probe, continue if alive
            if not _device_reachable():
                print("device no longer reachable; marking remaining rows",
                      file=sys.stderr)
                seen = set(rows)
                for later in WORKLOADS:
                    if later[0] not in seen and later[0] != name:
                        rows[later[0]] = {
                            "error": "skipped: device unreachable after "
                                     "row timeout"}
                break
            continue
        if "error" in frag:
            print(f"{name}: FAILED ({frag['error']})", file=sys.stderr)
            rows[name] = frag
            continue
        rows[name] = _format_row(
            frag["steps_per_sec"], num_samples, flops_per_step, units)
        print(f"{name}: {rows[name]}", file=sys.stderr)
        if name == "1dtfim_n100":
            # headline accuracy anchor right after the flagship, so both
            # survive even a budget- or link-truncated run
            accuracy = _spawn_row("accuracy_n20_minsr", ROW_TIMEOUT_S)
            print(f"accuracy_n20_minsr: {accuracy}", file=sys.stderr)

    # Retry pass: transient tunnel hangs clear on a second attempt
    # (CLAUDE.md) — re-run timed-out rows once, flagship first, while the
    # wall budget lasts and the device still answers a probe.
    retry = [w for w in WORKLOADS
             if rows.get(w[0], {}).get("error", "").startswith("timeout")]
    retry.sort(key=lambda w: w[0] != "1dtfim_n100")
    for name, num_samples, steps, flops_per_step, units, _cfg in retry:
        if time.monotonic() - t_start > TOTAL_BUDGET_S:
            break
        if not _device_reachable():
            break
        print(f"{name}: retrying after earlier timeout", file=sys.stderr)
        frag = _spawn_row(name, ROW_TIMEOUT_S)
        if "error" in frag:
            rows[name] = {"error": f"{frag['error']} (after retry)"}
            continue
        rows[name] = _format_row(
            frag["steps_per_sec"], num_samples, flops_per_step, units)
        rows[name]["retried"] = True
        print(f"{name}: {rows[name]}", file=sys.stderr)

    # The accuracy probe must not die with a transient flagship failure:
    # if it never ran (flagship only recovered on retry) or itself timed
    # out, give it one more attempt while the device still answers.
    if (
        ("error" in accuracy or "steps_to_rtol" not in accuracy)
        and time.monotonic() - t_start <= TOTAL_BUDGET_S
        and _device_reachable()
    ):
        print("accuracy_n20_minsr: (re)running probe", file=sys.stderr)
        accuracy = _spawn_row("accuracy_n20_minsr", ROW_TIMEOUT_S)
        print(f"accuracy_n20_minsr: {accuracy}", file=sys.stderr)

    flag = rows.get("1dtfim_n100", {"error": "row never ran"})
    full_record = {
        "metric": "1dtfim_n100_vmc_samples_per_sec",
        "value": 0.0,
        "unit": "samples/s",
        "vs_baseline": 0.0,
        "mfu": 0.0,
        # mfu denominator (see module docstring): round-1/2 records divided
        # by an incorrect 49.2 TFLOP/s 8-pass-f32 peak — multiply THIS
        # record's mfu by 4.0 to compare against those rows.  roof_frac
        # (peak scaled by the K=min(U,128)/128 MXU underfill) is the
        # shape-honest utilization and is basis-stable across rounds.
        "mfu_basis_tflops": PEAK_BF16_FLOPS / 1e12,
        "mfu_r01_r02_basis_tflops": 49.2,
        "row_timeouts": timeouts,
        "accuracy_n20_minsr": accuracy,
        "workloads": rows,
    }
    if "error" not in flag:
        full_record.update(
            value=flag["samples_per_sec"],
            vs_baseline=round(
                flag["samples_per_sec"] / REFERENCE_SAMPLES_PER_SEC_EST, 2
            ),
            mfu=flag["mfu"],
        )
    else:
        # flagship row lost: carry the last good on-chip flagship number
        # (clearly marked stale) so a bad link day never erases history
        full_record["stale_last_good_onchip"] = _last_good_onchip()

    # Full record: to a repo file + an EARLIER stdout line (logs keep it).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(full_record, f, indent=1)
            f.write("\n")
    except OSError as e:
        print(f"could not write {detail_path}: {e}", file=sys.stderr)
    print(json.dumps(full_record))

    # FINAL stdout line (driver contract): compact headline only — must fit
    # the driver's ~2000-char tail capture with room to spare.
    measured = sum(1 for r in rows.values() if "steps_per_sec" in r)
    print(json.dumps(
        _headline(full_record, flag, accuracy, timeouts, measured)))


def _headline(full_record, flag, accuracy, timeouts, measured):
    """Compact final-line record.  MUST stay well under the driver's
    ~2000-char tail window in every branch (the round-4 record was lost to
    exactly this: a single giant JSON line truncated past the window) —
    size pinned by tests/test_bench_headline.py."""
    headline = {
        "metric": full_record["metric"],
        "value": full_record["value"],
        "unit": full_record["unit"],
        # vs_baseline divides by the 500 samples/s ESTIMATE of the TF1-GPU
        # reference rate (no published number; BASELINE.md:26-29)
        "vs_baseline": full_record["vs_baseline"],
        "baseline_est_samples_per_sec": REFERENCE_SAMPLES_PER_SEC_EST,
        "mfu": full_record["mfu"],
        "roof_frac": flag.get("roof_frac", 0.0),
        "steps_per_sec": flag.get("steps_per_sec", 0.0),
        "row_timeouts": timeouts,
        "rows_measured": measured,
        "rows_total": len(WORKLOADS),
        "accuracy_n20_minsr": accuracy,
        "detail": "BENCH_DETAIL.json (full per-row record; also the "
                  "previous stdout line)",
    }
    if "error" in flag:
        # error strings are subprocess-tail captures — cap them so the
        # headline cannot outgrow the window on a bad day
        headline["error"] = str(flag["error"])[:200]
        lg = full_record.get("stale_last_good_onchip")
        if lg:
            headline["stale_last_good_onchip"] = {
                k: lg[k] for k in ("source", "value", "vs_baseline")
                if k in lg}
    return headline


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--row", default=None,
                        help="run a single workload row (subprocess mode)")
    cli = parser.parse_args()
    if cli.row:
        sys.exit(run_row(cli.row))
    main()
