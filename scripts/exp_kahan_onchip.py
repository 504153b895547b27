"""On-chip check: Mosaic preserves the Kahan accumulation ops.

Runs the fused GRU log-prob kernel at N=1000 on the real TPU and compares
against a float64 oracle computed in a CPU subprocess (this environment's
out-of-tree TPU backend cannot share a process with a forced-CPU platform).
Passes when the on-chip error lands in the Kahan class (~3e-5,
scripts/exp_f32_accum_error.py) rather than the plain sequential-f32 class
(~8.6e-4) — i.e. the compiler did not algebraically cancel ``(t - s) - y``.

Run: timeout 580 python scripts/exp_kahan_onchip.py          (from /root/repo)
"""

import os
import subprocess
import sys

import numpy as np

# NB: the repo root must come in through sys.path, NOT the PYTHONPATH env
# var — any PYTHONPATH entry at all breaks the out-of-tree axon TPU plugin's
# registration in this environment.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, S, U = 1000, 64, 50
TMP = "/tmp/kahan_onchip.npz"


def oracle():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rnnwavefunctions_tpu.models.prnn1d import PRNN1D

    wf64 = PRNN1D(
        num_sites=N, units=(U,), dtype=jnp.float64,
        accum_dtype=jnp.float64, impl="jnp",
    )
    params64 = wf64.init(jax.random.PRNGKey(0))
    samples = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (S, N)
    ).astype(jnp.int32)
    lp64 = np.asarray(wf64.log_prob(params64, samples))
    flat, _ = jax.tree.flatten(params64)
    np.savez(
        TMP,
        lp64=lp64,
        samples=np.asarray(samples),
        **{f"p{i}": np.asarray(x, np.float32) for i, x in enumerate(flat)},
    )


def chip():
    import time

    import jax
    import jax.numpy as jnp

    from rnnwavefunctions_tpu.models.prnn1d import PRNN1D

    print("backend:", jax.default_backend())
    d = np.load(TMP)
    wf = PRNN1D(num_sites=N, units=(U,), impl="pallas")
    tmpl = wf.init(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree.flatten(tmpl)
    params = jax.tree.unflatten(
        treedef, [jnp.asarray(d[f"p{i}"]) for i in range(len(leaves))]
    )
    samples = jnp.asarray(d["samples"])

    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            fn = jax.jit(lambda p, s: wf._pallas_log_prob(p, s))
            lp_dev = np.asarray(fn(params, samples))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(20):
                    out = fn(params, samples)
                float(out[0])
                times.append((time.perf_counter() - t0) / 20)
        err = np.max(np.abs(lp_dev.astype(np.float64) - d["lp64"]))
        dt = sorted(times)[2]
        print(
            f"precision={prec:8s} max |err| = {err:.3e}   "
            f"{dt*1e3:6.2f} ms/call"
        )
    print(f"|logp| ~ {np.mean(-d['lp64']):.1f}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--oracle":
        oracle()
    else:
        subprocess.run(
            [sys.executable, __file__, "--oracle"],
            check=True, cwd="/root/repo",
        )
        chip()
