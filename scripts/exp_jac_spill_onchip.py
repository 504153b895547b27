"""On-chip measurement of the HBM-spilled fused minSR jacobian (round 5).

Round 4 built the spill variant of ``ops/fused_jac.py`` (reach N=1000/U=256)
with interpret-mode forced-spill equality tests but no on-chip number — the
long-chain minSR capability was a compile-time claim (VERDICT r4 missing
item 2).  This harness measures, at the reference's long-chain scale
(N=1000, U=50, Tutorial_1DTFIM.ipynb cell 24 anchors) with the bench row's
S=64:

  - which ``_plan`` regime the accounting actually picks at this shape
  - per-sample jacobian rows: fused Pallas sweep vs the jnp-scan oracle
    (vmc/jacobian.py), both K-scanned per dispatch to amortize the relay RTT
  - the full minSR direction (rows + per-leaf tree solve) on each path

Run from /root/repo:  timeout 580 python scripts/exp_jac_spill_onchip.py

(The inline _sync/scanned/bench protocol here is kept verbatim as the code
that produced the published round-5 numbers; the canonical shared copy for
new scripts is scripts/benchlib.py.)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.ops import fused_jac
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options
from rnnwavefunctions_tpu.vmc import jacobian, minsr

N, U, S, K = 1000, 50, 64, 20


def _sync(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0].astype(jnp.float32))


def bench(label, fn, *args):
    _sync(fn(*args))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"  {label:44s} {med/K*1e3:9.3f} ms/iter", flush=True)
    return med / K


def scanned(fn):
    """jit(K-iteration scan of fn); carry perturbation defeats hoisting,
    output reduction defeats DCE (protocol of exp_minsr_jac_split.py)."""

    def run(first, *args):
        def body(c, _):
            leaves = jax.tree.map(
                lambda x: (x + c * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                first,
            )
            out = fn(leaves, *args)
            red = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out))
            return c + red * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    return jax.jit(run, compiler_options=tpu_compiler_options())


def main():
    print(f"spill-regime shape N={N} U={U} S={S}; K={K} iters/dispatch")
    ansatz = PRNN1D(num_sites=N, units=(U,))
    aj = PRNN1D(num_sites=N, units=(U,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(1))
    samples = jax.device_put(ansatz.sample(params, jax.random.PRNGKey(2), S))

    variant, tile, chunk = fused_jac._plan(N, (U,), S, "gru")
    print(f"_plan(N={N}, U={U}, S={S}) -> variant={variant!r} "
          f"tile={tile} chunk={chunk}")

    print("per-sample jacobian rows (S, P):")
    t_f = bench("fused Pallas sweep (spill)",
                scanned(lambda p, s: fused_jac.prnn1d_rows(ansatz, p, s)),
                params, samples)
    t_j = bench("jnp scan oracle",
                scanned(lambda p, s: jacobian._prnn1d_log_prob_rows(
                    aj, p, s)),
                params, samples)
    print(f"  fused/jnp row speedup: {t_j / t_f:.2f}x")

    print("full minSR direction (rows + per-leaf tree solve):")

    def direction(ans):
        def fn(p, s):
            rows, logp = minsr.per_sample_log_amp_grad_trees(ans, p, s)
            e = jnp.ones((S,), jnp.float32)
            return minsr.minsr_direction_tree(
                rows, None, e, None, jnp.mean(e), None, 1e-3)
        return fn

    t_df = bench("fused rows + solve",
                 scanned(direction(ansatz)), params, samples)
    t_dj = bench("jnp rows + solve",
                 scanned(direction(aj)), params, samples)
    print(f"  fused/jnp direction speedup: {t_dj / t_df:.2f}x")


if __name__ == "__main__":
    main()
