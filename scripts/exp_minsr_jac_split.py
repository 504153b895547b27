"""Where does the minSR step's optimizer premium go?  (experiment harness)

Every stage is wrapped in a K-iteration device-side ``lax.scan`` before
timing: a single dispatch through the relay costs a ~5-25 ms RTT, so
un-amortized stage timings only measure the link (CLAUDE.md "Device-link
latency varies ~5x").

Stages at the flagship shape, timed for both the fused Pallas jacobian
sweep (ops/fused_jac.py) and the jnp scans (vmc/jacobian.py):

  - per-sample rows end-to-end (PRNN1D and CRNNU1)
  - rows + flatten (minsr.per_sample_log_amp_grads)
  - the sample-space solve given O
  - the Adam-path fused loss gradient, for scale

Run from /root/repo:  timeout 580 python scripts/exp_minsr_jac_split.py
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
from rnnwavefunctions_tpu.vmc import jacobian, minsr
from rnnwavefunctions_tpu.ops import fused_jac
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

N, U, S, K = 100, 50, 500, 400


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
    print(f"  {label:40s} {med/K*1e3:8.3f} ms/iter")
    return med / K


def scanned(fn):
    """jit(K-iteration scan of fn), with the carry threaded through the
    FIRST argument's float leaves (a numerically-invisible +c*1e-30) so XLA
    cannot hoist the loop-invariant body out of the scan, and the outputs
    reduced into the carry to defeat DCE."""

    def run(first, *args):
        def body(c, _):
            f = jax.tree.map(
                lambda w: w + c.astype(w.dtype) * 1e-30
                if jnp.issubdtype(w.dtype, jnp.floating) else w,
                first,
            )
            out = fn(f, *args)
            return c + sum(
                jnp.sum(l).astype(jnp.float32)
                for l in jax.tree.leaves(out)
                if jnp.issubdtype(l.dtype, jnp.floating)
            ), None

        out, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=K
        )
        return out

    return jax.jit(run, compiler_options=tpu_compiler_options())


def main():
    print(f"flagship shape N={N} U={U} S={S}; K={K} iterations per dispatch")

    ansatz = PRNN1D(num_sites=N, units=(U,))
    aj = PRNN1D(num_sites=N, units=(U,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(1))
    samples = jax.device_put(ansatz.sample(params, jax.random.PRNGKey(2), S))

    print("PRNN1D")
    bench("rows fused (fused_jac.prnn1d_rows)",
          scanned(lambda p, s: fused_jac.prnn1d_rows(ansatz, p, s)),
          params, samples)
    bench("rows jnp (_prnn1d_log_prob_rows)",
          scanned(lambda p, s: jacobian._prnn1d_log_prob_rows(aj, p, s)),
          params, samples)
    bench("rows+flatten (per_sample_log_amp_grads)",
          scanned(lambda p, s: minsr.per_sample_log_amp_grads(ansatz, p, s)[0]),
          params, samples)

    o_re = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grads(ansatz, p, s)[0],
        compiler_options=tpu_compiler_options(),
    )(params, samples)
    e = jnp.ones((S,), jnp.float32)
    bench("solve (minsr_direction given O)",
          scanned(lambda o, ee: minsr.minsr_direction(
              o, None, ee, None, jnp.mean(ee), None, 1e-3)),
          o_re, e)
    rows_tree = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grad_trees(ansatz, p, s)[0],
        compiler_options=tpu_compiler_options(),
    )(params, samples)
    for prec in ("highest", "high"):
        bench(f"tree solve (per-leaf gram, {prec})",
              scanned(lambda o, ee, pr=prec: minsr.minsr_direction_tree(
                  o, None, ee, None, jnp.mean(ee), None, 1e-3,
                  precision=pr)),
              rows_tree, e)
    bench("adam loss grad (fused BPTT), for scale",
          scanned(lambda p, s: jax.grad(
              lambda q: jnp.sum(ansatz.log_amp(q, s)))(p)),
          params, samples)

    cans = CRNNU1(num_sites=N, units=(U,))
    cj = CRNNU1(num_sites=N, units=(U,), impl="jnp")
    cp = cans.init(jax.random.PRNGKey(1))
    cs = jax.device_put(cans.sample(cp, jax.random.PRNGKey(3), S))

    print("CRNNU1")
    bench("rows fused (rollout + 2-seed sweep)",
          scanned(lambda p, s: jacobian._crnn_rows_fused(cans, p, s)),
          cp, cs)
    bench("rows jnp (joint _bptt sweep)",
          scanned(lambda p, s: jacobian.crnn_log_amp_rows(cj, p, s)),
          cp, cs)
    co = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grads(cans, p, s)[:2],
        compiler_options=tpu_compiler_options(),
    )(cp, cs)
    bench("complex solve (stacked Re/Im, given O)",
          scanned(lambda ore, oim, ee: minsr.minsr_direction(
              ore, oim, ee, jnp.zeros_like(ee), jnp.mean(ee),
              jnp.asarray(0.0, jnp.float32), 1e-3)),
          co[0], co[1], e)
    ctrees = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grad_trees(cans, p, s),
        compiler_options=tpu_compiler_options(),
    )(cp, cs)
    for prec in ("highest", "high"):
        bench(f"complex tree solve (per-leaf, {prec})",
              scanned(lambda ore, oim, ee, pr=prec: minsr.minsr_direction_tree(
                  ore, oim, ee, jnp.zeros_like(ee), jnp.mean(ee),
                  jnp.asarray(0.0, jnp.float32), 1e-3, precision=pr)),
              ctrees[0], ctrees[1], e)


if __name__ == "__main__":
    main()
