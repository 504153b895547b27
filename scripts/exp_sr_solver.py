"""Bake-off: the (S, S) SPD solve inside the minSR step.

XLA's blocked Cholesky on a (500, 500) SPD matrix costs ~0.59 ms on-chip
(scripts/exp_gram_precision.py) — serialization-bound, as much as the whole
sample-space Gram.  Candidates that trade the serial factorization for
MXU/VPU-parallel iterations:

  - cho_solve            (baseline: blocked Cholesky + 2 triangular solves)
  - lu solve             (jnp.linalg.solve)
  - CG, fixed maxiter    (matrix already in VMEM; latency-bound small ops)
  - Newton-Schulz        (X_{k+1} = X_k (2I - T X_k): 2 big matmuls/iter,
                          MXU-bound; self-correcting in f32)

Accuracy is reported as relative L2 error of the SR direction proxy
``x`` against a float64-refined reference on a REAL minSR Gram (built from
PRNN1D rows at the flagship shape, damping 1e-3 — the hardest published
conditioning).

Run from /root/repo:  timeout 580 python scripts/exp_sr_solver.py
"""

import os
import sys, time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.vmc import minsr
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

N, U, S, K = 100, 50, 500, 400
LAM = 1e-3


def _sync(x):
    float(jnp.ravel(x)[0])


def bench(label, fn, *args):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"  {label:40s} {ts[len(ts)//2]/K*1e3:8.3f} ms/iter", end="")
    return out


def scanned(fn):
    def run(t, c):
        def body(carry, _):
            out = fn(t + carry * 1e-30, c)
            return carry + jnp.sum(out).astype(jnp.float32), out

        carry, outs = jax.lax.scan(
            body, jnp.zeros((), jnp.float32), None, length=K
        )
        return outs[-1]

    return jax.jit(run, compiler_options=tpu_compiler_options())


def cho(t, c):
    return jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(t, lower=True), c
    )


def lu(t, c):
    return jnp.linalg.solve(t, c)


def make_cg(iters):
    def cg(t, c):
        def body(state, _):
            x, r, p, rs = state
            tp = t @ p
            alpha = rs / jnp.vdot(p, tp)
            x = x + alpha * p
            r = r - alpha * tp
            rs_new = jnp.vdot(r, r)
            p = r + (rs_new / rs) * p
            return (x, r, p, rs_new), None

        x0 = jnp.zeros_like(c)
        (x, _, _, _), _ = jax.lax.scan(
            body, (x0, c, c, jnp.vdot(c, c)), None, length=iters
        )
        return x

    return cg


def make_ns(iters):
    """Newton-Schulz inverse applied to the RHS: returns X_k c without
    materializing T^{-1} reuse (X is (S, S) anyway, kept for simplicity)."""

    def ns(t, c):
        # init: X0 = T^T / (||T||_1 ||T||_inf) guarantees ||I - T X0|| < 1
        norm1 = jnp.max(jnp.sum(jnp.abs(t), axis=0))
        norminf = jnp.max(jnp.sum(jnp.abs(t), axis=1))
        x = t.T / (norm1 * norminf)
        eye2 = 2.0 * jnp.eye(t.shape[0], dtype=t.dtype)

        def body(x, _):
            return x @ (eye2 - t @ x), None

        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x @ c

    return ns


def main():
    ansatz = PRNN1D(num_sites=N, units=(U,))
    params = ansatz.init(jax.random.PRNGKey(1))
    samples = jax.device_put(ansatz.sample(params, jax.random.PRNGKey(2), S))
    o_re = jax.jit(
        lambda p, s: minsr.per_sample_log_amp_grads(ansatz, p, s)[0],
        compiler_options=tpu_compiler_options(),
    )(params, samples)
    a = (o_re - o_re.mean(0)) / jnp.sqrt(float(S))
    t = jax.device_put(np.asarray(a @ a.T) + LAM * np.eye(S, dtype=np.float32))
    c = jax.device_put(
        np.asarray(
            jax.random.normal(jax.random.PRNGKey(3), (S,), jnp.float32)
        )
    )

    # float64 reference on host
    t64 = np.asarray(t, np.float64)
    ref = np.linalg.solve(t64, np.asarray(c, np.float64))
    refn = np.linalg.norm(ref)

    evals = np.linalg.eigvalsh(t64)
    print(f"gram cond at lam={LAM}: {evals[-1]/evals[0]:.1f} "
          f"(lam_max {evals[-1]:.2e})")

    from rnnwavefunctions_tpu.ops import sr_cg

    cands = [("cho_solve", cho), ("lu solve", lu)]
    for it in (25, 50, 100):
        cands.append((f"cg maxiter={it}", make_cg(it)))
    for it in (8, 12, 16):
        cands.append((f"newton-schulz {it}", make_ns(it)))

    for label, fn in cands:
        x = bench(label, scanned(fn), t, c)
        err = np.linalg.norm(np.asarray(x, np.float64) - ref) / refn
        print(f"   rel_err {err:.2e}")

    # kernel rows on PRE-PADDED input (sp == s: no scatter in the scan
    # body; isolates launch + VMEM-fill + loop cost).  Mosaic supports
    # only HIGHEST/DEFAULT dot precision in-kernel.
    sp = 512
    tpad = np.eye(sp, dtype=np.float32)
    tpad[:S, :S] = np.asarray(t)
    cpad = np.zeros((sp,), np.float32)
    cpad[:S] = np.asarray(c)
    tpad = jax.device_put(jnp.asarray(tpad))
    cpad = jax.device_put(jnp.asarray(cpad))
    for prec in ("highest", "default"):
        for it in (32, 64, 96, 128):
            fn = (lambda it=it, prec=prec: lambda tt, cc: sr_cg.sr_cg_solve(
                tt, cc, iters=it, precision=prec))()
            x = bench(f"PALLAS fused cg {it} {prec}", scanned(fn), tpad, cpad)
            err = (
                np.linalg.norm(np.asarray(x, np.float64)[:S] - ref) / refn
            )
            print(f"   rel_err {err:.2e}")


if __name__ == "__main__":
    main()
