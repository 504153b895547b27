"""On-chip cost of the minSR sample-space Gram at each MXU precision.

The (2S x 2S) SR solve is three parts: centering passes over the (S, P)
row blocks, the Gram ``A A^T`` (S^2 P FLOPs), and the tiny Cholesky.
This probe isolates the Gram's precision cost (HIGHEST = bf16x6 passes,
HIGH = bf16x3, DEFAULT = single bf16 pass with f32 accumulate) and the
cost of the (S, P) concat/flatten copies the current solve pays.

Run from /root/repo:  timeout 580 python scripts/exp_gram_precision.py
"""

import os
import sys, time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

S, P, K = 500, 23000, 50


def _sync(x):
    float(jnp.ravel(x)[0])


def bench(label, fn, *args):
    _sync(fn(*args))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"  {label:44s} {ts[len(ts)//2]/K*1e3:8.3f} ms/iter")


def scanned(fn):
    def run(a, *rest):
        def body(c, _):
            out = fn(a + c * 1e-30, *rest)
            return c + jnp.sum(out).astype(jnp.float32), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=K)
        return out

    return jax.jit(run, compiler_options=tpu_compiler_options())


def main():
    a = jax.random.normal(jax.random.PRNGKey(0), (S, P), jnp.float32)
    a2 = jax.random.normal(jax.random.PRNGKey(1), (S, P), jnp.float32)

    for prec in ["highest", "high", "default"]:
        bench(
            f"gram (S,P)@(P,S) {prec}",
            scanned(
                lambda x, p=prec: jax.lax.dot_general(
                    x, x, (((1,), (1,)), ((), ())), precision=p
                )
            ),
            a,
        )
    # the copy the current solve pays: concat two (S, P) halves
    bench(
        "concat [re; im] (2S, P) copy",
        scanned(lambda x, y: jnp.concatenate([x, y], axis=0)),
        a, a2,
    )
    # centering pass
    bench(
        "center rows (mean + sub + scale)",
        scanned(lambda x: (x - jnp.mean(x, axis=0)) * 0.044),
        a,
    )
    # back-contraction A^T x
    x = jnp.ones((S,), jnp.float32)
    bench(
        "back-contract A^T x (highest)",
        scanned(
            lambda aa, xx: jax.lax.dot_general(
                aa, xx, (((0,), (0,)), ((), ())), precision="highest"
            )
        ),
        a, x,
    )
    # the small dense solve: cho_factor of (S, S) + the two triangular
    # substitutions (latency-bound on TPU — blocked, but serial in blocks)
    import jax.scipy.linalg as jsl

    t = jnp.eye(S, dtype=jnp.float32) * 3.0 + 0.01 * jax.random.normal(
        jax.random.PRNGKey(2), (S, S)
    )
    t = t @ t.T + S * jnp.eye(S)
    bench("cho_factor (S, S)", scanned(lambda m: jsl.cho_factor(m, lower=True)[0]), t)
    bench(
        "cho_factor + cho_solve 1 rhs",
        scanned(lambda m, cc: jsl.cho_solve(jsl.cho_factor(m, lower=True), cc)),
        t, x,
    )


if __name__ == "__main__":
    main()
