"""Pallas kernel: the minSR (S, S) SPD solve as ONE fused CG loop in VMEM.

Why a kernel at all: the sample-space SR system ``(T + lam I) x = c`` is
tiny by TPU standards (T is ~1-4 MB), but every XLA-level solver is
latency-bound, not FLOP-bound, on it.  Measured on-chip at S=500 on a real
flagship Gram (scripts/exp_sr_solver.py): blocked Cholesky 0.73 ms, LU
0.94 ms, XLA-level CG 0.72 ms at 25 iterations (~29 us per iteration of
~6 small ops — pure per-op overhead), Newton-Schulz no better.  The serial
chain of small ops is the wall; no algorithm swap at the XLA level moves
it.

The TPU-first fix: run the WHOLE conjugate-gradient iteration inside one
Pallas program.  T stays VMEM-resident across iterations, each iteration is
one (1, S) x (S, S) MXU matvec (T is symmetric, so the row-vector form
``p @ T`` is exactly ``(T p)^T`` with no transpose) plus a handful of VPU
lane reductions — per-iteration cost collapses from ~29 us of dispatch
overhead to the few microseconds of actual compute.

Accuracy: CG at 50+ iterations reaches ~1e-4 relative error on the
hardest published conditioning (cond ~7e4 at lam=1e-3; the default
lam=1e-2 is ~10x easier) — far below the O(1/sqrt(S)) stochastic noise in
the SR right-hand side.  The iteration count is static (compiled); there
is no data-dependent early exit, which keeps the program shape fixed.

Used by ``vmc/minsr.minsr_direction_tree(solver="cg")``; the jnp twin
``cg_solve_jnp`` is the equality oracle (tests/test_minsr.py) and the
non-TPU fallback.  Reference analog: none — the reference has no
second-order optimizer at all (SURVEY.md §2; the closest structure is the
Adam apply at /root/reference/1DTFIM/TrainingRNN_1DTFIM.py:113).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _cg_body(t, carry_x, carry_r, carry_p, rs, precision):
    """One CG iteration on (1, Sp) row vectors; T symmetric."""
    tp = jax.lax.dot_general(
        carry_p, t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    ptp = jnp.sum(carry_p * tp)
    # max-guards: at exact convergence r = p = 0 and both quotients hit
    # 0/0; the floors turn them into 0/tiny = 0, freezing the iterate.
    alpha = rs / jnp.maximum(ptp, jnp.float32(1e-30))
    x = carry_x + alpha * carry_p
    r = carry_r - alpha * tp
    rs_new = jnp.sum(r * r)
    beta = rs_new / jnp.maximum(rs, jnp.float32(1e-30))
    p = r + beta * carry_p
    return x, r, p, rs_new


def _cg_kernel(t_ref, c_ref, out_ref, *, iters: int, precision):
    t = t_ref[...]
    c = c_ref[...]

    def body(_, carry):
        return _cg_body(t, *carry, precision=precision)

    x0 = jnp.zeros_like(c)
    rs0 = jnp.sum(c * c)
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, c, c, rs0))
    out_ref[...] = x


def cg_solve_jnp(
    t: jax.Array, c: jax.Array, iters: int,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """jnp twin of the kernel loop — equality oracle and non-TPU path.
    Bit-compatible math (same guards, same matvec precision)."""

    def body(_, carry):
        return _cg_body(t, *carry, precision=precision)

    c_row = c[None, :]
    x0 = jnp.zeros_like(c_row)
    rs0 = jnp.sum(c_row * c_row)
    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, c_row, c_row, rs0))
    return x[0]


def _padded_call(t, c, iters: int, interpret: bool, precision):
    s = t.shape[0]
    sp = _round128(s)
    if sp != s:
        # exact padding: the padded system is block-diagonal
        # [[T, 0], [0, I]] with zero RHS in the pad lanes, so the pad
        # coordinates of x are exactly 0 and the true ones are unchanged.
        tp = jnp.zeros((sp, sp), t.dtype)
        tp = tp.at[:s, :s].set(t)
        tp = tp.at[jnp.arange(s, sp), jnp.arange(s, sp)].set(1.0)
        cp = jnp.zeros((sp,), c.dtype).at[:s].set(c)
    else:
        tp, cp = t, c
    out = pl.pallas_call(
        functools.partial(_cg_kernel, iters=iters, precision=precision),
        out_shape=jax.ShapeDtypeStruct((1, sp), jnp.float32),
        interpret=interpret,
    )(tp, cp[None, :])
    return out[0, :s]


def sr_cg_solve(
    t: jax.Array, c: jax.Array, iters: int = 64, interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Solve the SPD system ``t @ x = c`` by ``iters`` fused CG steps.

    ``t``: (S, S) float32, symmetric positive definite (the damped SR
    Gram).  ``c``: (S,) float32.  Pads to the 128-lane grid with an exact
    identity-block extension.  On non-TPU backends (and under
    ``interpret=False`` only on TPU) the jnp twin runs instead — same
    values, same guards.
    """
    if not interpret and (
        jax.default_backend() not in ("tpu", "axon")
        # the kernel is f32-only (out_shape + guards); float64 systems
        # (--dtype float64 minSR runs) take the jnp twin, honoring the
        # flag's "no fused kernels" contract
        or t.dtype != jnp.float32
    ):
        return cg_solve_jnp(t, c, iters, precision)
    return _padded_call(t, c, iters, interpret, precision)
