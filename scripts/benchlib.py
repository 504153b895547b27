"""Shared on-chip micro-measurement protocol for the scripts/exp_* harnesses.

One canonical copy of the three-piece protocol that every kernel/stage
experiment uses (previously copy-pasted per script, which had already
drifted — round-5 review finding):

* ``sync``     — synchronize by fetching one scalar value.  Through the
  device relay, ``jax.block_until_ready`` is unreliable (CLAUDE.md); a
  value fetch is the only dependable barrier.
* ``scanned``  — jit a K-iteration ``lax.scan`` of the measured function.
  The carry perturbs the inputs by ``c * 1e-30`` (floating leaves only) so
  XLA cannot hoist the body out of the loop, and the scalar reduction of
  every output feeds the carry so dead-code elimination cannot drop the
  body.  K-scanning amortizes the ~25 ms relay round trip that otherwise
  inflates every sub-millisecond number (the round-4 RTT-bias finding,
  BENCHMARKS.md).
* ``bench``    — compile outside the clock, then median of ``trials``
  synchronized dispatches, reported per scanned iteration.

Import pattern (scripts run from /root/repo without PYTHONPATH — setting
that env var breaks the TPU plugin):

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchlib import make_scanned, run_timed
"""

import time

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options


def sync(x):
    """Barrier: fetch one scalar value from the (pytree of) device arrays."""
    float(jnp.ravel(jax.tree.leaves(x)[0])[0].astype(jnp.float32))


def make_scanned(fn, k):
    """jit a K-iteration scan of ``fn(first, *rest)``; anti-hoist/anti-DCE
    as described in the module docstring.  ``first`` must be a pytree whose
    floating leaves parameterize the measured work (weights, typically)."""

    def run(first, *rest):
        def body(c, _):
            leaves = jax.tree.map(
                lambda x: (x + c * 1e-30).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                first,
            )
            out = fn(leaves, *rest)
            red = sum(jnp.sum(l.astype(jnp.float32))
                      for l in jax.tree.leaves(out))
            return c + red * 1e-30, ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return c

    return jax.jit(run, compiler_options=tpu_compiler_options())


def run_timed(label, jitted, *args, k=1, trials=5, unit="ms"):
    """Compile (unclocked), then median of ``trials`` synchronized
    dispatches; prints and returns the per-iteration time in ``unit``
    ("ms" or "us")."""
    sync(jitted(*args))  # compile + warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        sync(jitted(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    scale = 1e3 if unit == "ms" else 1e6
    med = ts[len(ts) // 2] / k * scale
    print(f"  {label:34s} {med:9.3f} {unit}/iter", flush=True)
    return med
