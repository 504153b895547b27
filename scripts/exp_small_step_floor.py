"""On-chip breakdown of the snake2d 4x4 per-step floor (round 5).

The reference-default 4x4 snake workload (run_2dTFIM.py:10) measures
~5900 steps/s = ~169 us/step at roof_frac 0.149 — dispatch-bound in the
sense that the N=16 kernels are far too small to fill the chip, NOT in the
relay sense (the bench row already runs 400 steps per host dispatch inside
``run_steps``' device-side scan).  This harness locates where the 169 us
go, by timing K-scanned sub-programs of the step on the real chip:

  sample_energy   the fused sampling+energy wavefront kernel alone
  grad            + the surrogate-loss vjp (fused BPTT backward kernel)
  update          + the Adam update (full step, minus shard_map/metrics)
  full            ``run_steps`` itself at the bench row's K

If sample_energy + grad ~= full, the floor is the two Pallas launches'
fixed cost at tiny N and the verdict is structural (each kernel's grid is
one program over a (16, 512)-ish tile; the wavefront has N=16 sites of
dependent chain, irreducible at any group width).  Run from /root/repo:

  timeout 580 python scripts/exp_small_step_floor.py

(This harness scans stateful step bodies with their own carries, so it
keeps a local timing loop; the canonical shared protocol for plain
fn(params, ...) measurements is scripts/benchlib.py.)
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu import TFIM2D, TrainConfig, VMCTrainer
from rnnwavefunctions_tpu.models.prnn_snake2d import PRNNSnake2D
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options
from rnnwavefunctions_tpu.vmc.loss import surrogate_loss

S = 500
K = 400


def _sync(x):
    float(jnp.ravel(jax.tree.leaves(x)[0])[0].astype(jnp.float32))


def bench(label, jitted, *args):
    _sync(jitted(*args))  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(jitted(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2] / K * 1e6
    print(f"  {label:16s} {med:9.1f} us/iter   ({K/ (ts[len(ts)//2]):.0f}/s)",
          flush=True)
    return med


def main(nx=4, ny=4):
    print(f"snake2d {nx}x{ny} step floor; K={K} scanned iters/dispatch, "
          f"median of 5 dispatches; devices={jax.devices()}")
    ansatz = PRNNSnake2D(nx=nx, ny=ny, units=(50,))
    ham = TFIM2D(nx=nx, ny=ny, bx=3.0, encoding="flat")
    tr = VMCTrainer(ansatz, ham, TrainConfig(num_samples=S))
    state = tr.init()
    params = jax.device_get(state.params)
    fse = tr._fused_sample_energy
    key0 = jax.random.PRNGKey(0)

    def only_sample_energy(p, key):
        def body(c, _):
            k, acc = c
            k = jax.random.fold_in(k, 1)
            samples, _, e_re, _ = fse(p, k, S)
            return (k, acc + jnp.sum(e_re)), ()

        (k, acc), _ = jax.lax.scan(body, (key, jnp.float32(0)), None,
                                   length=K)
        return acc

    def with_grad(p, key):
        def body(c, _):
            k, acc = c
            k = jax.random.fold_in(k, 1)
            samples, _, e_re, _ = fse(p, k, S)
            samples = jax.lax.stop_gradient(samples)
            e_re = jax.lax.stop_gradient(e_re)
            e_mean = jnp.mean(e_re)

            def loss_fn(q):
                return surrogate_loss(
                    ansatz.log_amp(q, samples), None, e_re, None,
                    e_mean, None,
                )

            g = jax.grad(loss_fn)(p)
            return (k, acc + sum(jnp.sum(l) for l in jax.tree.leaves(g))), ()

        (k, acc), _ = jax.lax.scan(body, (key, jnp.float32(0)), None,
                                   length=K)
        return acc

    def with_update(p, opt_state, key):
        def body(c, _):
            q, o, k = c
            k = jax.random.fold_in(k, 1)
            samples, _, e_re, _ = fse(q, k, S)
            samples = jax.lax.stop_gradient(samples)
            e_re = jax.lax.stop_gradient(e_re)
            e_mean = jnp.mean(e_re)

            def loss_fn(w):
                return surrogate_loss(
                    ansatz.log_amp(w, samples), None, e_re, None,
                    e_mean, None,
                )

            g = jax.grad(loss_fn)(q)
            up, o = tr.optimizer.update(g, o, q)
            import optax
            q = optax.apply_updates(q, up)
            return (q, o, k), ()

        (q, o, k), _ = jax.lax.scan(body, (p, opt_state, key), None,
                                    length=K)
        return jax.tree.leaves(q)[0]

    # jit with the package compiler options (kernel VMEM budgets)
    opts = tpu_compiler_options()
    only_sample_energy = jax.jit(only_sample_energy, compiler_options=opts)
    with_grad = jax.jit(with_grad, compiler_options=opts)
    with_update = jax.jit(with_update, compiler_options=opts)

    a = bench("sample_energy", only_sample_energy, params, key0)
    b = bench("grad", with_grad, params, key0)
    c = bench("update", with_update, params,
              jax.device_get(state.opt_state), key0)

    # the product path at the bench row's exact configuration
    tr.run_steps(state, key0, K)  # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        st2, ms = tr.run_steps(state, key0, K)
        float(ms["mean_energy"][-1])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    full = ts[len(ts) // 2] / K * 1e6
    print(f"  {'full run_steps':16s} {full:9.1f} us/iter   "
          f"({K / ts[len(ts)//2]:.0f}/s)")
    print(f"\n  deltas: sample_energy={a:.1f}  +vjp={b - a:.1f}  "
          f"+adam={c - b:.1f}  +shard_map/metrics/etc={full - c:.1f} us")


if __name__ == "__main__":
    main()
