"""Where does the stash-and-contract minSR jacobian spend its time?
(experiment harness; run when deciding whether a fused Pallas jacobian
kernel would pay)

Splits the flagship-shape jacobian into separately jitted stages and times
each on the real chip:

  1. forward rollout (teacher-forced jnp scan, stashing prevs/top_out)
  2. head seeding (dlogits / head vjps)
  3. backward sweep (_bptt jnp scan)
  4. per-sample weight einsums (_contract_layer)
  5. row flatten + sample-space solve

plus the end-to-end jacobian and, for scale, the Adam-path fused BPTT.

Run from /root/repo:  timeout 580 python scripts/exp_minsr_jac_split.py
"""

import sys, time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
from rnnwavefunctions_tpu.vmc import jacobian, minsr
from rnnwavefunctions_tpu.ops.tiling import tpu_compiler_options

N, U, S = 100, 50, 500


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.ravel(leaf)[0].astype(jnp.float32))


def bench(label, fn, *args):
    _sync(fn(*args))  # compile
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    print(f"  {label:36s} {med*1e3:8.2f} ms")
    return med


def jit(fn):
    return jax.jit(fn, compiler_options=tpu_compiler_options())


def split_prnn(ansatz, params, samples):
    d = ansatz.local_dim
    s = samples.shape[0]
    dtype = ansatz.dtype
    onehot = jax.nn.one_hot(samples.T, d, dtype=dtype)
    inputs = jnp.concatenate([jnp.zeros((1, s, d), dtype), onehot[:-1]], 0)

    rollout = jit(lambda p, x: jacobian._rollout(p["rnn"], ansatz.cell, x))
    prevs, finals, top_out = rollout(params, inputs)
    t_roll = bench("rollout (stash scan)", rollout, params, inputs)

    def seeds(p, to):
        logits = jnp.dot(to, p["head"]["w"]) + p["head"]["b"]
        logp_site = jax.nn.log_softmax(logits, axis=-1)
        dlogits = onehot - jnp.exp(logp_site)
        return jnp.dot(dlogits, p["head"]["w"].T), dlogits

    seeds_j = jit(seeds)
    dout, dlogits = seeds_j(params, top_out)
    t_seed = bench("head seeds", seeds_j, params, top_out)

    xs = jacobian._layer_inputs(inputs, list(prevs), list(finals), ansatz.cell)
    bptt = jit(lambda p, x, pv, do: jacobian._bptt(
        p["rnn"], ansatz.cell, x, pv, do))
    dgates = bptt(params, xs, list(prevs), dout)
    t_bptt = bench("backward sweep (_bptt scan)", bptt, params, xs,
                   list(prevs), dout)

    contract = jit(lambda x, pv, dg: [
        jacobian._contract_layer(ansatz.cell, xi, pvi, dgi)
        for xi, pvi, dgi in zip(x, pv, dg)
    ])
    contract(xs, list(prevs), dgates)
    t_con = bench("weight einsums", contract, xs, list(prevs), dgates)

    full = jit(lambda p, sm: jacobian.prnn1d_log_amp_rows(ansatz, p, sm))
    full(params, samples)
    t_full = bench("jacobian end-to-end", full, params, samples)
    print(f"  {'(stages sum)':36s} {(t_roll+t_seed+t_bptt+t_con)*1e3:8.2f} ms")
    return t_full


def main():
    key = jax.random.PRNGKey(0)

    print(f"PRNN1D  N={N} U={U} S={S}")
    ansatz = PRNN1D(num_sites=N, units=(U,))
    params = ansatz.init(key)
    samples = jax.device_put(ansatz.sample(params, jax.random.PRNGKey(2), S))
    split_prnn(ansatz, params, samples)

    o_fn = jit(lambda p, sm: minsr.per_sample_log_amp_grads(ansatz, p, sm)[0])
    o_re = o_fn(params, samples)
    bench("rows + flatten (per_sample_...)", o_fn, params, samples)
    e = jnp.ones((S,), jnp.float32)
    solve = jit(lambda o, ee: minsr.minsr_direction(
        o, None, ee, None, jnp.mean(ee), None, 1e-3))
    solve(o_re, e)
    bench("solve (given O)", solve, o_re, e)

    print(f"\nCRNNU1  N={N} U={U} S={S}")
    cans = CRNNU1(num_sites=N, units=(U,))
    cparams = cans.init(key)
    csamples = jax.device_put(cans.sample(cparams, jax.random.PRNGKey(3), S))
    cfull = jit(lambda p, sm: jacobian.crnn_log_amp_rows(cans, p, sm))
    cfull(cparams, csamples)
    bench("jacobian end-to-end (joint sweep)", cfull, cparams, csamples)

    co_fn = jit(lambda p, sm: minsr.per_sample_log_amp_grads(cans, p, sm)[:2])
    co = co_fn(cparams, csamples)
    bench("rows + flatten", co_fn, cparams, csamples)
    csolve = jit(lambda ore, oim, ee: minsr.minsr_direction(
        ore, oim, ee, jnp.zeros_like(ee), jnp.mean(ee),
        jnp.asarray(0.0, jnp.float32), 1e-3))
    csolve(co[0], co[1], e)
    bench("complex solve (given O)", csolve, co[0], co[1], e)


if __name__ == "__main__":
    main()
