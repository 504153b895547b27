"""Measure f32-vs-f64 error decomposition of the N=1000 joint log-prob.

The reference promotes the per-site log-prob *sum* to float64
(``/root/reference/1DTFIM/RNNwavefunction.py:113-116``).  On TPU the fused
kernels are f32; this experiment quantifies, on the jnp path (CPU, where x64
is available as the oracle):

  1. plain f32 end-to-end          vs f64 end-to-end
  2. f32 recurrence + f64 sum      vs f64 end-to-end  (the reference's split)
  3. f32 recurrence + Kahan f32 sum vs f64 end-to-end

If (3) ~= (2), a compensated accumulator in the fused kernels reproduces the
reference's f64-sum semantics at f32 speed.

Run: JAX_PLATFORMS=cpu python scripts/exp_f32_accum_error.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

N = 1000
U = 50
S = 64


def init(key, dtype):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sc = 1.0 / np.sqrt(U)
    return {
        "wx": (jax.random.normal(k1, (2, 3 * U)) * sc).astype(dtype),
        "wh": (jax.random.normal(k2, (U, 3 * U)) * sc).astype(dtype),
        "bx": jnp.zeros((3 * U,), dtype),
        "bh": jnp.zeros((3 * U,), dtype),
        "hw": (jax.random.normal(k3, (U, 2)) * sc).astype(dtype),
        "hb": jnp.zeros((2,), dtype),
    }


def site_logps(params, samples, dtype):
    """(N, S) per-site log-probs, teacher-forced, reset-after GRU."""
    p = {k: v.astype(dtype) for k, v in params.items()}
    s = samples.shape[0]
    onehot = jax.nn.one_hot(samples.T, 2, dtype=dtype)
    inputs = jnp.concatenate([jnp.zeros((1, s, 2), dtype), onehot[:-1]], 0)

    def step(h, xs):
        x, tgt = xs
        gx = x @ p["wx"] + p["bx"]
        gh = h @ p["wh"] + p["bh"]
        r = jax.nn.sigmoid(gx[:, :U] + gh[:, :U])
        z = jax.nn.sigmoid(gx[:, U : 2 * U] + gh[:, U : 2 * U])
        c = jnp.tanh(gx[:, 2 * U :] + r * gh[:, 2 * U :])
        h = z * h + (1 - z) * c
        logits = h @ p["hw"] + p["hb"]
        lp = jax.nn.log_softmax(logits, axis=-1)
        return h, jnp.take_along_axis(lp, tgt[:, None], axis=-1)[:, 0]

    h0 = jnp.zeros((s, U), dtype)
    _, lps = jax.lax.scan(step, h0, (inputs, samples.T))
    return lps


def kahan_sum(xs):
    """Sequential compensated sum along axis 0, all in the input dtype."""

    def step(carry, x):
        s, c = carry
        y = x - c
        t = s + y
        c = (t - s) - y
        return (t, c), None

    z = jnp.zeros_like(xs[0])
    (s, _), _ = jax.lax.scan(step, (z, z), xs)
    return s


def main():
    key = jax.random.PRNGKey(0)
    params = init(key, jnp.float64)
    samples = jax.random.bernoulli(
        jax.random.PRNGKey(1), 0.5, (S, N)
    ).astype(jnp.int32)

    lps64 = site_logps(params, samples, jnp.float64)
    ref = jnp.sum(lps64, axis=0)

    lps32 = site_logps(params, samples, jnp.float32)
    plain = jnp.sum(lps32, axis=0)          # XLA reduce, f32
    seq = jax.lax.scan(
        lambda s, x: (s + x, None), jnp.zeros_like(lps32[0]), lps32
    )[0]                                     # sequential f32 (kernel order)
    ref_split = jnp.sum(lps32.astype(jnp.float64), axis=0)  # f32 rec + f64 sum
    kah = kahan_sum(lps32)

    def err(x):
        return float(jnp.max(jnp.abs(x.astype(jnp.float64) - ref)))

    print(f"N={N} S={S} U={U}; |logp| ~ {float(jnp.mean(-ref)):.1f}")
    print(f"plain f32 (XLA reduce)      max |err| = {err(plain):.3e}")
    print(f"sequential f32 (kernel ord) max |err| = {err(seq):.3e}")
    print(f"f32 rec + f64 sum (ref)     max |err| = {err(ref_split):.3e}")
    print(f"f32 rec + Kahan f32 sum     max |err| = {err(kah):.3e}")
    d = float(jnp.max(jnp.abs(kah.astype(jnp.float64) - ref_split)))
    print(f"Kahan vs f64-sum split      max |diff| = {d:.3e}")


if __name__ == "__main__":
    main()
