"""1D positive RNN wavefunction (pRNN), optionally parity-symmetrized.

Capability parity with the reference's ``1DTFIM/RNNwavefunction.py`` (plain)
and ``1DTFIM/RNNwavefunction_paritysym.py`` (``parity=True``), rebuilt
TPU-first:

* The site loop is a single ``lax.scan`` body — O(1) compiled program size in
  the number of sites, vs the reference's Python-unrolled O(N) graph
  (``1DTFIM/RNNwavefunction.py:65-70``).
* Sampling uses exact inverse-CDF draws from per-site conditionals (the
  reference's ``tf.multinomial(tf.log(softmax))``,
  ``1DTFIM/RNNwavefunction.py:68``) with one fresh PRNG key per site.
* ``sample_with_log_prob`` returns the joint log-density as a free by-product
  of the sampling scan (the reference re-runs a separate teacher-forced graph
  for this).
* Log-probabilities are accumulated with ``log_softmax`` directly (never
  ``log(softmax(x))``) in ``accum_dtype`` — the reference promotes to float64
  for this sum (``1DTFIM/RNNwavefunction.py:113-116``); float32 +
  log-softmax meets the 1e-4 energy anchors (verified in tests).
* Parity symmetrization computes ``log(0.5 (p(s) + p(rev s)))``
  (``RNNwavefunction_paritysym.py:145``) as a numerically-stable
  ``logaddexp`` — mathematically identical, overflow-free.  As in the
  reference, only the *density* is symmetrized; sampling stays plain
  autoregressive (``RNNwavefunction_paritysym.py`` sampler is the plain one).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from . import cells
from ..ops.compsum import accum_sum


def inverse_cdf_sample(key: jax.Array, probs: jax.Array) -> jax.Array:
    """Exact categorical draw via inverse CDF. probs: (..., d) -> int32 (...)."""
    u = jax.random.uniform(key, probs.shape[:-1] + (1,), dtype=probs.dtype)
    cdf = jnp.cumsum(probs, axis=-1)
    draw = jnp.sum(u >= cdf, axis=-1)
    return jnp.clip(draw, 0, probs.shape[-1] - 1).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class PRNN1D:
    """Positive wavefunction psi(sigma) = sqrt(p(sigma)) with p autoregressive.

    Args:
      num_sites: chain length N.
      units: hidden widths per stacked GRU layer (MultiRNNCell analogue).
      local_dim: on-site Hilbert dimension (2 throughout the reference,
        ``TrainingRNN_1DTFIM.py:100``).
      parity: if True, the density (not the sampler) is symmetrized under
        spatial reflection, as in ``RNNwavefunction_paritysym.py:80-145``.
      dtype: compute dtype for the recurrence (float32; the MXU accumulates
        matmuls in float32 regardless).
      accum_dtype: dtype of the log-probability accumulation.
    """

    num_sites: int
    units: Tuple[int, ...] = (50,)
    local_dim: int = 2
    parity: bool = False
    dtype: Any = jnp.float32
    accum_dtype: Any = jnp.float32
    # recurrent cell: "gru" (every reference runner), "lstm" (the snake-2D
    # ansatz signature's default argument,
    # ``2DTFIM_1DRNN/RNNwavefunction.py:9``), or any custom-cell protocol
    # object (init/apply/zero_state — see ``models/cells.py``), mirroring
    # the reference constructor's acceptance of arbitrary TF RNNCell
    # classes (``1DTFIM/RNNwavefunction.py:13``).  GRU and LSTM ride the
    # fused rollout kernels; custom cells run the jnp scan path.
    cell: Any = "gru"
    # "auto": fused Pallas kernels on TPU when supported (uniform-width
    # GRU/LSTM, local_dim 2, float32); "pallas": force; "jnp": pure
    # lax.scan path.
    impl: str = "auto"

    is_complex: bool = dataclasses.field(default=False, init=False, repr=False)

    @property
    def plain_positive(self) -> bool:
        """True when the sampling density equals the wavefunction density, so
        log psi = 0.5 * (sampling log-prob) without a second pass."""
        return not self.parity

    # -- kernel dispatch ----------------------------------------------------

    def _kernelizable(self) -> bool:
        """Rollout (sample / teacher-forced log-prob) kernel coverage."""
        return (
            len(set(self.units)) == 1  # uniform-width stacks
            and self.local_dim == 2
            and self.cell in ("gru", "lstm")
            and self.dtype == jnp.float32
            and self.accum_dtype == jnp.float32
        )

    def _use_pallas(self) -> bool:
        from .base import resolve_impl

        return resolve_impl(
            self, self._kernelizable(),
            "uniform-width GRU/LSTM stacks, local_dim=2, float32",
        )

    @property
    def _pallas_log_prob(self):
        cached = getattr(self, "_pallas_log_prob_fn", None)
        if cached is None:
            from ..ops import fused_gru

            cached = fused_gru.make_log_prob_fn(
                lambda p, s: self._log_prob_plain_jnp(p, s)
            )
            object.__setattr__(self, "_pallas_log_prob_fn", cached)
        return cached

    # -- parameters ---------------------------------------------------------

    def init(self, key: jax.Array) -> Any:
        k_rnn, k_head = jax.random.split(key)
        return {
            "rnn": cells.stacked_rnn_init(
                k_rnn, self.local_dim, self.units, self.dtype, self.cell
            ),
            "head": cells.dense_init(k_head, self.units[-1], self.local_dim, self.dtype),
        }

    # -- internals ----------------------------------------------------------

    def _step_logits(self, params, x, hs):
        out, hs = cells.stacked_rnn_apply(params["rnn"], x, hs, self.cell)
        return cells.dense_apply(params["head"], out), hs

    # -- sampling -----------------------------------------------------------

    def sample_with_log_prob(
        self, params: Any, key: jax.Array, num_samples: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Draw ``(num_samples, N)`` int32 spins and their plain (non-
        symmetrized) autoregressive log-density."""
        if self._use_pallas():
            from ..ops import fused_gru
            from ..ops.seeding import seed_from_key

            return fused_gru._sample_pallas(
                params, seed_from_key(key), num_samples, self.num_sites
            )
        d = self.local_dim

        def step(carry, site_key):
            x, hs = carry
            logits, hs = self._step_logits(params, x, hs)
            logp = jax.nn.log_softmax(logits, axis=-1)
            draw = inverse_cdf_sample(site_key, jnp.exp(logp))
            x_next = jax.nn.one_hot(draw, d, dtype=self.dtype)
            site_logp = jnp.take_along_axis(logp, draw[:, None], axis=-1)[:, 0]
            return (x_next, hs), (draw, site_logp.astype(self.accum_dtype))

        x0 = jnp.zeros((num_samples, d), self.dtype)  # the zero "sigma_0" input
        hs0 = cells.stacked_rnn_zero_state(
            num_samples, self.units, self.dtype, self.cell
        )
        keys = jax.random.split(key, self.num_sites)
        _, (draws, site_logps) = jax.lax.scan(step, (x0, hs0), keys)
        samples = draws.T  # (N, S) -> (S, N)
        return samples, accum_sum(site_logps, self.accum_dtype)

    def sample(self, params: Any, key: jax.Array, num_samples: int) -> jax.Array:
        return self.sample_with_log_prob(params, key, num_samples)[0]

    # -- densities ----------------------------------------------------------

    def _log_prob_plain(self, params: Any, samples: jax.Array) -> jax.Array:
        """Teacher-forced log p(sigma), Pallas-fused when available (the
        jnp scan path remains the autodiff backward, see ops/fused_gru)."""
        if self._use_pallas():
            return self._pallas_log_prob(params, samples)
        return self._log_prob_plain_jnp(params, samples)

    def _log_prob_plain_jnp(self, params: Any, samples: jax.Array) -> jax.Array:
        """Teacher-forced log p(sigma) for (S, N) int samples."""
        d = self.local_dim
        s = samples.shape[0]
        onehot = jax.nn.one_hot(samples.T, d, dtype=self.dtype)  # (N, S, d)
        inputs = jnp.concatenate(
            [jnp.zeros((1, s, d), self.dtype), onehot[:-1]], axis=0
        )
        targets = samples.T  # (N, S)

        def step(hs, xs_t):
            x, tgt = xs_t
            logits, hs = self._step_logits(params, x, hs)
            logp = jax.nn.log_softmax(logits, axis=-1)
            site_logp = jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
            return hs, site_logp.astype(self.accum_dtype)

        hs0 = cells.stacked_rnn_zero_state(s, self.units, self.dtype, self.cell)
        _, site_logps = jax.lax.scan(step, hs0, (inputs, targets))
        return accum_sum(site_logps, self.accum_dtype)

    def log_prob(self, params: Any, samples: jax.Array) -> jax.Array:
        """log p(sigma); parity-symmetrized when ``parity=True``."""
        lp = self._log_prob_plain(params, samples)
        if not self.parity:
            return lp
        lp_rev = self._log_prob_plain(params, samples[:, ::-1])
        return jnp.logaddexp(lp, lp_rev) - jnp.log(
            jnp.asarray(2.0, dtype=self.accum_dtype)
        )

    def log_amp(self, params: Any, samples: jax.Array) -> jax.Array:
        """log psi = 0.5 log p (positive wavefunction)."""
        return 0.5 * self.log_prob(params, samples)
