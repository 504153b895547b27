"""The Ansatz protocol: pure-functional wavefunction modules.

The reference's five ``RNNwavefunction`` classes each own a private TF1 graph
and build unrolled sample / log-probability subgraphs on demand
(``/root/reference/1DTFIM/RNNwavefunction.py:20,35,76``).  Here an ansatz is a
frozen dataclass of *static* configuration; all state lives in an explicit
parameter pytree, so the same object works under ``jit``, ``vmap``, ``grad``,
and ``shard_map`` without graph bookkeeping.

Protocol (duck-typed; see ``PRNN1D`` for the canonical implementation):

* ``init(key) -> params``                       — parameter pytree
* ``sample(params, key, num_samples) -> sigma`` — autoregressive exact
  sampling; integer encoding ``0 = down, 1 = up`` as in the reference.
* ``sample_with_log_prob(params, key, n)``      — same, plus the log of the
  density the samples were drawn from (free by-product of the scan).
* ``log_amp(params, sigma) -> (S,)``            — log wavefunction amplitude
  log psi(sigma).  Real-valued for positive ansatze (= 0.5 * log p), complex64
  for the cRNN.  This is the single interface the Hamiltonian/local-energy
  machinery consumes, unifying the reference's ``log_probability`` /
  ``log_amplitude`` split (``1DTFIM/RNNwavefunction.py:76``,
  ``J1J2/ComplexRNNwavefunction.py:105``).
* ``log_prob(params, sigma) -> (S,)``           — log of the *sampling/
  gradient* density.  For positive ansatze this is the (optionally parity-
  symmetrized) log p; for the cRNN it is ``2 * Re(log_amp)``.
* ``is_complex: bool``                          — head type marker.
"""

from __future__ import annotations

from typing import Any, Protocol, Tuple, runtime_checkable

import jax


@runtime_checkable
class Ansatz(Protocol):
    is_complex: bool

    def init(self, key: jax.Array) -> Any: ...

    def sample(self, params: Any, key: jax.Array, num_samples: int) -> jax.Array: ...

    def sample_with_log_prob(
        self, params: Any, key: jax.Array, num_samples: int
    ) -> Tuple[jax.Array, jax.Array]: ...

    def log_amp(self, params: Any, samples: jax.Array) -> jax.Array: ...

    def log_prob(self, params: Any, samples: jax.Array) -> jax.Array: ...


def resolve_impl(ansatz: Any, kernelizable: bool, requirement: str) -> bool:
    """Shared ``impl`` dispatch for the ansatz modules (one definition so
    the three families cannot diverge): ``"jnp"`` forces the scan path;
    ``"pallas"`` requires kernel coverage and raises a clear error outside
    it; ``"auto"`` takes the fused kernels only on a TPU backend AND within
    coverage — non-TPU accelerators (gpu/metal) get the jnp path, Mosaic
    TPU kernels cannot lower there — emitting the one-time forfeit warning
    when a TPU config falls outside coverage."""
    if ansatz.impl == "jnp":
        return False
    if ansatz.impl == "pallas":
        if not kernelizable:
            raise ValueError(
                f"pallas kernels support {requirement}; got {ansatz}"
            )
        return True
    on_tpu = jax.default_backend() == "tpu"
    if not kernelizable and on_tpu:
        warn_fused_forfeit(ansatz)
    return kernelizable and on_tpu


_FORFEIT_WARNED = set()


def warn_fused_forfeit(ansatz: Any) -> None:
    """One-time warning when an ``impl="auto"`` configuration silently
    forfeits every fused Pallas path on an accelerator backend (float64,
    custom cells, non-uniform stacks): the jnp scan fallback is correct but
    ~an order of magnitude slower, and the reference's own workloads all
    stay inside kernel coverage — a user should opt in knowingly."""
    import warnings

    key = repr(ansatz)
    if key in _FORFEIT_WARNED:
        return
    _FORFEIT_WARNED.add(key)
    warnings.warn(
        f"{type(ansatz).__name__} configuration is outside fused-kernel "
        "coverage (kernels need uniform-width float32 GRU/LSTM/MDRNN cells "
        "with local_dim=2); every sampling/estimator/gradient pass falls back "
        "to the jnp scan path, which is far slower on TPU.  Pass "
        "impl='jnp' explicitly to acknowledge and silence this warning.",
        stacklevel=3,
    )
