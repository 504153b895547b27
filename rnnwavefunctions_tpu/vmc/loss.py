"""VMC surrogate ("fake cost") loss.

One formula covers both reference losses.  With Ec = stop_grad(E_loc - <E>):

    cost = 2 * mean( Re( conj(log psi(sigma)) * Ec ) )

* Positive ansatze: log psi = 0.5 log p, so
  ``cost = mean(log p * Ec) = mean(log p * Eloc) - mean(Eloc) * mean(log p)``
  — exactly ``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:156`` (and the
  2D variants at ``Training1DRNN_2DTFIM.py:150``,
  ``Training2DRNN_2DTFIM.py:164``).
* Complex ansatz:
  ``cost = 2 Re( mean(conj(log psi) sg(E)) - conj(mean(log psi)) mean(sg(E)) )``
  — exactly ``J1J2/TrainingRNN_J1J2.py:197``.

The ``stop_gradient`` on E_loc is mandatory here (the reference gets it for
free in 1DTFIM because ``Eloc`` is a placeholder; SURVEY.md §2.2 quirk 3).
The *caller* supplies the global mean of E_loc so the baseline is correct
under data-parallel sharding (psum'd mean over the mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def surrogate_loss(log_amps: jax.Array, e_loc: jax.Array, e_mean) -> jax.Array:
    """Scalar surrogate whose gradient is the VMC energy gradient.

    Args:
      log_amps: (S,) log psi of the samples, real or complex, differentiable.
      e_loc:    (S,) local energies (treated as constants).
      e_mean:   scalar global mean of E_loc (the variance-reducing baseline).
    """
    ec = jax.lax.stop_gradient(e_loc - e_mean)
    if jnp.iscomplexobj(log_amps) or jnp.iscomplexobj(ec):
        return 2.0 * jnp.mean(jnp.real(jnp.conj(log_amps) * ec))
    return 2.0 * jnp.mean(log_amps * ec)
