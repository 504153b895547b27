"""Observables measured on Monte-Carlo samples.

The reference's measurement surface is the per-step energy statistics plus a
commented magnetization print (``/root/reference/J1J2/TrainingRNN_J1J2.py:252``)
and the notebook estimator convention
``mean(E[-w:]) +- sqrt(max(varE[-w:]) / (numsamples * w))``
(``Tutorials/1DTFIM/Tutorial_1DTFIM.ipynb`` cell 18).  This module provides
those as first-class, jit-friendly functions, plus sigma^z correlation
functions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def magnetization(samples: jax.Array) -> jax.Array:
    """Mean magnetization <sigma^z> per site over the batch; samples are
    {0,1}-encoded of any lattice shape (``2*samples - 1`` as in the
    reference's print)."""
    z = 2.0 * samples.astype(jnp.float32) - 1.0
    return jnp.mean(z)


def zz_correlations(samples: jax.Array) -> jax.Array:
    """Connected <z_i z_j> - <z_i><z_j> over a flat (S, N) sample batch."""
    z = 2.0 * samples.reshape(samples.shape[0], -1).astype(jnp.float32) - 1.0
    mean_z = jnp.mean(z, axis=0)
    return z.T @ z / z.shape[0] - jnp.outer(mean_z, mean_z)


def energy_estimate(
    mean_energy: Sequence[float],
    var_energy: Sequence[float],
    num_samples: int,
    window: int = 100,
) -> Tuple[float, float]:
    """The notebook convention: (mean of trailing window, error bar)."""
    w = min(window, len(mean_energy))
    est = float(np.mean(np.real(np.asarray(mean_energy[-w:]))))
    err = math.sqrt(max(var_energy[-w:]) / (num_samples * w))
    return est, err
