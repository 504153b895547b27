"""Trainer-level fused-path plumbing (VERDICT r1 weak items 1-2).

With a fused wavefront estimator active, the only ansatz log-amp invocation
per traced step is the differentiable surrogate pass inside the loss — the
estimator computes its base pass in-kernel and returns log psi as a free
by-product (round 1 traced a second, estimator-side log-amp pass; XLA DCE'd
it at runtime, but the dispatch is now statically clean and the by-product
feeds the fused sample+energy modes).  Counting subclasses assert the
invocation count; kernels run in interpret mode on the CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnnwavefunctions_tpu import (
    CRNNU1,
    J1J2,
    PRNN1D,
    TFIM1D,
    TrainConfig,
    VMCTrainer,
    make_mesh,
)


class _CountingPRNN(PRNN1D):
    def log_amp(self, params, samples):
        _COUNTS["log_amp"] += 1
        return super().log_amp(params, samples)


class _CountingCRNN(CRNNU1):
    def log_amp_parts(self, params, samples):
        _COUNTS["log_amp_parts"] += 1
        return super().log_amp_parts(params, samples)


_COUNTS = {"log_amp": 0, "log_amp_parts": 0}


def _trace_one_step(trainer):
    _COUNTS["log_amp"] = _COUNTS["log_amp_parts"] = 0
    state = trainer.init()
    with pltpu.force_tpu_interpret_mode():
        state, m = trainer.step(state, jax.random.PRNGKey(0))
        e = float(m["mean_energy"])
    assert np.isfinite(e)
    return dict(_COUNTS)


def test_tfim_fused_sample_energy_single_log_amp_trace():
    n = 8
    ansatz = _CountingPRNN(num_sites=n, units=(8,), impl="pallas")
    trainer = VMCTrainer(
        ansatz, TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    assert trainer._fused_sample_energy is not None
    assert not trainer.local_energy.needs_log_amp
    counts = _trace_one_step(trainer)
    assert counts["log_amp"] == 1  # the loss pass only


@pytest.mark.slow
def test_parity_fused_estimator_single_log_amp_trace():
    n = 8
    ansatz = _CountingPRNN(num_sites=n, units=(8,), parity=True, impl="pallas")
    trainer = VMCTrainer(
        ansatz, TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    assert not trainer.local_energy.needs_log_amp
    assert trainer._fused_sample_energy is not None  # sample+per-flip launch
    counts = _trace_one_step(trainer)
    assert counts["log_amp"] == 1  # loss only; estimator is in-kernel


@pytest.mark.slow
def test_j1j2_fused_estimator_single_log_amp_trace():
    n = 8
    ansatz = _CountingCRNN(num_sites=n, units=(8,), impl="pallas")
    trainer = VMCTrainer(
        ansatz, J1J2(num_sites=n, j2=0.2),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    assert not trainer.local_energy.needs_log_amp
    assert trainer._fused_sample_energy is not None  # one-launch step
    counts = _trace_one_step(trainer)
    assert counts["log_amp_parts"] == 1  # loss only


def test_lstm_fused_sample_energy_step():
    """LSTM stacks take the one-launch fused sample+estimate step and the
    whole traced step runs end-to-end (fused BPTT backward included)."""
    n = 8
    ansatz = _CountingPRNN(num_sites=n, units=(8,), cell="lstm",
                           impl="pallas")
    trainer = VMCTrainer(
        ansatz, TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    assert trainer._fused_sample_energy is not None
    assert not trainer.local_energy.needs_log_amp
    counts = _trace_one_step(trainer)
    assert counts["log_amp"] == 1  # the loss pass only


def test_mdrnn_fused_sample_energy_step():
    from rnnwavefunctions_tpu import MDRNN2D, TFIM2D

    ansatz = MDRNN2D(nx=5, ny=5, units=8, impl="pallas")
    trainer = VMCTrainer(
        ansatz, TFIM2D(nx=5, ny=5, bx=3.0, encoding="grid"),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    assert trainer._fused_sample_energy is not None
    assert not trainer.local_energy.needs_log_amp
    _trace_one_step(trainer)


@pytest.mark.slow
def test_fused_estimator_by_product_matches_log_amp():
    """The third return of a fused estimator is the base log psi."""
    n = 8
    ansatz = PRNN1D(num_sites=n, units=(8,), parity=True, impl="pallas")
    trainer = VMCTrainer(
        ansatz, TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=16), mesh=make_mesh(1),
    )
    jnp_ansatz = PRNN1D(num_sites=n, units=(8,), parity=True, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = jnp_ansatz.sample(params, jax.random.PRNGKey(1), 12)
    with pltpu.force_tpu_interpret_mode():
        _, _, la = trainer.local_energy(params, samples)
    want = np.asarray(jnp_ansatz.log_amp(params, samples))
    np.testing.assert_allclose(np.asarray(la), want, atol=1e-4)
