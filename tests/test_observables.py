"""Observables and the evaluation-only API."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from rnnwavefunctions_tpu import (
    CRNNU1, J1J2, PRNN1D, TFIM1D, TrainConfig, VMCTrainer,
)
from rnnwavefunctions_tpu.vmc import observables


def test_magnetization_and_correlations():
    samples = jnp.asarray([[0, 0, 1, 1], [1, 1, 0, 0]], jnp.int32)
    np.testing.assert_allclose(float(observables.magnetization(samples)), 0.0)
    c = np.asarray(observables.zz_correlations(samples))
    # site 0 and site 1 always agree -> connected correlation 1
    np.testing.assert_allclose(c[0, 1], 1.0, atol=1e-6)
    # site 0 and site 2 always disagree -> -1
    np.testing.assert_allclose(c[0, 2], -1.0, atol=1e-6)


def test_energy_estimate_convention():
    mean_e = [-1.0] * 50 + [-2.0] * 100
    var_e = [0.25] * 150
    est, err = observables.energy_estimate(mean_e, var_e, num_samples=100)
    np.testing.assert_allclose(est, -2.0)
    np.testing.assert_allclose(err, np.sqrt(0.25 / (100 * 100)))


def test_trainer_evaluate_real():
    trainer = VMCTrainer(
        PRNN1D(num_sites=6, units=(8,)), TFIM1D(num_sites=6),
        TrainConfig(num_samples=64),
    )
    state = trainer.init()
    out = trainer.evaluate(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["mean_energy"]))
    assert float(out["var_energy"]) >= 0.0
    assert -1.0 <= float(out["magnetization"]) <= 1.0


def test_trainer_evaluate_complex_zero_mag():
    trainer = VMCTrainer(
        CRNNU1(num_sites=6, units=(8,)),
        J1J2(num_sites=6, j2=0.2, marshall_sign=True),
        TrainConfig(num_samples=64),
    )
    state = trainer.init()
    out = trainer.evaluate(state, jax.random.PRNGKey(0))
    assert "mean_energy_im" in out
    # U(1) sampler: exactly zero magnetization
    np.testing.assert_allclose(float(out["magnetization"]), 0.0, atol=1e-6)


def test_schedules():
    from rnnwavefunctions_tpu.vmc.trainer import TrainConfig, make_schedule
    import jax.numpy as jnp

    s = make_schedule(TrainConfig(learning_rate=1e-2, schedule="constant"))
    np.testing.assert_allclose(float(s(jnp.int32(500))), 1e-2)
    s = make_schedule(TrainConfig(learning_rate=1e-2, schedule="inverse",
                                  decay_scale=10.0))
    np.testing.assert_allclose(float(s(jnp.int32(10))), 1e-2 / 2)
    s = make_schedule(TrainConfig(learning_rate=1e-2, schedule="harmonic",
                                  decay_scale=10.0))
    # 1/((1/lr)+(step/10)): at step 1000 -> 1/(100+100) = 5e-3
    np.testing.assert_allclose(float(s(jnp.int32(1000))), 5e-3, rtol=1e-6)
    s = make_schedule(TrainConfig(learning_rate=1e-2, schedule="exponential",
                                  decay_rate=0.5, decay_steps=100,
                                  staircase=True))
    np.testing.assert_allclose(float(s(jnp.int32(199))), 5e-3)
    np.testing.assert_allclose(float(s(jnp.int32(200))), 2.5e-3)
