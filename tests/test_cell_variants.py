"""LSTM cell variant + float64 mode (reference capability surface).

The reference snake-2D ansatz signature defaults to
``tf.contrib.rnn.LSTMCell`` (``2DTFIM_1DRNN/RNNwavefunction.py:9``) even
though every runner passes GRU; the 2D workloads run in float64 end-to-end
(``2DTFIM_2DRNN/RNNwavefunction.py:32``) and the 1D log-prob accumulates in
float64 (``1DTFIM/RNNwavefunction.py:113-116``).  Both are escape hatches
here: float32 meets the published anchors, but the surfaces must exist and
work.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rnnwavefunctions_tpu import PRNN1D, TFIM1D, TrainConfig, VMCTrainer, make_mesh
from rnnwavefunctions_tpu.ed import exact
from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
from rnnwavefunctions_tpu.models.prnn_snake2d import PRNNSnake2D


def all_configs(n):
    return jnp.asarray(list(itertools.product([0, 1], repeat=n)), jnp.int32)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def test_lstm_autoregressive_normalization():
    n = 6
    ansatz = PRNN1D(num_sites=n, units=(10, 8), cell="lstm")
    assert not ansatz._kernelizable()  # jnp scan path
    params = ansatz.init(jax.random.PRNGKey(0))
    lp = ansatz.log_prob(params, all_configs(n))
    np.testing.assert_allclose(float(jnp.sum(jnp.exp(lp))), 1.0, rtol=1e-4)


def test_lstm_sampler_matches_density():
    ansatz = PRNN1D(num_sites=8, units=(12,), cell="lstm")
    params = ansatz.init(jax.random.PRNGKey(1))
    samples, lp_sampling = ansatz.sample_with_log_prob(
        params, jax.random.PRNGKey(2), 48
    )
    lp = ansatz.log_prob(params, samples)
    np.testing.assert_allclose(
        np.asarray(lp_sampling), np.asarray(lp), atol=1e-5
    )


def test_lstm_snake2d_surface():
    ansatz = PRNNSnake2D(nx=3, ny=2, units=(8,), cell="lstm")
    params = ansatz.init(jax.random.PRNGKey(3))
    lp = ansatz.log_prob(params, all_configs(6))
    np.testing.assert_allclose(float(jnp.sum(jnp.exp(lp))), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_lstm_vmc_converges_vs_ed():
    """Short LSTM VMC on N=6 TFIM reaches the dense-ED energy."""
    n = 6
    e_exact = exact.ground_state_energy(exact.tfim1d_dense(n, 1.0))
    trainer = VMCTrainer(
        PRNN1D(num_sites=n, units=(16,), cell="lstm"),
        TFIM1D(num_sites=n, bx=1.0),
        TrainConfig(num_samples=256, learning_rate=5e-3),
        mesh=make_mesh(1),
    )
    state = trainer.init()
    key = jax.random.PRNGKey(0)
    state, ms = trainer.run_steps(state, key, 400)
    e = float(jnp.mean(ms["mean_energy"][-50:]))
    assert abs(e - e_exact) / abs(e_exact) < 5e-3


# ---------------------------------------------------------------------------
# float64
# ---------------------------------------------------------------------------

def test_prnn1d_float64_normalization_and_step():
    n = 6
    with jax.enable_x64(True):
        ansatz = PRNN1D(
            num_sites=n, units=(8,), dtype=jnp.float64,
            accum_dtype=jnp.float64, impl="jnp",
        )
        params = ansatz.init(jax.random.PRNGKey(0))
        lp = ansatz.log_prob(params, all_configs(n))
        assert lp.dtype == jnp.float64
        np.testing.assert_allclose(float(jnp.sum(jnp.exp(lp))), 1.0,
                                   rtol=1e-10)
        trainer = VMCTrainer(
            ansatz, TFIM1D(num_sites=n, bx=1.0),
            TrainConfig(num_samples=16), mesh=make_mesh(1),
        )
        state, m = trainer.step(trainer.init(), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["mean_energy"]))


def test_mdrnn2d_float64_normalization():
    """The reference runs the 2D MDRNN workload in float64
    (2DTFIM_2DRNN/RNNwavefunction.py:32)."""
    with jax.enable_x64(True):
        ansatz = MDRNN2D(
            nx=2, ny=3, units=6, dtype=jnp.float64,
            accum_dtype=jnp.float64, impl="jnp",
        )
        params = ansatz.init(jax.random.PRNGKey(2))
        configs = all_configs(6).reshape(-1, 2, 3)
        lp = ansatz.log_prob(params, configs)
        assert lp.dtype == jnp.float64
        np.testing.assert_allclose(float(jnp.sum(jnp.exp(lp))), 1.0,
                                   rtol=1e-10)


def test_fused_forfeit_warning_once(monkeypatch):
    """A config outside kernel coverage warns exactly once per ansatz repr
    on accelerator backends under impl="auto", and an explicit impl="jnp"
    acknowledges and silences it (VERDICT r2 ergonomics item)."""
    import warnings

    from rnnwavefunctions_tpu.models import base as model_base

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(model_base, "_FORFEIT_WARNED", set())

    slow = PRNN1D(num_sites=4, units=(6, 8))  # non-uniform stack: no kernels
    with pytest.warns(UserWarning, match="outside fused-kernel coverage"):
        assert slow._use_pallas() is False
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # second call must stay silent
        assert slow._use_pallas() is False

    acknowledged = PRNN1D(num_sites=4, units=(6, 8), impl="jnp")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert acknowledged._use_pallas() is False
