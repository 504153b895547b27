"""Fused Pallas BPTT kernel vs jax.grad of the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.ops.fused_gru_bwd import gru_log_prob_bwd


@pytest.mark.parametrize("units", [
    pytest.param((10,), marks=pytest.mark.slow),
    (10, 10),
    pytest.param((8, 8, 8), marks=pytest.mark.slow),
])
def test_bwd_kernel_matches_jnp_grad(units):
    n = 9
    ansatz = PRNN1D(num_sites=n, units=units, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 21)
    g = jax.random.normal(jax.random.PRNGKey(2), (21,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = gru_log_prob_bwd(params, samples, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("units", [
    (10,),
    pytest.param((8, 8), marks=pytest.mark.slow),
])
def test_lstm_bwd_kernel_matches_jnp_grad(units):
    """Fused LSTM BPTT ([h; c] history, [dh; dc] carry) vs jnp grad."""
    n = 9
    ansatz = PRNN1D(num_sites=n, units=units, cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(40))
    samples = ansatz.sample(params, jax.random.PRNGKey(41), 21)
    g = jax.random.normal(jax.random.PRNGKey(42), (21,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = gru_log_prob_bwd(params, samples, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_lstm_bwd_kernel_spill_matches_jnp_grad(monkeypatch):
    """Chunk-streamed LSTM BPTT (long-chain spill protocol) == jnp grad."""
    from rnnwavefunctions_tpu.ops import fused_gru_bwd as m

    monkeypatch.setattr(
        m, "_pick_tile", lambda n, u, b, heads=1, **kw: (128, True)
    )
    monkeypatch.setattr(m, "_pick_chunk", lambda n, u, t, heads=1, **kw: 8)
    n = 21
    ansatz = PRNN1D(num_sites=n, units=(10,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(43))
    samples = ansatz.sample(params, jax.random.PRNGKey(44), 13)
    g = jax.random.normal(jax.random.PRNGKey(45), (13,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.gru_log_prob_bwd(params, samples, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_bwd_kernel_multiple_tiles(monkeypatch):
    """Batch larger than one tile: programs must accumulate, not overwrite."""
    from rnnwavefunctions_tpu.ops import fused_gru_bwd as m

    n = 7
    ansatz = PRNN1D(num_sites=n, units=(8,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(3))
    samples = ansatz.sample(params, jax.random.PRNGKey(4), 300)
    g = jax.random.normal(jax.random.PRNGKey(5), (300,))
    monkeypatch.setattr(
        m, "_pick_tile", lambda n, u, b, heads=1, **kw: (128, False)
    )  # 3 programs

    def loss(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.gru_log_prob_bwd(params, samples, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("n,units", [
    (8, (10,)),
    pytest.param(16, (10,), marks=pytest.mark.slow),
    pytest.param(21, (10,), marks=pytest.mark.slow),
    pytest.param(33, (10,), marks=pytest.mark.slow),
    pytest.param(21, (8, 8), marks=pytest.mark.slow),
])
def test_bwd_kernel_spill_matches_jnp_grad(n, units, monkeypatch):
    """Chunk-streamed (HBM-spilled history) BPTT == jnp grad.  chunk=8
    exercises nchunks = 1, 2, 3 and 5 including partial last chunks, the
    resident-tail fast path, and the reverse-sweep prefetch protocol."""
    from rnnwavefunctions_tpu.ops import fused_gru_bwd as m

    monkeypatch.setattr(m, "_pick_tile", lambda n, u, b, heads=1, **kw: (128, True))
    monkeypatch.setattr(m, "_pick_chunk", lambda n, u, t, heads=1, **kw: 8)
    ansatz = PRNN1D(num_sites=n, units=units, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 13)
    g = jax.random.normal(jax.random.PRNGKey(2), (13,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.gru_log_prob_bwd(params, samples, g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_crnn_bwd_kernel_spill_matches_jnp_grad(monkeypatch):
    """The cRNN backward rides the same chunk-streaming skeleton."""
    from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
    from rnnwavefunctions_tpu.ops import fused_crnn_bwd as m

    monkeypatch.setattr(m, "_pick_tile", lambda n, u, b, heads=1, **kw: (128, True))
    monkeypatch.setattr(m, "_pick_chunk", lambda n, u, t, heads=1, **kw: 8)
    n = 18
    ansatz = CRNNU1(num_sites=n, units=(10,), u1=True, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 11)
    g_re = jax.random.normal(jax.random.PRNGKey(2), (11,))
    g_im = jax.random.normal(jax.random.PRNGKey(3), (11,))

    def loss(p):
        re, im = ansatz._log_amp_parts_jnp(p, samples)
        return jnp.sum(re * g_re) + jnp.sum(im * g_im)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.crnn_log_amp_bwd(params, samples, g_re, g_im, True)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_trainer_grad_equivalence_via_custom_vjp():
    """grad through the pallas log_prob (fused backward) == jnp-path grad."""
    n = 8
    a_pallas = PRNN1D(num_sites=n, units=(10,), impl="pallas")
    a_jnp = PRNN1D(num_sites=n, units=(10,), impl="jnp")
    params = a_jnp.init(jax.random.PRNGKey(7))
    samples = a_jnp.sample(params, jax.random.PRNGKey(8), 17)
    w = jax.random.normal(jax.random.PRNGKey(9), (17,))

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(
            lambda p: jnp.sum(a_pallas.log_prob(p, samples) * w)
        )(params)
    g2 = jax.grad(lambda p: jnp.sum(a_jnp.log_prob(p, samples) * w))(params)
    for x, y in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(3, 4), (4, 3), (4, 4)])
def test_mdrnn_bwd_kernel_matches_jnp_grad(shape):
    from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
    from rnnwavefunctions_tpu.ops.fused_mdrnn_bwd import mdrnn_log_prob_bwd

    nx, ny = shape
    ansatz = MDRNN2D(nx=nx, ny=ny, units=9, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 19)
    g = jax.random.normal(jax.random.PRNGKey(2), (19,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = mdrnn_log_prob_bwd(params, samples, g, nx, ny)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_mdrnn_bwd_multiple_tiles(monkeypatch):
    from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
    from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as m

    ansatz = MDRNN2D(nx=3, ny=3, units=8, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(3))
    samples = ansatz.sample(params, jax.random.PRNGKey(4), 300)
    g = jax.random.normal(jax.random.PRNGKey(5), (300,))
    monkeypatch.setattr(m, "_pick", lambda nx, ny, u, b: (128, None))

    def loss(p):
        return jnp.sum(ansatz._log_prob_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.mdrnn_log_prob_bwd(params, samples, g, 3, 3)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("shape,crows", [
    ((3, 4), 1),
    pytest.param((4, 5), 2, marks=pytest.mark.slow),
    pytest.param((3, 3), 2, marks=pytest.mark.slow),
    pytest.param((4, 7), 2, marks=pytest.mark.slow),
])
def test_mdrnn_bwd_kernel_spill_matches_jnp_grad(shape, crows, monkeypatch):
    """Row-chunk-spilled 2D BPTT == jnp grad.  The cases exercise nchunks =
    4 (single-row chunks, full forward-write + reverse-prefetch protocol),
    3 with a partial last chunk, and 2 (both chunks stay ring-resident, no
    HBM traffic at all)."""
    from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
    from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as m

    monkeypatch.setattr(m, "_pick", lambda nx, ny, u, b: (128, crows))
    nx, ny = shape
    ansatz = MDRNN2D(nx=nx, ny=ny, units=9, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(10))
    samples = ansatz.sample(params, jax.random.PRNGKey(11), 17)
    g = jax.random.normal(jax.random.PRNGKey(12), (17,))

    def loss(p):
        return jnp.sum(ansatz._log_prob_jnp(p, samples) * g)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = m.mdrnn_log_prob_bwd(params, samples, g, nx, ny)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("u1,units", [
    (True, (10,)),
    pytest.param(False, (10,), marks=pytest.mark.slow),
    pytest.param(True, (8, 8), marks=pytest.mark.slow),
])
def test_crnn_bwd_kernel_matches_jnp_grad(u1, units):
    from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
    from rnnwavefunctions_tpu.ops.fused_crnn_bwd import crnn_log_amp_bwd

    n = 10
    ansatz = CRNNU1(num_sites=n, units=units, u1=u1, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 23)
    g_re = jax.random.normal(jax.random.PRNGKey(2), (23,))
    g_im = jax.random.normal(jax.random.PRNGKey(3), (23,))

    def loss(p):
        re, im = ansatz._log_amp_parts_jnp(p, samples)
        return jnp.sum(re * g_re) + jnp.sum(im * g_im)

    want = jax.grad(loss)(params)
    with pltpu.force_tpu_interpret_mode():
        got = crnn_log_amp_bwd(params, samples, g_re, g_im, u1)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_crnn_custom_vjp_uses_fused_bwd():
    """grad through the pallas log_amp_parts == jnp-path grad."""
    from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1

    n = 8
    a_p = CRNNU1(num_sites=n, units=(10,), impl="pallas")
    a_j = CRNNU1(num_sites=n, units=(10,), impl="jnp")
    params = a_j.init(jax.random.PRNGKey(5))
    samples = a_j.sample(params, jax.random.PRNGKey(6), 15)
    w = jax.random.normal(jax.random.PRNGKey(7), (15,))

    def loss(ansatz, p):
        re, im = ansatz.log_amp_parts(p, samples)
        return jnp.sum(re * w) + jnp.sum(im * w)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda p: loss(a_p, p))(params)
    g2 = jax.grad(lambda p: loss(a_j, p))(params)
    for x, y in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5
        )
