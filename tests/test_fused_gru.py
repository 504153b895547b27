"""Pallas fused-GRU kernels vs the jnp reference path (interpret mode on the
CPU mesh; real-chip validation happens in the benchmark/verify drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnnwavefunctions_tpu.models.prnn1d import PRNN1D
from rnnwavefunctions_tpu.ops import fused_gru


@pytest.fixture
def setup():
    ansatz = PRNN1D(num_sites=12, units=(20,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 37)
    return ansatz, params, samples


def test_pallas_log_prob_matches_jnp(setup):
    ansatz, params, samples = setup
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_gru._log_prob_pallas(params, samples))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_log_prob_grad_matches_jnp(setup):
    ansatz, params, samples = setup
    lp = fused_gru.make_log_prob_fn(ansatz._log_prob_plain_jnp)

    def loss_pallas(p):
        return jnp.sum(lp(p, samples))

    def loss_jnp(p):
        return jnp.sum(ansatz._log_prob_plain_jnp(p, samples))

    # grad fully inside interpret mode: the custom_vjp backward is now the
    # fused Pallas BPTT kernel (ops/fused_gru_bwd) within VMEM reach
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_jnp)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_sampler_consistent_with_density(setup):
    ansatz, params, _ = setup
    with pltpu.force_tpu_interpret_mode():
        samples, logp = fused_gru._sample_pallas(
            params, jnp.int32(1234), 64, ansatz.num_sites
        )
    assert samples.shape == (64, ansatz.num_sites)
    assert set(np.unique(np.asarray(samples))) <= {0, 1}
    # the returned log-density must equal the teacher-forced recompute
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(logp), want, atol=1e-4)


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="pltpu.prng_random_bits returns zeros in interpret mode; "
    "run on a real TPU (see .claude/skills/verify)",
)
def test_pallas_sampler_distribution():
    """Empirical frequencies from the kernel sampler track the density."""
    n = 3
    ansatz = PRNN1D(num_sites=n, units=(8,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(2))
    samples, _ = fused_gru._sample_pallas(params, jnp.int32(7), 20000, n)
    codes = np.asarray(samples) @ (2 ** np.arange(n))
    freq = np.bincount(codes, minlength=8) / 20000
    basis = jnp.asarray([[(c >> i) & 1 for i in range(n)] for c in range(8)])
    probs = np.exp(np.asarray(ansatz.log_prob(params, basis)))
    np.testing.assert_allclose(freq, probs, atol=0.02)


def test_pallas_lstm_log_prob_and_sampler_match_jnp():
    """LSTM stacks ride the same fused rollout kernels ([h; c] state rows,
    4-gate packing — TF LSTMCell forget_bias=1.0 semantics)."""
    ansatz = PRNN1D(num_sites=11, units=(14,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(21))
    samples = ansatz.sample(params, jax.random.PRNGKey(22), 29)
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_gru._log_prob_pallas(params, samples))
    np.testing.assert_allclose(got, want, atol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        s2, lp2 = fused_gru._sample_pallas(params, jnp.int32(17), 16, 11)
    want2 = np.asarray(ansatz._log_prob_plain_jnp(params, s2))
    np.testing.assert_allclose(np.asarray(lp2), want2, atol=1e-4)


def test_pallas_lstm_grad_matches_jnp():
    """LSTM gradients ride the fused BPTT kernel ([dh; dc] carry) and must
    match differentiating the jnp reference scan."""
    ansatz = PRNN1D(num_sites=8, units=(10,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(23))
    samples = ansatz.sample(params, jax.random.PRNGKey(24), 13)
    lp = fused_gru.make_log_prob_fn(ansatz._log_prob_plain_jnp)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda p: jnp.sum(lp(p, samples)))(params)
    g2 = jax.grad(
        lambda p: jnp.sum(ansatz._log_prob_plain_jnp(p, samples))
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.slow
def test_wide_hidden_rollout_and_grad_match_jnp():
    """Hidden widths at/above the 128-lane dimension (production-scale
    stacks; the kernels' (U, T) feature-major blocks span multiple
    sublane tiles)."""
    ansatz = PRNN1D(num_sites=10, units=(128,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(40))
    samples = ansatz.sample(params, jax.random.PRNGKey(41), 9)
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_gru._log_prob_pallas(params, samples))
    np.testing.assert_allclose(got, want, atol=2e-4)
    lp = fused_gru.make_log_prob_fn(ansatz._log_prob_plain_jnp)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda p: jnp.sum(lp(p, samples)))(params)
    g2 = jax.grad(
        lambda p: jnp.sum(ansatz._log_prob_plain_jnp(p, samples))
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow
def test_wide_hidden_spill_grad_matches_jnp():
    """N=100 at U=256 exceeds the BPTT VMEM budget even at the minimum
    tile, so the gradient rides the chunk-streamed HBM ring — the
    wide-hidden x spill combination the u256 bench row runs."""
    from rnnwavefunctions_tpu.ops import fused_gru_bwd as bk

    n, u = 100, 256
    assert bk._pick_tile(n, (u,), 4)[1], "config must spill"
    ansatz = PRNN1D(num_sites=n, units=(u,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(44))
    samples = ansatz.sample(params, jax.random.PRNGKey(45), 4)
    lp = fused_gru.make_log_prob_fn(ansatz._log_prob_plain_jnp)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(lambda p: jnp.sum(lp(p, samples)))(params)
    g2 = jax.grad(
        lambda p: jnp.sum(ansatz._log_prob_plain_jnp(p, samples))
    )(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.mark.slow
def test_wide_hidden_flip_estimator_matches_generic():
    """U=256 wavefront flip estimator (the 1dtfim_n100_u256 bench row's
    kernel family) == the generic estimator."""
    from rnnwavefunctions_tpu.hamiltonians.tfim1d import TFIM1D
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n = 10
    fused = PRNN1D(num_sites=n, units=(256,), impl="pallas")
    ref = PRNN1D(num_sites=n, units=(256,), impl="jnp")
    ham = TFIM1D(num_sites=n, bx=1.0)
    params = ref.init(jax.random.PRNGKey(42))
    samples = ref.sample(params, jax.random.PRNGKey(43), 7)
    le_ref = make_local_energy_fn(ref, ham)
    want, _, _ = le_ref(params, samples, ref.log_amp(params, samples))
    le_fused = make_local_energy_fn(fused, ham)
    with pltpu.force_tpu_interpret_mode():
        got, _, _ = le_fused(params, samples, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4
    )


@pytest.mark.slow
def test_pallas_lstm_stacked_matches_jnp():
    ansatz = PRNN1D(num_sites=9, units=(10, 10), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(25))
    samples = ansatz.sample(params, jax.random.PRNGKey(26), 17)
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_gru._log_prob_pallas(params, samples))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_lstm_kernel_gates():
    """GRU and LSTM stacks are kernelizable end-to-end (rollout + wavefront
    estimator); custom cells are not."""
    a = PRNN1D(num_sites=8, units=(10,), cell="lstm")
    assert a._kernelizable()
    g = PRNN1D(num_sites=8, units=(10,))
    assert g._kernelizable()

    class FakeCell:
        pass

    c = PRNN1D(num_sites=8, units=(10,), cell=FakeCell())
    assert not c._kernelizable()


@pytest.mark.widegroup
@pytest.mark.slow
def test_tfim_flip_kernel_lstm_matches_explicit():
    """LSTM wavefront flip kernel ([h; c] history rows) vs explicit flips."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import tfim_flip_ratio_sum

    ansatz = PRNN1D(num_sites=10, units=(12,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(31))
    samples = ansatz.sample(params, jax.random.PRNGKey(32), 23)
    with pltpu.force_tpu_interpret_mode():
        ratio_sum, lp = tfim_flip_ratio_sum(params, samples)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    la = 0.5 * want_lp
    sums = []
    for i in range(ansatz.num_sites):
        flipped = np.asarray(samples).copy()
        flipped[:, i] = 1 - flipped[:, i]
        laf = 0.5 * np.asarray(
            ansatz._log_prob_plain_jnp(params, jnp.asarray(flipped))
        )
        sums.append(np.exp(laf - la))
    np.testing.assert_allclose(
        np.asarray(ratio_sum), np.sum(sums, axis=0), rtol=2e-4
    )


@pytest.mark.slow
def test_parity_lstm_fused_local_energy_matches_generic():
    """Per-flip LSTM kernel + logaddexp parity combination == generic."""
    from rnnwavefunctions_tpu.hamiltonians.tfim1d import TFIM1D
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import tfim_flip_log_probs
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n, bx = 8, 1.1
    ansatz = PRNN1D(num_sites=n, units=(10,), cell="lstm", parity=True,
                    impl="jnp")
    ham = TFIM1D(num_sites=n, bx=bx)
    params = ansatz.init(jax.random.PRNGKey(34))
    samples = ansatz.sample(params, jax.random.PRNGKey(35), 17)

    le = make_local_energy_fn(ansatz, ham)
    want, _, _ = le(params, samples, ansatz.log_amp(params, samples))

    with pltpu.force_tpu_interpret_mode():
        lpf1, lp1 = tfim_flip_log_probs(params, samples)
        lpf2_rev, lp2 = tfim_flip_log_probs(params, samples[:, ::-1])
    lpf2 = np.asarray(lpf2_rev)[:, ::-1]
    num = np.logaddexp(np.asarray(lpf1), lpf2)
    den = np.logaddexp(np.asarray(lp1), np.asarray(lp2))[:, None]
    ratio_sum = np.sum(np.exp(0.5 * (num - den)), axis=1)
    diag = np.asarray(jax.vmap(ham.diagonal)(samples))
    got = diag - bx * ratio_sum
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


@pytest.mark.slow
def test_sample_and_flip_kernel_lstm_consistent():
    """Fused sample+flip with an LSTM stack agrees with recomputation."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import (
        tfim_flip_ratio_sum, tfim_sample_and_flip_sum,
    )

    ansatz = PRNN1D(num_sites=9, units=(10,), cell="lstm", impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(33))
    with pltpu.force_tpu_interpret_mode():
        samples, lp, ratio = tfim_sample_and_flip_sum(
            params, jnp.int32(3), 16, 9
        )
        ratio2, lp2 = tfim_flip_ratio_sum(params, samples)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(ratio2),
                               rtol=1e-5)


def test_auto_impl_selects_jnp_on_cpu():
    ansatz = PRNN1D(num_sites=6, units=(8,))
    assert not ansatz._use_pallas()  # conftest forces the cpu backend
    ansatz2 = PRNN1D(num_sites=6, units=(8, 6), impl="pallas")
    with pytest.raises(ValueError, match="uniform-width"):
        ansatz2._use_pallas()


@pytest.mark.slow
def test_pallas_stacked_log_prob_and_sampler_match_jnp():
    """Multi-layer (uniform-width) GRU stacks through the fused kernels."""
    ansatz = PRNN1D(num_sites=10, units=(12, 12), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(9))
    samples = ansatz.sample(params, jax.random.PRNGKey(10), 33)
    want = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_gru._log_prob_pallas(params, samples))
    np.testing.assert_allclose(got, want, atol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        s2, lp2 = fused_gru._sample_pallas(params, jnp.int32(5), 16, 10)
    want2 = np.asarray(ansatz._log_prob_plain_jnp(params, s2))
    np.testing.assert_allclose(np.asarray(lp2), want2, atol=1e-4)


@pytest.mark.widegroup
def test_tfim_flip_kernel_matches_generic(setup):
    """Triangular fused flip-ratio kernel vs the generic connected path."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import tfim_flip_ratio_sum

    ansatz, params, samples = setup
    with pltpu.force_tpu_interpret_mode():
        ratio_sum, lp = tfim_flip_ratio_sum(params, samples)
    # base log-prob by-product
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    # ratio sum vs explicit flips
    la = 0.5 * want_lp
    sums = []
    for i in range(ansatz.num_sites):
        flipped = np.asarray(samples).copy()
        flipped[:, i] = 1 - flipped[:, i]
        laf = 0.5 * np.asarray(
            ansatz._log_prob_plain_jnp(params, jnp.asarray(flipped))
        )
        sums.append(np.exp(laf - la))
    want = np.sum(sums, axis=0)
    np.testing.assert_allclose(np.asarray(ratio_sum), want, rtol=2e-4)


def test_tfim_flip_pack_dead_lane_no_nan():
    """Odd-N packed flip-pair path: the pair (N-1, N) leaves the upper
    lane-half dead, and its uninitialized accumulator must be clamped
    BEFORE the exp — with strongly biased heads the garbage difference
    overflows f32 exp to inf and 0 * inf = NaN poisons every sample's
    ratio sum (regression: the j1j2 kernel clamped, the tfim pack branch
    did not)."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import tfim_flip_ratio_sum

    # odd AND > one packed group (2*GROUP flips), so the dead flip lands in
    # a later group whose accumulator is re-zeroed and never re-based on the
    # prefix sums — that is what decouples it from lp_base
    n = 17
    ansatz = PRNN1D(num_sites=n, units=(8,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(41))
    # bias the head hard toward spin 0 so all-ones samples carry a very
    # negative base log-prob (the overflow lever: exp(0.5*(0 - lp_base)))
    params["head"]["b"] = jnp.array([20.0, -20.0], jnp.float32)
    samples = jnp.ones((8, n), jnp.int32)  # batch 8 -> pack engages
    with pltpu.force_tpu_interpret_mode():
        ratio_sum, lp = tfim_flip_ratio_sum(params, samples)
    assert np.all(np.isfinite(np.asarray(ratio_sum)))
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    la = 0.5 * want_lp
    sums = []
    for i in range(n):
        flipped = np.asarray(samples).copy()
        flipped[:, i] = 1 - flipped[:, i]
        laf = 0.5 * np.asarray(
            ansatz._log_prob_plain_jnp(params, jnp.asarray(flipped))
        )
        sums.append(np.exp(laf - la))
    want = np.sum(sums, axis=0)
    np.testing.assert_allclose(np.asarray(ratio_sum), want, rtol=2e-4)


def test_sample_and_flip_kernel_consistent(setup):
    """Fused sample+flip kernel: drawn samples' log-probs and ratio sums
    must match independent recomputation (PRNG is zero in interpret mode —
    the deterministic chain still exercises the full fused path)."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import (
        tfim_flip_ratio_sum, tfim_sample_and_flip_sum,
    )

    ansatz, params, _ = setup
    with pltpu.force_tpu_interpret_mode():
        samples, lp, ratio = tfim_sample_and_flip_sum(
            params, jnp.int32(7), 24, ansatz.num_sites
        )
        ratio2, lp2 = tfim_flip_ratio_sum(params, samples)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(ratio2),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)


@pytest.mark.slow
def test_tfim_flip_kernel_stacked_matches_explicit():
    """2-layer stacked wavefront flip kernel vs explicit flip recompute."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import (
        tfim_flip_log_probs, tfim_flip_ratio_sum,
    )

    ansatz = PRNN1D(num_sites=11, units=(12, 12), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(3))
    samples = ansatz.sample(params, jax.random.PRNGKey(4), 19)
    with pltpu.force_tpu_interpret_mode():
        ratio_sum, lp = tfim_flip_ratio_sum(params, samples)
        lpf, lp2 = tfim_flip_log_probs(params, samples)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp2), want_lp, atol=1e-4)
    sums = []
    for i in range(ansatz.num_sites):
        flipped = np.asarray(samples).copy()
        flipped[:, i] = 1 - flipped[:, i]
        lf = np.asarray(
            ansatz._log_prob_plain_jnp(params, jnp.asarray(flipped))
        )
        np.testing.assert_allclose(np.asarray(lpf)[:, i], lf, atol=1e-4)
        sums.append(np.exp(0.5 * (lf - want_lp)))
    np.testing.assert_allclose(
        np.asarray(ratio_sum), np.sum(sums, axis=0), rtol=2e-4
    )


@pytest.mark.slow
def test_sample_and_flip_kernel_stacked_consistent():
    """Fused sample+flip with a 2-layer stack agrees with recomputation."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import (
        tfim_flip_ratio_sum, tfim_sample_and_flip_sum,
    )

    ansatz = PRNN1D(num_sites=9, units=(10, 10), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(5))
    with pltpu.force_tpu_interpret_mode():
        samples, lp, ratio = tfim_sample_and_flip_sum(params, jnp.int32(3), 16, 9)
        ratio2, lp2 = tfim_flip_ratio_sum(params, samples)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(ratio2), rtol=1e-5)


@pytest.mark.slow
def test_sample_and_flip_kernel_per_flip_consistent():
    """Fused sample+per-flip log-probs (the parity sample mode)."""
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import (
        tfim_flip_log_probs, tfim_sample_and_flip_sum,
    )

    ansatz = PRNN1D(num_sites=8, units=(10,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(6))
    with pltpu.force_tpu_interpret_mode():
        samples, lp, lpf = tfim_sample_and_flip_sum(
            params, jnp.int32(11), 16, 8, per_flip=True
        )
        lpf2, lp2 = tfim_flip_log_probs(params, samples)
    np.testing.assert_allclose(np.asarray(lpf), np.asarray(lpf2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)


@pytest.mark.slow
def test_parity_fused_local_energy_matches_generic():
    """Per-flip kernel + logaddexp combination == generic parity estimator."""
    from rnnwavefunctions_tpu.hamiltonians.tfim1d import TFIM1D
    from rnnwavefunctions_tpu.ops.tfim_flip_kernel import tfim_flip_log_probs
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n, bx = 9, 1.1
    ansatz = PRNN1D(num_sites=n, units=(12,), parity=True, impl="jnp")
    ham = TFIM1D(num_sites=n, bx=bx)
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 21)

    le = make_local_energy_fn(ansatz, ham)
    want, _, _ = le(params, samples, ansatz.log_amp(params, samples))

    with pltpu.force_tpu_interpret_mode():
        lpf1, lp1 = tfim_flip_log_probs(params, samples)
        lpf2_rev, lp2 = tfim_flip_log_probs(params, samples[:, ::-1])
    lpf2 = np.asarray(lpf2_rev)[:, ::-1]
    num = np.logaddexp(np.asarray(lpf1), lpf2)
    den = np.logaddexp(np.asarray(lp1), np.asarray(lp2))[:, None]
    ratio_sum = np.sum(np.exp(0.5 * (num - den)), axis=1)
    diag = np.asarray(jax.vmap(ham.diagonal)(samples))
    got = diag - bx * ratio_sum
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


@pytest.mark.slow
def test_spill_flip_kernels_match_resident(setup, monkeypatch):
    """The HBM-spilled-history variant (long chains, N=1000 class) must
    reproduce the VMEM-resident kernels exactly; forced here by shrinking
    the VMEM budget so a small case takes the spill path."""
    from rnnwavefunctions_tpu.ops import tfim_flip_kernel as tk

    ansatz, params, samples = setup
    with pltpu.force_tpu_interpret_mode():
        r0, lp0 = tk.tfim_flip_ratio_sum(params, samples)
        lpf0, _ = tk.tfim_flip_log_probs(params, samples)

    monkeypatch.setattr(tk, "_VMEM_BUDGET", 40 * 1024)
    tile, spill = tk._pick_tile(ansatz.num_sites, ansatz.units)
    assert spill, "budget override must force the spill path"
    with pltpu.force_tpu_interpret_mode():
        r1, lp1 = tk.tfim_flip_ratio_sum(params, samples)
        lpf1, _ = tk.tfim_flip_log_probs(params, samples)
        s2, lp2, ratio2 = tk.tfim_sample_and_flip_sum(
            params, jnp.int32(3), 16, ansatz.num_sites
        )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpf1), np.asarray(lpf0), atol=1e-5)
    want_lp = np.asarray(ansatz._log_prob_plain_jnp(params, s2))
    np.testing.assert_allclose(np.asarray(lp2), want_lp, atol=1e-4)
