"""Pallas fused cRNN kernels vs the jnp reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnnwavefunctions_tpu.models.crnn_u1 import CRNNU1
from rnnwavefunctions_tpu.ops import fused_crnn


@pytest.fixture(params=[True, False], ids=["u1", "no_u1"])
def setup(request):
    u1 = request.param
    ansatz = CRNNU1(num_sites=10, units=(12,), u1=u1, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 41)
    return ansatz, params, samples


def test_crnn_log_amp_matches_jnp(setup):
    ansatz, params, samples = setup
    want_re, want_im = ansatz._log_amp_parts_jnp(params, samples)
    with pltpu.force_tpu_interpret_mode():
        got_re, got_im = fused_crnn.crnn_log_amp_parts(
            params, samples, ansatz.u1
        )
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im), atol=1e-4)


def test_crnn_log_amp_zero_outside_sector():
    """Kernel must assign (finite stand-in for) -inf Re log psi to configs
    outside the zero-magnetization sector, matching the jnp masking."""
    ansatz = CRNNU1(num_sites=8, units=(10,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(2))
    bad = jnp.ones((4, 8), jnp.int32)  # magnetization 8 != 4
    with pltpu.force_tpu_interpret_mode():
        re, _ = fused_crnn.crnn_log_amp_parts(params, bad, True)
    assert np.all(np.asarray(re) < -1e6)


def test_crnn_grad_matches_jnp(setup):
    ansatz, params, samples = setup
    fn = fused_crnn.make_log_amp_parts_fn(
        ansatz._log_amp_parts_jnp, ansatz.u1
    )

    def loss_pallas(p):
        re, im = fn(p, samples)
        return jnp.sum(re) + 0.5 * jnp.sum(im)

    def loss_jnp(p):
        re, im = ansatz._log_amp_parts_jnp(p, samples)
        return jnp.sum(re) + 0.5 * jnp.sum(im)

    # grad fully inside interpret mode (fused Pallas BPTT backward)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_jnp)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_j1j2_exchange_kernel_matches_generic():
    """Triangular exchange kernel vs the generic padded-connected estimator
    (interpret mode)."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
        j1j2_exchange_offdiag,
    )
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n = 10
    ansatz = CRNNU1(num_sites=n, units=(10,), impl="jnp")
    ham = J1J2(num_sites=n, j1=1.0, j2=0.3, marshall_sign=True)
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 33)

    le = make_local_energy_fn(ansatz, ham)
    want_re, want_im, _ = le(params, samples, ansatz.log_amp_parts(params, samples))

    info = ham.exchange_kernel_info
    with pltpu.force_tpu_interpret_mode():
        e_re, e_im, lp_re, lp_im = j1j2_exchange_offdiag(
            params, samples, u1=True, el_nn=info["el_nn"],
            el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
        )
    diag = jax.vmap(ham.diagonal)(samples)
    got_re = np.asarray(diag + e_re)
    got_im = np.asarray(e_im)
    np.testing.assert_allclose(got_re, np.asarray(want_re), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(got_im, np.asarray(want_im), rtol=2e-4, atol=1e-4)
    # base log-amp by-products
    wre, wim = ansatz._log_amp_parts_jnp(params, samples)
    np.testing.assert_allclose(np.asarray(lp_re), np.asarray(wre), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp_im), np.asarray(wim), atol=1e-4)


@pytest.mark.slow
def test_j1j2_sample_and_exchange_consistent():
    """Fused sample+exchange kernel: the drawn batch's off-diagonal sums and
    base log-amps match the teacher-forced exchange kernel, and every drawn
    configuration satisfies the U(1) zero-magnetization constraint."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
        j1j2_exchange_offdiag, j1j2_sample_and_exchange,
    )

    n = 10
    ansatz = CRNNU1(num_sites=n, units=(8,), impl="jnp")
    ham = J1J2(num_sites=n, j2=0.2)
    info = ham.exchange_kernel_info
    params = ansatz.init(jax.random.PRNGKey(3))
    with pltpu.force_tpu_interpret_mode():
        samples, e_re, e_im, lp_re, lp_im = j1j2_sample_and_exchange(
            params, jnp.int32(9), 16, n, u1=True,
            el_nn=info["el_nn"], el_nnn=info["el_nnn"],
            has_nnn=info["has_nnn"],
        )
        e_re2, e_im2, lp_re2, lp_im2 = j1j2_exchange_offdiag(
            params, samples, u1=True, el_nn=info["el_nn"],
            el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
        )
    # U(1): exactly N/2 up spins per sample (enforced in-kernel)
    np.testing.assert_array_equal(np.asarray(samples).sum(axis=1), n // 2)
    want_re, want_im = ansatz._log_amp_parts_jnp(params, samples)
    np.testing.assert_allclose(np.asarray(lp_re), np.asarray(want_re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp_im), np.asarray(want_im), atol=1e-4)
    for a, b in [(e_re, e_re2), (e_im, e_im2), (lp_re, lp_re2), (lp_im, lp_im2)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_j1j2_periodic_exchange_matches_generic():
    """Periodic chains: the wrap-bond wavefront block must reproduce the
    generic connected-configs estimator (all 2N padded exchanges)."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
        j1j2_exchange_offdiag,
    )
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n = 8
    for j2, marshall in [(0.3, False), (0.0, True)]:
        ansatz = CRNNU1(num_sites=n, units=(8,), impl="jnp")
        ham = J1J2(num_sites=n, j2=j2, periodic=True, marshall_sign=marshall)
        params = ansatz.init(jax.random.PRNGKey(4))
        samples = ansatz.sample(params, jax.random.PRNGKey(5), 21)

        le = make_local_energy_fn(ansatz, ham)
        want_re, want_im, _ = le(
            params, samples, ansatz.log_amp_parts(params, samples)
        )

        info = ham.exchange_kernel_info
        with pltpu.force_tpu_interpret_mode():
            e_re, e_im, _, _ = j1j2_exchange_offdiag(
                params, samples, u1=True, el_nn=info["el_nn"],
                el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
                periodic=True,
            )
        diag = np.asarray(jax.vmap(ham.diagonal)(samples))
        np.testing.assert_allclose(
            diag + np.asarray(e_re), np.asarray(want_re), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(e_im), np.asarray(want_im), rtol=2e-4, atol=1e-5
        )


@pytest.mark.slow
def test_stacked_crnn_kernels_match_jnp():
    """2-layer cRNN trunk through all fused kernels: log-amp parts, sampler
    density, and the exchange estimator vs the generic path."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops import fused_crnn
    from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
        j1j2_exchange_offdiag, j1j2_sample_and_exchange,
    )
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    n = 8
    ansatz = CRNNU1(num_sites=n, units=(10, 10), impl="jnp")
    ham = J1J2(num_sites=n, j2=0.2)
    params = ansatz.init(jax.random.PRNGKey(11))
    samples = ansatz.sample(params, jax.random.PRNGKey(12), 19)

    want_re, want_im = ansatz._log_amp_parts_jnp(params, samples)
    with pltpu.force_tpu_interpret_mode():
        got_re, got_im = fused_crnn.crnn_log_amp_parts(params, samples, True)
        s2, lp2 = fused_crnn.crnn_sample(params, jnp.int32(5), 16, n, True)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im),
                               atol=1e-4)
    want_lp2 = 2.0 * np.asarray(ansatz._log_amp_parts_jnp(params, s2)[0])
    np.testing.assert_allclose(np.asarray(lp2), want_lp2, atol=1e-4)

    le = make_local_energy_fn(ansatz, ham)
    e_want_re, e_want_im, _ = le(
        params, samples, ansatz.log_amp_parts(params, samples)
    )
    info = ham.exchange_kernel_info
    with pltpu.force_tpu_interpret_mode():
        e_re, e_im, lp_re, lp_im = j1j2_exchange_offdiag(
            params, samples, u1=True, el_nn=info["el_nn"],
            el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
        )
        s3, e3_re, e3_im, lp3_re, lp3_im = j1j2_sample_and_exchange(
            params, jnp.int32(7), 12, n, u1=True, el_nn=info["el_nn"],
            el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
        )
    diag = np.asarray(jax.vmap(ham.diagonal)(samples))
    np.testing.assert_allclose(diag + np.asarray(e_re),
                               np.asarray(e_want_re), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_im), np.asarray(e_want_im),
                               rtol=2e-4, atol=1e-5)
    w3_re, w3_im = ansatz._log_amp_parts_jnp(params, s3)
    np.testing.assert_allclose(np.asarray(lp3_re), np.asarray(w3_re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp3_im), np.asarray(w3_im),
                               atol=1e-4)


@pytest.mark.slow
def test_spill_exchange_kernel_matches_resident(monkeypatch):
    """The HBM-spilled-history exchange variant (long chains) must reproduce
    the VMEM-resident kernel exactly; forced here by shrinking the VMEM
    budget so a small case takes the spill path.  Periodic wrap bonds
    exercise the static-index history reads too."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops import j1j2_exchange_kernel as xk

    n = 10
    ansatz = CRNNU1(num_sites=n, units=(8,), impl="jnp")
    ham = J1J2(num_sites=n, j2=0.2, periodic=True)
    info = ham.exchange_kernel_info
    params = ansatz.init(jax.random.PRNGKey(21))
    samples = ansatz.sample(params, jax.random.PRNGKey(22), 17)
    kw = dict(u1=True, el_nn=info["el_nn"], el_nnn=info["el_nnn"],
              has_nnn=info["has_nnn"], periodic=info["periodic"])

    with pltpu.force_tpu_interpret_mode():
        r0 = xk.j1j2_exchange_offdiag(params, samples, **kw)

    monkeypatch.setattr(xk, "_VMEM_BUDGET", 40 * 1024)
    # the shrunken budget also fails the public supports() guard (at this
    # tiny n the G16 spill wavefront is bigger than the history it evicts);
    # the guard protects real callers — bypass it to test the forced regime
    monkeypatch.setattr(xk, "supports", lambda *a, **k: True)
    tile, spill = xk._pick_tile(n, ansatz.units)
    assert spill, "budget override must force the spill path"
    # tile selection happens at trace time: drop the resident-traced entry
    xk.j1j2_exchange_offdiag.clear_cache()
    with pltpu.force_tpu_interpret_mode():
        r1 = xk.j1j2_exchange_offdiag(params, samples, **kw)
        s2, e2_re, e2_im, lp2_re, lp2_im = xk.j1j2_sample_and_exchange(
            params, jnp.int32(13), 16, n, **kw
        )
    for a, b in zip(r1, r0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s2).sum(axis=1), n // 2)
    w_re, w_im = ansatz._log_amp_parts_jnp(params, s2)
    np.testing.assert_allclose(np.asarray(lp2_re), np.asarray(w_re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp2_im), np.asarray(w_im), atol=1e-4)


@pytest.mark.parametrize("n", [9, pytest.param(11, marks=pytest.mark.slow)])
def test_crnn_u1_odd_n_semantics(n):
    """Odd chain lengths under the U(1) mask: the reference baseline
    N//2 - 1 (``ComplexRNNwavefunction.py:85-93``) makes zero magnetization
    impossible, so nearly every configuration is out of sector — the jnp
    reference path reports -inf amplitudes there while the fused kernel holds the finite
    LOG_ZERO stand-in (the documented divergence out of support,
    ``fused_crnn.make_log_amp_parts_fn``).  The samplers still emit one
    fixed sector.  Without the U(1) mask, odd chains are ordinary and the
    two paths agree exactly."""
    from rnnwavefunctions_tpu.ops.fused_crnn import LOG_ZERO

    a_j = CRNNU1(num_sites=n, units=(10,), impl="jnp")
    a_p = CRNNU1(num_sites=n, units=(10,), impl="pallas")
    params = a_j.init(jax.random.PRNGKey(41))
    samples = a_j.sample(params, jax.random.PRNGKey(42), 25)
    ups = np.asarray(samples).sum(axis=1)
    assert len(set(ups.tolist())) == 1  # one fixed magnetization sector

    want_re, _ = a_j._log_amp_parts_jnp(params, samples)
    with pltpu.force_tpu_interpret_mode():
        got_re, _ = a_p.log_amp_parts(params, samples)
        s2, _ = a_p.sample_with_log_prob(params, jax.random.PRNGKey(43), 16)
    want = np.asarray(want_re)
    got = np.asarray(got_re)
    finite = np.isfinite(want)
    assert np.isneginf(want[~finite]).all() and (~finite).sum() > 0
    np.testing.assert_allclose(got[finite], want[finite], atol=1e-4)
    assert np.all(got[~finite] <= 0.25 * LOG_ZERO)
    assert len(set(np.asarray(s2).sum(axis=1).tolist())) == 1


@pytest.mark.parametrize("n", [pytest.param(9, marks=pytest.mark.slow),
                               pytest.param(11, marks=pytest.mark.slow)])
def test_crnn_odd_n_no_u1_jnp_vs_fused(n):
    """Odd chains WITHOUT the U(1) constraint: jnp and fused paths agree on
    amplitudes and exchange energies."""
    from rnnwavefunctions_tpu.hamiltonians.j1j2 import J1J2
    from rnnwavefunctions_tpu.ops.j1j2_exchange_kernel import (
        j1j2_exchange_offdiag,
    )
    from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn

    a_j = CRNNU1(num_sites=n, units=(10,), u1=False, impl="jnp")
    a_p = CRNNU1(num_sites=n, units=(10,), u1=False, impl="pallas")
    params = a_j.init(jax.random.PRNGKey(41))
    samples = a_j.sample(params, jax.random.PRNGKey(42), 25)

    want_re, want_im = a_j._log_amp_parts_jnp(params, samples)
    with pltpu.force_tpu_interpret_mode():
        got_re, got_im = a_p.log_amp_parts(params, samples)
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(want_re),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(want_im),
                               atol=1e-4)

    ham = J1J2(num_sites=n, j2=0.2)
    le = make_local_energy_fn(a_j, ham)
    e_re, e_im, _ = le(params, samples, a_j.log_amp_parts(params, samples))
    info = ham.exchange_kernel_info
    with pltpu.force_tpu_interpret_mode():
        k_re, k_im, _, _ = j1j2_exchange_offdiag(
            params, samples, u1=False, el_nn=info["el_nn"],
            el_nnn=info["el_nnn"], has_nnn=info["has_nnn"],
        )
    diag = jax.vmap(ham.diagonal)(samples)
    np.testing.assert_allclose(np.asarray(diag + k_re), np.asarray(e_re),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k_im), np.asarray(e_im),
                               rtol=2e-4, atol=1e-4)


def test_crnn_grad_contract_in_sector_only():
    """Pins the documented backend divergence OUT of the U(1) sector
    (``fused_crnn.make_log_amp_parts_fn`` docstring; ADVICE r2): the jnp VJP
    propagates NaN from the -inf forward while the fused BPTT stays finite —
    safe only because no training path differentiates non-sampled configs.
    If either half of this test starts failing, that contract moved."""
    ansatz = CRNNU1(num_sites=8, units=(10,), impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(4))
    off = jnp.ones((4, 8), jnp.int32)  # magnetization 8: outside the sector

    def loss_jnp(p):
        re, im = ansatz._log_amp_parts_jnp(p, off)
        return jnp.sum(re) + 0.5 * jnp.sum(im)

    g_jnp = jax.grad(loss_jnp)(params)
    assert any(
        np.any(np.isnan(np.asarray(leaf))) for leaf in jax.tree.leaves(g_jnp)
    )

    fn = fused_crnn.make_log_amp_parts_fn(ansatz._log_amp_parts_jnp, True)

    def loss_fused(p):
        re, im = fn(p, off)
        return jnp.sum(re) + 0.5 * jnp.sum(im)

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused)(params)
    assert all(
        np.all(np.isfinite(np.asarray(leaf)))
        for leaf in jax.tree.leaves(g_fused)
    )

    # the sampler never draws off-sector configs, so the gradients training
    # actually requests are backend-independent (test_crnn_grad_matches_jnp
    # covers the equality; the sector guarantee is pinned here)
    draws = ansatz.sample(params, jax.random.PRNGKey(5), 64)
    assert np.all(np.asarray(jnp.sum(draws, axis=1)) == 4)
