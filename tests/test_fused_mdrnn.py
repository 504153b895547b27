"""Pallas fused MDRNN sweep kernels vs the jnp scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
from rnnwavefunctions_tpu.ops import fused_mdrnn


@pytest.fixture(params=[(3, 4), (4, 3)], ids=["3x4", "4x3"])
def setup(request):
    nx, ny = request.param
    ansatz = MDRNN2D(nx=nx, ny=ny, units=10, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = ansatz.sample(params, jax.random.PRNGKey(1), 29)
    return ansatz, params, samples


def test_mdrnn_kernel_matches_jnp(setup):
    """Non-square shapes exercise both row directions + boundary wiring."""
    ansatz, params, samples = setup
    want = np.asarray(ansatz._log_prob_jnp(params, samples))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mdrnn.mdrnn_log_prob(params, samples, ansatz.nx, ansatz.ny)
        )
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.slow
def test_mdrnn_kernel_grad_matches_jnp(setup):
    ansatz, params, samples = setup
    fn = fused_mdrnn.make_mdrnn_log_prob_fn(
        ansatz._log_prob_jnp, ansatz.nx, ansatz.ny
    )

    def loss_pallas(p):
        return jnp.sum(fn(p, samples))

    # grad fully inside interpret mode (fused Pallas BPTT backward)
    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(lambda p: jnp.sum(ansatz._log_prob_jnp(p, samples)))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_mdrnn_sampler_shape_and_consistency(setup):
    """PRNG is zero in interpret mode, but the sweep still emits the
    deterministic argmax-of-u=0 chain whose log-density must match the
    teacher-forced recompute of those very samples."""
    ansatz, params, _ = setup
    with pltpu.force_tpu_interpret_mode():
        samples, lp = fused_mdrnn.mdrnn_sample(
            params, jnp.int32(3), 16, ansatz.nx, ansatz.ny
        )
    assert samples.shape == (16, ansatz.nx, ansatz.ny)
    want = np.asarray(ansatz._log_prob_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want, atol=1e-4)


@pytest.mark.slow
def test_mdrnn_flip_kernel_matches_explicit_flips(setup):
    """Wavefront 2D flip estimator vs explicit single-site flips."""
    from rnnwavefunctions_tpu.ops.mdrnn_flip_kernel import mdrnn_flip_ratio_sum

    ansatz, params, samples = setup
    with pltpu.force_tpu_interpret_mode():
        ratio_sum, lp = mdrnn_flip_ratio_sum(
            params, samples, ansatz.nx, ansatz.ny
        )
    want_lp = np.asarray(ansatz._log_prob_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)

    la = 0.5 * want_lp
    total = np.zeros(samples.shape[0])
    s_np = np.asarray(samples)
    for x in range(ansatz.nx):
        for y in range(ansatz.ny):
            flipped = s_np.copy()
            flipped[:, x, y] = 1 - flipped[:, x, y]
            laf = 0.5 * np.asarray(
                ansatz._log_prob_jnp(params, jnp.asarray(flipped))
            )
            total += np.exp(laf - la)
    np.testing.assert_allclose(np.asarray(ratio_sum), total, rtol=2e-4)


@pytest.mark.slow
def test_mdrnn_sample_and_flip_consistent():
    """Fused sample+flip sweep: drawn samples' log-probs and ratio sums
    match independent recomputation (PRNG is zero in interpret mode — the
    deterministic chain still exercises the full fused path)."""
    from rnnwavefunctions_tpu.ops.mdrnn_flip_kernel import (
        mdrnn_flip_ratio_sum, mdrnn_sample_and_flip_sum,
    )

    nx, ny = 5, 5
    ansatz = MDRNN2D(nx=nx, ny=ny, units=8, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(7))
    with pltpu.force_tpu_interpret_mode():
        samples, lp, ratio = mdrnn_sample_and_flip_sum(
            params, jnp.int32(5), 12, nx, ny
        )
        ratio2, lp2 = mdrnn_flip_ratio_sum(params, samples, nx, ny)
    assert samples.shape == (12, nx, ny)
    want_lp = np.asarray(ansatz._log_prob_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(ratio2),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-5)


@pytest.mark.slow
def test_mdrnn_spill_flip_kernel_matches_resident(monkeypatch):
    """The row-window HBM-spilled 2D history variant (large lattices) must
    reproduce the VMEM-resident kernel exactly; forced here by shrinking
    the budget so a small lattice takes the spill path.  5x4 exercises
    groups crossing lattice-row boundaries and a partial last group."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    nx, ny = 5, 4
    ansatz = MDRNN2D(nx=nx, ny=ny, units=9, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(31))
    samples = ansatz.sample(params, jax.random.PRNGKey(32), 21)

    with pltpu.force_tpu_interpret_mode():
        r0, lp0 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    tile0, spill0 = mk._pick_tile(nx, ny, 9, 21)
    assert not spill0

    monkeypatch.setattr(mk, "_VMEM_BUDGET", 0)
    tile, spill = mk._pick_tile(nx, ny, 9, 21)
    assert spill, "budget override must force the spill path"
    with pltpu.force_tpu_interpret_mode():
        r1, lp1 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
        s2, lp2, ratio2 = mk.mdrnn_sample_and_flip_sum(
            params, jnp.int32(3), 16, nx, ny
        )
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=1e-5)
    want_lp = np.asarray(ansatz._log_prob_jnp(params, s2))
    np.testing.assert_allclose(np.asarray(lp2), want_lp, atol=1e-4)


@pytest.mark.slow
@pytest.mark.widegroup
def test_mdrnn_wide_group_matches_base(monkeypatch):
    """group=16 wavefront (the latency-scaled pick on large lattices, e.g.
    32x32 t128) vs the base g8 kernel and the explicit jnp log-prob.  Test
    lattices are all NS-capped to g8 under the real policy, so the
    group-dependent code (lane-indexed f_lane mapping, partial last group,
    group-scaled row buffer) is forced here on a small 5x4 lattice —
    group width must never change numerics within a regime."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    nx, ny, u = 5, 4, 9
    ansatz = MDRNN2D(nx=nx, ny=ny, units=u, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(41))
    samples = ansatz.sample(params, jax.random.PRNGKey(42), 21)

    with pltpu.force_tpu_interpret_mode():
        r8, lp8 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)

    # resident, wide group (partial last group: 20 sites over g16)
    monkeypatch.setattr(mk, "_pick", lambda *a, **k: (128, False, 16))
    with pltpu.force_tpu_interpret_mode():
        r16, lp16 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    np.testing.assert_allclose(np.asarray(r16), np.asarray(r8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp16), np.asarray(lp8), atol=1e-5)

    want_lp = np.asarray(ansatz._log_prob_jnp(params, samples))
    np.testing.assert_allclose(np.asarray(lp16), want_lp, atol=1e-4)


@pytest.mark.slow
@pytest.mark.widegroup
def test_mdrnn_wide_group_spill_matches_base(monkeypatch):
    """The spill x wide-group combination (row-window staging with a
    group-scaled row buffer) against the resident base-group kernel."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    nx, ny, u = 5, 4, 9
    ansatz = MDRNN2D(nx=nx, ny=ny, units=u, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(41))
    samples = ansatz.sample(params, jax.random.PRNGKey(42), 21)

    with pltpu.force_tpu_interpret_mode():
        r8, lp8 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)

    monkeypatch.setattr(mk, "_pick", lambda *a, **k: (128, True, 16))
    with pltpu.force_tpu_interpret_mode():
        rs, lps = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(r8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lps), np.asarray(lp8), atol=1e-5)


def test_mdrnn_flip_pack_matches_unpacked(monkeypatch):
    """Flip-pair lane packing (small batches, 2B <= tile) vs the unpacked
    kernel and the jnp log-prob.  3x3 (9 flips over fpg=16: odd flip count,
    the last block's upper half must be masked out) and 3x4 (even)."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    for nx, ny, seed in ((3, 3, 51), (3, 4, 52)):
        ansatz = MDRNN2D(nx=nx, ny=ny, units=9, impl="jnp")
        params = ansatz.init(jax.random.PRNGKey(seed))
        samples = ansatz.sample(params, jax.random.PRNGKey(seed + 1), 19)

        assert mk._pack_for(19, 128)  # the production decision for 2B <= T
        with pltpu.force_tpu_interpret_mode():
            rp, lpp = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)

        monkeypatch.setattr(mk, "_pack_for", lambda b, t: False)
        with pltpu.force_tpu_interpret_mode():
            ru, lpu = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
        monkeypatch.undo()

        np.testing.assert_allclose(np.asarray(rp), np.asarray(ru), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lpp), np.asarray(lpu),
                                   atol=1e-5)
        want_lp = np.asarray(ansatz._log_prob_jnp(params, samples))
        np.testing.assert_allclose(np.asarray(lpp), want_lp, atol=1e-4)


@pytest.mark.slow
def test_mdrnn_flip_pack_spill_sample_mode(monkeypatch):
    """pack x row-window spill, teacher-forced AND fused sample mode."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    nx, ny = 4, 5
    ansatz = MDRNN2D(nx=nx, ny=ny, units=9, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(61))
    samples = ansatz.sample(params, jax.random.PRNGKey(62), 23)

    monkeypatch.setattr(mk, "_pack_for", lambda b, t: False)
    with pltpu.force_tpu_interpret_mode():
        r0, lp0 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    monkeypatch.undo()

    monkeypatch.setattr(mk, "_pick", lambda *a, **k: (128, True, 8))
    with pltpu.force_tpu_interpret_mode():
        r1, lp1 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
        s2, lp2, ratio2 = mk.mdrnn_sample_and_flip_sum(
            params, jnp.int32(9), 13, nx, ny
        )
        ratio3, lp3 = mk.mdrnn_flip_ratio_sum(params, s2, nx, ny)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp0), atol=1e-5)
    want_lp = np.asarray(ansatz._log_prob_jnp(params, s2))
    np.testing.assert_allclose(np.asarray(lp2), want_lp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ratio2), np.asarray(ratio3),
                               rtol=1e-5)


@pytest.mark.slow
@pytest.mark.widegroup
def test_mdrnn_group24_matches_base(monkeypatch):
    """Non-power-of-two wavefront group (the 3g/4 candidate the 48x48 S=64
    spill config picks) against the base g8 kernel."""
    from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk

    nx, ny, u = 5, 6, 9
    ansatz = MDRNN2D(nx=nx, ny=ny, units=u, impl="jnp")
    params = ansatz.init(jax.random.PRNGKey(71))
    samples = ansatz.sample(params, jax.random.PRNGKey(72), 21)

    with pltpu.force_tpu_interpret_mode():
        r8, lp8 = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)

    # 30 sites over fpg=48 (packed): single partial group, and over g24
    # unpacked via _pack_for off: two groups with a partial last
    monkeypatch.setattr(mk, "_pick", lambda *a, **k: (128, True, 24))
    with pltpu.force_tpu_interpret_mode():
        rp, lpp = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    monkeypatch.setattr(mk, "_pack_for", lambda b, t: False)
    with pltpu.force_tpu_interpret_mode():
        ru, lpu = mk.mdrnn_flip_ratio_sum(params, samples, nx, ny)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(r8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ru), np.asarray(r8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lpp), np.asarray(lp8), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lpu), np.asarray(lp8), atol=1e-5)
