"""Local-energy estimator path selection and Hamiltonian marker consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from rnnwavefunctions_tpu import CRNNU1, J1J2, PRNN1D, TFIM1D, TFIM2D
from rnnwavefunctions_tpu.models.prnn_snake2d import PRNNSnake2D
from rnnwavefunctions_tpu.vmc.local_energy import make_local_energy_fn


def test_tfim_diagonal_matches_connected():
    for ham, sigma in [
        (TFIM1D(num_sites=7, bx=1.3),
         jnp.asarray([0, 1, 1, 0, 1, 0, 0], jnp.int32)),
        (TFIM2D(nx=3, ny=2, bx=0.7, encoding="flat"),
         jnp.asarray([1, 0, 1, 1, 0, 0], jnp.int32)),
    ]:
        diag, *_ = ham.connected(sigma)
        np.testing.assert_allclose(
            float(ham.diagonal(sigma)), float(diag), rtol=1e-6
        )


def test_j1j2_diagonal_matches_connected():
    ham = J1J2(num_sites=8, j1=1.0, j2=0.4, bz=0.2)
    sigma = jnp.asarray([0, 1, 1, 0, 1, 0, 0, 1], jnp.int32)
    diag, *_ = ham.connected(sigma)
    np.testing.assert_allclose(float(ham.diagonal(sigma)), float(diag),
                               rtol=1e-6)


def test_exchange_marker_gating():
    assert J1J2(num_sites=8, j1=0.0).exchange_kernel_info is None
    info = J1J2(num_sites=8, j2=0.3, marshall_sign=True).exchange_kernel_info
    assert info == {"el_nn": -0.5, "el_nnn": 0.15, "has_nnn": True,
                    "periodic": False}
    assert not J1J2(num_sites=8, j2=0.0).exchange_kernel_info["has_nnn"]
    assert J1J2(num_sites=8, periodic=True).exchange_kernel_info["periodic"]


def test_fused_paths_fall_back_cleanly():
    """Configurations outside kernel coverage must still produce correct
    estimators (generic path), on any backend."""
    cases = [
        # multi-layer stack (has a fused TPU path; falls back on CPU)
        (PRNN1D(num_sites=6, units=(8, 8)), TFIM1D(num_sites=6, bx=1.0)),
        # parity has its own fused path on TPU; on CPU it must fall back
        (PRNN1D(num_sites=6, units=(8,), parity=True), TFIM1D(num_sites=6)),
        # periodic J1J2 (fused on TPU via the wrap-bond wavefront block)
        (CRNNU1(num_sites=6, units=(8,)),
         J1J2(num_sites=6, j2=0.2, periodic=True)),
        # grid-encoded 2D Hamiltonian has no flat flip kernel
        (PRNNSnake2D(nx=3, ny=2, units=(8,)),
         TFIM2D(nx=3, ny=2, bx=1.0, encoding="flat")),
    ]
    for ansatz, ham in cases:
        params = ansatz.init(jax.random.PRNGKey(0))
        samples = ansatz.sample(params, jax.random.PRNGKey(1), 8)
        le = make_local_energy_fn(ansatz, ham)
        if getattr(ansatz, "is_complex", False):
            la = ansatz.log_amp_parts(params, samples)
        else:
            la = ansatz.log_amp(params, samples)
        e_re, e_im, _ = le(params, samples, la)
        assert np.isfinite(np.asarray(e_re)).all()


def test_trainer_and_estimator_agree_on_dispatch():
    """``make_fused_sample_energy_fn`` (the trainer's single-launch step) and
    ``make_local_energy_fn`` both derive from the SAME ``_select_family``
    predicates — for every (ansatz, hamiltonian) combination the trainer gets
    a fused step iff the estimator took a fused path."""
    from rnnwavefunctions_tpu.models.mdrnn2d import MDRNN2D
    from rnnwavefunctions_tpu.vmc import local_energy as le

    cases = [
        (PRNN1D(num_sites=6, units=(8,), impl="pallas"),
         TFIM1D(num_sites=6, bx=1.0), "plain_flip"),
        (PRNN1D(num_sites=6, units=(8,), parity=True, impl="pallas"),
         TFIM1D(num_sites=6, bx=1.0), "parity_flip"),
        (PRNN1D(num_sites=6, units=(8,), impl="jnp"),
         TFIM1D(num_sites=6, bx=1.0), None),
        (PRNNSnake2D(nx=3, ny=2, units=(8,), impl="pallas"),
         TFIM2D(nx=3, ny=2, bx=1.0, encoding="flat"), "plain_flip"),
        (MDRNN2D(nx=3, ny=3, units=8, impl="pallas"),
         TFIM2D(nx=3, ny=3, bx=1.0, encoding="grid"), "mdrnn_flip"),
        (MDRNN2D(nx=3, ny=3, units=8, impl="jnp"),
         TFIM2D(nx=3, ny=3, bx=1.0, encoding="grid"), None),
        (CRNNU1(num_sites=6, units=(8,), impl="pallas"),
         J1J2(num_sites=6, j2=0.2), "exchange"),
        (CRNNU1(num_sites=6, units=(8,), impl="jnp"),
         J1J2(num_sites=6, j2=0.2), None),
        # zero transverse field: no single-flip kernel applies
        (PRNN1D(num_sites=6, units=(8,), impl="pallas"),
         TFIM1D(num_sites=6, bx=0.0), None),
        # LSTM stacks ride the same flip kernels ([h; c] state rows)
        (PRNN1D(num_sites=6, units=(8,), cell="lstm", impl="pallas"),
         TFIM1D(num_sites=6, bx=1.0), "plain_flip"),
        (PRNN1D(num_sites=6, units=(8,), cell="lstm", parity=True,
                impl="pallas"),
         TFIM1D(num_sites=6, bx=1.0), "parity_flip"),
        # custom cells run the generic path
        (PRNN1D(num_sites=6, units=(8,), cell=object(), impl="jnp"),
         TFIM1D(num_sites=6, bx=1.0), None),
    ]
    for ansatz, ham, want in cases:
        fam = le._select_family(ansatz, ham)
        assert fam == want, (type(ansatz).__name__, want, fam)
        fused = le.make_fused_sample_energy_fn(ansatz, ham)
        lef = le.make_local_energy_fn(ansatz, ham)
        assert (fused is not None) == (fam is not None)
        assert lef.needs_log_amp == (fam is None)
