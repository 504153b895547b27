"""Native C++ Lanczos ED oracle vs the dense Python oracle."""

import numpy as np
import pytest

from rnnwavefunctions_tpu.ed import exact

native = pytest.importorskip("rnnwavefunctions_tpu.ed.native")


def test_tfim_lanczos_matches_dense():
    for n, bx in [(6, 1.0), (10, 0.7), (12, 2.0)]:
        want = exact.ground_state_energy(exact.tfim1d_dense(n, bx))
        got = native.tfim1d_ground_energy(n, bx)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_tfim_lanczos_custom_couplings():
    n = 8
    jz = np.linspace(0.5, 1.5, n - 1)
    want = exact.ground_state_energy(exact.tfim1d_dense(n, 1.0, jz))
    got = native.tfim1d_ground_energy(n, 1.0, jz)
    np.testing.assert_allclose(got, want, rtol=1e-9)


@pytest.mark.parametrize("periodic", [False, True])
@pytest.mark.parametrize("marshall", [False, True])
def test_j1j2_lanczos_matches_dense(periodic, marshall):
    n = 8
    want = exact.ground_state_energy(
        exact.j1j2_dense(n, 1.0, 0.3, 0.1, periodic=periodic,
                         marshall_sign=marshall)
    )
    got = native.j1j2_ground_energy(
        n, 1.0, 0.3, 0.1, periodic=periodic, marshall_sign=marshall
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_lanczos_beyond_dense_reach():
    """N=18 TFIM — far past practical dense eigh — runs in seconds and lands
    between the (monotonic in N) neighbouring known values."""
    e18 = native.tfim1d_ground_energy(18, 1.0)
    # per-site energy must be bracketed by the N=16 and N->inf values
    e16 = native.tfim1d_ground_energy(16, 1.0)
    assert e18 < e16  # more sites -> lower total energy
    assert -1.30 < e18 / 18 < -1.20  # thermodynamic limit is -4/pi = -1.273


def test_tfim2d_lanczos_matches_dense():
    for nx, ny, bx in [(3, 2, 1.0), (2, 4, 2.5), (3, 3, 3.0)]:
        want = exact.ground_state_energy(exact.tfim2d_dense(nx, ny, bx))
        got = native.tfim2d_ground_energy(nx, ny, bx)
        np.testing.assert_allclose(got, want, rtol=1e-9)
