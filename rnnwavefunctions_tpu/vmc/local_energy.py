"""In-graph local-energy estimation — the single estimator dispatch module.

The reference evaluates off-diagonal amplitude ratios by round-tripping every
training step through the host: build flip configurations in NumPy, feed them
back through ``sess.run`` in <=25k/30k-row chunks, contract on the host
(``/root/reference/1DTFIM/TrainingRNN_1DTFIM.py:42-74``,
``J1J2/TrainingRNN_J1J2.py:255-279``).  Here the whole estimator is one traced
function: vmapped connected-config expansion, one large batched log-amplitude
evaluation (optionally chunked with ``lax.map`` to bound device memory — the
TPU-native analogue of the reference's host-side chunk loop), and a masked
contraction.  It runs under ``stop_gradient``: local energies are data for the
surrogate loss, exactly like the reference's ``Eloc`` placeholder.

Dispatch to the fused Pallas wavefront kernels is decided **statically at
build time** (backend, layer count, VMEM reach are all known then), so fused
estimators carry no dead fallback branches and the trainer can skip the
separate base log-amplitude pass entirely: every fused kernel returns the
base-pass log-amp as a free by-product, surfaced as the third return value.

ONE set of predicates (``_select_family``) decides the kernel family for
BOTH consumers:

* ``make_local_energy_fn``       — teacher-forced estimator (takes samples);
* ``make_fused_sample_energy_fn`` — the trainer's single-launch
  sample-AND-estimate step (the sampling rollout doubles as the wavefront
  base pass, the one-pass-per-step structure of the reference loops,
  ``Training2DRNN_2DTFIM.py:199``/``TrainingRNN_J1J2.py:247``, without the
  host ping-pong).

so the trainer and the standalone estimator cannot disagree about which
path a configuration takes (tests/test_estimator_dispatch.py).

Complex wavefunctions are handled **without complex dtypes**: log psi is a
real pair (Re, Im) and the ratio contraction uses
``exp(dRe) * (cos(dIm), sin(dIm))`` — some TPU backends do not implement
complex64, and XLA lowers it to real pairs regardless.  Local energies are
returned as ``(e_re, e_im, log_amp)``; ``e_im`` is ``None`` for real ansatze.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def _chunked_apply(fn: Callable, flat: jax.Array, chunk_size: Optional[int]):
    """Apply ``fn`` (returning an array or tuple of arrays with the same
    leading axis) over the leading axis of ``flat`` in fixed-size chunks via
    ``lax.map`` (static chunk count; tail padded with row 0 and discarded)."""
    total = flat.shape[0]
    if chunk_size is None or chunk_size >= total:
        return fn(flat)
    num_chunks = -(-total // chunk_size)
    padded = num_chunks * chunk_size
    if padded != total:
        pad = jnp.broadcast_to(flat[:1], (padded - total,) + flat.shape[1:])
        flat = jnp.concatenate([flat, pad], axis=0)
    chunks = flat.reshape((num_chunks, chunk_size) + flat.shape[1:])
    out = jax.lax.map(fn, chunks)
    return jax.tree.map(
        lambda o: o.reshape((padded,) + o.shape[2:])[:total], out
    )


def _flip_kernel_ok(ansatz, hamiltonian, encoding: str) -> bool:
    """Static gate for the wavefront single-flip kernels (pRNN family)."""
    flip_element = getattr(hamiltonian, "uniform_flip_element", None)
    if (
        flip_element is None
        or flip_element == 0.0
        or getattr(hamiltonian, "encoding", "flat") != encoding
        or not hasattr(ansatz, "_use_pallas")
        or not ansatz._kernelizable()
        or not ansatz._use_pallas()
    ):
        return False
    from ..ops import tfim_flip_kernel

    return tfim_flip_kernel.supports(
        ansatz.num_sites, ansatz.units, getattr(ansatz, "cell", "gru")
    )


def _select_family(ansatz: Any, hamiltonian: Any) -> Optional[str]:
    """The one set of static predicates deciding the fused kernel family:
    ``"plain_flip"`` (positive pRNN + flat TFIM), ``"parity_flip"``
    (parity-symmetrized density), ``"mdrnn_flip"`` (2D MDRNN + grid TFIM),
    ``"exchange"`` (cRNN + J1-J2 spin exchange), or None (generic
    connected-configs estimator)."""
    is_complex = getattr(ansatz, "is_complex", False)
    flip_element = getattr(hamiltonian, "uniform_flip_element", None)

    if (
        getattr(ansatz, "plain_positive", False)
        and not is_complex
        and type(ansatz).__name__ != "MDRNN2D"
        and _flip_kernel_ok(ansatz, hamiltonian, "flat")
    ):
        return "plain_flip"

    if getattr(ansatz, "parity", False) and _flip_kernel_ok(
        ansatz, hamiltonian, "flat"
    ):
        return "parity_flip"

    if (
        flip_element is not None
        and flip_element != 0.0
        and getattr(hamiltonian, "encoding", None) == "grid"
        and type(ansatz).__name__ == "MDRNN2D"
        and hasattr(ansatz, "_use_pallas")
        and ansatz._kernelizable()
        and ansatz._use_pallas()
    ):
        from ..ops import mdrnn_flip_kernel

        if mdrnn_flip_kernel.supports(ansatz.nx, ansatz.ny, ansatz.units):
            return "mdrnn_flip"
        return None

    exch = getattr(hamiltonian, "exchange_kernel_info", None)
    if (
        exch is not None
        and is_complex
        and hasattr(ansatz, "_use_pallas")
        and ansatz._kernelizable()
        and ansatz._use_pallas()
    ):
        from ..ops import j1j2_exchange_kernel

        if j1j2_exchange_kernel.supports(ansatz.num_sites, ansatz.units):
            return "exchange"
    return None


def _parity_energy(hamiltonian, samples, lpf1, lp1, lpf2_rev, lp2):
    """Shared parity-symmetrized contraction: combine forward and reversed
    per-flip log-probs BEFORE the ratio (the symmetrized density of
    ``RNNwavefunction_paritysym.py:145``).  Flip of site i in the original
    chain is the flip of site N-1-i in the reversed chain.  Returns
    (e_re, None, symmetrized base log psi)."""
    flip_element = hamiltonian.uniform_flip_element
    lpf2 = lpf2_rev[:, ::-1]
    num = jnp.logaddexp(lpf1, lpf2)            # (B, N), + const
    den = jnp.logaddexp(lp1, lp2)              # same const cancels
    ratio_sum = jnp.sum(jnp.exp(0.5 * (num - den[:, None])), axis=1)
    diag = jax.vmap(hamiltonian.diagonal)(samples)
    # symmetrized base log psi = 0.5 log(0.5 (p1 + p2)) — free here
    la = 0.5 * (den - jnp.log(2.0))
    return diag + flip_element * ratio_sum, None, la


def make_local_energy_fn(
    ansatz: Any,
    hamiltonian: Any,
    chunk_size: Optional[int] = None,
) -> Callable:
    """Returns ``local_energy(params, samples, log_amp_samples=None) ->
    (e_re, e_im | None, log_amp)``.

    ``log_amp_samples`` is log psi of the drawn samples (the denominator of
    every amplitude ratio, ``TrainingRNN_1DTFIM.py:74`` /
    ``TrainingRNN_J1J2.py:279``) — a real array for positive ansatze, an
    ``(Re, Im)`` pair for complex ones.  The returned function carries a
    ``needs_log_amp`` attribute: the generic path requires it; the fused
    kernel paths compute the base pass in-kernel, ignore the argument, and
    return the base log-amp by-product as the third output (the generic path
    passes ``log_amp_samples`` through), so callers never pay a separate
    rollout for the ratio denominators.
    """
    family = _select_family(ansatz, hamiltonian)
    is_complex = getattr(ansatz, "is_complex", False)
    flip_element = getattr(hamiltonian, "uniform_flip_element", None)

    # ---- fused triangular single-flip path (TFIM + pRNN family on TPU):
    # O(N^2/2) site steps, no flip-matrix materialization.
    if family == "plain_flip":
        from ..ops.tfim_flip_kernel import tfim_flip_ratio_sum

        def local_energy_fused(params, samples, log_amp_samples=None):
            diag = jax.vmap(hamiltonian.diagonal)(samples)
            ratio_sum, lp = tfim_flip_ratio_sum(params, samples)
            return diag + flip_element * ratio_sum, None, 0.5 * lp

        local_energy_fused.needs_log_amp = False
        return local_energy_fused

    # ---- fused parity-symmetrized single-flip path: per-flip log-probs of
    # the forward AND reversed chains, combined by ``_parity_energy``.
    if family == "parity_flip":
        from ..ops.tfim_flip_kernel import tfim_flip_log_probs

        def local_energy_parity(params, samples, log_amp_samples=None):
            lpf1, lp1 = tfim_flip_log_probs(params, samples)
            lpf2_rev, lp2 = tfim_flip_log_probs(params, samples[:, ::-1])
            return _parity_energy(
                hamiltonian, samples, lpf1, lp1, lpf2_rev, lp2
            )

        local_energy_parity.needs_log_amp = False
        return local_energy_parity

    # ---- fused wavefront flip path for the 2D MDRNN (grid-encoded TFIM).
    if family == "mdrnn_flip":
        from ..ops import mdrnn_flip_kernel

        def local_energy_mdrnn(params, samples, log_amp_samples=None):
            diag = jax.vmap(hamiltonian.diagonal)(samples)
            ratio_sum, lp = mdrnn_flip_kernel.mdrnn_flip_ratio_sum(
                params, samples, ansatz.nx, ansatz.ny
            )
            return diag + flip_element * ratio_sum, None, 0.5 * lp

        local_energy_mdrnn.needs_log_amp = False
        return local_energy_mdrnn

    # ---- fused triangular spin-exchange path (J1-J2 + cRNN stacks).
    if family == "exchange":
        from ..ops.j1j2_exchange_kernel import j1j2_exchange_offdiag

        exch = hamiltonian.exchange_kernel_info

        def local_energy_exchange(params, samples, log_amp_samples=None):
            diag = jax.vmap(hamiltonian.diagonal)(samples)
            e_re, e_im, lp_re, lp_im = j1j2_exchange_offdiag(
                params,
                samples,
                u1=ansatz.u1,
                el_nn=exch["el_nn"],
                el_nnn=exch["el_nnn"],
                has_nnn=exch["has_nnn"],
                periodic=exch["periodic"],
            )
            return diag + e_re, e_im, (lp_re, lp_im)

        local_energy_exchange.needs_log_amp = False
        return local_energy_exchange

    # ---- generic connected-configs path -----------------------------------
    def local_energy(params, samples, log_amp_samples):
        diag, flips, elements, mask = jax.vmap(hamiltonian.connected)(samples)
        s, k = flips.shape[0], flips.shape[1]
        flat = flips.reshape((s * k,) + flips.shape[2:])

        if is_complex:
            la_re, la_im = _chunked_apply(
                lambda c: ansatz.log_amp_parts(params, c), flat, chunk_size
            )
            la_re = la_re.reshape(s, k)
            la_im = la_im.reshape(s, k)
            s_re, s_im = log_amp_samples
            d_re = la_re - s_re[:, None]
            d_im = la_im - s_im[:, None]
            mag = jnp.exp(d_re)
            el = elements.astype(mag.dtype)
            w = jnp.where(mask, el * mag, 0.0)
            off_re = jnp.sum(w * jnp.cos(d_im), axis=1)
            off_im = jnp.sum(w * jnp.sin(d_im), axis=1)
            return (
                diag.astype(off_re.dtype) + off_re,
                off_im,
                log_amp_samples,
            )

        la = _chunked_apply(
            lambda c: ansatz.log_amp(params, c), flat, chunk_size
        ).reshape(s, k)
        ratios = jnp.exp(la - log_amp_samples[:, None])
        contrib = elements.astype(ratios.dtype) * ratios
        offdiag = jnp.sum(jnp.where(mask, contrib, 0.0), axis=1)
        return diag.astype(offdiag.dtype) + offdiag, None, log_amp_samples

    local_energy.needs_log_amp = True
    return local_energy


def make_fused_sample_energy_fn(ansatz: Any, hamiltonian: Any):
    """Single-kernel sample + local-energy step for the trainer, selected by
    the SAME ``_select_family`` predicates as ``make_local_energy_fn``.
    Returns ``fused(params, key, num_samples) -> (samples, log_amp, e_re,
    e_im)`` or None when no fused kernel applies.  Covers all four reference
    workloads: plain/parity TFIM pRNN, grid-TFIM MDRNN, and J1-J2 cRNN."""
    from ..ops.seeding import seed_from_key

    family = _select_family(ansatz, hamiltonian)
    if family is None:
        return None
    flip_element = getattr(hamiltonian, "uniform_flip_element", None)

    if family == "plain_flip":
        from ..ops import tfim_flip_kernel as tk

        n = ansatz.num_sites

        def fused_plain(params, key, num_samples):
            samples, lp, ratio = tk.tfim_sample_and_flip_sum(
                params, seed_from_key(key), num_samples, n
            )
            diag = jax.vmap(hamiltonian.diagonal)(samples)
            return samples, 0.5 * lp, diag + flip_element * ratio, None

        return fused_plain

    # parity-symmetrized pRNN: the sample+per-flip launch covers the
    # forward chain; one teacher-forced per-flip launch covers the
    # reversed chain (sampling stays plain, as in the reference —
    # RNNwavefunction_paritysym.py symmetrizes only the density).
    if family == "parity_flip":
        from ..ops import tfim_flip_kernel as tk

        n = ansatz.num_sites

        def fused_parity(params, key, num_samples):
            samples, lp1, lpf1 = tk.tfim_sample_and_flip_sum(
                params, seed_from_key(key), num_samples, n, per_flip=True
            )
            lpf2_rev, lp2 = tk.tfim_flip_log_probs(params, samples[:, ::-1])
            e_re, e_im, la = _parity_energy(
                hamiltonian, samples, lpf1, lp1, lpf2_rev, lp2
            )
            return samples, la, e_re, e_im

        return fused_parity

    if family == "mdrnn_flip":
        from ..ops import mdrnn_flip_kernel as mk

        nx, ny = ansatz.nx, ansatz.ny

        def fused_mdrnn(params, key, num_samples):
            samples, lp, ratio = mk.mdrnn_sample_and_flip_sum(
                params, seed_from_key(key), num_samples, nx, ny
            )
            diag = jax.vmap(hamiltonian.diagonal)(samples)
            return samples, 0.5 * lp, diag + flip_element * ratio, None

        return fused_mdrnn

    # family == "exchange"
    from ..ops.j1j2_exchange_kernel import j1j2_sample_and_exchange

    exch = hamiltonian.exchange_kernel_info
    n = ansatz.num_sites

    def fused_j1j2(params, key, num_samples):
        samples, e_re, e_im, lp_re, lp_im = j1j2_sample_and_exchange(
            params,
            seed_from_key(key),
            num_samples,
            n,
            u1=ansatz.u1,
            el_nn=exch["el_nn"],
            el_nnn=exch["el_nnn"],
            has_nnn=exch["has_nnn"],
            periodic=exch["periodic"],
        )
        diag = jax.vmap(hamiltonian.diagonal)(samples)
        return samples, (lp_re, lp_im), diag + e_re, e_im

    return fused_j1j2
