"""Wavefront kernel tile/spill selection: batch caps, VMEM budgets, and
regime-specific group accounting (pure host logic, no device)."""

import pytest

from rnnwavefunctions_tpu.ops import fused_gru_bwd as bk
from rnnwavefunctions_tpu.ops import j1j2_exchange_kernel as xk
from rnnwavefunctions_tpu.ops import mdrnn_flip_kernel as mk
from rnnwavefunctions_tpu.ops import tfim_flip_kernel as tk


def test_batch_cap_rounds_to_power_of_two_tiles():
    assert tk._batch_cap(None) == tk.FLIP_TILE
    assert tk._batch_cap(1) == 128
    assert tk._batch_cap(64) == 128
    assert tk._batch_cap(128) == 128
    assert tk._batch_cap(129) == 256
    assert tk._batch_cap(500) == 512
    assert tk._batch_cap(10_000) == tk.FLIP_TILE


def test_cap_tile_honors_non_power_of_two_max():
    # the [MIN_TILE, max_tile] contract must hold even for a 128-multiple
    # (non power-of-two) cap: never exceed max_tile
    from rnnwavefunctions_tpu.ops.tiling import cap_tile

    assert cap_tile(300, 384) == 256
    assert cap_tile(300, 512) == 512
    assert cap_tile(10_000, 384) == 256
    assert cap_tile(None, 384) == 384
    assert cap_tile(1, 384) == 128


@pytest.mark.widegroup
def test_flagship_configs_select_expected_tiles():
    # N=100 single layer at 50 units: resident, full 512 tile, base group
    assert tk._pick_tile(100, (50,), 500) == (512, False)
    assert tk._group_for(512, (50,), "gru", spill=False) == tk.GROUP
    # N=1000 at the 48 MiB budget stays VMEM-resident at the batch-capped
    # minimum tile, with the group widened against the serial-chain latency
    # floor (measured on par with the spilled g48 variant, +6% over g16)
    assert tk._pick_tile(1000, (50,), 64) == (128, False)
    assert tk._group_for(128, (50,), "gru", spill=False) == 32
    # wide hidden: the history still fits resident at t256, and the fat
    # (3U, U) advance matmul keeps the base group (g8 measured over g16)
    assert tk._pick_tile(100, (256,), 500) == (256, False)
    assert tk._group_for(256, (256,), "gru", spill=False) == tk.GROUP
    # 2-layer stack: double history, still resident
    tile, spill = tk._pick_tile(100, (50, 50), 500)
    assert not spill
    # far beyond the budget the spill regime engages with the wide group
    n_spill = 4000
    tile, spill = tk._pick_tile(n_spill, (50,), 64)
    assert spill and tile == 128
    assert tk._group_for(128, (50,), "gru", spill=True) == 48


def test_bptt_pick_tile_all_regimes():
    """The fused-BPTT tile pick across resident, spilled, and wide-hidden
    configs (the spill branch re-derives the batch cap — regression for a
    refactor that dropped it)."""
    assert bk._pick_tile(100, (50,), 500) == (512, False)
    tile, spill = bk._pick_tile(1000, (50,), 64)
    assert spill and tile == 128
    # wide hidden state: history blows the budget at every tile -> spill,
    # and the tile restarts from the batch cap, not the resident loop's 128
    tile, spill = bk._pick_tile(100, (256,), 500)
    assert spill and tile >= 128
    for u in (50, 128, 256):
        assert bk.supports(100, (u,))


def test_mdrnn_bwd_pick_large_lattices():
    """The 2D BPTT budget matches the flip kernels' 48 MiB (raised scoped-
    VMEM limit): the bench lattices ride the fused backward instead of the
    jnp scan-of-scans VJP (+26%/+19% full-step at 24x24/32x32 S=128,
    scripts/exp_scoped_budget.py mdrnn_bwd)."""
    from rnnwavefunctions_tpu.ops import fused_mdrnn_bwd as mbk

    for nx in (4, 6, 16, 24, 32, 40):
        assert mbk.supports(nx, nx, 50)
        assert mbk._pick(nx, nx, 50, 128) == (128, None)  # resident
    # small lattices still widen the tile to the batch cap (<= kernel TILE)
    from rnnwavefunctions_tpu.ops.fused_mdrnn import TILE as MDRNN_TILE

    assert mbk._pick_tile(6, 6, 50, 500) == MDRNN_TILE
    # beyond ~40x40 the (NS, U, T) history outgrows the budget even at the
    # minimum tile -> the row-chunk HBM spill takes over (multi-row chunks,
    # capped so the reverse sweep keeps >= 3 chunks in flight)
    for nx in (44, 48, 64):
        assert mbk.supports(nx, nx, 50)
        tile, crows = mbk._pick(nx, nx, 50, 128)
        assert tile == 128 and crows and 2 * crows < nx
        assert mbk._spill_bytes(nx, nx, 50, tile, crows) <= mbk._VMEM_BUDGET
    # joint accounting: history alone must not be the whole story
    assert mbk._base_bytes(32, 32, 50, 128) > 0


@pytest.mark.widegroup
def test_mdrnn_flip_group_candidates():
    """The 2D wavefront group ladder includes the 3g/4 step (g24 at 48x48
    S=64 spilled: measured +5% over g16; g32's row buffer misses the
    budget there), and every candidate is a multiple of 8 so G*T lanes
    stay 128-aligned."""
    assert mk._candidate_groups(128, 50, 48 * 48) == [32, 24, 16, 8]
    assert mk._pick(48, 48, 50, 64) == (128, True, 24)
    assert mk._pick(40, 40, 50, 64) == (128, True, 32)  # g32 still fits
    for g in mk._candidate_groups(128, 50, 48 * 48):
        assert g % 8 == 0


def test_exchange_regime_groups():
    # resident exchange configs run GROUP=8; spilled ones SPILL_GROUP=16
    assert xk._pick_tile(100, (50,), 500) == (512, False)
    # the 48 MiB budget keeps the N=1000 exchange history resident too
    # (measured identical to the spilled variant, 15.2 steps/s both ways —
    # the exchange estimator is bound elsewhere); the spill regime engages
    # far beyond the budget
    assert xk._pick_tile(1000, (50,), 64) == (128, False)
    assert xk._pick_tile(4000, (50,), 64) == (128, True)
    # the resident decision accounts with the resident group (8), which is
    # strictly cheaper than the spill group's footprint
    res8 = xk._resident_bytes(100, (50,), 512, xk.GROUP)
    res16 = xk._resident_bytes(100, (50,), 512, xk.SPILL_GROUP)
    assert res8 < res16
    assert tk._hist_bytes(100, (50,), 512) + res8 <= xk._VMEM_BUDGET


def test_supports_monotone_in_n():
    # spill coverage only depends on the resident pieces, so supports()
    # must be monotone: losing support at N implies no support beyond N
    for n in (100, 400, 1000, 2000):
        assert tk.supports(n, (50,))
        assert xk.supports(n, (50,))
    assert mk.supports(4, 4, 50) and mk.supports(18, 18, 50)
    # the 48 MiB budget keeps 2D histories resident through 32x32 at 50
    # units (+8% over the row-window spill measured at 24x24 S=128);
    # beyond that the history spills through the row window
    for nx, ny in ((18, 18), (24, 24), (32, 32)):
        assert mk._pick_tile(nx, ny, 50)[1] is False
    for nx, ny in ((40, 40), (48, 48)):
        tile, spill = mk._pick_tile(nx, ny, 50)
        assert mk.supports(nx, ny, 50) and spill
    assert not mk.supports(1, 36, 50)   # degenerate single-column lattice


def test_tpu_compiler_options_policy(monkeypatch):
    # On non-TPU backends the helper returns None (the scoped-vmem flag is
    # TPU-only and would fail CPU compilation); on TPU it forwards the raised
    # scoped limit that covers the training step's program-level co-residency
    # (kernel scratch + VMEM-pinned outputs + prefetched operands).
    import jax

    from rnnwavefunctions_tpu.ops import tiling

    assert tiling.tpu_compiler_options() is None  # conftest forces CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    opts = tiling.tpu_compiler_options()
    assert opts == {
        "xla_tpu_scoped_vmem_limit_kib": tiling.SCOPED_VMEM_LIMIT_KIB
    }
    assert tiling.SCOPED_VMEM_LIMIT_KIB * 1024 > 16 * 2**20
