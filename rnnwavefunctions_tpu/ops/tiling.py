"""Shared batch-tile policy for the fused kernels.

Every Pallas kernel in this package tiles the Monte-Carlo batch onto the
TPU lane dimension, so tiles must be multiples of the 128-lane minimum and
tiles wider than the actual batch only compute padding lanes (at the
small-sample spill configurations, e.g. N=1000 S=64, an uncapped 512-tile
was measured 1.8x slower than the capped kernel).  `cap_tile` is the one
definition of that policy — the rollout (`fused_gru`), flip-estimator
(`tfim_flip_kernel`), and BPTT (`fused_gru_bwd`) kernels all size their
tiles through it so they can never pick inconsistent caps.
"""

MIN_TILE = 128  # Pallas TPU lane-dim block minimum


def cap_tile(batch, max_tile: int) -> int:
    """Smallest power-of-two tile in [MIN_TILE, max_tile] covering the
    batch (``batch=None`` means unknown: use the full ``max_tile``)."""
    if batch is None:
        return max_tile
    cap = MIN_TILE
    while cap < min(batch, max_tile) and cap * 2 <= max_tile:
        cap *= 2
    return cap
