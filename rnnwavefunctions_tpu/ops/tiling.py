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

# Scoped-VMEM limit (KiB) forwarded to the TPU compiler by every jit in this
# package that can contain a fused Pallas kernel.  The compiler's scoped-vmem
# stack counts the kernel's footprint JOINTLY with whatever program-level
# allocations XLA overlaps with it (VMEM-pinned kernel outputs, prefetched
# operands of the next op) — measured ~5 MB of co-residency on the training
# step beyond the kernel's own (accurately accounted) footprint, which
# overflows the 16 MiB default at wide hidden sizes (U=256: kernel 13.65 MiB
# standalone, 18.96 MiB in-step).  v5e has 128 MiB of physical VMEM per
# core; 64 MiB leaves the kernels' 14 MiB-budget tiles far from the cliff
# while XLA still manages the remainder.
SCOPED_VMEM_LIMIT_KIB = 64 * 1024


def tpu_compiler_options():
    """``compiler_options`` for kernel-bearing jits: raises the scoped-VMEM
    limit on TPU backends, ``None`` (no options) elsewhere — the flag is
    TPU-only and would fail CPU compilation.  Called lazily at jit-build
    time (never at import) so it cannot initialize the backend before
    tests force the CPU platform."""
    import jax

    try:
        if jax.default_backend() == "tpu":
            return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_LIMIT_KIB}
    except Exception:
        pass
    return None


# Test hook: when True, the wavefront-group policies (`_group_for` in
# tfim_flip_kernel / mdrnn_flip_kernel) return their base group instead of
# the latency-scaled width.  Group width is a performance knob — it never
# changes kernel numerics — but interpret-mode emulation cost scales with
# it (~4x at t128/g32), so the fast test suite forces base groups and keeps
# one wide-group equality oracle per lane-packing family (marked
# `widegroup`) plus the real policy on the slow capacity variants.
FORCE_BASE_GROUP = False


def force_base_group() -> bool:
    return FORCE_BASE_GROUP


def round8(x: int) -> int:
    """Sublane padding: f32 VMEM blocks tile in (8, 128) units, so
    byte-accounting and buffer shapes round the second-minor dim to 8.
    One definition (it feeds every kernel's VMEM budget math) so a padding
    change cannot silently desynchronize accounting across modules."""
    return ((x + 7) // 8) * 8


def cap_tile(batch, max_tile: int) -> int:
    """Smallest power-of-two tile in [MIN_TILE, max_tile] covering the
    batch (``batch=None`` means unknown: use the full ``max_tile``)."""
    if batch is None:
        return max_tile
    cap = MIN_TILE
    while cap < min(batch, max_tile) and cap * 2 <= max_tile:
        cap *= 2
    return cap
