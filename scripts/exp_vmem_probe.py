"""Measure the TRUE scoped-VMEM footprint of each fused kernel shape.

The Mosaic scoped-vmem stack is what the TPU compiler actually allocates for
a `pallas_call` — kernel scratch PLUS the (double-buffered) in/out windows
and lane-padded weight blocks.  The kernels' `_pick_tile`/`supports`
accounting models this; this probe calibrates the model against ground
truth: compile each shape with an absurdly small
``xla_tpu_scoped_vmem_limit_kib`` so the compiler errors out and REPORTS the
exact requested size ("Scoped allocation with size X and limit Y").

Run from /root/repo (no PYTHONPATH — it breaks the TPU plugin):
    timeout 580 python scripts/exp_vmem_probe.py
"""

import re
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from rnnwavefunctions_tpu.ops import tfim_flip_kernel as tk
from rnnwavefunctions_tpu.ops import fused_gru_bwd as bk
from rnnwavefunctions_tpu.models.prnn1d import PRNN1D

TINY_KIB = 2048  # small enough that every real kernel overflows and reports


def _probe(fn, args, label):
    try:
        lowered = jax.jit(fn).lower(*args)
        lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": TINY_KIB}
        )
        print(f"{label}: fits under {TINY_KIB} KiB (?!)")
    except Exception as e:  # noqa: BLE001
        m = re.search(r"Scoped allocation with size ([0-9.]+)M", str(e))
        if m:
            print(f"{label}: true scoped usage {m.group(1)} MiB")
        else:
            print(f"{label}: no size in error: {str(e)[:200]}")


def probe_flip(n, u, s, force=None, label=""):
    ansatz = PRNN1D(num_sites=n, units=(u,))
    params = ansatz.init(jax.random.PRNGKey(0))
    if force is not None:
        orig = tk._pick_tile
        tk._pick_tile = lambda *a, **kw: force
    try:
        tile, spill = tk._pick_tile(n, (u,), s)
        acct = (
            (0 if spill else tk._hist_bytes(n, (u,), tile))
            + tk._resident_bytes(
                n, (u,), tile, tk.SPILL_GROUP if spill else tk.GROUP
            )
            + (
                tk._spill_extra_bytes(n, (u,), tile, tk.SPILL_GROUP)
                if spill
                else 0
            )
        ) / 2**20
        _probe(
            lambda seed: tk.tfim_sample_and_flip_sum(params, seed, s, n),
            (jnp.zeros((), jnp.int32),),
            f"flip {label} N={n} U={u} S={s} tile={tile} spill={spill} "
            f"acct={acct:.2f}M",
        )
    finally:
        if force is not None:
            tk._pick_tile = orig


def probe_bwd(n, u, s, label=""):
    ansatz = PRNN1D(num_sites=n, units=(u,))
    params = ansatz.init(jax.random.PRNGKey(0))
    samples = jnp.zeros((s, n), jnp.int32)
    lp = ansatz.make_log_prob_fn()

    def loss(p):
        return jnp.sum(lp(p, samples))

    _probe(
        jax.grad(loss),
        (params,),
        f"bwd {label} N={n} U={u} S={s}",
    )


if __name__ == "__main__":
    probe_flip(100, 50, 500, label="flagship")
    probe_flip(100, 256, 256, label="u256-default")
    probe_flip(100, 256, 256, force=(128, True), label="u256-forced-spill")
    probe_flip(1000, 50, 64, label="n1000")
    probe_bwd(100, 50, 500, label="flagship")
    probe_bwd(100, 256, 256, label="u256")
    probe_bwd(1000, 50, 64, label="n1000")
