"""Shared training-loop driver for the CLI entry points.

Replicates the reference's L3 run_X loop behavior (SURVEY.md §2.3/§3.1):
per step sample + local energies + update (all fused in ``trainer.step``),
record mean/var energy, print every ``log_every`` steps, persist the .npy
series every ``save_every`` steps and a checkpoint every ``ckpt_every``
steps, with cold-restart resume (``TrainingRNN_1DTFIM.py:199-227``; the loop
range is ``range(start, numsteps + 1)`` inclusive, as in the reference).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from ..utils.checkpoints import Checkpointer
from ..utils.metrics import MetricsSeries
from ..vmc.trainer import VMCTrainer


def run_training(
    trainer: VMCTrainer,
    num_steps: int,
    workdir: str,
    tag: str,
    resume: bool = False,
    log_every: int = 10,
    save_every: int = 10,
    ckpt_every: int = 500,
    profile_dir: Optional[str] = None,
):
    """Returns (final_state, mean_energy list, var_energy list)."""
    metrics = MetricsSeries(workdir, tag, resume=resume)
    ckpt = Checkpointer(os.path.join(workdir, f"ckpt_{tag}"))

    state = trainer.init()
    if resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
    key = jax.random.PRNGKey(trainer.config.seed)

    # parameter printout, as the reference does at startup
    # (TrainingRNN_1DTFIM.py:127-136)
    from ..utils.summary import summarize_params

    print(summarize_params(state.params))

    start = int(state.step)
    for it in range(start, num_steps + 1):
        if profile_dir is not None and it == start + 10:
            jax.profiler.start_trace(profile_dir)
        state, m = trainer.step(state, key)
        me = float(jax.device_get(m["mean_energy"]))
        if "mean_energy_im" in m:
            me = complex(me, float(jax.device_get(m["mean_energy_im"])))
        ve = float(jax.device_get(m["var_energy"]))
        metrics.append(me, ve)
        if profile_dir is not None and it == start + 15:
            jax.profiler.stop_trace()

        if it % log_every == 0:
            metrics.print_line(it, trainer.config.num_samples)
            metrics.log_jsonl(it)
        if it % save_every == 0:
            metrics.flush_npy()
        if ckpt_every and it % ckpt_every == 0 and it > start:
            ckpt.save(state)

    ckpt.save(state)
    ckpt.wait()
    metrics.flush_npy()
    return state, metrics.mean_energy, metrics.var_energy
