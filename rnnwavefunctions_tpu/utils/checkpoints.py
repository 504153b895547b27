"""Checkpoint / resume via Orbax.

TPU-native replacement for the reference's ``tf.train.Saver`` flow: the
reference creates a Saver per trainer (``TrainingRNN_1DTFIM.py:166``), saves
every 500 steps (``:217-219``) under ``Check_Points/<workload>/`` and resumes
by restoring the ckpt and continuing from ``len(meanEnergy)``
(commented blocks, ``TrainingRNN_1DTFIM.py:172-183``; SURVEY.md §5).

Here the full ``TrainState`` (params + Adam state + step counter) is saved
atomically with ``orbax.checkpoint.CheckpointManager``; the step counter
lives *in* the state, not implicitly in the metrics-history length.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from ..vmc.trainer import TrainState


class Checkpointer:
    """Thin wrapper over an Orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        if step is None:
            step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of ``template`` (obtain one
        from ``trainer.init()``)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return TrainState(*restored)

    def restore_params_and_step(
        self, template: TrainState, step: Optional[int] = None
    ):
        """Cross-optimizer resume: restore only the parameters and the step
        counter from the raw saved tree, ignoring the optimizer state — for
        resuming a run whose ``TrainConfig.optimizer`` (and hence opt_state
        layout) changed, e.g. refining an Adam-trained wavefunction with
        minSR.  Returns ``(params, step_array)``; the caller re-initializes
        the optimizer state.  Leaf counts and shapes are checked against
        ``template`` (raw dict/list containers need not match the live
        pytree's tuple/dataclass containers)."""
        import jax.numpy as jnp

        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        raw = self._mgr.restore(step)
        leaves = jax.tree.leaves(raw["params"])
        t_leaves, treedef = jax.tree.flatten(template.params)
        if len(leaves) != len(t_leaves) or any(
            tuple(l.shape) != tuple(t.shape) for l, t in zip(leaves, t_leaves)
        ):
            raise ValueError(
                "checkpoint parameters do not match the ansatz "
                f"(saved {len(leaves)} leaves vs template {len(t_leaves)})"
            )
        params = jax.tree.unflatten(
            treedef,
            [jnp.asarray(l, t.dtype) for l, t in zip(leaves, t_leaves)],
        )
        return params, jnp.asarray(raw["step"], jnp.int32)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
