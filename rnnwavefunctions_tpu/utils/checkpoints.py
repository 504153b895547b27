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

        # Orbax's raw restore returns dict/list containers regardless of the
        # live pytree's tuple/NamedTuple containers, so leaves are matched by
        # NORMALIZED KEY PATH, not flatten order — order-based pairing would
        # silently permute same-shaped leaves of a custom params container
        # whose registered flatten order differs from sorted-dict order.
        from jax.tree_util import (
            DictKey, GetAttrKey, SequenceKey, tree_flatten_with_path,
        )

        def norm(path):
            out = []
            for k in path:
                if isinstance(k, DictKey):
                    out.append(str(k.key))
                elif isinstance(k, SequenceKey):
                    out.append(str(k.idx))
                elif isinstance(k, GetAttrKey):
                    out.append(str(k.name))
                else:  # custom pytree node with opaque key structure
                    return None
            return "/".join(out)

        raw_map = {
            norm(p): v for p, v in tree_flatten_with_path(raw["params"])[0]
        }
        t_items, treedef = tree_flatten_with_path(template.params)
        leaves = []
        for p, t in t_items:
            key = norm(p)
            if key is None:
                raise ValueError(
                    "cross-optimizer restore cannot key-match a custom "
                    f"pytree params container (path {p}); resume with the "
                    "optimizer the checkpoint was trained with instead"
                )
            if key not in raw_map:
                raise ValueError(
                    f"checkpoint has no parameter leaf '{key}' "
                    f"(saved leaves: {sorted(raw_map)})"
                )
            v = raw_map[key]
            if tuple(v.shape) != tuple(t.shape):
                raise ValueError(
                    f"checkpoint leaf '{key}' has shape {tuple(v.shape)} "
                    f"but the configured ansatz expects {tuple(t.shape)}"
                )
            leaves.append(jnp.asarray(v, t.dtype))
        params = jax.tree.unflatten(treedef, leaves)
        return params, jnp.asarray(raw["step"], jnp.int32)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
