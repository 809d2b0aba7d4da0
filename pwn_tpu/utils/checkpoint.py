"""Checkpoint / resume (reference: tensorpack `ModelSaver` +
`SaverRestore` over tf.train.Saver [R]; SURVEY.md §5 "Checkpoint / resume").

Rebuilt on orbax-checkpoint: async multi-host-aware saves of
{train_state, data-iterator step}, atomic latest-step tracking, and
fail-fast restore.  Only process 0 writes replicated arrays; sharded
arrays are written per-shard by orbax automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        """Async save; returns immediately (training overlaps the write)."""
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_steps(self):
        """Retained checkpoint steps, ascending (the candidate ladder
        for distillability-aware teacher selection)."""
        return sorted(self._mngr.all_steps())

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Tuple[Any, int]:
        """Restore into the structure/shardings of `state_template`."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return restored, step

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
