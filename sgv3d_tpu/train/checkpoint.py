"""Orbax checkpointing of TrainState (params / batch_stats / opt_state / step).

Replaces Lightning's ModelCheckpoint (reference exps save every 3 or 5 epochs
into outputs/<exp>/checkpoints, plus `save_last`): same cadence and layout,
with auto-resume from the latest step.
"""
from __future__ import annotations

import os
import jax
import orbax.checkpoint as ocp

from sgv3d_tpu.train.loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        step = int(jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def restore(self, template: TrainState, step: int | None = None
                ) -> TrainState:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template._asdict()))
        return TrainState(**restored)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
