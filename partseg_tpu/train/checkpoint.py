"""Checkpoint / resume on Orbax (SURVEY.md §5.3, §5.4).

Replaces edflow's CheckpointHook + torch.save. Async saves every N
steps; restore-latest on start makes every run preemption-safe. Orbax
checkpoints are sharding-agnostic, so resuming on a different chip
count re-shards naturally (elastic recovery, SURVEY.md §5.3).
"""

from __future__ import annotations

import pathlib
from typing import Any

import orbax.checkpoint as ocp

from partseg_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, save_every: int = 1000):
        path = pathlib.Path(directory).absolute() / "checkpoints"
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                save_interval_steps=save_every,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        if force and self._mgr.latest_step() == step:
            return False  # already saved by the interval policy
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore_latest(self, template: TrainState) -> tuple[TrainState, int] | None:
        """Restore the newest checkpoint into the template's structure
        (and shardings). Returns (state, step) or None if no checkpoint."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
