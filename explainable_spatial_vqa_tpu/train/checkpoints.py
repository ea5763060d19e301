"""Checkpointing with optimizer state and resume.

The reference saves bare model ``state_dict``s on val improvement and cannot
resume training (SURVEY.md §5.4 — no optimizer state, no epoch counter).
Here every checkpoint carries {params, opt_state, step/epoch, best metric,
early-stop counter}, written asynchronously via orbax, so a preempted TPU job
resumes exactly where it stopped.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

__all__ = ["CheckpointStore"]


class CheckpointStore:
    """Thin orbax wrapper: numbered step checkpoints + a 'best' snapshot."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._manager = ocp.CheckpointManager(self.directory, options=options)
        self._best = ocp.StandardCheckpointer()
        self._best_path = os.path.join(self.directory, "best")

    def save(self, step: int, state: Any) -> None:
        self._manager.save(step, args=ocp.args.StandardSave(state))

    def save_best(self, state: Any) -> None:
        self._best.save(self._best_path, state, force=True)

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._manager.restore(step)

    def restore_best(self, template: Any = None) -> Any:
        if not os.path.exists(self._best_path):
            return None
        if template is not None:
            return self._best.restore(self._best_path, target=template)
        return self._best.restore(self._best_path)

    def wait(self) -> None:
        self._manager.wait_until_finished()
        self._best.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._manager.close()
        self._best.close()
