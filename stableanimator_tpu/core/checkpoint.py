"""Orbax checkpointing with step-numbered directories, `latest` resolution,
and a retention limit — the TPU-native equivalent of the reference training
contract (`--checkpointing_steps`, `--checkpoints_total_limit`,
`--resume_from_checkpoint="latest"`; command_train.sh:18-21).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, total_limit: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=total_limit, create=True, enable_async_checkpointing=False)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (a pytree with the
        target shapes/dtypes). step=None -> latest."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def close(self):
        self._mgr.close()
