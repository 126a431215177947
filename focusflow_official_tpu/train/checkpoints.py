"""Orbax checkpointing: params + batch_stats + opt_state + step.

TPU-native replacement for the reference's `torch.save` checkpoints
(`/root/reference/core/models/ff-raft/train.py:336-343, 396-398`):
- periodic async save of {step, params, batch_stats, opt_state}
- resume restores everything (the reference's TRAIN.RESTORE_CHECKPOINT path,
  `train.py:197-203, 235-236, 269-270`)
- `save_params_only` mirrors the final bare state_dict export.
Torch `.pth` import for transfer learning lives in `compat/torch_import.py`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mngr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        state = state.replace(
            step=jax.numpy.asarray(step, jax.numpy.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        return state, step

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()


def save_params_only(path: str, params: Any, batch_stats: Any = None) -> None:
    """Final-export equivalent of the bare `state_dict()` save."""
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if batch_stats:
        payload["batch_stats"] = batch_stats
    ckptr.save(os.path.abspath(path), payload)
    ckptr.wait_until_finished()
