"""Orbax checkpointing of (params, opt_state, step, PRNG key).

Replaces the reference's ``tf.train.Saver`` usage — save every 100 epochs to
a hardcoded absolute path, restore at fixed epochs (main.py:299,351-352,
376,430,484) — with config-driven paths, optimizer-state-aware saves, and
latest-checkpoint resume (SURVEY §5 checkpoint/resume)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = _abs(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint found under {self.directory}")
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self.manager.close()
