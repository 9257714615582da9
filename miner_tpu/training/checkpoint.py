"""Checkpointing with true resume (orbax).

Fixes the reference's broken recovery story (reference:
src/base_trainer.py:204-235 pickles whole nn.Modules and never restores
optimizer state or step counters): here a checkpoint is the full training
state — params, optimizer state, step, epoch, and the data-pipeline RNG seed
material — saved asynchronously and restorable into a freshly-built state.

Checkpoint names follow the reference's triggers: ``bestLossModel``,
``bestAucModel``, ``finalModel`` (reference: src/trainer.py:181-206, 216).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any, force: bool = True):
        path = self._path(name)
        self._ckptr.save(path, state, force=force)

    def restore(self, name: str, target: Optional[Any] = None) -> Any:
        """Restore into the structure of ``target`` (a concrete state pytree),
        or as raw nested dicts when ``target`` is None (e.g. params-only eval
        loads that don't know the optimizer-state structure)."""
        if target is None:
            return self._ckptr.restore(self._path(name))
        return self._ckptr.restore(self._path(name), target=target)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def wait(self):
        self._ckptr.wait_until_finished()

    def close(self):
        self._ckptr.close()
