"""Orbax checkpointing with the reference's cadence policy
(ref: train.py:152-164): save every ``period`` epochs, at the final epoch,
and whenever val dice improves ("best" alias); resume restores
model/optimizer/schedule-step/epoch (ref: train.py:124-131).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, period: int = 100):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.period = period
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
        )
        self.best_dice = -1.0

    def maybe_save(self, epoch: int, total_epochs: int, state: Any,
                   dice: Optional[float] = None, extra: Optional[dict] = None):
        """Apply the cadence policy; returns list of tags saved."""
        tags = []
        is_best = dice is not None and dice > self.best_dice
        if is_best:
            self.best_dice = float(dice)
        if ((epoch + 1) % self.period == 0 or epoch == total_epochs - 1 or is_best):
            payload = {"state": state, "epoch": epoch, "best_dice": self.best_dice}
            self._mngr.save(epoch, args=ocp.args.StandardSave(payload), force=True)
            self._mngr.wait_until_finished()
            if extra:  # non-array metadata (args etc.) goes to a JSON sidecar
                import json

                with open(os.path.join(self.directory, "meta.json"), "w") as f:
                    json.dump(extra, f, indent=2, default=str)
            tags.append("best" if is_best else "periodic")
            if is_best:
                with open(os.path.join(self.directory, "best_epoch.txt"), "w") as f:
                    f.write(f"{epoch} {self.best_dice}\n")
        return tags

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None) -> dict:
        step = epoch if epoch is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        payload = {"state": state_template, "epoch": 0, "best_dice": -1.0}
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(payload))
        self.best_dice = float(restored.get("best_dice", -1.0))
        return restored

    def close(self):
        self._mngr.close()
