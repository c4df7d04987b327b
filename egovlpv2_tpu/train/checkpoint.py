"""Orbax checkpoint save/restore for TrainState.

TPU-native replacement for the reference's torch .pth checkpointing
(`base/base_trainer.py:390-495`): async orbax saves with retention, a
'best' pointer, and preemption-safe periodic checkpoints (replaces the
SLURM SIGUSR1 requeue flow, `multinode_train_egoclip.py:56-61`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state, metrics: Optional[dict] = None,
             is_best: bool = False, epoch: Optional[int] = None):
        # multi-process: every process must call save (orbax coordinates the
        # collective write of global arrays); sidecar json is process-0 only
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if jax.process_index() != 0:
            return
        if metrics is not None:
            with open(os.path.join(self._dir, f"metrics_{step}.json"), "w") as f:
                json.dump({k: float(v) for k, v in metrics.items()}, f)
        if is_best:
            with open(os.path.join(self._dir, "best_step.json"), "w") as f:
                json.dump({"step": int(step)}, f)
        if epoch is not None:
            # epoch-granular progress: a resumed run continues at epoch+1
            # (reference stores `epoch` in every .pth and restarts from
            # checkpoint_epoch + 1, base_trainer.py:412-436,438-495)
            with open(os.path.join(self._dir, "progress.json"), "w") as f:
                json.dump({"epoch": int(epoch), "step": int(step)}, f)

    def last_epoch(self) -> Optional[int]:
        """Last COMPLETED epoch recorded by save(..., epoch=), or None."""
        path = os.path.join(self._dir, "progress.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)["epoch"]
        return None

    def restore(self, state_template, step: Optional[int] = None):
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_params(self, params_template=None, step: Optional[int] = None,
                       prefer_best: bool = True):
        """Restore only the `params` subtree of a saved TrainState.

        Used by eval/extract entry points that have no optimizer state. When
        `prefer_best` and a best pointer exists, that step is restored.
        Returns None when the directory holds no checkpoint.
        """
        if step is None and prefer_best:
            step = self.best_step()
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None
        # restore as a raw pytree (no template): works for any TrainState
        # layout without materializing an optimizer-state template
        raw = self._mngr.restore(step)
        if hasattr(raw, "params"):
            return raw.params
        if isinstance(raw, dict) and "params" in raw:
            return raw["params"]
        # NamedTuple saved as a sequence: params is field 0
        return raw[0]

    def save_monitor(self, monitor_state: dict):
        """Persist monitored-metric progress (best value, early-stop counter)
        so a resumed run cannot regress the 'best' pointer. Reference parity:
        monitor_best is part of every saved .pth (base_trainer.py:412-436)."""
        if jax.process_index() != 0:
            return
        with open(os.path.join(self._dir, "monitor.json"), "w") as f:
            json.dump(monitor_state, f)

    def monitor_state(self) -> Optional[dict]:
        path = os.path.join(self._dir, "monitor.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return None

    def best_step(self) -> Optional[int]:
        path = os.path.join(self._dir, "best_step.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)["step"]
        return None

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.close()
