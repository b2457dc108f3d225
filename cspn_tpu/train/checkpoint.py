"""Checkpointing (reference: torch.save per epoch + best_model.pth,
train.py:229-231,277-280; resume loads weights only, train.py:151-159).

Improvement over the reference (SURVEY.md §5): the FULL train state is saved
-- params, batch_stats, optimizer state, step, epoch, best RMSE and LR -- so
resume continues exactly, via Orbax.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 3):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, name: str) -> str:
        return os.path.join(self.save_dir, name)

    def save_epoch(self, tree: Any, epoch: int):
        path = self._path(f"epoch_{epoch:02d}")
        self._ckpt.save(path, tree, force=True)
        self._ckpt.wait_until_finished()
        self._gc()

    def save_best(self, tree: Any):
        self._ckpt.save(self._path("best_model"), tree, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, name: str, target: Any) -> Any:
        """Restore checkpoint `name` ('best_model' or 'epoch_NN') into the
        structure of `target` (an abstract or concrete pytree)."""
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckpt.restore(self._path(name), abstract)

    def has(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def latest_epoch(self) -> int | None:
        epochs = [
            int(d.split("_")[1])
            for d in os.listdir(self.save_dir)
            if d.startswith("epoch_") and d.split("_")[1].isdigit()
        ]
        return max(epochs) if epochs else None

    def _gc(self):
        epochs = sorted(
            d for d in os.listdir(self.save_dir) if d.startswith("epoch_")
        )
        for d in epochs[: -self.max_to_keep]:
            import shutil

            shutil.rmtree(os.path.join(self.save_dir, d), ignore_errors=True)


def state_to_tree(state, epoch: int, best_rmse: float, lr: float) -> dict:
    """Flatten a TrainState + host-side training metadata into a pytree."""
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
        "best_rmse": np.asarray(best_rmse),
        "lr": np.asarray(lr),
    }
