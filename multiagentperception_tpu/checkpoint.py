"""Checkpoint save/restore via orbax (reference: torch.save dicts of
{epoch, model_state, optimizer_state, scheduler_state, best_iou} at
trainer.py:229-240, resume at trainer.py:59-75).

The whole train state (params, batch_stats, optimizer state, step, best mIoU)
is one PyTree; the LR schedule needs no separate state — it is a pure
function of the step count.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state_dict: dict) -> str:
    """Write a checkpoint directory at ``path`` (overwrites)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state_dict)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: dict | None = None) -> dict:
    """Load a checkpoint; ``target`` (a matching PyTree of arrays) restores
    exact dtypes/shardings when provided."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)
