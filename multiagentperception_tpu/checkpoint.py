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
    """Write a checkpoint directory at ``path``, crash-safely overwriting.

    A naive rmtree-then-save leaves NO valid checkpoint if the process dies
    mid-save — the exact window periodic 'latest' checkpoints exist to
    survive (observed: a preemption during save left only an
    ``.orbax-checkpoint-tmp``). Instead: write the new checkpoint beside the
    old one, then swap via renames. At every instant at least one complete
    checkpoint is on disk; ``resolve_checkpoint`` finds it.
    """
    import shutil

    path = os.path.abspath(path)
    new, old = path + ".new", path + ".old"
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(new):
        shutil.rmtree(new)
    ckptr.save(new, state_dict)
    ckptr.wait_until_finished()
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(new, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return path


def resolve_checkpoint(path: str) -> str | None:
    """The newest COMPLETE checkpoint for ``path``, accounting for the
    save_checkpoint swap windows: a finalized ``.new`` (crash between save
    and swap) is newest, then ``path`` itself, then ``.old`` (crash between
    the two renames). Incomplete orbax writes use a ``*-tmp`` name and are
    never matched. None if no complete checkpoint exists."""
    path = os.path.abspath(path)
    for candidate in (path + ".new", path, path + ".old"):
        if os.path.isdir(candidate):
            return candidate
    return None


def load_checkpoint(path: str, target: dict | None = None) -> dict:
    """Load a checkpoint; ``target`` (a matching PyTree of arrays) restores
    exact dtypes/shardings when provided."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)
