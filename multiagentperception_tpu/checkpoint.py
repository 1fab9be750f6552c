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


def save_checkpoint(path: str, state_dict: dict,
                    sidecar: bytes | None = None) -> str:
    """Write a checkpoint directory at ``path``, crash-safely overwriting.

    A naive rmtree-then-save leaves NO valid checkpoint if the process dies
    mid-save — the exact window periodic 'latest' checkpoints exist to
    survive (observed: a preemption during save left only an
    ``.orbax-checkpoint-tmp``). Instead: write the new checkpoint beside the
    old one, then swap via renames. At every instant at least one complete
    checkpoint is on disk; ``resolve_checkpoint`` finds it.

    ``sidecar`` bytes (e.g. the grain data-stream position) ride INSIDE the
    swap as ``<candidate>.datastate`` so the restored model state and its
    data position always pair up — a sidecar written after the swap would
    leave the previous save's position next to the new model on a crash.
    """
    import glob
    import shutil

    path = os.path.abspath(path)
    new, old = path + ".new", path + ".old"
    ckptr = ocp.StandardCheckpointer()
    # crashed earlier saves leave orbax '*-tmp*' dirs; bound the garbage
    for tmp in glob.glob(path + "*orbax-checkpoint-tmp*"):
        shutil.rmtree(tmp, ignore_errors=True)
    _rm(new)
    ckptr.save(new, state_dict)
    ckptr.wait_until_finished()
    if sidecar is not None:
        with open(new + ".datastate", "wb") as f:
            f.write(sidecar)
    _rm(old)
    if os.path.exists(path):
        os.rename(path, old)
        _move_if_exists(path + ".datastate", old + ".datastate")
    os.rename(new, path)
    _move_if_exists(new + ".datastate", path + ".datastate")
    _rm(old)
    return path


def _rm(path: str) -> None:
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    for side in (path + ".datastate",):
        if os.path.exists(side):
            os.remove(side)


def _move_if_exists(src: str, dst: str) -> None:
    if os.path.exists(src):
        os.replace(src, dst)


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
