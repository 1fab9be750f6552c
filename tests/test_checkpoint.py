"""Crash-safe checkpoint overwrite (checkpoint.py): at every instant of a
periodic 'latest' save, one complete checkpoint is on disk and
resolve_checkpoint finds the newest one."""

import os

import numpy as np
import pytest

from multiagentperception_tpu.checkpoint import (
    load_checkpoint,
    resolve_checkpoint,
    save_checkpoint,
)


def _state(v: float) -> dict:
    return {"epoch": np.asarray(int(v)), "w": np.full((4,), v, np.float32)}


def test_overwrite_leaves_single_clean_checkpoint(tmp_path):
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, _state(1))
    save_checkpoint(path, _state(2))
    assert os.path.isdir(path)
    assert not os.path.exists(path + ".new")
    assert not os.path.exists(path + ".old")
    assert float(load_checkpoint(path)["w"][0]) == 2.0


def test_resolve_prefers_newest_complete(tmp_path):
    path = str(tmp_path / "latest.ckpt")
    # normal state
    save_checkpoint(path, _state(1))
    assert resolve_checkpoint(path) == path

    # crash between finalize-new and swap: both `path` (old) and `.new`
    # (newer, complete) exist -> prefer .new
    save_checkpoint(path + ".tmpbuild", _state(2))
    os.rename(path + ".tmpbuild", path + ".new")
    assert resolve_checkpoint(path) == path + ".new"
    assert float(load_checkpoint(resolve_checkpoint(path))["w"][0]) == 2.0

    # crash between the two renames: only .old and .new exist
    os.rename(path, path + ".old")
    assert resolve_checkpoint(path) == path + ".new"
    os.rename(path + ".new", path)  # cleanup to normal
    import shutil

    shutil.rmtree(path + ".old")

    # crash right after rename(path, old): only .old exists
    os.rename(path, path + ".old")
    assert resolve_checkpoint(path) == path + ".old"
    assert float(load_checkpoint(resolve_checkpoint(path))["w"][0]) == 2.0


def test_resolve_missing_returns_none(tmp_path):
    assert resolve_checkpoint(str(tmp_path / "nope.ckpt")) is None


def test_sidecar_travels_with_its_checkpoint(tmp_path):
    """The data-stream sidecar rides inside the swap: every complete
    checkpoint candidate is paired with ITS OWN sidecar bytes, so a crash
    can never resume the iter-N model with the iter-(N-1) data position."""
    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, _state(1), sidecar=b"pos-1")
    assert open(path + ".datastate", "rb").read() == b"pos-1"

    save_checkpoint(path, _state(2), sidecar=b"pos-2")
    assert open(path + ".datastate", "rb").read() == b"pos-2"
    assert not os.path.exists(path + ".old.datastate")
    assert not os.path.exists(path + ".new.datastate")

    # crash state: a finalized '.new' must carry its own sidecar
    save_checkpoint(path + ".tmpbuild", _state(3), sidecar=b"pos-3")
    os.rename(path + ".tmpbuild", path + ".new")
    os.replace(path + ".tmpbuild.datastate", path + ".new.datastate")
    resolved = resolve_checkpoint(path)
    assert resolved == path + ".new"
    assert open(resolved + ".datastate", "rb").read() == b"pos-3"


@pytest.mark.slow  # full Single_agent train compile
def test_trainer_resumes_from_crashed_swap_state(tmp_path, monkeypatch):
    """The exact observed failure: preemption mid-save left only swap-state
    dirs; training.resume must still restore (previously: 'No checkpoint
    found', silent restart from iter 0)."""
    pytest.importorskip("flax")
    from multiagentperception_tpu.data.synthetic import generate_fixture

    monkeypatch.chdir(tmp_path)
    root = str(tmp_path / "data")
    generate_fixture(root, target_view="6agent", img_size=128,
                     frames_per_traj=2)

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_trainer import _build, _cfg

    cfg = _cfg("Single_agent", root, tmp_path, multiple_output=True)
    cfg["training"]["save_interval"] = 1
    trainer, _ = _build(cfg)
    trainer.train()
    latest = os.path.join("runs", "default", "Single_agent_airsim_latest.ckpt")
    # simulate the crash window: mid-swap, only '.old' present
    os.rename(latest, latest + ".old")

    cfg2 = _cfg("Single_agent", root, tmp_path, multiple_output=True)
    cfg2["training"]["resume"] = latest
    cfg2["training"]["train_iters"] = 3
    trainer2, _ = _build(cfg2)
    trainer2.train()
    assert int(trainer2.state.step) == 3  # resumed from iter 2, not 0
