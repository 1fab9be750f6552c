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
    """The data-stream sidecar lives INSIDE the checkpoint directory: every
    complete candidate is paired with ITS OWN sidecar bytes by construction
    (directory renames move both atomically), so a crash can never resume
    the iter-N model with the iter-(N-1) data position."""
    from multiagentperception_tpu.checkpoint import read_sidecar

    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, _state(1), sidecar=b"pos-1")
    assert read_sidecar(resolve_checkpoint(path)) == b"pos-1"

    save_checkpoint(path, _state(2), sidecar=b"pos-2")
    assert read_sidecar(resolve_checkpoint(path)) == b"pos-2"
    assert float(load_checkpoint(path)["w"][0]) == 2.0  # extra file ignored

    # crash state: a finalized '.new' carries its own sidecar internally
    save_checkpoint(path + ".tmpbuild", _state(3), sidecar=b"pos-3")
    os.rename(path + ".tmpbuild", path + ".new")
    resolved = resolve_checkpoint(path)
    assert resolved == path + ".new"
    assert read_sidecar(resolved) == b"pos-3"
    # ...and the unsuffixed candidate still pairs with ITS sidecar, never
    # the newer one's (the round-2 advisory's stale-pairing window)
    assert read_sidecar(path) == b"pos-2"


def test_sidecar_legacy_external_format_still_reads(tmp_path):
    """Pre-r3 checkpoints wrote '<candidate>.datastate' beside the dir; the
    reader honors exactly the resolved candidate's external sidecar and
    never suffix-strips to another candidate's."""
    from multiagentperception_tpu.checkpoint import read_sidecar

    path = str(tmp_path / "old.ckpt")
    save_checkpoint(path, _state(1))
    with open(path + ".datastate", "wb") as f:
        f.write(b"legacy-pos")
    assert read_sidecar(path) == b"legacy-pos"
    # a '.new' candidate WITHOUT its own sidecar must not inherit path's
    save_checkpoint(path + ".tmpbuild", _state(2))
    os.rename(path + ".tmpbuild", path + ".new")
    assert resolve_checkpoint(path) == path + ".new"
    assert read_sidecar(path + ".new") is None


def test_save_clears_stale_legacy_sidecar(tmp_path):
    """A pre-r3 external '<path>.datastate' must not survive a new save with
    sidecar=None: the checkpoint it belonged to is rotated away, and a later
    grain-backed run would pair the fresh model with the stale position."""
    from multiagentperception_tpu.checkpoint import read_sidecar

    path = str(tmp_path / "latest.ckpt")
    save_checkpoint(path, _state(1))
    with open(path + ".datastate", "wb") as f:
        f.write(b"stale-pos")
    save_checkpoint(path, _state(2), sidecar=None)
    assert not os.path.exists(path + ".datastate")
    assert read_sidecar(path) is None
    # and with a sidecar, the new save's own position wins
    with open(path + ".datastate", "wb") as f:
        f.write(b"stale-pos")
    save_checkpoint(path, _state(3), sidecar=b"fresh-pos")
    assert read_sidecar(path) == b"fresh-pos"


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


def test_process_sidecar_single_process_passthrough():
    """Single-process runs keep the sidecar as raw grain state bytes —
    back-compatible with every existing checkpoint."""
    from multiagentperception_tpu.checkpoint import (
        pack_process_sidecars,
        unpack_process_sidecar,
    )

    assert pack_process_sidecars(b"raw-grain-state") == b"raw-grain-state"
    assert unpack_process_sidecar(b"raw-grain-state") == b"raw-grain-state"


def test_process_sidecar_pack_format_and_unpack(monkeypatch):
    """pack_process_sidecars gathers every process's position into one blob;
    unpack returns exactly this process's slot (multi-host exact resume,
    VERDICT r4 missing #5). The allgather is faked to simulate 2 processes."""
    import struct

    import jax
    import numpy as np

    from multiagentperception_tpu.checkpoint import (
        _MP_SIDECAR_MAGIC,
        pack_process_sidecars,
        unpack_process_sidecar,
    )

    positions = {0: b"proc-zero-state", 1: b"proc-one-state-longer!"}
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    def fake_allgather(x):
        x = np.asarray(x)
        if x.ndim == 0:  # the length gather
            return np.asarray([len(positions[0]), len(positions[1])], np.int32)
        rows = []
        for i in (0, 1):
            row = np.zeros(x.shape[0], np.uint8)
            b = np.frombuffer(positions[i], np.uint8)
            row[: len(b)] = b
            rows.append(row)
        return np.stack(rows)

    monkeypatch.setattr("jax.experimental.multihost_utils.process_allgather",
                        fake_allgather)
    blob = pack_process_sidecars(positions[0])
    assert blob.startswith(_MP_SIDECAR_MAGIC)
    # hand-parse: count, then length-prefixed parts in process order
    (count,) = struct.unpack_from("<I", blob, len(_MP_SIDECAR_MAGIC))
    assert count == 2
    for i, expect in positions.items():
        monkeypatch.setattr(jax, "process_index", lambda i=i: i)
        assert unpack_process_sidecar(blob) == expect
    # resume at a different process count: positions are meaningless there
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    assert unpack_process_sidecar(blob) is None
