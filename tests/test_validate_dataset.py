"""scripts/validate_dataset.py: audits an AirSim-MAP root for the frames the
loader's existence-intersection indexing would silently drop."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    from multiagentperception_tpu.data.synthetic import generate_fixture

    root = str(tmp_path_factory.mktemp("airsim_validate"))
    generate_fixture(root, target_view="6agent", img_size=64,
                     frames_per_traj=2)
    return root


def _run(root, *extra):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "validate_dataset.py"),
         "--path", root, "--target_view", "6agent", *extra],
        capture_output=True, text=True, timeout=120,
    )


def test_complete_dataset_passes(root):
    r = _run(root, "--commun_label", "mimo")
    assert r.returncode == 0, r.stdout + r.stderr[-1000:]
    assert "OK" in r.stdout
    assert "DROPPED" not in r.stdout


def test_trailing_slash_path(root):
    # a trailing slash must not corrupt the path_dir extraction
    r = _run(root + "/")
    assert r.returncode == 0, r.stdout + r.stderr[-1000:]
    assert "OK" in r.stdout


def test_missing_file_is_reported(root):
    import glob
    import shutil

    victim = sorted(glob.glob(
        os.path.join(root, "segmentation_decoded", "*", "*", "*", "*.png")))[0]
    bak = victim + ".bak"
    shutil.move(victim, bak)
    try:
        r = _run(root)
        assert r.returncode == 1
        assert "DROPPED" in r.stdout and "segmentation_decoded" in r.stdout
        # day-one actionability: the EXACT missing path is printed
        assert victim in r.stdout, r.stdout
    finally:
        shutil.move(bak, victim)


def test_missing_comm_labels_fail(root):
    # images present but the ground-truth label file is absent: the error
    # names the exact expected file path
    gt = os.path.join(root, "gt_mimo_communicate.txt")
    bak = gt + ".bak"
    os.rename(gt, bak)
    try:
        r = _run(root, "--commun_label", "mimo")
        assert r.returncode == 2
        assert "comm-label" in r.stdout and gt in r.stdout, r.stdout
    finally:
        os.rename(bak, gt)


def test_empty_root_names_expected_layout(tmp_path):
    # a wrong --path fails fast with the expected directory layout, not
    # an unexplained "0 frames usable"
    r = _run(str(tmp_path), "--commun_label", "mimo")
    assert r.returncode == 2
    assert "missing modality directory" in r.stdout
    assert "expected layout" in r.stdout and "scene" in r.stdout, r.stdout


def test_nonexistent_root_fails_fast(tmp_path):
    r = _run(str(tmp_path / "nope"))
    assert r.returncode == 2
    assert "does not exist" in r.stdout
