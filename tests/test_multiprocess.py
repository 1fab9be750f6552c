"""True 2-process jax.distributed validation (VERDICT round-3 task #4).

Wraps scripts/dryrun_multiprocess.py: real processes, real coordinator, real
cross-process collectives — the features previously tested only with
monkeypatched ``jax.process_index``/``process_count``
(tests/test_grain_pipeline.py) get exercised for real here."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/dryrun_multiprocess.py")],
        capture_output=True, text=True, timeout=2400,
        env={**os.environ, "MAP_COMPILE_CACHE": "off"})
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-6000:]
    assert "RESULT: ok" in proc.stdout, out[-6000:]
    assert "disjoint=True" in proc.stdout
    assert "identical-on-both=True" in proc.stdout
