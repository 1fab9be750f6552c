"""serve.py CLI: an exported artifact runs over a dataset split with no
model code, writing per-camera prediction maps."""

import glob
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.export import export_serving
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H = 128

pytestmark = pytest.mark.slow  # full MIMOcom export compile on one CPU core


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    from multiagentperception_tpu.data.synthetic import generate_fixture

    root = str(tmp_path_factory.mktemp("airsim_serve"))
    generate_fixture(root, target_view="6agent", img_size=H, frames_per_traj=2)
    return root


def test_serve_cli_writes_predictions(fixture_root, tmp_path):
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6, "query_size": 8,
                  "key_size": 64, "multiple_output": True},
        "data": {"dataset": "airsim", "path": str(fixture_root),
                 "img_rows": H, "img_cols": H, "target_view": "6agent",
                 "commun_label": "None"},
    })
    model = get_model(cfg, 11)
    shape = (1, 6, H, H, 3)
    x = jnp.zeros(shape, jnp.float32)
    v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x,
                       train=False, mo_flag=True, inference="activated")
    artifact_path = tmp_path / "model.stablehlo"
    artifact_path.write_bytes(export_serving(model, v, shape))

    cfg_path = tmp_path / "serve.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "model": dict(cfg["model"]),
            "data": dict(cfg["data"]),
            "training": {"batch_size": 1, "n_workers": 0},
        }, f)

    out_dir = tmp_path / "preds"
    env = dict(os.environ, MAP_PLATFORM="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_cache",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "serve.py"),
         "--config", str(cfg_path), "--artifact", str(artifact_path),
         "--split", "test", "--out", str(out_dir), "--limit", "1"],
        capture_output=True, text=True, timeout=900, env=env, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    preds = sorted(glob.glob(str(out_dir / "*.png")))
    assert len(preds) == 6  # one map per camera of the one served frame
    assert "avg bandwidth" in r.stdout

    import cv2

    ids = cv2.imread(preds[0], cv2.IMREAD_GRAYSCALE)
    assert ids is not None and ids.shape == (H, H)
    assert ids.max() < 11
