"""End-to-end test of the turnkey parity runner (scripts/compare_reference.py).

A random-init flagship model is exported to a reference-format ``.pkl``
(compat/torch_export.save_reference_checkpoint); the runner then evaluates
the SAME weights in both frameworks over the synthetic fixture and the
mIoU deltas must sit at cross-framework float noise."""

import os
import sys

import pytest
import yaml

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")


@pytest.mark.slow
def test_compare_reference_end_to_end(tmp_path, capsys, monkeypatch):
    import numpy as np

    from multiagentperception_tpu.compat import save_reference_checkpoint
    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.data.synthetic import generate_fixture
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.utils import init_variables

    root = str(tmp_path / "data")
    generate_fixture(root, target_view="6agent", img_size=64,
                     frames_per_traj=2)

    cfg_dict = {
        "model": {"arch": "MIMOcom", "agent_num": 6, "multiple_output": True,
                  "query_size": 8, "key_size": 64,
                  "enc_backbone": "n_segnet_encoder",
                  "dec_backbone": "simple_decoder", "feat_channel": 32},
        "data": {"dataset": "airsim", "path": root, "img_rows": 64,
                 "img_cols": 64, "target_view": "6agent",
                 "commun_label": "mimo", "train_split": "train",
                 "val_split": "val", "test_split": "test"},
        "training": {"batch_size": 2, "n_workers": 0,
                     "optimizer": {"name": "adam", "lr": 1e-4},
                     "loss": {"name": "cross_entropy",
                              "size_average": True}},
    }
    cfg_path = str(tmp_path / "cfg.yml")
    with open(cfg_path, "w") as fp:
        yaml.safe_dump(cfg_dict, fp)

    cfg = normalize_config(cfg_dict)
    import jax

    model = get_model(cfg, 11)
    x = np.zeros((1, 6, 64, 64, 3), np.float32)
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)}, x, train=True)
    pkl = str(tmp_path / "ref_ckpt.pkl")
    save_reference_checkpoint(cfg, variables, pkl)

    sys.path.insert(0, SCRIPTS)
    try:
        import compare_reference
    finally:
        sys.path.remove(SCRIPTS)

    rc = compare_reference.main([
        "--config", cfg_path, "--model_path", pkl, "--cpu",
        "--max_batches", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "this framework" in out and "reference" in out
    assert "Overall" in out
    line = [ln for ln in out.splitlines()
            if ln.startswith("max |mIoU delta|")][0]
    worst = float(line.split(":")[1])
    # identical weights through two frameworks: any residual is argmax
    # flips on near-tied random-init logits
    assert worst < 0.05, out

    # torch-less deployment host: the runner degrades gracefully instead of
    # crashing on the reference-side import (VERDICT r4 next #6)
    import importlib.util as _ilu

    real_find_spec = _ilu.find_spec
    monkeypatch.setattr(
        "importlib.util.find_spec",
        lambda name, *a, **k: (None if name == "torch"
                               else real_find_spec(name, *a, **k)))
    rc = compare_reference.main([
        "--config", cfg_path, "--model_path", pkl, "--cpu",
        "--max_batches", "1", "--skip_validate"])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "torch is not installed" in out2, out2
