"""Config normalization: schema defaults, 'None' sentinels, typo warnings."""

import glob
import logging
import os

import yaml

from multiagentperception_tpu.config import normalize_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_unknown_key_warns(caplog):
    with caplog.at_level(logging.WARNING, logger="multiagentperception_tpu"):
        cfg = normalize_config({"model": {"arch": "MIMOcom"},
                                "training": {"freez_bn_stats": True}})
    assert any("freez_bn_stats" in r.message for r in caplog.records)
    # the typoed key still passes through (raw-dict compatibility)
    assert cfg["training"]["freez_bn_stats"] is True


def test_extension_keys_do_not_warn(caplog):
    with caplog.at_level(logging.WARNING, logger="multiagentperception_tpu"):
        normalize_config({
            "model": {"arch": "MIMOcom", "remat": True, "pallas_comm": True,
                      "dtype": "bfloat16"},
            "data": {"on_device_normalize": True, "cache_decoded": "/tmp/c"},
            "training": {"mixed_precision": True, "nan_guard": 3,
                         "data_backend": "grain", "save_interval": 10,
                         "freeze_bn_stats": True},
        })
    assert not caplog.records


def test_all_shipped_reference_configs_are_silent(caplog):
    paths = glob.glob(os.path.join(REPO, "configs", "*", "*.yml"))
    assert len(paths) == 11  # 10 reference + topk extension
    with caplog.at_level(logging.WARNING, logger="multiagentperception_tpu"):
        for p in paths:
            with open(p) as f:
                normalize_config(yaml.safe_load(f))
    assert not caplog.records


def test_none_sentinels():
    cfg = normalize_config({"data": {"noisy_type": "None"},
                            "training": {"resume": "None"}})
    assert cfg["data"]["noisy_type"] is None
    assert cfg["training"]["resume"] is None
    assert cfg["data"]["commun_label"] == "None"  # stays a string


def test_topk_extension_config_plumbs_through():
    """configs/extensions/mrms_when2com_topk.yml: model.topk_k reaches the
    model and model.eval_inference overrides the trainer's default eval mode
    (the bandwidth-constrained when2com product surface)."""
    import logging

    from multiagentperception_tpu.config import load_config
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.trainer import get_trainer

    path = os.path.join(REPO, "configs", "extensions",
                        "mrms_when2com_topk.yml")
    cfg = load_config(path)
    model = get_model(cfg, 11)
    assert model.topk_k == 2
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("t"), model, None, None, None, None)
    assert trainer.eval_default == "topk"
