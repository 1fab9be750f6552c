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
    assert len(paths) == 10
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
