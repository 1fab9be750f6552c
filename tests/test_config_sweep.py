"""Sweep all shipped experiment configs (the reference's ten + the
framework's extension configs): each must build through the registry and run
a train-mode forward + its eval-mode forward at reduced resolution
(SURVEY §7.8 hardening)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import load_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.trainer import _EVAL_DEFAULT, get_trainer
from multiagentperception_tpu.utils import init_variables

pytestmark = pytest.mark.slow  # e2e: full train/eval cycles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*", "*.yml")))
H = 128

assert len(CONFIGS) == 11  # 10 reference configs + the topk extension


def _shrink(cfg):
    cfg["data"]["img_rows"] = cfg["data"]["img_cols"] = H
    m = cfg["model"]
    if "key_size" in m:
        m["key_size"] = 64
    if "query_size" in m:
        m["query_size"] = 8
    return cfg


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_and_runs(path, rng):
    cfg = _shrink(load_config(path))
    arch = cfg["model"]["arch"]
    n = cfg["model"]["agent_num"]
    model = get_model(cfg, 11)
    mo = bool(cfg["model"].get("multiple_output"))

    if arch == "Single_agent":
        x = jnp.asarray(rng.normal(size=(1, H, H, 3)), jnp.float32)
    else:
        x = jnp.asarray(rng.normal(size=(1, n, H, H, 3)), jnp.float32)

    kwargs = {}
    if arch in ("MIMOcom", "MIMOcomWho"):
        kwargs["mo_flag"] = mo
    rngs = {"params": jax.random.PRNGKey(0)}
    needs_action = cfg["model"].get("shuffle_features") == "selection"
    if needs_action:
        rngs["action"] = jax.random.PRNGKey(1)
    variables = init_variables(model, rngs, x, train=True, **kwargs)

    apply_rngs = {"action": jax.random.PRNGKey(2)} if needs_action else None
    out, _ = model.apply(variables, x, train=True, rngs=apply_rngs,
                         mutable=["batch_stats"], **kwargs)
    pred = out[0] if isinstance(out, tuple) else out
    expect_b = n if (mo and arch != "All_agents" and arch != "Single_agent") else 1
    assert pred.shape == (expect_b, H, H, 11)

    # eval-mode forward with the config's (or per-arch default) mode
    eval_mode = cfg["model"].get("eval_inference") or _EVAL_DEFAULT.get(arch)
    if eval_mode:
        kwargs["inference"] = eval_mode
        out = model.apply(variables, x, train=False, rngs=apply_rngs, **kwargs)
        assert isinstance(out, tuple)
        assert np.isfinite(np.asarray(out[0], np.float32)).all()

    # trainer dispatch exists for every shipped arch
    assert get_trainer(cfg) is not None
