"""Mixed-precision (bf16 compute / f32 params) coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

H = 128


def _cfg(mixed, **model_kw):
    return normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 3, "query_size": 8,
                  "key_size": 64, "multiple_output": True, **model_kw},
        "data": {"img_rows": H, "img_cols": H},
        "training": {"mixed_precision": mixed},
    })


class TestMixedPrecision:
    @pytest.mark.slow  # bf16 train-mode compile ~2.5 min on 1 CPU core
    def test_params_stay_f32_output_bf16(self):
        model = get_model(_cfg(True), 11)
        x = jnp.zeros((1, 3, H, H, 3), jnp.float32)
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x,
                           train=False, mo_flag=True, inference="softmax")
        leaves = jax.tree_util.tree_leaves(v["params"])
        assert all(l.dtype == jnp.float32 for l in leaves)
        pred, prob, action, nc = model.apply(
            v, x, train=False, mo_flag=True, inference="softmax")
        assert pred.dtype == jnp.bfloat16
        # comm-graph softmax pinned to f32 for stability
        assert prob.dtype == jnp.float32

    def test_model_dtype_config_key(self):
        cfg = _cfg(False, dtype="bfloat16")
        model = get_model(cfg, 11)
        assert model.dtype == jnp.bfloat16

    def test_bf16_close_to_f32(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 3, H, H, 3)) * 0.1, jnp.float32)
        m32 = get_model(_cfg(False), 11)
        m16 = get_model(_cfg(True), 11)
        v = init_variables(m32, {"params": jax.random.PRNGKey(0)}, x,
                           train=False, mo_flag=True, inference="softmax")
        p32, *_ = m32.apply(v, x, train=False, mo_flag=True, inference="softmax")
        p16, *_ = m16.apply(v, x, train=False, mo_flag=True, inference="softmax")
        # same params, bf16 compute: predictions should mostly agree
        agree = np.mean(
            np.argmax(np.asarray(p32), -1) == np.argmax(np.asarray(p16, np.float32), -1)
        )
        assert agree > 0.95

    def test_bf16_loss_is_f32_and_finite(self):
        from multiagentperception_tpu.loss import cross_entropy2d

        model = get_model(_cfg(True), 11)
        x = jnp.zeros((1, 3, H, H, 3), jnp.float32)
        y = jnp.zeros((3, H, H), jnp.int32)
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x,
                           train=True, mo_flag=True)
        (pred, *_), _ = model.apply(v, x, train=True, mo_flag=True,
                                    mutable=["batch_stats"])
        loss = cross_entropy2d(pred, y)
        assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
