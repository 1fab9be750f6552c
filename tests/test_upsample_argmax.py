"""Fused upsample+argmax kernel vs the XLA resize->argmax path."""

import numpy as np
import pytest

import jax.numpy as jnp

from multiagentperception_tpu.ops.pallas.upsample_argmax import (
    find_pre_logits,
    upsample_argmax,
    upsample_argmax_pallas,
)
from multiagentperception_tpu.ops.resize import bilinear_resize


def _xla_ref(x, oh, ow):
    return np.asarray(
        jnp.argmax(bilinear_resize(jnp.asarray(x, jnp.float32), oh, ow), -1)
    )


class TestUpsampleArgmax:
    def test_matches_xla_path_x32(self, rng):
        x = rng.normal(size=(3, 4, 4, 11)).astype(np.float32)
        got = np.asarray(upsample_argmax_pallas(jnp.asarray(x), 128, 128,
                                                interpret=True))
        np.testing.assert_array_equal(got, _xla_ref(x, 128, 128))

    def test_matches_xla_path_single_tile(self, rng):
        # out_h not divisible by 64 -> single-tile fallback
        x = rng.normal(size=(2, 3, 3, 5)).astype(np.float32)
        got = np.asarray(upsample_argmax_pallas(jnp.asarray(x), 96, 96,
                                                interpret=True))
        np.testing.assert_array_equal(got, _xla_ref(x, 96, 96))

    def test_bf16_input(self, rng):
        x = rng.normal(size=(2, 4, 4, 11)).astype(np.float32)
        xb = jnp.asarray(x, jnp.bfloat16)
        got = np.asarray(upsample_argmax_pallas(xb, 128, 128, interpret=True))
        ref = np.asarray(jnp.argmax(
            bilinear_resize(xb.astype(jnp.float32), 128, 128), -1))
        np.testing.assert_array_equal(got, ref)

    def test_tie_breaks_to_lowest_index(self):
        # identical channels everywhere: argmax must pick channel 0
        x = jnp.ones((1, 2, 2, 4), jnp.float32)
        got = np.asarray(upsample_argmax_pallas(x, 64, 64, interpret=True))
        assert (got == 0).all()

    def test_dispatcher_cpu_fallback(self, rng):
        x = rng.normal(size=(2, 4, 4, 11)).astype(np.float32)
        got = np.asarray(upsample_argmax(jnp.asarray(x), 128, 128))
        np.testing.assert_array_equal(got, _xla_ref(x, 128, 128))

    def test_find_pre_logits_takes_last_sow(self):
        a, b = jnp.zeros((1, 2, 2, 3)), jnp.ones((1, 2, 2, 3))
        tree = {"ImgDecoder_0": {"SimpleDecoder_0": {"pre_logits": (a, b)}}}
        np.testing.assert_array_equal(np.asarray(find_pre_logits(tree)),
                                      np.asarray(b))
        assert find_pre_logits({"x": {}}) is None


def test_eval_step_fused_epilogue_matches_logits_argmax(rng):
    """Trainer eval with the sown pre-logits epilogue == argmax of the
    model's full-resolution output (CPU dispatcher path)."""
    import logging

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import Trainer

    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 2, "query_size": 4,
                  "key_size": 16, "multiple_output": True},
        "data": {"img_rows": 128, "img_cols": 128, "commun_label": "mimo",
                 "target_view": "6agent"},
        "training": {"batch_size": 1},
    })
    model = get_model(cfg, 11)
    trainer = Trainer(cfg, None, logging.getLogger("t"), model,
                      get_loss_function(cfg), None, None, get_optimizer(cfg))
    images = rng.normal(size=(1, 2, 128, 128, 3)).astype(np.float32)
    labels = rng.integers(0, 11, size=(1, 2, 128, 128)).astype(np.int32)
    trainer.state = trainer._init_state(images)

    step = trainer._eval_step_fn("softmax", with_loss=False)
    x, y = trainer._put_batch(trainer._model_inputs(images),
                              trainer._labels(labels))
    res = step(trainer.state, x, y, jnp.zeros(2, jnp.uint32))

    out = model.apply(
        {"params": trainer.state.params,
         "batch_stats": trainer.state.batch_stats},
        jnp.asarray(images), train=False, mo_flag=True, inference="softmax")
    ref_pred = jnp.argmax(out[0], axis=-1)
    from multiagentperception_tpu.ops.comm import confusion_matrix
    ref_hist = confusion_matrix(y, ref_pred, 11)
    np.testing.assert_allclose(np.asarray(res["hist"]), np.asarray(ref_hist))
