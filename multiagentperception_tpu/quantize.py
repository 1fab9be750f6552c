"""Post-training int8 quantization for the serving path.

A production-serving extension with no reference counterpart (the reference
serves full-precision torch, ptsemseg/trainer.py:774-840). Every ``nn.Conv``
in the eval graph is swapped — via a flax method interceptor, zero model-code
changes — for an int8 convolution:

- **weights**: symmetric per-output-channel int8 (scale = max|w|/127). The
  quantization happens inside the traced function, so when weights are baked
  into a serving artifact XLA constant-folds the int8 kernels at compile
  time.
- **activations**: symmetric per-tensor int8. Two modes:
  *static* (recommended): scales come from a one-off calibration pass
  (``calibrate_activations``) and are baked as compile-time constants, so the
  requantize is a pure elementwise op XLA fuses into the surrounding graph;
  *dynamic* (fallback, no calibration data needed): scale computed on the fly
  from max|x| — measured on v5e this full-tensor reduction between every conv
  breaks XLA's conv fusions and costs more than the int8 MXU rate saves
  (0.94x end-to-end vs bf16); use static scales for production serving.
- **accumulation**: int32 on the MXU (``preferred_element_type``), then one
  fused rescale ``y * (s_x * s_w)`` + bias back to the network dtype.

The classifier head (and any conv below ``min_features`` output channels)
stays in the network dtype: its cost is negligible and final logits are the
most precision-sensitive tensor in the graph.

BatchNorm, the comm-graph handshake (softmax/sparsemax over an N<=6 matrix),
and the MLP key/query heads stay in the network dtype — they are a rounding
error of the FLOP budget; the two ResNet-18 towers and decoder convs carry
>99% of it (SURVEY.md §3.3).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _pair(v) -> tuple:
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _canonical_padding(padding, kernel_size):
    """flax padding spec -> lax.conv_general_dilated padding spec."""
    if isinstance(padding, str):
        if padding in ("SAME", "VALID"):
            return padding
        return None  # CIRCULAR etc: not supported, caller falls back
    if isinstance(padding, int):
        return ((padding, padding),) * len(kernel_size)
    canon = []
    for p in padding:
        if isinstance(p, int):
            canon.append((p, p))
        else:
            canon.append(tuple(p))
    return tuple(canon)


def quantize_weight(kernel: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel int8: kernel (kh, kw, cin, cout) ->
    (int8 kernel, f32 per-channel scale)."""
    k32 = kernel.astype(jnp.float32)
    s_w = jnp.max(jnp.abs(k32), axis=tuple(range(k32.ndim - 1))) / 127.0
    s_w = jnp.maximum(s_w, eps)
    w_i8 = jnp.round(k32 / s_w).astype(jnp.int8)
    return w_i8, s_w


def quantize_activation(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-tensor dynamic int8: x -> (int8 x, f32 scalar scale)."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(x32)) / 127.0, eps)
    x_i8 = jnp.round(jnp.clip(x32 / s_x, -127.0, 127.0)).astype(jnp.int8)
    return x_i8, s_x


def _int8_conv(mod: nn.Conv, x: jnp.ndarray,
               act_scale: float | None = None) -> jnp.ndarray | None:
    """Run a bound nn.Conv's computation as an int8 MXU conv. Returns None if
    the conv's configuration isn't supported (caller falls back to f32).

    ``act_scale``: a calibrated static scale (Python float, becomes a
    compile-time constant); None selects dynamic per-tensor scaling."""
    ksize = _pair(mod.kernel_size)
    padding = _canonical_padding(mod.padding, ksize)
    if padding is None or mod.scope is None:
        return None
    kernel = mod.scope.get_variable("params", "kernel")
    if kernel is None:
        return None

    w_i8, s_w = quantize_weight(kernel)
    if act_scale is not None:
        s_x = jnp.float32(act_scale)
        x_i8 = jnp.round(
            jnp.clip(x.astype(jnp.float32) / s_x, -127.0, 127.0)
        ).astype(jnp.int8)
    else:
        x_i8, s_x = quantize_activation(x)

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x_i8, w_i8,
        window_strides=_pair(mod.strides),
        padding=padding,
        lhs_dilation=_pair(getattr(mod, "input_dilation", None)),
        rhs_dilation=_pair(mod.kernel_dilation),
        dimension_numbers=dn,
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_w)
    if mod.use_bias:
        bias = mod.scope.get_variable("params", "bias")
        if bias is not None:
            y = y + bias.astype(jnp.float32)
    out_dtype = mod.dtype or x.dtype
    return y.astype(out_dtype)


def default_skip(mod: nn.Conv, min_features: int = 16) -> bool:
    """Keep tiny heads (the 11-class classifier conv) in full precision."""
    return mod.features < min_features


def int8_interceptor(skip: Callable[[nn.Conv], bool] | None = default_skip,
                     act_scales: dict | None = None):
    """A flax method interceptor replacing every eligible nn.Conv.__call__
    with the int8 path. Use under ``nn.intercept_methods``.

    ``act_scales``: {module path tuple: float scale} from
    ``calibrate_activations``; convs without an entry use dynamic scaling."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (type(mod) is nn.Conv and context.method_name == "__call__"
                and not (skip and skip(mod))):
            scale = None
            if act_scales is not None:
                scale = act_scales.get(tuple(mod.path))
            y = _int8_conv(mod, args[0], act_scale=scale)
            if y is not None:
                return y
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_activations(model, variables, batches,
                          skip: Callable[[nn.Conv], bool] | None = default_skip,
                          **apply_kwargs) -> dict:
    """One-off calibration: run forward passes over ``batches`` recording the
    max |input| of every eligible conv. Returns {module path: float scale}
    for ``int8_interceptor``/``quantized_apply`` — baking these makes the
    requantize ops compile-time-constant elementwise (the fast path).

    The recording forward is jitted (one compiled program returning all the
    per-conv maxes): an eager apply would dispatch op-by-op, which is
    minutes per batch on a remote-dispatch link.

    ``model`` must not contain ``nn.remat`` wrappers: the recorded max is an
    intermediate of the rematerialized region and cannot escape its trace
    (jax.checkpoint replays the region, so "the" intermediate has no single
    identity). Calibrate with a remat-free twin of the model — remat does
    not change the parameter tree, so the scales transfer verbatim (the
    Trainer/CLI entry points do this automatically)."""
    import jax

    def calib_fn(variables, batch):
        maxes: dict = {}

        def recorder(next_fun, args, kwargs, context):
            mod = context.module
            if (type(mod) is nn.Conv and context.method_name == "__call__"
                    and not (skip and skip(mod))):
                p = tuple(mod.path)
                m = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
                maxes[p] = jnp.maximum(maxes[p], m) if p in maxes else m
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(recorder):
            model.apply(variables, batch, **apply_kwargs)
        return maxes

    calib = jax.jit(calib_fn)
    result: dict = {}
    for batch in batches:
        try:
            maxes = calib(variables, batch)
        except jax.errors.UnexpectedTracerError as e:
            raise ValueError(
                "calibrate_activations cannot record inside nn.remat "
                "regions (rematerialization replays them). Calibrate with a "
                "remat-free build of the model — same config with "
                "model.remat off; the parameter tree and therefore the "
                "scales are identical."
            ) from e
        for p, m in maxes.items():
            m = float(m)
            result[p] = max(result.get(p, 0.0), m)
    return {p: max(m / 127.0, 1e-8) for p, m in result.items()}


def scales_to_json(act_scales: dict) -> dict:
    """{path tuple: scale} -> JSON-serializable {'a/b/c': scale}."""
    return {"/".join(p): s for p, s in act_scales.items()}


def scales_from_json(obj: dict) -> dict:
    """Inverse of scales_to_json."""
    return {tuple(k.split("/")): float(v) for k, v in obj.items()}


def quantized_apply(model, variables, *args,
                    skip: Callable[[nn.Conv], bool] | None = default_skip,
                    act_scales: dict | None = None,
                    **kwargs):
    """model.apply with every eligible conv running int8 (weights quantized
    in-trace, so baked-weight exports constant-fold the int8 kernels)."""
    with nn.intercept_methods(int8_interceptor(skip, act_scales)):
        return model.apply(variables, *args, **kwargs)


def make_int8_eval_fn(model, mo_flag: bool = True,
                      inference: str = "activated",
                      skip: Callable[[nn.Conv], bool] | None = default_skip,
                      act_scales: dict | None = None):
    """int8 version of export.make_eval_fn: images -> (class map, comm graph,
    per-frame bandwidth). The interceptor wraps the apply *inside* the
    function, so any jit/export trace picks up the quantized graph; the
    bandwidth accounting is export.make_eval_fn's, not a copy."""
    from multiagentperception_tpu.export import make_eval_fn

    def apply(variables, images, **kwargs):
        return quantized_apply(model, variables, images,
                               skip=skip, act_scales=act_scales, **kwargs)

    return make_eval_fn(model, mo_flag=mo_flag, inference=inference,
                        apply_fn=apply)
