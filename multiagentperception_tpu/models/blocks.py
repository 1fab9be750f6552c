"""NN primitive blocks (flax.linen, NHWC, bf16-matmul-friendly).

TPU-native equivalents of the reference's conv2DBatchNormRelu /
deconv2DBatchNormRelu / conv2DBatchNorm primitives
(reference: ptsemseg/models/utils.py:9-168). Layout is NHWC (TPU-friendly)
instead of the reference's NCHW; BatchNorm keeps train/eval modes and running
stats in the ``batch_stats`` collection with torch-equivalent momentum
(torch momentum 0.1 == flax decay 0.9) and eps 1e-5.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

# Compute dtype convention: ``dtype=None`` keeps f32; pass jnp.bfloat16 for
# mixed precision (params and BN stats stay f32 via param_dtype).
Dtype = Any

# He-normal for relu conv towers; the reference trains from random init
# (backbone.py:63 `pretrained=None`) so init parity is "sane", not bitwise.
conv_init = nn.initializers.he_normal()

BN_MOMENTUM = 0.9  # flax decay == 1 - torch momentum (0.1)
BN_EPS = 1e-5


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-stat semantics.

    flax's ``nn.BatchNorm`` EMAs the BIASED batch variance into ``var``;
    torch normalizes with the biased variance but stores the UNBIASED one
    (``n/(n-1)``) in ``running_var`` (torch ``_BatchNorm.forward``). The two
    are indistinguishable at large reduction counts, but the deep policy
    convs reduce over only n = B*N*h*w ≈ 6-24 elements where the correction
    is 4-20% — caught by the first-step running-stat check in
    tests/test_parity.py::test_train_step_parity. Variable layout matches
    ``nn.BatchNorm`` (params scale/bias, batch_stats mean/var), so
    checkpoints and the torch importer/exporter are unaffected (call sites
    pin ``name="BatchNorm_N"`` to keep the auto-numbered paths).
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM  # flax-style decay (1 - torch momentum)
    epsilon: float = BN_EPS
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        x32 = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axes)
            # biased variance normalizes the batch (torch does the same)
            var = jnp.mean(jnp.square(x32), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = (
                    m * ra_var.value + (1 - m) * var * (n / max(n - 1, 1)))
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class ConvBNRelu(nn.Module):
    """Conv -> BatchNorm -> ReLU (reference: models/utils.py:87-120)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    use_bias: bool = True
    relu: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # Explicit symmetric padding (k-1)//2 == the reference's torch
        # `padding=1` for its 3x3 convs. This equals SAME at stride 1 but at
        # stride 2 SAME pads (0, 1) while torch pads (1, 1) — different window
        # alignment, so explicit padding is required for reference parity.
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(p, p), (p, p)],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        x = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, name="BatchNorm_0")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvBN(ConvBNRelu):
    """Conv -> BatchNorm (reference: models/utils.py:9-40)."""

    relu: bool = False


class DeconvBNRelu(nn.Module):
    """ConvTranspose(x2 up) -> BatchNorm -> ReLU (models/utils.py:148-168).

    The reference always uses k=3, stride=2, padding=1, output_padding=1 —
    an exact 2x upsample. The torch-equivalent explicit pads on the
    lhs-dilated input are (k-1-p, k-1-p+op) = (1, 2): flax 'SAME' produces
    the same output SHAPE but splits the padding differently, mis-aligning
    every deconv output by one pixel (caught by the torch parity goldens).
    """

    features: int
    kernel_size: int = 3
    strides: int = 2
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        p = (self.kernel_size - 2, self.kernel_size - 1)  # torch p=1, op=1
        x = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=(p, p),
            kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        x = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, name="BatchNorm_0")(x)
        return nn.relu(x)


class MLP(nn.Module):
    """Flatten -> Dense stack with interior ReLUs (km_generator/linear heads,
    reference: agent.py:145-178)."""

    features: tuple[int, ...]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape(x.shape[0], -1)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, kernel_init=nn.initializers.xavier_normal(),
                         dtype=self.dtype)(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    """ResNet-v1 basic block (two 3x3 convs + identity/projection shortcut)."""

    features: int
    strides: int = 1
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        residual = x
        # torch-style padding=1 (see ConvBNRelu: SAME mis-aligns at stride 2)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, kernel_init=conv_init,
            dtype=self.dtype,
        )(x)
        y = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, name="BatchNorm_0")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False,
            kernel_init=conv_init, dtype=self.dtype,
        )(y)
        y = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype, name="BatchNorm_1")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            )(residual)
            residual = TorchBatchNorm(use_running_average=not train,
                                      dtype=self.dtype,
                                      name="BatchNorm_2")(residual)
        return nn.relu(y + residual)
