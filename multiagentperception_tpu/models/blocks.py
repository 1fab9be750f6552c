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
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
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
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            dtype=self.dtype,
        )(x)
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
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding="SAME", use_bias=False,
            kernel_init=conv_init, dtype=self.dtype,
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            )(residual)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=BN_MOMENTUM,
                epsilon=BN_EPS, dtype=self.dtype,
            )(residual)
        return nn.relu(y + residual)
