"""Shared model sub-modules (reference: ptsemseg/models/agent.py:39-189)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from multiagentperception_tpu.models.backbone import get_decoder, get_encoder
from multiagentperception_tpu.models.blocks import MLP, ConvBNRelu, DeconvBNRelu


class ImgEncoder(nn.Module):
    """Backbone + squeezer conv -> feat_channel map @ 1/32 (or /64, /128)
    (reference: agent.py:39-60)."""

    feat_channel: int = 512
    feat_squeezer: int = -1  # -1 | 2 | 4
    enc_backbone: str = "resnet_encoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = get_encoder(self.enc_backbone)(dtype=self.dtype)(x, train)
        stride = self.feat_squeezer if self.feat_squeezer in (2, 4) else 1
        return ConvBNRelu(self.feat_channel, 3, stride, dtype=self.dtype)(x, train)


class ImgDecoder(nn.Module):
    """Optional de-squeeze deconvs + decoder backbone -> per-class logits
    (reference: agent.py:63-89)."""

    n_classes: int = 11
    feat_squeezer: int = -1
    dec_backbone: str = "simple_decoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.feat_squeezer == 2:
            x = DeconvBNRelu(x.shape[-1], dtype=self.dtype)(x, train)
        elif self.feat_squeezer == 4:
            x = DeconvBNRelu(512, dtype=self.dtype)(x, train)
            x = DeconvBNRelu(512, dtype=self.dtype)(x, train)
        return get_decoder(self.dec_backbone)(
            n_classes=self.n_classes, dtype=self.dtype
        )(x, train)


class MsgGenerator(nn.Module):
    """5-conv message compressor 512->message_size channels
    (reference: agent.py:92-111; defined-but-unused by the shipped models,
    kept for surface parity)."""

    message_size: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for feats in (256, 128, 64, 64, self.message_size):
            x = ConvBNRelu(feats, 3, 1, dtype=self.dtype)(x, train)
        return x


class PolicyNet4(nn.Module):
    """Separate image encoder + 5 convs (two stride-2) -> 256ch @ 1/128 input
    resolution; the shared trunk feeding the query/key MLP heads
    (reference: agent.py:114-142). Separate weights from the value encoder by
    design — key/query learning is detached from value learning."""

    enc_backbone: str = "resnet_encoder"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = ImgEncoder(enc_backbone=self.enc_backbone, dtype=self.dtype)(x, train)
        for feats, stride in [(512, 1), (256, 1), (256, 2), (256, 1), (256, 2)]:
            x = ConvBNRelu(feats, 3, stride, dtype=self.dtype)(x, train)
        return x


class KMGenerator(nn.Module):
    """MLP head producing key/query vectors from the policy map
    (reference: agent.py:145-159 km_generator == agent.py:162-178 linear)."""

    out_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return MLP((256, 128, self.out_size), dtype=self.dtype)(x)


class ConvHead(nn.Module):
    """1x1-conv key/query head (the reference's ``conv`` head is broken —
    undefined ``input_feat_sz`` at agent.py:184; implemented working here)."""

    out_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        return ConvBNRelu(self.out_size, kernel_size=1, dtype=self.dtype)(x, train)
