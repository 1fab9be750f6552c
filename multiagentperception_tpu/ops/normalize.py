"""On-device input normalization.

The reference normalizes on the host in float64 and ships float32 tensors to
the device (airsim_loader.py:515-540) — 12 bytes/pixel over the host link for
a 3-channel image. TPU-native version: ship raw uint8 (3 bytes/pixel, 4x less
host->device traffic) and fuse RGB->BGR + mean-subtract + /255 into the jitted
step, where it costs one VPU pass that XLA fuses into the first conv's input
read.
"""

from __future__ import annotations

import jax.numpy as jnp

# ImageNet-ish BGR mean, the reference's airsim constant (airsim_loader.py:191)
MEAN_RGB = (103.939, 116.779, 123.68)


def normalize_images(
    images: jnp.ndarray, img_norm: bool = True, dtype=jnp.float32
) -> jnp.ndarray:
    """uint8 RGB (..., H, W, 3) -> normalized BGR float, matching the
    reference transform: RGB->BGR, subtract mean, /255."""
    x = images.astype(dtype)[..., ::-1]  # RGB -> BGR
    mean = jnp.asarray(MEAN_RGB, dtype)
    x = x - mean
    if img_norm:
        x = x / 255.0
    return x
