"""Debug probes (reference: ptsemseg/probe.py:3-12 get_vectorize_grad)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_vectorize_grad(grads) -> jnp.ndarray:
    """Flatten a gradient PyTree into one vector (reference: probe.py:3-12)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.concatenate([jnp.ravel(g) for g in leaves])


def grad_global_norm(grads) -> jnp.ndarray:
    """Global L2 norm of a gradient PyTree (jit-safe)."""
    leaves = jax.tree_util.tree_leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def save_tensor_image(images: np.ndarray, out_dir: str = "debug_tmp",
                      mean_rgb=(103.939, 116.779, 123.68)):
    """Dump normalized (B, N, H, W, 3) batches back to PNGs for eyeballing
    (reference: airsim_loader.py:558-571 save_tensor_imag)."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    images = np.asarray(images)
    if images.ndim == 4:
        images = images[:, None]
    mean = np.asarray(mean_rgb)
    for b in range(images.shape[0]):
        for v in range(images.shape[1]):
            img = images[b, v] * 255.0 + mean
            cv2.imwrite(
                os.path.join(out_dir, f"img_b{b}_v{v}.png"),
                np.clip(img, 0, 255).astype(np.uint8),
            )
