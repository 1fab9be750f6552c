"""Bilinear upsampling as MXU matmuls.

``jax.image.resize`` lowers to gather chains that run tens of ms for the
decoder's x32 upsample to (B*N, 512, 512, 11) — about half the whole eval
step. A separable bilinear resize is exactly two dense contractions with
constant interpolation-weight matrices:

    out[b, O, P, c] = sum_{h, w} Wy[O, h] * x[b, h, w, c] * Wx[P, w]

Each weight row has <=2 nonzeros but the matrices are tiny ((512, 16) for the
x32 case), so doing them dense on the MXU is far cheaper than gathering.
Geometry matches half-pixel-centered bilinear (torch align_corners=False /
jax.image.resize 'bilinear'): src = (dst + 0.5) / scale - 0.5, edge-clamped.

An ``align_corners=True`` variant covers the loss-path resize
(reference loss.py:11 uses align_corners=True when upsampling logits).
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _weight_matrix(src: int, dst: int, align_corners: bool = False) -> np.ndarray:
    """(dst, src) bilinear interpolation weights, rows sum to 1."""
    w = np.zeros((dst, src), dtype=np.float32)
    if align_corners and dst > 1:
        coords = np.arange(dst) * (src - 1) / (dst - 1)
    else:
        coords = (np.arange(dst) + 0.5) * src / dst - 0.5
    lo = np.clip(np.floor(coords).astype(np.int64), 0, src - 1)
    hi = np.clip(lo + 1, 0, src - 1)
    frac = np.clip(coords - np.floor(coords), 0.0, 1.0)
    frac = np.where(coords < 0, 0.0, np.where(coords > src - 1, 0.0, frac))
    rows = np.arange(dst)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w


def bilinear_resize(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = False
) -> jnp.ndarray:
    """Separable bilinear resize of NHWC via two matmuls (MXU-friendly)."""
    b, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    wy = jnp.asarray(_weight_matrix(h, out_h, align_corners), x.dtype)
    wx = jnp.asarray(_weight_matrix(w, out_w, align_corners), x.dtype)
    # rows first: (B, H', w, C)
    y = jnp.einsum("Oh,bhwc->bOwc", wy, x)
    return jnp.einsum("Pw,bOwc->bOPc", wx, y)
