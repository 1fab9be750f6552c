"""Degraded-observation noise injection (reference: ptsemseg/process_img.py:6-35).

Model-level fault injection: the When2com task degrades some agents' views
(occlusion/gaussian/grayscale); the shipped datasets bake the noise in
offline (``noisy_type: None`` in all configs), but the online generators are
kept for parity and for synthetic experiments.
"""

from __future__ import annotations

import numpy as np


def generate_noise(img: np.ndarray, noise_type: str, rng=None) -> np.ndarray:
    """Apply a degradation to an HWC uint8/float image."""
    rng = rng or np.random.default_rng()
    out = img.copy()
    h = img.shape[0]
    if noise_type == "occlusion":
        # zero the bottom 4/5 rows (reference: process_img.py:10-14)
        out[h // 5 :, :, :] = 0
    elif noise_type == "gaussian":
        noise = rng.normal(0, 25, img.shape)
        out = np.clip(img.astype(np.float64) + noise, 0, 255).astype(img.dtype)
    elif noise_type == "grayscale":
        gray = img.mean(axis=-1, keepdims=True)
        out = np.broadcast_to(gray, img.shape).astype(img.dtype).copy()
    elif noise_type == "lowres":
        small = out[::4, ::4]
        out = np.repeat(np.repeat(small, 4, axis=0), 4, axis=1)[
            : img.shape[0], : img.shape[1]
        ]
    elif noise_type in (None, "None"):
        pass
    else:
        raise ValueError(f"Unknown noise type {noise_type}")
    return out
