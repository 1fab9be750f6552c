"""Synthetic AirSim-MAP-shaped fixture generator.

The reference has no tests and no synthetic data (SURVEY.md §4); this fills
that gap: it writes random PNGs in the exact directory layout the loader
indexes (root/<modality>/<weather>/<traj>/<cam>/<frame>.png,
reference airsim_loader.py:236-252) plus ``gt_when_to_communicate.txt`` /
``gt_mimo_communicate.txt`` files in the formats parsed at
airsim_loader.py:412-438 — so the loader, trainers, metrics, and both CLI
entry points are testable end-to-end without the real dataset.
"""

from __future__ import annotations

import os
import random

import numpy as np

from multiagentperception_tpu.data.airsim import (
    IMAGE_MODES,
    WEATHER,
    generate_split_subdirs,
    get_cam_pos,
)


def generate_fixture(
    root: str,
    target_view: str = "6agent",
    img_size: int = 128,
    frames_per_traj: int = 2,
    n_train: int = 2,
    n_val: int = 1,
    n_test: int = 1,
    n_classes: int = 11,
    seed: int = 0,
) -> dict:
    """Create a tiny on-disk dataset. Returns a manifest dict."""
    import cv2

    rng = np.random.default_rng(seed)
    pyrng = random.Random(seed)
    cams = get_cam_pos(target_view)
    n_agents = len(cams)
    subdirs = generate_split_subdirs()
    chosen = (
        subdirs["train"][:n_train]
        + subdirs["val"][:n_val]
        + subdirs["test"][:n_test]
    )

    when_lines, mimo_lines = [], []
    manifest = {"root": root, "trajs": [], "cams": cams}
    for traj_glob in chosen:
        traj = traj_glob.rstrip("*")  # on-disk dir name matches the glob stem
        manifest["trajs"].append(traj)
        for frame_idx in range(frames_per_traj):
            frame = f"{frame_idx:06d}.png"
            for cam in cams:
                for modal in IMAGE_MODES:
                    d = os.path.join(root, modal, WEATHER, traj, cam)
                    os.makedirs(d, exist_ok=True)
                    if modal == "scene":
                        img = rng.integers(0, 256, (img_size, img_size, 3), np.uint8)
                    else:
                        lbl = rng.integers(0, n_classes, (img_size, img_size), np.uint8)
                        img = np.stack([lbl] * 3, axis=-1)
                    cv2.imwrite(os.path.join(d, frame), img)
            # communication labels (key: '<traj>/<frame>.png')
            # the parser takes split('/')[-3] as the trajectory dir and
            # split('/')[-1] as the frame stem (airsim_loader.py:420-434)
            stem = frame[:-4]
            label_path = f"scene/{traj}/{cams[0]}/{stem}"
            # when2com: -1 (normal) .. n_agents-2 (index of gt supporter)
            when_label = pyrng.randint(-1, n_agents - 2)
            when_lines.append(f"{frame_idx} {when_label} {label_path}")
            # mimo: per-agent noise flags + link targets
            noise = tuple(pyrng.randint(0, 1) for _ in range(n_agents))
            link = tuple(pyrng.randrange(n_agents) for _ in range(n_agents))
            mimo_lines.append(f"{noise} {link} {label_path}")

    with open(os.path.join(root, "gt_when_to_communicate.txt"), "w") as f:
        f.write("\n".join(when_lines) + "\n")
    with open(os.path.join(root, "gt_mimo_communicate.txt"), "w") as f:
        f.write("\n".join(mimo_lines) + "\n")
    return manifest
