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


def generate_informative_fixture(
    root: str,
    target_view: str = "6agent",
    img_size: int = 128,
    frames_per_traj: int = 8,
    n_train: int = 2,
    n_val: int = 1,
    n_test: int = 1,
    n_noisy: int = 2,
    n_classes: int = 11,
    seed: int = 0,
) -> dict:
    """Fixture whose noise/link labels are *informative* — the learning-proof
    dataset (the plain fixture's labels are random, so nothing ties the
    communication graph to the task).

    Construction per frame:

    - every agent gets content drawn as a random class map on a coarse
      ``img_size/32`` grid, rendered to blocks (spatially recoverable from the
      1/32-resolution feature map through the x32 decoder);
    - ``n_noisy`` agents are degraded: their observed scene is the occluded
      content (``generate_noise('occlusion')`` zeroes the bottom 4/5 rows,
      reference process_img.py:10-14) while their segmentation label stays the
      full content — so a degraded agent *cannot* predict its label from its
      own view;
    - each degraded agent is assigned a distinct normal partner who observes
      the SAME content cleanly (full view overlap) — fusing the partner's
      feature map is the only way to segment the occluded region;
    - mimo labels: noise flags mark the degraded agents, link targets point at
      the partners (self for normal agents), matching the reference's gt
      action semantics (metrics.py:66: ``link*noise + self*(1-noise)``).

    A when2com model trained on this set must (a) reach high mIoU on the
    memorized frames and (b) attend degraded->partner, i.e. selection
    accuracy well above the always-self baseline of (N-n_noisy)/N.
    """
    import cv2

    from multiagentperception_tpu.data.noise import generate_noise

    rng = np.random.default_rng(seed)
    cams = get_cam_pos(target_view)
    n_agents = len(cams)
    assert 0 < n_noisy <= n_agents // 2, "each noisy agent needs its own partner"
    subdirs = generate_split_subdirs()
    chosen = {
        "train": subdirs["train"][:n_train],
        "val": subdirs["val"][:n_val],
        "test": subdirs["test"][:n_test],
    }
    cell = 32  # one block per 1/32-res feature cell
    grid = img_size // cell
    # class -> brightness rendering: inverted by the decoder as a pointwise map
    palette = np.linspace(30, 250, n_classes).astype(np.uint8)

    def render(cls_small: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lbl = np.repeat(np.repeat(cls_small, cell, 0), cell, 1).astype(np.uint8)
        img = np.stack([palette[lbl]] * 3, axis=-1)
        return img, lbl

    when_lines, mimo_lines = [], []
    manifest = {"root": root, "trajs": [], "cams": cams, "informative": True}
    for split_dirs in chosen.values():
        for traj_glob in split_dirs:
            traj = traj_glob.rstrip("*")
            manifest["trajs"].append(traj)
            for frame_idx in range(frames_per_traj):
                frame = f"{frame_idx:06d}.png"
                contents = [
                    rng.integers(0, n_classes, (grid, grid)) for _ in range(n_agents)
                ]
                order = rng.permutation(n_agents)
                noisy = order[:n_noisy]
                partners = order[n_noisy: 2 * n_noisy]
                link = list(range(n_agents))
                noise_flags = [0] * n_agents
                for i, j in zip(noisy, partners):
                    contents[j] = contents[i]  # partner shares the view
                    link[i] = int(j)
                    noise_flags[i] = 1
                for a, cam in enumerate(cams):
                    img, lbl = render(contents[a])
                    if noise_flags[a]:
                        img = generate_noise(img, "occlusion")
                    for modal in IMAGE_MODES:
                        d = os.path.join(root, modal, WEATHER, traj, cam)
                        os.makedirs(d, exist_ok=True)
                        out = img if modal == "scene" else np.stack([lbl] * 3, -1)
                        cv2.imwrite(os.path.join(d, frame), out)
                stem = frame[:-4]
                label_path = f"scene/{traj}/{cams[0]}/{stem}"
                # when2com view (requester = agent 0): -1 when normal, else
                # the supporter's index among agents 1..N-1 (0-based)
                when_label = link[0] - 1 if noise_flags[0] else -1
                when_lines.append(f"{frame_idx} {when_label} {label_path}")
                mimo_lines.append(
                    f"{tuple(noise_flags)} {tuple(link)} {label_path}")

    with open(os.path.join(root, "gt_when_to_communicate.txt"), "w") as f:
        f.write("\n".join(when_lines) + "\n")
    with open(os.path.join(root, "gt_mimo_communicate.txt"), "w") as f:
        f.write("\n".join(mimo_lines) + "\n")
    return manifest
