"""Visualization tools: colorizer vs the reference's loop formulation,
panel/graph geometry, draw_bounding, and an e2e gallery dump from a trained
checkpoint (the visual module the reference imports but doesn't ship,
reference test.py:14)."""

import logging
import os

import numpy as np
import pytest

from multiagentperception_tpu.visual import (
    colorize_segmap,
    comm_graph_image,
    denormalize_image,
    draw_bounding,
    prediction_panel,
)

logger = logging.getLogger("test")


def test_colorize_matches_reference_loop(rng):
    """The LUT gather reproduces the per-class loop of
    airsim_loader.py:542-555 (scaled to uint8)."""
    from multiagentperception_tpu.data.airsim import ID2NAME, NAME2COLOR

    labels = rng.integers(0, 11, size=(16, 16))
    got = colorize_segmap(labels)
    want = np.zeros((16, 16, 3))
    for i, name in ID2NAME.items():
        color = NAME2COLOR[name][0]
        for c in range(3):
            want[:, :, c][labels == i] = color[c]
    np.testing.assert_array_equal(got, want.astype(np.uint8))
    assert got.dtype == np.uint8


def test_denormalize_inverts_loader_transform(rng):
    from multiagentperception_tpu.data.airsim import MEAN_RGB

    raw = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    # the loader transform: RGB->BGR, -mean, /255 (airsim_loader.py:515-540)
    normalized = (raw[:, :, ::-1].astype(np.float64) - MEAN_RGB) / 255.0
    back = denormalize_image(normalized.astype(np.float32))
    np.testing.assert_array_equal(back, raw)


def test_draw_bounding_edges_only():
    img = np.zeros((20, 20, 3), np.uint8)
    out = draw_bounding(img, [(2, 3, 10, 12)], color=(9, 8, 7), thickness=1)
    assert tuple(out[3, 2]) == (9, 8, 7)    # left edge
    assert tuple(out[12, 10]) == (9, 8, 7)  # bottom-right corner
    assert tuple(out[7, 6]) == (0, 0, 0)    # interior untouched
    assert tuple(img[3, 2]) == (0, 0, 0)    # input not mutated


def test_prediction_panel_geometry(rng):
    img = rng.normal(size=(32, 32, 3)).astype(np.float32)
    gt = rng.integers(0, 11, size=(32, 32))
    pred = rng.integers(0, 11, size=(32, 32))
    panel = prediction_panel(img, gt, pred, pad=4)
    assert panel.shape == (32, 32 * 3 + 8, 3)
    assert panel.dtype == np.uint8


def test_comm_graph_marks_selected_links(rng):
    prob = np.full((4, 4), 0.1)
    prob[2, 1] = 0.9  # query 1 picks key 2
    img = comm_graph_image(prob, cell=10)
    assert img.shape == (40, 40, 3)
    # red border at the (k=2, q=1) cell
    assert tuple(img[20, 10]) == (220, 30, 30)
    # the hottest cell interior is brighter than a cold one
    assert img[25, 15].sum() > img[5, 5].sum()


@pytest.mark.slow
def test_eval_gallery_e2e(tmp_path, monkeypatch):
    """Train MIMOcom two steps on the fixture, then dump panels + the comm
    graph through the CLI-facing gallery path."""
    from multiagentperception_tpu.data import AirsimDataset, DataLoader
    from multiagentperception_tpu.data.synthetic import generate_fixture
    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer
    from multiagentperception_tpu.visual import save_eval_gallery

    H = 64
    root = str(tmp_path / "data")
    generate_fixture(root, target_view="6agent", img_size=H, frames_per_traj=2)
    monkeypatch.chdir(tmp_path)
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6, "multiple_output": True,
                  "query_size": 8, "key_size": 32},
        "data": {"path": root, "img_rows": H, "img_cols": H,
                 "target_view": "6agent", "commun_label": "mimo"},
        "training": {"train_iters": 2, "batch_size": 2, "val_interval": 2,
                     "n_workers": 2, "print_interval": 1},
    })
    common = dict(root=root, img_size=(H, H), commun_label="mimo",
                  target_view="6agent")
    tl = DataLoader(AirsimDataset(split="train", **common), 2,
                    shuffle=True, drop_last=True, num_workers=2)
    vl = DataLoader(AirsimDataset(split="val", **common), 2, num_workers=2)
    trainer = get_trainer(cfg)(
        cfg, None, logger, get_model(cfg, 11), get_loss_function(cfg),
        tl, vl, get_optimizer(cfg))
    save_path = trainer.train()
    trainer.load_weight(save_path)

    out = str(tmp_path / "viz")
    paths = save_eval_gallery(trainer, vl, out, max_batches=1)
    panels = [p for p in paths if "panel" in os.path.basename(p)]
    graphs = [p for p in paths if "comm_graph" in os.path.basename(p)]
    assert panels and graphs
    import cv2

    panel = cv2.imread(panels[0])
    assert panel is not None and panel.shape[0] == H
    g = cv2.imread(graphs[0])
    assert g is not None and g.shape[0] == g.shape[1]  # N x N cells
