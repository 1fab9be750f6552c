"""Visualization CLI: dump prediction panels + communication graphs from a
checkpoint (the working version of the visual tooling the reference's
test.py:14 imports but doesn't ship).

    python scripts/visualize.py --config <yml> --model_path <ckpt> \
        [--out_dir viz] [--split test] [--n_batches 1] [--inference_mode m]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="visualize")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--out_dir", type=str, default="viz")
    parser.add_argument("--split", type=str, default=None,
                        help="data split (default: the config's test_split)")
    parser.add_argument("--n_batches", type=int, default=1)
    parser.add_argument("--inference_mode", type=str, default=None)
    args = parser.parse_args()

    from multiagentperception_tpu.config import load_config
    from multiagentperception_tpu.data import DataLoader, get_loader
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer
    from multiagentperception_tpu.visual import save_eval_gallery

    cfg = load_config(args.config)
    data_cfg = cfg["data"]
    dataset = get_loader(data_cfg["dataset"])(
        root=data_cfg["path"],
        split=args.split or data_cfg["test_split"],
        img_size=(data_cfg["img_rows"], data_cfg["img_cols"]),
        commun_label=data_cfg["commun_label"],
        target_view=data_cfg["target_view"],
        raw_images=bool(data_cfg.get("on_device_normalize")),
        noisy_type=data_cfg.get("noisy_type"),
        cache_decoded=data_cfg.get("cache_decoded"),
    )
    loader = DataLoader(dataset, cfg["training"]["batch_size"],
                        num_workers=cfg["training"]["n_workers"])

    model = get_model(cfg, n_classes=11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("multiagentperception_tpu"), model,
        get_loss_function(cfg), None, loader, get_optimizer(cfg),
    )
    trainer.load_weight(args.model_path)
    paths = save_eval_gallery(trainer, loader, args.out_dir,
                              max_batches=args.n_batches,
                              inference_mode=args.inference_mode)
    print(f"wrote {len(paths)} images to {args.out_dir}:")
    for p in paths:
        print(" ", p)


if __name__ == "__main__":
    main()
