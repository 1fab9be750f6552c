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
    parser.add_argument("--agent_parallel", nargs="?", type=int, default=0,
                        help="shard the AGENT axis over this many devices: "
                             "MIMOcom's value fusion runs as an ICI ring "
                             "(large-N scaling; also model.agent_parallel)")
    parser.add_argument("--int8", action="store_true",
                        help="post-training-quantized serving path "
                             "(1.27x measured at mIoU parity)")
    parser.add_argument("--calib_split", nargs="?", type=str, default="train",
                        help="dataset split activation scales calibrate on "
                             "(with --int8; default train — held out from "
                             "the evaluated split)")
    parser.add_argument("--calib_batches", nargs="?", type=int, default=None,
                        help="calibration batches (default "
                             "training.calib_batches or 4)")
    args = parser.parse_args()

    from multiagentperception_tpu.config import load_config

    cfg = load_config(args.config)

    from multiagentperception_tpu.utils import (
        apply_platform_override,
        enable_compile_cache,
        enable_hang_debug,
    )

    apply_platform_override()
    enable_compile_cache()
    enable_hang_debug()

    import logging

    from multiagentperception_tpu.data import DataLoader, get_loader
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    data_cfg = cfg["data"]
    loader_cls = get_loader(data_cfg["dataset"])
    common = dict(
        root=data_cfg["path"],
        img_size=(data_cfg["img_rows"], data_cfg["img_cols"]),
        commun_label=data_cfg["commun_label"],
        target_view=data_cfg["target_view"],
        raw_images=bool(data_cfg.get("on_device_normalize")),
        noisy_type=data_cfg.get("noisy_type"),
        cache_decoded=data_cfg.get("cache_decoded"),
    )
    te_dataset = loader_cls(split=data_cfg["test_split"], **common)
    testloader = DataLoader(
        te_dataset, cfg["training"]["batch_size"],
        num_workers=cfg["training"]["n_workers"],
    )

    # int8 calibration frames come from a split held out from the one being
    # evaluated (default train) — eval-data leakage into the quantization
    # config would flatter the parity numbers
    calib_loader = None
    if args.int8:
        if args.calib_batches:
            cfg["training"]["calib_batches"] = args.calib_batches
        try:
            calib_ds = loader_cls(split=args.calib_split, **common)
            calib_loader = DataLoader(
                calib_ds, cfg["training"]["batch_size"], num_workers=0)
        except Exception as e:
            print(f"calibration split '{args.calib_split}' unavailable "
                  f"({e!r}); calibrating on the evaluated split")

    from multiagentperception_tpu.parallel import (
        agent_parallel_mesh,
        data_parallel_mesh,
    )

    # agent-axis model parallelism (MIMOcom ring fusion over ICI); with
    # --data_parallel D too, a combined ('data', 'agent') mesh shards eval
    # batches over D independent rings
    a_mesh = agent_parallel_mesh(cfg, args.agent_parallel,
                                 n_data=args.data_parallel)
    model = get_model(cfg, n_classes=11, agent_mesh=a_mesh)
    tx = get_optimizer(cfg)
    loss_fn = get_loss_function(cfg)
    logger = logging.getLogger("multiagentperception_tpu")

    # sharded eval (same device-selection policy as train.py); a pure agent
    # ring owns its devices — only a combined mesh also batch-shards
    if a_mesh is not None:
        mesh = a_mesh if "data" in a_mesh.axis_names else None
    else:
        mesh = data_parallel_mesh(
            cfg["training"]["batch_size"], args.data_parallel)

    trainer_cls = get_trainer(cfg)
    trainer = trainer_cls(
        cfg, None, logger, model, loss_fn, None, testloader, tx, mesh=mesh
    )
    trainer.load_weight(args.model_path)
    trainer.evaluate(testloader, inference_mode=args.inference_mode,
                     int8=args.int8, calib_loader=calib_loader)


if __name__ == "__main__":
    main()
