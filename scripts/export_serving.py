"""Export CLI: serialize a trained checkpoint's eval step for serving.

    python scripts/export_serving.py --config <yml> --model_path <ckpt> \
        --out model.stablehlo [--batch 8] [--inference activated]

Produces a portable StableHLO artifact (jax.export) that a serving binary
rehydrates without Python model code — see multiagentperception_tpu/export.py.

``--torch_out <path.pkl>`` additionally writes the checkpoint back in the
reference's PyTorch format (compat/torch_export.py) so it loads in the
original GT-RIPL/MultiAgentPerception code.

``--int8`` exports the post-training-quantized graph (quantize.py): conv
towers run int8 on the MXU. ``--calib_data <dataset_root>`` calibrates
static activation scales from real frames (recommended; falls back to
dynamic per-tensor scaling without it).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser(description="serving export")
    p.add_argument("--config", required=True)
    p.add_argument("--model_path", default=None,
                   help="checkpoint dir; omit to export random-init weights")
    p.add_argument("--out", default=None,
                   help="StableHLO artifact path (jax.export)")
    p.add_argument("--torch_out", default=None,
                   help="also write a reference-format torch .pkl")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--inference", default="activated")
    p.add_argument("--int8", action="store_true",
                   help="post-training int8 quantized export")
    p.add_argument("--calib_data", default=None,
                   help="dataset root for static activation calibration "
                        "(with --int8); defaults to cfg data.path")
    p.add_argument("--calib_batches", type=int, default=4)
    args = p.parse_args()
    if not (args.out or args.torch_out):
        p.error("need --out and/or --torch_out")

    from multiagentperception_tpu.config import load_config

    cfg = load_config(args.config)

    # without the platform override, a CPU session would export a
    # tpu-platform artifact that serve.py then cannot run
    from multiagentperception_tpu.utils import (
        apply_platform_override,
        enable_compile_cache,
    )

    apply_platform_override()
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.checkpoint import load_checkpoint
    from multiagentperception_tpu.export import export_serving
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.utils import init_variables

    n = cfg["model"]["agent_num"]
    img = cfg["data"]["img_rows"]
    mo = bool(cfg["model"].get("multiple_output"))
    model = get_model(cfg, 11)
    shape = (args.batch, n, img, img, 3)
    x = jnp.zeros(shape, jnp.float32)
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)}, x,
        train=False, mo_flag=mo, inference=args.inference,
    )
    if args.model_path:
        restored = load_checkpoint(args.model_path)
        variables = {
            "params": restored["model_state"]["params"],
            "batch_stats": restored["model_state"]["batch_stats"],
        }
    act_scales = None
    if args.int8:
        from multiagentperception_tpu.quantize import calibrate_activations

        calib_model = model
        if cfg["model"].get("remat"):
            # the calibration recorder cannot capture inside nn.remat
            # regions; remat doesn't change the param tree, so calibrate on
            # a remat-free twin (see quantize.calibrate_activations)
            calib_model = get_model(
                {**cfg, "model": {**cfg["model"], "remat": False}}, 11)
        root = args.calib_data or cfg["data"].get("path")
        batches = _calibration_batches(cfg, root, args.batch,
                                       args.calib_batches)
        if batches:
            act_scales = calibrate_activations(
                calib_model, variables, batches,
                train=False, mo_flag=mo, inference=args.inference)
            print(f"calibrated {len(act_scales)} convs "
                  f"from {len(batches)} batches")
        else:
            print("no calibration data found; int8 export uses dynamic "
                  "activation scales (slower on TPU)")

    if args.out:
        artifact = export_serving(
            model, variables, shape, inference=args.inference, mo_flag=mo,
            int8=args.int8, act_scales=act_scales,
        )
        with open(args.out, "wb") as f:
            f.write(artifact)
        # provenance sidecar (shape/dtype already ride inside the artifact's
        # serialized input avals — serve.py reads those; this records what
        # the avals can't: the config and mode the artifact was built from)
        import hashlib
        import json

        with open(args.config, "rb") as f:
            cfg_sha = hashlib.sha256(f.read()).hexdigest()
        with open(args.out + ".meta.json", "w") as f:
            json.dump({
                "input_shape": list(shape), "input_dtype": "float32",
                "inference": args.inference, "mo_flag": mo,
                "int8": bool(args.int8), "config": args.config,
                "config_sha256": cfg_sha, "model_path": args.model_path,
                "arch": cfg["model"]["arch"],
            }, f, indent=1)
        print(f"wrote {args.out} ({len(artifact)/1e6:.1f} MB, input {shape}, "
              f"inference={args.inference}) + .meta.json")
    if args.torch_out:
        from multiagentperception_tpu.compat import save_reference_checkpoint

        save_reference_checkpoint(cfg, jax.device_get(variables),
                                  args.torch_out)
        print(f"wrote {args.torch_out} (reference torch format)")


def _calibration_batches(cfg, root, batch, n_batches):
    """A few real image batches from the train split for scale calibration;
    [] if the dataset is unavailable."""
    import numpy as np

    try:
        from multiagentperception_tpu.data import AirsimDataset

        ds = AirsimDataset(
            root=root, split=cfg["data"].get("train_split", "train"),
            img_size=(cfg["data"]["img_rows"], cfg["data"]["img_cols"]),
            target_view=cfg["data"].get("target_view", "target"),
        )
    except Exception as e:
        print(f"calibration loader unavailable ({e!r})")
        return []
    batches = []
    idx = 0
    for _ in range(n_batches):
        ims = []
        for _ in range(batch):
            if idx >= len(ds):
                idx = 0
            ims.append(np.asarray(ds[idx][0]))
            idx += 1
        batches.append(np.stack(ims))
        if len(ds) <= batch:
            break  # tiny fixture: one pass is all the data there is
    return batches


if __name__ == "__main__":
    main()
