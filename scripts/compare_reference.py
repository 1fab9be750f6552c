"""Turnkey real-data parity runner (VERDICT round-3 task #7).

Given an AirSim-MAP root and a reference-trained ``.pkl``, this script:

  1. audits the dataset root (scripts/validate_dataset.py);
  2. imports the torch checkpoint and evaluates it in THIS framework
     (compat/torch_import.py via ``Trainer.load_weight``);
  3. evaluates the SAME checkpoint in the reference PyTorch code on CPU
     (compat/torch_ref.py), reproducing the reference trainer's eval
     accounting (/root/reference/ptsemseg/trainer.py:774-840) but through
     our identical metric/data code so the delta isolates the model forward;
  4. prints side-by-side Normal / Noise / Overall tables, selection
     accuracy, bandwidth, and the mIoU delta.

Run:
  python scripts/compare_reference.py --config <yml> --model_path <pkl>
      [--path <dataset root>] [--split test] [--inference_mode activated]
      [--max_batches N] [--skip_torch] [--cpu]

Also runs end-to-end on the synthetic fixture as its own test
(tests/test_compare_reference.py) with a torch-exported random-init
checkpoint — both sides then evaluate identical weights and the deltas
must sit at cross-framework float noise.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------------------
# torch-side evaluation (reference accounting, our metric code)
# --------------------------------------------------------------------------
def evaluate_torch(cfg, model_path, loader, inference_mode, n_classes=11,
                   max_batches=None):
    """Evaluate a reference ``.pkl`` with the reference MODEL code.

    The batch layout conversion mirrors the reference trainers: images
    channel-concat ``(B, 3N, H, W)`` (trainer.py:651), MO labels stacked
    view-major then converted back to our batch-major so BOTH sides feed
    the identical runningScore code.
    """
    import torch

    from multiagentperception_tpu.compat.torch_ref import build_reference_model
    from multiagentperception_tpu.metrics import runningScore
    from multiagentperception_tpu.utils import convert_state_dict

    arch = cfg["model"]["arch"]
    mo = bool(cfg["model"].get("multiple_output"))
    if_comm = cfg["data"].get("commun_label", "None")

    model = build_reference_model(cfg, n_classes)
    state = torch.load(model_path, map_location="cpu",
                       weights_only=False)["model_state"]
    model.load_state_dict(convert_state_dict(state), strict=False)
    model.eval()

    rm = runningScore(n_classes)
    comm_4tuple = arch in ("MIMOcom", "MIMOcomWho")
    srms = arch in ("LearnWho2Com", "LearnWhen2Com")

    with torch.no_grad():
        for bi, data_list in enumerate(loader):
            if max_batches and bi >= max_batches:
                break
            if if_comm != "None":
                images, labels, commun_label = data_list
            else:
                (images, labels), commun_label = data_list[:2], None
            b, n = images.shape[:2]
            # (B, N, H, W, 3) -> (B, 3N, H, W) channel concat
            x = torch.tensor(
                np.ascontiguousarray(
                    images.transpose(0, 1, 4, 2, 3)).reshape(
                        b, n * 3, *images.shape[2:4]))

            action = num_connect = None
            if comm_4tuple:
                pred_t, prob, _, num_connect = model(
                    x, training=False, MO_flag=mo, inference=inference_mode)
                action = torch.argmax(prob, dim=1).numpy()  # (B, N) over keys
            elif srms:
                out = model(x, training=False, inference=inference_mode)
                pred_t, prob = out[0], out[1]
                action = np.asarray(out[2])
                if len(out) > 3:
                    num_connect = out[3]
            elif arch == "Single_agent":
                if mo:  # views stacked into batch (trainer.py:1390-1392)
                    x = torch.tensor(np.ascontiguousarray(
                        images.transpose(0, 1, 4, 2, 3)).reshape(
                            b * n, 3, *images.shape[2:4]))
                pred_t = model(x)
            else:  # All_agents / MIMO_All_agents
                out = model(x)
                pred_t = out[0] if isinstance(out, tuple) else out

            pred = pred_t.max(1)[1].numpy()  # (B*, H, W)
            if mo and arch not in ("Single_agent", "All_agents"):
                # reference stacks view-major (cat(labels_list, 0),
                # trainer.py:654; agents2batch agent.py:1080-1086): convert
                # predictions to OUR batch-major before shared accounting
                pred = pred.reshape(n, b, *pred.shape[1:]).transpose(
                    1, 0, 2, 3).reshape(b * n, *pred.shape[1:])
                gt = labels.reshape(b * n, *labels.shape[2:])
            elif mo and arch == "Single_agent":
                gt = labels.reshape(b * n, *labels.shape[2:])
            else:
                gt = labels[:, 0]

            rm.update(gt, pred)
            if commun_label is not None:
                rm.update_div(if_comm, gt, pred, commun_label)
                if action is not None and arch != "LearnWhen2Com":
                    if arch == "LearnWho2Com":
                        action = action + 1
                    rm.update_selection(if_comm, commun_label, action)
            if num_connect is not None:
                rm.update_bandW(float(num_connect))
    return rm


# --------------------------------------------------------------------------
def print_side_by_side(title, ours, torch_rm, n_classes=11):
    print(f"\n================ {title} ================")
    sections = []
    if torch_rm.confusion_matrix_pos.sum() or torch_rm.confusion_matrix_neg.sum():
        sections += [("Normal", "get_only_normal_scores"),
                     ("Noise", "get_only_noise_scores")]
    sections.append(("Overall", "get_scores"))
    deltas = {}
    for name, getter in sections:
        s_ours, _ = getattr(ours, getter)()
        s_ref, _ = getattr(torch_rm, getter)()
        print(f"--- {name} ---")
        print(f"{'metric':24s} {'this framework':>16s} {'reference':>12s} "
              f"{'delta':>10s}")
        for k in s_ours:
            d = s_ours[k] - s_ref[k]
            print(f"{k.strip():24s} {s_ours[k]:16.4f} {s_ref[k]:12.4f} "
                  f"{d:+10.4f}")
        deltas[name] = s_ours["Mean IoU : \t"] - s_ref["Mean IoU : \t"]
    if ours.total_agent and torch_rm.total_agent:
        w_o, h_o = ours.get_selection_accuracy()
        w_r, h_r = torch_rm.get_selection_accuracy()
        print(f"{'when2com accuracy':24s} {w_o:16.4f} {w_r:12.4f} "
              f"{w_o - w_r:+10.4f}")
        print(f"{'who2com accuracy':24s} {h_o:16.4f} {h_r:12.4f} "
              f"{h_o - h_r:+10.4f}")
    if ours.count and torch_rm.count:
        print(f"{'bandwidth (links/agent)':24s} {ours.get_avg_bandW():16.4f} "
              f"{torch_rm.get_avg_bandW():12.4f} "
              f"{ours.get_avg_bandW() - torch_rm.get_avg_bandW():+10.4f}")
    return deltas


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--model_path", required=True,
                    help="reference torch .pkl (or our orbax ckpt dir)")
    ap.add_argument("--path", default=None,
                    help="AirSim-MAP root (default: data.path from config)")
    ap.add_argument("--split", default=None,
                    help="split to evaluate (default: data.test_split)")
    ap.add_argument("--inference_mode", default=None)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--skip_torch", action="store_true",
                    help="only evaluate in this framework")
    ap.add_argument("--skip_validate", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from multiagentperception_tpu.config import load_config
    from multiagentperception_tpu.utils import (
        apply_platform_override,
        enable_compile_cache,
    )

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        apply_platform_override()
    enable_compile_cache()

    cfg = load_config(args.config)
    if args.path:
        cfg["data"]["path"] = args.path
    root = cfg["data"]["path"]
    split = args.split or cfg["data"]["test_split"]

    # ---- 1. dataset audit ----
    if not args.skip_validate:
        rc = subprocess.call([
            sys.executable, os.path.join(REPO, "scripts/validate_dataset.py"),
            "--path", root, "--target_view", cfg["data"]["target_view"],
            "--commun_label", cfg["data"]["commun_label"]])
        if rc:
            print(f"WARNING: dataset audit flagged problems (rc {rc}); "
                  "both evaluations still run on the indexable frames")

    # ---- 2. evaluate here ----
    import logging

    from multiagentperception_tpu.data import AirsimDataset, DataLoader
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    ds = AirsimDataset(
        root, split=split,
        img_size=(cfg["data"]["img_rows"], cfg["data"]["img_cols"]),
        commun_label=cfg["data"]["commun_label"],
        target_view=cfg["data"]["target_view"])
    batch = cfg["training"]["batch_size"]
    loader = DataLoader(ds, batch, num_workers=2)
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("compare"), model,
        get_loss_function(cfg), None, loader, get_optimizer(cfg))
    trainer.load_weight(args.model_path)
    inference = args.inference_mode or trainer.eval_default
    if args.max_batches:
        batches = []
        for bi, d in enumerate(loader):
            if bi >= args.max_batches:
                break
            batches.append(d)
        loader = batches
    print(f"\n[this framework] evaluating {args.model_path} on split "
          f"'{split}' (inference={inference}) ...")
    trainer.evaluate(loader, inference_mode=inference)
    ours = trainer.last_eval_metrics

    if args.skip_torch:
        return 0

    # ---- 3. evaluate in the reference ----
    if not os.path.isfile(args.model_path):
        print("(--model_path is not a torch .pkl file; skipping the "
              "reference-side evaluation)")
        return 0
    import importlib.util

    if importlib.util.find_spec("torch") is None:
        # deployment hosts often ship without torch; the framework-side
        # numbers above stand alone — degrade loudly instead of crashing
        print("(torch is not installed on this host; skipping the "
              "reference-side evaluation — run with --skip_torch to silence "
              "this, or install torch to get the side-by-side tables)")
        return 0
    print("\n[reference torch-cpu] evaluating the same checkpoint ...")
    t_loader = loader if isinstance(loader, list) else DataLoader(
        ds, batch, num_workers=2)
    ref_rm = evaluate_torch(cfg, args.model_path, t_loader, inference,
                            max_batches=args.max_batches)

    # ---- 4. side-by-side ----
    deltas = print_side_by_side(
        f"{cfg['model']['arch']} @ {split} ({inference})", ours, ref_rm)
    worst = max(abs(v) for v in deltas.values())
    print(f"\nmax |mIoU delta| across sections: {worst:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
