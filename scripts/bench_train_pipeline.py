"""Sustained END-TO-END train-loop throughput (decode -> batch -> transfer ->
step), measured the way the eval loop was (BASELINE.md eval wall-clock table)
— VERDICT round-3 Weak #3 / task #3.

Four cumulative configurations over a real on-disk 512d fixture, flagship
model (MIMOcom mrms_when2com geometry), all timing the trainer's actual hot
loop (`_device_train_batches` + jitted train step — exactly what
`Trainer.train()` iterates):

  A. f32 host-normalize, synchronous (reference-style loop;
     /root/reference/ptsemseg/trainer.py:643-673)
  B. + raw uint8 images, on-device normalize (4x less image traffic)
  C. + decoded-frame cache (data.cache_decoded)
  D. + host->device prefetch (training.device_prefetch, depth 2)

Run: python scripts/bench_train_pipeline.py [--batch 2] [--img 512]
     [--iters 20] [--cpu]
"""

import argparse
import logging
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multiagentperception_tpu.utils import (  # noqa: E402
    apply_platform_override,
    enable_compile_cache,
)


def build_trainer(root, img, batch, *, raw, cache_dir, prefetch, n_workers=4):
    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.data import AirsimDataset, DataLoader
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6, "multiple_output": True,
                  "query_size": 32, "key_size": 1024, "dtype": "bfloat16"},
        "data": {"img_rows": img, "img_cols": img, "path": root,
                 "target_view": "6agent", "commun_label": "mimo",
                 "on_device_normalize": raw},
        "training": {"batch_size": batch, "n_workers": n_workers,
                     "device_prefetch": prefetch,
                     "optimizer": {"name": "adam", "lr": 1e-5},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    })
    ds = AirsimDataset(root, split="train", target_view="6agent",
                       img_size=(img, img), commun_label="mimo",
                       raw_images=raw, cache_decoded=cache_dir)
    loader = DataLoader(ds, batch, shuffle=True, drop_last=True,
                        num_workers=n_workers, seed=0)
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("bench"), model, get_loss_function(cfg),
        loader, None, get_optimizer(cfg))
    return trainer


def run_loop(trainer, iters, warmup=3):
    """Time the trainer's hot loop: device batches in, jitted steps out.

    Syncs with a HOST READBACK (np.asarray), not jax.block_until_ready:
    through the tunneled TPU backend block_until_ready returns before the
    queued work drains (verify-skill gotcha), which silently turns the
    timed window into dispatch-only — the round-4 283 f/s prefetch number
    was exactly that artifact (real CLI steady state: ~8 f/s, BASELINE.md
    flagship section)."""
    import numpy as np

    trainer.state = trainer._init_state(
        trainer._example_images(trainer.trainloader))
    step = trainer._train_step_fn()
    gen = trainer._device_train_batches()
    t0 = None
    loss = None
    for i in range(warmup + iters):
        x, y, _, _ = next(gen)
        trainer.state, loss = step(trainer.state, x, y)
        if i == warmup - 1:
            np.asarray(loss)  # compile + cache warm complete (forced drain)
            t0 = time.time()
    np.asarray(loss)  # drain the device queue: all iters steps complete
    gen.close()
    return time.time() - t0


def run_loop_chunked(trainer, chunks, steps_per_call, warmup=1):
    """Variant E: the multi-step path (training.steps_per_call) — one
    lax.scan dispatch per K stacked batches (trainer._train_multi_step_fn).
    Times ``chunks`` chunks after ``warmup``; same host-readback sync."""
    import numpy as np

    trainer.state = trainer._init_state(
        trainer._example_images(trainer.trainloader))
    multi = trainer._train_multi_step_fn()
    total = (warmup + chunks) * steps_per_call
    cfg_t = {"train_iters": total, "val_interval": total,
             "save_interval": None}
    gen = trainer._device_train_chunks(steps_per_call, 0, cfg_t)
    t0 = None
    losses = None
    for i in range(warmup + chunks):
        x, y, _k, _ = next(gen)
        trainer.state, losses = multi(trainer.state, x, y)
        if i == warmup - 1:
            np.asarray(losses)  # compile + warm complete (forced drain)
            t0 = time.time()
    np.asarray(losses)  # drain the queue
    gen.close()
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)  # stock mrms_when2com
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--steps_per_call", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        apply_platform_override()
    enable_compile_cache()

    from multiagentperception_tpu.data.synthetic import generate_fixture

    tmp = tempfile.mkdtemp(prefix="trainpipe_")
    root = os.path.join(tmp, "data")
    print(f"generating {args.img}d fixture at {root} ...")
    generate_fixture(root, target_view="6agent", img_size=args.img,
                     frames_per_traj=args.frames, n_train=2)

    frames = args.batch * 6 * args.iters
    results = {}
    variants = [
        ("A f32-sync (reference-style)",
         dict(raw=False, cache_dir=None, prefetch=0)),
        ("B + uint8 + device-normalize",
         dict(raw=True, cache_dir=None, prefetch=0)),
        ("C + decoded-frame cache",
         dict(raw=True, cache_dir=os.path.join(tmp, "cache"), prefetch=0)),
        ("D + device prefetch (depth 2)",
         dict(raw=True, cache_dir=os.path.join(tmp, "cache"), prefetch=2)),
    ]
    for name, kw in variants:
        trainer = build_trainer(root, args.img, args.batch, **kw)
        dt = run_loop(trainer, args.iters)
        results[name] = dt
        base = results[variants[0][0]]
        print(f"{name:34s} {dt:7.2f}s  {frames / dt:7.1f} frames/s  "
              f"{base / dt:5.2f}x")

    k = args.steps_per_call
    trainer = build_trainer(root, args.img, args.batch, raw=True,
                            cache_dir=os.path.join(tmp, "cache"), prefetch=2)
    n_chunks = max(2, args.iters // k)
    dt = run_loop_chunked(trainer, n_chunks, k)
    name = f"E + steps_per_call {k}"
    results[name] = dt
    e_frames = args.batch * 6 * n_chunks * k
    base = results[variants[0][0]] / frames  # per-frame
    print(f"{name:34s} {dt:7.2f}s  {e_frames / dt:7.1f} frames/s  "
          f"{base * e_frames / dt:5.2f}x")
    return results


if __name__ == "__main__":
    main()
