"""Training CLI (reference: /root/reference/train.py:34-232).

Same interface: ``python train.py --config <yml> [--gpu=0] [--run_time N]``.
Accepts the reference's ten YAML configs verbatim. After training, reloads the
best checkpoint and evaluates on the test split (reference train.py:219-232).
The ``--gpu`` flag maps to device selection, kept for CLI parity (TPU
placement is implicit).
"""

from __future__ import annotations

import argparse
import datetime
import os
import random
import shutil

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="config")
    parser.add_argument("--config", nargs="?", type=str,
                        default="configs/your_configs.yml",
                        help="Configuration file to use")
    parser.add_argument("--gpu", nargs="?", type=str, default="0",
                        help="Device index (CLI parity; TPU placement is implicit)")
    parser.add_argument("--run_time", nargs="?", type=int, default=1,
                        help="number of repeated runs")
    parser.add_argument("--data_parallel", nargs="?", type=int, default=0,
                        help="shard the batch over this many devices (0 = all)")
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

    # multi-host entry (framework extension): MAP_COORDINATOR=<host:port>
    # MAP_NUM_PROCESSES=<P> MAP_PROCESS_ID=<i> runs this CLI as one process
    # of a jax.distributed job (validated by scripts/dryrun_multiprocess.py)
    if os.environ.get("MAP_COORDINATOR"):
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["MAP_COORDINATOR"],
            num_processes=int(os.environ["MAP_NUM_PROCESSES"]),
            process_id=int(os.environ["MAP_PROCESS_ID"]),
        )

    from multiagentperception_tpu.data import DataLoader, get_loader
    from multiagentperception_tpu.data.augmentations import get_composed_augmentations
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.parallel import data_parallel_mesh
    from multiagentperception_tpu.schedulers import get_scheduler
    from multiagentperception_tpu.trainer import get_trainer
    from multiagentperception_tpu.utils import get_logger

    # multi-run aggregation: the reference pre-allocates per-run score lists
    # but never fills them (train.py:76-105, dead code) — implemented here.
    score_list: list = []
    class_iou_list: list = []

    # re-exec handshake for training.rss_limit_gb (utils.reexec_self): a
    # restarted process rejoins its original run directory and resumes from
    # the checkpoint written just before the exec. MAP_REEXEC_RESUME is set
    # only by reexec_self; LOGDIR/RUN_IDX are exported below at run start
    # and ride through the exec'd environment.
    reexec_resume = os.environ.pop("MAP_REEXEC_RESUME", None)
    reexec_logdir = os.environ.get("MAP_REEXEC_LOGDIR")
    reexec_run_idx = int(os.environ.get("MAP_REEXEC_RUN_IDX", "0") or 0)
    if reexec_resume and reexec_run_idx > 0:
        # per-run scores of the runs completed before the exec are gone;
        # the aggregate below covers only the runs since the last restart
        print(f"resumed after re-exec: aggregate will cover runs "
              f"{reexec_run_idx}..{args.run_time - 1} only")
    orig_resume = cfg["training"].get("resume")

    for run_idx in range(reexec_run_idx if reexec_resume else 0,
                         args.run_time):
        now = datetime.datetime.now()
        import jax

        if jax.process_count() > 1:
            # all processes must agree on the run dir (checkpoints resolve
            # against it on every host): broadcast process 0's timestamp
            import numpy as _np
            from jax.experimental import multihost_utils

            epoch = multihost_utils.broadcast_one_to_all(
                _np.int64(now.timestamp()))
            now = datetime.datetime.fromtimestamp(int(epoch))
        run_id = now.strftime("%Y-%m-%d-%H-%M-%S")
        if args.run_time > 1:  # fast repeats can share a timestamp second
            run_id = f"{run_id}-r{run_idx}"
        if reexec_resume and run_idx == reexec_run_idx and reexec_logdir:
            logdir = reexec_logdir  # rejoin the pre-exec run directory
            cfg["training"]["resume"] = reexec_resume
        else:
            logdir = os.path.join(
                "runs", os.path.basename(args.config)[:-4], str(run_id)
            )
            cfg["training"]["resume"] = orig_resume
        # exported so a later rss_limit_gb re-exec can rejoin this run
        os.environ["MAP_REEXEC_LOGDIR"] = logdir
        os.environ["MAP_REEXEC_RUN_IDX"] = str(run_idx)
        os.makedirs(logdir, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(logdir=logdir)
        except ImportError:
            writer = None
        print(f"RUNDIR: {logdir}")
        shutil.copy(args.config, logdir)

        logger = get_logger(logdir)
        logger.info("Begin")

        # vary the seed per repeat: the reference seeds once globally and
        # lets RNG state advance across repeats (train.py:122-125), so its
        # runs differ; re-seeding each run identically would make
        # --run_time N produce N identical runs
        seed = int(cfg["training"].get("seed", 1337)) + run_idx
        random.seed(seed)
        np.random.seed(seed)

        # data
        data_cfg = cfg["data"]
        augmentations = cfg["training"].get("augmentations")
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
        t_dataset = loader_cls(
            split=data_cfg["train_split"],
            augmentations=get_composed_augmentations(augmentations),
            **common,
        )
        v_dataset = loader_cls(split=data_cfg["val_split"], **common)

        batch_size = cfg["training"]["batch_size"]
        n_workers = cfg["training"]["n_workers"]
        if cfg["training"].get("data_backend") == "grain":
            # deterministic, checkpointable data stream (see
            # data/grain_pipeline.py); worker processes instead of threads
            from multiagentperception_tpu.data.grain_pipeline import GrainLoader

            trainloader = GrainLoader(
                t_dataset, batch_size, shuffle=True, drop_last=True,
                # training.grain_workers: decode in grain worker PROCESSES
                # (sidesteps the GIL entirely; 0 = in-process)
                num_workers=int(cfg["training"].get("grain_workers") or 0),
                seed=seed, num_epochs=None,
                # multi-host DP: each jax process loads its own stream slice
                shard_by_process=bool(
                    cfg["training"].get("shard_data_by_process")),
            )
            valloader = GrainLoader(v_dataset, batch_size)
        else:
            trainloader = DataLoader(
                t_dataset, batch_size, shuffle=True, drop_last=True,
                num_workers=n_workers, seed=seed,
            )
            valloader = DataLoader(v_dataset, batch_size, num_workers=n_workers)

        # model + services. model.agent_parallel (config-only here) routes
        # MIMOcom's eval/validation fusion through the agent-axis ICI ring;
        # the training forward stays dense unless model.agent_parallel_train
        # also differentiates through the ring (grad == dense,
        # tests/test_ring.py::test_ring_training_equivalence)
        from multiagentperception_tpu.parallel import agent_parallel_mesh

        a_mesh = agent_parallel_mesh(cfg)
        model = get_model(cfg, n_classes=11, agent_mesh=a_mesh)
        schedule = get_scheduler(
            cfg["training"].get("lr_schedule"),
            cfg["training"]["optimizer"]["lr"],
        )
        tx = get_optimizer(cfg, learning_rate=schedule)
        # NaN/Inf guard (framework extension): skip updates with non-finite
        # grads, give up after N consecutive bad steps
        nan_guard = cfg["training"].get("nan_guard")
        if nan_guard:
            import optax

            tx = optax.apply_if_finite(tx, max_consecutive_errors=int(nan_guard))
        loss_fn = get_loss_function(cfg)

        # the agent ring owns its devices — don't also batch-shard over them
        mesh = None if a_mesh is not None else data_parallel_mesh(
            batch_size, args.data_parallel)

        trainer_cls = get_trainer(cfg)
        trainer = trainer_cls(
            cfg, writer, logger, model, loss_fn, trainloader, valloader,
            tx, scheduler=schedule, mesh=mesh, seed=seed,
        )
        save_path = trainer.train()

        # post-training test-split evaluation (reference train.py:219-232)
        te_dataset = loader_cls(split=data_cfg["test_split"], **common)
        testloader = DataLoader(te_dataset, batch_size, num_workers=n_workers)
        if save_path is not None:
            trainer.load_weight(save_path)
        score, class_iou = trainer.evaluate(testloader)
        score_list.append(score)
        class_iou_list.append(class_iou)
        if writer is not None:
            writer.close()

    if args.run_time > 1:
        print(f"=== Aggregate over {args.run_time} runs (mean ± std) ===")
        for key in score_list[0]:
            vals = np.asarray([s[key] for s in score_list], np.float64)
            print(f"{key}{vals.mean():.4f} ± {vals.std():.4f}")
        for c in sorted(class_iou_list[0]):
            vals = np.asarray([ci[c] for ci in class_iou_list], np.float64)
            print(f"class {c} IoU: \t{np.nanmean(vals):.4f} "
                  f"± {np.nanstd(vals):.4f}")


if __name__ == "__main__":
    main()
