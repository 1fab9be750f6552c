"""TRUE multi-process validation (VERDICT round-3 task #4).

All prior multi-chip evidence is single-process SPMD over virtual devices;
the multi-host features (`shard_data_by_process`, process-0-only checkpoint
writes, `jax.process_index()` branches) were tested only with monkeypatched
process indices. This script runs a REAL 2-process `jax.distributed` CPU job
(4 virtual devices each, 8 global) and validates:

  1. process barriers — `jax.distributed.initialize` + sync_global_devices;
  2. grain `shard_by_process` sample slices are DISJOINT and EXHAUSTIVE
     across actual processes (data/grain_pipeline.py:ShardByJaxProcess);
  3. a cross-process SPMD train step over a global ('data',) mesh: per-process
     local batches become one global array
     (`jax.make_array_from_process_local_data`), the jitted loss/grad runs on
     all 8 devices, and the XLA-inserted gradient psum crosses the process
     boundary — both processes see the identical global loss/grads;
  4. orbax single-writer checkpointing through the real Trainer path:
     process 0 writes, process 1 skips, BOTH processes restore the same state
     (trainer.py:_save_ckpt / _restore_full);
  5. per-process metric reduction: local confusion histograms combined with a
     real cross-process `process_allgather`;
  6. END-TO-END `Trainer.train()` over a cross-process ('data',) mesh with a
     process-sharded grain stream: batches flow through the real
     _put_batch/_put_chunk path (global batch = P × per-process batch_size),
     and an interrupted run resumes each process's data stream EXACTLY
     mid-epoch (per-process sidecar) — parameters match the uninterrupted
     twin bitwise.

Run: python scripts/dryrun_multiprocess.py        (spawns the 2 workers)
The committed output lives in BASELINE.md ("Multi-process validation").
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4


# --------------------------------------------------------------------------
# worker
# --------------------------------------------------------------------------
def worker(proc_id: int, coord: str, workdir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_PROC}"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=N_PROC, process_id=proc_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_index() == proc_id
    assert jax.process_count() == N_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    report: dict = {"process_index": proc_id,
                    "global_devices": len(jax.devices())}

    # ---- 1. barrier ----
    multihost_utils.sync_global_devices("start")
    report["barrier"] = "ok"

    # ---- 2. grain shard_by_process: disjoint + exhaustive ----
    from multiagentperception_tpu.data.grain_pipeline import GrainLoader

    class _IndexDataset:
        """Trivial source: sample i is the array [i] (slice bookkeeping)."""
        root, split = "index", "train"

        def __len__(self):
            return 37  # odd on purpose: exercises drop_remainder

        def __getitem__(self, i):
            return (np.asarray([i]),)

    loader = GrainLoader(_IndexDataset(), batch_size=4, shuffle=True,
                         seed=7, shard_by_process=True)
    seen = sorted(
        int(v) for (batch,) in loader for v in np.asarray(batch).ravel())
    report["grain_slice"] = seen
    with open(os.path.join(workdir, f"slice_{proc_id}.json"), "w") as fp:
        json.dump(seen, fp)

    # ---- 3. cross-process SPMD step over a global ('data',) mesh ----
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    bs = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)  # identical params on both processes
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    w = jax.make_array_from_process_local_data(rep, np.asarray(w))
    # per-process LOCAL batch (distinct per process, like sharded loading);
    # global batch = concat over processes = 8 rows -> one per device
    local = np.arange(DEV_PER_PROC * 16, dtype=np.float32).reshape(4, 16)
    local = local + 1000.0 * proc_id
    x = jax.make_array_from_process_local_data(bs, local)
    y = jax.make_array_from_process_local_data(
        bs, np.ones((DEV_PER_PROC, 8), np.float32))

    @jax.jit
    def loss_and_grad(w, x, y):
        def loss(w):
            return jnp.mean((x @ w - y) ** 2)

        return jax.value_and_grad(loss)(w)

    loss, grad = loss_and_grad(w, x, y)
    # the mean over the globally-sharded batch IS the cross-process psum;
    # both processes must see the same global numbers
    report["spmd_loss"] = float(loss)
    report["spmd_grad_norm"] = float(jnp.linalg.norm(grad))
    gathered = multihost_utils.process_allgather(jnp.float32(report["spmd_loss"]))
    assert np.allclose(np.asarray(gathered), report["spmd_loss"]), gathered
    report["spmd_loss_agree"] = True

    # ---- 4. trainer checkpoint: process-0-only write, both restore ----
    import logging

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    os.chdir(workdir)  # _save_ckpt's writer-less logdir is runs/default
    cfg = normalize_config({
        "model": {"arch": "Single_agent", "agent_num": 1,
                  "enc_backbone": "n_segnet_encoder",
                  "dec_backbone": "simple_decoder", "feat_channel": 32},
        "data": {"img_rows": 32, "img_cols": 32, "commun_label": "None",
                 "target_view": "two_agents"},
        "training": {"batch_size": 2,
                     "optimizer": {"name": "adam", "lr": 1e-4},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    })
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger(f"proc{proc_id}"), model,
        get_loss_function(cfg), None, None, get_optimizer(cfg))
    example = np.zeros((2, 2, 32, 32, 3), np.float32)
    trainer.state = trainer._init_state(example)
    trainer.state = trainer.state.replace(step=jnp.asarray(5, jnp.int32))
    # both processes call save_checkpoint (orbax barrier symmetry); only
    # proc 0 touches the filesystem
    path = trainer._save_ckpt("latest", 5, 0.5)
    multihost_utils.sync_global_devices("ckpt-written")
    report["ckpt_path"] = path
    report["ckpt_exists"] = os.path.isdir(path) or os.path.isdir(path + ".new")
    # fresh trainer restores on BOTH processes from the shared path
    trainer2 = get_trainer(cfg)(
        cfg, None, logging.getLogger(f"proc{proc_id}r"), model,
        get_loss_function(cfg), None, None, get_optimizer(cfg))
    trainer2.state = trainer2._init_state(example)
    from multiagentperception_tpu.checkpoint import resolve_checkpoint

    best = trainer2._restore_full(resolve_checkpoint(path))
    report["restored_step"] = int(trainer2.state.step)
    report["restored_best_iou"] = best
    leaves_a = jax.tree_util.tree_leaves(trainer.state.params)
    leaves_b = jax.tree_util.tree_leaves(trainer2.state.params)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))
    report["restored_params_equal"] = True

    # ---- 5. per-process metric reduction ----
    from multiagentperception_tpu.metrics import fast_hist

    pred = (np.arange(64) + proc_id) % 11
    gt = np.arange(64) % 11
    local_hist = fast_hist(gt, pred, 11)
    all_hists = multihost_utils.process_allgather(jnp.asarray(local_hist))
    global_hist = np.asarray(all_hists).sum(0)
    assert int(global_hist.sum()) == 64 * N_PROC
    report["metric_reduction_total"] = int(global_hist.sum())

    # ---- 6. e2e Trainer.train(): sharded stream, global batch, exact
    # per-process mid-epoch resume (ADVICE r4 medium + VERDICT r4 missing #5).
    # The batches flow through the REAL _put_batch/_put_chunk trainer path
    # (make_array_from_process_local_data), not the hand-built leg-3 arrays.
    from jax.sharding import Mesh as _Mesh

    class _TinyImgDataset:
        """Deterministic (images, labels) frames: per-index content so any
        data-order divergence shows up in the trained parameters."""
        root, split = "tiny", "train"
        N_AGENTS, HW = 2, 32

        def __len__(self):
            return 32

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            img = r.uniform(0, 1, (self.N_AGENTS, self.HW, self.HW, 3))
            lbl = r.integers(0, 11, (self.N_AGENTS, self.HW, self.HW))
            return img.astype(np.float32), lbl.astype(np.int64)

    def _make_cfg(iters, resume=None):
        c = {
            "model": {"arch": "Single_agent", "agent_num": 2,
                      "multiple_output": True,
                      "enc_backbone": "n_segnet_encoder",
                      "dec_backbone": "simple_decoder", "feat_channel": 16},
            "data": {"img_rows": 32, "img_cols": 32, "commun_label": "None",
                     "target_view": "two_agents"},
            "training": {"batch_size": 4,  # PER-PROCESS -> global batch 8
                         "train_iters": iters, "val_interval": 100,
                         "print_interval": 100, "steps_per_call": 2,
                         "save_interval": 2, "watchdog_secs": 0,
                         "shard_data_by_process": True,
                         "optimizer": {"name": "adam", "lr": 1e-3},
                         "loss": {"name": "cross_entropy",
                                  "size_average": True}},
        }
        if resume:
            c["training"]["resume"] = resume
        return normalize_config(c)

    def _train(iters, resume=None, tag="a"):
        cfg6 = _make_cfg(iters, resume)
        tl = GrainLoader(_TinyImgDataset(), batch_size=4, shuffle=True,
                         drop_last=True, seed=11, num_epochs=None,
                         shard_by_process=True)
        vl = GrainLoader(_TinyImgDataset(), batch_size=4)
        mesh6 = _Mesh(np.asarray(jax.devices()), ("data",))
        model6 = get_model(cfg6, 11)
        tr = get_trainer(cfg6)(
            cfg6, None, logging.getLogger(f"e2e{proc_id}{tag}"), model6,
            get_loss_function(cfg6), tl, vl, get_optimizer(cfg6), mesh=mesh6)
        tr.train()
        return tr

    # global-batch assembly through the real trainer path
    probe = _train(0, tag="p")  # iters=0: builds state, trains nothing
    gx, = probe._put_batch(np.zeros((4, 2, 32, 32, 3), np.float32))
    report["e2e_global_batch"] = int(gx.shape[0])  # 8 = P x per-process 4

    run_a = _train(6, tag="a")  # uninterrupted
    # interrupted twin: 2 iters (saves 'latest' at save_interval=2), resume
    _train(2, tag="b1")
    latest = os.path.join("runs", "default",
                          "Single_agent_airsim_latest.ckpt")
    from multiagentperception_tpu.checkpoint import resolve_checkpoint as _rc
    run_b2 = _train(6, resume=_rc(latest), tag="b2")
    flat_a = jax.tree_util.tree_leaves(jax.device_get(run_a.state.params))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(run_b2.state.params))
    max_d = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                for x, y in zip(flat_a, flat_b))
    # exact-position resume: any epoch-boundary restart on either process
    # would feed different batches after iter 2 and diverge the parameters
    report["e2e_resume_param_maxdiff"] = max_d
    report["e2e_resume_exact"] = bool(max_d < 1e-6)
    report["e2e_final_step"] = int(run_b2.state.step)

    multihost_utils.sync_global_devices("done")
    with open(os.path.join(workdir, f"report_{proc_id}.json"), "w") as fp:
        json.dump(report, fp, indent=1)


# --------------------------------------------------------------------------
# launcher
# --------------------------------------------------------------------------
def main() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    workdir = tempfile.mkdtemp(prefix="mp_dryrun_")
    procs = []
    env = {**os.environ, "MAP_COMPILE_CACHE": "off",
           "TF_CPP_MIN_LOG_LEVEL": "2"}
    for i in range(N_PROC):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i),
             "--coord", coord, "--dir", workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            rc = p.returncode
            print(f"--- worker {i} FAILED (rc {p.returncode}) ---")
            print(out.decode(errors="replace")[-4000:])
    if rc:
        return rc

    reports = []
    for i in range(N_PROC):
        with open(os.path.join(workdir, f"report_{i}.json")) as fp:
            reports.append(json.load(fp))
    slices = [set(r["grain_slice"]) for r in reports]
    n_total = 37
    disjoint = not (slices[0] & slices[1])
    union = slices[0] | slices[1]
    # ShardByJaxProcess(drop_remainder=True): each process sees
    # floor(N / P) samples; the tail is dropped by design
    exhaustive = len(union) == (n_total // N_PROC) * N_PROC
    print("=== multi-process dryrun (2 procs x 4 virtual devices) ===")
    print(f"grain shard_by_process: {len(slices[0])} + {len(slices[1])} "
          f"samples, disjoint={disjoint}, covers {len(union)}/{n_total} "
          f"(drop_remainder tail = {n_total % N_PROC}) -> "
          f"exhaustive={exhaustive}")
    same_loss = reports[0]["spmd_loss"] == reports[1]["spmd_loss"]
    print(f"cross-process SPMD step: global loss {reports[0]['spmd_loss']:.6f}"
          f" grad-norm {reports[0]['spmd_grad_norm']:.6f} "
          f"identical-on-both={same_loss}")
    print(f"checkpoint single-writer: proc0 wrote={reports[0]['ckpt_exists']},"
          f" both restored step={reports[0]['restored_step']}/"
          f"{reports[1]['restored_step']} params-equal="
          f"{reports[0]['restored_params_equal']}/"
          f"{reports[1]['restored_params_equal']}")
    print(f"metric reduction: global hist total "
          f"{reports[0]['metric_reduction_total']} (= 64 x {N_PROC})")
    print(f"e2e Trainer.train: global batch {reports[0]['e2e_global_batch']} "
          f"(= {N_PROC} x per-process 4), interrupted-vs-uninterrupted "
          f"param maxdiff {reports[0]['e2e_resume_param_maxdiff']:.2e}/"
          f"{reports[1]['e2e_resume_param_maxdiff']:.2e} -> "
          f"exact-resume={all(r['e2e_resume_exact'] for r in reports)}")
    ok = (disjoint and exhaustive and same_loss
          and all(r["restored_params_equal"] and r["restored_step"] == 5
                  for r in reports)
          and all(r["e2e_global_batch"] == 4 * N_PROC
                  and r["e2e_resume_exact"] and r["e2e_final_step"] == 6
                  for r in reports))
    print(f"RESULT: {'ok' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        ap_i = sys.argv.index("--worker")
        pid = int(sys.argv[ap_i + 1])
        coord = sys.argv[sys.argv.index("--coord") + 1]
        wdir = sys.argv[sys.argv.index("--dir") + 1]
        worker(pid, coord, wdir)
    else:
        sys.exit(main())
