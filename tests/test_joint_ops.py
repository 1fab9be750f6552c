"""The round-4 operational stack exercised JOINTLY (VERDICT r4 task #7):
``steps_per_call`` × ``device_prefetch`` × ``save_interval`` ×
``rss_limit_gb`` × the stall watchdog, in one full ``Trainer.train()`` over
a checkpointable grain stream.

Previously each feature was proven alone (tests/test_trainer.py::TestRssLimit
runs the re-exec only with the single-step loop; test_steps_per_call proves
scan equivalence without the rss guard; test_device_prefetch proves position
capture without the multi-step loop). Here the self-healing restart fires
mid-run UNDER the multi-step loop with prefetch running ahead, and must land
on the exact iteration AND the exact data position: the resumed twin's
parameters match an uninterrupted run bitwise-close, which is only possible
if not one batch was skipped or replayed. The reference has no analog
(no checkpoint-on-signal machinery at all; its resume restarts the
DataLoader epoch, /root/reference/ptsemseg/trainer.py:59-75).
"""

import logging
import os

import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.data import AirsimDataset
from multiagentperception_tpu.data.synthetic import generate_fixture
from multiagentperception_tpu.loss import get_loss_function
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.optimizers import get_optimizer
from multiagentperception_tpu.trainer import get_trainer

pytestmark = pytest.mark.slow

H = 32


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("joint") / "data")
    generate_fixture(root, target_view="6agent", img_size=H,
                     frames_per_traj=2)
    return root


def _cfg(root, resume=None):
    c = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6, "multiple_output": True,
                  "query_size": 4, "key_size": 16, "feat_channel": 16,
                  "enc_backbone": "n_segnet_encoder",
                  "dec_backbone": "simple_decoder"},
        "data": {"path": root, "img_rows": H, "img_cols": H,
                 "target_view": "6agent", "commun_label": "mimo"},
        "training": {"batch_size": 2, "n_workers": 0,
                     "train_iters": 8, "val_interval": 8,
                     "print_interval": 4,
                     # the full operational stack, jointly:
                     # watchdog_secs sized so the 6x cold-start grace
                     # (900 s) covers a contended single-core CPU compile;
                     # a genuine mid-run stall (>150 s between 32d steps)
                     # would still trip it
                     "steps_per_call": 2, "device_prefetch": 2,
                     "save_interval": 2, "watchdog_secs": 150,
                     "rss_limit_gb": 1.0,
                     "optimizer": {"name": "adam", "lr": 1e-4},
                     "loss": {"name": "cross_entropy",
                              "size_average": True}},
    })
    if resume is not None:
        c["training"]["resume"] = resume
    return c


class _RecLogger(logging.Logger):
    def __init__(self):
        super().__init__("joint")
        self.warnings = []

    def warning(self, msg, *args, **kw):
        self.warnings.append(msg % args if args else str(msg))


def _build(cfg, rec_logger):
    from multiagentperception_tpu.data.grain_pipeline import GrainLoader

    data_cfg = cfg["data"]
    common = dict(root=data_cfg["path"], img_size=(H, H),
                  commun_label=data_cfg["commun_label"],
                  target_view=data_cfg["target_view"])
    t = AirsimDataset(split="train", **common)
    v = AirsimDataset(split="val", **common)
    bs = cfg["training"]["batch_size"]
    # the product grain wiring (train.py data_backend=grain): endless
    # checkpointable stream, deterministic seed
    tl = GrainLoader(t, bs, shuffle=True, drop_last=True, seed=5,
                     num_epochs=None)
    vl = GrainLoader(v, bs)
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, rec_logger, model, get_loss_function(cfg), tl, vl,
        get_optimizer(cfg))
    return trainer


def _fake_rss(values):
    it = iter(values)
    last = [values[-1]]

    def fake():
        try:
            last[0] = next(it)
        except StopIteration:
            pass
        return last[0]

    return fake


def test_reexec_under_multi_step_loop_resumes_exactly(
        fixture_root, tmp_path, monkeypatch):
    pytest.importorskip("grain.python")
    import multiagentperception_tpu.trainer as trainer_mod

    monkeypatch.chdir(tmp_path)

    # --- uninterrupted twin: rss stays under the limit for all 8 iters ---
    monkeypatch.setattr(trainer_mod, "host_rss_gb", _fake_rss([0.5]))
    log_a = _RecLogger()
    run_a = _build(_cfg(fixture_root), log_a)
    run_a.train()
    assert int(run_a.state.step) == 8

    # --- interrupted twin: the leak crosses the limit at the 2nd rss
    # check = end of chunk 2 = iter 4 (steps_per_call=2) ---
    os.makedirs("interrupted", exist_ok=True)
    monkeypatch.chdir(tmp_path / "interrupted")
    monkeypatch.setattr(trainer_mod, "host_rss_gb",
                        _fake_rss([0.5, 2.0]))
    log_b = _RecLogger()
    run_b = _build(_cfg(fixture_root), log_b)
    calls = []
    run_b._reexec_fn = calls.append
    run_b.train()

    # the re-exec fired exactly once, at the exact chunk-end iteration,
    # with a checkpoint whose epoch matches
    assert len(calls) == 1
    ckpt = calls[0]
    assert ckpt.endswith("_latest.ckpt") and os.path.exists(ckpt)
    assert int(run_b.state.step) == 4
    from multiagentperception_tpu.checkpoint import load_checkpoint

    assert int(load_checkpoint(ckpt)["epoch"]) == 4
    # the prefetch producer was torn down before the (recorded) exec
    assert not run_b._prefetch_thread.is_alive()

    # --- the exec'd process: fresh trainer, resume from that checkpoint ---
    log_c = _RecLogger()
    run_c = _build(_cfg(fixture_root, resume=ckpt), log_c)
    run_c.train()
    assert int(run_c.state.step) == 8

    # exact-iteration AND exact-data-position resume: any skipped/replayed
    # batch (the prefetch thread ran ahead of the trained chunks) would
    # diverge the parameters from the uninterrupted twin
    import jax

    flat_a = jax.tree_util.tree_leaves(jax.device_get(run_a.state.params))
    flat_c = jax.tree_util.tree_leaves(jax.device_get(run_c.state.params))
    max_d = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
                for x, y in zip(flat_a, flat_c))
    assert max_d < 1e-6, f"resumed twin diverged: max param diff {max_d}"

    # the watchdog stayed quiet through compile + restart on every leg
    # (cold-start grace; VERDICT r4 weak #3)
    for log in (log_a, log_b, log_c):
        stalls = [w for w in log.warnings if "no training progress" in w]
        assert stalls == [], stalls
