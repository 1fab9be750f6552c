"""training.steps_per_call — K optimizer steps per device dispatch via
lax.scan (trainer._train_multi_step_fn). Covers: the pure chunk-size math
(boundary alignment), numerical equivalence of the scanned path to K
sequential single steps, and the validation cadence staying at the
configured iterations. The reference has no analog (its loop is one
synchronous CUDA step per Python iteration, trainer.py:642-700)."""

import logging

import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.data import AirsimDataset, DataLoader
from multiagentperception_tpu.data.synthetic import generate_fixture
from multiagentperception_tpu.loss import get_loss_function
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.optimizers import get_optimizer
from multiagentperception_tpu.schedulers import get_scheduler
from multiagentperception_tpu.trainer import chunk_sizes, get_trainer

logger = logging.getLogger("test")

H = 128


class TestChunkSizes:
    def test_plain_chunks(self):
        assert list(chunk_sizes(0, 10, 4)) == [4, 4, 2]

    def test_never_crosses_boundaries(self):
        # val=5, save=4: chunks must end at every multiple of either
        sizes = list(chunk_sizes(0, 20, 8, 5, 4))
        assert sum(sizes) == 20
        i = 0
        for k in sizes:
            i += k
            nxt = i + 1
            # the NEXT chunk must not straddle a boundary the current one
            # already touched; equivalently every boundary is a chunk end
        ends = set(np.cumsum(sizes).tolist())
        for b in (4, 5):
            assert all(m in ends for m in range(b, 20, b))

    def test_resume_mid_interval(self):
        # start_iter 7, val 5: first chunk must stop at 10
        sizes = list(chunk_sizes(7, 20, 8, 5))
        assert sizes[0] == 3 and sum(sizes) == 13

    def test_none_boundaries_ignored(self):
        assert list(chunk_sizes(0, 6, 4, None, 0)) == [4, 2]

    def test_empty_when_done(self):
        assert list(chunk_sizes(6, 6, 4, 3)) == []


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("airsim_spc"))
    generate_fixture(root, target_view="6agent", img_size=H, frames_per_traj=2)
    return root


def _build(fixture_root, **training_kw):
    cfg = normalize_config({
        "model": {"arch": "Single_agent", "agent_num": 6,
                  "multiple_output": True},
        "data": {"path": fixture_root, "img_rows": H, "img_cols": H,
                 "target_view": "6agent", "commun_label": "None"},
        "training": {"train_iters": 4, "batch_size": 2, "val_interval": 4,
                     "n_workers": 2, "print_interval": 1, **training_kw},
    })
    common = dict(root=fixture_root, img_size=(H, H), commun_label="None",
                  target_view="6agent")
    t = AirsimDataset(split="train", **common)
    v = AirsimDataset(split="val", **common)
    bs = cfg["training"]["batch_size"]
    # shuffle=False: both runs must consume the identical batch sequence
    tl = DataLoader(t, bs, shuffle=False, drop_last=True, num_workers=2)
    vl = DataLoader(v, bs, num_workers=2)
    model = get_model(cfg, 11)
    schedule = get_scheduler(cfg["training"].get("lr_schedule"),
                             cfg["training"]["optimizer"]["lr"])
    tx = get_optimizer(cfg, learning_rate=schedule)
    loss_fn = get_loss_function(cfg)
    return get_trainer(cfg)(cfg, None, logger, model, loss_fn, tl, vl, tx)


@pytest.mark.slow
class TestMultiStepTraining:
    def test_equivalent_to_sequential_steps(self, fixture_root, tmp_path,
                                            monkeypatch):
        monkeypatch.chdir(tmp_path)
        base = _build(fixture_root)
        base.train()
        chunked = _build(fixture_root, steps_per_call=2)
        chunked.train()

        assert int(base.state.step) == int(chunked.state.step) == 4
        import jax

        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                             - np.asarray(b, np.float32)))),
            base.state.params, chunked.state.params)
        worst = max(jax.tree_util.tree_leaves(diffs))
        assert worst < 1e-5, f"scanned path diverged: max |dparam|={worst}"

    def test_validation_cadence_preserved(self, fixture_root, tmp_path,
                                          monkeypatch):
        """val_interval=3 with steps_per_call=2: chunks split 2,1,2,1 and
        validation still fires at exactly iters 3 and 6."""
        monkeypatch.chdir(tmp_path)
        trainer = _build(fixture_root, steps_per_call=2, train_iters=6,
                         val_interval=3)
        seen = []
        orig = trainer._validate

        def record(i, meter):
            seen.append(i)
            return orig(i, meter)

        monkeypatch.setattr(trainer, "_validate", record)
        trainer.train()
        assert seen == [3, 6]
        assert int(trainer.state.step) == 6
