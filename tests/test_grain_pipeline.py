"""Grain-backed loader: batch parity with the simple loader, determinism,
and checkpointable stream position."""

import numpy as np
import pytest

from multiagentperception_tpu.data import AirsimDataset, DataLoader
from multiagentperception_tpu.data.grain_pipeline import GrainLoader
from multiagentperception_tpu.data.synthetic import generate_fixture


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("grain_fx"))
    generate_fixture(root, target_view="6agent", img_size=32, frames_per_traj=3)
    return root


class TestGrainLoader:
    def test_batches_match_simple_loader_unshuffled(self, fixture_root):
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent",
                           commun_label="mimo")
        simple = list(DataLoader(ds, 2, shuffle=False, drop_last=True))
        grain = list(GrainLoader(ds, 2, shuffle=False, drop_last=True))
        assert len(simple) == len(grain)
        for a, b in zip(simple, grain):
            np.testing.assert_allclose(a[0], b[0], atol=1e-6)
            np.testing.assert_array_equal(a[1], b[1])
            np.testing.assert_array_equal(a[2], b[2])

    def test_shuffle_deterministic_by_seed(self, fixture_root):
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        a = list(GrainLoader(ds, 2, shuffle=True, seed=7))
        b = list(GrainLoader(ds, 2, shuffle=True, seed=7))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x[0], y[0])

    def test_stream_state_roundtrip(self, fixture_root):
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        dl = GrainLoader(ds, 2, shuffle=True, seed=3, drop_last=True)
        it = dl.persistent_iterator()
        first = next(it)
        state = dl.get_state()
        second = next(it)
        # restore: the next batch replays exactly
        dl.set_state(state)
        replay = next(it)
        np.testing.assert_allclose(second[0], replay[0])

    def test_len(self, fixture_root):
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        assert len(GrainLoader(ds, 2, drop_last=True)) == len(ds) // 2

    def test_epochs_reshuffle(self, fixture_root):
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        dl = GrainLoader(ds, 1, shuffle=True, seed=5)
        e1 = [b[1].sum() for b in dl]  # epoch 1 order fingerprint
        e2 = [b[1].sum() for b in dl]  # epoch 2
        assert sorted(e1) == sorted(e2)  # same multiset of samples
        assert e1 != e2  # different order

    def test_process_sharding_partitions_stream(self, fixture_root):
        """Multi-host DP: explicit 2-way ShardOptions split the sample
        stream into disjoint halves that cover the dataset."""
        import grain.python as gp

        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        fingerprints = []
        for shard in range(2):
            dl = GrainLoader(
                ds, 1, shuffle=False,
                shard_options=gp.ShardOptions(shard_index=shard,
                                              shard_count=2,
                                              drop_remainder=True))
            fingerprints.append([float(b[1].sum()) for b in dl])
        a, b = fingerprints
        assert len(a) == len(b) == len(ds) // 2
        assert not (set(a) & set(b))  # disjoint samples

    def test_shard_by_process_disjoint_and_exhaustive(self, fixture_root,
                                                      monkeypatch):
        """shard_by_process=True (multi-host DP, train.py
        training.shard_data_by_process): each jax process sees a disjoint,
        deterministic slice and the slices cover the dataset (up to
        drop_remainder)."""
        import jax

        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        n_proc = 2
        streams = []
        for proc in range(n_proc):
            monkeypatch.setattr(jax, "process_index", lambda p=proc: p)
            monkeypatch.setattr(jax, "process_count", lambda n=n_proc: n)
            dl = GrainLoader(ds, 1, shuffle=False, shard_by_process=True)
            streams.append([float(b[1].sum()) for b in dl])
        a, b = streams
        assert len(a) == len(b) == len(ds) // n_proc
        assert not (set(a) & set(b))  # disjoint
        # exhaustive over the kept prefix (drop_remainder trims the tail)
        full = [float(np.asarray(ds[i][1]).sum())
                for i in range(n_proc * (len(ds) // n_proc))]
        assert set(a) | set(b) == set(full)

    def test_shard_by_process_shuffle_deterministic(self, fixture_root,
                                                    monkeypatch):
        """Same process slot + seed -> identical shuffled slice; different
        slots stay disjoint under shuffle (grain shards before shuffling)."""
        import jax

        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        monkeypatch.setattr(jax, "process_count", lambda: 2)

        def stream(proc, seed):
            monkeypatch.setattr(jax, "process_index", lambda p=proc: p)
            dl = GrainLoader(ds, 1, shuffle=True, seed=seed,
                             shard_by_process=True)
            return [float(b[1].sum()) for b in dl]

        assert stream(0, 9) == stream(0, 9)
        assert not (set(stream(0, 9)) & set(stream(1, 9)))

    def test_shard_by_process_resume_is_per_process(self, fixture_root,
                                                    monkeypatch):
        """The checkpointable stream position restores the OWN process's
        slice mid-epoch (each host checkpoints its own position)."""
        import jax

        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        a = GrainLoader(ds, 1, shuffle=True, seed=4, shard_by_process=True)
        it = a.persistent_iterator()
        next(it)
        state = a.get_state()
        expected = next(it)

        b = GrainLoader(ds, 1, shuffle=True, seed=4, shard_by_process=True)
        b.set_state(state)
        got = next(b.persistent_iterator())
        np.testing.assert_allclose(got[0], expected[0])
        np.testing.assert_array_equal(got[1], expected[1])

    def test_state_restores_across_instances(self, fixture_root):
        """The stream position round-trips through bytes into a FRESH loader
        (what checkpoint resume actually does)."""
        ds = AirsimDataset(fixture_root, split="train", target_view="6agent")
        a = GrainLoader(ds, 2, shuffle=True, seed=3, drop_last=True)
        it = a.persistent_iterator()
        next(it)
        next(it)
        state = a.get_state()
        expected = next(it)

        b = GrainLoader(ds, 2, shuffle=True, seed=3, drop_last=True)
        b.set_state(state)
        got = next(b.persistent_iterator())
        np.testing.assert_allclose(got[0], expected[0])
        np.testing.assert_array_equal(got[1], expected[1])


@pytest.mark.slow
def test_trainer_resume_continues_midepoch(fixture_root, tmp_path, monkeypatch):
    """E2E: a grain-backed training run checkpoints its stream position
    beside the orbax state (trainer._save_best sidecar) and a resumed run
    continues with exactly the batch a continuous run would have seen next —
    the reference restarts its DataLoader from scratch (trainer.py:59-75)."""
    import logging
    import os

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.loss import get_loss_function
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.optimizers import get_optimizer
    from multiagentperception_tpu.trainer import get_trainer

    monkeypatch.chdir(tmp_path)
    cfg = normalize_config({
        "model": {"arch": "Single_agent", "enc_backbone": "resnet_encoder",
                  "dec_backbone": "simple_decoder", "feat_channel": 64,
                  "multiple_output": True},
        "data": {"dataset": "airsim", "img_rows": 32, "img_cols": 32,
                 "path": fixture_root, "target_view": "6agent",
                 "commun_label": "None"},
        "training": {"train_iters": 2, "batch_size": 2, "val_interval": 2,
                     "n_workers": 1, "print_interval": 10,
                     "optimizer": {"name": "adam", "lr": 1.0e-4},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    })
    ds = AirsimDataset(fixture_root, split="train", target_view="6agent",
                       img_size=(32, 32))
    model = get_model(cfg, 11)
    loss = get_loss_function(cfg)
    tx = get_optimizer(cfg)
    logger = logging.getLogger("test")

    ltrain = GrainLoader(ds, 2, shuffle=True, seed=11, drop_last=True)
    lval = DataLoader(ds, 2, num_workers=1)
    trainer = get_trainer(cfg)(cfg, None, logger, model, loss, ltrain, lval, tx)
    from multiagentperception_tpu.checkpoint import read_sidecar

    save_path = trainer.train()
    assert save_path and read_sidecar(save_path) is not None
    # the batch a continuous run would process next = batch train_iters+1 of
    # an independent same-seed stream. (Reading ltrain's own live iterator
    # here would be wrong: under training.device_prefetch the live iterator
    # legitimately runs `depth` batches ahead of the consumed/checkpointed
    # position.)
    lref = GrainLoader(ds, 2, shuffle=True, seed=11, drop_last=True)
    ref_it = lref.persistent_iterator()
    next(ref_it)
    next(ref_it)
    expected = next(ref_it)

    lresume = GrainLoader(ds, 2, shuffle=True, seed=11, drop_last=True)
    trainer2 = get_trainer(cfg)(cfg, None, logger, model, loss, lresume, lval, tx)
    trainer2.state = trainer2._init_state(trainer2._example_images(lresume))
    trainer2._restore_full(save_path)
    assert int(trainer2.state.step) == 2
    got = next(lresume.persistent_iterator())
    np.testing.assert_allclose(got[0], expected[0])
    np.testing.assert_array_equal(got[1], expected[1])
