"""Host->device train-batch prefetch (training.device_prefetch).

The prefetch thread must not change WHAT is trained (same batches, same
order -> identical losses), and the checkpointed grain stream position must
stay exact: the position saved is the last CONSUMED batch's, not the live
iterator's (which runs `depth` batches ahead)."""

import logging

import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.data import AirsimDataset, DataLoader
from multiagentperception_tpu.data.synthetic import generate_fixture
from multiagentperception_tpu.loss import get_loss_function
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.optimizers import get_optimizer
from multiagentperception_tpu.trainer import get_trainer

H = 32


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pfx") / "data")
    generate_fixture(root, target_view="6agent", img_size=H,
                     frames_per_traj=2)
    return root


def _cfg(root, prefetch):
    return normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 6, "multiple_output": True,
                  "query_size": 4, "key_size": 16, "feat_channel": 16,
                  "enc_backbone": "n_segnet_encoder",
                  "dec_backbone": "simple_decoder"},
        "data": {"path": root, "img_rows": H, "img_cols": H,
                 "target_view": "6agent", "commun_label": "mimo"},
        "training": {"batch_size": 2, "n_workers": 0,
                     "device_prefetch": prefetch,
                     "optimizer": {"name": "adam", "lr": 1e-4},
                     "loss": {"name": "cross_entropy", "size_average": True}},
    })


def _losses(root, prefetch, steps=4):
    cfg = _cfg(root, prefetch)
    ds = AirsimDataset(root, split="train", target_view="6agent",
                      img_size=(H, H), commun_label="mimo")
    loader = DataLoader(ds, 2, shuffle=True, drop_last=True,
                        num_workers=0, seed=0)
    model = get_model(cfg, 11)
    trainer = get_trainer(cfg)(
        cfg, None, logging.getLogger("pfx"), model, get_loss_function(cfg),
        loader, None, get_optimizer(cfg))
    trainer.state = trainer._init_state(trainer._example_images(loader))
    step = trainer._train_step_fn()
    gen = trainer._device_train_batches()
    out = []
    for _ in range(steps):
        x, y, _, _ = next(gen)
        trainer.state, loss = step(trainer.state, x, y)
        out.append(float(loss))
    gen.close()
    return out


def test_prefetch_preserves_batch_order(fixture_root):
    sync = _losses(fixture_root, prefetch=0)
    asyn = _losses(fixture_root, prefetch=2)
    np.testing.assert_allclose(asyn, sync, rtol=1e-6)


def test_prefetch_stream_state_is_of_consumed_batch(fixture_root):
    """Under prefetch the grain iterator runs ahead; the state yielded with
    batch k must restore a fresh loader to yield EXACTLY batch k+1."""
    gp = pytest.importorskip("grain.python")  # noqa: F841

    from multiagentperception_tpu.data.grain_pipeline import GrainLoader

    class _IndexDataset:
        root, split = "idx", "train"

        def __len__(self):
            return 12

        def __getitem__(self, i):
            # (image, label) pair shape: both are just the index
            return (np.asarray([i], np.int64), np.asarray([i], np.int64))

    def make_loader():
        return GrainLoader(_IndexDataset(), batch_size=2, shuffle=True,
                           seed=3)

    cfg = _cfg("unused", prefetch=2)
    cfg["data"]["commun_label"] = "None"

    class _T(get_trainer(cfg)):
        # skip model-input munging: the "images" here are index arrays
        def _model_inputs(self, images):
            return images

        def _labels(self, labels):
            return labels

    trainer = _T(cfg, None, logging.getLogger("pfx"), None, None,
                 make_loader(), None, None)
    gen = trainer._device_train_batches()
    seen, states = [], []
    for _ in range(4):
        x, _y, _c, state = next(gen)
        seen.append(np.asarray(x).ravel().tolist())
        states.append(state)
    gen.close()
    assert all(s is not None for s in states)

    # restore a FRESH loader to the state captured with batch 1 (0-based):
    # the very next batch it yields must equal batch 2
    fresh = make_loader()
    fresh.set_state(states[1])
    it = fresh.persistent_iterator()
    nxt = np.asarray(next(it)[0]).ravel().tolist()
    assert nxt == seen[2], (nxt, seen)


def test_producer_error_does_not_wedge_when_consumer_left():
    """ADVICE r4: a loader error raised while the queue is full and the
    consumer has already exited must not pin the producer thread (and its
    `depth` device-placed batches) forever — the exception put must honor
    the stop event like the normal path."""
    import threading
    import time

    from multiagentperception_tpu.trainer import Trainer

    trainer = Trainer.__new__(Trainer)  # _prefetched needs no trainer state
    release = threading.Event()

    def gen():
        yield 1
        yield 2
        release.wait(5.0)  # let the consumer fill the queue and leave
        raise RuntimeError("loader died")

    stream = trainer._prefetched(gen(), depth=1)
    assert next(stream) == 1
    stream.close()  # consumer gone; queue still holds item 2
    release.set()
    t = trainer._prefetch_thread
    t.join(timeout=5.0)
    assert not t.is_alive(), "producer thread wedged on the exception put"


def test_shutdown_input_pipeline_stops_producer():
    """_shutdown_input_pipeline (pre-exec restart): stops the prefetch
    thread mid-stream and calls the loader's shutdown hook."""
    import itertools

    from multiagentperception_tpu.trainer import Trainer

    class FakeLoader:
        def __init__(self):
            self.shutdown_called = False

        def shutdown(self):
            self.shutdown_called = True

    trainer = Trainer.__new__(Trainer)
    trainer.trainloader = FakeLoader()
    stream = trainer._prefetched(itertools.count(), depth=2)
    assert next(stream) == 0
    trainer._shutdown_input_pipeline()
    assert trainer.trainloader.shutdown_called
    assert not trainer._prefetch_thread.is_alive()
