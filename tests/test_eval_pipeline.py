"""Unit tests for the pipelined eval loop (Trainer._pipelined_eval):
ordering, completeness, in-flight depth, and per-batch RNG freshness."""

import logging

import numpy as np

import jax.numpy as jnp

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.loss import get_loss_function
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.optimizers import get_optimizer
from multiagentperception_tpu.trainer import Trainer


def _mini_trainer():
    cfg = normalize_config({
        "model": {"arch": "Single_agent", "feat_channel": 32,
                  "multiple_output": False},
        "data": {"img_rows": 32, "img_cols": 32, "commun_label": "None"},
        "training": {"batch_size": 2},
    })
    model = get_model(cfg, 11)
    return Trainer(cfg, None, logging.getLogger("t"), model,
                   get_loss_function(cfg), None, None, get_optimizer(cfg))


class TestPipelinedEval:
    def _batches(self, n, rng):
        out = []
        for _ in range(n):
            imgs = rng.normal(size=(2, 1, 32, 32, 3)).astype(np.float32)
            lbls = rng.integers(0, 11, size=(2, 1, 32, 32)).astype(np.int32)
            out.append((imgs, lbls))
        return out

    def test_yields_every_batch_in_order(self, rng):
        trainer = _mini_trainer()
        batches = self._batches(5, rng)
        trainer.state = trainer._init_state(batches[0][0])

        calls = []

        def fake_step(state, x, y, rkey):
            calls.append(len(calls))
            return {"hist": jnp.full((11, 11), float(len(calls))),
                    "pred_count": x.shape[0]}

        got = [res["hist"][0, 0] for res, _ in
               trainer._pipelined_eval(batches, fake_step, depth=2)]
        assert [float(g) for g in got] == [1.0, 2.0, 3.0, 4.0, 5.0]
        assert len(calls) == 5

    def test_dispatch_runs_ahead_of_consumption(self, rng):
        trainer = _mini_trainer()
        batches = self._batches(6, rng)
        trainer.state = trainer._init_state(batches[0][0])

        dispatched = []

        def fake_step(state, x, y, rkey):
            dispatched.append(len(dispatched))
            return {"n": len(dispatched)}

        in_flight = []
        for res, _ in trainer._pipelined_eval(batches, fake_step, depth=2):
            # when result k is consumed, dispatch must already be >= k+depth
            # (except at the tail)
            in_flight.append(len(dispatched) - res["n"])
        assert max(in_flight) >= 2  # ran ahead by at least the depth
        assert in_flight[-1] == 0  # drained at the end

    def test_rng_fresh_per_batch(self, rng):
        trainer = _mini_trainer()
        batches = self._batches(3, rng)
        trainer.state = trainer._init_state(batches[0][0])
        keys = []

        def fake_step(state, x, y, rkey):
            keys.append(np.asarray(rkey).tolist())
            return {"hist": jnp.zeros((11, 11))}

        list(trainer._pipelined_eval(batches, fake_step, depth=1))
        assert len({tuple(k) for k in keys}) == 3  # all distinct

    def test_real_eval_step_through_pipeline(self, rng):
        """End-to-end: the real jitted eval step through the pipeline equals
        the same steps run synchronously."""
        trainer = _mini_trainer()
        batches = self._batches(4, rng)
        trainer.state = trainer._init_state(batches[0][0])
        step = trainer._eval_step_fn("softmax", with_loss=False)

        hists = [np.asarray(res["hist"]) for res, _ in
                 trainer._pipelined_eval(batches, step, depth=2)]

        import jax

        base = jax.random.PRNGKey(trainer.seed + 3)
        for i, (imgs, lbls) in enumerate(batches):
            x, y = trainer._put_batch(trainer._model_inputs(imgs),
                                      trainer._labels(lbls))
            ref = step(trainer.state, x, y, jax.random.fold_in(base, i))
            np.testing.assert_allclose(hists[i], np.asarray(ref["hist"]))
