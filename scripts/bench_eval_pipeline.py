"""Measure the pipelined (async-dispatch) eval loop against a synchronous
per-batch loop on this host (VERDICT round-1 Weak #3).

The tunnel to the TPU costs ~20 ms per dispatch and the jitted eval step is
~45 ms of device time at batch 16, so a synchronous loop (dispatch -> wait ->
read back -> repeat) gives a large slice of wall-clock to the network. The
trainer's `_pipelined_eval` keeps `depth` batches in flight; this script
times both paths over identical in-memory batches (no host decode, to
isolate the dispatch effect) with full metric processing.
"""

import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()

from multiagentperception_tpu.config import normalize_config  # noqa: E402
from multiagentperception_tpu.loss import get_loss_function  # noqa: E402
from multiagentperception_tpu.metrics import runningScore  # noqa: E402
from multiagentperception_tpu.models import get_model  # noqa: E402
from multiagentperception_tpu.optimizers import get_optimizer  # noqa: E402
from multiagentperception_tpu.trainer import Trainer  # noqa: E402


def main(batch=16, img=512, agents=6, n_batches=6, reps=3, raw_uint8=False):
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": agents, "query_size": 32,
                  "key_size": 1024, "multiple_output": True,
                  "dtype": "bfloat16"},
        "data": {"img_rows": img, "img_cols": img, "commun_label": "mimo",
                 "target_view": "6agent",
                 "on_device_normalize": raw_uint8},
        "training": {"batch_size": batch},
    })
    model = get_model(cfg, 11)
    trainer = Trainer(cfg, None, logging.getLogger("bench"), model,
                      get_loss_function(cfg), None, None, get_optimizer(cfg))

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(n_batches):
        if raw_uint8:
            imgs = rng.integers(0, 256, (batch, agents, img, img, 3)).astype(np.uint8)
        else:
            imgs = rng.normal(size=(batch, agents, img, img, 3)).astype(np.float32)
        lbls = rng.integers(0, 11, size=(batch, agents, img, img)).astype(np.int32)
        comm = np.zeros((batch, 2, agents), np.int64)
        comm[:, 0, :2] = 1  # two "noisy" agents
        batches.append((imgs, lbls, comm))

    trainer.state = trainer._init_state(batches[0][0])
    eval_step = trainer._eval_step_fn("activated", with_loss=False)

    def run(depth):
        metrics = runningScore(11)
        t0 = time.time()
        for res, commun_label in trainer._pipelined_eval(batches, eval_step,
                                                         depth=depth):
            metrics.update_hist(res["hist"], res.get("hist_pos"),
                                res.get("hist_neg"))
            if "num_connect" in res:
                metrics.update_bandW(float(res["num_connect"]))
            if commun_label is not None and "action" in res:
                trainer._update_selection(metrics, commun_label, res["action"])
        return time.time() - t0

    run(2)  # compile + warm
    sync = min(run(0) for _ in range(reps))
    asyn = min(run(2) for _ in range(reps))
    frames = batch * agents * n_batches
    tag = "uint8+device-norm" if raw_uint8 else "f32"
    print(f"[{tag}] sync  (depth=0): {sync:.3f}s  {frames / sync:7.1f} frames/s")
    print(f"[{tag}] async (depth=2): {asyn:.3f}s  {frames / asyn:7.1f} frames/s")
    print(f"[{tag}] speedup: {sync / asyn:.2f}x")
    return sync, asyn


if __name__ == "__main__":
    main(raw_uint8="--uint8" in sys.argv)
