"""Benchmark harness — prints ONE JSON line for the driver.

Measures eval throughput of the flagship mrms_when2com (MIMOcom) model:
N=6 agents, 512x512 inputs, 'activated' bandwidth-pruned inference — the
reference's headline eval path (trainer.py:774-840) — on the available
accelerator (one TPU chip under the driver).

``vs_baseline`` is the ratio against the PyTorch reference measured on this
host via scripts/measure_reference_baseline.py (torch-cpu; no CUDA GPU exists
in this image — see BASELINE.md for the methodology and caveats).

A frame = one camera view through the full pipeline (batch x agent_num frames
per forward), matching the reference's Time/Image accounting normalized by
batch (trainer.py:675-688).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# torch-cpu reference measurement (scripts/measure_reference_baseline.py on
# this host): 15378.6 ms/step at batch=2 -> 0.780 frames/sec.
TORCH_CPU_BASELINE_FPS = 0.780


def bench_eval(batch=8, img=512, agents=6, iters=20, warmup=3):
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.ops.comm import confusion_matrix
    from multiagentperception_tpu.utils import init_variables

    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": agents, "query_size": 32,
                  "key_size": 1024, "multiple_output": True},
        "data": {"img_rows": img, "img_cols": img},
    })
    model = get_model(cfg, 11)
    x = jnp.zeros((batch, agents, img, img, 3), jnp.float32)
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)}, x,
        train=False, mo_flag=True, inference="activated",
    )

    @jax.jit
    def eval_fn(variables, images, labels):
        pred, prob, action, nc = model.apply(
            variables, images, train=False, mo_flag=True, inference="activated"
        )
        cls = jnp.argmax(pred, axis=-1)
        # metrics on device (framework eval design): the host reads back an
        # (11, 11) histogram + tiny action/bandwidth stats, not label maps
        hist = confusion_matrix(labels, cls, 11)
        return hist, action, nc

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    ys = jnp.asarray(
        rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32
    )
    for _ in range(warmup):
        np.asarray(eval_fn(variables, xs, ys)[0])
    t0 = time.time()
    for _ in range(iters):
        out = eval_fn(variables, xs, ys)
        np.asarray(out[0])  # forces completion; the real per-batch readback
    dt = (time.time() - t0) / iters
    frames = batch * agents
    return frames / dt, dt


def main():
    fps, dt = bench_eval()
    print(
        f"step={dt*1000:.2f} ms  fps={fps:.2f}  "
        f"baseline(torch-cpu)={TORCH_CPU_BASELINE_FPS}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "eval_frames_per_sec_mrms_when2com_512_activated",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / TORCH_CPU_BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
