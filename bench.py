"""Benchmark harness — prints ONE JSON line for the driver.

Measures eval throughput of the flagship mrms_when2com (MIMOcom) model:
N=6 agents, 512x512 inputs, 'activated' bandwidth-pruned inference, bf16
compute — the reference's headline eval path (trainer.py:774-840) — on one
TPU chip.

Methodology: this image reaches the TPU through a tunnel with ~20 ms fixed
round-trip per dispatch, so naive per-call timing measures the network, not
the chip. The harness therefore runs K eval steps inside ONE jitted
``lax.fori_loop`` (each step data-dependent on the last so nothing is
hoisted) and reports (t(K_hi) - t(K_lo)) / (K_hi - K_lo) — pure device time
per step, which is also what a pipelined production eval loop achieves since
async dispatch hides the RTT.

``vs_baseline`` is the ratio against the PyTorch reference measured on this
host via scripts/measure_reference_baseline.py (torch-cpu; no CUDA GPU exists
in this image — see BASELINE.md for methodology and caveats).

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


def _build(batch, img, agents, dtype):
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.models import get_model
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
    if dtype == jnp.bfloat16:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            variables,
        )
    return model, variables


def bench_eval(batch=16, img=512, agents=6, k_lo=2, k_hi=12, use_bf16=True):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multiagentperception_tpu.ops.comm import confusion_matrix

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model, variables = _build(batch, img, agents, dtype)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(
        rng.normal(size=(batch, agents, img, img, 3)), dtype
    )
    ys = jnp.asarray(
        rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32
    )

    def make_loop(k):
        @jax.jit
        def loop(variables, images, labels):
            def body(i, carry):
                hist, x = carry
                pred, prob, action, nc = model.apply(
                    variables, x, train=False, mo_flag=True,
                    inference="activated",
                )
                cls = jnp.argmax(pred, axis=-1)
                hist = hist + confusion_matrix(labels, cls, 11)
                # data-dependence between steps so nothing is hoisted
                x = x + jnp.asarray(1e-6, x.dtype) * (i + 1)
                return hist, x

            hist, _ = lax.fori_loop(
                0, k, body, (jnp.zeros((11, 11), jnp.float32), images)
            )
            return hist

        return loop

    def run(loop):
        h = loop(variables, xs, ys)
        np.asarray(h)  # forces completion through the tunnel
        t0 = time.time()
        h = loop(variables, xs, ys)
        np.asarray(h)
        return time.time() - t0

    lo, hi = make_loop(k_lo), make_loop(k_hi)
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    frames = batch * agents
    return frames / dt, dt


def bench_eval_dispatch(batch=16, img=512, agents=6, iters=10, use_bf16=True):
    """Fallback: per-dispatch timing (includes the ~20 ms tunnel RTT, so it
    UNDER-reports device throughput); used only if the on-device-loop path
    fails (remote-compile flakes happen in this image)."""
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.ops.comm import confusion_matrix

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model, variables = _build(batch, img, agents, dtype)

    @jax.jit
    def eval_fn(variables, images, labels):
        pred, prob, action, nc = model.apply(
            variables, images, train=False, mo_flag=True, inference="activated"
        )
        return confusion_matrix(labels, jnp.argmax(pred, axis=-1), 11)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(batch, agents, img, img, 3)), dtype)
    ys = jnp.asarray(rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32)
    np.asarray(eval_fn(variables, xs, ys))
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(eval_fn(variables, xs, ys))
        ts.append(time.time() - t0)
    dt = min(ts)
    return batch * agents / dt, dt


def main():
    try:
        fps, dt = bench_eval()
    except Exception as e:  # remote-compile flake: degrade, don't die
        print(f"on-device-loop bench failed ({e!r}); falling back to "
              f"per-dispatch timing (RTT-inclusive, under-reports)",
              file=sys.stderr)
        fps, dt = bench_eval_dispatch()
    print(
        f"device step={dt*1000:.2f} ms  fps={fps:.2f}  "
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
