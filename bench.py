"""Benchmark harness — prints ONE JSON line for the driver.

Measures the flagship mrms_when2com (MIMOcom) model on one TPU chip:

- **eval**: N=6 agents, 512x512, 'activated' bandwidth-pruned inference,
  bf16 — the reference's headline eval path (trainer.py:774-840);
- **train**: one full optimization step (forward + BN stats + backward +
  adam), the reference's emitted Time/Image metric (trainer.py:675-688);
- **MFU**: XLA-counted FLOPs of the jitted eval step divided by device time
  and the chip's peak bf16 rate, so the "compute-bound" claim is checkable.

Methodology: this image reaches the TPU through a tunnel with ~20 ms fixed
round-trip per dispatch, so naive per-call timing measures the network, not
the chip. The harness therefore runs K steps inside ONE jitted
``lax.fori_loop`` (each step data-dependent on the last so nothing is
hoisted) and reports (t(K_hi) - t(K_lo)) / (K_hi - K_lo) — pure device time
per step, which is also what a pipelined production loop achieves since
async dispatch hides the RTT.

``vs_baseline`` is the ratio against the PyTorch reference measured on this
host via scripts/measure_reference_baseline.py (torch-cpu; no CUDA GPU exists
in this image — see BASELINE.md for methodology and caveats).

A frame = one camera view through the full pipeline (batch x agent_num frames
per forward), matching the reference's Time/Image accounting normalized by
batch.

``python bench.py --sweep`` additionally sweeps the eval batch size and
prints a fps-vs-batch table to stderr (used to pick the default batch; see
BASELINE.md for the recorded sweep).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


# one implementation (honors MAP_COMPILE_CACHE); re-exported because the
# scripts/bench_*.py harnesses import it from here
from multiagentperception_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from multiagentperception_tpu.utils import apply_platform_override  # noqa: E402

apply_platform_override()

# torch-cpu reference measurement (scripts/measure_reference_baseline.py on
# this host): 15378.6 ms/step at batch=2 -> 0.780 frames/sec.
TORCH_CPU_BASELINE_FPS = 0.780

# Peak dense bf16 matmul rates per chip generation (public spec sheets).
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# Measured through this stack (probe with loop-carried, fully-live outputs —
# naive probes get dead-code-eliminated to a single output element): bf16
# 4k^3 matmul 187 TF/s, int8 385 TOPS on v5e — both at spec peak.


def _build(batch, img, agents, dtype, train=False, remat=False):
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.config import normalize_config
    from multiagentperception_tpu.models import get_model
    from multiagentperception_tpu.utils import init_variables

    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": agents, "query_size": 32,
                  "key_size": 1024, "multiple_output": True, "remat": remat,
                  "dtype": "bfloat16" if dtype == jnp.bfloat16 else "float32"},
        "data": {"img_rows": img, "img_cols": img},
    })
    model = get_model(cfg, 11)
    x = jnp.zeros((batch, agents, img, img, 3), jnp.float32)
    kwargs = (dict(train=True, mo_flag=True) if train
              else dict(train=False, mo_flag=True, inference="activated"))
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)}, x, **kwargs)
    return model, variables


def _amortized_device_time(make_loop, run_args, k_lo, k_hi,
                           compiler_options=None):
    """Device seconds per step from two on-device loop lengths.

    ``compiler_options`` (dict) is forwarded to the XLA TPU compiler via the
    PJRT compile call — the only route in this image, whose client-side
    XLA_FLAGS parser rejects TPU backend flags (the compiler runs on the far
    side of the tunnel and validates the options there)."""
    import jax

    def prep(loop):
        if compiler_options:  # AOT-compile once; run() is called twice
            return loop.lower(*run_args).compile(
                compiler_options=compiler_options)
        return loop

    def run(loop):
        h = loop(*run_args)
        np.asarray(jax.tree_util.tree_leaves(h)[0])  # force completion
        t0 = time.time()
        h = loop(*run_args)
        np.asarray(jax.tree_util.tree_leaves(h)[0])
        return time.time() - t0

    lo, hi = prep(make_loop(k_lo)), prep(make_loop(k_hi))
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def bench_eval(batch=16, img=512, agents=6, k_lo=2, k_hi=12, use_bf16=True,
               int8=False, compiler_options=None, count_flops=True):
    """Returns (frames_per_sec, step_seconds, xla_flops_per_step|None).

    ``count_flops=False`` skips the extra cost-analysis compile (an entire
    second program) — sweeps that discard the FLOPs number should pass it,
    especially with the persistent compile cache disabled.

    ``int8=True`` measures the post-training-quantized serving path
    (multiagentperception_tpu/quantize.py): every conv tower runs int8 on the
    MXU (2x the bf16 peak on v5e) with statically calibrated activation
    scales, handshake/BN/classifier stay bf16. Measured v5e batch-20 sweep:
    static 36.4 ms (1.27x bf16), >=128-ch-only 39.7 ms, dynamic scales
    49.8 ms (0.94x — the per-conv max-reduce breaks XLA's fusions).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from multiagentperception_tpu.ops.comm import confusion_matrix
    from multiagentperception_tpu.quantize import (
        calibrate_activations,
        quantized_apply,
    )

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model, variables = _build(batch, img, agents, dtype)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(batch, agents, img, img, 3)), dtype)
    ys = jnp.asarray(
        rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32)

    act_scales = None
    if int8:
        act_scales = calibrate_activations(
            model, variables, [xs],
            train=False, mo_flag=True, inference="activated")

    def eval_step(variables, x, labels):
        if int8:
            pred, prob, action, nc = quantized_apply(
                model, variables, x, act_scales=act_scales,
                train=False, mo_flag=True, inference="activated")
        else:
            pred, prob, action, nc = model.apply(
                variables, x,
                train=False, mo_flag=True, inference="activated")
        return confusion_matrix(labels, jnp.argmax(pred, axis=-1), 11)

    def make_loop(k):
        @jax.jit
        def loop(variables, images, labels):
            def body(i, carry):
                hist, x = carry
                hist = hist + eval_step(variables, x, labels)
                # data-dependence between steps so nothing is hoisted
                x = x + jnp.asarray(1e-6, x.dtype) * (i + 1)
                return hist, x

            hist, _ = lax.fori_loop(
                0, k, body, (jnp.zeros((11, 11), jnp.float32), images))
            return hist

        return loop

    dt = _amortized_device_time(make_loop, (variables, xs, ys), k_lo, k_hi,
                                compiler_options=compiler_options)

    flops = None
    if count_flops:
        try:
            cost = jax.jit(eval_step).lower(
                variables, xs, ys).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:  # cost analysis is best-effort
            pass

    return batch * agents / dt, dt, flops


def bench_train(batch=20, img=512, agents=6, k_lo=1, k_hi=6, use_bf16=True,
                remat=False, compiler_options=None, count_flops=True):
    """Full train step (fwd + BN + bwd + adam). Returns (fps, step_seconds)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from multiagentperception_tpu.loss import cross_entropy2d

    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    model, variables = _build(batch, img, agents, dtype, train=True,
                              remat=remat)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-5)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(batch, agents, img, img, 3)), jnp.float32)
    ys = jnp.asarray(
        rng.integers(0, 11, size=(batch * agents, img, img)), jnp.int32)

    def one_step(carry, images, labels):
        params, batch_stats, opt_state = carry

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mo_flag=True, mutable=["batch_stats"])
            return cross_entropy2d(out[0], labels), upd["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_stats, new_opt), loss

    def make_loop(k):
        @jax.jit
        def loop(params, batch_stats, opt_state, images, labels):
            def body(i, carry):
                state, acc, x = carry
                state, loss = one_step(state, x, labels)
                x = x + jnp.asarray(1e-6, x.dtype) * (i + 1)
                return state, acc + loss, x

            _, acc, _ = lax.fori_loop(
                0, k, body,
                ((params, batch_stats, opt_state), jnp.float32(0), images))
            return acc

        return loop

    dt = _amortized_device_time(
        make_loop, (params, batch_stats, opt_state, xs, ys), k_lo, k_hi,
        compiler_options=compiler_options)

    flops = None
    if count_flops:
        try:
            # Cost-analyze ONE UNROLLED step, not the fori_loop: XLA's
            # cost_analysis does not sum while-loop body FLOPs, so the loop
            # program reported ~forward-only work (BENCH_r03's train_mfu_pct
            # was 3x low vs BASELINE.md's documented ~37%). The unrolled step
            # is the same fwd+BN+bwd+adam program the loop body runs.
            @jax.jit
            def one_step_flat(params, batch_stats, opt_state, images, labels):
                state, loss = one_step((params, batch_stats, opt_state),
                                       images, labels)
                return state, loss

            cost = one_step_flat.lower(
                params, batch_stats, opt_state, xs, ys).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:  # cost analysis is best-effort
            pass

    return batch * agents / dt, dt, flops


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
            variables, images, train=False, mo_flag=True, inference="activated")
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
    return batch * agents / dt, dt, None


def _device_peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    return kind, PEAK_BF16_FLOPS.get(kind)


def sweep(batches=(8, 16, 20, 24, 32)):
    for b in batches:
        try:
            fps, dt, flops = bench_eval(batch=b)
            mfu = ""
            if flops:
                kind, peak = _device_peak_flops()
                if peak:
                    mfu = f"  mfu={flops / dt / peak * 100:.1f}%"
            print(f"batch={b:3d}  step={dt * 1000:8.2f} ms  fps={fps:8.1f}"
                  f"  fps/frame-batch={fps / (b * 6):6.2f}{mfu}",
                  file=sys.stderr)
        except Exception as e:
            print(f"batch={b}: failed ({e!r})", file=sys.stderr)


def sweep_train(configs=((2, False), (4, False), (8, False), (16, False),
                         (8, True), (16, True))):
    for b, remat in configs:
        try:
            fps, dt, _ = bench_train(batch=b, remat=remat)
            print(f"train batch={b:3d} remat={int(remat)}  "
                  f"step={dt * 1000:8.2f} ms  fps={fps:7.1f}", file=sys.stderr)
        except Exception as e:
            print(f"train batch={b} remat={remat}: failed ({e!r})",
                  file=sys.stderr)


def latency():
    """Single-frame (batch 1) serving latency, bf16 and int8 — the
    latency-critical operating point, vs the batch-20 throughput knee."""
    for tag, kw in (("bf16", {}), ("int8", {"int8": True})):
        try:
            fps, dt, _ = bench_eval(batch=1, k_lo=4, k_hi=24, **kw)
            print(f"latency batch=1 {tag}: {dt * 1000:6.2f} ms/frame-set "
                  f"({dt * 1000 / 6:5.2f} ms/frame, {fps:6.1f} f/s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"latency {tag}: failed ({e!r})", file=sys.stderr)


def main():
    if "--sweep" in sys.argv:
        sweep()
        return
    if "--sweep-train" in sys.argv:
        sweep_train()
        return
    if "--latency" in sys.argv:
        latency()
        return

    # batch 20 is the measured throughput knee on v5e (see BASELINE.md sweep:
    # 20 -> 2603 f/s @ 55% MFU; 22-28 is a ~40% MFU cliff; 40 matches 20's
    # throughput at 2x the latency/memory)
    eval_batch = 20
    shape = {}
    train_kw = {}
    if "--tiny" in sys.argv:  # CI hook: same code paths at toy shapes
        eval_batch = 1
        shape = dict(img=64, agents=2, k_lo=1, k_hi=2)
        train_kw = dict(batch=1, **shape)
    try:
        fps, dt, flops = bench_eval(batch=eval_batch, **shape)
    except Exception as e:  # remote-compile flake: degrade, don't die
        print(f"on-device-loop bench failed ({e!r}); falling back to "
              f"per-dispatch timing (RTT-inclusive, under-reports)",
              file=sys.stderr)
        dispatch_shape = {k: shape[k] for k in ("img", "agents") if k in shape}
        fps, dt, flops = bench_eval_dispatch(batch=eval_batch, **dispatch_shape)

    extra = {"eval_step_ms": round(dt * 1000, 2), "eval_batch": eval_batch}

    kind, peak = _device_peak_flops()
    extra["device_kind"] = kind
    if flops:
        extra["eval_xla_tflops_per_step"] = round(flops / 1e12, 2)
        extra["eval_tflops_per_sec"] = round(flops / dt / 1e12, 1)
        if peak:
            extra["eval_mfu_pct"] = round(flops / dt / peak * 100, 1)

    try:
        i8_fps, i8_dt, _ = bench_eval(batch=eval_batch, int8=True, **shape)
        extra["eval_int8_frames_per_sec"] = round(i8_fps, 2)
        extra["eval_int8_step_ms"] = round(i8_dt * 1000, 2)
        extra["eval_int8_speedup"] = round(i8_fps / fps, 2)
    except Exception as e:
        print(f"int8 bench failed ({e!r}); bf16-only result", file=sys.stderr)

    try:
        train_fps, train_dt, train_flops = bench_train(**train_kw)
        extra["train_frames_per_sec"] = round(train_fps, 2)
        extra["train_step_ms"] = round(train_dt * 1000, 2)
        extra["train_batch"] = train_kw.get("batch", 20)
        if train_flops and peak:
            extra["train_xla_tflops_per_step"] = round(train_flops / 1e12, 2)
            extra["train_mfu_pct"] = round(
                train_flops / train_dt / peak * 100, 1)
    except Exception as e:
        print(f"train bench failed ({e!r}); eval-only result", file=sys.stderr)

    print(f"device eval step={dt * 1000:.2f} ms  fps={fps:.2f}  "
          f"extra={extra}  baseline(torch-cpu)={TORCH_CPU_BASELINE_FPS}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "eval_frames_per_sec_mrms_when2com_512_activated",
        "value": round(fps, 2),
        "unit": "frames/sec",
        # the comparison point is the PyTorch reference on THIS HOST's CPU
        # (no CUDA GPU exists in this image); see BASELINE.md for the
        # estimated GPU envelope (~32-85x at this throughput). The field
        # name vs_baseline is the driver contract; baseline_kind keeps it
        # from impersonating the "vs GPU" north-star ratio.
        "vs_baseline": round(fps / TORCH_CPU_BASELINE_FPS, 2),
        "baseline_kind": "torch_cpu_same_host",
        **extra,
    }))


if __name__ == "__main__":
    main()
