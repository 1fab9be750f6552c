"""Agent-count scaling benchmark: eval throughput vs N on one chip.

The design bet of this framework (ARCHITECTURE.md, SURVEY §7) is that the
agent axis folds into the batch for the conv towers and into one (B, K, Q)
einsum for the communication graph — so cost should scale ~linearly in N
(the O(N²) graph term is negligible at perception scales) with no
per-agent Python anywhere. This script measures that claim on real
hardware: MIMOcom eval at fixed total frame count B·N, sweeping N.

Beyond one chip's memory, the agent axis shards over an 'agent' mesh axis
with ring-fused value rotation (parallel/ring.py) — capability validated on
a virtual mesh in tests/test_ring.py; this script benches the single-chip
dense path.

Run: python scripts/bench_agents.py [--img 256] [--frames 96]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()


def bench_n(n_agents: int, batch: int, img: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    import bench
    from multiagentperception_tpu.ops.comm import confusion_matrix

    model, variables = bench._build(batch, img, n_agents, jnp.bfloat16)
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(batch, n_agents, img, img, 3)),
                     jnp.bfloat16)
    ys = jnp.asarray(
        rng.integers(0, 11, size=(batch * n_agents, img, img)), jnp.int32)

    def eval_step(variables, x, labels):
        pred, prob, action, nc = model.apply(
            variables, x, train=False, mo_flag=True, inference="activated")
        return confusion_matrix(labels, jnp.argmax(pred, axis=-1), 11)

    def make_loop(k):
        @jax.jit
        def loop(variables, images, labels):
            def body(i, carry):
                hist, x = carry
                hist = hist + eval_step(variables, x, labels)
                x = x + jnp.asarray(1e-6, x.dtype) * (i + 1)
                return hist, x

            hist, _ = lax.fori_loop(
                0, k, body, (jnp.zeros((11, 11), jnp.float32), images))
            return hist

        return loop

    dt = bench._amortized_device_time(make_loop, (variables, xs, ys), 2, 8)
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=256)
    p.add_argument("--frames", type=int, default=96,
                   help="total frames per step (B*N held constant)")
    p.add_argument("--agents", type=int, nargs="*",
                   default=[6, 12, 24, 48])
    args = p.parse_args()

    print(f"# MIMOcom eval, {args.img}^2, B*N={args.frames}, bf16, activated")
    print(f"{'N':>4} {'batch':>6} {'step ms':>9} {'frames/s':>9} "
          f"{'ms/frame':>9}")
    base = base_n = None
    for n in args.agents:
        b = max(args.frames // n, 1)
        try:
            dt = bench_n(n, b, args.img)
        except Exception as e:
            print(f"{n:>4} {b:>6}  failed: {e!r}")
            continue
        fps = b * n / dt
        per = dt * 1000 / (b * n)
        note = ""
        if base is None:
            base, base_n = per, n
        else:
            note = f"  ({per / base:.2f}x per-frame cost vs N={base_n})"
        print(f"{n:>4} {b:>6} {dt * 1000:>9.2f} {fps:>9.1f} {per:>9.3f}{note}",
              flush=True)


if __name__ == "__main__":
    main()
