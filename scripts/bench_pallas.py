"""Microbenchmark: Pallas fused comm kernel vs the pure-XLA einsum path.

The comm step is deliberately tiny relative to the conv towers (~1 ms of
device work at batch 8), and this image's TPU tunnel adds ~20 ms RTT per
dispatch, so both paths measure RTT-dominated here; the numbers below are
chained-dispatch wall times with identical bias — useful for relative
comparison only. (Wrapping the Pallas call in lax.fori_loop to amortize the
RTT hangs the remote Mosaic compile in this image — see SKILL.md gotchas.)

Correctness vs the XLA path is covered by tests/test_pallas_comm.py and a
real-TPU smoke check (bf16 tolerance: coef ~5e-3, fused ~3e-2).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from multiagentperception_tpu.utils import enable_compile_cache

enable_compile_cache()

from multiagentperception_tpu.ops.pallas import (
    fused_comm_step,
    fused_comm_step_reference,
)


def wall_time(fn, args, iters=20):
    out = fn(*args)
    np.asarray(out[1])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(out[1])
    return (time.time() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    B, N, D, H, W, C = 8, 6, 1024, 16, 16, 512
    q = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, N, H, W, C)), jnp.bfloat16)

    for mode in ("softmax", "activated", "argmax"):
        tp = wall_time(
            lambda q, k, v: fused_comm_step(q, k, v, mode=mode, diag_bias=0.001)[:2],
            (q, k, v),
        )
        tx = wall_time(
            lambda q, k, v: fused_comm_step_reference(
                q, k, v, mode=mode, diag_bias=0.001
            ),
            (q, k, v),
        )
        print(f"{mode:10s}  pallas {tp*1e3:7.2f} ms   xla {tx*1e3:7.2f} ms  "
              f"(incl ~20 ms tunnel RTT each)")


if __name__ == "__main__":
    main()
