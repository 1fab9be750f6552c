"""Standalone bench: fused basic-block Pallas kernel vs the XLA path.

Geometries are the flagship eval step's layer1/layer2 stages at the
throughput-knee batch (B*N = 120 frames, bf16). Methodology: K steps inside
one jitted fori_loop, the full output folded back into the carried input so
nothing is dead-code-eliminated, time = (t(K_hi)-t(K_lo))/(K_hi-K_lo)
(see bench.py; the tunnel RTT makes per-dispatch timing meaningless).

Run: python scripts/bench_fused_block.py [--pair-only]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np


def bench(fn, args, k_lo=10, k_hi=60):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(k):
        @jax.jit
        def loop(x, *rest):
            def body(i, carry):
                x = carry
                y = fn(x, *rest)
                # fold the FULL output back into the carry: fully live
                x = x + (y * jnp.asarray(1e-6, y.dtype)).astype(x.dtype)
                return x

            out = lax.fori_loop(0, k, body, x)
            # scalar result: the sum consumes every element of the final
            # carry (nothing is DCE-able), and the readback through the
            # ~100 MB/s tunnel stays tiny — reading back the full carry
            # swamped the timing with seconds of transfer jitter
            return jnp.sum(out.astype(jnp.float32))

        return loop

    def run(loop):
        out = loop(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = loop(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        return time.time() - t0

    lo, hi = make_loop(k_lo), make_loop(k_hi)
    t_lo = min(run(lo), run(lo), run(lo))
    t_hi = min(run(hi), run(hi), run(hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp

    from multiagentperception_tpu.ops.pallas.fused_block import (
        fold_bn,
        fused_basic_block,
        fused_basic_block_reference,
    )

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)
    B = 120  # batch 20 x 6 agents

    for name, c, hw in (("layer1", 64, 128), ("layer2", 128, 64)):
        x = jnp.asarray(rng.normal(size=(B, hw, hw, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
        ones, zeros = jnp.ones(c, jnp.float32), jnp.zeros(c, jnp.float32)
        s1, b1 = fold_bn(ones, zeros, zeros, ones)
        s2, b2 = fold_bn(ones, zeros, zeros, ones)
        params = (w1, s1, b1, w2, s2, b2)

        # one basic block = 2 convs; FLOPs for MFU accounting
        flops = 2 * B * hw * hw * (9 * c * c * 2)

        t_xla = bench(lambda x, *p: fused_basic_block_reference(x, *p),
                      (x,) + params)
        print(f"{name}  XLA block:        {t_xla*1e3:7.3f} ms  "
              f"({flops/t_xla/1e12:5.1f} TF/s)", flush=True)

        # plain mode needs full 128 lanes (Mosaic DMA slices align to the
        # (8, 128) tiling); pair/superpixel mode IS the C=64 path
        variants = ([("pair", True, 32)] if c < 128
                    else [("plain", False, 32)])
        for tag, pair, tile in variants:
            try:
                t = bench(lambda x, *p: fused_basic_block(
                    x, *p, tile=tile, pair=pair), (x,) + params)
                print(f"{name}  pallas {tag:5s} t{tile}: {t*1e3:7.3f} ms  "
                      f"({flops/t/1e12:5.1f} TF/s)  {t_xla/t:4.2f}x vs XLA",
                      flush=True)
            except Exception as e:
                print(f"{name}  pallas {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
