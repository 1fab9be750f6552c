"""Per-tower device-time ablation of the flagship eval step.

The profiler plugin in this image is version-broken (protobuf mismatch), so
this measures the pipeline by ablation: each sub-tower jitted alone, device
time amortized over an on-device fori_loop (see bench.py for the tunnel
methodology). Percentages won't sum exactly to the full step (XLA fuses
across tower boundaries in context) but they rank the optimization targets.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def _amortized(fn, args, k_lo=2, k_hi=10):
    def make(k):
        @jax.jit
        def loop(*a):
            def body(i, carry):
                acc, first = carry
                out = fn(first, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
                first = first + jnp.asarray(1e-6, first.dtype) * (i + 1)
                return acc, first

            acc, _ = lax.fori_loop(0, k, body, (jnp.float32(0), a[0]))
            return acc

        return loop

    def run(loop):
        np.asarray(loop(*args))
        t0 = time.time()
        np.asarray(loop(*args))
        return time.time() - t0

    lo, hi = make(k_lo), make(k_hi)
    t_lo = min(run(lo), run(lo))
    t_hi = min(run(hi), run(hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def main(batch=20, img=512, agents=6):
    from multiagentperception_tpu.models.modules import (
        ImgDecoder,
        ImgEncoder,
        KMGenerator,
        PolicyNet4,
    )

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    bn = batch * agents
    x = jnp.asarray(rng.normal(size=(bn, img, img, 3)), dt)

    def bench_module(name, mod, inp, **apply_kw):
        variables = mod.init(jax.random.PRNGKey(0), inp, **apply_kw)
        if "batch_stats" not in variables:
            variables = dict(variables)

        def f(z, v):
            return mod.apply(v, z, **apply_kw)

        t = _amortized(f, (inp, variables))
        print(f"{name:28s} {t * 1000:8.2f} ms")
        return t

    enc = ImgEncoder(dtype=dt)
    t_enc = bench_module("u_encoder (resnet+squeeze)", enc, x, train=False)
    pol = PolicyNet4(dtype=dt)
    t_pol = bench_module("policy tower", pol, x, train=False)
    feat = jnp.asarray(rng.normal(size=(bn, img // 32, img // 32, 512)), dt)
    dec = ImgDecoder(dtype=dt)
    t_dec = bench_module("decoder (+x32 upsample)", dec, feat, train=False)
    qk = jnp.asarray(rng.normal(size=(bn, img // 128, img // 128, 256)), dt)
    km = KMGenerator(1024, dtype=dt)
    t_km = bench_module("km head (key 1024)", km, qk)

    print(f"{'sum of towers':28s} {(t_enc + t_pol + t_dec + t_km) * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
