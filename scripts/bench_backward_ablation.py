"""Train-step backward ablation (VERDICT r2 #7): WHERE the 37%-MFU train
step spends its backward, and one measured reformulation attempt.

Experiments (bf16, B*N = 120 frames, DCE-safe loop-carried methodology as
bench.py):

1. per-stage fwd vs fwd+bwd device time for the ResNet-18 stages — pins
   which stages lose the most efficiency in the backward;
2. stride-2 input-gradient micro-bench: XLA's native dilated-conv transpose
   vs the phase-decomposed formulation (4 stride-1 convs on the even/odd
   output phases, interleaved) on the layer2.0 geometry. If the manual
   formulation wins standalone, a custom_vjp conv is worth building; a
   negative result bounds the dilated-backward hypothesis with numbers.

Run: python scripts/bench_backward_ablation.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multiagentperception_tpu.utils import enable_compile_cache

enable_compile_cache()

import numpy as np


def bench(make_step, args, k_lo=2, k_hi=8):
    """Amortized per-step device time, bench.py methodology (fully-live
    loop-carried state, two trip counts to cancel dispatch/readback).

    The trip count is a TRACED argument (fori_loop lowers to while_loop),
    so each probe costs ONE compile; the k_lo/k_hi runs share the
    executable. Everything the step needs (params included) must come in
    via ``args`` — closed-over arrays become inline MLIR constants, whose
    serialization alone measured 138 s for a ~100-op program on this host
    (and is not covered by the persistent compile cache)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    step = make_step()

    @jax.jit
    def loop(k, x, *rest):
        def body(i, carry):
            y = step(carry, *rest)
            leaves = jax.tree_util.tree_leaves(y)
            upd = sum((jnp.mean(l.astype(jnp.float32)) for l in leaves),
                      jnp.float32(0))
            return carry + (upd * 1e-6).astype(carry.dtype)

        return lax.fori_loop(0, k, body, x)

    def sync(out):
        # force completion with a ~2-byte readback: a device-side slice is
        # sequenced after the loop, and np.asarray on it blocks (reading the
        # FULL carry would drag 100s of MB through the tunnel per run;
        # block_until_ready alone does not reliably block through it)
        np.asarray(out.ravel()[:1])

    def run(k):
        sync(loop(jnp.int32(k), *args))
        t0 = time.time()
        sync(loop(jnp.int32(k), *args))
        return time.time() - t0

    run(k_lo)  # compile once
    t_lo = min(run(k_lo), run(k_lo))
    t_hi = min(run(k_hi), run(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def stage_ablation():
    """fwd vs fwd+bwd per ResNet stage (stem, layer1..4) at B=120 bf16."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from multiagentperception_tpu.models.blocks import (
        BasicBlock,
        TorchBatchNorm,
        conv_init,
    )

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, kernel_init=conv_init,
                        dtype=jnp.bfloat16)(x)
            x = TorchBatchNorm(use_running_average=True,
                               dtype=jnp.bfloat16)(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    class Stage(nn.Module):
        features: int
        strides: int

        @nn.compact
        def __call__(self, x):
            x = BasicBlock(self.features, self.strides,
                           dtype=jnp.bfloat16)(x, False)
            return BasicBlock(self.features, 1, dtype=jnp.bfloat16)(x, False)

    B = 120
    stages = [
        ("layer1", Stage(64, 1), (B, 128, 128, 64)),
        ("layer2", Stage(128, 2), (B, 128, 128, 64)),
        ("layer3", Stage(256, 2), (B, 64, 64, 128)),
        ("layer4", Stage(512, 2), (B, 32, 32, 256)),
        ("stem", Stem(), (B, 512, 512, 3)),
    ]
    print(f"{'stage':8s} {'fwd ms':>8s} {'fwd+bwd ms':>10s} {'bwd/fwd':>8s}",
          flush=True)
    rows = []
    for name, mod, shape in stages:
        # inputs are generated ON DEVICE: host-side np arrays of this size
        # take tens of minutes to dribble through the tunnel (85% sys-time
        # stall, measured) — the same trap bench.py's jnp.zeros avoids
        print(f"[{name}] gen input...", file=sys.stderr, flush=True)
        x = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
        x.block_until_ready()
        print(f"[{name}] init...", file=sys.stderr, flush=True)
        v = jax.jit(mod.init)(jax.random.PRNGKey(0), x)
        jax.block_until_ready(v)
        print(f"[{name}] bench fwd...", file=sys.stderr, flush=True)

        def make_fwd(mod=mod):
            def f(x, v):
                return mod.apply(v, x)
            return f

        def make_bwd(mod=mod):
            def f(x, v):
                def loss(p, x):
                    return jnp.sum(
                        mod.apply({**v, "params": p}, x).astype(jnp.float32)
                        ** 2)
                gp, gx = jax.grad(loss, argnums=(0, 1))(v["params"], x)
                return (gp, gx)
            return f

        t_f = bench(make_fwd, (x, v))
        t_fb = bench(make_bwd, (x, v))
        rows.append((name, t_f, t_fb))
        print(f"{name:8s} {t_f*1e3:8.2f} {t_fb*1e3:10.2f} "
              f"{(t_fb - t_f)/t_f:8.2f}", flush=True)
    return rows


def stride2_grad_micro():
    """Input-gradient of a 3x3/s2 conv: XLA transpose (lhs-dilated conv) vs
    the 4-phase decomposition (each output phase is a stride-1 conv with a
    kernel tap subset; interleave). layer2.0.conv1 geometry."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, H, C_IN, C_OUT = 120, 128, 64, 128
    rng = np.random.default_rng(1)
    dy = jax.random.normal(jax.random.PRNGKey(2),
                           (B, H // 2, H // 2, C_OUT), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3),
                          (3, 3, C_IN, C_OUT), jnp.bfloat16) * 0.05

    dn = lax.conv_dimension_numbers((B, H, H, C_IN), w.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def xla_input_grad(dy, w):
        # d/dx of conv(x, w, stride 2, pad 1): transposed conv = conv of the
        # lhs-dilated dy with the spatially-flipped, io-swapped kernel
        wt = jnp.swapaxes(w[::-1, ::-1], 2, 3)  # (3,3,C_OUT,C_IN)
        return lax.conv_general_dilated(
            dy, wt, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=lax.conv_dimension_numbers(
                dy.shape, wt.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def phase_input_grad(dy, w):
        """Forward: y[i] = sum_di x[2i+di-1] * w[di] (pad 1, k 3, s 2), so
        dx[p] gathers taps with di = p+1-2i in 0..2 — the tap PARITY is
        fixed by p's parity. Even rows (p=2i') take the single tap w[1]
        (dx[2i'] += dy[i'] w[1]); odd rows take w[2], w[0]
        (dx[2i'+1] = dy[i'] w[2] + dy[i'+1] w[0], zero-padded at the end).
        Each of the 4 (row, col)-parity phases is therefore a plain
        stride-1, lhs-dilation-free conv over dy; interleave the results."""
        cin = w.shape[2]
        wf = jnp.swapaxes(w, 2, 3)  # (3, 3, C_OUT, C_IN), untransposed taps
        hh = dy.shape[1]
        bsz = dy.shape[0]

        def taps(parity):
            # correlation kernels: even phase [w1]; odd phase [w2, w0]
            return [1] if parity == 0 else [2, 0]

        phases = {}
        for a in (0, 1):
            for b in (0, 1):
                ti, tj = taps(a), taps(b)
                wk = wf[jnp.asarray(ti)][:, jnp.asarray(tj)]
                pad_h = (0, 0) if len(ti) == 1 else (0, 1)
                pad_w = (0, 0) if len(tj) == 1 else (0, 1)
                phases[(a, b)] = lax.conv_general_dilated(
                    dy, wk, window_strides=(1, 1), padding=(pad_h, pad_w),
                    dimension_numbers=lax.conv_dimension_numbers(
                        dy.shape, wk.shape, ("NHWC", "HWIO", "NHWC")),
                    preferred_element_type=jnp.float32).astype(dy.dtype)
        cols = [
            jnp.stack([phases[(a, 0)], phases[(a, 1)]], axis=3)
            .reshape(bsz, hh, 2 * hh, cin)
            for a in (0, 1)
        ]
        return jnp.stack(cols, axis=2).reshape(bsz, 2 * hh, 2 * hh, cin)

    # correctness cross-check on small shapes first
    dy_s = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    w_s = jnp.asarray(rng.normal(size=(3, 3, 3, 4)), jnp.float32)
    x_s = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)

    def conv_s2(x, w):
        return lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))

    _, vjp = jax.vjp(lambda x: conv_s2(x, w_s), x_s)
    want = vjp(dy_s)[0]
    got = np.asarray(phase_input_grad(dy_s, w_s), np.float32)
    err = np.abs(got - np.asarray(want)).max() / (np.abs(want).max() + 1e-9)
    print(f"phase-decomposition correctness (rel err vs vjp): {err:.2e}")
    assert err < 1e-5, err

    t_xla = bench(lambda: lambda dy, w: xla_input_grad(dy, w), (dy, w))
    t_phase = bench(lambda: lambda dy, w: phase_input_grad(dy, w), (dy, w))
    flops = 2 * B * (H // 2) ** 2 * 9 * C_IN * C_OUT * 2  # useful MACs*2 ~ dx
    print(f"s2 input-grad  XLA dilated: {t_xla*1e3:7.3f} ms "
          f"({flops/t_xla/1e12:5.1f} TF/s)")
    print(f"s2 input-grad  4-phase:     {t_phase*1e3:7.3f} ms "
          f"({flops/t_phase/1e12:5.1f} TF/s)  {t_xla/t_phase:4.2f}x")


if __name__ == "__main__":
    import jax

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    stage_ablation()
    stride2_grad_micro()
