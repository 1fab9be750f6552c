"""Max-pool 3x3/stride-2/pad-1 with a dense (scatter-free) custom
backward — a RECORDED NEGATIVE RESULT, kept as the measured experiment;
the model zoo stays on ``nn.max_pool``.

XLA lowers the gradient of an overlapping-window max pool to
SelectAndScatter, whose marginal cost inside the ResNet stem measures
~8.9 ms at B*N=120 bf16 — ~9% of the training step over the two encoder
towers (BASELINE.md round-3 backward ablation). This module was the
attempt to beat it: the forward records WHICH tap won as a compact index
(first maximal element in row-major window order — the same tie-break
SelectAndScatter and torch's MaxPool2d use, verified in
tests/test_pool.py on tie-heavy inputs), and the backward never
scatters — input position (i, j) belongs to at most four windows, the
window/tap pair that can route gradient to it is fixed by the parity of
(i, j), so dx assembles as four parity phases of ``dy * (arg == tap)``
interleaved by reshape.

Measured on v5e (stem-marginal, BASELINE.md): the dense backward is
1.6-1.8x SLOWER than SelectAndScatter — the parity-interleaved 1 GB
output write at C=64-minor layout plus the extra forward pass for ``arg``
cost more than the scatter saves, in both interleave formulations tried.
Gradients are exact vs XLA/torch (tests/test_pool.py), so the experiment
is safe to revisit if XLA's SelectAndScatter regresses.

Geometry is fixed to the ResNet stem's pool (window 3, stride 2, SAME-1
padding, even H and W), the only pool in the model zoo
(reference: backbone.py:58-96 maxpool after conv1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tap_views(xpad: jnp.ndarray, out_h: int, out_w: int):
    """The nine (B, out_h, out_w, C) strided views of the padded input,
    in row-major window order (tap t = 3*di + dj)."""
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(
                jax.lax.slice(
                    xpad,
                    (0, di, dj, 0),
                    (xpad.shape[0], di + 2 * out_h - 1, dj + 2 * out_w - 1,
                     xpad.shape[3]),
                    (1, 2, 2, 1),
                ))
    return views


def _fwd_with_arg(x: jnp.ndarray):
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"max_pool3s2 needs even spatial dims, got {h}x{w}")
    oh, ow = h // 2, w // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    taps = _tap_views(xpad, oh, ow)
    y = taps[0]
    for t in taps[1:]:
        y = jnp.maximum(y, t)
    # first tap (row-major window order) achieving the max — matches
    # SelectAndScatter / torch tie-breaking
    arg = jnp.full(y.shape, 255, jnp.uint8)
    for t in range(8, -1, -1):
        arg = jnp.where(taps[t] == y, jnp.uint8(t), arg)
    return y, arg


@jax.custom_vjp
def max_pool3s2(x: jnp.ndarray) -> jnp.ndarray:
    """Max pool, window 3x3, stride 2, padding 1 (NHWC, even H and W).

    Identical values to ``nn.max_pool(x, (3, 3), strides=(2, 2),
    padding=[(1, 1), (1, 1)])``; identical gradient including tie-breaks
    (1-ulp summation-order slack), computed without SelectAndScatter —
    but measured SLOWER than it on v5e; see the module docstring."""
    y, _ = _fwd_with_arg(x)
    return y


def _pool_fwd(x):
    y, arg = _fwd_with_arg(x)
    return y, (arg, x.shape)


def _pool_bwd(res, dy):
    arg, x_shape = res
    b, h, w, c = x_shape
    oh, ow = h // 2, w // 2

    # pad dy/arg with one trailing row+column so the "next window" reads
    # (p+1 / q+1) are in range; the pad contributes zero (tap 255 matches
    # nothing)
    dyp = jnp.pad(dy, ((0, 0), (0, 1), (0, 1), (0, 0)))
    argp = jnp.pad(arg, ((0, 0), (0, 1), (0, 1), (0, 0)),
                   constant_values=jnp.uint8(255))

    def take(dp, dq, tap):
        """dy[m+dp, n+dq] where arg[m+dp, n+dq] == tap, as (B, oh, ow, C)."""
        sl = jax.lax.slice(dyp, (0, dp, dq, 0),
                           (b, dp + oh, dq + ow, c))
        sa = jax.lax.slice(argp, (0, dp, dq, 0),
                           (b, dp + oh, dq + ow, c))
        return jnp.where(sa == jnp.uint8(tap), sl, jnp.zeros_like(sl))

    # input row i = 2p + di - 1:  even i -> di = 1;  odd i -> di in {0, 2}
    # (di=0 reads window p+1, di=2 reads window p); same for columns.
    # tap index t = 3*di + dj.
    ee = take(0, 0, 4)                       # dx[2m,   2n  ]
    eo = take(0, 1, 3) + take(0, 0, 5)       # dx[2m,   2n+1]
    oe = take(1, 0, 1) + take(0, 0, 7)       # dx[2m+1, 2n  ]
    oo = (take(1, 1, 0) + take(1, 0, 2)
          + take(0, 1, 6) + take(0, 0, 8))   # dx[2m+1, 2n+1]

    # interleave columns then rows: (B, oh, ow, 2, C) -> (B, oh, w, C)
    even_rows = jnp.stack([ee, eo], axis=3).reshape(b, oh, w, c)
    odd_rows = jnp.stack([oe, oo], axis=3).reshape(b, oh, w, c)
    dx = jnp.stack([even_rows, odd_rows], axis=2).reshape(b, h, w, c)
    return (dx,)


max_pool3s2.defvjp(_pool_fwd, _pool_bwd)
