"""Sparsemax (Martins & Astudillo 2016) as a pure-JAX op with a custom VJP.

Behavioral parity target: the hand-written torch module in the reference
(ptsemseg/models/utils.py:821-887), including its backward rule
``grad = S * (g - sum(g*S)/sum(S))`` where ``S`` is the nonzero-support mask.

TPU notes: the op runs on tiny (B, N<=6) communication-graph logits, so a sort
-based projection is fine — it vectorizes on the VPU and has no data-dependent
control flow, so it fuses into the surrounding attention computation under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sparsemax_2d(z: jnp.ndarray) -> jnp.ndarray:
    """Sparsemax along the last axis of a 2-D array."""
    z = z - jax.lax.stop_gradient(jnp.max(z, axis=-1, keepdims=True))
    n = z.shape[-1]
    z_sorted = -jnp.sort(-z, axis=-1)  # descending
    k_range = jnp.arange(1, n + 1, dtype=z.dtype)
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = (1.0 + k_range * z_sorted) > z_cumsum
    k = jnp.max(jnp.where(support, k_range, 0.0), axis=-1, keepdims=True)
    tau_sum = jnp.sum(jnp.where(support, z_sorted, 0.0), axis=-1, keepdims=True)
    tau = (tau_sum - 1.0) / k
    return jnp.maximum(z - tau, 0.0)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def sparsemax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sparse alternative to softmax: Euclidean projection onto the simplex.

    ``axis`` is static (nondiff) — it selects program structure.
    """
    return _sparsemax_apply(logits, axis)


def _sparsemax_apply(logits: jnp.ndarray, axis: int) -> jnp.ndarray:
    moved = jnp.moveaxis(logits, axis, -1)
    shape = moved.shape
    out = _sparsemax_2d(moved.reshape(-1, shape[-1]).astype(jnp.float32))
    return jnp.moveaxis(out.reshape(shape).astype(logits.dtype), -1, axis)


def _sparsemax_fwd(logits, axis):
    out = _sparsemax_apply(logits, axis)
    return out, out


def _sparsemax_bwd(axis, out, g):
    support = (out != 0).astype(g.dtype)
    # Mean of incoming grads over the support set (reference backward,
    # models/utils.py:878-887), subtracted from each supported coordinate.
    s = jnp.sum(g * support, axis=axis, keepdims=True)
    cnt = jnp.maximum(jnp.sum(support, axis=axis, keepdims=True), 1.0)
    return (support * (g - s / cnt),)


sparsemax.defvjp(_sparsemax_fwd, _sparsemax_bwd)
