"""Pallas TPU kernel: the fused when2com communication step.

One kernel per batch element computes the whole agent handshake:

    logits = K Q'^T            (MXU: (N, D) x (D, N))
    coef   = softmax over keys (+0.001 I diagonal bias, agent.py:1164-1167)
    coef   = mode mask         (softmax | activated >0.2 | one-hot argmax)
    fused  = coef^T V          (MXU: (N, N) x (N, H*W*C))

keeping keys/queries/attention entirely in VMEM and writing only the fused
maps + the (N, N) graph back to HBM. The value maps stream HBM->VMEM once.

This is the op the whole framework is named for — the reference spreads it
over four Python-loop stages (agent.py:1124-1167) and two device round trips.
XLA already fuses our einsum formulation well (ops/comm.py); the Pallas
version exists to (a) pin the fused single-pass formulation for serving
builds, (b) own the mode masks inside the kernel so pruned modes never
materialize a second coefficient tensor. Numerics are validated against the
pure-XLA path in tests (CPU interpret mode) and benchmarked on hardware by
scripts/bench_pallas.py.

Mosaic constraint note: N (agents) is tiny, so all (N, ...) tiles are padded
to the 8x128 f32 tile internally by Mosaic; the FLOPs are negligible either
way — the kernel's value is the single-pass memory schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODES = ("softmax", "activated", "argmax")


def _comm_kernel(q_ref, k_ref, v_ref, fused_ref, coef_ref, soft_ref, *,
                 mode: str, diag_bias: float, thres: float):
    n = q_ref.shape[1]
    q = q_ref[0].astype(jnp.float32)  # (N, D) projected queries
    k = k_ref[0].astype(jnp.float32)  # (N, D) keys
    logits = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (N_keys, N_queries)
    coef = jax.nn.softmax(logits, axis=0)
    if diag_bias:
        coef = coef + diag_bias * jnp.eye(n, dtype=jnp.float32)
    soft_ref[0] = coef  # pre-mask graph (the reference's prob_action)
    if mode == "activated":
        coef = jnp.where(coef > thres, coef, 0.0)
    elif mode == "argmax":
        mx = jnp.max(coef, axis=0, keepdims=True)
        onehot = (coef == mx).astype(jnp.float32)
        # break ties toward the first key like argmax: keep the lowest index
        idx = jax.lax.broadcasted_iota(jnp.int32, coef.shape, 0)
        first = jnp.min(jnp.where(onehot > 0, idx, n), axis=0, keepdims=True)
        coef = (idx == first).astype(jnp.float32)
    coef_ref[0] = coef
    v = v_ref[0]  # (N, M) flattened value maps
    fused = jax.lax.dot_general(
        coef, v.astype(jnp.float32),
        (((0,), (0,)), ((), ())),  # sum over keys
        preferred_element_type=jnp.float32,
    )  # (N_queries, M)
    fused_ref[0] = fused.astype(fused_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "diag_bias", "thres", "interpret")
)
def fused_comm_step(
    query_proj: jnp.ndarray,  # (B, N, D) — already through the Dense W
    keys: jnp.ndarray,        # (B, N, D)
    vals: jnp.ndarray,        # (B, N, H, W, C)
    mode: str = "softmax",
    diag_bias: float = 0.0,
    thres: float = 0.2,
    interpret: bool = False,
):
    """Returns (fused (B, N, H, W, C), coef_masked (B, K, Q),
    coef_soft (B, K, Q)) — coef_soft is the pre-mask softmax(+bias) graph,
    i.e. the reference's ``prob_action``."""
    if mode not in MODES:
        raise ValueError(f"mode {mode!r} not in {MODES}")
    # the CPU backend (tests / virtual meshes) only supports interpret mode
    interpret = interpret or jax.default_backend() == "cpu"
    b, n, h, w, c = vals.shape
    m = h * w * c
    v2 = vals.reshape(b, n, m)
    kernel = functools.partial(
        _comm_kernel, mode=mode, diag_bias=diag_bias, thres=thres
    )
    fused, coef, soft = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, query_proj.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, keys.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, m), vals.dtype),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
            jax.ShapeDtypeStruct((b, n, n), jnp.float32),
        ),
        interpret=interpret,
    )(
        query_proj.reshape(b, n, -1),
        keys.reshape(b, n, -1),
        v2,
    )
    return fused.reshape(b, n, h, w, c), coef, soft


def fused_comm_step_reference(
    query_proj, keys, vals, mode="softmax", diag_bias=0.0, thres=0.2
):
    """Pure-XLA reference implementation (the einsum path the models use)."""
    logits = jnp.einsum("bkd,bqd->bkq", keys, query_proj).astype(jnp.float32)
    coef = jax.nn.softmax(logits, axis=1)
    n = coef.shape[1]
    if diag_bias:
        coef = coef + diag_bias * jnp.eye(n, dtype=coef.dtype)[None]
    if mode == "activated":
        coef = jnp.where(coef > thres, coef, 0.0)
    elif mode == "argmax":
        idx = jnp.argmax(coef, axis=1)
        coef = jax.nn.one_hot(idx, n, dtype=coef.dtype, axis=1)
    fused = jnp.einsum("bkq,bkhwc->bqhwc", coef.astype(vals.dtype), vals)
    return fused, coef
