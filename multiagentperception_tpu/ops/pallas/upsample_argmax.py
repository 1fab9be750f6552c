"""Pallas TPU kernel: fused bilinear x32 upsample + channel argmax.

The eval path ends with ``argmax(bilinear_resize(logits, H, W), axis=-1)``
(reference: trainer.py:804 ``outputs.max(1)[1]`` on the decoder's
interpolated logits, backbone.py:160). As two XLA ops this materializes the
full-resolution logits tensor in HBM — (B*N, 512, 512, 11) f32 is ~1.4 GB of
writes + 1.4 GB of argmax reads per eval step at batch 20 — only to reduce
it immediately. This kernel performs the separable-resize matmuls
(ops/resize.py formulation) and the argmax per output-row tile entirely in
VMEM and writes only the (B, H, W) int32 class map: ~22x less HBM traffic
for the epilogue.

Numerics are identical to ``argmax(bilinear_resize(...))`` including
lowest-index tie-breaking (validated in tests against the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multiagentperception_tpu.ops.resize import _weight_matrix, bilinear_resize


def _kernel(x_ref, wy_ref, wx_ref, out_ref, *, h: int, n_classes: int):
    # x: (1, C*h, w) channel-major; wy: (tile_h, h); wx: (W, w);
    # out: (1, tile_h, W). Everything stays strictly 2-D — Mosaic's vector
    # layout inference rejects rank-changing reshapes of the lane dim.
    wy = wy_ref[...]
    wx = wx_ref[...]
    best = None
    best_idx = None
    for c in range(n_classes):  # static unroll; C is tiny (11)
        lc = x_ref[0, c * h:(c + 1) * h, :].astype(jnp.float32)  # (h, w)
        rows = jax.lax.dot_general(
            wy, lc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (tile_h, w)
        full = jax.lax.dot_general(
            rows, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (tile_h, W)
        if best is None:
            best = full
            best_idx = jnp.zeros(full.shape, jnp.int32)
        else:
            take = full > best  # strict: ties keep the lowest index
            best = jnp.where(take, full, best)
            best_idx = jnp.where(take, c, best_idx)
    out_ref[0] = best_idx


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "interpret"))
def upsample_argmax_pallas(
    x: jnp.ndarray, out_h: int, out_w: int, interpret: bool = False
) -> jnp.ndarray:
    """argmax(bilinear_resize(x, out_h, out_w), axis=-1) fused in VMEM.

    x: (B, h, w, C) -> (B, out_h, out_w) int32.
    """
    b, h, w, c = x.shape
    wy = jnp.asarray(_weight_matrix(h, out_h, False), jnp.float32)
    wx = jnp.asarray(_weight_matrix(w, out_w, False), jnp.float32)
    # channel-major (B, C*h, w): lets the kernel take 2-D per-class slices
    xc = x.transpose(0, 3, 1, 2).reshape(b, c * h, w)
    # Output-row tiling: per-class (tile_h, out_w) f32 accumulators; 64 rows
    # keeps best+idx+temps well under 1 MB of VMEM.
    tile_h = 64 if out_h % 64 == 0 else out_h
    grid = (b, out_h // tile_h)
    kernel = functools.partial(_kernel, h=h, n_classes=c)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c * h, w), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, h), lambda i, t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_w, w), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, out_w), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), jnp.int32),
        interpret=interpret,
    )(xc, wy, wx)
    return out


def upsample_argmax(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Fused on TPU; plain XLA resize+argmax elsewhere (CPU tests/meshes)."""
    if jax.default_backend() == "cpu":
        return jnp.argmax(
            bilinear_resize(x.astype(jnp.float32), out_h, out_w), axis=-1
        ).astype(jnp.int32)
    return upsample_argmax_pallas(x, out_h, out_w)


def find_pre_logits(tree) -> jnp.ndarray | None:
    """Pull the decoder's pre-upsample logits out of a flax 'intermediates'
    collection (SimpleDecoder/FCNDecoder sow 'pre_logits'). Decoders called
    twice per forward (the pruned inference modes) sow twice — the LAST entry
    belongs to the returned prediction."""
    if isinstance(tree, (tuple, list)):
        return tree[-1] if len(tree) else None
    if hasattr(tree, "items"):
        if "pre_logits" in tree:
            return find_pre_logits(tree["pre_logits"])
        for v in tree.values():
            got = find_pre_logits(v)
            if got is not None:
                return got
    return None
