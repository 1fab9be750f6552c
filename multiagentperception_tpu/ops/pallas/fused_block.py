"""Pallas TPU kernel: fused ResNet basic block (eval mode).

The round-2 eval ablation (BASELINE.md) pins the remaining single-chip
headroom on the EARLY ResNet stages: layer1 (64ch @128^2) runs at 43% MFU
and layer2 (128ch @64^2) at 46%, while the deep stages hit 82-92%. Two
structural causes:

- every conv round-trips its full activation tensor through HBM (layer1's
  tensors are 252 MB each at batch 120 — ~4.7 ms of pure HBM traffic per
  ResNet pass at the measured ~430 GB/s);
- 64 output channels fill only half the MXU's 128 lanes.

This kernel fuses a whole stride-1 basic block — conv3x3 + BN + relu +
conv3x3 + BN + residual add + relu (models/blocks.py:BasicBlock, eval mode
with BN folded to scale/shift) — into one VMEM-resident pass per spatial
tile: the intermediate activation never touches HBM, and the convs run as
implicit-GEMM patch matmuls with the full K = 9*C contraction depth.

For C=64 the patch matmul additionally packs TWO horizontally-adjacent
output pixels into the 128 lanes ("pair packing"): patch rows hold an
extended 3x4 window (12 taps, K' = 768) and the weight matrix holds two
shifted copies of the 3x3 kernel, so each MXU pass produces 128 useful
columns instead of 64. Structural MAC utilization rises from 50% to
2*576/768 = 75%.

Correctness: zero-padding semantics at image borders are reproduced by
masking the conv1 ring outputs that fall outside the image (conv2 must see
zeros there, exactly like XLA's padded conv); validated against the XLA
path in tests/test_fused_block.py (interpret mode on CPU, plus the
stride-1 layer1/layer2 geometries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BN as a per-channel (s, b): y = x*s + b (f32)."""
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return s, b


def _pack_weights_pair(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, C) -> (12*C, 2*C) pair-packed implicit-GEMM weights.

    Patch rows hold an extended (3 rows x 4 cols x C) window in
    (di, dj)-major order; output column block 0 computes the window's LEFT
    output pixel (taps dj=0..2), block 1 the RIGHT one (taps dj=1..3).
    """
    c = w.shape[2]
    cout = w.shape[3]
    w2 = jnp.zeros((12 * c, 2 * cout), w.dtype)
    for di in range(3):
        for dj in range(3):
            t_l = di * 4 + dj          # left pixel: taps at dj
            t_r = di * 4 + (dj + 1)    # right pixel: same kernel, shifted
            w2 = w2.at[t_l * c:(t_l + 1) * c, :cout].set(w[di, dj])
            w2 = w2.at[t_r * c:(t_r + 1) * c, cout:].set(w[di, dj])
    return w2


def _patches(x, out_h: int, out_w: int):
    """x (h, w, C) -> (out_h*out_w, 9*C) 3x3 patch matrix ((di, dj)-major)."""
    cols = [
        x[di:di + out_h, dj:dj + out_w, :].reshape(out_h * out_w, x.shape[-1])
        for di in range(3) for dj in range(3)
    ]
    return jnp.concatenate(cols, axis=-1)


def _patches_pair(x, out_h: int, out_w: int):
    """x (h, w, C) -> (out_h*(out_w//2), 12*C) pair-packed patch matrix.

    Row (i, jp) holds x[i:i+3, 2*jp:2*jp+4, :] flattened (di, dj)-major;
    matches _pack_weights_pair's layout.
    """
    c = x.shape[-1]
    pairs = out_w // 2
    cols = []
    for di in range(3):
        for dj in range(4):
            # every second column starting at dj: (out_h, pairs, C)
            sl = jax.lax.slice(
                x, (di, dj, 0),
                (di + out_h, dj + 2 * (pairs - 1) + 1, c), (1, 2, 1))
            cols.append(sl.reshape(out_h * pairs, c))
    return jnp.concatenate(cols, axis=-1)


def _unpack_pair(y, out_h: int, out_w: int, c: int):
    """(out_h*(out_w//2), 2*C) -> (out_h, out_w, C) interleaving pixel pairs."""
    pairs = out_w // 2
    left = y[:, :c].reshape(out_h, pairs, 1, c)
    right = y[:, c:].reshape(out_h, pairs, 1, c)
    return jnp.concatenate([left, right], axis=2).reshape(out_h, out_w, c)


def _kernel(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, out_ref,
            x_t, sem, *, th: int, tw: int, h: int, w: int, c: int,
            pair: bool):
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    t_j = pl.program_id(2)

    # halo load: (th+4, tw+4, C) window of the 2-padded input
    dma = pltpu.make_async_copy(
        x_hbm.at[b_i, pl.ds(t_i * th, th + 4), pl.ds(t_j * tw, tw + 4), :],
        x_t, sem)
    dma.start()
    dma.wait()
    xt = x_t[...]

    h1, w1 = th + 2, tw + 2  # conv1 output region incl. 1-ring for conv2
    if pair:
        p1 = _patches_pair(xt, h1, w1)
    else:
        p1 = _patches(xt, h1, w1)
    y1 = jax.lax.dot_general(
        p1, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    s1 = s1_ref[...]
    b1 = b1_ref[...]
    y1 = jnp.maximum(y1 * s1 + b1, 0.0)

    if pair:
        y1 = _unpack_pair(y1, h1, w1, c)
    else:
        y1 = y1.reshape(h1, w1, c)

    # conv2 zero-pads at IMAGE borders: ring positions outside the image
    # must enter conv2 as zeros, not as conv1 outputs of the padding
    gr = t_i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 0)
    gc = t_j * tw - 1 + jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 1)
    inside = (gr >= 0) & (gr < h) & (gc >= 0) & (gc < w)
    y1 = jnp.where(inside[:, :, None], y1, 0.0).astype(xt.dtype)

    if pair:
        p2 = _patches_pair(y1, th, tw)
    else:
        p2 = _patches(y1, th, tw)
    y2 = jax.lax.dot_general(
        p2, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = y2 * s2_ref[...] + b2_ref[...]
    if pair:
        y2 = _unpack_pair(y2, th, tw, c)
    else:
        y2 = y2.reshape(th, tw, c)

    res = xt[2:2 + th, 2:2 + tw, :].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "pair", "interpret"),
)
def fused_basic_block(
    x: jnp.ndarray,
    w1: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
    tile: int = 32,
    pair: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Eval-mode stride-1 ResNet basic block, fused in VMEM.

    x: (B, H, W, C); w1/w2: (3, 3, C, C) conv kernels; s/b: folded BN
    scale/shift (fold_bn). Returns relu(bn2(conv2(relu(bn1(conv1(x))))) + x).
    ``pair=None`` auto-selects pair packing for C < 128.
    """
    bsz, h, w, c = x.shape
    if h % tile or w % tile:
        raise ValueError(f"H/W {h}x{w} not divisible by tile {tile}")
    if pair is None:
        pair = c < 128
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))

    if pair:
        w1m = _pack_weights_pair(w1).astype(x.dtype)
        w2m = _pack_weights_pair(w2).astype(x.dtype)
        s1m = jnp.concatenate([s1, s1]).astype(jnp.float32)
        b1m = jnp.concatenate([b1, b1]).astype(jnp.float32)
        s2m = jnp.concatenate([s2, s2]).astype(jnp.float32)
        b2m = jnp.concatenate([b2, b2]).astype(jnp.float32)
    else:
        w1m = w1.reshape(9 * c, c).astype(x.dtype)
        w2m = w2.reshape(9 * c, c).astype(x.dtype)
        s1m, b1m = s1.astype(jnp.float32), b1.astype(jnp.float32)
        s2m, b2m = s2.astype(jnp.float32), b2.astype(jnp.float32)

    kernel = functools.partial(
        _kernel, th=tile, tw=tile, h=h, w=w, c=c, pair=pair)
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // tile, w // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # padded x, DMA'd manually
            vec, vec, vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile, c), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 4, tile + 4, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w1m, s1m, b1m, w2m, s2m, b2m)


def fused_basic_block_reference(x, w1, s1, b1, w2, s2, b2):
    """XLA reference of the same eval-mode block (for tests/benches)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(v, k):
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn, preferred_element_type=jnp.float32)

    y = jnp.maximum(conv(x, w1) * s1 + b1, 0.0).astype(x.dtype)
    y2 = conv(y, w2) * s2 + b2
    return jnp.maximum(y2 + x.astype(jnp.float32), 0.0).astype(x.dtype)
