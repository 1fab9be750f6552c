"""Pallas TPU kernel: fused ResNet basic block (eval mode) — MEASURED
NEGATIVE RESULT, kept as the recorded experiment (BASELINE.md round 3).

Round 2's eval ablation suggested headroom in the early ResNet stages
(layer1 "43% MFU", layer2 "46%"). This kernel was the attempt to claim it:
one VMEM-resident pass per spatial tile computing conv3x3 + BN + relu +
conv3x3 + BN + residual + relu with the intermediate never touching HBM,
convs as implicit-GEMM patch matmuls, and — for C=64 — a superpixel layout
((H+4, (W+4)/2, 2C), a free reshape) that pair-packs two output pixels
into the 128 MXU lanes (structural MAC utilization 75% instead of 50%,
every slice unit-stride, every DMA (8, 128)-aligned).

Measured on v5e at the flagship geometry (B*N=120, bf16,
scripts/bench_fused_block.py):

- XLA's layer2 stride-1 block: 1.57 ms = 183 TF/s = 93% MFU — round 2's
  "layer2 46%" was the stride-2+projection block's profile, NOT
  recoverable headroom;
- XLA's layer1 block: 3.80 ms = 76 TF/s = 77% of the 98.5 TF/s
  lane-underfill structural ceiling;
- this kernel (pair, tile 32): 11.6 ms; per-tap-accumulation variant:
  identical; tile 64: 10.0 ms. A DMA-only kernel at the same tiling
  (halo loads + output writes, zero compute) costs 7.55 ms by itself —
  the un-overlapped per-tile halo DMAs run at ~94 GB/s effective (22% of
  the chip's ~430 GB/s) and dominate everything.

Even with perfect DMA/compute overlap the floor is ~2.5-3 ms vs XLA's
3.8 ms, bounding the end-to-end eval win at ~1.1x — below the 1.2x bar
that would justify owning a conv kernel. The model zoo therefore does NOT
route through this kernel; it remains here with its tests
(tests/test_fused_block.py: exact zero-padding border semantics vs the
XLA path) and bench as the evidence behind that decision.
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


def _pair_patches(xs, out_h: int, pairs: int, c2: int):
    """Superpixel tile xs (h, ws, 2C) -> (out_h*pairs, 12C) patch matrix.

    Patch row (i, jp) is the extended window covering output pair jp:
    supercols jp, jp+1 and rows i..i+2 — lane blocks in (di, supercol)
    order, which equals the (di, dj)-major tap order of
    ``_pack_weights_pair`` (a supercol's 2C lanes are taps dj, dj+1).
    """
    cols = [
        xs[di:di + out_h, sc:sc + pairs, :].reshape(out_h * pairs, c2)
        for di in range(3) for sc in range(2)
    ]
    return jnp.concatenate(cols, axis=-1)


def _pair_conv_taps(xs, wref, out_h: int, pairs: int, c2: int):
    """Per-tap accumulation variant: 6 (M, 2C) x (2C, 2C) matmuls summed in
    f32 instead of one (M, 12C) patch matmul — no lane-dim concat, each tap
    contraction still runs the MXU at full 128 depth."""
    acc = None
    for t, (di, sc) in enumerate((di, sc) for di in range(3)
                                 for sc in range(2)):
        sl = xs[di:di + out_h, sc:sc + pairs, :].reshape(out_h * pairs, c2)
        part = jax.lax.dot_general(
            sl, wref[t * c2:(t + 1) * c2, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _plain_patches(x, out_h: int, out_w: int, c: int):
    """x (h, w, C) -> (out_h*out_w, 9C) 3x3 patch matrix ((di, dj)-major)."""
    cols = [
        x[di:di + out_h, dj:dj + out_w, :].reshape(out_h * out_w, c)
        for di in range(3) for dj in range(3)
    ]
    return jnp.concatenate(cols, axis=-1)


def _kernel_pair(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                 out_ref, x_t, sem, *, th: int, tw: int, h: int, w: int,
                 c: int, sp_tile: int):
    """Superpixel pair-packed body (C=64). x_hbm: (B, H+8, SP, 2C) where
    SP is the padded supercolumn count; tile reads (th+8, sp_tile, 2C)."""
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    t_j = pl.program_id(2)
    c2 = 2 * c

    dma = pltpu.make_async_copy(
        x_hbm.at[b_i, pl.ds(t_i * th, th + 8),
                 pl.ds(t_j * (tw // 2), sp_tile), :],
        x_t, sem)
    dma.start()
    dma.wait()
    xt = x_t[...]

    h1 = th + 2             # conv1 output rows incl. conv2's 1-ring
    pairs1 = tw // 2 + 1    # conv1 output pairs (ring covers +-1 col)
    y1 = _pair_conv_taps(xt, w1_ref[...], h1, pairs1, c2)
    y1 = jnp.maximum(y1 * s1_ref[...] + b1_ref[...], 0.0)
    y1 = y1.reshape(h1, pairs1, c2)

    # conv2 zero-pads at IMAGE borders: ring positions outside the image
    # must enter conv2 as zeros. Pair jp covers global cols
    # (tw*t_j - 1 + 2jp, +1): the two lane halves sit at different cols.
    gr = t_i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (h1, pairs1, c2), 0)
    gc = (t_j * tw - 1
          + 2 * jax.lax.broadcasted_iota(jnp.int32, (h1, pairs1, c2), 1)
          + (jax.lax.broadcasted_iota(jnp.int32, (h1, pairs1, c2), 2) >= c))
    inside = (gr >= 0) & (gr < h) & (gc >= 0) & (gc < w)
    y1 = jnp.where(inside, y1, 0.0).astype(xt.dtype)

    pairs2 = tw // 2
    y2 = _pair_conv_taps(y1, w2_ref[...], th, pairs2, c2)
    y2 = (y2 * s2_ref[...] + b2_ref[...]).reshape(th, pairs2, c2)

    # residual: output pair q sits at supercol q+1 of the tile (the global
    # col of pair element (q, parity) is tw*t_j + 2q + parity; +2 padding
    # makes supercol (tw*t_j + 2q + 2)/2 = tile-local q + 1)
    res = xt[2:2 + th, 1:1 + pairs2, :].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


def _kernel_plain(x_hbm, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                  out_ref, x_t, sem, *, th: int, tw: int, h: int, w: int,
                  c: int):
    """Plain-patch body (C >= 128; lanes already full)."""
    b_i = pl.program_id(0)
    t_i = pl.program_id(1)
    t_j = pl.program_id(2)

    dma = pltpu.make_async_copy(
        x_hbm.at[b_i, pl.ds(t_i * th, th + 8), pl.ds(t_j * tw, tw + 8), :],
        x_t, sem)
    dma.start()
    dma.wait()
    xt = x_t[...]

    h1, w1 = th + 2, tw + 2
    p1 = _plain_patches(xt, h1, w1, c)
    y1 = jax.lax.dot_general(
        p1, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 * s1_ref[...] + b1_ref[...], 0.0).reshape(h1, w1, c)

    gr = t_i * th - 1 + jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 0)
    gc = t_j * tw - 1 + jax.lax.broadcasted_iota(jnp.int32, (h1, w1), 1)
    inside = (gr >= 0) & (gr < h) & (gc >= 0) & (gc < w)
    y1 = jnp.where(inside[:, :, None], y1, 0.0).astype(xt.dtype)

    p2 = _plain_patches(y1, th, tw, c)
    y2 = jax.lax.dot_general(
        p2, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = (y2 * s2_ref[...] + b2_ref[...]).reshape(th, tw, c)

    res = xt[2:2 + th, 2:2 + tw, :].astype(jnp.float32)
    out_ref[0] = jnp.maximum(y2 + res, 0.0).astype(out_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


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
    ``pair=None`` auto-selects superpixel pair packing for C < 128.
    """
    bsz, h, w, c = x.shape
    if h % tile or w % tile:
        raise ValueError(f"H/W {h}x{w} not divisible by tile {tile}")
    if pair is None:
        pair = c < 128
    # the CPU backend (tests / virtual meshes) only supports interpret mode
    interpret = interpret or jax.default_backend() == "cpu"
    n_th, n_tw = h // tile, w // tile

    if pair:
        c2 = 2 * c
        # supercolumn tile: 2-halo needs tile/2 + 2 supercols; Mosaic DMA
        # slices align to 8 sublanes, so over-fetch to the next multiple
        sp_need = tile // 2 + 2
        sp_tile = _round_up(sp_need, 8)
        sp_total = (n_tw - 1) * (tile // 2) + sp_tile
        pad_w = 2 * sp_total - w - 2  # left pad 2, right pad to alignment
        xp = jnp.pad(x, ((0, 0), (2, 6), (2, pad_w), (0, 0)))
        xs = xp.reshape(bsz, h + 8, sp_total, c2)
        w1m = _pack_weights_pair(w1).astype(x.dtype)
        w2m = _pack_weights_pair(w2).astype(x.dtype)
        s1m = jnp.concatenate([s1, s1]).astype(jnp.float32)
        b1m = jnp.concatenate([b1, b1]).astype(jnp.float32)
        s2m = jnp.concatenate([s2, s2]).astype(jnp.float32)
        b2m = jnp.concatenate([b2, b2]).astype(jnp.float32)
        kernel = functools.partial(
            _kernel_pair, th=tile, tw=tile, h=h, w=w, c=c, sp_tile=sp_tile)
        out_spec = pl.BlockSpec(
            (1, tile, tile // 2, c2), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bsz, h, w // 2, c2), x.dtype)
        scratch = pltpu.VMEM((tile + 8, sp_tile, c2), x.dtype)
    else:
        # 8-aligned halo tile: read (tile+8, tile+8) windows of the
        # (2, 6)-padded input at stride `tile`
        xp = jnp.pad(x, ((0, 0), (2, 6), (2, 6), (0, 0)))
        xs = xp
        w1m = w1.reshape(9 * c, c).astype(x.dtype)
        w2m = w2.reshape(9 * c, c).astype(x.dtype)
        s1m, b1m = s1.astype(jnp.float32), b1.astype(jnp.float32)
        s2m, b2m = s2.astype(jnp.float32), b2.astype(jnp.float32)
        kernel = functools.partial(
            _kernel_plain, th=tile, tw=tile, h=h, w=w, c=c)
        out_spec = pl.BlockSpec(
            (1, tile, tile, c), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype)
        scratch = pltpu.VMEM((tile + 8, tile + 8, c), x.dtype)

    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, n_th, n_tw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vec] * 6,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[scratch, pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xs, w1m, s1m, b1m, w2m, s2m, b2m)
    if pair:
        out = out.reshape(bsz, h, w, c)
    return out


def fused_basic_block_reference(x, w1, s1, b1, w2, s2, b2):
    """XLA reference of the same eval-mode block (for tests/benches)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(v, k):
        # NOTE: no preferred_element_type here — forcing f32 conv output on
        # bf16 inputs drops XLA off the fused MXU path entirely (measured
        # 246 ms vs 3.4 ms for one layer1 block at batch 120)
        return jax.lax.conv_general_dilated(
            v, k.astype(v.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn)

    y = jnp.maximum(conv(x, w1).astype(jnp.float32) * s1 + b1,
                    0.0).astype(x.dtype)
    y2 = conv(y, w2).astype(jnp.float32) * s2 + b2
    return jnp.maximum(y2 + x.astype(jnp.float32), 0.0).astype(x.dtype)
