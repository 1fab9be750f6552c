"""Fused ResNet basic-block Pallas kernel vs the XLA reference
(ops/pallas/fused_block.py): exact zero-padding border semantics, pair
packing for C=64, plain patches for C=128."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multiagentperception_tpu.ops.pallas.fused_block import (
    fold_bn,
    fused_basic_block,
    fused_basic_block_reference,
)


def _block_params(rng, c):
    w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.05, jnp.float32)
    s1, b1 = fold_bn(jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                     jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                     jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                     jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32))
    s2, b2 = fold_bn(jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
                     jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                     jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32),
                     jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32))
    return w1, s1, b1, w2, s2, b2


@pytest.mark.parametrize("c,hw,tile,pair", [
    (64, 64, 32, True),    # layer1 geometry (reduced spatial), pair-packed
    (64, 64, 32, False),   # plain patches on the same shapes
    (128, 32, 32, False),  # layer2 geometry: one tile covers the image
])
def test_matches_xla_reference(rng, c, hw, tile, pair):
    params = _block_params(rng, c)
    x = jnp.asarray(rng.normal(size=(2, hw, hw, c)), jnp.float32)
    ref = fused_basic_block_reference(x, *params)
    out = fused_basic_block(x, *params, tile=tile, pair=pair, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_border_zero_padding_semantics(rng):
    """Tiles at image borders must feed conv2 ZEROS outside the image (the
    ring mask), exactly like XLA's padded conv — a biased nonzero input
    image makes any ring error visible."""
    c = 64
    params = _block_params(rng, c)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, c)) + 1.0, jnp.float32)
    ref = fused_basic_block_reference(x, *params)
    out = fused_basic_block(x, *params, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_bf16_matches_loosely(rng):
    c = 64
    params = _block_params(rng, c)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, c)), jnp.bfloat16)
    ref = np.asarray(fused_basic_block_reference(x, *params), np.float32)
    out = np.asarray(
        fused_basic_block(x, *params, tile=32, interpret=True), np.float32)
    # bf16 patch matmuls vs XLA's bf16 conv: same inputs, different
    # accumulation grouping
    assert np.abs(out - ref).max() < 0.1 * np.abs(ref).max()
