"""Exactness of the dense-backward max pool (ops/pool.py) against XLA's
reduce_window/SelectAndScatter lowering of nn.max_pool — values AND
gradients, including tie-heavy inputs where the row-major first-max
tie-break is observable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multiagentperception_tpu.ops.pool import max_pool3s2


def _xla_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def _cases():
    rng = np.random.default_rng(0)
    smooth = rng.normal(size=(2, 16, 12, 5)).astype(np.float32)
    # post-relu-like: ~60% exact zeros -> many tied windows
    relu = np.maximum(rng.normal(size=(2, 16, 12, 5)) - 0.3, 0).astype(
        np.float32)
    # coarsely quantized -> ties between nonzero values too
    quant = (rng.integers(0, 4, size=(3, 8, 8, 4))).astype(np.float32)
    return {"smooth": smooth, "relu": relu, "quant": quant}


@pytest.mark.parametrize("name", ["smooth", "relu", "quant"])
def test_forward_matches_xla(name):
    x = jnp.asarray(_cases()[name])
    np.testing.assert_array_equal(np.asarray(max_pool3s2(x)),
                                  np.asarray(_xla_pool(x)))


@pytest.mark.parametrize("name", ["smooth", "relu", "quant"])
def test_gradient_matches_xla(name):
    x = jnp.asarray(_cases()[name])
    dy = jnp.asarray(
        np.random.default_rng(1).normal(size=_xla_pool(x).shape).astype(
            np.float32))

    def g(pool):
        _, vjp = jax.vjp(pool, x)
        return np.asarray(vjp(dy)[0])

    # same index sets, but positions fed by several windows accumulate in
    # a different order than XLA's scatter -> 1-ulp associativity slack
    np.testing.assert_allclose(g(max_pool3s2), g(_xla_pool),
                               rtol=1e-6, atol=1e-7)


def test_gradient_matches_torch_tie_break():
    """torch MaxPool2d routes tied gradients to the first max in window
    order (its returned argmax index); the custom backward must agree so
    the train-step parity guarantee survives the pool swap."""
    torch = pytest.importorskip("torch")
    x_np = _cases()["quant"]
    dy_rng = np.random.default_rng(2)

    xt = torch.tensor(np.transpose(x_np, (0, 3, 1, 2)), requires_grad=True)
    yt = torch.nn.functional.max_pool2d(xt, 3, stride=2, padding=1)
    dy_np = dy_rng.normal(size=tuple(yt.shape)).astype(np.float32)
    yt.backward(torch.tensor(dy_np))
    want = np.transpose(xt.grad.numpy(), (0, 2, 3, 1))

    x = jnp.asarray(x_np)
    _, vjp = jax.vjp(max_pool3s2, x)
    got = np.asarray(vjp(jnp.asarray(np.transpose(dy_np, (0, 2, 3, 1))))[0])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_bf16_and_jit():
    x = jnp.asarray(_cases()["relu"], jnp.bfloat16)

    @jax.jit
    def f(x):
        return jnp.sum(max_pool3s2(x).astype(jnp.float32) ** 2)

    gx = jax.grad(f)(x)
    assert gx.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())


def test_odd_size_rejected():
    with pytest.raises(ValueError):
        max_pool3s2(jnp.zeros((1, 7, 8, 3)))
