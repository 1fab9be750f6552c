"""Pallas fused communication kernel: exact equivalence with the pure-XLA
einsum path across all modes (CPU interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.ops.pallas import (
    fused_comm_step,
    fused_comm_step_reference,
)


@pytest.fixture(scope="module")
def qkv(rng):
    B, N, D, H, W, C = 2, 6, 32, 4, 4, 8
    q = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, N, H, W, C)), jnp.float32)
    return q, k, v


class TestFusedCommKernel:
    @pytest.mark.parametrize("mode", ["softmax", "activated", "argmax"])
    def test_matches_xla_path(self, qkv, mode):
        q, k, v = qkv
        f1, c1, s1 = fused_comm_step(q, k, v, mode=mode, diag_bias=0.001,
                                 interpret=True)
        f2, c2 = fused_comm_step_reference(q, k, v, mode=mode, diag_bias=0.001)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)
        # pre-mask graph equals the softmax(+bias) reference graph
        _, soft_ref = fused_comm_step_reference(q, k, v, mode="softmax",
                                                diag_bias=0.001)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(soft_ref), atol=1e-5)

    def test_argmax_is_one_hot(self, qkv):
        q, k, v = qkv
        _, coef, _ = fused_comm_step(q, k, v, mode="argmax", interpret=True)
        c = np.asarray(coef)
        assert ((c == 0) | (c == 1)).all()
        np.testing.assert_array_equal(c.sum(axis=1), 1.0)

    def test_activated_prunes(self, qkv):
        q, k, v = qkv
        _, coef, _ = fused_comm_step(q, k, v, mode="activated", thres=0.2,
                                     interpret=True)
        c = np.asarray(coef)
        assert ((c > 0.2) | (c == 0)).all()

    def test_bad_mode_raises(self, qkv):
        q, k, v = qkv
        with pytest.raises(ValueError):
            fused_comm_step(q, k, v, mode="bogus", interpret=True)
