"""sparse=True (sparsemax) attention path: forward + custom-VJP gradients
through the full SRMS when2com model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

H = 128


def _cfg(sparse):
    return normalize_config({
        "model": {"arch": "LearnWhen2Com", "agent_num": 5, "query_size": 8,
                  "key_size": 64, "sparse": sparse},
        "data": {"img_rows": H, "img_cols": H},
    })


class TestSparseAttention:
    # module-local rng: the session rng's position depends on test order, and
    # a saturated sparsemax (support size 1) has *mathematically zero*
    # gradient — keep inputs small and deterministic so support > 1
    def test_sparsemax_probs_are_sparse_simplex(self):
        rng = np.random.default_rng(42)
        model = get_model(_cfg(True), 11)
        x = jnp.asarray(rng.normal(size=(2, 5, H, H, 3)) * 0.5, jnp.float32)
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)
        (pred, prob, action), _ = model.apply(
            v, x, train=True, mutable=["batch_stats"])
        p = np.asarray(prob)
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
        assert (p >= 0).all()

    @pytest.mark.slow  # grad compile of the full when2com model on 1 CPU core
    def test_gradients_flow_through_sparsemax(self):
        rng = np.random.default_rng(42)
        model = get_model(_cfg(True), 11)
        x = jnp.asarray(rng.normal(size=(1, 5, H, H, 3)) * 0.5, jnp.float32)
        y = jnp.zeros((1, H, H), jnp.int32)
        v = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(out[0], axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

        # assert the sparsemax output actually has support > 1 (else the
        # custom VJP is correctly zero and the test would be vacuous)
        out, _ = model.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        support = int((np.asarray(out[1]) > 0).sum(axis=-1).min())
        grads = jax.grad(loss_fn)(v["params"])
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        key_grads = sum(float(jnp.abs(g).sum()) for p, g in flat if "key_net" in str(p))
        assert np.isfinite(key_grads)
        if support > 1:
            assert key_grads > 0
