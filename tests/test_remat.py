"""model.remat: rematerialized encoder towers give matching outputs and
gradients (within recompute-reassociation tolerance) (jax.checkpoint trades FLOPs for activation memory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

H = 128


def _model(remat):
    cfg = normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 3, "query_size": 8,
                  "key_size": 64, "multiple_output": True, "remat": remat},
        "data": {"img_rows": H, "img_cols": H},
    })
    return get_model(cfg, 11)


class TestRemat:
    @pytest.mark.slow  # grad compile of 2 full models on 1 CPU core
    def test_outputs_and_grads_match(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 3, H, H, 3)), jnp.float32)
        y = jnp.zeros((3, H, H), jnp.int32)
        m0, m1 = _model(False), _model(True)
        v = init_variables(m0, {"params": jax.random.PRNGKey(0)}, x,
                           train=True, mo_flag=True)

        def loss(model, params):
            out, _ = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=True, mo_flag=True, mutable=["batch_stats"])
            logp = jax.nn.log_softmax(out[0], axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

        l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
        # rtol: remat reorders the recompute schedule, and the persistent
        # compile cache may hold code generated on a different host uarch —
        # both legally reorder f32 reductions
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        # recompute reassociates float ops, so exact elementwise equality
        # doesn't hold on deep towers; require per-leaf alignment instead
        leaves0 = jax.tree_util.tree_flatten_with_path(g0)[0]
        leaves1 = jax.tree_util.tree_flatten_with_path(g1)[0]
        global_norm = np.sqrt(sum(float(jnp.sum(g * g)) for _, g in leaves0))
        for (p0, a), (p1, b) in zip(leaves0, leaves1):
            a = np.asarray(a, np.float64).ravel()
            b = np.asarray(b, np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            # conv biases feeding straight into BatchNorm have mathematically
            # zero gradient — what remains is roundoff; skip noise-level leaves
            if max(na, nb) < 1e-6 * global_norm:
                continue
            cos = float(a @ b / (na * nb))
            assert cos > 0.999, f"{p0}: cos={cos}"
            assert abs(na - nb) / max(na, nb) < 0.01, f"{p0}: norms {na} vs {nb}" 
