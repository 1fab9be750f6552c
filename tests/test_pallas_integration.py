"""MIMOcom with the fused Pallas comm path (model.pallas_comm) produces the
same predictions/graph/bandwidth as the XLA selection path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

H = 128

pytestmark = pytest.mark.slow  # compiles two full MIMOcom programs per mode on CPU


def _cfg(pallas):
    return normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": 3, "query_size": 8,
                  "key_size": 64, "multiple_output": True,
                  "pallas_comm": pallas},
        "data": {"img_rows": H, "img_cols": H},
    })


@pytest.fixture(scope="module")
def setup(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, H, H, 3)), jnp.float32)
    m_xla = get_model(_cfg(False), 11)
    m_pls = get_model(_cfg(True), 11)
    v = init_variables(m_xla, {"params": jax.random.PRNGKey(0)}, x,
                       train=True, mo_flag=True)
    return m_xla, m_pls, v, x


class TestPallasIntegration:
    @pytest.mark.parametrize("mode", ["argmax_test", "activated"])
    def test_eval_modes_match_xla_path(self, setup, mode):
        m_xla, m_pls, v, x = setup
        # interpret-mode pallas on CPU: monkeypatch not needed — the kernel
        # call in the model runs compiled pallas on CPU backend via interpret
        # only when asked; on the CPU test backend pallas_call compiles to
        # the CPU lowering automatically.
        o1 = m_xla.apply(v, x, train=False, mo_flag=True, inference=mode)
        o2 = m_pls.apply(v, x, train=False, mo_flag=True, inference=mode)
        for a, b, what in [
            (o1[0], o2[0], "pred"),
            (o1[1], o2[1], "prob"),
            (o1[2], o2[2], "action"),
            (o1[3], o2[3], "num_connect"),
        ]:
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-4, err_msg=what,
            )

    def test_training_path_unchanged(self, setup):
        m_xla, m_pls, v, x = setup
        (p1, *_), _ = m_pls.apply(v, x, train=True, mo_flag=True,
                                  mutable=["batch_stats"])
        (p2, *_), _ = m_xla.apply(v, x, train=True, mo_flag=True,
                                  mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)

    def test_config_key_round_trip(self):
        assert get_model(_cfg(True), 11).use_pallas_comm
        assert not get_model(_cfg(False), 11).use_pallas_comm
