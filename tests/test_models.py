"""Shape/behavior tests for the model zoo at reduced resolution (128x128;
all backbones are fully convolutional, policy maps land at 1x1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.utils import init_variables

H = W = 128
NC = 11


def _cfg(arch, **model_kw):
    model = {"arch": arch, "enc_backbone": "resnet_encoder",
             "dec_backbone": "simple_decoder", **model_kw}
    return normalize_config({"model": model, "data": {"img_rows": H, "img_cols": W}})


def _init_apply(model, x, method_kwargs=None, rngs_extra=()):
    kw = dict(method_kwargs or {})
    kw.setdefault("train", False)
    rngs = {"params": jax.random.PRNGKey(0)}
    for name in rngs_extra:
        rngs[name] = jax.random.PRNGKey(1)
    variables = init_variables(model, rngs, x, **kw)
    apply_rngs = {name: jax.random.PRNGKey(2) for name in rngs_extra} or None
    if kw["train"]:
        out, _ = model.apply(variables, x, rngs=apply_rngs, mutable=["batch_stats"], **kw)
    else:
        out = model.apply(variables, x, rngs=apply_rngs, **kw)
    return variables, out


class TestSingleAgent:
    def test_forward_shape(self):
        model = get_model(_cfg("Single_agent"), NC)
        x = jnp.zeros((2, H, W, 3))
        _, out = _init_apply(model, x)
        assert out.shape == (2, H, W, NC)


class TestAllAgents:
    def test_catall(self):
        model = get_model(_cfg("All_agents", agent_num=5), NC)
        x = jnp.zeros((1, 5, H, W, 3))
        _, out = _init_apply(model, x)
        assert out.shape == (1, H, W, NC)

    @pytest.mark.slow  # action-rng train compile is the slow path here
    def test_selection_returns_action(self):
        model = get_model(_cfg("All_agents", agent_num=5, shuffle_features="selection"), NC)
        x = jnp.zeros((2, 5, H, W, 3))
        _, (out, action) = _init_apply(model, x, rngs_extra=("action",))
        assert out.shape == (2, H, W, NC)
        assert action.shape == (2,)
        assert 0 <= int(action[0]) < 5


class TestMIMOAllAgents:
    def test_catall_rotation(self):
        model = get_model(_cfg("MIMO_All_agents", agent_num=3), NC)
        x = jnp.zeros((2, 3, H, W, 3))
        _, out = _init_apply(model, x)
        assert out.shape == (2 * 3, H, W, NC)

    def test_comnet(self):
        model = get_model(_cfg("MIMO_All_agents", agent_num=3, shuffle_features="ComNet"), NC)
        x = jnp.zeros((1, 3, H, W, 3))
        _, out = _init_apply(model, x)
        assert out.shape == (3, H, W, NC)

    def test_selection(self):
        model = get_model(_cfg("MIMO_All_agents", agent_num=3, shuffle_features="selection"), NC)
        x = jnp.zeros((2, 3, H, W, 3))
        _, (out, action) = _init_apply(model, x, rngs_extra=("action",))
        assert out.shape == (6, H, W, NC)
        assert action.shape == (2, 3)


class TestLearnWho2Com:
    def test_training_mode(self):
        model = get_model(_cfg("LearnWho2Com", agent_num=5, query_size=8), NC)
        x = jnp.zeros((2, 5, H, W, 3))
        _, (pred, prob, action) = _init_apply(model, x, {"train": True})
        assert pred.shape == (2, H, W, NC)
        assert prob.shape == (2, 1, 4)  # keys from the 4 supporters only
        assert action.shape == (2, 1)

    def test_argmax_test_mode(self):
        model = get_model(_cfg("LearnWho2Com", agent_num=5, query_size=8), NC)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, H, W, 3)), jnp.float32)
        _, (pred, prob, action) = _init_apply(model, x, {"inference": "argmax_test"})
        assert pred.shape == (1, H, W, NC)

    def test_only_normal_agents_encoder(self):
        model = get_model(
            _cfg("LearnWho2Com", agent_num=5, query_size=8,
                 shared_img_encoder="only_normal_agents"), NC)
        x = jnp.zeros((1, 5, H, W, 3))
        variables, _ = _init_apply(model, x, {"train": True})
        names = set(variables["params"])
        assert "degraded_encoder" in names and "normal_encoder" in names


class TestLearnWhen2Com:
    @pytest.fixture(scope="class")
    def setup(self):
        model = get_model(_cfg("LearnWhen2Com", agent_num=5, query_size=8), NC)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, H, W, 3)), jnp.float32)
        variables = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)
        return model, variables, x

    @pytest.mark.slow  # train-mode (batch_stats-mutating) compile
    def test_training(self, setup):
        model, variables, x = setup
        (pred, prob, action), _ = model.apply(variables, x, train=True, mutable=['batch_stats'])
        assert pred.shape == (2, H, W, NC)
        assert prob.shape == (2, 1, 5)  # keys include self
        assert action.shape == (2, 1)

    def test_softmax_eval(self, setup):
        model, variables, x = setup
        pred, prob, action, nc = model.apply(variables, x, train=False, inference="softmax")
        assert float(nc) == 4.0

    def test_argmax_eval(self, setup):
        model, variables, x = setup
        pred, prob, action, nc = model.apply(variables, x, train=False, inference="argmax_test")
        assert pred.shape == (2, H, W, NC)
        assert 0.0 <= float(nc) <= 1.0

    def test_activated_eval(self, setup):
        model, variables, x = setup
        pred, prob, act, nc = model.apply(variables, x, train=False, inference="activated")
        a = np.asarray(act)  # third output: thresholded weight matrix
        assert ((a > 0.2) | (a == 0)).all()


class TestMIMOcom:
    @pytest.fixture(scope="class")
    def setup(self):
        model = get_model(_cfg("MIMOcom", agent_num=4, query_size=32, multiple_output=True), NC)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, H, W, 3)), jnp.float32)
        variables = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)
        return model, variables, x

    @pytest.mark.slow  # train-mode (batch_stats-mutating) compile
    def test_training_mo(self, setup):
        model, variables, x = setup
        (pred, prob, action, nc), _ = model.apply(variables, x, train=True, mo_flag=True, mutable=['batch_stats'])
        assert pred.shape == (2 * 4, H, W, NC)
        assert prob.shape == (2, 4, 4)
        assert action.shape == (2, 4)
        assert float(nc) == 3.0
        # softmax over keys (+diag bias): columns sum to ~1.001
        np.testing.assert_allclose(np.asarray(prob).sum(axis=1), 1.001, atol=1e-4)

    def test_single_output(self, setup):
        model, variables, x = setup
        (pred, prob, action, nc), _ = model.apply(variables, x, train=True, mo_flag=False, mutable=['batch_stats'])
        assert pred.shape == (2, H, W, NC)
        assert prob.shape == (2, 4, 1)

    def test_activated(self, setup):
        model, variables, x = setup
        pred, prob, action, nc = model.apply(
            variables, x, train=False, mo_flag=True, inference="activated")
        assert pred.shape == (8, H, W, NC)
        assert 0.0 <= float(nc) <= 3.0

    def test_argmax(self, setup):
        model, variables, x = setup
        pred, prob, action, nc = model.apply(
            variables, x, train=False, mo_flag=True, inference="argmax_test")
        assert pred.shape == (8, H, W, NC)

    def test_topk(self, setup):
        model, variables, x = setup
        pred, prob, action, nc = model.apply(
            variables, x, train=False, mo_flag=True, inference="topk")
        assert pred.shape == (8, H, W, NC)
        # k=2 keeps at most 2 links per query (self is NOT guaranteed to be
        # in the top-2 at random init) -> <= 2 off-diagonal links per agent
        assert float(nc) <= 2.0 + 1e-6


class TestMIMOcomWho:
    @pytest.mark.slow  # train-mode compile
    def test_training_and_activated(self):
        model = get_model(_cfg("MIMOcomWho", agent_num=3, query_size=32,
                               multiple_output=True, query=False), NC)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, H, W, 3)), jnp.float32)
        variables = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)
        (pred, prob, action, nc), _ = model.apply(variables, x, train=True, mo_flag=True, mutable=['batch_stats'])
        assert pred.shape == (3, H, W, NC)
        # diagonal-deleted attention: zero self-weights
        assert np.allclose(np.diagonal(np.asarray(prob), axis1=1, axis2=2), 0.0)
        pred, prob, action, nc = model.apply(
            variables, x, train=False, mo_flag=True, inference="activated")
        assert pred.shape == (3, H, W, NC)


class TestGradients:
    @pytest.mark.slow  # full train-step grad compile ~4 min on 1 CPU core
    def test_mimocom_train_step_grads_flow(self):
        model = get_model(_cfg("MIMOcom", agent_num=3, query_size=8,
                               key_size=64, multiple_output=True), NC)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, H, W, 3)), jnp.float32)
        y = jnp.zeros((3, H, W), jnp.int32)
        variables = init_variables(model, {"params": jax.random.PRNGKey(0)}, x, train=True)

        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mo_flag=True, mutable=["batch_stats"])
            pred = out[0]
            logp = jax.nn.log_softmax(pred, axis=-1)
            return -jnp.mean(jnp.take_along_axis(logp, y[..., None], axis=-1))

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        norms = [float(jnp.abs(g).max()) for g in leaves]
        assert max(norms) > 0
        # key/query policy nets receive gradient through the attention
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        key_net_grads = [jnp.abs(v).sum() for p, v in flat if "key_net" in str(p)]
        assert float(sum(key_net_grads)) > 0
