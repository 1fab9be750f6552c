"""Feature-composition matrix (VERDICT round-3 task #5).

The extensions multiply — {bf16, int8} x {dense, agent ring, ring+data} x
{pallas_comm} x {remat} x {freeze_bn_stats} — and each pairwise composition
is either NUMERICALLY EQUAL to the plain path or a LOUD config error:

- int8 composes with the ring and with remat: the interceptor swaps ordinary
  ``nn.Conv`` calls and all convs live outside the shard_map'd fusion;
- pallas_comm + agent_mesh is rejected at ``get_model`` (the ring branch
  would silently bypass the Pallas kernel otherwise);
- remat and freeze_bn_stats compose with ring_train: gradients/losses match
  the dense program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multiagentperception_tpu.config import normalize_config
from multiagentperception_tpu.models import get_model
from multiagentperception_tpu.models.agents import MIMOcom

N = 4
B = 2
IMG = 64
KW = dict(agent_num=N, query_size=4, key_size=16, n_classes=7,
          feat_channel=32)


def _agent_mesh(n=N):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(jax.devices()[:n]), ("agent",))


def _combined_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                ("data", "agent"))


@pytest.fixture(scope="module")
def batch(rng):
    x = jnp.asarray(rng.normal(size=(B, N, IMG, IMG, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 7, size=(B * N, IMG, IMG)), jnp.int32)
    return x, y


@pytest.fixture(scope="module")
def dense_setup(batch):
    x, _ = batch
    model = MIMOcom(**KW)
    variables = model.init(jax.random.PRNGKey(0), x, train=False,
                           mo_flag=True, inference="softmax")
    out = model.apply(variables, x, train=False, mo_flag=True,
                      inference="activated")
    return model, variables, out


# ---------------------------------------------------------------------------
# config-level conflicts are loud (fast)
# ---------------------------------------------------------------------------
def _model_cfg(**over):
    return normalize_config({
        "model": {"arch": "MIMOcom", "agent_num": N, "query_size": 4,
                  "key_size": 16, "feat_channel": 32,
                  "multiple_output": True, **over},
        "data": {}, "training": {},
    })


def test_pallas_comm_conflicts_with_agent_mesh():
    mesh = _agent_mesh()
    cfg = _model_cfg(pallas_comm=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        get_model(cfg, 7, agent_mesh=mesh)


def test_mimocom_only_keys_warn_on_other_arch(caplog):
    import logging

    cfg = _model_cfg(arch="Single_agent", pallas_comm=True, remat=True)
    with caplog.at_level(logging.WARNING, "multiagentperception_tpu"):
        get_model(cfg, 7)
    text = caplog.text
    assert "pallas_comm" in text and "remat" in text


def test_ring_train_without_mesh_is_loud():
    cfg = _model_cfg(agent_parallel_train=True)
    with pytest.raises(ValueError, match="agent_parallel"):
        get_model(cfg, 7)


# ---------------------------------------------------------------------------
# numerical-equality matrix (slow)
# ---------------------------------------------------------------------------
@pytest.mark.slow
@pytest.mark.parametrize("topo", ["ring", "ring+data"])
def test_int8_composes_with_ring(dense_setup, batch, topo):
    """int8 eval under an agent mesh == int8 eval dense (same calibrated
    scales; convs are outside the shard_map'd fusion)."""
    from multiagentperception_tpu.quantize import (
        calibrate_activations,
        quantized_apply,
    )

    model, variables, _ = dense_setup
    x, _ = batch
    mesh = _agent_mesh() if topo == "ring" else _combined_mesh()
    ringed = MIMOcom(agent_mesh=mesh, **KW)
    kw = dict(train=False, mo_flag=True, inference="activated")
    scales = calibrate_activations(model, variables, [x], **kw)
    d = quantized_apply(model, variables, x, act_scales=scales, **kw)
    r = quantized_apply(ringed, variables, x, act_scales=scales, **kw)
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(d[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r[1]), np.asarray(d[1]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.float32(r[3]), np.float32(d[3]), atol=1e-6)


@pytest.mark.slow
def test_int8_composes_with_pallas_comm(dense_setup, batch):
    from multiagentperception_tpu.quantize import (
        calibrate_activations,
        quantized_apply,
    )

    model, variables, _ = dense_setup
    x, _ = batch
    pallas = MIMOcom(use_pallas_comm=True, **KW)
    kw = dict(train=False, mo_flag=True, inference="activated")
    scales = calibrate_activations(model, variables, [x], **kw)
    d = quantized_apply(model, variables, x, act_scales=scales, **kw)
    p = quantized_apply(pallas, variables, x, act_scales=scales, **kw)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(d[0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.float32(p[3]), np.float32(d[3]), atol=1e-6)


@pytest.mark.slow
def test_int8_composes_with_remat(dense_setup, batch):
    """Calibrate remat-free, intercept the remat model (the trainer/CLI
    automation, trainer._calibrate_int8) — outputs match dense int8."""
    from multiagentperception_tpu.quantize import (
        calibrate_activations,
        quantized_apply,
    )

    model, variables, _ = dense_setup
    x, _ = batch
    remat = MIMOcom(remat=True, **KW)
    kw = dict(train=False, mo_flag=True, inference="activated")
    scales = calibrate_activations(model, variables, [x], **kw)
    d = quantized_apply(model, variables, x, act_scales=scales, **kw)
    r = quantized_apply(remat, variables, x, act_scales=scales, **kw)
    np.testing.assert_allclose(np.asarray(r[0]), np.asarray(d[0]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_bf16_composes_with_ring(batch):
    """bf16 ring eval == bf16 dense eval (the matrix cell the virtual mesh
    rounds differently: tolerances are bf16-scaled)."""
    x, _ = batch
    mesh = _agent_mesh()
    dense = MIMOcom(dtype=jnp.bfloat16, **KW)
    ringed = MIMOcom(dtype=jnp.bfloat16, agent_mesh=mesh, **KW)
    variables = dense.init(jax.random.PRNGKey(0), x, train=False,
                           mo_flag=True, inference="softmax")
    kw = dict(train=False, mo_flag=True, inference="activated")
    d = dense.apply(variables, x, **kw)
    r = ringed.apply(variables, x, **kw)
    np.testing.assert_allclose(np.asarray(r[0], np.float32),
                               np.asarray(d[0], np.float32),
                               rtol=0.05, atol=0.15)
    np.testing.assert_allclose(np.float32(r[3]), np.float32(d[3]), atol=1e-6)


def _train_grads(model, variables, x, y, freeze_bn=False):
    from multiagentperception_tpu.loss import cross_entropy2d

    params, stats = variables["params"], variables["batch_stats"]
    kw = dict(train=True, mo_flag=True, inference="softmax")
    if freeze_bn:
        kw["bn_train"] = False

    def f(p):
        if freeze_bn:
            out = model.apply({"params": p, "batch_stats": stats}, x, **kw)
        else:
            out, _ = model.apply({"params": p, "batch_stats": stats}, x,
                                 mutable=["batch_stats"], **kw)
        return cross_entropy2d(out[0], y)

    return jax.value_and_grad(f)(params)


@pytest.mark.slow
@pytest.mark.parametrize("freeze_bn", [False, True])
def test_remat_and_freeze_bn_compose_with_ring_train(batch, freeze_bn):
    """remat x ring_train (and freeze_bn_stats x ring_train): the sharded,
    rematerialized training program reproduces the dense gradients."""
    x, y = batch
    mesh = _agent_mesh()
    dense = MIMOcom(**KW)
    combo = MIMOcom(agent_mesh=mesh, ring_train=True, remat=True, **KW)
    variables = dense.init(jax.random.PRNGKey(0), x, train=True,
                           mo_flag=True, inference="softmax")
    ld, gd = _train_grads(dense, variables, x, y, freeze_bn)
    lc, gc = _train_grads(combo, variables, x, y, freeze_bn)
    np.testing.assert_allclose(float(lc), float(ld), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gc),
                    jax.tree_util.tree_leaves(gd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-5)
