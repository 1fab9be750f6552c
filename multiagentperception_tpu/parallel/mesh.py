"""Device mesh + sharding rules (replaces the reference's nn.DataParallel,
train.py:177).

The reference's only parallelism is single-process multi-GPU DataParallel
scatter/gather (SURVEY.md §2.7). The TPU-native design is SPMD over a
``jax.sharding.Mesh`` with two axes:

- ``data``: batch-dim sharding (DP). Per-batch inputs are sharded over ICI;
  gradients all-reduce with XLA-inserted ``psum``.
- ``model``: optional tensor parallelism for the widest weights — the conv
  towers' output-channel dim and the km_generator/attention Dense kernels —
  applied only where the axis divides evenly, everything else replicated.
  N<=6-agent models don't *need* TP, but the axis is first-class so the same
  train step scales to larger meshes (SURVEY.md §7).

The inter-agent "communication" itself stays an on-chip attention einsum —
it is simulated message passing, not a cross-device collective
(reference keeps it as a bmm inside one process, agent.py:252-286).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model != n_total:
        raise ValueError(
            f"mesh {n_data}x{n_model} != {n_total} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def chunk_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (batch) over 'data'; axis 0 is the steps-per-call chunk
    (training.steps_per_call), which lax.scan consumes sequentially and so
    must stay unsharded."""
    return NamedSharding(mesh, P(None, "data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: tuple, value) -> P:
    """Sharding rule for one parameter.

    Conv/Dense kernels shard their output-channel (last) dim over 'model'
    when it divides evenly and is large enough to be worth it; biases, BN
    scales and small tensors replicate.
    """
    if value.ndim >= 2:
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def param_shardings(mesh: Mesh, params) -> "jax.tree_util.PyTreeDef":
    """NamedShardings for a parameter PyTree under the (data, model) mesh.
    Meshes without a 'model' axis (e.g. ('data', 'agent')) replicate."""
    n_model = mesh.shape.get("model", 1)

    def rule(path, value):
        if n_model == 1:
            return NamedSharding(mesh, P())
        spec = _spec_for_param(path, value)
        # only shard if the sharded dim divides evenly
        if spec != P() and value.shape[-1] % n_model == 0 and value.shape[-1] >= 64:
            return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def agent_parallel_mesh(cfg, n_cli: int = 0, n_data: int = 0):
    """The CLI policy for ``model.agent_parallel`` / ``--agent_parallel``:
    a 1-D ('agent',) mesh routing MIMOcom's eval fusion through the ICI ring
    (parallel/ring.py). Returns None when not requested.

    ``n_data > 1`` combines the ring with batch data-parallelism: a 2-D
    ('data', 'agent') mesh where each data-row runs an independent ring over
    its agent shards. The ring serves eval by default;
    ``model.agent_parallel_train`` also differentiates through it.

    The agent count must divide evenly over the requested devices (each
    device holds agent_num/n value shards and rotates them)."""
    import jax

    n = int(n_cli or cfg["model"].get("agent_parallel") or 0)
    if n <= 1:
        return None
    d = max(1, int(n_data))
    agent_num = int(cfg["model"].get("agent_num") or 5)
    if len(jax.devices()) < n * d:
        raise ValueError(
            f"--agent_parallel {n} x --data_parallel {d} needs {n * d} "
            f"devices, have {len(jax.devices())}")
    if agent_num % n:
        raise ValueError(
            f"agent_num {agent_num} not divisible by agent_parallel {n}")
    batch = cfg.get("training", {}).get("batch_size")
    if d > 1 and batch and batch % d:
        # same contract as data_parallel_mesh: an indivisible explicit
        # request is an error, not D-1 silently idle data rows
        raise ValueError(
            f"batch_size {batch} not divisible by --data_parallel {d}")
    if d == 1:
        return Mesh(np.asarray(jax.devices()[:n]), ("agent",))
    return Mesh(np.asarray(jax.devices()[:n * d]).reshape(d, n),
                ("data", "agent"))


def data_parallel_mesh(batch_size: int, n_dp: int = 0):
    """The CLI device-selection policy, shared by train.py and test.py.

    ``n_dp`` devices on the 'data' axis; 0 picks the largest available
    device count that divides the batch. Returns None when one device is
    selected (no mesh needed); raises on an explicit indivisible request.
    """
    import jax

    if not n_dp:
        n_avail = len(jax.devices())
        n_dp = n_avail
        while n_dp > 1 and batch_size % n_dp:
            n_dp -= 1
        if n_dp < n_avail:
            # auto-shrink is correct but should never be silent: a prime
            # batch size can quietly park most of the chips
            import logging

            logging.getLogger("multiagentperception_tpu").warning(
                "data-parallel mesh: using %d of %d devices (batch_size %d "
                "divisibility); pick a batch divisible by the device count "
                "to use them all", n_dp, n_avail, batch_size)
    elif batch_size % n_dp:
        raise ValueError(
            f"batch_size {batch_size} not divisible by --data_parallel {n_dp}"
        )
    if n_dp <= 1:
        return None
    return make_mesh(n_data=n_dp, n_model=1, devices=jax.devices()[:n_dp])
