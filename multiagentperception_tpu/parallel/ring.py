"""Agent-axis model parallelism: ring-fused communication over ICI.

The reference simulates inter-agent communication as one on-device bmm over
N<=6 agents (agent.py:252-286) and that stays the right design at small N
(SURVEY §2.7). At production scale — hundreds of cameras per intersection,
swarm perception — the value tensor (B, N, H/32, W/32, C) no longer fits
one chip, and the natural TPU design shards the *agent axis* over the mesh:

- each device encodes its local agents (the conv towers are embarrassingly
  parallel over agents);
- keys/queries are tiny ((N, 1024)/(N, 32)) and all-gather over ICI;
- value fusion runs as a **ring**: each device accumulates the partial
  fusion for its local queries from the value shard it currently holds,
  then rotates the shard to its neighbor with ``lax.ppermute`` — N/S steps,
  each overlapping a (B, K_local, M) x (K_local, Q_local) MXU contraction
  with the next shard's ICI transfer. The full value tensor never
  materializes on any chip (the agent-axis analog of ring attention).

``sharded_comm_step`` mirrors ops/comm.py's semantics exactly (softmax over
keys, +diag bias, softmax/activated/argmax modes) and is validated against
the dense path on a virtual 8-device mesh in tests/test_ring.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover — older jax
    from jax.experimental.shard_map import shard_map


def ring_fuse_values(coef_local: jnp.ndarray, vals_local: jnp.ndarray,
                     axis_name: str) -> jnp.ndarray:
    """Ring-scheduled ``fuse_values`` with the key/value axis sharded.

    coef_local: (B, K_total, Q_local) — every key's weight for the LOCAL
    queries (keys are cheap to replicate; values are not).
    vals_local: (B, K_local, M) — this device's value shard.
    Returns (B, Q_local, M) = sum over ALL keys of coef * value.
    """
    s = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, k_total, q_local = coef_local.shape
    k_local, m = vals_local.shape[1], vals_local.shape[2]
    perm = [(j, (j + 1) % s) for j in range(s)]

    def body(i, carry):
        acc, v = carry
        # after i rotations this device holds the shard of device (idx - i)
        src = (idx - i) % s
        sl = jax.lax.dynamic_slice_in_dim(coef_local, src * k_local, k_local,
                                          axis=1)
        acc = acc + jnp.einsum("bkq,bkm->bqm", sl.astype(v.dtype), v)
        v = jax.lax.ppermute(v, axis_name, perm)
        return acc, v

    acc0 = jnp.zeros((b, q_local, m), vals_local.dtype)
    # the carry must be 'varying' over the same manual axes as the rotating
    # value shard (all mesh axes it is sharded over — e.g. {data, agent} on
    # a combined mesh), or the fori_loop carry types mismatch under shard_map
    vma = tuple(getattr(vals_local.aval, "vma", None) or (axis_name,))
    if hasattr(jax.lax, "pcast"):
        acc0 = jax.lax.pcast(acc0, vma, to="varying")
    else:  # pragma: no cover — pre-pcast jax (matches the shard_map fallback)
        acc0 = jax.lax.pvary(acc0, vma)
    acc, _ = jax.lax.fori_loop(0, s, body, (acc0, vals_local))
    return acc


def _local_comm(q_l, k_l, v_l, *, axis, mode, diag_bias, thres):
    """Per-device body: gather keys, build the local graph columns, mask,
    ring-fuse. Shapes: q_l (B, Ql, D); k_l (B, Kl, key); v_l (B, Kl, H, W, C)."""
    b, q_local = q_l.shape[:2]
    bv, k_local, h, w, c = v_l.shape
    s = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    n = k_local * s

    k_all = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)  # (B, N, key)
    logits = jnp.einsum("bkd,bqd->bkq", k_all, q_l).astype(jnp.float32)
    unbiased = jax.nn.softmax(logits, axis=1)  # (B, N, Ql)
    coef = unbiased
    if diag_bias:
        # +bias on the self link of each LOCAL query (global index offset)
        gq = idx * q_local + jnp.arange(q_local)  # (Ql,) global query ids
        eye = (jnp.arange(n)[:, None] == gq[None, :]).astype(jnp.float32)
        coef = coef + diag_bias * eye[None]
    soft = coef
    if mode == "activated":
        coef = jnp.where(coef > thres, coef, 0.0)
    elif mode == "argmax":
        kidx = jnp.argmax(coef, axis=1)
        coef = jax.nn.one_hot(kidx, n, dtype=coef.dtype, axis=1)
    else:
        # softmax mode fuses with the UNBIASED weights — the model's dense
        # path adds the diag bias only to the returned prob_action/action
        # (agent.py:1155 vs 1164-1167); the masked modes mask the biased one
        coef = unbiased
    fused = ring_fuse_values(coef, v_l.reshape(bv, k_local, h * w * c), axis)
    return fused.reshape(b, q_local, h, w, c), soft if mode == "softmax" else coef, soft


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "mode", "diag_bias", "thres")
)
def sharded_comm_step(
    query_proj: jnp.ndarray,  # (B, N, D) — projected queries, N sharded
    keys: jnp.ndarray,        # (B, N, key)
    vals: jnp.ndarray,        # (B, N, H, W, C)
    mesh: Mesh,
    axis: str = "agent",
    mode: str = "softmax",
    diag_bias: float = 0.0,
    thres: float = 0.2,
):
    """Agent-sharded communication step.

    Returns (fused (B, N, H, W, C) sharded like vals, coef_masked (B, K, Q),
    coef_soft (B, K, Q)) — the (K, Q) graphs are replicated (they are tiny
    and the metrics consume them on host).
    """
    body = functools.partial(_local_comm, axis=axis, mode=mode,
                             diag_bias=diag_bias, thres=thres)
    # with a combined ('data', 'agent') mesh the batch dim shards over
    # 'data' — each data-row runs its own independent ring (the agent
    # collectives operate within a row of the mesh). Indivisible batches
    # (the loader's tail) replicate over 'data' instead: the spec is a
    # trace-time structural constraint, unlike the trainer's per-batch
    # placement fallback.
    batch = ("data" if "data" in mesh.axis_names
             and query_proj.shape[0] % mesh.shape["data"] == 0 else None)
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(batch, axis, None), P(batch, axis, None),
                  P(batch, axis, None, None, None)),
        out_specs=(P(batch, axis, None, None, None),
                   P(batch, None, axis), P(batch, None, axis)),
    )
    return f(query_proj, keys, vals)
