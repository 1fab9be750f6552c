"""Communication-graph attention mechanisms (reference: agent.py:194-368).

These build the learned communication graph from exchanged query/key vectors
and fuse value feature maps along it. Everything is a dense einsum over the
tiny agent axis (N<=6) — one ``(B, K, Q)`` matmul instead of the reference's
per-agent Python loops — so the whole handshake compiles into the surrounding
XLA program.

Shape conventions (NHWC): queries ``(B, Q, query_size)``, keys
``(B, K, key_size)``, values ``(B, K, H, W, C)``. SRMS attentions take Q=1 and
return a fused map ``(B, H, W, C)`` plus the probability row ``(B, 1, K)``
(the reference's ``attn_orig.transpose(2, 1)`` layout). MIMO attentions return
``(B, Q, H, W, C)`` plus the full graph ``(B, K, Q)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multiagentperception_tpu.ops.comm import drop_diagonal_softmax, fuse_values
from multiagentperception_tpu.ops.sparsemax import sparsemax


def _normalize(logits: jnp.ndarray, sparse: bool, axis: int = 1) -> jnp.ndarray:
    return sparsemax(logits, axis=axis) if sparse else jax.nn.softmax(logits, axis=axis)


class ScaledDotAttention(nn.Module):
    """attn = norm(K Q^T / temperature) (reference: agent.py:194-213)."""

    temperature: float = 128.0 ** 0.5
    sparse: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v):
        logits = jnp.einsum("bkd,bqd->bkq", k, q) / self.temperature
        coef = _normalize(logits, self.sparse, axis=1)
        fused = fuse_values(coef, v)[:, 0]
        return fused, jnp.swapaxes(coef, 1, 2)


class AdditiveAttention(nn.Module):
    """Bahdanau-style scoring (reference: agent.py:215-239 'AdditiveAttentin')."""

    hidden: int = 128
    sparse: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v):
        feat = nn.Dense(self.hidden, dtype=self.dtype)(k)  # (B, K, h)
        ctx = nn.Dense(self.hidden, dtype=self.dtype)(q)  # (B, 1, h)
        logits = nn.Dense(1, dtype=self.dtype)(feat + ctx)  # (B, K, 1)
        coef = _normalize(logits, self.sparse, axis=1)
        fused = fuse_values(coef, v)[:, 0]
        return fused, jnp.swapaxes(coef, 1, 2)


class GeneralDotAttention(nn.Module):
    """Single-query general dot-product: Q' = W q (reference: agent.py:345-368)."""

    key_size: int = 1024
    sparse: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v):
        query = nn.Dense(self.key_size, kernel_init=nn.initializers.xavier_normal(),
                         dtype=self.dtype)(q)
        logits = jnp.einsum("bkd,bqd->bkq", k, query)  # (B, K, 1)
        coef = _normalize(logits, self.sparse, axis=1)
        fused = fuse_values(coef.astype(v.dtype), v)[:, 0]
        return fused, jnp.swapaxes(coef, 1, 2)


class MIMOGeneralDotAttention(nn.Module):
    """Full NxN communication graph in one einsum (reference: agent.py:242-286).

    The ``sparse`` flag is accepted-but-ignored to match the reference, which
    always softmaxes over the key axis (agent.py:274).
    """

    key_size: int = 1024
    sparse: bool = False
    dtype: Any = None

    def setup(self):
        self.proj = nn.Dense(
            self.key_size, kernel_init=nn.initializers.xavier_normal(),
            dtype=self.dtype,
        )

    def project(self, q):
        """Query projection Q' = W q, exposed so fused serving kernels
        (ops/pallas/comm_fusion.py) can consume the projected queries."""
        return self.proj(q)

    def __call__(self, q, k, v):
        query = self.proj(q)
        # graph logits/softmax in f32: N is tiny, stability > speed here
        logits = jnp.einsum("bkd,bqd->bkq", k, query).astype(jnp.float32)
        coef = jax.nn.softmax(logits, axis=1)
        return fuse_values(coef.astype(v.dtype), v), coef


class MIMOWhoGeneralDotAttention(nn.Module):
    """MIMO attention with self-links deleted before softmax — the who2com
    always-communicate baseline (reference: agent.py:289-343). The reference's
    per-batch triu/tril diagonal-deletion loop becomes an additive -inf mask.
    """

    key_size: int = 1024
    sparse: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v):
        query = nn.Dense(self.key_size, kernel_init=nn.initializers.xavier_normal(),
                         dtype=self.dtype)(q)
        logits = jnp.einsum("bkd,bqd->bkq", k, query).astype(jnp.float32)
        coef = drop_diagonal_softmax(logits, axis=1)
        return fuse_values(coef.astype(v.dtype), v), coef


ATTENTIONS_SRMS = {
    "additive": AdditiveAttention,
    "general": GeneralDotAttention,
    "scaled": ScaledDotAttention,
}


def get_srms_attention(name: str, query_size: int, key_size: int, sparse: bool,
                       dtype=None):
    """SRMS attention factory (reference: agent.py:530-536, 721-726)."""
    if name == "additive":
        return AdditiveAttention(sparse=sparse, dtype=dtype)
    if name == "general":
        return GeneralDotAttention(key_size=key_size, sparse=sparse, dtype=dtype)
    return ScaledDotAttention(sparse=sparse, dtype=dtype)
