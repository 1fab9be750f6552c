"""Fused communication-graph ops — jit-safe, no data-dependent control flow.

These replace the reference's per-sample Python branch loops with one-hot
matmuls and masked einsums that compile to MXU/VPU ops:

- hard top-1 selection (reference: agent.py:772-798, 1036-1058) -> one-hot
  matmul;
- activated thresholding (agent.py:800-809, 1060-1078) -> ``where`` mask;
- diagonal-deleted softmax for the who2com always-communicate baseline
  (agent.py:310-329, a per-batch triu/tril Python loop) -> additive -inf mask;
- bandwidth-constrained top-k pruning (new capability) -> ``jax.lax.top_k``;
- the confusion matrix (metrics.py:99-106) -> a (P, C)x(P, C) one-hot matmul
  accumulated on device.

Conventions: attention coefficient matrices are ``(B, K, Q)`` — entry
``[b, k, q]`` is the weight of *key/supporter* ``k`` in the fusion for
*query/requester* ``q`` (matches the reference's ``bmm(k, q^T)`` layout).
Value feature maps are NHWC: ``(B, K, H, W, C)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fuse_values(coef: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Weighted fusion of per-agent feature maps along the comm graph.

    coef: (B, K, Q); vals: (B, K, H, W, C) -> (B, Q, H, W, C).

    Flattened to a batched GEMM ('bkq,bkm->bqm'): XLA lowers the naive 5-D
    einsum to a broadcast-multiply-reduce that materializes the
    (B, K, Q, H, W, C) outer product (~5x slower on v5e measured); the
    reshape keeps the whole NxN exchange on the MXU.
    """
    b, k, h, w, c = vals.shape
    out = jnp.einsum(
        "bkq,bkm->bqm", coef.astype(vals.dtype), vals.reshape(b, k, h * w * c)
    )
    return out.reshape(b, coef.shape[2], h, w, c)


def one_hot_argmax(prob: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """One-hot of the argmax along ``axis``, same shape/dtype as ``prob``."""
    idx = jnp.argmax(prob, axis=axis)
    oh = jax.nn.one_hot(idx, prob.shape[axis], dtype=prob.dtype, axis=axis)
    return oh


def num_connect_offdiag(coef: jnp.ndarray, agent_num: int) -> jnp.ndarray:
    """MIMO bandwidth statistic: mean off-diagonal links per agent.

    Matches ``nonzero(coef w/ zeroed diag) / (agent_num * B)``
    (reference: agent.py:1050-1056, 1070-1077).
    """
    b, k, q = coef.shape
    eye = jnp.eye(k, q, dtype=bool)
    offdiag = jnp.where(eye[None], 0.0, coef)
    return jnp.sum(offdiag != 0).astype(jnp.float32) / (agent_num * b)


def argmax_select(vals: jnp.ndarray, prob: jnp.ndarray, agent_num: int):
    """Hard top-1 comm graph: per query keep only the strongest key.

    Returns (fused (B,Q,H,W,C), coef (B,K,Q), num_connect scalar).
    """
    coef = one_hot_argmax(prob, axis=1)
    fused = fuse_values(coef, vals)
    return fused, coef, num_connect_offdiag(coef, agent_num)


def activated_select(vals: jnp.ndarray, prob: jnp.ndarray, agent_num: int, thres: float = 0.2):
    """Thresholded comm graph: prune links with attention <= thres."""
    coef = jnp.where(prob > thres, prob, 0.0)
    fused = fuse_values(coef, vals)
    return fused, coef, num_connect_offdiag(coef, agent_num)


def topk_select(vals: jnp.ndarray, prob: jnp.ndarray, agent_num: int, k: int):
    """Bandwidth-constrained comm graph: keep the top-k keys per query.

    Not in the reference model zoo — the bandwidth-pruned variant called for
    by BASELINE.json ("bandwidth-constrained top-k"). Keeps attention mass of
    the k strongest links (renormalized), zeroes the rest.
    """
    # prob: (B, K, Q) -> per-query top-k over the key axis.
    pq = jnp.swapaxes(prob, 1, 2)  # (B, Q, K)
    kth = jax.lax.top_k(pq, k)[0][..., -1:]  # (B, Q, 1) k-th largest
    mask = pq >= kth
    kept = jnp.where(mask, pq, 0.0)
    kept = kept / jnp.maximum(jnp.sum(kept, axis=-1, keepdims=True), 1e-12)
    coef = jnp.swapaxes(kept, 1, 2)
    fused = fuse_values(coef, vals)
    return fused, coef, num_connect_offdiag(coef, agent_num)


def per_frame_links(prob: jnp.ndarray, inference: str, agent_num: int,
                    topk_k: int = 2, thres: float = 0.2) -> jnp.ndarray:
    """Per-sample bandwidth: off-diagonal links/agent for each batch element.

    Reapplies the mode's mask to the returned ``(B, K, Q)`` graph so
    ``per_frame_links(...).mean() == num_connect_offdiag(coef, agent_num)``
    exactly. Serving uses this for exact tail-batch accounting (a padded
    batch's duplicated frames would otherwise pollute the batch mean).
    """
    b, k, q = prob.shape
    if inference == "argmax_test":
        coef = one_hot_argmax(prob, axis=1)
    elif inference == "activated":
        coef = jnp.where(prob > thres, prob, 0.0)
    elif inference == "topk":
        pq = jnp.swapaxes(prob, 1, 2)
        kth = jax.lax.top_k(pq, topk_k)[0][..., -1:]
        coef = jnp.swapaxes(jnp.where(pq >= kth, pq, 0.0), 1, 2)
    else:  # softmax: the full graph
        return jnp.full((b,), float(k - 1), jnp.float32)
    offdiag = jnp.where(jnp.eye(k, q, dtype=bool)[None], 0.0, coef)
    return jnp.sum(offdiag != 0, axis=(1, 2)).astype(jnp.float32) / agent_num


def drop_diagonal_softmax(logits: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Softmax over keys with self-links removed.

    Equivalent to the reference's delete-diagonal/softmax/re-insert-zeros
    per-sample loop (agent.py:310-329): mask the diagonal with -inf so it gets
    exactly zero probability and the remaining K-1 keys renormalize.
    """
    b, k, q = logits.shape
    eye = jnp.eye(k, q, dtype=bool)[None]
    masked = jnp.where(eye, -jnp.inf, logits)
    out = jax.nn.softmax(masked, axis=axis)
    return jnp.where(eye, 0.0, out)


def confusion_matrix(
    label_true: jnp.ndarray,
    label_pred: jnp.ndarray,
    n_classes: int,
    sample_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(C, C) confusion matrix on device, rows=true cols=pred.

    Same accounting as the reference's ``_fast_hist`` (metrics.py:99-106):
    pixels with true label outside [0, C) are dropped. ``sample_mask`` (per
    leading-dim element) supports the normal/noise split (metrics.py:70-97)
    without host round-trips.
    """
    t = label_true.reshape(label_true.shape[0], -1)
    p = label_pred.reshape(label_pred.shape[0], -1)
    valid = (t >= 0) & (t < n_classes)
    if sample_mask is not None:
        valid = valid & sample_mask.reshape(-1, 1).astype(bool)
    t_oh = jax.nn.one_hot(jnp.where(valid, t, 0), n_classes, dtype=jnp.float32)
    t_oh = t_oh * valid[..., None]
    p_oh = jax.nn.one_hot(jnp.clip(p, 0, n_classes - 1), n_classes, dtype=jnp.float32)
    return jnp.einsum("bpi,bpj->ij", t_oh, p_oh)
