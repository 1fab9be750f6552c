"""Golden tests for sparsemax and the fused communication-graph ops.

Sparsemax goldens check the forward against hand-computable projections and
the custom VJP against the reference backward rule
(reference: ptsemseg/models/utils.py:821-887). Comm-op tests pin the exact
semantics of the reference's argmax/activated/diag-deletion code paths
(agent.py:772-809, 1036-1078, 310-329).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiagentperception_tpu.ops import (
    activated_select,
    argmax_select,
    confusion_matrix,
    drop_diagonal_softmax,
    num_connect_offdiag,
    one_hot_argmax,
    sparsemax,
    topk_select,
)
from multiagentperception_tpu.ops.comm import fuse_values, per_frame_links


class TestSparsemax:
    def test_uniform_matches_softmax(self):
        z = jnp.zeros((2, 5))
        np.testing.assert_allclose(sparsemax(z), np.full((2, 5), 0.2), atol=1e-6)

    def test_dominant_logit_is_one_hot(self):
        z = jnp.array([[5.0, 0.0, 0.0, 0.0]])
        out = sparsemax(z)
        np.testing.assert_allclose(out, [[1.0, 0.0, 0.0, 0.0]], atol=1e-6)

    def test_hand_computed_projection(self):
        # z = [1.0, 0.5, -1.0]: support {1.0, 0.5}, tau = (1.5-1)/2 = 0.25
        out = sparsemax(jnp.array([[1.0, 0.5, -1.0]]))
        np.testing.assert_allclose(out, [[0.75, 0.25, 0.0]], atol=1e-6)

    def test_simplex(self, rng):
        z = jnp.asarray(rng.normal(size=(16, 6)) * 3)
        out = sparsemax(z)
        assert (np.asarray(out) >= 0).all()
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)

    def test_axis_argument(self, rng):
        z = jnp.asarray(rng.normal(size=(3, 4, 5)))
        a = sparsemax(z, axis=1)
        b = jnp.swapaxes(sparsemax(jnp.swapaxes(z, 1, 2), axis=-1), 1, 2)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_custom_vjp_matches_reference_backward(self):
        # reference rule: grad = S * (g - sum(g*S)/|S|)  (models/utils.py:878-887)
        z = jnp.array([[1.0, 0.5, -1.0]])
        g = jnp.array([[0.3, -0.1, 9.9]])  # grad on the dead coord must not leak
        _, vjp = jax.vjp(lambda x: sparsemax(x), z)
        (dz,) = vjp(g)
        mean = (0.3 - 0.1) / 2
        np.testing.assert_allclose(dz, [[0.3 - mean, -0.1 - mean, 0.0]], atol=1e-6)

    def test_grad_sums_to_zero_on_support(self, rng):
        z = jnp.asarray(rng.normal(size=(4, 6)))
        g = jnp.asarray(rng.normal(size=(4, 6)))
        _, vjp = jax.vjp(lambda x: sparsemax(x), z)
        (dz,) = vjp(g)
        np.testing.assert_allclose(np.asarray(dz).sum(-1), 0.0, atol=1e-5)


class TestCommOps:
    def _vals(self, b=2, k=4, h=2, w=2, c=3):
        return jnp.arange(b * k * h * w * c, dtype=jnp.float32).reshape(b, k, h, w, c)

    def test_fuse_values_is_weighted_sum(self):
        v = self._vals()
        coef = jnp.zeros((2, 4, 4)).at[:, 1, 0].set(1.0)
        out = fuse_values(coef, v)
        np.testing.assert_allclose(out[:, 0], v[:, 1], atol=1e-6)

    def test_one_hot_argmax(self):
        p = jnp.array([[[0.1, 0.5], [0.7, 0.2], [0.2, 0.3]]])  # (1, K=3, Q=2)
        oh = one_hot_argmax(p, axis=1)
        np.testing.assert_allclose(oh[0], [[0, 1], [1, 0], [0, 0]], atol=1e-6)

    def test_num_connect_offdiag(self):
        # identity graph -> no off-diagonal links
        coef = jnp.eye(4)[None].repeat(2, axis=0)
        assert float(num_connect_offdiag(coef, 4)) == 0.0
        # one extra link in one sample -> 1 / (N * B)
        coef = coef.at[0, 1, 0].set(0.5)
        np.testing.assert_allclose(float(num_connect_offdiag(coef, 4)), 1 / 8)

    def test_argmax_select_hard_graph(self):
        v = self._vals(b=1)
        prob = jnp.array([[[0.1, 0.9, 0.3, 0.25],
                           [0.6, 0.05, 0.3, 0.25],
                           [0.2, 0.03, 0.3, 0.25],
                           [0.1, 0.02, 0.1, 0.25]]])  # (1, K=4, Q=4)
        fused, coef, nc = argmax_select(v, prob, 4)
        # query 0 -> key 1; query 1 -> key 0; query 2 -> key 0|2 (ties to 0)
        np.testing.assert_allclose(fused[0, 0], v[0, 1], atol=1e-6)
        np.testing.assert_allclose(fused[0, 1], v[0, 0], atol=1e-6)
        assert np.asarray(coef).sum() == 4  # one-hot per query

    def test_activated_select_threshold(self):
        v = self._vals(b=1, k=3)
        prob = jnp.array([[[0.7, 0.1, 0.15],
                           [0.2, 0.8, 0.15],
                           [0.1, 0.1, 0.7]]])
        fused, coef, nc = activated_select(v, prob, 3, thres=0.2)
        # entries <= 0.2 are zeroed; 0.2 itself is NOT kept (strict >)
        np.testing.assert_allclose(coef[0], [[0.7, 0, 0], [0, 0.8, 0], [0, 0, 0.7]])
        assert float(nc) == 0.0

    def test_topk_renormalizes(self):
        v = self._vals(b=1, k=4)
        prob = jax.nn.softmax(jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4))), axis=1)
        fused, coef, nc = topk_select(v, prob, 4, k=2)
        kept_per_query = (np.asarray(coef) > 0).sum(axis=1)
        assert (kept_per_query == 2).all()
        np.testing.assert_allclose(np.asarray(coef).sum(axis=1), 1.0, atol=1e-5)

    def test_drop_diagonal_softmax(self):
        logits = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 5)))
        out = drop_diagonal_softmax(logits, axis=1)
        o = np.asarray(out)
        # zero diagonal, columns renormalize over the other K-1 keys
        assert np.allclose(np.diagonal(o, axis1=1, axis2=2), 0.0)
        np.testing.assert_allclose(o.sum(axis=1), 1.0, atol=1e-5)
        # matches manual removal+softmax over off-diagonal entries
        col = np.delete(np.asarray(logits)[0, :, 2], 2)
        expected = np.exp(col - col.max()) / np.exp(col - col.max()).sum()
        np.testing.assert_allclose(np.delete(o[0, :, 2], 2), expected, atol=1e-5)


class TestPerFrameLinks:
    """Serving's exact tail-batch bandwidth: the per-sample decomposition of
    num_connect_offdiag, one value per frame-set."""

    def test_mean_matches_scalar_num_connect(self, rng):
        n, b = 5, 4
        prob = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, n, n))), axis=1)
        for mode, select in (
            ("argmax_test", argmax_select),
            ("activated", activated_select),
        ):
            _, coef, nc = select(jnp.zeros((b, n, 2, 2, 3)), prob, n)
            per = per_frame_links(prob, mode, n)
            assert per.shape == (b,)
            np.testing.assert_allclose(float(per.mean()), float(nc), atol=1e-6)

    def test_topk_and_softmax(self, rng):
        n, b, k = 5, 3, 2
        prob = jax.nn.softmax(
            jnp.asarray(rng.normal(size=(b, n, n))), axis=1)
        _, coef, nc = topk_select(jnp.zeros((b, n, 2, 2, 3)), prob, n, k)
        per = per_frame_links(prob, "topk", n, topk_k=k)
        np.testing.assert_allclose(float(per.mean()), float(nc), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(per_frame_links(prob, "softmax", n)), n - 1)


class TestConfusionMatrix:
    def test_matches_numpy_bincount(self, rng):
        n = 11
        t = jnp.asarray(rng.integers(0, n, size=(4, 37)))
        p = jnp.asarray(rng.integers(0, n, size=(4, 37)))
        ours = np.asarray(confusion_matrix(t, p, n))
        ref = np.bincount(
            n * np.asarray(t).flatten() + np.asarray(p).flatten(), minlength=n ** 2
        ).reshape(n, n)
        np.testing.assert_array_equal(ours, ref)

    def test_invalid_labels_dropped(self):
        t = jnp.array([[0, 1, 250, -1]])
        p = jnp.array([[0, 1, 2, 3]])
        cm = np.asarray(confusion_matrix(t, p, 11))
        assert cm.sum() == 2 and cm[0, 0] == 1 and cm[1, 1] == 1

    def test_sample_mask_split(self):
        t = jnp.array([[0, 0], [1, 1]])
        p = jnp.array([[0, 0], [1, 0]])
        pos = np.asarray(confusion_matrix(t, p, 3, sample_mask=jnp.array([1, 0])))
        neg = np.asarray(confusion_matrix(t, p, 3, sample_mask=jnp.array([0, 1])))
        assert pos.sum() == 2 and pos[0, 0] == 2
        assert neg.sum() == 2 and neg[1, 1] == 1 and neg[1, 0] == 1
