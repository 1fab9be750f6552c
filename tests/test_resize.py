"""Goldens for the MXU-matmul bilinear resize against jax.image.resize
(half-pixel) and torch interpolate (align_corners=True)."""

import jax
import jax.numpy as jnp
import numpy as np

from multiagentperception_tpu.ops.resize import bilinear_resize


class TestBilinearResize:
    def test_matches_jax_image_resize(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 11)), jnp.float32)
        ref = jax.image.resize(x, (2, 128, 128, 11), method="bilinear")
        got = bilinear_resize(x, 128, 128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_matches_torch_align_corners(self, rng):
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
        t = torch.tensor(x).permute(0, 3, 1, 2)
        ref = (
            F.interpolate(t, size=(32, 32), mode="bilinear", align_corners=True)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(bilinear_resize(jnp.asarray(x), 32, 32, align_corners=True))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_identity_when_same_size(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
        assert bilinear_resize(x, 8, 8) is x

    def test_downscale_matches_torch_no_antialias(self, rng):
        # jax.image.resize anti-aliases on downscale (wider kernel); this op
        # is the plain 2-tap bilinear, which is torch's antialias=False.
        import torch
        import torch.nn.functional as F

        x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
        t = torch.tensor(x).permute(0, 3, 1, 2)
        ref = (
            F.interpolate(t, size=(8, 8), mode="bilinear", antialias=False)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        got = np.asarray(bilinear_resize(jnp.asarray(x), 8, 8))
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_differentiable(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
        g = jax.grad(lambda a: jnp.sum(bilinear_resize(a, 16, 16) ** 2))(x)
        assert np.isfinite(np.asarray(g)).all()
