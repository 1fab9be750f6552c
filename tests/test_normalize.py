"""On-device normalization matches the reference host transform."""

import jax.numpy as jnp
import numpy as np

from multiagentperception_tpu.data.airsim import AirsimDataset, MEAN_RGB
from multiagentperception_tpu.data.synthetic import generate_fixture
from multiagentperception_tpu.ops.normalize import normalize_images


class TestNormalizeOnDevice:
    def test_matches_host_transform(self, rng):
        u8 = rng.integers(0, 256, size=(2, 3, 8, 8, 3)).astype(np.uint8)
        got = np.asarray(normalize_images(jnp.asarray(u8)))
        expected = (u8[..., ::-1].astype(np.float64) - MEAN_RGB) / 255.0
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_no_img_norm(self, rng):
        u8 = rng.integers(0, 256, size=(1, 4, 4, 3)).astype(np.uint8)
        got = np.asarray(normalize_images(jnp.asarray(u8), img_norm=False))
        expected = u8[..., ::-1].astype(np.float64) - MEAN_RGB
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_raw_dataset_plus_device_norm_equals_host_path(self, tmp_path):
        root = str(tmp_path / "fx")
        generate_fixture(root, target_view="6agent", img_size=32, frames_per_traj=1)
        host = AirsimDataset(root, split="train", target_view="6agent")
        raw = AirsimDataset(root, split="train", target_view="6agent", raw_images=True)
        img_host, lbl_host = host[0]
        img_raw, lbl_raw = raw[0]
        assert img_raw.dtype == np.uint8
        np.testing.assert_array_equal(lbl_host, lbl_raw)
        np.testing.assert_allclose(
            np.asarray(normalize_images(jnp.asarray(img_raw))), img_host, atol=1e-5
        )
