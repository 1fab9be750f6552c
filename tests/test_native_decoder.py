"""Native C++ batch PNG decoder: exact agreement with the cv2 path, batch
concurrency, error handling, and loader integration."""

import os

import numpy as np
import pytest

from multiagentperception_tpu import native
from multiagentperception_tpu.data import AirsimDataset
from multiagentperception_tpu.data.synthetic import generate_fixture

needs_native = pytest.mark.skipif(
    not native.available(), reason="native decoder not built (native/build.sh)"
)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    import cv2

    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        img = rng.integers(0, 256, (32, 24, 3), np.uint8)
        p = str(d / f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


@needs_native
class TestNativeDecoder:
    def test_single_matches_cv2(self, pngs):
        import cv2

        got = native.decode_image(pngs[0])
        ref = cv2.cvtColor(cv2.imread(pngs[0]), cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(got, ref)

    def test_batch_matches_cv2(self, pngs):
        import cv2

        batch = native.decode_batch(pngs, 32, 24, 3, nthreads=4)
        assert batch.shape == (6, 32, 24, 3)
        for i, p in enumerate(pngs):
            ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
            np.testing.assert_array_equal(batch[i], ref)

    def test_png_info(self, pngs):
        assert native.png_info(pngs[0]) == (24, 32, 3)

    def test_missing_file_errors(self, tmp_path):
        with pytest.raises(IOError):
            native.decode_image(str(tmp_path / "nope.png"))

    def test_geometry_mismatch_errors(self, pngs, tmp_path):
        import cv2

        odd = str(tmp_path / "odd.png")
        cv2.imwrite(odd, np.zeros((8, 8, 3), np.uint8))
        with pytest.raises(IOError):
            native.decode_batch(pngs[:2] + [odd], 32, 24, 3)

    def test_dataset_native_path_equals_cv2_path(self, tmp_path):
        root = str(tmp_path / "fx")
        generate_fixture(root, target_view="6agent", img_size=32,
                         frames_per_traj=1)
        ds_native = AirsimDataset(root, split="train", target_view="6agent",
                                  use_native_decoder=True)
        ds_cv2 = AirsimDataset(root, split="train", target_view="6agent",
                               use_native_decoder=False)
        img_n, lbl_n = ds_native[0]
        img_c, lbl_c = ds_cv2[0]
        np.testing.assert_allclose(img_n, img_c, atol=1e-6)
        np.testing.assert_array_equal(lbl_n, lbl_c)
