"""Tests for the native C++ image pipeline (built on demand)."""

import os

import numpy as np
import pytest

from mvsdet_tpu.data import native_loader

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.fixture()
def jpeg_file(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    # smooth it so JPEG loss is small
    img = cv2.GaussianBlur(img, (7, 7), 3)
    path = str(tmp_path / "img.jpg")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 98])
    return path, img


class TestNativeLoader:
    def test_decode_resize_matches_cv2(self, lib, jpeg_file):
        path, img = jpeg_file
        got = native_loader.load_resize_rgb(path, (48, 64))
        # reference: cv2 decode + resize
        ref_img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        ref = cv2.resize(ref_img, (64, 48), interpolation=cv2.INTER_LINEAR)
        assert got.shape == (48, 64, 3)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert np.mean(diff) < 3.0
        assert np.percentile(diff, 99) <= 12

    def test_batch_load_matches_single(self, lib, jpeg_file):
        path, _ = jpeg_file
        single = native_loader.load_resize_rgb(path, (32, 40))
        batch = native_loader.load_batch_rgb([path] * 5, (32, 40),
                                             n_threads=3)
        assert batch.shape == (5, 32, 40, 3)
        for i in range(5):
            np.testing.assert_array_equal(batch[i], single)

    def test_depth_png_roundtrip(self, lib, tmp_path):
        depth_mm = (np.linspace(500, 4000, 64 * 48)
                    .reshape(48, 64).astype(np.uint16))
        path = str(tmp_path / "d.png")
        cv2.imwrite(path, depth_mm)
        got = native_loader.load_depth_png(path, (48, 64))
        np.testing.assert_allclose(got, depth_mm.astype(np.float32) / 1000.0,
                                   atol=2e-3)

    def test_missing_file_raises(self, lib):
        with pytest.raises(IOError):
            native_loader.load_resize_rgb("/nonexistent.jpg", (8, 8))

    def test_pipeline_integration(self, lib, jpeg_file):
        """ScenePipeline accepts the native loader as image_loader."""
        path, _ = jpeg_file
        out = native_loader.load_resize_rgb(path, (240, 320))
        assert out.dtype == np.uint8 and out.shape == (240, 320, 3)
