"""Native C++ PNG decoder vs PIL oracle."""

import os

import numpy as np
import pytest

from orbslam2_tpu.utils import native_io

pytestmark = pytest.mark.skipif(
    not native_io.native_available(), reason="native lib not built"
)


@pytest.fixture(scope="module")
def png_files(tmp_path_factory, ):
    from PIL import Image

    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("pngs")
    files = {}
    g8 = rng.integers(0, 256, size=(48, 64)).astype(np.uint8)
    Image.fromarray(g8, "L").save(d / "gray8.png")
    files["gray8"] = (str(d / "gray8.png"), g8.astype(np.float32))
    g16 = rng.integers(0, 65535, size=(32, 40)).astype(np.uint16)
    Image.fromarray(g16, "I;16").save(d / "gray16.png")
    files["gray16"] = (str(d / "gray16.png"), g16.astype(np.float32))
    rgb = rng.integers(0, 256, size=(20, 30, 3)).astype(np.uint8)
    Image.fromarray(rgb, "RGB").save(d / "rgb.png")
    gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
    files["rgb"] = (str(d / "rgb.png"), gray.astype(np.float32))
    return files


class TestNativeDecode:
    def test_gray8(self, png_files):
        path, want = png_files["gray8"]
        got = native_io.load_image(path)
        np.testing.assert_array_equal(got, want)

    def test_gray16(self, png_files):
        path, want = png_files["gray16"]
        got = native_io.load_image(path)
        np.testing.assert_array_equal(got, want)

    def test_rgb_to_gray(self, png_files):
        path, want = png_files["rgb"]
        got = native_io.load_image(path)
        np.testing.assert_allclose(got, want, atol=0.51)

    def test_prefetcher(self, png_files):
        paths = [png_files["gray8"][0]] * 6 + [png_files["rgb"][0]] * 2
        loader = native_io.PrefetchingLoader(paths, n_workers=2, window=4)
        try:
            for i in range(len(paths)):
                img = loader.get(i)
                assert img.ndim == 2 and img.size > 0
        finally:
            loader.close()

    def test_missing_file_raises(self):
        with pytest.raises(IOError):
            native_io.load_image("/nonexistent/file.png")
