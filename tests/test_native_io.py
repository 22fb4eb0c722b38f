"""Native C++ image pipeline vs the PIL reference pipeline."""
import os

import numpy as np
import pytest
from PIL import Image

from difashion_tpu.data.preprocessing import prepare_catalog_image
from difashion_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    # non-square JPEG
    jpg = d / "a.jpg"
    Image.fromarray(
        (rng.rand(60, 40, 3) * 255).astype(np.uint8)
    ).save(jpg, quality=95)
    # RGBA PNG with transparency
    png = d / "b.png"
    rgba = (rng.rand(50, 50, 4) * 255).astype(np.uint8)
    rgba[:10, :, 3] = 0          # fully transparent strip
    Image.fromarray(rgba, "RGBA").save(png)
    return str(jpg), str(png)


def _pil_prepare(path, size):
    img = Image.open(path)
    out = prepare_catalog_image(img, size=size)
    return 2.0 * (np.asarray(out, np.float32) / 255.0) - 1.0


def test_prepare_jpeg_matches_pil(images):
    jpg, _ = images
    ours = native.prepare_image(jpg, size=32)
    ref = _pil_prepare(jpg, 32)
    assert ours.shape == ref.shape == (32, 32, 3)
    # Lanczos windows identical; JPEG decode + rounding can differ by a few LSB
    assert np.abs(ours - ref).mean() < 0.01
    assert np.abs(ours - ref).max() < 0.2


def test_prepare_png_alpha_composites_white(images):
    _, png = images
    ours = native.prepare_image(png, size=32)
    ref = _pil_prepare(png, 32)
    # PIL's integer premultiplied compositing rounds differently on partial-alpha
    # pixels; Lanczos ringing amplifies those LSBs slightly
    assert np.abs(ours - ref).mean() < 0.01
    assert np.abs(ours - ref).max() < 0.15
    # transparent strip must be white (top rows ~ 1.0 after the pad offset)
    assert ours.max() <= 1.0 and ours.min() >= -1.0


def test_image_size(images):
    jpg, png = images
    import ctypes

    lib = native._load()
    w, h = ctypes.c_int(), ctypes.c_int()
    assert lib.dfio_image_size(jpg.encode(), ctypes.byref(w), ctypes.byref(h))
    assert (w.value, h.value) == (40, 60)


def test_batch_loader(images):
    jpg, png = images
    loader = native.NativeCatalogLoader([jpg, png], size=16, n_threads=2)
    out = loader.load([0, 1, 0])
    assert out.shape == (3, 16, 16, 3)
    np.testing.assert_allclose(out[0], out[2])
    # out-of-range id -> white null image
    bad = loader.load([7])
    np.testing.assert_allclose(bad[0], 1.0)
    loader.close()


def test_prepare_missing_file_raises():
    with pytest.raises(IOError):
        native.prepare_image("/nonexistent/xx.jpg", size=16)
