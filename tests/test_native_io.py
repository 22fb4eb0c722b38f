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


def test_loader_closed_handle_raises(images):
    jpg, png = images
    loader = native.NativeCatalogLoader([jpg, png], size=32)
    loader.close()
    with pytest.raises(ValueError, match="closed"):
        loader.load([0])


def test_loader_surfaces_failed_count(images, caplog):
    import logging

    jpg, _ = images
    loader = native.NativeCatalogLoader([jpg, "/nonexistent/x.jpg"], size=32)
    try:
        with caplog.at_level(logging.WARNING, logger="difashion_tpu"):
            out = loader.load([0, 1, 1])
        assert loader.last_failed == 2
        assert (out[1] == 1.0).all() and (out[2] == 1.0).all()  # white null
        assert any("2/3 decodes failed" in r.message for r in caplog.records)
    finally:
        loader.close()


def test_loader_concurrent_requests_serialize(images):
    """Two Python threads sharing one loader (ctypes drops the GIL): requests
    must serialize, each returning its own correct images."""
    import threading

    jpg, png = images
    loader = native.NativeCatalogLoader([jpg, png], size=32)
    try:
        ref0 = loader.load([0] * 8)
        ref1 = loader.load([1] * 8)
        results = {}

        def go(name, ids, ref):
            for _ in range(10):
                out = loader.load(ids)
                if not np.array_equal(out, ref):
                    results[name] = "MISMATCH"
                    return
            results[name] = "ok"

        t0 = threading.Thread(target=go, args=("a", [0] * 8, ref0))
        t1 = threading.Thread(target=go, args=("b", [1] * 8, ref1))
        t0.start(); t1.start()
        t0.join(60); t1.join(60)
        assert results == {"a": "ok", "b": "ok"}, results
    finally:
        loader.close()


def test_cmyk_jpeg_decodes(images, tmp_path):
    """Adobe CMYK JPEGs (commercial product imagery) decode instead of silently
    becoming the white null; values match PIL's CMYK->RGB within resample noise."""
    rng = np.random.RandomState(7)
    rgb = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "cmyk.jpg")
    Image.fromarray(rgb).convert("CMYK").save(p, quality=95)
    got = native.prepare_image(p, size=32)
    want = _pil_prepare(p, 32)
    # same noise envelope as the RGB-JPEG parity test: decode + rounding LSBs
    assert np.abs(got - want).mean() < 0.01, np.abs(got - want).mean()
    assert np.abs(got - want).max() < 0.2, np.abs(got - want).max()


def test_make_item_loader_fallback_matches_native(images, monkeypatch, tmp_path):
    """With the .so unavailable, the PIL fallback must produce the SAME pixels as
    the native pipeline (same composite/pad/Lanczos path)."""
    from difashion_tpu.cli.extract_features import make_item_loader

    jpg, png = images
    folder = os.path.dirname(jpg)
    paths = np.array([os.path.basename(jpg), os.path.basename(png)], dtype=object)

    native_loader = make_item_loader(folder, paths, size=32)
    a0, a1 = native_loader(0), native_loader(1)

    monkeypatch.setattr(native, "native_available", lambda: False)
    pil_loader = make_item_loader(folder, paths, size=32)
    b0, b1 = pil_loader(0), pil_loader(1)
    # same pipeline both sides; only decode/compositing rounding LSBs remain
    assert np.abs(a0 - b0).mean() < 0.01 and np.abs(a0 - b0).max() < 0.2
    assert np.abs(a1 - b1).mean() < 0.01 and np.abs(a1 - b1).max() < 0.2


def test_stale_binary_is_refused(monkeypatch):
    """A .so whose embedded source hash mismatches the on-disk .cc must be
    refused (native_available() -> False), so the PIL fallback takes over
    instead of silently running outdated native code."""
    lib = native._load()
    assert lib.dfio_source_hash().decode() == native._source_hash()

    monkeypatch.setattr(native, "_source_hash", lambda: "0" * 64)
    monkeypatch.setattr(native, "_lib", None)
    with pytest.raises(OSError, match="stale native library"):
        native._load()
    assert not native.native_available()
    monkeypatch.setattr(native, "_lib", None)  # don't leave a cached None


def test_binary_hash_matches_committed_source():
    """The committed binary must be built from the committed source — the exact
    skew round 3 shipped."""
    lib = native._load()
    assert lib.dfio_source_hash().decode() == native._source_hash(), (
        "committed libdifashion_io.so is stale; run `make -C native` and commit"
    )
