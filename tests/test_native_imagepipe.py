"""Native C++ image pipeline: decode parity vs PIL, batch loader semantics,
throughput sanity vs the PIL path."""

import os
import time

import numpy as np
import pytest
from PIL import Image

from loco_edit_tpu import native


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (size, fmt) in enumerate([((80, 64), "PNG"), ((123, 77), "JPEG"),
                                     ((600, 500), "JPEG"), ((64, 64), "PNG")]):
        arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        p = str(d / f"img{i}.{fmt.lower()}")
        Image.fromarray(arr).save(p, format=fmt, quality=95)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native pipeline could not build in this environment")


def test_png_decode_exact_vs_pil(images, lib_ok):
    p = images[0]
    got = native.decode_image(p)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, ref)


def test_jpeg_decode_close_to_pil(images, lib_ok):
    p = images[1]
    got = native.decode_image(p).astype(np.int16)
    ref = np.asarray(Image.open(p).convert("RGB")).astype(np.int16)
    assert got.shape == ref.shape
    # libjpeg IDCT variants differ by a couple of levels
    assert np.mean(np.abs(got - ref)) < 3.0


def test_load_batch_shape_range_and_crop(images, lib_ok):
    out = native.load_batch(images, size=32)
    assert out.shape == (len(images), 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    # square 64px PNG to 32: the pipeline box-halves once then resizes by 1.0
    # (identity), exactly like the PIL reference implementation of the same
    # crop pipeline (training/data.py _center_crop_resize)
    from loco_edit_tpu.training.data import _center_crop_resize

    ref = _center_crop_resize(Image.open(images[3]), 32)
    np.testing.assert_allclose(out[3], ref, atol=0.02)


def test_load_batch_missing_file_raises(images, lib_ok):
    with pytest.raises(IOError):
        native.load_batch([images[0], "/nonexistent.png"], size=32)


def test_batch_throughput_vs_pil(images, lib_ok):
    from loco_edit_tpu.training.data import _center_crop_resize

    paths = images * 8  # 32 decodes
    t0 = time.perf_counter()
    native.load_batch(paths, size=64)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in paths:
        _center_crop_resize(Image.open(p), 64)
    t_pil = time.perf_counter() - t0
    print(f"native {t_native:.3f}s vs PIL {t_pil:.3f}s "
          f"({t_pil / max(t_native, 1e-9):.1f}x)")
    # multithreaded native should not be slower; allow slack for tiny batches
    assert t_native < t_pil * 1.5
