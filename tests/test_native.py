"""Native (C++) data-plane tests: PIL parity of decode + resample."""

import io

import numpy as np
import pytest
from PIL import Image

from vision_transformers_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.fixture(scope="module")
def jpeg():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=92)
    return arr, buf.getvalue()


def test_dims(jpeg):
    _, payload = jpeg
    assert native.jpeg_dims(payload) == (160, 120)


def test_decode_matches_pil(jpeg):
    _, payload = jpeg
    pil = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    nat = native.decode_crop_resize(payload, (0, 0, 160, 120), (120, 160))
    np.testing.assert_array_equal(nat, pil)


@pytest.mark.parametrize("out,box", [
    ((48, 64), (13, 7, 120, 90)),    # downscale
    ((200, 260), (13, 7, 120, 90)),  # upscale
    ((32, 32), (0, 0, 160, 120)),    # full-frame
])
def test_resize_bicubic_matches_pil(jpeg, out, box):
    arr, _ = jpeg
    x, y, w, h = box
    pil = np.asarray(Image.fromarray(arr).resize(
        (out[1], out[0]), Image.BICUBIC, box=(x, y, x + w, y + h)))
    nat = native.resize(arr, box, out)
    np.testing.assert_array_equal(nat, pil)


def test_resize_bilinear_matches_pil(jpeg):
    arr, _ = jpeg
    pil = np.asarray(Image.fromarray(arr).resize(
        (64, 48), Image.BILINEAR, box=(5, 5, 155, 115)))
    nat = native.resize(arr, (5, 5, 150, 110), (48, 64), native.BILINEAR)
    np.testing.assert_array_equal(nat, pil)


def test_pipeline_native_equals_pil_path(jpeg, monkeypatch):
    """decode_random_resized_crop yields identical pixels with and without
    the native path (same rng → same geometry → pixel-exact resample)."""
    import random

    from vision_transformers_tpu.data import pipeline

    _, payload = jpeg
    nat = pipeline.decode_random_resized_crop(payload, 32, random.Random(3))
    monkeypatch.setattr(native, "available", lambda: False)
    pil = pipeline.decode_random_resized_crop(payload, 32, random.Random(3))
    np.testing.assert_array_equal(nat, pil)


def test_invalid_payload_returns_none():
    assert native.jpeg_dims(b"not a jpeg") is None
    assert native.decode_crop_resize(b"junk", (0, 0, 4, 4), (4, 4)) is None


def test_bad_box_rejected(jpeg):
    arr, _ = jpeg
    assert native.resize(arr, (150, 0, 40, 40), (8, 8)) is None
