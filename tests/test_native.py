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

@pytest.fixture(scope="module")
def photo_jpeg():
    """A larger, smooth 'photo-like' 4:2:0 JPEG — the region-restricted
    decode must stay bit-identical to a full decode on exactly this kind of
    payload (chroma upsampling context crosses the crop boundary)."""
    yy, xx = np.mgrid[0:375, 0:500]
    r = (127 + 100 * np.sin(xx / 23.0) * np.cos(yy / 31.0)).astype(np.uint8)
    g = (127 + 100 * np.cos(xx / 17.0 + yy / 41.0)).astype(np.uint8)
    b = ((xx + yy) % 256).astype(np.uint8)
    arr = np.stack([r, g, b], -1)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90,
                              subsampling=2)  # 4:2:0 — worst case for crops
    return buf.getvalue()


def test_region_decode_bit_identical_to_full_decode(photo_jpeg):
    """decode_crop_resize restricts IDCT to the crop region; every box —
    iMCU-misaligned, tiny, edge-touching — must match full-decode + PIL
    resize pixel for pixel."""
    import random

    full = np.asarray(Image.open(io.BytesIO(photo_jpeg)).convert("RGB"))
    H, W = full.shape[:2]
    rng = random.Random(11)
    boxes = [(0, 0, W, H), (0, 0, 33, 29), (W - 31, H - 27, 31, 27),
             (247, 131, 17, 19)]
    for _ in range(16):
        w = rng.randint(12, W)
        h = rng.randint(12, H)
        boxes.append((rng.randint(0, W - w), rng.randint(0, H - h), w, h))
    for box in boxes:
        x, y, w, h = box
        pil = np.asarray(Image.fromarray(full).resize(
            (64, 64), Image.BICUBIC, box=(x, y, x + w, y + h)))
        nat = native.decode_crop_resize(photo_jpeg, box, (64, 64))
        np.testing.assert_array_equal(nat, pil, err_msg=f"box={box}")


def test_fast_decode_close_to_exact(photo_jpeg):
    """fast=True (DCT-scaled decode) is not bit-identical but must stay
    visually equivalent when the crop is >=2x the target."""
    box = (40, 30, 448, 320)  # 2x both dims at 224 target -> denom kicks in
    exact = native.decode_crop_resize(photo_jpeg, box, (160, 224))
    fast = native.decode_crop_resize(photo_jpeg, box, (160, 224), fast=True)
    assert fast.shape == exact.shape
    diff = np.abs(exact.astype(np.int16) - fast.astype(np.int16))
    assert diff.mean() < 4.0 and np.percentile(diff, 99) < 24


def test_fast_decode_small_crop_is_exact(photo_jpeg):
    """When the crop is under 2x the target no DCT scaling applies and the
    fast path degenerates to the exact region decode."""
    box = (40, 30, 96, 96)
    exact = native.decode_crop_resize(photo_jpeg, box, (64, 64))
    fast = native.decode_crop_resize(photo_jpeg, box, (64, 64), fast=True)
    np.testing.assert_array_equal(fast, exact)


@pytest.mark.parametrize("dims", [(500, 375), (375, 500), (347, 461),
                                  (150, 231), (257, 257)])
def test_decode_valid_fused_matches_pil(dims, monkeypatch):
    """The fused eval decode (one sub-pixel-box region decode) must equal the
    reference two-stage path (resize whole image, then center crop) pixel for
    pixel across orientations, odd dims, and the upscale case."""
    from vision_transformers_tpu.data import pipeline

    w, h = dims
    yy, xx = np.mgrid[0:h, 0:w]
    arr = np.stack([(xx * 5) % 256, (yy * 3) % 256, (xx + yy) % 256],
                   -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=90, subsampling=2)
    payload = buf.getvalue()

    fused = pipeline.decode_valid(payload, 224)
    monkeypatch.setattr(native, "available", lambda: False)
    pil = pipeline.decode_valid(payload, 224)
    assert fused.shape == pil.shape == (224, 224, 3)
    np.testing.assert_array_equal(fused, pil)


def test_concurrent_decode_thread_safety(photo_jpeg):
    """The loader calls the native decode from a thread pool with the GIL
    released — per-call decompressor state must make concurrent calls
    independent (same results as serial)."""
    from concurrent.futures import ThreadPoolExecutor

    boxes = [(13 * i % 200, 7 * i % 150, 96 + i % 64, 96 + (3 * i) % 64)
             for i in range(64)]
    serial = [native.decode_crop_resize(photo_jpeg, b, (64, 64)) for b in boxes]
    with ThreadPoolExecutor(max_workers=8) as ex:
        threaded = list(ex.map(
            lambda b: native.decode_crop_resize(photo_jpeg, b, (64, 64)), boxes))
    for s, t, b in zip(serial, threaded, boxes):
        np.testing.assert_array_equal(s, t, err_msg=f"box={b}")


def test_oob_integer_box_rejected(photo_jpeg):
    """A partially out-of-bounds integer crop box must be rejected (None ->
    PIL fallback), not silently clamped into a geometrically wrong crop."""
    from PIL import Image as _I
    import io as _io
    w, h = _I.open(_io.BytesIO(photo_jpeg)).size
    assert native.decode_crop_resize(photo_jpeg, (w - 10, 0, 40, 40), (16, 16)) is None
    assert native.decode_crop_resize(photo_jpeg, (0, h - 5, 10, 40), (16, 16)) is None
    assert native.decode_crop_resize(photo_jpeg, (w - 10, 0, 40, 40), (16, 16),
                                     fast=True) is None
