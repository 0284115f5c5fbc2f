"""Host-side (PIL, loader-thread) RandAugment — the reference's own backend.

The reference runs the whole augmentation stack on CPU dataloader workers
(reference factory.py:169-181, autoaugment.py).  Our on-device augment
program is PIL-exact but costs accelerator time (~500-650 img/s/chip on
v5e even after the MXU one-hot redesign — PERF.md); on hosts with enough
cores, running RandAugment in the loader's thread pool overlaps it with
device compute entirely, exactly like the reference.  Selected by
``training.augment_backend: host`` (default ``device``).

Op semantics are the SAME PIL calls the device ops are golden-tested
against (tests/test_augment.py), so both backends produce identically
distributed batches; tests/test_host_augment.py pins host==device per op.
PIL releases the GIL in its C filters, so the thread pool scales.
"""

from __future__ import annotations

import random as pyrandom
from typing import Optional

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from .augment import (RANDAUGMENT_OPS, RANDAUGMENT_OPS_INCREASING, _REPARAM)

__all__ = ["pil_apply_named_op", "pil_randaugment", "mix_host_batch"]

FILL = (128, 128, 128)


def _affine(img: Image.Image, coeffs) -> Image.Image:
    return img.transform(img.size, Image.AFFINE, coeffs, Image.NEAREST,
                         fillcolor=FILL)


def pil_apply_named_op(name: str, img: Image.Image, mag: float,
                       rng: pyrandom.Random) -> Image.Image:
    """Apply one (already reparameterized) op via PIL — the host twin of
    augment.apply_named_op's underlying op table."""
    if name in ("ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"):
        sign = 1.0 if rng.random() < 0.5 else -1.0
        m = sign * mag
        if name == "ShearX":
            return _affine(img, (1, m, 0, 0, 1, 0))
        if name == "ShearY":
            return _affine(img, (1, 0, 0, m, 1, 0))
        if name == "TranslateX":
            return _affine(img, (1, 0, m, 0, 1, 0))
        if name == "TranslateY":
            return _affine(img, (1, 0, 0, 0, 1, m))
        return img.rotate(m, resample=Image.NEAREST, fillcolor=FILL)
    if name == "Invert":
        return ImageOps.invert(img)
    if name in ("Posterize", "PosterizeIncreasing"):
        return ImageOps.posterize(img, int(mag))  # bits=0 → zeros, like PIL
    if name in ("Solarize", "SolarizeIncreasing"):
        return ImageOps.solarize(img, int(mag))
    if name == "SolarizeAdd":
        add = int(mag)
        lut = [min(255, i + add) if i < 128 else i for i in range(256)]
        return img.point(lut * 3)
    if name == "AutoContrast":
        return ImageOps.autocontrast(img)
    if name == "Equalize":
        return ImageOps.equalize(img)
    if name == "Color":
        return ImageEnhance.Color(img).enhance(mag)
    if name == "Contrast":
        return ImageEnhance.Contrast(img).enhance(mag)
    if name == "Brightness":
        return ImageEnhance.Brightness(img).enhance(mag)
    if name == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(mag)
    if name == "Cutout":
        w, h = img.size
        size = int(mag)
        cx = int(rng.random() * w)
        cy = int(rng.random() * h)
        x0, y0 = max(0, cx - size), max(0, cy - size)
        x1 = w - max(0, w - cx - size)
        y1 = h - max(0, h - cy - size)
        out = img.copy()
        out.paste(FILL, (x0, y0, x1, y1))
        return out
    raise KeyError(name)


def pil_randaugment(
    img: np.ndarray,
    rng: pyrandom.Random,
    n_augment: int,
    magnitude: float,
    translate: int = 100,
    cutout: int = 40,
    increasing: bool = False,
    magnitude_std: float = 0.0,
) -> np.ndarray:
    """RandAugment on a uint8 [H,W,3] array (reference autoaugment.py:586-678
    sampling: n ops with replacement, optional gaussian magnitude jitter)."""
    ops = list(RANDAUGMENT_OPS_INCREASING if increasing else RANDAUGMENT_OPS)
    if cutout == 0:
        ops.remove("Cutout")
    ctx = {"translate": float(translate), "cutout": float(cutout)}
    pil = Image.fromarray(img)
    for _ in range(n_augment):
        name = ops[rng.randrange(len(ops))]
        level = magnitude
        if magnitude_std > 0:
            level = rng.gauss(magnitude, magnitude_std)
        reparam = _REPARAM[name]
        mag = float(reparam(np.float32(level), ctx)) if reparam else 0.0
        pil = pil_apply_named_op(name, pil, mag, rng)
    return np.asarray(pil, np.uint8)


def mix_host_batch(images: np.ndarray, labels: np.ndarray,
                   mixup: float, cutmix: float, rng: np.random.Generator):
    """Batch-level mixup/cutmix on uint8 arrays — host twin of
    ops.mix_batch(quantize=True): nonzero cyclic-shift partner, index-parity
    alternation, PIL-blend truncation, clipped-box ratio recompute."""
    b, h, w, _ = images.shape
    if (mixup <= 0 and cutmix <= 0) or b < 2:
        return images, labels, labels, np.ones((b,), np.float32)

    shift = int(rng.integers(1, b))
    partner = np.roll(images, shift, axis=0)
    label2 = np.roll(labels, shift, axis=0)

    idx = np.arange(b)
    if mixup > 0 and cutmix > 0:
        use_mixup = idx % 2 == 0
    elif mixup > 0:
        use_mixup = np.ones((b,), bool)
    else:
        use_mixup = np.zeros((b,), bool)

    out = images.copy()
    ratio = np.ones((b,), np.float32)
    for i in range(b):
        if use_mixup[i]:
            r = rng.beta(max(mixup, 1e-6), max(mixup, 1e-6))
            alpha = 1.0 - r
            f = images[i].astype(np.float64)
            out[i] = np.trunc(f + alpha * (partner[i] - f)).astype(np.uint8)
            ratio[i] = r
        else:
            r = rng.uniform() if cutmix == 1 else rng.beta(
                max(cutmix, 1e-6), max(cutmix, 1e-6))
            cut = np.sqrt(1.0 - r)
            cw, ch = int(w * cut), int(h * cut)
            cx, cy = int(rng.integers(0, w)), int(rng.integers(0, h))
            x1, y1 = np.clip(cx - cw // 2, 0, w), np.clip(cy - ch // 2, 0, h)
            x2, y2 = np.clip(cx + cw // 2, 0, w), np.clip(cy + ch // 2, 0, h)
            out[i, y1:y2, x1:x2] = partner[i, y1:y2, x1:x2]
            ratio[i] = 1.0 - ((x2 - x1) * (y2 - y1) / (h * w))
    return out, labels, label2, ratio
