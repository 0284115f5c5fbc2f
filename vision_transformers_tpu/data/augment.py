"""On-device batched image augmentation: the 18 AutoAugment ops + RandAugment.

TPU-native redesign of the reference's PIL/CPU stack (reference:
autoaugment.py, transforms.py): every op is a jittable function of a float32
[H,W,3] image in [0,255], vmapped over the batch with per-sample PRNG keys —
augmentation runs on-device fused into the input pipeline instead of on
dataloader worker processes.

PIL-exactness (the "hard part" of SURVEY §7): LUT ops (posterize, solarize,
solarize-add, invert, equalize, autocontrast) reproduce PIL's integer-LUT
semantics; enhance ops (color/contrast/brightness/sharpness) reproduce
``Image.blend``'s ``floor(x+0.5)`` rounding; geometric ops use PIL's NEAREST
affine convention ``src = floor(A·(dst+0.5))`` (verified exact against PIL in
tests/test_augment.py) with fillcolor (128,128,128).

Magnitude reparameterizations mirror reference autoaugment.py:444-482
(shear ±0.3, translate ±100px, rotate ±30°, solarize 256·m/10 and its
increasing complement, posterize 4·m/10 / 4−…, color 0.1+1.8·m/10,
cutout px, solarize-add 110·m/10).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "randaugment",
    "autoaugment",
    "RANDAUGMENT_OPS",
    "RANDAUGMENT_OPS_INCREASING",
]

FILL = 128.0


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _clip8(x):
    return jnp.clip(x, 0.0, 255.0)


def _blend(degenerate, image, factor):
    """PIL ImageEnhance blend: out = deg + factor·(img − deg), C-cast ``(int)``
    truncation toward zero, clipped (verified against PIL in tests)."""
    out = degenerate + factor * (image - degenerate)
    return _clip8(jnp.trunc(out))


def _gray_l(img):
    """PIL convert("L"): (R·19595 + G·38470 + B·7471 + 0x8000) >> 16."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    l24 = r * 19595.0 + g * 38470.0 + b * 7471.0 + 32768.0
    return jnp.floor(l24 / 65536.0)


def _histogram(channel):
    """256-bin histogram of a [H,W] channel with values 0..255."""
    idx = channel.astype(jnp.int32).reshape(-1)
    return jnp.zeros((256,), jnp.int32).at[idx].add(1)


def _apply_lut(img, lut):
    """Per-channel LUT application; lut [256] or [3,256]."""
    idx = img.astype(jnp.int32)
    if lut.ndim == 1:
        return lut[idx].astype(jnp.float32)
    out = [lut[c][idx[..., c]] for c in range(3)]
    return jnp.stack(out, axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# geometric ops — PIL NEAREST affine: src = floor(A · (dst + 0.5))
# ---------------------------------------------------------------------------

_FIX_EPS = 2.0 ** -17  # half ULP of Pillow's 16.16 fixed-point fast path


def _affine_nearest(img, a, b, c, d, e, f):
    """Pillow's NEAREST affine: src = floor(A·(dst+0.5) − ε) where ε is the
    half-ULP bias of its 16.16 fixed-point accumulator (ImagingTransformAffine;
    calibrated empirically — see tests/test_augment.py geometry goldens).
    float32 keeps the geometry goldens exact at ImageNet sizes; coordinates
    are ≤ a few hundred so the ε stays representable."""
    h, w = img.shape[:2]
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = jnp.floor(a * (xs + 0.5) + b * (ys + 0.5) + c - _FIX_EPS).astype(jnp.int32)
    sy = jnp.floor(d * (xs + 0.5) + e * (ys + 0.5) + f - _FIX_EPS).astype(jnp.int32)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    sxc = jnp.clip(sx, 0, w - 1)
    syc = jnp.clip(sy, 0, h - 1)
    gathered = img[syc, sxc]
    return jnp.where(valid[..., None], gathered, FILL)


def shear_x_op(img, mag, key):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return _affine_nearest(img, 1.0, sign * mag, 0.0, 0.0, 1.0, 0.0)


def shear_y_op(img, mag, key):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return _affine_nearest(img, 1.0, 0.0, 0.0, sign * mag, 1.0, 0.0)


def translate_x_op(img, mag, key):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return _affine_nearest(img, 1.0, 0.0, sign * mag, 0.0, 1.0, 0.0)


def translate_y_op(img, mag, key):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return _affine_nearest(img, 1.0, 0.0, 0.0, 0.0, 1.0, sign * mag)


def rotate_op(img, mag, key):
    """PIL Image.rotate(deg) about the image center (reference rotate :132-136)."""
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    angle = -jnp.deg2rad(sign * mag)  # PIL rotates counter-clockwise
    h, w = img.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - (a * cx + b * cy)
    f = cy - (d * cx + e * cy)
    return _affine_nearest(img, a, b, c, d, e, f)


def cutout_op(img, mag, key):
    """Reference cutout (autoaugment.py:144-166): random center, half-extent
    ``size`` px, inclusive rectangle, gray fill."""
    h, w = img.shape[:2]
    kx, ky = jax.random.split(key)
    cx = jnp.floor(jax.random.uniform(kx) * w)
    cy = jnp.floor(jax.random.uniform(ky) * h)
    size = mag
    x0 = jnp.maximum(0.0, cx - size)
    x1 = w - jnp.maximum(0.0, w - cx - size) - 1.0
    y0 = jnp.maximum(0.0, cy - size)
    y1 = h - jnp.maximum(0.0, h - cy - size) - 1.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    return jnp.where(inside[..., None], FILL, img)


# ---------------------------------------------------------------------------
# LUT / enhance ops
# ---------------------------------------------------------------------------

def invert_op(img, mag, key):
    return 255.0 - img


def posterize_op(img, mag, key):
    bits = mag.astype(jnp.int32)
    shift = 8 - bits
    vals = img.astype(jnp.int32)
    out = jnp.where(shift >= 8, 0, (vals >> shift) << shift)
    return out.astype(jnp.float32)


def solarize_op(img, mag, key):
    return jnp.where(img < mag, img, 255.0 - img)


def solarize_add_op(img, mag, key, threshold: float = 128.0):
    added = jnp.minimum(255.0, img + mag)
    return jnp.where(img < threshold, added, img)


def autocontrast_op(img, mag, key):
    """PIL ImageOps.autocontrast (cutoff 0): per-channel linear stretch with
    ``int(i·scale + offset)`` truncation."""

    def one(channel):
        h = _histogram(channel)
        nz = h > 0
        any_nz = nz.any()
        lo = jnp.argmax(nz)
        hi = 255 - jnp.argmax(nz[::-1])
        scale = 255.0 / jnp.maximum(hi - lo, 1).astype(jnp.float32)
        i = jnp.arange(256, dtype=jnp.float32)
        lut = jnp.clip(jnp.trunc(i * scale - lo * scale), 0, 255)
        identity = jnp.arange(256, dtype=jnp.float32)
        lut = jnp.where((hi > lo) & any_nz, lut, identity)
        return lut[channel.astype(jnp.int32)]

    return jnp.stack([one(img[..., c]) for c in range(3)], axis=-1)


def equalize_op(img, mag, key):
    """PIL ImageOps.equalize: cumulative-histogram LUT with PIL's exact
    step/offset integer arithmetic."""

    def one(channel):
        h = _histogram(channel)
        nz = h > 0
        n_nonzero = nz.sum()
        last_idx = 255 - jnp.argmax(nz[::-1])
        last_val = h[last_idx]
        step = (h.sum() - last_val) // 255
        cum = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(h)[:-1]])
        n = step // 2 + cum
        lut = jnp.where(step > 0, n // jnp.maximum(step, 1), 0)
        identity = jnp.arange(256, dtype=jnp.int32)
        lut = jnp.where((n_nonzero > 1) & (step > 0), jnp.clip(lut, 0, 255), identity)
        return lut[channel.astype(jnp.int32)].astype(jnp.float32)

    return jnp.stack([one(img[..., c]) for c in range(3)], axis=-1)


def color_op(img, mag, key):
    """ImageEnhance.Color: blend from grayscale (reference saturation :202)."""
    gray = _gray_l(img)[..., None]
    return _blend(jnp.broadcast_to(gray, img.shape), img, mag)


def contrast_op(img, mag, key):
    """ImageEnhance.Contrast: blend from the mean-gray constant image."""
    gray = _gray_l(img)
    mean = jnp.floor(jnp.mean(gray) + 0.5)
    return _blend(jnp.full_like(img, mean), img, mag)


def brightness_op(img, mag, key):
    """ImageEnhance.Brightness: blend from black."""
    return _blend(jnp.zeros_like(img), img, mag)


def sharpness_op(img, mag, key):
    """ImageEnhance.Sharpness: blend from SMOOTH-filtered image
    (kernel [[1,1,1],[1,5,1],[1,1,1]]/13; PIL keeps the 1px border unfiltered)."""
    kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    h, w = img.shape[:2]
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],  # [C,1,H,W]
        kernel[None, None],
        window_strides=(1, 1), padding="VALID",
    )[:, 0].transpose(1, 2, 0)  # [H-2,W-2,C]
    smoothed = jnp.floor(smoothed + 0.5)
    degenerate = img.at[1:-1, 1:-1].set(_clip8(smoothed))
    return _blend(degenerate, img, mag)


def identity_op(img, mag, key):
    return img


# ---------------------------------------------------------------------------
# magnitude reparameterizations (reference autoaugment.py:444-482)
# ---------------------------------------------------------------------------

def _rescale(level, max_val, param_max=10.0):
    return level * max_val / param_max


def _rescale_int(level, max_val, param_max=10.0):
    return jnp.trunc(_rescale(level, max_val, param_max))


# op table: name -> (op_fn, reparam_fn) ; reparam takes (level, ctx) where ctx
# carries translate / cutout maxima
_REPARAM = {
    "ShearX": lambda m, ctx: _rescale(m, 0.3),
    "ShearY": lambda m, ctx: _rescale(m, 0.3),
    "TranslateX": lambda m, ctx: _rescale_int(m, ctx["translate"]),
    "TranslateY": lambda m, ctx: _rescale_int(m, ctx["translate"]),
    "Rotate": lambda m, ctx: _rescale_int(m, 30),
    "Solarize": lambda m, ctx: _rescale_int(m, 256),
    "SolarizeIncreasing": lambda m, ctx: 256 - _rescale_int(m, 256),
    "Posterize": lambda m, ctx: _rescale_int(m, 4),
    "PosterizeIncreasing": lambda m, ctx: 4 - _rescale_int(m, 4),
    "Color": lambda m, ctx: _rescale(m, 1.8) + 0.1,
    "Contrast": lambda m, ctx: _rescale(m, 1.8) + 0.1,
    "Brightness": lambda m, ctx: _rescale(m, 1.8) + 0.1,
    "Sharpness": lambda m, ctx: _rescale(m, 1.8) + 0.1,
    "Invert": None,
    "AutoContrast": None,
    "Equalize": None,
    "Cutout": lambda m, ctx: _rescale_int(m, ctx["cutout"]),
    "SolarizeAdd": lambda m, ctx: _rescale_int(m, 110),
}

_OPS = {
    "ShearX": shear_x_op,
    "ShearY": shear_y_op,
    "TranslateX": translate_x_op,
    "TranslateY": translate_y_op,
    "Rotate": rotate_op,
    "Solarize": solarize_op,
    "SolarizeIncreasing": solarize_op,
    "Posterize": posterize_op,
    "PosterizeIncreasing": posterize_op,
    "Color": color_op,
    "Contrast": contrast_op,
    "Brightness": brightness_op,
    "Sharpness": sharpness_op,
    "Invert": invert_op,
    "AutoContrast": autocontrast_op,
    "Equalize": equalize_op,
    "Cutout": cutout_op,
    "SolarizeAdd": solarize_add_op,
}

# RandAugment op lists (reference autoaugment.py:600-620)
RANDAUGMENT_OPS = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "Color", "Contrast", "Brightness", "Sharpness", "ShearX", "ShearY",
    "TranslateX", "TranslateY", "Cutout", "SolarizeAdd",
)
RANDAUGMENT_OPS_INCREASING = (
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "Color", "Contrast", "Brightness", "Sharpness",
    "ShearX", "ShearY", "TranslateX", "TranslateY", "Cutout", "SolarizeAdd",
)


def apply_named_op(name: str, img, level, key, translate: int = 100, cutout: int = 40):
    """Apply one op by name at RandAugment level (0-10 scale)."""
    ctx = {"translate": float(translate), "cutout": float(cutout)}
    reparam = _REPARAM[name]
    mag = reparam(jnp.asarray(level, jnp.float32), ctx) if reparam else jnp.float32(0)
    return _OPS[name](img, mag, key)


def _reparam_mags(op_idx, levels, ops, ctx):
    """Per-sample reparameterized magnitude for each sample's own op —
    a vmapped switch over the SCALAR reparam functions (cheap selects)."""

    def branch(name):
        reparam = _REPARAM[name]
        return (lambda lvl: reparam(lvl, ctx)) if reparam else (lambda lvl: jnp.float32(0))

    branches = [branch(n) for n in ops]
    return jax.vmap(lambda i, l: jax.lax.switch(i, branches, l))(op_idx, levels)


def _histogram_batch(images):
    """[B,H,W,3] → [B,3,256] histograms by compare-reduce — NO scatter.

    ``.at[idx].add`` histograms vmapped over the batch are pathologically
    slow on TPU (~24x slower, measured); a broadcast compare + reduction
    streams at HBM bandwidth instead.
    """
    idx = images.astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    return jnp.sum(idx[..., None] == bins, axis=(1, 2)).astype(jnp.int32)


def _autocontrast_lut(hist):
    """[B,3,256] histograms → PIL autocontrast LUTs (cutoff 0), batched
    (same integer math as autocontrast_op)."""
    nz = hist > 0
    any_nz = nz.any(-1)
    lo = jnp.argmax(nz, axis=-1)
    hi = 255 - jnp.argmax(nz[..., ::-1], axis=-1)
    scale = 255.0 / jnp.maximum(hi - lo, 1).astype(jnp.float32)
    i = jnp.arange(256, dtype=jnp.float32)
    lut = jnp.clip(jnp.trunc(i * scale[..., None] - (lo.astype(jnp.float32)
                                                     * scale)[..., None]), 0, 255)
    identity = jnp.broadcast_to(i, lut.shape)
    return jnp.where(((hi > lo) & any_nz)[..., None], lut, identity)


def _equalize_lut(hist):
    """[B,3,256] histograms → PIL equalize LUTs, batched (same integer math
    as equalize_op)."""
    nz = hist > 0
    n_nonzero = nz.sum(-1)
    last_idx = 255 - jnp.argmax(nz[..., ::-1], axis=-1)
    last_val = jnp.take_along_axis(hist, last_idx[..., None], axis=-1)[..., 0]
    step = (hist.sum(-1) - last_val) // 255
    cum = jnp.concatenate(
        [jnp.zeros(hist.shape[:-1] + (1,), jnp.int32),
         jnp.cumsum(hist, axis=-1)[..., :-1]], axis=-1)
    n = (step // 2)[..., None] + cum
    lut = jnp.where(step[..., None] > 0,
                    n // jnp.maximum(step, 1)[..., None], 0)
    identity = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), lut.shape)
    lut = jnp.where(((n_nonzero > 1) & (step > 0))[..., None],
                    jnp.clip(lut, 0, 255), identity)
    return lut.astype(jnp.float32)


def _xshift_pass(imgs, shift_rows):
    """out[b,y,x] = imgs[b,y,x+shift_rows[b,y]] with FILL outside — PIL's
    NEAREST affine for a=e=1, d=0 ops (ShearX/TranslateX) as a ONE-HOT
    MATMUL: the MXU runs the selection ~5x faster than take_along_axis and
    ~13x faster than a general 2-D gather (measured on v5e, PERF.md).
    Exact: the 0/1 selection and integer-valued pixels (augmentation inputs
    are uint8-domain; PIL-blend mixes truncate) are bf16-representable, and
    each output accumulates exactly one product in f32."""
    b, h, w, _ = imgs.shape
    xs = jnp.arange(w, dtype=jnp.int32)
    sx = xs[None, None, :] + shift_rows[:, :, None]          # [B,H,W]
    valid = (sx >= 0) & (sx < w)
    sel = (jnp.clip(sx, 0, w - 1)[..., None] == xs).astype(jnp.bfloat16)
    out = jnp.einsum("byxu,byuc->byxc", sel, imgs.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return jnp.where(valid[..., None], out, FILL)


def _yshift_pass(imgs, shift_cols):
    """out[b,y,x] = imgs[b,y+shift_cols[b,x],x] (ShearY/TranslateY) — see
    _xshift_pass for the one-hot-matmul rationale."""
    b, h, w, _ = imgs.shape
    ys = jnp.arange(h, dtype=jnp.int32)
    sy = ys[None, :, None] + shift_cols[:, None, :]          # [B,H,W]
    valid = (sy >= 0) & (sy < h)
    sel = (jnp.clip(sy, 0, h - 1)[..., None] == ys).astype(jnp.bfloat16)
    out = jnp.einsum("byxu,buxc->byxc", sel, imgs.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return jnp.where(valid[..., None], out, FILL)


def _apply_lut_batch(imgs, luts):
    """Per-sample per-channel LUT via one-hot matmul ([B,H,W,3] × [B,3,256])
    — ~9x faster than the vmapped gather on v5e; exact (one product per
    output, LUT values 0..255 are bf16-representable, f32 accumulate)."""
    idx = imgs.astype(jnp.int32)
    oh = (idx[..., None] == jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
    return jnp.einsum("bhwcv,bcv->bhwc", oh, luts.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def _apply_ops_grouped(imgs, op_idx, mags, keys, ops, active=None):
    """Apply ``ops[op_idx[i]]`` at magnitude ``mags[i]`` to ``imgs[i]``.

    FAMILY-GROUPED evaluation: a vmapped ``lax.switch`` evaluates every
    branch for every sample (measured 1.28 s per 64-image RandAugment batch
    — 50 img/s, hopeless next to a 3,500 img/s train step).  Instead, each
    expensive primitive runs ONCE over the whole batch — one x-shift pass,
    one y-shift pass, one rotate gather, one compare-reduce histogram + one
    LUT pass, one blend — and per-sample results are selected by op id.
    Per-op math and RNG consumption are bit-identical to the standalone op
    functions (equivalence-tested).
    """
    b, h, w, _ = imgs.shape
    pos = {name: j for j, name in enumerate(ops)}

    def is_op(*names):
        m = jnp.zeros((b,), bool)
        for n in names:
            if n in pos:
                m = m | (op_idx == pos[n])
        return m

    def has(*names):
        return any(n in pos for n in names)

    if active is not None:
        gate = active

        def is_sel(*names):
            return is_op(*names) & gate
    else:
        is_sel = is_op

    result = imgs
    fmask = lambda m: m[:, None, None, None]

    # every affine op draws sign = bernoulli(key) from the full per-sample key
    signs = jax.vmap(lambda k: jnp.where(jax.random.bernoulli(k), 1.0, -1.0))(keys)

    # ---- x-shift family (ShearX, TranslateX): per-row integer shift ----
    if has("ShearX", "TranslateX"):
        bcoef = jnp.where(is_op("ShearX"), signs * mags, 0.0)      # [B]
        ccoef = jnp.where(is_op("TranslateX"), signs * mags, 0.0)
        ys = jnp.arange(h, dtype=jnp.float32) + 0.5
        shift = jnp.floor(0.5 + bcoef[:, None] * ys[None, :]
                          + ccoef[:, None] - _FIX_EPS).astype(jnp.int32)
        xres = _xshift_pass(imgs, shift)
        result = jnp.where(fmask(is_sel("ShearX", "TranslateX")), xres, result)

    # ---- y-shift family (ShearY, TranslateY): per-column integer shift ----
    if has("ShearY", "TranslateY"):
        dcoef = jnp.where(is_op("ShearY"), signs * mags, 0.0)
        fcoef = jnp.where(is_op("TranslateY"), signs * mags, 0.0)
        xs = jnp.arange(w, dtype=jnp.float32) + 0.5
        shift = jnp.floor(0.5 + dcoef[:, None] * xs[None, :]
                          + fcoef[:, None] - _FIX_EPS).astype(jnp.int32)
        yres = _yshift_pass(imgs, shift)
        result = jnp.where(fmask(is_sel("ShearY", "TranslateY")), yres, result)

    # ---- rotate (the one remaining general 2-D gather) ----
    if has("Rotate"):
        angle = jnp.where(is_op("Rotate"), signs * mags, 0.0)

        def rot(img, deg):
            a_ = -jnp.deg2rad(deg)
            cx, cy = w / 2.0, h / 2.0
            cos, sin = jnp.cos(a_), jnp.sin(a_)
            cc = cx - (cos * cx + sin * cy)
            ff = cy - (-sin * cx + cos * cy)
            return _affine_nearest(img, cos, sin, cc, -sin, cos, ff)

        rres = jax.vmap(rot)(imgs, angle)
        result = jnp.where(fmask(is_sel("Rotate")), rres, result)

    # ---- histogram-LUT family (AutoContrast, Equalize) ----
    if has("AutoContrast", "Equalize"):
        hist = _histogram_batch(imgs)                   # [B,3,256]
        identity = jnp.broadcast_to(
            jnp.arange(256, dtype=jnp.float32), hist.shape)
        lut = identity
        if has("AutoContrast"):
            lut = jnp.where(is_op("AutoContrast")[:, None, None],
                            _autocontrast_lut(hist), lut)
        if has("Equalize"):
            lut = jnp.where(is_op("Equalize")[:, None, None],
                            _equalize_lut(hist), lut)
        lres = _apply_lut_batch(imgs, lut)
        result = jnp.where(fmask(is_sel("AutoContrast", "Equalize")), lres, result)

    # ---- elementwise integer ops ----
    if has("Invert"):
        result = jnp.where(fmask(is_sel("Invert")), 255.0 - imgs, result)
    if has("Posterize", "PosterizeIncreasing"):
        bits = mags.astype(jnp.int32)[:, None, None, None]
        shiftv = 8 - bits
        vals = imgs.astype(jnp.int32)
        pres = jnp.where(shiftv >= 8, 0, (vals >> shiftv) << shiftv).astype(jnp.float32)
        result = jnp.where(fmask(is_sel("Posterize", "PosterizeIncreasing")),
                           pres, result)
    if has("Solarize", "SolarizeIncreasing"):
        m4 = mags[:, None, None, None]
        sres = jnp.where(imgs < m4, imgs, 255.0 - imgs)
        result = jnp.where(fmask(is_sel("Solarize", "SolarizeIncreasing")),
                           sres, result)
    if has("SolarizeAdd"):
        m4 = mags[:, None, None, None]
        added = jnp.minimum(255.0, imgs + m4)
        sares = jnp.where(imgs < 128.0, added, imgs)
        result = jnp.where(fmask(is_sel("SolarizeAdd")), sares, result)

    # ---- blend family (Color, Contrast, Brightness, Sharpness) ----
    blend_ops = [n for n in ("Color", "Contrast", "Brightness", "Sharpness")
                 if n in pos]
    if blend_ops:
        gray = _gray_l(imgs)                             # [B,H,W]
        degenerate = imgs
        if "Brightness" in pos:
            degenerate = jnp.where(fmask(is_op("Brightness")),
                                   jnp.zeros_like(imgs), degenerate)
        if "Color" in pos:
            degenerate = jnp.where(fmask(is_op("Color")),
                                   jnp.broadcast_to(gray[..., None], imgs.shape),
                                   degenerate)
        if "Contrast" in pos:
            mean = jnp.floor(jnp.mean(gray, axis=(1, 2)) + 0.5)
            degenerate = jnp.where(fmask(is_op("Contrast")),
                                   mean[:, None, None, None] * jnp.ones_like(imgs),
                                   degenerate)
        if "Sharpness" in pos:
            kernel = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0],
                                  [1.0, 1.0, 1.0]]) / 13.0
            smoothed = jax.lax.conv_general_dilated(
                imgs.transpose(0, 3, 1, 2).reshape(b * 3, 1, h, w),
                kernel[None, None], window_strides=(1, 1), padding="VALID",
            ).reshape(b, 3, h - 2, w - 2).transpose(0, 2, 3, 1)
            smoothed = jnp.floor(smoothed + 0.5)
            sharp_deg = imgs.at[:, 1:-1, 1:-1].set(_clip8(smoothed))
            degenerate = jnp.where(fmask(is_op("Sharpness")), sharp_deg, degenerate)
        factor = jnp.where(is_op(*blend_ops), mags, 1.0)[:, None, None, None]
        bres = _blend(degenerate, imgs, factor)
        result = jnp.where(fmask(is_sel(*blend_ops)), bres, result)

    # ---- cutout ----
    if has("Cutout"):
        def cut(img, mag, key):
            kx, ky = jax.random.split(key)
            cx = jnp.floor(jax.random.uniform(kx) * w)
            cy = jnp.floor(jax.random.uniform(ky) * h)
            x0 = jnp.maximum(0.0, cx - mag)
            x1 = w - jnp.maximum(0.0, w - cx - mag) - 1.0
            y0 = jnp.maximum(0.0, cy - mag)
            y1 = h - jnp.maximum(0.0, h - cy - mag) - 1.0
            ysg, xsg = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                    jnp.arange(w, dtype=jnp.float32), indexing="ij")
            inside = (xsg >= x0) & (xsg <= x1) & (ysg >= y0) & (ysg <= y1)
            return jnp.where(inside[..., None], FILL, img)

        cres = jax.vmap(cut)(imgs, mags, keys)
        result = jnp.where(fmask(is_sel("Cutout")), cres, result)

    return result


def randaugment(
    key: jax.Array,
    images: jax.Array,  # float32 [B,H,W,3] in [0,255]
    n_augment: int,
    magnitude: float,
    translate: int = 100,
    cutout: int = 40,
    increasing: bool = False,
    magnitude_std: float = 0.0,
) -> jax.Array:
    """Batched per-sample RandAugment (reference autoaugment.py:586-678).

    Per sample and per layer: one of the 16 ops (15 when ``cutout == 0``) is
    drawn uniformly with replacement and applied; magnitude gets optional
    gaussian jitter.  Evaluation is FAMILY-GROUPED (see _apply_ops_grouped) —
    measured 50 → ~600+ img/s on v5e vs the naive vmapped-switch form.
    """
    ops = list(RANDAUGMENT_OPS_INCREASING if increasing else RANDAUGMENT_OPS)
    if cutout == 0:
        ops.remove("Cutout")
    ctx = {"translate": float(translate), "cutout": float(cutout)}

    b = images.shape[0]
    out = images
    for layer in range(n_augment):
        lkey = jax.random.fold_in(key, layer)
        k_idx, k_mag, k_op = jax.random.split(lkey, 3)
        idx = jax.random.randint(k_idx, (b,), 0, len(ops))
        if magnitude_std > 0:
            level = magnitude + magnitude_std * jax.random.normal(k_mag, (b,))
        else:
            level = jnp.full((b,), magnitude, jnp.float32)
        op_keys = jax.random.split(k_op, b)
        mags = _reparam_mags(idx, level.astype(jnp.float32), ops, ctx)
        out = _apply_ops_grouped(out, idx, mags, op_keys, ops)
    return out


AUTOAUGMENT_POLICY = (
    (("PosterizeIncreasing", 0.4, 8), ("Rotate", 0.6, 9)),
    (("SolarizeIncreasing", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
    (("PosterizeIncreasing", 0.6, 7), ("PosterizeIncreasing", 0.6, 6)),
    (("Equalize", 0.4, 7), ("SolarizeIncreasing", 0.2, 4)),
    (("Equalize", 0.4, 4), ("Rotate", 0.8, 8)),
    (("SolarizeIncreasing", 0.6, 3), ("Equalize", 0.6, 7)),
    (("PosterizeIncreasing", 0.8, 5), ("Equalize", 1.0, 2)),
    (("Rotate", 0.2, 3), ("SolarizeIncreasing", 0.6, 8)),
    (("Equalize", 0.6, 8), ("PosterizeIncreasing", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, 2)),
    (("Equalize", 0.0, 7), ("Equalize", 0.8, 8)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 0)),
    (("Color", 0.8, 8), ("SolarizeIncreasing", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, 8)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, 9)),
    (("Color", 0.4, 0), ("Equalize", 0.6, 3)),
    (("Equalize", 0.4, 7), ("SolarizeIncreasing", 0.2, 4)),
    (("SolarizeIncreasing", 0.6, 5), ("AutoContrast", 0.6, 5)),
    (("Invert", 0.6, 4), ("Equalize", 1.0, 8)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, 8), ("Equalize", 0.6, 3)),
)


def autoaugment(key: jax.Array, images: jax.Array,
                translate: int = 100, cutout: int = 40) -> jax.Array:
    """Batched AutoAugment: per sample, one random sub-policy; each of its two
    ops applied with its probability (reference autoaugment.py:557-583).
    Family-grouped like randaugment — the 25 policies reduce to static
    (op, prob, level) tables indexed per sample."""
    ctx = {"translate": float(translate), "cutout": float(cutout)}
    n_policy = len(AUTOAUGMENT_POLICY)
    ops = sorted({name for policy in AUTOAUGMENT_POLICY for name, _, _ in policy})
    pos = {name: j for j, name in enumerate(ops)}

    import numpy as _np

    op_table = _np.asarray([[pos[policy[s][0]] for policy in AUTOAUGMENT_POLICY]
                            for s in range(2)])         # [2, 25]
    prob_table = _np.asarray([[policy[s][1] for policy in AUTOAUGMENT_POLICY]
                              for s in range(2)], _np.float32)
    level_table = _np.asarray([[policy[s][2] for policy in AUTOAUGMENT_POLICY]
                               for s in range(2)], _np.float32)

    b = images.shape[0]
    k_idx, k_ops = jax.random.split(key)
    pidx = jax.random.randint(k_idx, (b,), 0, n_policy)
    keys = jax.random.split(k_ops, b)

    out = images
    k = keys
    for step in range(2):
        # per-sample RNG exactly as the per-policy runner consumed it:
        # k_gate, k_op, k = split(fold_in(k, step), 3)
        folded = jax.vmap(lambda kk: jax.random.fold_in(kk, step))(k)
        splits = jax.vmap(lambda kk: jax.random.split(kk, 3))(folded)
        k_gate, k_op, k = splits[:, 0], splits[:, 1], splits[:, 2]

        idx = jnp.asarray(op_table[step])[pidx]
        prob = jnp.asarray(prob_table[step])[pidx]
        level = jnp.asarray(level_table[step])[pidx]
        gate = jax.vmap(jax.random.uniform)(k_gate) < prob
        mags = _reparam_mags(idx, level, ops, ctx)
        out = _apply_ops_grouped(out, idx, mags, k_op, ops, active=gate)
    return out
