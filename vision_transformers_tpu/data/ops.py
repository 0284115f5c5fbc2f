"""Batched on-device input ops: flip, normalize, mixup/cutmix, random erasing,
DINO color augmentations.

TPU-native redesign of the reference's per-sample CPU stack: everything here
operates on a whole [B,H,W,3] batch inside one jit, keyed by PRNG — the
dataloader worker processes of the reference (factory.py:263-278) become a
single fused device program.

Semantics ported:
- Mixup/CutMix (reference mix_dataset.py): index-parity alternation when both
  enabled (:54-59), beta-sampled ratio, ``rand_bbox`` geometry (:10-24),
  cutmix ratio recomputed from the clipped box (:80-85).  The reference draws
  the partner from the whole dataset (:44-49); here it is an in-batch
  permutation — the standard batch-level formulation (mixup paper §2), same
  marginal distribution once the batch is shuffled.
- RandomErasing (reference transforms.py:309-418, timm-derived): "pixel"
  mode per-pixel normal fill, up-to-10 geometry attempts, area/log-aspect
  sampling, applied after normalization.
- DINO ops (reference transforms.py:216-294): ColorJitter
  (brightness/contrast/saturation/hue), random grayscale, gaussian blur with
  uniform radius, tensor-level solarize.

IMAGENET_MEAN/STD match the reference (factory.py:163-165).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

__all__ = [
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "normalize",
    "random_hflip",
    "mix_batch",
    "random_erasing",
    "color_jitter",
    "random_grayscale",
    "gaussian_blur",
    "random_solarize",
]


def normalize(images: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    """uint8/float [0,255] → normalized float32 (ToTensor + Normalize)."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def random_hflip(key: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    flip = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1], images)


# ---------------------------------------------------------------------------
# Mixup / CutMix (reference mix_dataset.py)
# ---------------------------------------------------------------------------

def _rand_bbox(key, w: int, h: int, ratio):
    """(reference mix_dataset.py:10-24); returns x1, y1, x2, y2."""
    r = jnp.sqrt(1.0 - ratio)
    cut_w = jnp.floor(w * r)
    cut_h = jnp.floor(h * r)
    kx, ky = jax.random.split(key)
    cx = jax.random.randint(kx, (), 0, w).astype(jnp.float32)
    cy = jax.random.randint(ky, (), 0, h).astype(jnp.float32)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    return x1, y1, x2, y2


def mix_batch(
    key: jax.Array,
    images: jax.Array,   # [B,H,W,3] float (0..255 pre-aug, or normalized)
    labels: jax.Array,   # [B]
    mixup: float = 0.0,
    cutmix: float = 0.0,
    quantize: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (mixed_images, label1, label2, ratio) — the MixDataset tuple.

    Index-parity alternation (reference :54-59): with both enabled, even
    indices get cutmix disabled (mixup), odd get mixup disabled (cutmix).

    ``quantize`` reproduces the reference's PIL path semantics when mixing
    runs BEFORE augmentation (mix_dataset.py:68: ``Image.blend`` outputs
    uint8 with C truncation) — the mixed image stays integer-valued, which
    the on-device PIL-exact augment ops rely on.  Leave False for the
    post-augmentation tensor path (mix_dataset.py:65: ``mul/add_``, no
    rounding).
    """
    b, h, w, _ = images.shape
    if mixup <= 0 and cutmix <= 0:
        return images, labels, labels, jnp.ones((b,), jnp.float32)

    k_perm, k_beta, k_uni, k_box = jax.random.split(key, 4)
    # partner = random NONZERO cyclic shift of the (epoch-shuffled) batch:
    # uniform over the other batch members with zero self-pairing.  The
    # reference draws partners uniformly from the whole dataset
    # (mix_dataset.py:44-49, self-pairing prob 1/N); marginalized over the
    # epoch shuffle this matches it (tested:
    # test_mix_batch_partner_distribution_matches_whole_dataset_draw)
    shift = jax.random.randint(k_perm, (), 1, b) if b > 1 else jnp.zeros((), jnp.int32)
    partner = jnp.roll(images, shift, axis=0)
    label2 = jnp.roll(labels, shift, axis=0)

    idx = jnp.arange(b)
    if mixup > 0 and cutmix > 0:
        use_mixup = idx % 2 == 0
    elif mixup > 0:
        use_mixup = jnp.ones((b,), bool)
    else:
        use_mixup = jnp.zeros((b,), bool)

    # mixup: ratio ~ Beta(a, a); img = ratio*img1 + (1-ratio)*img2 (:60-69)
    mix_ratio = jax.random.beta(k_beta, max(mixup, 1e-6), max(mixup, 1e-6), (b,))
    if quantize:
        # PIL Image.blend(img1, img2, alpha=1-ratio): img1 + alpha*(img2-img1)
        # truncated to uint8 (verified against PIL)
        alpha = (1.0 - mix_ratio)[:, None, None, None]
        mixed = jnp.trunc(images + alpha * (partner - images))
    else:
        mixed = images * mix_ratio[:, None, None, None] + \
            partner * (1.0 - mix_ratio)[:, None, None, None]

    # cutmix: ratio uniform when cutmix==1 else Beta (:71-76); box pasted,
    # ratio recomputed from clipped box area (:80-85)
    if cutmix == 1:
        cut_ratio = jax.random.uniform(k_uni, (b,))
    else:
        cut_ratio = jax.random.beta(k_beta, max(cutmix, 1e-6), max(cutmix, 1e-6), (b,))

    def one_cutmix(img1, img2, r, k):
        x1, y1, x2, y2 = _rand_bbox(k, w, h, r)
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        inside = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
        out = jnp.where(inside[..., None], img2, img1)
        area = (x2 - x1) * (y2 - y1)
        return out, 1.0 - area / (h * w)

    cut_imgs, cut_ratios = jax.vmap(one_cutmix)(
        images, partner, cut_ratio, jax.random.split(k_box, b)
    )

    out = jnp.where(use_mixup[:, None, None, None], mixed, cut_imgs)
    ratio = jnp.where(use_mixup, mix_ratio, cut_ratios).astype(jnp.float32)
    return out, labels, label2, ratio


# ---------------------------------------------------------------------------
# Random erasing (reference transforms.py:309-418; timm "pixel" mode)
# ---------------------------------------------------------------------------

def random_erasing(
    key: jax.Array,
    images: jax.Array,  # [B,H,W,C] normalized floats
    p: float = 0.5,
    min_area: float = 0.02,
    max_area: float = 1 / 3,
    min_aspect: float = 0.3,
    mode: str = "pixel",
    attempts: int = 10,
) -> jax.Array:
    b, h, w, c = images.shape
    log_lo, log_hi = math.log(min_aspect), math.log(1.0 / min_aspect)

    def one(img, k):
        k_gate, k_noise, k_geom = jax.random.split(k, 3)

        def try_geom(kk):
            ka, kr, kt, kl = jax.random.split(kk, 4)
            target = jax.random.uniform(ka, (), minval=min_area, maxval=max_area) * h * w
            aspect = jnp.exp(jax.random.uniform(kr, (), minval=log_lo, maxval=log_hi))
            eh = jnp.round(jnp.sqrt(target * aspect)).astype(jnp.int32)
            ew = jnp.round(jnp.sqrt(target / aspect)).astype(jnp.int32)
            ok = (ew < w) & (eh < h)
            top = jax.random.randint(kt, (), 0, jnp.maximum(h - eh, 1))
            left = jax.random.randint(kl, (), 0, jnp.maximum(w - ew, 1))
            return ok, top, left, eh, ew

        # first valid of `attempts` draws (reference's retry loop :390-407)
        def body(carry, i):
            found, top, left, eh, ew = carry
            ok, t, l, hh, ww = try_geom(jax.random.fold_in(k_geom, i))
            take = ok & ~found
            carry = (
                found | ok,
                jnp.where(take, t, top), jnp.where(take, l, left),
                jnp.where(take, hh, eh), jnp.where(take, ww, ew),
            )
            return carry, None

        init = (jnp.asarray(False), jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0))
        (found, top, left, eh, ew), _ = jax.lax.scan(body, init, jnp.arange(attempts))

        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        inside = (ys >= top) & (ys < top + eh) & (xs >= left) & (xs < left + ew)
        if mode == "pixel":
            fill = jax.random.normal(k_noise, img.shape, img.dtype)
        elif mode == "rand":
            fill = jnp.broadcast_to(jax.random.normal(k_noise, (1, 1, c), img.dtype),
                                    img.shape)
        else:
            fill = jnp.zeros_like(img)
        apply = jax.random.bernoulli(k_gate, p) & found
        return jnp.where(apply & inside[..., None], fill, img)

    return jax.vmap(one)(images, jax.random.split(key, b))


# ---------------------------------------------------------------------------
# DINO color ops (reference transforms.py:216-294)
# ---------------------------------------------------------------------------

def _rgb_to_gray(img):
    return (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114)


def color_jitter(key, images, brightness=0.4, contrast=0.4, saturation=0.2,
                 hue=0.1, p=0.8):
    """torchvision-style ColorJitter on float [0,1] images, random op order,
    applied with probability p per sample."""
    b = images.shape[0]

    def one(img, k):
        k_gate, k_b, k_c, k_s, k_h, k_ord = jax.random.split(k, 6)
        fb = jax.random.uniform(k_b, (), minval=1 - brightness, maxval=1 + brightness)
        fc = jax.random.uniform(k_c, (), minval=1 - contrast, maxval=1 + contrast)
        fs = jax.random.uniform(k_s, (), minval=1 - saturation, maxval=1 + saturation)
        fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)

        def adj_brightness(x):
            return jnp.clip(x * fb, 0.0, 1.0)

        def adj_contrast(x):
            mean = jnp.mean(_rgb_to_gray(x))
            return jnp.clip(mean + fc * (x - mean), 0.0, 1.0)

        def adj_saturation(x):
            g = _rgb_to_gray(x)[..., None]
            return jnp.clip(g + fs * (x - g), 0.0, 1.0)

        def adj_hue(x):
            # rotate hue via YIQ (cheap, differentiable-friendly)
            y = _rgb_to_gray(x)
            i = 0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2]
            q = 0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2]
            theta = 2.0 * jnp.pi * fh
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            i2 = cos * i - sin * q
            q2 = sin * i + cos * q
            r = y + 0.956 * i2 + 0.621 * q2
            g = y - 0.272 * i2 - 0.647 * q2
            bl = y - 1.106 * i2 + 1.703 * q2
            return jnp.clip(jnp.stack([r, g, bl], -1), 0.0, 1.0)

        ops = [adj_brightness, adj_contrast, adj_saturation, adj_hue]
        order = jax.random.permutation(k_ord, 4)
        out = img
        for slot in range(4):
            out = jax.lax.switch(order[slot], ops, out)
        return jnp.where(jax.random.bernoulli(k_gate, p), out, img)

    return jax.vmap(one)(images, jax.random.split(key, b))


def random_grayscale(key, images, p=0.2):
    gray = _rgb_to_gray(images)[..., None]
    gray = jnp.broadcast_to(gray, images.shape)
    take = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(take[:, None, None, None], gray, images)


def gaussian_blur(key, images, p=0.5, radius_min=0.1, radius_max=2.0):
    """PIL-style gaussian blur with per-sample uniform radius
    (reference transforms.py:202-213, ``ImageFilter.GaussianBlur``).

    Fidelity vs PIL (quantified in tests/test_dino_blur_fidelity.py): PIL's
    filter approximates the gaussian with 3 box-blur passes; this uses the
    true separable gaussian at sigma=radius with the same EDGE-EXTEND
    boundary (PIL extends border pixels — zero padding would darken edges by
    up to ~50% at corners).  Measured gap on random uint8 images over the
    DINO radius range [0.1, 2]: mean |diff| < 1 gray level, interior pixels
    well under 2.
    """
    b, h, w, c = images.shape
    kmax = int(math.ceil(radius_max * 3)) * 2 + 1
    half = kmax // 2
    offsets = jnp.arange(-half, half + 1, dtype=jnp.float32)

    def one(img, k):
        k_gate, k_r = jax.random.split(k)
        radius = jax.random.uniform(k_r, (), minval=radius_min, maxval=radius_max)
        sigma = jnp.maximum(radius, 1e-3)
        kern = jnp.exp(-0.5 * (offsets / sigma) ** 2)
        kern = kern / kern.sum()
        # separable conv on [C,1,H,W] over edge-extended padding (PIL
        # semantics: border pixels replicate outward)
        x = img.transpose(2, 0, 1)[:, None]
        x = jnp.pad(x, ((0, 0), (0, 0), (half, half), (half, half)), mode="edge")
        kv = kern.reshape(1, 1, kmax, 1)
        kh = kern.reshape(1, 1, 1, kmax)
        x = jax.lax.conv_general_dilated(x, kv, (1, 1), [(0, 0), (0, 0)])
        x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(0, 0), (0, 0)])
        blurred = x[:, 0].transpose(1, 2, 0)
        return jnp.where(jax.random.bernoulli(k_gate, p), blurred, img)

    return jax.vmap(one)(images, jax.random.split(key, b))


def random_solarize(key, images, threshold=0.5, p=0.2):
    """Tensor solarize on [0,1] images (reference Solarize with threshold 128)."""
    sol = jnp.where(images < threshold, images, 1.0 - images)
    take = jax.random.bernoulli(key, p, (images.shape[0],))
    return jnp.where(take[:, None, None, None], sol, images)


# AlexNet-style PCA lighting constants (reference transforms.py:17-22)
IMAGENET_EIGVAL = (0.2175, 0.0188, 0.0045)
IMAGENET_EIGVEC = (
    (-0.5675, 0.7192, 0.4009),
    (-0.5808, -0.0045, -0.8140),
    (-0.5836, -0.6948, 0.4203),
)


def lighting(key, images, alpha_std: float,
             eigval=IMAGENET_EIGVAL, eigvec=IMAGENET_EIGVEC):
    """PCA color jitter (reference transforms.py:68-88): per-sample normal
    alphas along the RGB eigenbasis, added to the (tensor-scale) image."""
    b = images.shape[0]
    alpha = jax.random.normal(key, (b, 3)) * alpha_std
    ev = jnp.asarray(eigvec, jnp.float32) * jnp.asarray(eigval, jnp.float32)[None, :]
    rgb = alpha @ ev.T  # [b, 3]
    return images + rgb[:, None, None, :]
