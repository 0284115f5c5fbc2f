"""Host→device input pipeline.

Split of responsibilities (the idiomatic TPU layout, SURVEY §7 step 4):

- HOST (thread pool): record read → image decode → RandomResizedCrop /
  resize+center-crop → uint8 [B,H,W,3] numpy batches.  Decode and crop are
  inherently per-sample/variable-shape, so they stay on CPU threads that
  overlap with device compute via a prefetch queue.
- DEVICE (one jitted program): hflip → mixup/cutmix → RandAugment →
  normalize → RandomErasing, batched with per-sample PRNG (data/augment.py,
  data/ops.py).  Replaces the reference's dataloader-worker transform stack
  (factory.py:159-226).

Transform order mirrors the reference's ``mix_before_aug`` split
(factory.py:183-189): True → crop+flip, mix, randaug+normalize+erase;
False → crop+flip+randaug+normalize+erase, then mix on normalized tensors.
"""

from __future__ import annotations

import io
import math
import os
import queue
import random as pyrandom
import threading
from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from . import augment as A
from . import ops
from .records import RecordDataset

__all__ = [
    "HostLoader",
    "decode_random_resized_crop",
    "decode_valid",
    "make_device_augment",
    "make_valid_prep",
]

# VTX_FAST_DECODE=1: DCT-scaled decode when a train crop is >=2x the target
# — large throughput win, quality-neutral for training augmentation, but no
# longer bit-identical to the PIL path.  Same truthiness as VTX_NATIVE_DATA;
# parsed once (set it before import / process start).
_FAST_DECODE = os.environ.get("VTX_FAST_DECODE", "0") not in ("0", "", "false", "off")


def _pil_open(payload: bytes):
    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.convert("RGB")


def _rrc_box(w: int, h: int, rng: pyrandom.Random,
             scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop geometry → (left, top, cw, ch)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            return rng.randint(0, w - cw), rng.randint(0, h - ch), cw, ch
    # fallback: center crop of clamped aspect (torchvision behavior)
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def decode_random_resized_crop(payload: bytes, size: int, rng: pyrandom.Random,
                               scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop semantics, bicubic (factory.py:170).

    Uses the native (C++) decode+resample path when built — pixel-exact vs
    the PIL fallback (see data/native.py)."""
    from . import native

    if native.available():
        dims = native.jpeg_dims(payload)
        if dims is not None:
            w, h = dims
            left, top, cw, ch = _rrc_box(w, h, rng, scale, ratio)
            out = native.decode_crop_resize(payload, (left, top, cw, ch),
                                            (size, size), native.BICUBIC,
                                            fast=_FAST_DECODE)
            if out is not None:
                return out

    from PIL import Image

    img = _pil_open(payload)
    w, h = img.size
    left, top, cw, ch = _rrc_box(w, h, rng, scale, ratio)
    crop = img.resize((size, size), Image.BICUBIC,
                      box=(left, top, left + cw, top + ch))
    return np.asarray(crop, np.uint8)


def _valid_geometry(w: int, h: int, size: int):
    """Resize(size+32) shorter side + CenterCrop(size) geometry."""
    target = size + 32
    if w <= h:
        nw, nh = target, max(1, int(round(h * target / w)))
    else:
        nw, nh = max(1, int(round(w * target / h))), target
    left, top = (nw - size) // 2, (nh - size) // 2
    return nw, nh, left, top


def decode_valid(payload: bytes, size: int):
    """Resize(size+32, bicubic) + CenterCrop(size) (factory.py:217-224).

    The native path fuses the two PIL stages (resize whole image, crop the
    result) into ONE region-restricted decode: the center crop's window is
    mapped back to sub-pixel source coordinates and only that region is
    decoded + resampled — bit-identical because the resample centers and
    filter scale coincide column-for-column with the full resize's."""
    from . import native

    if native.available():
        dims = native.jpeg_dims(payload)
        if dims is not None:
            w, h = dims
            nw, nh, left, top = _valid_geometry(w, h, size)
            fbox = (left * w / nw, top * h / nh,
                    (left + size) * w / nw, (top + size) * h / nh)
            out = native.decode_fbox_resize(payload, fbox, (size, size),
                                            native.BICUBIC)
            if out is not None:
                return out

    from PIL import Image

    img = _pil_open(payload)
    w, h = img.size
    nw, nh, left, top = _valid_geometry(w, h, size)
    img = img.resize((nw, nh), Image.BICUBIC)
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img, np.uint8)


class HostLoader:
    """Threaded prefetching batch loader over a RecordDataset.

    Equivalent of the reference's DataLoader + DistributedSampler
    (factory.py:263-278): per-epoch deterministic shuffle, per-process shard,
    drop_last, worker threads that decode+crop, a bounded prefetch queue.

    ``batch_size`` is the GLOBAL batch (the conf value).  Each process loads
    only its ``batch_size / shard_count`` rows from its index shard — the
    reference's per-rank ``batch // world_size`` split (factory.py:264) —
    and ``parallel.mesh.shard_batch`` assembles the global array.  ``len``
    therefore counts global optimizer steps per epoch on every process.
    """

    def __init__(
        self,
        dataset: RecordDataset,
        batch_size: int,
        image_size: int,
        train: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
        drop_last: bool = True,
        host_augment: Optional[dict] = None,
    ):
        """``host_augment`` (train only) selects the PIL loader-thread
        augmentation backend (reference factory.py:169-181 order): keys
        ``hflip`` (bool), ``mix`` ({mixup, cutmix} — pre-aug, PIL-blend
        semantics) and ``randaug`` (kwargs for host_augment.pil_randaugment).
        Emitted batches then carry ``label2``/``ratio``."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.image_size = image_size
        self.train = train
        self.host_augment = host_augment if train else None
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_index = jax.process_index() if shard_index is None else shard_index
        self.shard_count = jax.process_count() if shard_count is None else shard_count
        self.drop_last = drop_last
        if batch_size % self.shard_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by process count "
                f"{self.shard_count}")
        # per-process rows per step (reference factory.py:264)
        self.local_batch = batch_size // self.shard_count

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.train:
            rng = np.random.default_rng(self.seed + epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self.shard_index::self.shard_count]

    def __len__(self) -> int:
        # identical on every process: shards differ by at most one sample,
        # so floor/ceil over the local batch agrees across processes
        n = len(self.dataset) // self.shard_count
        if self.drop_last:
            return n // self.local_batch
        return (n + self.local_batch - 1) // self.local_batch

    def epoch(self, epoch: int = 0, skip: int = 0) -> Iterator[dict]:
        """``skip``: fast-forward past the first ``skip`` batches WITHOUT
        decoding them (exact mid-epoch resume) — per-sample rngs are keyed
        by absolute dataset index, so the remaining batches are identical
        to an unskipped epoch's."""
        indices = self._epoch_indices(epoch)
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        ha = self.host_augment

        def decode_one(i: int):
            label, payload = self.dataset.get(int(i))
            if self.train:
                rng = pyrandom.Random(hash((self.seed, epoch, int(i))))
                img = decode_random_resized_crop(payload, self.image_size, rng)
                if ha and ha.get("hflip") and rng.random() < 0.5:
                    img = img[:, ::-1]  # RandomHorizontalFlip after RRC
            else:
                img = decode_valid(payload, self.image_size)
            return img, label

        def host_randaug_one(args):
            i, img = args
            from . import host_augment as HA

            rng = pyrandom.Random(hash((self.seed, "ra", epoch, int(i))))
            return HA.pil_randaugment(img, rng, **ha["randaug"])

        error: list = []

        def producer():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(skip, n_batches):
                        if stop.is_set():
                            break
                        sel = indices[b * self.local_batch:(b + 1) * self.local_batch]
                        n_valid = len(sel)
                        if n_valid < self.local_batch and not self.drop_last:
                            # always emit full batches: ragged tails can't be
                            # sharded over the device mesh (and multi-process
                            # needs equal shapes on every host — torch's
                            # DistributedSampler wrap-pads the same way).
                            # ``n_valid`` lets the eval step zero-weight the
                            # padding so metrics stay exact.
                            pad = self.local_batch - n_valid
                            sel = np.concatenate([sel, indices[:pad]])
                        results = list(pool.map(decode_one, sel))
                        images = np.stack([r[0] for r in results])
                        labels = np.asarray([r[1] for r in results], np.int32)
                        batch_out = {"image": images, "label": labels,
                                     "n_valid": n_valid}
                        if ha:
                            from . import host_augment as HA

                            if ha.get("mix"):
                                rng_b = np.random.default_rng(
                                    hash((self.seed, "mix", epoch, b)) & 0x7FFFFFFF)
                                images, l1, l2, ratio = HA.mix_host_batch(
                                    images, labels, ha["mix"].get("mixup", 0.0),
                                    ha["mix"].get("cutmix", 0.0), rng_b)
                                batch_out.update(image=images, label=l1,
                                                 label2=l2, ratio=ratio)
                            if ha.get("randaug"):
                                images = np.stack(list(pool.map(
                                    host_randaug_one, zip(sel, images))))
                                batch_out["image"] = images
                        out_q.put(batch_out)
            except BaseException as e:  # surface worker failures to the consumer
                error.append(e)
            finally:
                out_q.put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                yield item
            if error:
                raise error[0]
        finally:
            stop.set()


def make_device_augment(
    train_size: int,
    randaug_layer: int = 0,
    randaug_magnitude: float = 9.0,
    randaug_increasing: bool = False,
    randaug_magnitude_std: float = 0.0,
    randaug_cutout: int = 40,
    erasing: float = 0.0,
    mixup: float = 0.0,
    cutmix: float = 0.0,
    mix_before_aug: bool = True,
):
    """Build the jitted device-side augmentation fn:
    (key, uint8 images, labels) → train-step batch dict."""

    def augment_fn(key, images, labels):
        x = images.astype(jax.numpy.float32)
        k_flip, k_mix, k_aug, k_erase = jax.random.split(key, 4)
        x = ops.random_hflip(k_flip, x)

        if mix_before_aug:
            # pre-aug mixes are PIL-uint8-domain in the reference — quantize
            # (keeps the augment inputs integer-valued, see ops.mix_batch)
            x, l1, l2, ratio = ops.mix_batch(k_mix, x, labels, mixup, cutmix,
                                             quantize=True)
        if randaug_layer > 0:
            x = A.randaugment(
                k_aug, x, randaug_layer, randaug_magnitude,
                cutout=randaug_cutout, increasing=randaug_increasing,
                magnitude_std=randaug_magnitude_std,
            )
        x = ops.normalize(x)
        if erasing > 0:
            x = ops.random_erasing(k_erase, x, p=erasing, mode="pixel")
        if not mix_before_aug:
            x, l1, l2, ratio = ops.mix_batch(k_mix, x, labels, mixup, cutmix)

        return {"image": x, "label1": l1, "label2": l2, "ratio": ratio}

    return jax.jit(augment_fn)


def make_host_batch_prep(erasing: float = 0.0, mixup: float = 0.0,
                         cutmix: float = 0.0, mix_before_aug: bool = True):
    """Device-side remainder for ``augment_backend: host``: the loader has
    already flipped / (mixed) / RandAugmented on CPU threads; the device
    does normalize + RandomErasing (and, for mix_before_aug=False, the
    tensor-path mix LAST — reference factory.py:184-190 ordering)."""

    def prep(key, images, label1, label2, ratio):
        x = ops.normalize(images.astype(jax.numpy.float32))
        k_erase, k_mix = jax.random.split(key)
        if erasing > 0:
            x = ops.random_erasing(k_erase, x, p=erasing, mode="pixel")
        if not mix_before_aug and (mixup > 0 or cutmix > 0):
            x, label1, label2, ratio = ops.mix_batch(k_mix, x, label1,
                                                     mixup, cutmix)
        return {"image": x, "label1": label1, "label2": label2, "ratio": ratio}

    return jax.jit(prep)


def make_valid_prep():
    """uint8 valid batch → normalized eval batch dict with per-sample
    weights (0 for wrap-padding rows in the final ragged batch)."""
    import jax.numpy as jnp

    def prep(images, labels, n_valid):
        x = ops.normalize(images.astype(jnp.float32))
        weight = (jnp.arange(images.shape[0]) < n_valid).astype(jnp.float32)
        return {"image": x, "label1": labels, "weight": weight}

    return jax.jit(prep)
