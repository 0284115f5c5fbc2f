"""DINO multi-crop augmentation pipeline (reference: transforms.py:216-294).

Host: per sample, 2 global RandomResizedCrops (scale 0.4-1.0, bicubic) +
``n_local`` local crops (scale 0.05-0.4) — variable-geometry work stays on CPU
threads.  Device: the color stack per crop group, one jit: hflip → ColorJitter
(p .8) → grayscale (p .2) → per-group blur/solarize recipe → normalize.

Crop-group recipes (reference :247-284):
- global 1: blur p=1.0
- global 2: blur p=0.1, solarize p=0.2
- locals:   blur p=0.5

The reference returns a list of 10 crop tensors per sample; here the batch
keeps *static* shapes: globals [2, B, S, S, 3] and locals [n, B, s, s, 3],
matching the model's trace-time multi-crop grouping (models/vit.py).
"""

from __future__ import annotations

import queue
import random as pyrandom
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .pipeline import decode_random_resized_crop
from .records import RecordDataset

__all__ = ["DINOHostLoader", "make_dino_device_augment", "synthetic_dino_batches"]


class DINOHostLoader:
    """Threaded multi-crop loader: yields uint8 arrays
    {globals: [2,B,S,S,3], locals: [n,B,s,s,3]}."""

    def __init__(
        self,
        dataset: RecordDataset,
        batch_size: int,
        global_size: int = 224,
        local_size: int = 96,
        global_scale=(0.4, 1.0),
        local_scale=(0.05, 0.4),
        n_local: int = 8,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.global_size = global_size
        self.local_size = local_size
        self.global_scale = tuple(global_scale)
        self.local_scale = tuple(local_scale)
        self.n_local = n_local
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_index = jax.process_index() if shard_index is None else shard_index
        self.shard_count = jax.process_count() if shard_count is None else shard_count
        if batch_size % self.shard_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by process count "
                f"{self.shard_count}")
        # per-process rows per step (reference factory.py:264); the global
        # batch is assembled by parallel.mesh.shard_batch
        self.local_batch = batch_size // self.shard_count

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        return rng.permutation(len(self.dataset))[self.shard_index::self.shard_count]

    def __len__(self) -> int:
        # global optimizer steps per epoch, identical on every process
        return (len(self.dataset) // self.shard_count) // self.local_batch

    def epoch(self, epoch: int = 0, skip: int = 0) -> Iterator[dict]:
        """``skip``: fast-forward past the first ``skip`` batches without
        decoding them (exact mid-epoch resume; per-sample rngs are keyed by
        absolute dataset index)."""
        indices = self._epoch_indices(epoch)
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def decode_one(i: int):
            _, payload = self.dataset.get(int(i))
            rng = pyrandom.Random(hash((self.seed, epoch, int(i))))
            crops_g = [
                decode_random_resized_crop(payload, self.global_size, rng,
                                           scale=self.global_scale)
                for _ in range(2)
            ]
            crops_l = [
                decode_random_resized_crop(payload, self.local_size, rng,
                                           scale=self.local_scale)
                for _ in range(self.n_local)
            ]
            return crops_g, crops_l

        error: list = []

        def producer():
            from concurrent.futures import ThreadPoolExecutor

            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(skip, n_batches):
                        if stop.is_set():
                            break
                        sel = indices[b * self.local_batch:(b + 1) * self.local_batch]
                        results = list(pool.map(decode_one, sel))
                        globals_ = np.stack(
                            [np.stack([r[0][g] for r in results]) for g in range(2)]
                        )
                        locals_ = np.stack(
                            [np.stack([r[1][l] for r in results])
                             for l in range(self.n_local)]
                        ) if self.n_local else np.zeros(
                            (0, len(results), self.local_size, self.local_size, 3),
                            np.uint8)
                        out_q.put({"globals": globals_, "locals": locals_})
            except BaseException as e:
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


def make_dino_device_augment(n_local: int):
    """(key, globals u8 [2,B,S,S,3], locals u8 [n,B,s,s,3]) →
    (teacher_crops, student_crops) lists of normalized [B,...] arrays."""

    def augment_crop(key, crop_u8, blur_p, solarize_p):
        x = crop_u8.astype(jnp.float32) / 255.0
        k_f, k_j, k_g, k_b, k_s = jax.random.split(key, 5)
        x = ops.random_hflip(k_f, x)
        x = ops.color_jitter(k_j, x, brightness=0.4, contrast=0.4,
                             saturation=0.2, hue=0.1, p=0.8)
        x = ops.random_grayscale(k_g, x, p=0.2)
        if blur_p > 0:
            x = ops.gaussian_blur(k_b, x, p=blur_p)
        if solarize_p > 0:
            x = ops.random_solarize(k_s, x, p=solarize_p)
        mean = jnp.asarray(ops.IMAGENET_MEAN)
        std = jnp.asarray(ops.IMAGENET_STD)
        return (x - mean) / std

    def augment(key, globals_u8, locals_u8):
        kg1, kg2, kl = jax.random.split(key, 3)
        g1 = augment_crop(kg1, globals_u8[0], blur_p=1.0, solarize_p=0.0)
        g2 = augment_crop(kg2, globals_u8[1], blur_p=0.1, solarize_p=0.2)
        crops = [g1, g2]
        for i in range(n_local):
            crops.append(
                augment_crop(jax.random.fold_in(kl, i), locals_u8[i],
                             blur_p=0.5, solarize_p=0.0)
            )
        return crops

    return jax.jit(augment)


def synthetic_dino_batches(batch_size: int, global_size: int, local_size: int,
                           n_local: int, n_batches: int, seed: int = 0):
    """Fake multi-crop batches for smoke tests / benches."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, (2, batch_size, global_size, global_size, 3),
                     dtype=np.uint8)
    l = rng.integers(0, 256, (max(n_local, 0), batch_size, local_size, local_size, 3),
                     dtype=np.uint8)
    for _ in range(n_batches):
        yield {"globals": g, "locals": l}
