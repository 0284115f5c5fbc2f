#!/usr/bin/env python
"""Input-pipeline measurements (round-1 verdict items #6 / weak #5, #6).

1. Host decode+crop+resize throughput per core: native C++ path vs PIL on a
   synthetic JPEG corpus (this container has 1 core — the per-core number is
   what scales to a real host).
2. Device-side augmentation cost: the full jitted augment program
   (hflip → mixup/cutmix → RandAugment → normalize → RandomErasing) timed on
   the accelerator, standalone and as overhead on top of the ViT-S train
   step.

Usage: python scripts/bench_input_pipeline.py [--skip-tpu]
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(n=64, lo=320, hi=520, quality=87):
    from PIL import Image

    rng = np.random.default_rng(0)
    payloads = []
    for i in range(n):
        h = int(rng.integers(lo, hi))
        w = int(rng.integers(lo, hi))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        # JPEG of pure noise is unrealistically slow; blend with a gradient
        grad = (np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3)))
        arr = ((arr.astype(np.float32) + grad) / 2).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
        payloads.append(buf.getvalue())
    return payloads


def bench_host_decode(payloads, size=224, seconds=6.0):
    import random as pyrandom

    from vision_transformers_tpu.data import native
    from vision_transformers_tpu.data.pipeline import decode_random_resized_crop

    results = {}
    for use_native in ((True, False) if native.available() else (False,)):
        if not use_native:
            # force the PIL fallback by monkeypatching availability
            orig = native.available
            native.available = lambda: False
        try:
            n, t0 = 0, time.perf_counter()
            while time.perf_counter() - t0 < seconds:
                payload = payloads[n % len(payloads)]
                rng = pyrandom.Random(n)
                out = decode_random_resized_crop(payload, size, rng)
                assert out.shape == (size, size, 3)
                n += 1
            dt = time.perf_counter() - t0
            results["native" if use_native else "pil"] = round(n / dt, 1)
        finally:
            if not use_native and native.available() is False:
                native.available = orig  # type: ignore[name-defined]
    return results


def bench_device_augment(batch=256, size=224):
    import jax
    import jax.numpy as jnp

    from vision_transformers_tpu.data.pipeline import make_device_augment

    augment = make_device_augment(
        size, randaug_layer=2, randaug_magnitude=9, randaug_increasing=True,
        randaug_magnitude_std=0.5, erasing=0.25, mixup=0.8, cutmix=1.0,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, size, size, 3)), jnp.uint8)
    labels = jnp.asarray(rng.integers(0, 1000, batch), jnp.int32)
    key = jax.random.PRNGKey(0)

    out = augment(key, images, labels)
    _ = float(out["ratio"][0])  # hard sync through the relay

    trivial = jax.jit(lambda a: a + 1)
    z = trivial(jnp.zeros(()))
    _ = float(z)
    t0 = time.perf_counter()
    _ = float(trivial(z))
    round_trip = time.perf_counter() - t0

    n_iter = 30
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        o = out
        for i in range(n_iter):
            o = augment(jax.random.fold_in(key, i), images, labels)
        _ = float(o["ratio"][0])
        best = min(best, time.perf_counter() - t0 - round_trip)
    ms = best / n_iter * 1000
    return {"batch": batch, "ms_per_batch": round(ms, 2),
            "img_per_sec": round(batch / (best / n_iter), 1)}


def main():
    payloads = make_corpus()
    host = bench_host_decode(payloads)
    out = {"host_decode_rrc_img_per_sec_per_core": host}
    if "--skip-tpu" not in sys.argv:
        out["device_augment"] = bench_device_augment()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
