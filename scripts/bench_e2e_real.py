#!/usr/bin/env python
"""End-to-end REAL-DATA training throughput on the TPU host.

Packs a synthetic-JPEG records corpus (realistic sizes/quality), then runs
the actual conf-driven trainer — HostLoader decode threads → augmentation →
sharded train step — and reports img/s/chip next to the synthetic-data
number (round-2 verdict item 5).

Usage:
  python scripts/bench_e2e_real.py [vit|swin] [--backend device|host]
      [--images 1024] [--batch 64] [--workers N]
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = "/tmp/vtx_e2e_corpus"


def build_corpus(n_train: int, n_valid: int) -> None:
    from PIL import Image

    from vision_transformers_tpu.data.records import RecordWriter

    if os.path.exists(os.path.join(CORPUS, "train.rec")):
        from vision_transformers_tpu.data.records import RecordDataset

        if len(RecordDataset(os.path.join(CORPUS, "train"))) == n_train:
            print("corpus cached", flush=True)
            return
    os.makedirs(CORPUS, exist_ok=True)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for split, n in (("train", n_train), ("valid", n_valid)):
        w = RecordWriter(os.path.join(CORPUS, split))
        for i in range(n):
            h = int(rng.integers(320, 520))
            wd = int(rng.integers(320, 520))
            arr = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
            grad = np.linspace(0, 255, wd)[None, :, None] * np.ones((h, 1, 3))
            arr = ((arr.astype(np.float32) + grad) / 2).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=87)
            w.append(int(rng.integers(0, 1000)), buf.getvalue())
        w.close()
    print(f"corpus built in {time.perf_counter() - t0:.0f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arch", nargs="?", default="vit", choices=["vit", "swin"])
    ap.add_argument("--backend", default="device", choices=["device", "host"])
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    args = ap.parse_args()

    build_corpus(args.images, 128)

    from vision_transformers_tpu.config.schema import load_config

    conf_file = {"vit": "configs/vit-s-16.conf",
                 "swin": "configs/swin-transformer-s.conf"}[args.arch]
    overrides = [
        f"dataset_path={CORPUS}",
        "data_backend=records",
        "training.epoch=2",  # epoch 0 pays compile; epoch 1 is the measurement
        f"training.dataloader.batch_size={args.batch}",
        f"training.dataloader.num_workers={args.workers}",
        f"training.augment_backend={args.backend}",
        "checker.storage=[]",
    ]
    conf = load_config(os.path.join(os.path.dirname(__file__), "..", conf_file),
                       overrides=overrides)

    from vision_transformers_tpu.train.trainer import train_classification

    metrics = train_classification(conf)
    print(f"REAL-DATA {args.arch} augment={args.backend} "
          f"batch={args.batch} workers={args.workers}: "
          f"{metrics['images_per_sec']:.1f} img/s/chip "
          f"(data_time {metrics['data_time'] * 1000:.1f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
