#!/usr/bin/env python
"""DINO self-distillation entry point.

CLI-compatible with the reference (reference train_dino.py:291-298):

    python train_dino.py --conf configs/dino_deit-s-16.conf [key=value ...]
"""

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import vision_transformers_tpu as vtx
from vision_transformers_tpu.train.dino import train_dino


def main() -> None:
    # SIGTERM (scheduler preemption) → checkpoint at the next step boundary
    # and exit cleanly; restart with resume=auto to continue
    from vision_transformers_tpu.utils import preempt

    preempt.install()

    conf = vtx.load_arg_config()
    if conf.n_device == 0:
        conf.n_device = len(jax.devices())
    train_dino(conf)


if __name__ == "__main__":
    main()
