#!/usr/bin/env python
"""ImageNet classification entry point.

CLI-compatible with the reference (reference train.py:389-396, README.md:52-54):

    python train.py --conf configs/vit-s-16.conf [--n_device N] [key=value ...]

``--n_gpu`` is accepted as an alias of ``--n_device``.  There is no process
launcher: the JAX runtime is one process per host driving all local chips;
multi-host runs call ``jax.distributed.initialize()`` (controlled by the
standard JAX env vars) instead of the reference's ``dist.launch`` fork-per-GPU.
"""

import os

import jax

# The axon sitecustomize pins the platform before user code runs; re-assert
# the user's JAX_PLATFORMS choice so CPU smoke runs work as documented.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import vision_transformers_tpu as vtx
from vision_transformers_tpu.train.trainer import train_classification


def main() -> None:
    # multi-host: the reference forked one process per GPU (dist.launch,
    # reference train.py:394-396); the JAX runtime is one process per host,
    # coordinated via jax.distributed when the standard env is present.
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

    # SIGTERM (scheduler preemption) → checkpoint at the next step boundary
    # and exit cleanly; restart with resume=auto to continue
    from vision_transformers_tpu.utils import preempt

    preempt.install()

    conf = vtx.load_arg_config()
    if conf.n_device == 0:
        conf.n_device = len(jax.devices())
    train_classification(conf)


if __name__ == "__main__":
    main()
