#!/usr/bin/env python
"""Async-checkpoint wall-clock win, measured (tpu_pending item 6).

The claim under test (train/checkpoint.py): ``save_checkpoint`` is async —
it returns once device arrays are snapshotted to host and commits to disk in
a background thread, so the following epoch's steps hide the write; the
reference's ``torch.save`` blocks the loop instead (train.py:208-217).

Protocol: a real-size ViT-S train state (params + AdamW moments + EMA,
~f32 22M·4 leaves) on the real chip.  For each mode, run
``epochs`` cycles of [K train steps, then checkpoint]:

  sync   — save_checkpoint(..., block=True): the loop waits for the commit
  async  — save_checkpoint(...): snapshot returns, commit overlaps the
           next K steps (save_checkpoint waits for the PREVIOUS commit
           first, so correctness is identical)

Reported: wall/cycle for both, the saved seconds/cycle, and the pure
blocking-commit time for scale.  Run on the TPU host:
    python scripts/bench_async_ckpt.py [--steps 30] [--cycles 4]
"""

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(batch):
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.config.schema import Training
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer

    mesh = meshlib.make_mesh()
    model = registry.build("model", {
        "type": "vit", "image_size": 224, "window_size": 16, "n_class": 1000,
        "depth": 12, "dim": 384, "n_head": 6, "dim_ff": 1536,
    }).make(dtype=jnp.bfloat16)
    train_conf = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.05, wd_skip="vit", epoch=1,
        clip_grad_norm=5.0, ema=0.9999,
    )
    rng = jax.random.PRNGKey(0)
    shape = (2, 224, 224, 3)
    with mesh:
        params_shape = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros(shape)))["params"]
        tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)
        state = engine.create_train_state(rng, model, shape, tx,
                                          ema=train_conf.ema)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = jax.jit(engine.make_train_step(model, tx, ema=train_conf.ema),
                       donate_argnums=(0,))
        host = {
            "image": np.random.default_rng(0).normal(
                size=(batch, 224, 224, 3)).astype(np.float32),
            "label1": np.random.default_rng(1).integers(
                0, 1000, batch).astype(np.int32),
            "label2": np.random.default_rng(2).integers(
                0, 1000, batch).astype(np.int32),
            "ratio": np.ones(batch, np.float32),
        }
        sharded = meshlib.shard_batch(mesh, host)
    return mesh, state, step, sharded


def run_mode(state, step, batch, steps, cycles, block, path):
    from vision_transformers_tpu.train import checkpoint as ckpt

    # warm the step + one throwaway save so directory creation/compile are
    # out of the measured window
    state, m = step(state, batch, jax.random.PRNGKey(1))
    _ = float(m["loss"])
    ckpt.save_checkpoint(os.path.join(path, "warm"), state.params, block=True)

    walls = []
    for c in range(cycles):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = step(state, batch, jax.random.PRNGKey(1))
        _ = float(m["loss"])  # drain the step chain before timing the save
        ckpt.save_checkpoint(os.path.join(path, f"ck-{c}"),
                             {"params": state.params,
                              "ema": state.ema_params}, block=block)
        walls.append(time.perf_counter() - t0)
    ckpt.wait_for_checkpoints()
    return state, walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dir", default="/tmp/bench_async_ckpt")
    args = ap.parse_args()

    shutil.rmtree(args.dir, ignore_errors=True)
    mesh, state, step, batch = build(args.batch)
    with mesh:
        state, sync_walls = run_mode(state, step, batch, args.steps,
                                     args.cycles, True,
                                     os.path.join(args.dir, "sync"))
        state, async_walls = run_mode(state, step, batch, args.steps,
                                      args.cycles, False,
                                      os.path.join(args.dir, "async"))

    sync_s = min(sync_walls)
    async_s = min(async_walls)
    print(f"sync  cycles: {[round(w, 2) for w in sync_walls]}")
    print(f"async cycles: {[round(w, 2) for w in async_walls]}")
    print(f"best wall/cycle ({args.steps} steps + 1 save): "
          f"sync {sync_s:.2f}s, async {async_s:.2f}s, "
          f"saved {sync_s - async_s:.2f}s/cycle "
          f"({(sync_s - async_s) / sync_s * 100:.0f}% of the sync cycle)")
    shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
