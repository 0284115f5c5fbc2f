#!/usr/bin/env python
"""Full-step Swin-S A/B: map-resident whole-layer kernel (ops/fused_swin.py,
impl "swin") vs the shipped layer1 default.

Usage: python scripts/bench_swin_map.py [impl ...] [--batch N]
  impl in {layer1, swin, layer, einsum}; default "layer1 swin" at 128/chip.

Round-5 item 1 (VERDICT r4): does folding partition/unpartition into the
kernel's BlockSpec bands close the 15.5 ms/step movement tax?
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_step(batch_per_chip, impl):
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer
    from vision_transformers_tpu.config.schema import Training

    ops.set_attention_impl(impl)
    n_chips = len(jax.devices())
    mesh = meshlib.make_mesh()
    model = registry.build(
        "model",
        {"type": "swin_transformer", "image_size": 224, "n_class": 1000,
         "depths": [2, 2, 18, 2], "dims": [96, 192, 384, 768],
         "dim_head": 32, "n_heads": [3, 6, 12, 24],
         "dim_ffs": [384, 768, 1536, 3072], "window_size": 7},
    ).make(dtype=jnp.bfloat16)
    train_conf = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.05, wd_skip="vit", epoch=1,
        clip_grad_norm=5.0,
    )
    rng = jax.random.PRNGKey(0)
    shape = (2, 224, 224, 3)
    with mesh:
        params_shape = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros(shape)))["params"]
        tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)

        trivial = jax.jit(lambda a: a + 1)
        z = trivial(jnp.zeros(()))
        _ = float(z)
        t0 = time.perf_counter()
        _ = float(trivial(z))
        round_trip = time.perf_counter() - t0

        batch = batch_per_chip * n_chips
        state = engine.create_train_state(rng, model, shape, tx)
        state = jax.device_put(state, meshlib.replicated(mesh))
        train_step = jax.jit(engine.make_train_step(model, tx),
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
        t0 = time.perf_counter()
        state, m = train_step(state, sharded, rng)
        loss = float(m["loss"])
        compile_s = time.perf_counter() - t0

        n_iter = max(10, 1024 // batch)
        dt = float("inf")
        for _w in range(3):
            t0 = time.perf_counter()
            for _ in range(n_iter):
                state, m = train_step(state, sharded, rng)
            _ = float(m["loss"])
            dt = min(dt, time.perf_counter() - t0 - round_trip)
        ips = batch * n_iter / dt / n_chips
        print(f"impl={impl} batch/chip={batch_per_chip}: {ips:.1f} "
              f"img/s/chip ({dt / n_iter * 1000:.1f} ms/step, "
              f"compile {compile_s:.0f}s, loss {loss:.3f})", flush=True)
        return round(ips, 1)


def main():
    args = [a for a in sys.argv[1:]]
    batch = 128
    if "--batch" in args:
        i = args.index("--batch")
        batch = int(args[i + 1])
        del args[i:i + 2]
    impls = args or ["layer1", "swin"]
    out = {impl: bench_step(batch, impl) for impl in impls}
    print(json.dumps({"batch_per_chip": batch, "img_per_s_per_chip": out}))


if __name__ == "__main__":
    main()
