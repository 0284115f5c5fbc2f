#!/usr/bin/env python
"""A/B/C bench: full train step with each attention implementation
(einsum / fused / block) for ViT-S/16 or Swin-S.

Usage: python scripts/bench_impls.py {vit|swin} [--impls a,b,c] [--batches n,n]

Timing per the axon-relay methodology (PERF.md): chained donated steps, one
hard fetch, measured round-trip subtracted, best-of-3 windows.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ARCHS = {
    "vit": {"type": "vit", "image_size": 224, "window_size": 16,
            "n_class": 1000, "depth": 12, "dim": 384, "n_head": 6,
            "dim_ff": 1536},
    "swin": {"type": "swin_transformer", "image_size": 224, "n_class": 1000,
             "depths": [2, 2, 18, 2], "dims": [96, 192, 384, 768],
             "dim_head": 32, "n_heads": [3, 6, 12, 24],
             "dim_ffs": [384, 768, 1536, 3072], "window_size": 7},
    # reference headline conv model (trains progressively 128->300px;
    # 300 is the accuracy-quoted resolution)
    "effnetv2": {"type": "efficientnetv2"},
    # remaining reference families at their registry defaults
    "pvt": {"type": "pvt"},
    "twins": {"type": "twins_svt"},
    "halo": {"type": "halo_transformer"},
    "nfnet": {"type": "nfnet"},          # F0; reference trains at 192px
}
# halo: window 8 needs feature maps divisible by 8 -> 256px (paper res)
IMG_SIZE = {"vit": 224, "swin": 224, "effnetv2": 300, "nfnet": 192, "halo": 256}


def bench_step(arch: str, batches, impl: str, remat: bool = False):
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer
    from vision_transformers_tpu.config.schema import Training

    # "auto" leaves the measured per-site defaults in place (so env knobs
    # like VTX_SRA_IMPL can be A/B'd in isolation)
    ops.set_attention_impl(None if impl == "auto" else impl)
    n_chips = len(jax.devices())
    mesh = meshlib.make_mesh()
    size = IMG_SIZE.get(arch, 224)
    arch_conf = dict(ARCHS[arch])
    if remat:
        arch_conf["remat"] = True
    model = registry.build("model", arch_conf).make(dtype=jnp.bfloat16)
    train_conf = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.05, wd_skip="vit", epoch=1,
        clip_grad_norm=5.0,
    )
    rng = jax.random.PRNGKey(0)
    shape = (2, size, size, 3)
    results = {}
    with mesh:
        params_shape = jax.eval_shape(lambda: model.init(rng, jnp.zeros(shape)))["params"]
        tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)

        trivial = jax.jit(lambda a: a + 1)
        z = trivial(jnp.zeros(()))
        _ = float(z)
        t0 = time.perf_counter()
        _ = float(trivial(z))
        round_trip = time.perf_counter() - t0

        for batch in batches:
            batch = batch * n_chips
            try:
                results[batch // n_chips] = _one_batch(
                    arch, impl, mesh, meshlib, engine, model, tx, rng, shape,
                    size, batch, n_chips, round_trip)
            except Exception as e:  # noqa: BLE001 — OOM ends the sweep
                if "RESOURCE_EXHAUSTED" in str(e) or "memory" in str(e).lower():
                    results[batch // n_chips] = "OOM"
                    print(f"{arch} impl={impl} batch/chip="
                          f"{batch // n_chips}: OOM", flush=True)
                    break
                raise
    return results


def _one_batch(arch, impl, mesh, meshlib, engine, model, tx, rng, shape,
               size, batch, n_chips, round_trip):
    state = engine.create_train_state(rng, model, shape, tx)
    state = jax.device_put(state, meshlib.replicated(mesh))
    train_step = jax.jit(engine.make_train_step(model, tx),
                         donate_argnums=(0,))
    host = {
        "image": np.random.default_rng(0).normal(
            size=(batch, size, size, 3)).astype(np.float32),
        "label1": np.random.default_rng(1).integers(0, 1000, batch).astype(np.int32),
        "label2": np.random.default_rng(2).integers(0, 1000, batch).astype(np.int32),
        "ratio": np.ones(batch, np.float32),
    }
    sharded = meshlib.shard_batch(mesh, host)
    state, m = train_step(state, sharded, rng)
    _ = float(m["loss"])

    n_iter = max(10, 2048 // batch)
    dt = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iter):
            state, m = train_step(state, sharded, rng)
        _ = float(m["loss"])
        dt = min(dt, time.perf_counter() - t0 - round_trip)
    ips = batch * n_iter / dt / n_chips
    print(f"{arch} impl={impl} batch/chip={batch // n_chips}: "
          f"{ips:.1f} img/s/chip ({dt / n_iter * 1000:.1f} ms/step)",
          flush=True)
    return round(ips, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arch", choices=list(ARCHS))
    ap.add_argument("--impls", default="einsum,block")
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--remat", action="store_true",
                    help="arch.remat=true (per-block jax.checkpoint); sweep "
                         "--batches upward to find the raised batch ceiling")
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]
    out = {}
    for impl in args.impls.split(","):
        out[impl] = bench_step(args.arch, batches, impl, remat=args.remat)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
