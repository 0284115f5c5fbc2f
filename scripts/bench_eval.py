#!/usr/bin/env python
"""Inference/eval throughput (images/sec/chip): jitted forward + top-1/5
metrics, bf16, no gradient — the serving-side counterpart of
bench_impls.py.

Usage: python scripts/bench_eval.py [arch ...] [--batches n,n]
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

from scripts.bench_impls import ARCHS, IMG_SIZE


def bench(arch: str, batches):
    import optax

    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine

    n_chips = len(jax.devices())
    mesh = meshlib.make_mesh()
    size = IMG_SIZE.get(arch, 224)
    model = registry.build("model", ARCHS[arch]).make(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    results = {}
    with mesh:
        state = engine.create_train_state(rng, model, (2, size, size, 3),
                                          optax.sgd(1e-3))
        state = jax.device_put(state, meshlib.replicated(mesh))
        eval_step = jax.jit(engine.make_eval_step(model))

        trivial = jax.jit(lambda a: a + 1)
        z = trivial(jnp.zeros(())); _ = float(z)
        t0 = time.perf_counter(); _ = float(trivial(z))
        rt = time.perf_counter() - t0

        for batch in batches:
            batch = batch * n_chips
            host = {
                "image": np.random.default_rng(0).normal(
                    size=(batch, size, size, 3)).astype(np.float32),
                "label1": np.zeros(batch, np.int32),
            }
            sharded = meshlib.shard_batch(mesh, host)
            m = eval_step(state, sharded)
            _ = float(m["n"])
            n_iter = max(10, 4096 // batch)
            best = float("inf")
            for _w in range(3):
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    m = eval_step(state, sharded)
                _ = float(m["n"])
                best = min(best, time.perf_counter() - t0 - rt)
            ips = batch * n_iter / best / n_chips
            results[batch // n_chips] = round(ips, 1)
            print(f"{arch} eval batch/chip={batch // n_chips}: "
                  f"{ips:.1f} img/s/chip ({best / n_iter * 1000:.2f} ms/step)",
                  flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("archs", nargs="*", default=["vit", "swin"])
    ap.add_argument("--batches", default="64,256")
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]
    out = {a: bench(a, batches) for a in (args.archs or ["vit", "swin"])}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
