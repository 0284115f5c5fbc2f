#!/usr/bin/env python
"""Forward-only stack A/B: layer (attn kernel + XLA FF) vs layer1 (one
custom call per layer) for an INFERENCE-ONLY 12-layer ViT-S stack.

Motivation (PERF.md round 4): layer1 loses ~9% on the ViT TRAIN step
because its in-kernel FF backward's per-row weight-grad dots cost more
than the removed chain boundary.  A forward-only consumer — the DINO
TEACHER (train/dino.py:90-94, reference train_dino.py:224-225) and the
eval/predict paths — has no backward at all, so layer1's only effect is
removing 12 dependent-custom-call boundaries from the forward chain.
This measures whether that wins at the teacher's shapes.

Usage: python scripts/exp_fwdonly_layer1.py [batch_rows ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu import ops

DEPTH, N, C, H, F = 12, 197, 384, 6, 1536
DT = jnp.bfloat16


def make_params(key):
    ks = jax.random.split(key, 12)
    s = 0.02
    p = {
        "g1": jnp.ones((C,), DT), "b1": jnp.zeros((C,), DT),
        "wqkv": (jax.random.normal(ks[0], (C, 3 * C)) * s).astype(DT),
        "bqkv": jnp.zeros((3 * C,), DT),
        "wout": (jax.random.normal(ks[1], (C, C)) * s).astype(DT),
        "bout": jnp.zeros((C,), DT),
        "g2": jnp.ones((C,), DT), "b2": jnp.zeros((C,), DT),
        "w1": (jax.random.normal(ks[2], (C, F)) * s).astype(DT),
        "b1f": jnp.zeros((F,), DT),
        "w2": (jax.random.normal(ks[3], (F, C)) * s).astype(DT),
        "b2f": jnp.zeros((C,), DT),
    }
    return p


def stack_layer(params_list, x):
    for p in params_list:
        x = ops.fused_attention_layer(
            x, p["g1"], p["b1"], p["wqkv"], p["bqkv"], p["wout"], p["bout"],
            H, None, None, None)
        # XLA FF half (the shipped ViT composition)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = (xf * xf).mean(-1, keepdims=True) - mu * mu
        u = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * p["g2"] + p["b2"]).astype(DT)
        h = jax.nn.silu((u @ p["w1"] + p["b1f"]).astype(jnp.float32)).astype(DT)
        x = x + (h @ p["w2"] + p["b2f"])
    return x


def stack_layer1(params_list, x):
    for p in params_list:
        x = ops.fused_transformer_layer(
            x, p["g1"], p["b1"], p["wqkv"], p["bqkv"], p["wout"], p["bout"],
            p["g2"], p["b2"], p["w1"], p["b1f"], p["w2"], p["b2f"],
            H, None, None, None, "silu", None)
    return x


def bench(fn, params_list, x, iters=30):
    run = jax.jit(lambda px, xx: fn(px, xx))
    out = jax.block_until_ready(run(params_list, x))
    trivial = jax.jit(lambda a: a + 1)
    z = trivial(jnp.zeros(())); _ = float(z)
    t0 = time.perf_counter(); _ = float(trivial(z)); rt = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = run(params_list, x)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0 - rt) / iters)
    return best * 1e3


def main():
    batches = [int(b) for b in sys.argv[1:]] or [128, 256]
    params_list = [make_params(jax.random.PRNGKey(i)) for i in range(DEPTH)]
    for B in batches:
        x = (jax.random.normal(jax.random.PRNGKey(99), (B, N, C)) * 0.5).astype(DT)
        # parity first
        a = stack_layer(params_list[:2], x)
        b = stack_layer1(params_list[:2], x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        t_layer = bench(stack_layer, params_list, x)
        t_layer1 = bench(stack_layer1, params_list, x)
        print(f"B={B}: fwd-only 12-layer stack — layer {t_layer:.3f} ms, "
              f"layer1 {t_layer1:.3f} ms ({t_layer / t_layer1:.3f}x), "
              f"2-layer max|Δ|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
