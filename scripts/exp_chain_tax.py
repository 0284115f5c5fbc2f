#!/usr/bin/env python
"""Reproduce the in-model backward-kernel tax in isolation.

The fused attention-layer bwd kernel measures ~5.3 ms alone but ~9.8 ms
inside the full Swin step (stage-1 shape).  Hypotheses: interleaved XLA FF
backward, cotangent layout from upstream ops, VMEM/DMA contention.  This
chains L layers of [fused attn layer + XLA FF layer] and times grad of the
stack; per-layer cost vs the isolated single-layer number localizes the tax.

Usage: python scripts/exp_chain_tax.py [mode...]  (modes: attn_only, attn_ff)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops import fused_layer as FL

DT = jnp.bfloat16
B, N, C, H, D = 4096, 98, 96, 3, 32
G = 32
HD = H * D
F = 4 * C
L = 4


def timeit(fn, *args, n=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    trivial = jax.jit(lambda a: a + 1)
    z = trivial(jnp.zeros(())); _ = float(z)
    t0 = time.perf_counter(); _ = float(trivial(z)); rt = time.perf_counter() - t0
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0 - rt)
    return best / n * 1000


def main():
    modes = sys.argv[1:] or ["attn_only", "attn_ff"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), DT)
    g1 = jnp.asarray(np.ones(C), jnp.float32)
    b1 = jnp.asarray(np.zeros(C), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, DT)
    bqkv = jnp.asarray(np.zeros(3 * HD), DT)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, DT)
    bout = jnp.asarray(np.zeros(C), DT)
    w1 = jnp.asarray(rng.normal(size=(C, F)) * 0.05, DT)
    w2 = jnp.asarray(rng.normal(size=(F, C)) * 0.05, DT)
    extra = jnp.asarray(rng.normal(size=(G, H, N, N)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    def attn_layer(x):
        return FL.fused_attention_layer(x, g1, b1, wqkv, bqkv, wout, bout,
                                        H, extra, None, scale)

    def ff_layer(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = (xf * xf).mean(-1, keepdims=True) - mu * mu
        u = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(DT)
        h = jax.nn.silu((u @ w1).astype(jnp.float32)).astype(DT)
        return x + h @ w2

    def stack(x, with_ff):
        for _ in range(L):
            x = attn_layer(x)
            if with_ff:
                x = ff_layer(x)
        return x

    for mode in modes:
        with_ff = mode == "attn_ff"
        gf = jax.jit(jax.grad(lambda x: jnp.sum(stack(x, with_ff).astype(jnp.float32))))
        ms = timeit(gf, x)
        print(f"{mode:10s} L={L}: {ms:8.2f} ms total, {ms / L:6.2f} ms/layer",
              flush=True)


if __name__ == "__main__":
    main()
