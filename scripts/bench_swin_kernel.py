#!/usr/bin/env python
"""Isolated Swin window-attention math: fused kernel vs einsum, per stage.

Shapes are Swin-S @224 with batch 128: stage s has n_win windows of 49
tokens, h heads of d=32.  Measures fwd and fwd+bwd of JUST the attention op
(inputs already in window layout) — isolates kernel efficiency from the
model's reshape costs.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops import fused_attention_mod as FA

B = 128
STAGES = [  # (n_win, heads, depth)
    (64, 3, 2), (16, 6, 2), (4, 12, 18), (1, 24, 2),
]
D = 32
W2 = 49


def timeit(fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    trivial = jax.jit(lambda a: a + 1)
    z = trivial(jnp.zeros(())); _ = float(z)
    t0 = time.perf_counter(); _ = float(trivial(z)); rt = time.perf_counter() - t0
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0 - rt)
    return best / n * 1000


def main():
    rng = np.random.default_rng(0)
    results = {}
    for n_win, h, depth in STAGES:
        for pack in ({1, 2} if n_win > 1 else {1}):
            g = n_win // pack * h
            m = pack * W2
            q = jnp.asarray(rng.normal(size=(B, g, m, D)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(B, g, m, D)), jnp.bfloat16)
            v = jnp.asarray(rng.normal(size=(B, g, m, D)), jnp.bfloat16)
            extra = jnp.asarray(rng.normal(size=(g, m, m)).astype(np.float32))

            fused_f = jax.jit(lambda q, k, v, e: FA.fused_attention(q, k, v, e))
            fused_g = jax.jit(jax.grad(
                lambda q, k, v, e: jnp.sum(
                    FA.fused_attention(q, k, v, e).astype(jnp.float32)),
                argnums=(0, 1, 2, 3)))

            def einsum_attn(q, k, v, e):
                s = jnp.einsum("bgmd,bgnd->bgmn", q, k) * (1 / np.sqrt(D))
                s = s.astype(jnp.float32) + e
                p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
                return jnp.einsum("bgmn,bgnd->bgmd", p, v)

            ein_f = jax.jit(einsum_attn)
            ein_g = jax.jit(jax.grad(
                lambda q, k, v, e: jnp.sum(einsum_attn(q, k, v, e).astype(jnp.float32)),
                argnums=(0, 1, 2, 3)))

            key = f"nw{n_win}h{h}pack{pack}"
            results[key] = {
                "depth": depth,
                "fused_fwd_ms": round(timeit(fused_f, q, k, v, extra), 3),
                "einsum_fwd_ms": round(timeit(ein_f, q, k, v, extra), 3),
                "fused_grad_ms": round(timeit(fused_g, q, k, v, extra, n=15), 3),
                "einsum_grad_ms": round(timeit(ein_g, q, k, v, extra, n=15), 3),
            }
            print(key, results[key], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
