#!/usr/bin/env python
"""Isolated A/B of the fused kernels vs XLA compositions, per shape.

Shapes: ViT-S (B=256·? rows of 197×384) and Swin-S stages in window-pair
layout.  Measures fwd and fwd+bwd of: attention block (qkv+attn+out),
attention layer half (LN+block+residual), FF layer half (LN+FF+residual),
against their unfused XLA equivalents.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops import fused_block as FB
from vision_transformers_tpu.ops import fused_layer as FL

DT = jnp.bfloat16


def timeit(fn, *args, n=30):
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


def ln_ref(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    mul = jax.lax.rsqrt(var + eps) * g
    return ((xf - mu) * mul + b).astype(x.dtype)


def attn_ref(u, wqkv, bqkv, wout, bout, H, extra, scale):
    B, N, C = u.shape
    HD = wqkv.shape[1] // 3
    D = HD // H
    qkv = (u @ wqkv + bqkv).reshape(B, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    if extra is not None:
        G = extra.shape[0]
        s = (s.reshape(G, B // G, H, N, N) + extra[:, None]).reshape(B, H, N, N)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(u.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, HD)
    return o @ wout + bout


def main():
    shapes = {
        # name: (B_rows, N, C, H, D, groups, F)
        "vit256": (256, 197, 384, 6, 64, 0, 1536),
        "swin_s1_b128": (32 * 128, 98, 96, 3, 32, 32, 384),
        "swin_s3_b128": (2 * 128, 98, 384, 12, 32, 2, 1536),
    }
    rng = np.random.default_rng(0)
    res = {}
    for name, (B, N, C, H, D, G, F) in shapes.items():
        HD = H * D
        x = jnp.asarray(rng.normal(size=(B, N, C)), DT)
        g1 = jnp.asarray(np.ones(C), jnp.float32)
        b1 = jnp.asarray(np.zeros(C), jnp.float32)
        wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, DT)
        bqkv = jnp.asarray(np.zeros(3 * HD), DT)
        wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, DT)
        bout = jnp.asarray(np.zeros(C), DT)
        w1 = jnp.asarray(rng.normal(size=(C, F)) * 0.05, DT)
        bb1 = jnp.asarray(np.zeros(F), DT)
        w2 = jnp.asarray(rng.normal(size=(F, C)) * 0.05, DT)
        bb2 = jnp.asarray(np.zeros(C), DT)
        extra = None if G == 0 else \
            jnp.asarray(rng.normal(size=(G, H, N, N)), jnp.float32)
        scale = 1.0 / np.sqrt(D)

        def xla_attn_layer(x):
            return x + attn_ref(ln_ref(x, g1, b1), wqkv, bqkv, wout, bout,
                                H, extra, scale)

        def fused_attn_layer(x):
            return FL.fused_attention_layer(x, g1, b1, wqkv, bqkv, wout,
                                            bout, H, extra, None, scale)

        def xla_ff_layer(x):
            u = ln_ref(x, g1, b1)
            h = jax.nn.silu((u @ w1 + bb1).astype(jnp.float32)).astype(DT)
            return x + (h @ w2 + bb2)

        def fused_ff_layer(x):
            return FL.fused_ff_layer(x, g1, b1, w1, bb1, w2, bb2, "silu")

        def xla_block(x):
            return attn_ref(x, wqkv, bqkv, wout, bout, H, extra, scale)

        def fused_blockf(x):
            return FB.fused_attention_block(x, wqkv, bqkv, wout, bout, H,
                                            extra, scale)

        fns = {
            "xla_attn_layer": xla_attn_layer,
            "fused_attn_layer": fused_attn_layer,
            "xla_ff_layer": xla_ff_layer,
            "fused_ff_layer": fused_ff_layer,
            "xla_block": xla_block,
            "fused_block": fused_blockf,
        }
        out = {}
        for fname, fn in fns.items():
            jf = jax.jit(fn)
            gf = jax.jit(jax.grad(lambda x: jnp.sum(fn(x).astype(jnp.float32))))
            out[fname] = {"fwd": round(timeit(jf, x), 2),
                          "grad": round(timeit(gf, x, n=15), 2)}
            print(name, fname, out[fname], flush=True)
        res[name] = out
    print(json.dumps(res))


if __name__ == "__main__":
    main()
