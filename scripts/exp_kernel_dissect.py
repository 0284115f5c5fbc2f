#!/usr/bin/env python
"""Dissect the fused attention-layer forward kernel on the Swin stage-1 shape.

Variants isolate where the time goes ([4096, 98, 96], H=3, D=32, bf16):
  full      — the shipping per-row kernel body
  projonly  — LN + qkv/out projections, attention replaced by a q-slice copy
  attnonly  — per-head score/softmax/av only, projections replaced by slices
  noloop2   — full body, two rows per loop iteration (ILP across rows)
  bigproj   — qkv projection as ONE [bc*Np, C] dot on a 112-padded token dim
              (tile-aligned sublane merge), attention per-row as in `full`

Usage: python scripts/exp_kernel_dissect.py [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DT = jnp.bfloat16
B, N, C, H, D = 4096, 98, 96, 3, 32
HD = H * D
SCALE = 1.0 / np.sqrt(D)
EPS = 1e-6
BC = 64  # rows per grid step (matches _pick_bc_attn for this shape)

CP = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _ln(xf, g, b):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + EPS) * g + b


def _row_attn(qkv, extra, dtype):
    outs = []
    for h in range(H):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, HD + h * D:HD + (h + 1) * D]
        v = qkv[:, 2 * HD + h * D:2 * HD + (h + 1) * D]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * SCALE
        if extra is not None:
            s = s + extra
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dtype)
        outs.append(jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32
                                        ).astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def k_full(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref):
    def body(j, _):
        xj = x_ref[j]
        u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)
        acc = _row_attn(qkv, None, x_ref.dtype)
        a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(x_ref.dtype)
        o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC, body, 0)


def k_projonly(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref):
    def body(j, _):
        xj = x_ref[j]
        u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)
        acc = qkv[:, :HD]
        a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(x_ref.dtype)
        o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC, body, 0)


def k_attnonly(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref):
    def body(j, _):
        xj = x_ref[j]
        qkv = jnp.concatenate([xj, xj, xj], axis=-1)
        acc = _row_attn(qkv, None, x_ref.dtype)
        o_ref[j] = xj + acc.astype(x_ref.dtype)
        return _
    jax.lax.fori_loop(0, BC, body, 0)


def k_noloop2(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref):
    def body(jj, _):
        for off in range(2):
            j = jj * 2 + off
            xj = x_ref[j]
            u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
            qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ).astype(x_ref.dtype)
            acc = _row_attn(qkv, None, x_ref.dtype)
            a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(x_ref.dtype)
            o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC // 2, body, 0)


def k_noloop4(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref):
    def body(jj, _):
        for off in range(4):
            j = jj * 4 + off
            xj = x_ref[j]
            u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
            qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32
                                      ).astype(x_ref.dtype)
            acc = _row_attn(qkv, None, x_ref.dtype)
            a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(x_ref.dtype)
            o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC // 4, body, 0)


def k_blockdiag(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref,
                kpad_ref, vpad_ref):
    """Lane-axis head merge: ONE score dot s_all[98, 3·104] = q_cat·K_blkᵀ
    (q_cat is the native [98, 96] qkv slice; K_blk is block-diagonal so
    cross-head contraction terms hit zeros) and ONE av dot
    acc = p_cat·V_blk [98, 96] (V_blk block-diagonal per head) — per-head
    outputs land lane-concatenated with zero reorders.  Pass count is
    flop-invariant vs the per-head chain; this measures whether fewer,
    wider dot INSTRUCTIONS amortize issue/weight-load latency."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (H * PAD, 1), 0)
    padmask = jnp.where(subl % PAD < N, 0.0, -1e30).astype(jnp.float32)

    def body(j, _):
        xj = x_ref[j]
        u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)
        q, k, v = qkv[:, :HD], qkv[:, HD:2 * HD], qkv[:, 2 * HD:]

        def stack(t, pad_ref):
            # 98->104 pad via a scratch-ref slice store (concat-of-vpad and
            # scatter/dus forms all fail to lower in this Mosaic version)
            pad_ref[N:] = jnp.zeros((PAD - N, C), t.dtype)
            pad_ref[:N] = t
            t_pad = pad_ref[...]
            pieces = []
            for h in range(H):
                m = ((lane >= h * D) & (lane < (h + 1) * D)).astype(t.dtype)
                pieces.append(t_pad * m)
            return jnp.concatenate(pieces, axis=0)  # [H·PAD, C] block-diag

        k_blk = stack(k, kpad_ref)
        v_blk = stack(v, vpad_ref)
        # s_all[i, h·PAD+j] = q_i(head h) · k_j(head h): zeros kill cross terms
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * SCALE + padmask.reshape(1, H * PAD)      # [N, H·PAD]
        # per-head softmax via static lane slices (the [N, H, PAD] lane
        # split reshape is an unsupported Mosaic shape cast)
        parts = []
        for h in range(H):
            sh = s[:, h * PAD:(h + 1) * PAD]
            mx = jnp.max(sh, axis=-1, keepdims=True)
            ph = jnp.exp(sh - mx)
            parts.append(ph / jnp.sum(ph, axis=-1, keepdims=True))
        p_cat = jnp.concatenate(parts, axis=1).astype(x_ref.dtype)
        acc = jax.lax.dot_general(p_cat, v_blk, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)  # [N, C]
        a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(x_ref.dtype)
        o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC, body, 0)


PAD = 104  # per-head key section, 8-aligned (98 -> 104)


def k_headstack(x_ref, g_ref, b_ref, wqkv_ref, wout_ref, o_ref,
                kpad_ref, vpad_ref):
    """All-head attention dots as single MXU ops via head-masked key/value
    stacking: k_aug[104h+j] = k_j ⊙ mask_h, scores = k_aug·qᵀ [312, 98]
    (K=96), softmax over key-sublanes per 104-group, out = p_Tᵀ·v_aug
    (K=312) — per-head results land lane-concatenated for free."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    subl = jax.lax.broadcasted_iota(jnp.int32, (H * PAD, 1), 0)
    padmask = jnp.where(subl % PAD < N, 0.0, -1e30).astype(jnp.float32)

    def body(j, _):
        xj = x_ref[j]
        u = _ln(xj.astype(jnp.float32), g_ref[0], b_ref[0]).astype(x_ref.dtype)
        qkv = jax.lax.dot_general(u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)
        q, k, v = qkv[:, :HD], qkv[:, HD:2 * HD], qkv[:, 2 * HD:]

        def stack(t, pad_ref):
            # 98->104 pad via a scratch-ref slice store (see k_blockdiag);
            # pad rows are masked out downstream so contents don't matter
            pad_ref[N:] = jnp.zeros((PAD - N, C), t.dtype)
            pad_ref[:N] = t
            t_pad = pad_ref[...]
            pieces = []
            for h in range(H):
                m = ((lane >= h * D) & (lane < (h + 1) * D)).astype(t.dtype)
                pieces.append(t_pad * m)
            return jnp.concatenate(pieces, axis=0)  # [H*PAD, C]

        k_aug = stack(k, kpad_ref)
        v_aug = stack(v, vpad_ref)
        s = jax.lax.dot_general(k_aug, q, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * SCALE + padmask  # [H*PAD, N] key-major
        s3 = s.reshape(H, PAD, N)
        m3 = jnp.max(s3, axis=1, keepdims=True)
        p3 = jnp.exp(s3 - m3)
        p3 = p3 / jnp.sum(p3, axis=1, keepdims=True)
        p_T = p3.reshape(H * PAD, N).astype(x_ref.dtype)
        acc = jax.lax.dot_general(p_T, v_aug, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32
                                  ).astype(x_ref.dtype)  # [N, C]
        a = jax.lax.dot_general(acc, wout_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32
                                ).astype(x_ref.dtype)
        o_ref[j] = xj + a
        return _
    jax.lax.fori_loop(0, BC, body, 0)


def _pc(kernel):
    scratch = []
    if kernel in (k_headstack, k_blockdiag):
        scratch = [pltpu.VMEM((PAD, C), DT), pltpu.VMEM((PAD, C), DT)]
    return pl.pallas_call(
        kernel,
        grid=(B // BC,),
        scratch_shapes=scratch,
        in_specs=[
            pl.BlockSpec((BC, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 3 * HD), lambda i: (0, 0)),
            pl.BlockSpec((HD, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BC, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), DT),
        compiler_params=CP,
    )


def timeit(fn, *args, n=30):
    out = fn(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    trivial = jax.jit(lambda a: a + 1)
    z = trivial(jnp.zeros(())); _ = float(z)
    t0 = time.perf_counter(); _ = float(trivial(z)); rt = time.perf_counter() - t0
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0 - rt)
    return best / n * 1000


def main():
    variants = sys.argv[1:] or ["full", "projonly", "attnonly", "noloop2"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)), DT)
    g = jnp.asarray(np.ones((1, C)), jnp.float32)
    b = jnp.asarray(np.zeros((1, C)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, DT)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, DT)
    kernels = {"full": k_full, "projonly": k_projonly,
               "attnonly": k_attnonly, "noloop2": k_noloop2,
               "noloop4": k_noloop4, "headstack": k_headstack,
               "blockdiag": k_blockdiag}
    outs = {}
    for name in variants:
        fn = jax.jit(lambda x, g, b, w1, w2, k=kernels[name]: _pc(k)(x, g, b, w1, w2))
        ms = timeit(fn, x, g, b, wqkv, wout)
        outs[name] = fn(x, g, b, wqkv, wout)
        gf = {"full": 44.6, "projonly": 29.6, "attnonly": 15.1,
              "noloop2": 44.6, "noloop4": 44.6, "headstack": 44.6,
              "blockdiag": 44.6}[name]
        print(f"{name:10s} {ms:7.2f} ms   ~{gf / ms:6.1f} TF/s", flush=True)
    for other in ("headstack", "blockdiag"):
        if "full" in outs and other in outs:
            d = jnp.max(jnp.abs(outs["full"].astype(jnp.float32)
                                - outs[other].astype(jnp.float32)))
            print(f"{other} max|diff| vs full: {float(d):.5f}", flush=True)
    if False and "full" in outs and "headstack" in outs:
        d = jnp.max(jnp.abs(outs["full"].astype(jnp.float32)
                            - outs["headstack"].astype(jnp.float32)))
        print(f"headstack max|diff| vs full: {float(d):.5f}", flush=True)


if __name__ == "__main__":
    main()
