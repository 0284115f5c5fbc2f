"""Fused attention BLOCK — qkv projection + attention + out projection in
one Pallas program (the full reference hot path, models/vit.py:16-45 /
models/swin_transformer.py:103-160, as a single kernel).

Why a whole-block kernel: vision attention is short-sequence (49-197
tokens), so per-problem dots are small and the XLA einsum path is
HBM-bound, not MXU-bound — each layer streams the qkv tensor, the [.., N, N]
score tensor, the probability tensor and the attention output through HBM.
Fusing the two projections in means one HBM read of x and one write of the
block output per layer; the projection weights (≤1.8 MB for ViT-S /
Swin-S stages) stay VMEM-resident across the whole batch grid.

    out = softmax((x·Wqkv + bqkv) split heads → q·kᵀ·scale + extra)·v
          → concat heads · Wout + bout

Layouts are model-native end to end: x [B, N, C] (tokens = sublanes,
features = lanes — exactly what the surrounding LayerNorm produces), out
[B, N, Cout].  Heads live at static lane offsets inside the projected
feature dim, so per-head q/k/v are static VMEM views.

``extra`` is an optional additive f32 bias: [H, N, N] shared across the
batch, or [G, H, N, N] grouped — the batch laid out as G contiguous groups
(Swin windows after a window-major partition), group g reading extra[g].

Backward is a second kernel: recompute qkv / scores / probs in VMEM, emit
dx plus weight/bias/extra grads accumulated across the sequential batch
grid (revisited output blocks with constant index maps — the standard TPU
accumulation pattern).  Gradient dots run in the compute dtype (bf16) with
f32 accumulation, matching the XLA einsum path's mixed-precision backward.

``interpret=True`` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_attention import _cp, _env_bc  # shared compiler params (vmem limit)

__all__ = ["fused_attention_block"]


def _head_slices(h: int, dim_head: int, HD: int):
    qs = slice(h * dim_head, (h + 1) * dim_head)
    ks = slice(HD + qs.start, HD + qs.stop)
    vs = slice(2 * HD + qs.start, 2 * HD + qs.stop)
    return qs, ks, vs


def _blk_fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, extra_ref,
                    o_ref, *, scale, bc, n_head, dim_head, has_extra,
                    has_bqkv, has_bout):
    HD = n_head * dim_head

    def body(j, _):
        xj = x_ref[j]                                    # [N, C]
        qkv = jax.lax.dot_general(
            xj, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)                            # [N, 3·HD]
        if has_bqkv:
            qkv = qkv + bqkv_ref[0]
        outs = []
        for h in range(n_head):
            qs, ks, vs = _head_slices(h, dim_head, HD)
            q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_extra:
                s = s + extra_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x_ref.dtype)
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype))
        acc = jnp.concatenate(outs, axis=-1)             # [N, HD]
        out = jax.lax.dot_general(
            acc, wout_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        if has_bout:
            out = out + bout_ref[0]
        o_ref[j] = out
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _blk_bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, extra_ref, do_ref,
                    dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                    dextra_ref, *, scale, bc, n_head, dim_head, has_extra,
                    has_bqkv, has_bout, bpg):
    HD = n_head * dim_head
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init_w():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref[...])
        dwout_ref[...] = jnp.zeros_like(dwout_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])

    if has_extra:
        @pl.when(b % bpg == 0)
        def _init_e():
            dextra_ref[...] = jnp.zeros_like(dextra_ref[...])

    def body(j, _):
        xj = x_ref[j]
        doj = do_ref[j]
        qkv = jax.lax.dot_general(
            xj, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_bqkv:
            qkv = qkv + bqkv_ref[0]

        # recompute per-head probabilities + attention output
        ps, outs = [], []
        for h in range(n_head):
            qs, ks, vs = _head_slices(h, dim_head, HD)
            q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_extra:
                s = s + extra_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)   # [N, N] f32
            ps.append(p)
            outs.append(jax.lax.dot_general(
                p.astype(x_ref.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype))
        acc = jnp.concatenate(outs, axis=-1)             # [N, HD]

        # out-projection backward
        dwout_ref[...] += jax.lax.dot_general(
            acc, doj, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bout:
            dbout_ref[...] += jnp.sum(doj.astype(jnp.float32), axis=0,
                                      keepdims=True)
        dacc = jax.lax.dot_general(
            doj, wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)                            # [N, HD]

        # attention backward per head
        dqs, dks, dvs = [], [], []
        for h in range(n_head):
            qs, ks, vs = _head_slices(h, dim_head, HD)
            q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
            p = ps[h]
            doh = dacc[:, slice(h * dim_head, (h + 1) * dim_head)]
            dvs.append(jax.lax.dot_general(
                p.astype(x_ref.dtype), doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype))
            dp = jax.lax.dot_general(
                doh, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                            # [N, N] f32
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            if has_extra:
                dextra_ref[0, h] += ds
            dsb = (ds * scale).astype(x_ref.dtype)
            dqs.append(jax.lax.dot_general(
                dsb, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype))
            dks.append(jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype))
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # [N, 3·HD]

        # qkv-projection backward
        dwqkv_ref[...] += jax.lax.dot_general(
            xj, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bqkv:
            dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                      keepdims=True)
        dx_ref[j] = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _pick_bc(B: int, N: int, C: int, HD: int, H: int, itemsize: int,
             bwd: bool, has_extra: bool) -> int:
    env = os.environ.get("VTX_FB_BC")
    if env:
        return _env_bc(env, B)
    budget = 9 * 1024 * 1024
    if bwd:
        # x, do, dx [N,C] + qkv, dqkv [N,3HD] + acc, dacc [N,HD] + all-head
        # probs [H,N,N] f32 + score temps [N,N] f32
        per_row = (3 * N * C + 8 * N * HD) * itemsize + (H + 3) * N * N * 4
        fixed = (C * 3 * HD + HD * C) * (itemsize + 4) + \
            (H * N * N * 4 * 2 if has_extra else 0)
    else:
        per_row = (2 * N * C + 5 * N * HD) * itemsize + N * N * 4
        fixed = (C * 3 * HD + HD * C) * itemsize + \
            (H * N * N * 4 if has_extra else 0)
    cap = max(1, (budget - fixed) // max(per_row, 1))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= min(cap, 64):
            best = c
    return best


def _extra_form(extra, B, n_head, N):
    """Normalize to ([G, H, N, N] f32, has_extra, G)."""
    if extra is None:
        return jnp.zeros((1, 1, 1, 1), jnp.float32), 0, 1
    if extra.ndim == 4:
        G = extra.shape[0]
        if B % G != 0:
            raise ValueError(f"batch {B} not divisible by extra groups {G}")
        return extra.astype(jnp.float32), 1, G
    e = jnp.broadcast_to(extra.astype(jnp.float32), (n_head, N, N))
    return e[None], 1, 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _block(x, wqkv, bqkv, wout, bout, extra, n_head, scale, interpret):
    out, _ = _fwd(x, wqkv, bqkv, wout, bout, extra, n_head, scale, interpret)
    return out


def _fwd(x, wqkv, bqkv, wout, bout, extra, n_head, scale, interpret):
    B, N, C = x.shape
    three_hd = wqkv.shape[1]
    HD = three_hd // 3
    dim_head = HD // n_head
    Cout = wout.shape[1]
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    bc = _pick_bc(B // groups, N, C, HD, n_head, x.dtype.itemsize,
                  False, bool(has_extra))
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)
    bo = bout.reshape(1, -1) if has_bout else jnp.zeros((1, 1), x.dtype)

    out = pl.pallas_call(
        functools.partial(
            _blk_fwd_kernel, scale=scale, bc=bc, n_head=n_head,
            dim_head=dim_head, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda b: (0, 0)),
            pl.BlockSpec(bq.shape, lambda b: (0, 0)),
            pl.BlockSpec(wout.shape, lambda b: (0, 0)),
            pl.BlockSpec(bo.shape, lambda b: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda b: (b // bpg, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bc, N, Cout), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Cout), x.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, wqkv, bq, wout, bo, extra_b)
    return out, (x, wqkv, bqkv, wout, bout, extra)


def _bwd(n_head, scale, interpret, res, do):
    x, wqkv, bqkv, wout, bout, extra = res
    B, N, C = x.shape
    three_hd = wqkv.shape[1]
    HD = three_hd // 3
    dim_head = HD // n_head
    Cout = wout.shape[1]
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    bc = _pick_bc(B // groups, N, C, HD, n_head, x.dtype.itemsize,
                  True, bool(has_extra))
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)

    dx, dwqkv, dbqkv, dwout, dbout, dextra = pl.pallas_call(
        functools.partial(
            _blk_bwd_kernel, scale=scale, bc=bc, n_head=n_head,
            dim_head=dim_head, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout, bpg=bpg),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda b: (0, 0)),
            pl.BlockSpec(bq.shape, lambda b: (0, 0)),
            pl.BlockSpec(wout.shape, lambda b: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda b: (b // bpg, 0, 0, 0)),
            pl.BlockSpec((bc, N, Cout), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda b: (0, 0)),
            pl.BlockSpec((1, three_hd), lambda b: (0, 0)),
            pl.BlockSpec(wout.shape, lambda b: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda b: (b // bpg, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, three_hd), jnp.float32),
            jax.ShapeDtypeStruct(wout.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, Cout), jnp.float32),
            jax.ShapeDtypeStruct((groups, eh, em, en), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, wqkv, bq, wout, extra_b, do.astype(x.dtype))

    dbqkv_out = dbqkv[0].astype(bqkv.dtype) if has_bqkv else None
    dbout_out = dbout[0].astype(bout.dtype) if has_bout else None
    if extra is None:
        dextra_out = None
    elif extra.ndim == 4:
        dextra_out = dextra.astype(extra.dtype)
    else:
        d = dextra[0]
        if extra.ndim == 2:
            d = d.sum(0)
        elif extra.shape[0] == 1 and n_head != 1:
            d = d.sum(0, keepdims=True)
        dextra_out = d.astype(extra.dtype)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv_out,
            dwout.astype(wout.dtype), dbout_out, dextra_out)


_block.defvjp(_fwd, _bwd)


def fused_attention_block(x, wqkv, bqkv, wout, bout, n_head: int,
                          extra=None, scale: Optional[float] = None,
                          interpret: bool = False):
    """qkv projection + MHSA + out projection, fused in VMEM.

    x: [B, N, C]; wqkv: [C, 3·H·D]; wout: [H·D, Cout]; bqkv/bout: optional
    biases (pass None to omit); extra: optional additive f32 bias —
    [H, N, N] shared or [G, H, N, N] grouped over a batch laid out as G
    contiguous groups.  Weights should be pre-cast to the compute dtype.
    Returns [B, N, Cout] in x.dtype.
    """
    if scale is None:
        HD = wqkv.shape[1] // 3
        scale = 1.0 / math.sqrt(HD // n_head)
    return _block(x, wqkv, bqkv, wout, bout, extra, n_head, float(scale),
                  interpret)
