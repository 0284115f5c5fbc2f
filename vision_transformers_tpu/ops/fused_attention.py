"""Fused short-sequence attention — the Pallas TPU kernel for vision models.

Vision-transformer attention is short-sequence (ViT-S/16 @224: 197 tokens;
Swin windows: 49; PVT stage 1 kv: 49) — the whole per-(batch, head) problem
fits in VMEM.  Unlike long-context flash attention there is no online
softmax: the kernel computes

    out = softmax(q·kᵀ·scale + extra) · v

entirely on-chip — one HBM read of q/k/v, one write of out.  The XLA einsum
path materializes the [.., M, N] score tensor in HBM twice (f32 scores +
probabilities); fusing removes that traffic.  ``extra`` is an optional
additive [G, M, N] term carrying Swin's relative-position bias + shift mask,
Halo's bias, or padding masks — folded into one tensor by the caller.

Layout: q [B, G, M, D], k/v [B, G, N, D], G = heads (× windows).  The grid
chunks both B and G so each step runs a few dozen MXU dots back to back;
operands stay at their *logical* shapes — Mosaic's internal tiling handles
the non-128 tails without explicit HBM padding copies.

Backward is a second kernel (recompute scores in VMEM, emit dq/dk/dv/dextra)
wired through ``jax.custom_vjp``; dextra accumulates across the sequential
B grid dimension (revisiting an output block across grid steps is the
standard TPU accumulation pattern).

``interpret=True`` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU compiler params (absent on pure-CPU builds)
    import os as _os_

    from jax.experimental.pallas import tpu as pltpu

    _COMPILER_PARAMS = pltpu.CompilerParams(
        vmem_limit_bytes=int(_os_.environ.get("VTX_VMEM_MB", "32")) * 1024 * 1024)
except Exception:  # pragma: no cover
    _COMPILER_PARAMS = None


def _cp(interpret):
    return None if interpret else _COMPILER_PARAMS


def _env_bc(env: str, B: int) -> int:
    """Validate a VTX_*_BC tuning override: a chunk size that doesn't divide
    the batch would leave ``grid=(B // bc,)`` silently skipping the tail rows
    (unwritten output = garbage).  Round DOWN to the nearest divisor of B."""
    bc = max(1, min(int(env), B))
    while B % bc != 0:
        bc -= 1
    return bc


__all__ = ["fused_attention", "fused_attention_qkv"]


def _fwd_kernel(q_ref, k_ref, v_ref, extra_ref, o_ref, *, scale, bc, gc, has_extra):
    def body(idx, _):
        j, i = idx // gc, idx % gc
        q = q_ref[j, i]                      # [M, D]
        k = k_ref[j, i]                      # [N, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),  # q·kᵀ
            preferred_element_type=jnp.float32,
        ) * scale
        if has_extra:
            s = s + extra_ref[i].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v_ref.dtype)
        o_ref[j, i] = jax.lax.dot_general(
            p, v_ref[j, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        return _

    # fori_loop (not Python unroll): Mosaic reuses one iteration's stack
    jax.lax.fori_loop(0, bc * gc, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, extra_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dextra_ref, *, scale, bc, gc, has_extra):
    b = pl.program_id(0)

    def body(idx, _):
        j, i = idx // gc, idx % gc
        q = q_ref[j, i]
        k = k_ref[j, i]
        v = v_ref[j, i]
        do = do_ref[j, i].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if has_extra:
            s = s + extra_ref[i].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)   # [M, N] f32

        # dv = pᵀ · do
        dv_ref[j, i] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        # dp = do · vᵀ ; ds = p ⊙ (dp − rowsum(dp ⊙ p))
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [M, N] f32

        if has_extra:
            @pl.when((b == 0) & (j == 0))
            def _init():
                dextra_ref[i] = jnp.zeros_like(dextra_ref[i])

            dextra_ref[i] += ds

        dsc = ds * scale
        dq_ref[j, i] = jax.lax.dot_general(
            dsc, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[j, i] = jax.lax.dot_general(
            dsc, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc * gc, body, 0)


import os as _os


def _pick_chunks(B: int, G: int, M: int, N: int, D: int, itemsize: int,
                 bwd: bool = False, has_extra: bool = False):
    """Chunk (B, G) so each grid step runs enough dots to amortize step
    overhead, within a VMEM budget (blocks double-buffered by Mosaic)."""

    env = _os.environ.get("VTX_FA_CHUNKS")
    if env:
        bc, gc = (int(x) for x in env.split(","))
        return _env_bc(str(bc), B), _env_bc(str(gc), G)

    def divisor_at_most(n, cap):
        best = 1
        for c in range(1, n + 1):
            if n % c == 0 and c <= cap:
                best = c
        return best

    budget = 9 * 1024 * 1024  # measured sweet spot on v5e (see bench logs)
    gc = divisor_at_most(G, 8)
    if bwd:
        # resident per (b, g): q, do, dq [M,D] + k, v, dk, dv [N,D]
        per_group = (3 * M + 4 * N) * D * itemsize
    else:
        # resident per (b, g): q, out [M,D] + k, v [N,D]
        per_group = 2 * (M + N) * D * itemsize
    extra_bytes = (gc * M * N * 4) * (2 if bwd else 1) if has_extra else 0
    cap = max(1, (budget - extra_bytes - M * N * 4) // max(per_group * gc, 1))
    bc = divisor_at_most(B, min(cap, max(64 // gc, 1)))
    return bc, gc


def _broadcast_extra(extra, G, M, N):
    if extra is None:
        return jnp.zeros((1, 1, 1), jnp.float32), 0
    e = jnp.broadcast_to(extra.astype(jnp.float32), (G, M, N))
    return e, 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, extra=None, scale: Optional[float] = None,
                    interpret: bool = False):
    """softmax(q·kᵀ·scale + extra)·v, fused in VMEM.

    q: [B, G, M, D]; k, v: [B, G, N, D]; extra: broadcastable to [G, M, N]
    (additive, f32; rel-pos bias / shift masks), or None.
    Returns [B, G, M, D] in q.dtype.
    """
    out, _ = _fwd(q, k, v, extra, scale, interpret)
    return out


def _fwd(q, k, v, extra, scale, interpret):
    B, G, M, D = q.shape
    N = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    extra_b, has_extra = _broadcast_extra(extra, G, M, N)
    eg, em, en = extra_b.shape
    bc, gc = _pick_chunks(B, G, M, N, D, q.dtype.itemsize, bwd=False,
                          has_extra=bool(has_extra))
    if has_extra:
        extra_spec = pl.BlockSpec((gc, em, en), lambda b, c: (c, 0, 0))
    else:
        extra_spec = pl.BlockSpec((1, 1, 1), lambda b, c: (0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, bc=bc, gc=gc,
                          has_extra=bool(has_extra)),
        grid=(B // bc, G // gc),
        in_specs=[
            pl.BlockSpec((bc, gc, M, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            extra_spec,
        ],
        out_specs=pl.BlockSpec((bc, gc, M, D), lambda b, c: (b, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, G, M, D), q.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, k, v, extra_b)
    return out, (q, k, v, extra)


def _bwd(scale, interpret, res, do):
    q, k, v, extra = res
    B, G, M, D = q.shape
    N = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    extra_b, has_extra = _broadcast_extra(extra, G, M, N)
    eg, em, en = extra_b.shape
    bc, gc = _pick_chunks(B, G, M, N, D, q.dtype.itemsize, bwd=True,
                          has_extra=bool(has_extra))
    if has_extra:
        extra_spec = pl.BlockSpec((gc, em, en), lambda b, c: (c, 0, 0))
    else:
        extra_spec = pl.BlockSpec((1, 1, 1), lambda b, c: (0, 0, 0))

    dq, dk, dv, dextra = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, bc=bc, gc=gc,
                          has_extra=bool(has_extra)),
        grid=(B // bc, G // gc),
        in_specs=[
            pl.BlockSpec((bc, gc, M, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            extra_spec,
            pl.BlockSpec((bc, gc, M, D), lambda b, c: (b, c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc, gc, M, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((bc, gc, N, D), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((gc, M, N), lambda b, c: (c, 0, 0)) if has_extra
            else pl.BlockSpec((1, 1, 1), lambda b, c: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, M, D), q.dtype),
            jax.ShapeDtypeStruct((B, G, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, G, N, D), v.dtype),
            jax.ShapeDtypeStruct((G, M, N) if has_extra else (1, 1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, k, v, extra_b, do.astype(q.dtype))

    if extra is None:
        dextra_out = None
    else:
        d = dextra
        # un-broadcast to the caller's extra shape
        if extra.ndim == 2:
            d = d.sum(0)
        elif extra.shape[0] == 1 and G != 1:
            d = d.sum(0, keepdims=True)
        dextra_out = d.astype(extra.dtype)
    return dq, dk, dv, dextra_out


fused_attention.defvjp(lambda q, k, v, extra, scale, interpret:
                       _fwd(q, k, v, extra, scale, interpret), _bwd)



# ---------------------------------------------------------------------------
# Packed-qkv self-attention in model-native layout
# ---------------------------------------------------------------------------
#
# The round-1 kernel took q/k/v in [B, G, M, D]; getting there from the fused
# qkv projection's [B, N, 3·H·D] output costs two HBM relayouts per layer
# (transpose in, transpose out) that XLA cannot fuse into the custom call —
# measured to eat the kernel's entire win in-model (PERF.md round-1).  This
# entry reads the projection output EXACTLY as produced — a flat
# [B, N, 3·H·D] tensor whose trailing dims (tokens, features) are already the
# natural (sublane, lane) tiling — and writes [B, N, H·D], the out
# projection's direct input.  Heads live at static lane offsets h·D inside
# the feature dim, so the per-head q/k/v slices are static VMEM views
# (a lane rotate at worst, no HBM traffic).  Zero relayouts end to end.
#
# Grid: 1-D over batch chunks; each step runs n_head × bc attention problems
# back to back (the head loop is Python-unrolled — indices must be static
# for Mosaic's tiled-memory views; bc iterates via fori_loop).


def _qkv_fwd_kernel(qkv_ref, extra_ref, o_ref, *, scale, bc, n_head, dim_head,
                    has_extra):
    HD = n_head * dim_head

    def body(j, _):
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            q = qkv_ref[j, :, sl]                               # [N, D]
            k = qkv_ref[j, :, slice(HD + sl.start, HD + sl.stop)]
            v = qkv_ref[j, :, slice(2 * HD + sl.start, 2 * HD + sl.stop)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_extra:
                s = s + extra_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(qkv_ref.dtype)
            o_ref[j, :, sl] = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _qkv_bwd_kernel(qkv_ref, extra_ref, do_ref, dqkv_ref, dextra_ref, *,
                    scale, bc, n_head, dim_head, has_extra, blocks_per_group):
    HD = n_head * dim_head
    b = pl.program_id(0)

    def body(j, _):
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            ksl = slice(HD + sl.start, HD + sl.stop)
            vsl = slice(2 * HD + sl.start, 2 * HD + sl.stop)
            q = qkv_ref[j, :, sl]
            k = qkv_ref[j, :, ksl]
            v = qkv_ref[j, :, vsl]
            do = do_ref[j, :, sl].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_extra:
                s = s + extra_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)   # [N, N] f32

            dqkv_ref[j, :, vsl] = jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)

            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

            if has_extra:
                # dextra block is revisited across the batch blocks of its
                # group; zero it on the group's first visit
                @pl.when((b % blocks_per_group == 0) & (j == 0))
                def _init():
                    dextra_ref[0, h] = jnp.zeros_like(dextra_ref[0, h])

                dextra_ref[0, h] += ds

            dsc = ds * scale
            dqkv_ref[j, :, sl] = jax.lax.dot_general(
                dsc, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)
            dqkv_ref[j, :, ksl] = jax.lax.dot_general(
                dsc, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _qkv_pick_bc(B: int, N: int, C: int, itemsize: int, bwd: bool,
                 n_head: int, has_extra: bool) -> int:
    env = _os.environ.get("VTX_FA_QKV_BC")
    if env:
        return _env_bc(env, B)
    budget = 9 * 1024 * 1024
    # resident per batch row: qkv [N, C] + out [N, C/3] (+ dqkv, do on bwd)
    per_row = N * C * itemsize * ((1 + 1 + 2 / 3) if bwd else (1 + 1 / 3))
    extra_bytes = (n_head * N * N * 4) * (2 if bwd else 1) if has_extra else 0
    cap = max(1, int((budget - extra_bytes - N * N * 4) // per_row))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= cap:
            best = c
    return best


def _qkv_extra_form(extra, B, n_head, N):
    """Normalize extra to [G, H, N, N] (G=1 when shared across the batch).

    A 4-D extra is GROUPED: the batch dim is laid out as G contiguous groups
    of B/G rows, and group g gets extra[g] (Swin: g = window identity after a
    window-major partition).  2-D/3-D extras broadcast to one shared group.
    """
    if extra is None:
        return jnp.zeros((1, 1, 1, 1), jnp.float32), 0, 1
    if extra.ndim == 4:
        G = extra.shape[0]
        if B % G != 0:
            raise ValueError(f"batch {B} not divisible by extra groups {G}")
        return extra.astype(jnp.float32), 1, G
    e = jnp.broadcast_to(extra.astype(jnp.float32), (n_head, N, N))
    return e[None], 1, 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def fused_attention_qkv(qkv, n_head: int, extra=None,
                        scale: Optional[float] = None,
                        interpret: bool = False):
    """Self-attention straight from the packed qkv projection.

    qkv: [B, N, 3·H·D] — the fused projection's output, untouched (reference
    hot path models/vit.py:16-45).  extra: optional additive bias/mask —
    [H, N, N] shared over the batch, or [G, H, N, N] grouped (batch laid out
    as G contiguous groups; Swin windows).  Returns [B, N, H·D], the out
    projection's direct input.
    """
    out, _ = _qkv_fwd(qkv, n_head, extra, scale, interpret)
    return out


def _qkv_fwd(qkv, n_head, extra, scale, interpret):
    B, N, C = qkv.shape
    assert C % (3 * n_head) == 0, (C, n_head)
    dim_head = C // (3 * n_head)
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    extra_b, has_extra, groups = _qkv_extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    bc = _qkv_pick_bc(B // groups, N, C, qkv.dtype.itemsize, False, n_head,
                      bool(has_extra))
    bpg = (B // groups) // bc  # batch blocks per extra group
    extra_spec = pl.BlockSpec((1, eh, em, en), lambda b: (b // bpg, 0, 0, 0))

    out = pl.pallas_call(
        functools.partial(_qkv_fwd_kernel, scale=scale, bc=bc, n_head=n_head,
                          dim_head=dim_head, has_extra=bool(has_extra)),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            extra_spec,
        ],
        out_specs=pl.BlockSpec((bc, N, C // 3), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C // 3), qkv.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(qkv, extra_b)
    return out, (qkv, extra)


def _qkv_bwd(n_head, scale, interpret, res, do):
    qkv, extra = res
    B, N, C = qkv.shape
    dim_head = C // (3 * n_head)
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    extra_b, has_extra, groups = _qkv_extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    bc = _qkv_pick_bc(B // groups, N, C, qkv.dtype.itemsize, True, n_head,
                      bool(has_extra))
    bpg = (B // groups) // bc
    extra_spec = pl.BlockSpec((1, eh, em, en), lambda b: (b // bpg, 0, 0, 0))

    dqkv, dextra = pl.pallas_call(
        functools.partial(_qkv_bwd_kernel, scale=scale, bc=bc, n_head=n_head,
                          dim_head=dim_head, has_extra=bool(has_extra),
                          blocks_per_group=bpg),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            extra_spec,
            pl.BlockSpec((bc, N, C // 3), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc, N, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, n_head, N, N), lambda b: (b // bpg, 0, 0, 0))
            if has_extra else pl.BlockSpec((1, 1, 1, 1), lambda b: (0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            jax.ShapeDtypeStruct((groups, n_head, N, N) if has_extra
                                 else (1, 1, 1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(qkv, extra_b, do.astype(qkv.dtype))

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
    return dqkv, dextra_out


fused_attention_qkv.defvjp(
    lambda qkv, n_head, extra, scale, interpret:
        _qkv_fwd(qkv, n_head, extra, scale, interpret),
    _qkv_bwd)
