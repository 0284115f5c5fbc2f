"""Fused short-sequence attention — the Pallas TPU kernel for vision models.

Vision-transformer attention is short-sequence (ViT-S/16 @224: 197 tokens;
Swin windows: 49; PVT stage 1: 3136 q × 49 kv) — the whole per-(batch, head)
problem fits in VMEM.  So unlike long-context flash attention there is no
online softmax: the kernel computes

    out = softmax(q·kᵀ·scale + extra) · v

entirely on-chip — one HBM read of q/k/v, one write of out.  The XLA einsum
path materializes the [.., M, N] score tensor in HBM twice (f32 scores +
probabilities); for ViT-S that is the single largest non-parameter traffic
in the step.  ``extra`` is an optional additive [G, M, N] term that carries
Swin's relative-position bias + shift mask, Halo's halo bias, or padding
masks — all folded into one tensor by the caller.

Layout: q [B, G, M, D], k/v [B, G, N, D] where G = heads (× windows).  The
grid is (B, G/chunk); each step processes ``chunk`` groups with 2D MXU dots
(M,N padded to the 128-lane / dtype-sublane tile, D padded to 128).

The backward pass is a second kernel (recompute scores in VMEM, emit
dq/dk/dv/dextra) wired through ``jax.custom_vjp``; dextra accumulates across
the batch grid dimension — TPU grids execute sequentially, so revisiting the
same output block is a legal accumulation pattern.

Caller-facing entry points pad/unpad automatically.  ``interpret=True`` runs
the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_attention"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_to(x, shape):
    pads = [(0, t - s) for s, t in zip(x.shape, shape)]
    if all(p == (0, 0) for p in pads):
        return x
    return jnp.pad(x, pads)


NEG_INF = -1e9


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, extra_ref, o_ref, *, scale, chunk):
    for i in range(chunk):
        q = q_ref[0, i]                      # [Mp, Dp]
        k = k_ref[0, i]                      # [Np, Dp]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),  # q·kᵀ
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + extra_ref[i].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / l).astype(v_ref.dtype)
        o_ref[0, i] = jax.lax.dot_general(
            p, v_ref[0, i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, extra_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dextra_ref, *, scale, chunk):
    b = pl.program_id(0)
    for i in range(chunk):
        q = q_ref[0, i]
        k = k_ref[0, i]
        v = v_ref[0, i]
        do = do_ref[0, i].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + extra_ref[i].astype(jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / l                                           # [Mp, Np] f32

        # dv = pᵀ · do
        dv_ref[0, i] = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)

        # dp = do · vᵀ ; ds = p ⊙ (dp − rowsum(dp ⊙ p))
        dp = jax.lax.dot_general(
            do, v.astype(do.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [Mp, Np] f32

        @pl.when(b == 0)
        def _init():
            dextra_ref[i] = jnp.zeros_like(dextra_ref[i])

        dextra_ref[i] += ds.astype(dextra_ref.dtype)

        dsc = (ds * scale).astype(q.dtype)
        dq_ref[0, i] = jax.lax.dot_general(
            dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)
        dk_ref[0, i] = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrapper
# ---------------------------------------------------------------------------

def _tile_m(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _padded_dims(M, N, D, dtype):
    mp = _round_up(M, max(_tile_m(dtype), 8))
    np_ = _round_up(N, 128)
    dp = _round_up(D, 128)
    return mp, np_, dp


def _prep(q, k, v, extra):
    """Pad operands; fold the kv padding mask into extra (f32 [G, Mp, Np])."""
    B, G, M, D = q.shape
    N = k.shape[2]
    mp, np_, dp = _padded_dims(M, N, D, q.dtype)

    qp = _pad_to(q, (B, G, mp, dp))
    kp = _pad_to(k, (B, G, np_, dp))
    vp = _pad_to(v, (B, G, np_, dp))

    if extra is None:
        extra_b = jnp.zeros((G, mp, np_), jnp.float32)
    else:
        extra_b = jnp.broadcast_to(extra.astype(jnp.float32), (G, M, N))
        extra_b = _pad_to(extra_b, (G, mp, np_))
    if np_ != N:
        col = jnp.arange(np_) >= N
        extra_b = jnp.where(col[None, None, :], NEG_INF, extra_b)
    return qp, kp, vp, extra_b, (mp, np_, dp)


def _pick_chunk(G: int) -> int:
    for c in (8, 4, 2):
        if G % c == 0:
            return c
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, extra=None, scale: Optional[float] = None,
                    interpret: bool = False):
    """softmax(q·kᵀ·scale + extra)·v, fused in VMEM.

    q: [B, G, M, D]; k, v: [B, G, N, D]; extra: broadcastable to [G, M, N]
    (additive, f32; carries rel-pos bias / shift masks), or None.
    Returns [B, G, M, D] in q.dtype.
    """
    out, _ = _fwd(q, k, v, extra, scale, interpret)
    return out


def _fwd(q, k, v, extra, scale, interpret):
    B, G, M, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    qp, kp, vp, extra_b, (mp, np_, dp) = _prep(q, k, v, extra)
    chunk = _pick_chunk(G)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, chunk=chunk),
        grid=(B, G // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, mp, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((chunk, mp, np_), lambda b, c: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, mp, dp), lambda b, c: (b, c, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, G, mp, dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, extra_b)
    return out[:, :, :M, :D], (q, k, v, extra)


def _bwd(scale, interpret, res, do):
    q, k, v, extra = res
    B, G, M, D = q.shape
    N = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    qp, kp, vp, extra_b, (mp, np_, dp) = _prep(q, k, v, extra)
    dop = _pad_to(do.astype(q.dtype), (B, G, mp, dp))
    chunk = _pick_chunk(G)

    dq, dk, dv, dextra = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, chunk=chunk),
        grid=(B, G // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, mp, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((chunk, mp, np_), lambda b, c: (c, 0, 0)),
            pl.BlockSpec((1, chunk, mp, dp), lambda b, c: (b, c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, mp, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, np_, dp), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((chunk, mp, np_), lambda b, c: (c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, mp, dp), q.dtype),
            jax.ShapeDtypeStruct((B, G, np_, dp), k.dtype),
            jax.ShapeDtypeStruct((B, G, np_, dp), v.dtype),
            jax.ShapeDtypeStruct((G, mp, np_), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, extra_b, dop)

    dq = dq[:, :, :M, :D]
    dk = dk[:, :, :N, :D]
    dv = dv[:, :, :N, :D]

    if extra is None:
        dextra_out = None
    else:
        d = dextra[:, :M, :N]
        # un-broadcast to the caller's extra shape
        if extra.ndim == 2:
            d = d.sum(0)
        elif extra.shape[0] == 1 and G != 1:
            d = d.sum(0, keepdims=True)
        dextra_out = d.astype(extra.dtype)
    return dq, dk, dv, dextra_out


fused_attention.defvjp(lambda q, k, v, extra, scale, interpret:
                       _fwd(q, k, v, extra, scale, interpret), _bwd)
