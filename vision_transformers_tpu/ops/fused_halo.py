"""Fused Halo attention — rectangular windowed attention in gather-native
layout (reference hot path: models/halo_transformer.py:57-114).

Halo attention is RECTANGULAR: w² queries per window attend to (w+2·halo)²
keys gathered from overlapping neighborhoods.  The XLA einsum path
materializes the [.., w², k²] score tensor in HBM twice (f32 scores +
probabilities) and — measured on v5e — pays another ~10 ms/step of layout
copies moving the neighborhood gather's output into the einsum's preferred
[b, head, S, k², d] form.

This kernel consumes the operands EXACTLY as the model produces them:

    q    [B, M, C]    B = batch·n_windows, M = w², C = n_head·dim_head
                      (window-partitioned queries, heads on lanes)
    kv   [B, N, 2C]   N = (w+2·halo)² — halo_neighborhoods' direct output
                      (k on lanes [0, C), v on lanes [C, 2C))
    bias [H, M, N]    f32 additive rel-pos bias (differentiable — the
                      backward kernel accumulates dbias across the batch
                      grid, the standard TPU revisit pattern)

and writes [B, M, C], the out projection's direct input.  Heads live at
static lane offsets h·D, so per-head q/k/v are static VMEM views — zero
relayouts end to end (same design as fused_attention_qkv).

``interpret=True`` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools
import math
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_attention import _cp, _env_bc

__all__ = ["halo_attention", "halo_attention_direct"]


def _fwd_kernel(q_ref, kv_ref, bias_ref, o_ref, *, scale, bc, n_head,
                dim_head):
    C = n_head * dim_head

    def body(j, _):
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            vsl = slice(C + sl.start, C + sl.stop)
            q = q_ref[j, :, sl]                                  # [M, D]
            k = kv_ref[j, :, sl]                                 # [N, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / l).astype(kv_ref.dtype)
            o_ref[j, :, sl] = jax.lax.dot_general(
                p, kv_ref[j, :, vsl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _bwd_kernel(q_ref, kv_ref, bias_ref, do_ref, dq_ref, dkv_ref, dbias_ref,
                *, scale, bc, n_head, dim_head):
    C = n_head * dim_head
    b = pl.program_id(0)

    def body(j, _):
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            vsl = slice(C + sl.start, C + sl.stop)
            q = q_ref[j, :, sl]
            k = kv_ref[j, :, sl]
            v = kv_ref[j, :, vsl]
            do = do_ref[j, :, sl].astype(jnp.float32)

            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)           # [M, N] f32

            # dv = pᵀ · do
            dkv_ref[j, :, vsl] = jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dkv_ref.dtype)

            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

            @pl.when((b == 0) & (j == 0))
            def _init():
                dbias_ref[h] = jnp.zeros_like(dbias_ref[h])

            dbias_ref[h] += ds

            dsc = ds * scale
            dq_ref[j, :, sl] = jax.lax.dot_general(
                dsc, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype)
            dkv_ref[j, :, sl] = jax.lax.dot_general(
                dsc, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dkv_ref.dtype)
        return _

    jax.lax.fori_loop(0, bc, body, 0)


def _pick_bc(B: int, M: int, N: int, C: int, itemsize: int, n_head: int,
             bwd: bool) -> int:
    env = _os.environ.get("VTX_HALO_BC")
    if env:
        return _env_bc(env, B)
    budget = 9 * 1024 * 1024  # same measured sweet spot as fused_attention
    per_row = (M * C * (3 if bwd else 2) + N * 2 * C * (2 if bwd else 1)) \
        * itemsize
    bias_bytes = n_head * M * N * 4 * (2 if bwd else 1)
    cap = max(1, (budget - bias_bytes - M * N * 4) // per_row)
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= cap:
            best = c
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def halo_attention(q, kv, bias, n_head: int, scale: Optional[float] = None,
                   interpret: bool = False):
    """softmax(q·kᵀ·scale + bias)·v over packed kv, fused in VMEM.

    q: [B, M, C]; kv: [B, N, 2C] (k lanes then v lanes); bias: [H, M, N]
    f32, differentiable.  Returns [B, M, C] in q.dtype.
    """
    out, _ = _fwd(q, kv, bias, n_head, scale, interpret)
    return out


def _fwd(q, kv, bias, n_head, scale, interpret):
    B, M, C = q.shape
    N = kv.shape[1]
    dim_head = C // n_head
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    bias = bias.astype(jnp.float32)
    bc = _pick_bc(B, M, N, C, q.dtype.itemsize, n_head, bwd=False)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, bc=bc, n_head=n_head,
                          dim_head=dim_head),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, M, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((bc, N, 2 * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((n_head, M, N), lambda b: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bc, M, C), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M, C), q.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, kv, bias)
    return out, (q, kv, bias)


def _bwd(n_head, scale, interpret, res, do):
    q, kv, bias = res
    B, M, C = q.shape
    N = kv.shape[1]
    dim_head = C // n_head
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    bc = _pick_bc(B, M, N, C, q.dtype.itemsize, n_head, bwd=True)

    dq, dkv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, bc=bc, n_head=n_head,
                          dim_head=dim_head),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, M, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((bc, N, 2 * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((n_head, M, N), lambda b: (0, 0, 0)),
            pl.BlockSpec((bc, M, C), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc, M, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((bc, N, 2 * C), lambda b: (b, 0, 0)),
            pl.BlockSpec((n_head, M, N), lambda b: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, 2 * C), kv.dtype),
            jax.ShapeDtypeStruct((n_head, M, N), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, kv, bias.astype(jnp.float32), do.astype(q.dtype))
    return dq, dkv, dbias


halo_attention.defvjp(lambda q, kv, bias, n_head, scale, interpret:
                      _fwd(q, kv, bias, n_head, scale, interpret), _bwd)


# ---------------------------------------------------------------------------
# Direct-map halo attention — no neighborhood gather at all
# ---------------------------------------------------------------------------
#
# The gather-consuming kernel above still pays the full materialization of
# [B·win, k², 2C] neighborhoods (2.25× the feature map, written and re-read
# through HBM in awkward layouts) plus its backward scatter — measured
# ~36 ms/step of pads+copies on Halo-S @256.  This kernel removes the
# gather: it reads the zero-PADDED feature map once per batch item (VMEM
# resident across the band grid) and assembles each window's neighborhood
# with ALIGNED in-kernel slices:
#
# - rows: a dynamic slice [wy·w, k) on the untiled leading dim
# - cols: k is padded up to KPAD (next multiple of 8) so every per-window
#   col slice [wx·w, wx·w+KPAD) starts at a sublane-tile boundary; the
#   KPAD−k phantom keys are masked with −1e9 in the bias (their probability
#   underflows to exactly 0, so forward AND backward contributions vanish)
# - the [k, KPAD, 2C] → [k·KPAD, 2C] merge is tile-aligned (KPAD % 8 == 0)
#
# Backward: dq writes are per-window (disjoint); dkv is accumulated per BAND
# in a VMEM scratch (col overlaps stay on-chip) and emitted as disjoint
# [b, hs, k, Wp, 2C] band grads; adjacent bands overlap by 2·halo rows, so
# the fold back to the map is two reshapes + two pads + one add
# (_fold_bands) — no interior-strided scatters (which also crashed XLA's
# fusion pass on the einsum path at batch 128, fusion_util TransformWindow).


def _ceil8(n: int) -> int:
    return (n + 7) // 8 * 8


def _direct_fwd_kernel(q_ref, kvp_ref, bias_ref, o_ref, *, scale, window,
                       halo, ws, n_head, dim_head, kpad):
    k = window + 2 * halo
    C = n_head * dim_head
    wy = pl.program_id(1)
    band = kvp_ref[0, pl.ds(wy * window, k)]          # [k, Wp, 2C]
    for wx in range(ws):
        nb = band[:, wx * window:wx * window + kpad, :]
        nb = nb.reshape(k * kpad, 2 * C)              # tile-aligned merge
        qw = q_ref[0, :, wx * window:(wx + 1) * window, :]
        qw = qw.reshape(window * window, C)
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            s = jax.lax.dot_general(
                qw[:, sl], nb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)   # [M, k·KPAD]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(kvp_ref.dtype)
            o = jax.lax.dot_general(
                p, nb[:, C + h * dim_head:C + (h + 1) * dim_head],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, wx * window:(wx + 1) * window, sl] = (
                o.astype(o_ref.dtype).reshape(window, window, dim_head))


def _direct_bwd_kernel(q_ref, kvp_ref, bias_ref, do_ref,
                       dq_ref, dband_ref, dbias_ref, dkv_acc, *, scale,
                       window, halo, ws, n_head, dim_head, kpad):
    k = window + 2 * halo
    C = n_head * dim_head
    bi, wy = pl.program_id(0), pl.program_id(1)
    band = kvp_ref[0, pl.ds(wy * window, k)]          # [k, Wp, 2C]

    @pl.when((bi == 0) & (wy == 0))
    def _init_bias():
        dbias_ref[...] = jnp.zeros_like(dbias_ref[...])

    dkv_acc[...] = jnp.zeros_like(dkv_acc[...])
    for wx in range(ws):
        nb = band[:, wx * window:wx * window + kpad, :]
        nb = nb.reshape(k * kpad, 2 * C)
        qw = q_ref[0, :, wx * window:(wx + 1) * window, :]
        qw = qw.reshape(window * window, C)
        dow = do_ref[0, :, wx * window:(wx + 1) * window, :]
        dow = dow.reshape(window * window, C)
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            vsl = slice(C + h * dim_head, C + (h + 1) * dim_head)
            s = jax.lax.dot_general(
                qw[:, sl], nb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # [M, k·KPAD] f32
            do_h = dow[:, sl].astype(jnp.float32)

            # dv = pᵀ·do
            dv = jax.lax.dot_general(
                p, do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                do_h, nb[:, vsl].astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            dsc = ds * scale
            dq_ref[0, :, wx * window:(wx + 1) * window, sl] = jax.lax.dot_general(
                dsc, nb[:, sl].astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dq_ref.dtype).reshape(window, window, dim_head)
            dk = jax.lax.dot_general(
                dsc, qw[:, sl].astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cols = slice(wx * window, wx * window + kpad)
            dkv_acc[:, cols, sl] += dk.reshape(k, kpad, dim_head)
            dkv_acc[:, cols, vsl] += dv.reshape(k, kpad, dim_head)
    dband_ref[0, 0] = dkv_acc[...].astype(dband_ref.dtype)


def _fold_bands(bands, window, halo, Hp):
    """Fold disjoint per-band dkv [b, hs, k, Wp, C2] back onto the padded
    map [b, Hp, Wp, C2].  Band wy covers padded rows [wy·w, wy·w+k);
    adjacent bands overlap by 2·halo rows only, so the fold is the low
    (w-row) parts laid out by reshape plus the high (2·halo-row) parts
    shifted by w — two pads and one add, no strided scatters."""
    b, hs, k, Wp, C2 = bands.shape
    lows = bands[:, :, :window].reshape(b, hs * window, Wp, C2)
    highs = jnp.pad(bands[:, :, window:],
                    ((0, 0), (0, 0), (0, 2 * window - k), (0, 0), (0, 0)))
    highs = highs.reshape(b, hs * window, Wp, C2)
    out = jnp.pad(lows, ((0, 0), (0, Hp - hs * window), (0, 0), (0, 0)))
    out = out + jnp.pad(highs, ((0, 0), (window, 0), (0, 0), (0, 0)))[:, :Hp]
    return out


def _direct_prep(q, kv, bias, window, halo, n_head):
    b, H, W, C = q.shape
    k = window + 2 * halo
    assert 2 * halo <= window, (window, halo)  # _fold_bands' 2-band overlap
    kpad = _ceil8(k)
    hs, ws = H // window, W // window
    kv_p = jnp.pad(kv, ((0, 0), (halo, halo),
                        (halo, halo + (kpad - k)), (0, 0)))
    M = window * window
    bias_p = jnp.pad(bias.reshape(n_head, M, k, k),
                     ((0, 0), (0, 0), (0, 0), (0, kpad - k)),
                     constant_values=-1e9).reshape(n_head, M, k * kpad)
    return kv_p, bias_p, k, kpad, hs, ws


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def halo_attention_direct(q, kv, bias, window: int, halo: int, n_head: int,
                          scale: Optional[float] = None,
                          interpret: bool = False):
    """Halo windowed attention straight off the feature map.

    q: [b, H, W, C]; kv: [b, H, W, 2C] (k lanes then v lanes);
    bias: [n_head, w², k²] f32, differentiable.  Returns [b, H, W, C].
    """
    out, _ = _direct_fwd(q, kv, bias, window, halo, n_head, scale, interpret)
    return out


def _direct_fwd(q, kv, bias, window, halo, n_head, scale, interpret):
    b, H, W, C = q.shape
    dim_head = C // n_head
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    kv_p, bias_p, k, kpad, hs, ws = _direct_prep(q, kv, bias, window, halo,
                                                 n_head)
    Hp, Wp = kv_p.shape[1], kv_p.shape[2]
    M = window * window

    out = pl.pallas_call(
        functools.partial(_direct_fwd_kernel, scale=scale, window=window,
                          halo=halo, ws=ws, n_head=n_head, dim_head=dim_head,
                          kpad=kpad),
        grid=(b, hs),
        in_specs=[
            pl.BlockSpec((1, window, W, C), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec((1, Hp, Wp, 2 * C), lambda b, y: (b, 0, 0, 0)),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, window, W, C), lambda b, y: (b, y, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, H, W, C), q.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, kv_p, bias_p)
    return out, (q, kv, bias)


def _direct_bwd(window, halo, n_head, scale, interpret, res, do):
    from jax.experimental.pallas import tpu as pltpu

    q, kv, bias = res
    b, H, W, C = q.shape
    dim_head = C // n_head
    if scale is None:
        scale = 1.0 / math.sqrt(dim_head)
    kv_p, bias_p, k, kpad, hs, ws = _direct_prep(q, kv, bias, window, halo,
                                                 n_head)
    Hp, Wp = kv_p.shape[1], kv_p.shape[2]
    M = window * window
    dq, dbands, dbias = pl.pallas_call(
        functools.partial(_direct_bwd_kernel, scale=scale, window=window,
                          halo=halo, ws=ws, n_head=n_head, dim_head=dim_head,
                          kpad=kpad),
        grid=(b, hs),
        in_specs=[
            pl.BlockSpec((1, window, W, C), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec((1, Hp, Wp, 2 * C), lambda b, y: (b, 0, 0, 0)),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
            pl.BlockSpec((1, window, W, C), lambda b, y: (b, y, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, window, W, C), lambda b, y: (b, y, 0, 0)),
            pl.BlockSpec((1, 1, k, Wp, 2 * C), lambda b, y: (b, y, 0, 0, 0)),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, H, W, C), q.dtype),
            jax.ShapeDtypeStruct((b, hs, k, Wp, 2 * C), kv.dtype),
            jax.ShapeDtypeStruct((n_head, M, k * kpad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k, Wp, 2 * C), jnp.float32)],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(q, kv_p, bias_p, do.astype(q.dtype))

    dkv_p = _fold_bands(dbands, window, halo, Hp)
    dkv = dkv_p[:, halo:halo + H, halo:halo + W]
    dbias_out = dbias.reshape(n_head, M, k, kpad)[..., :k] \
        .reshape(n_head, M, k * k)
    return dq, dkv, dbias_out


halo_attention_direct.defvjp(
    lambda q, kv, bias, window, halo, n_head, scale, interpret:
    _direct_fwd(q, kv, bias, window, halo, n_head, scale, interpret),
    _direct_bwd)
