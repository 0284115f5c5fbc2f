"""Fused transformer-LAYER halves — each pre-LN residual branch as one
Pallas program:

    attention half:  z = x + r ⊙ OutProj(MHSA(QkvProj(LN₁(x))))
    feed-forward  :  z = x + r ⊙ (act(LN₂(x)·W₁ + b₁)·W₂ + b₂)

(reference layer structure: models/vit.py:48-66 / swin_transformer.py:163-197;
``r`` is the per-sample DropPath keep-mask/keep-prob, models/layer.py:166-183.)

Motivation (PERF.md round 2): with attention fused (ops/fused_block.py) the
Swin-S step is still ~2.2× above its MXU floor — the residue is LayerNorm /
residual / activation HBM traffic: every pre-LN layer streams its activation
tensor through HBM ~14 times.  Fusing each residual branch end to end makes
it 2 reads + 2 writes per layer, with all intermediates (LN stats, qkv,
scores, probabilities, FF hidden) living in VMEM and the projection weights
resident across the whole batch grid.

Numerics match the unfused path: LN statistics in f32 (flax's fast-variance
form, scale folded into rsqrt), softmax in f32, dots in the compute dtype
with f32 accumulation; backward recomputes everything in VMEM and
accumulates weight/bias/extra grads across the sequential batch grid
(revisited output blocks, constant index maps).

``extra`` (attention half) is the additive [H, N, N] / grouped [G, H, N, N]
bias, as in ops/fused_block.py.  ``row_scale`` is an optional [B] f32 vector
(DropPath masks); its cotangent is computed exactly.

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
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _cp, _env_bc
from .fused_block import _extra_form, _head_slices

__all__ = ["fused_attention_layer", "fused_ff_layer"]


def _layer_unroll() -> int:
    """Row-loop unroll factor (VTX_LAYER_UNROLL, falls back to
    VTX_L1_UNROLL).  Full-step A/Bs decide the shipped default; the
    isolated stage-1 fwd win is 5.35 -> 4.63 -> 4.22 ms at 1/2/4
    (scripts/exp_kernel_dissect.py round 5)."""
    env = os.environ.get("VTX_LAYER_UNROLL") or os.environ.get("VTX_L1_UNROLL")
    return max(1, int(env)) if env else 4


# A/B knob (read at import): store the backward's per-head attention
# probabilities in bf16 instead of f32 (see the softmax in the bwd kernel)
_BF16_P = os.environ.get("VTX_BF16_P") in ("1", "true", "on")


# ---------------------------------------------------------------------------
# shared LayerNorm pieces (flax numerics: f32 stats, fast variance,
# scale folded into rsqrt — flax/linen/normalization.py semantics)
# ---------------------------------------------------------------------------


def _ln_fwd(xf, g_ref, b_ref, eps):
    """xf: [N, C] f32 → (u f32, xhat f32, r f32 [N,1])."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * r
    u = xhat * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    return u, xhat, r


def _ln_bwd(dln, xhat, r, g_ref):
    """dln: [N, C] f32 → dx f32; returns (dx, dg_partial, db_partial)."""
    dg = jnp.sum(dln * xhat, axis=0, keepdims=True)
    db = jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * g_ref[0].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = r * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def _act_fwd(h, kind):
    if kind == "silu":
        return h * jax.nn.sigmoid(h)
    if kind == "gelu":  # tanh approximation (jax.nn.gelu default)
        return jax.nn.gelu(h, approximate=True)
    raise ValueError(kind)


def _act_bwd(h, kind):
    """d act / d h at h (f32)."""
    if kind == "silu":
        s = jax.nn.sigmoid(h)
        return s + h * s * (1.0 - s)
    if kind == "gelu":
        c = math.sqrt(2.0 / math.pi)
        t = jnp.tanh(c * (h + 0.044715 * h ** 3))
        dt = (1.0 - t * t) * c * (1.0 + 3 * 0.044715 * h * h)
        return 0.5 * (1.0 + t) + 0.5 * h * dt
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# attention half
# ---------------------------------------------------------------------------


def _attn_layer_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                           bout_ref, extra_ref, rs_ref, o_ref,
                           acc_ref=None, sqkv_ref=None, *,
                           scale, eps, bc, n_head, dim_head, has_extra,
                           has_bqkv, has_bout, has_rs, rs_global,
                           save="none"):
    HD = n_head * dim_head
    row0 = pl.program_id(0) * bc if rs_global else 0

    def body(j, _):
        xj = x_ref[j]
        u, _unused_xhat, _unused_r = _ln_fwd(xj.astype(jnp.float32), g_ref, b_ref, eps)
        u = u.astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            u, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_bqkv:
            qkv = qkv + bqkv_ref[0]
        if save == "acc+qkv":
            sqkv_ref[j] = qkv
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
        acc = jnp.concatenate(outs, axis=-1)
        if save != "none":
            acc_ref[j] = acc
        a = jax.lax.dot_general(
            acc, wout_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_bout:
            a = a + bout_ref[0]
        if has_rs:
            rv = rs_ref[row0 + j, 0]  # SMEM scalar
            a = a * rv.astype(x_ref.dtype)
        o_ref[j] = xj + a
        return _

    _u = _layer_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row interleave (see ops/fused_layer1.py::_l1_unroll):
        # Mosaic only lowers fori unroll=1/full; independent rows give the
        # scheduler MXU passes to overlap
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


def _attn_layer_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                           bout_ref, extra_ref, rs_ref, do_ref,
                           acc_ref, sqkv_ref,
                           dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref,
                           dwout_ref, dbout_ref, dextra_ref, drs_ref, *,
                           scale, eps, bc, n_head, dim_head, has_extra,
                           has_bqkv, has_bout, has_rs, rs_global, bpg,
                           save="none"):
    HD = n_head * dim_head
    b = pl.program_id(0)
    row0 = b * bc if rs_global else 0

    @pl.when(b == 0)
    def _init_w():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dwout_ref[...] = jnp.zeros_like(dwout_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])

    if has_extra:
        @pl.when(b % bpg == 0)
        def _init_e():
            dextra_ref[...] = jnp.zeros_like(dextra_ref[...])

    def body(j, _):
        xj = x_ref[j]
        dz = do_ref[j]
        u_f, xhat, r = _ln_fwd(xj.astype(jnp.float32), g_ref, b_ref, eps)
        u = u_f.astype(x_ref.dtype)
        if save == "acc+qkv":
            # qkv saved by the vjp forward — skip the projection recompute
            # (worth it when C ≥ ~256: the dot costs more than the HBM
            # round-trip of the [bc, N, 3HD] tensor)
            qkv = sqkv_ref[j]
        else:
            qkv = jax.lax.dot_general(
                u, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
            if has_bqkv:
                qkv = qkv + bqkv_ref[0]

        ps = []
        for h in range(n_head):
            qs, ks, vs = _head_slices(h, dim_head, HD)
            q, k = qkv[:, qs], qkv[:, ks]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if has_extra:
                s = s + extra_ref[0, h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            # VTX_BF16_P=1: hold the per-head probabilities in bf16 between
            # their uses (halves their VMEM/register footprint; the dots
            # cast to bf16 anyway — only the f32 ds composition loses
            # precision).  A/B knob for the round-2 "bf16 score storage"
            # lead; measured default off (PERF.md round 4).
            ps.append(p.astype(x_ref.dtype) if _BF16_P else p)
        if save != "none":
            # acc saved by the vjp forward — skips n_head LOW-DENSITY
            # [N,N]·[N,D] av dots per row (the per-head pass floor is the
            # backward's cost driver, PERF.md round 3)
            acc = acc_ref[j]
        else:
            outs = []
            for h in range(n_head):
                vs = _head_slices(h, dim_head, HD)[2]
                outs.append(jax.lax.dot_general(
                    ps[h].astype(x_ref.dtype), qkv[:, vs],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x_ref.dtype))
            acc = jnp.concatenate(outs, axis=-1)

        if has_rs:
            rv = rs_ref[row0 + j, 0]  # SMEM scalar
            da = dz * rv.astype(x_ref.dtype)
        else:
            da = dz

        dwout_ref[...] += jax.lax.dot_general(
            acc, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bout:
            dbout_ref[...] += jnp.sum(da.astype(jnp.float32), axis=0,
                                      keepdims=True)
        if has_rs:
            # drs = Σ dz ⊙ a with a = acc·wout + bout; reassociate so no
            # extra dot is needed: Σ dz⊙(acc·wout) = Σ (dz·woutᵀ)⊙acc, and
            # dacc = rv·(dz·woutᵀ) reuses the same product.
            dacc0 = jax.lax.dot_general(
                dz, wout_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            drs = jnp.sum(dacc0 * acc.astype(jnp.float32))
            if has_bout:
                drs = drs + jnp.sum(
                    dz.astype(jnp.float32)
                    * bout_ref[0].astype(jnp.float32))
            drs_ref[row0 + j, 0] = drs
            rv = rs_ref[row0 + j, 0]
            dacc = (dacc0 * rv.astype(jnp.float32)).astype(x_ref.dtype)
        else:
            dacc = jax.lax.dot_general(
                da, wout_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)

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
            )
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
        dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)

        dwqkv_ref[...] += jax.lax.dot_general(
            u, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bqkv:
            dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                      keepdims=True)
        dln = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ln, dgp, dbp = _ln_bwd(dln, xhat, r, g_ref)
        dg_ref[...] += dgp
        db_ref[...] += dbp
        dx_ref[j] = dz + dx_ln.astype(x_ref.dtype)
        return _

    _u = _layer_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row interleave (see ops/fused_layer1.py::_l1_unroll):
        # Mosaic only lowers fori unroll=1/full; independent rows give the
        # scheduler MXU passes to overlap
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


def _pick_bc_attn(B, N, C, HD, H, itemsize, bwd, has_extra):
    env = os.environ.get("VTX_FL_BC")
    if env:
        return _env_bc(env, B)
    budget = 9 * 1024 * 1024
    if bwd:
        per_row = (4 * N * C + 8 * N * HD) * itemsize \
            + (H + 3) * N * N * 4 + 3 * N * C * 4
        fixed = (C * 3 * HD + HD * C) * (itemsize + 4) + \
            (H * N * N * 4 * 2 if has_extra else 0)
    else:
        per_row = (3 * N * C + 5 * N * HD) * itemsize + N * N * 4 + N * C * 4
        fixed = (C * 3 * HD + HD * C) * itemsize + \
            (H * N * N * 4 if has_extra else 0)
    cap = max(1, (budget - fixed) // max(per_row, 1))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= min(cap, 64):
            best = c
    return best


def _rs_form(row_scale, B, dtype):
    if row_scale is None:
        return jnp.zeros((1, 1), jnp.float32), 0
    return row_scale.astype(jnp.float32).reshape(B, 1), 1


def _rs_spec(rs_b, has_rs, bc):
    """SMEM spec for the per-row DropPath scales + whether the kernel must
    index rows GLOBALLY (program_id·bc + j).

    Mosaic's per-dimension block rule (divisible by (8, 128) or equal to the
    array dim) also applies to SMEM windows: a (bc, 1) block needs
    bc % 8 == 0.  When bc isn't 8-aligned, fall back to the full [B, 1]
    array resident in SMEM (those are the small-B tail stages, so a few
    hundred bytes — a LARGE full array would blow the 1 MB scalar memory,
    which is why blocked windows are preferred)."""
    if not has_rs:
        return pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM), False
    if bc % 8 == 0:
        return pl.BlockSpec((bc, 1), lambda i: (i, 0),
                            memory_space=pltpu.SMEM), False
    return pl.BlockSpec(rs_b.shape, lambda i: (0, 0),
                        memory_space=pltpu.SMEM), True


def _save_mode(C: int) -> str:
    """What the vjp forward saves for the backward kernel.

    "acc" always pays off: it replaces n_head low-density [N,N]·[N,D] av
    dots per row with one [bc,N,HD] HBM round-trip.  "acc+qkv" additionally
    skips the qkv projection recompute — a win only when the dot outweighs
    the [bc,N,3HD] traffic, i.e. C ≥ ~256 (2C/82 TF/s vs 4 B/819 GB/s per
    element).  VTX_FL_SAVE overrides: none | acc | qkv (= acc+qkv) | auto."""
    env = os.environ.get("VTX_FL_SAVE", "auto")
    if env in ("0", "none"):
        return "none"
    if env == "acc":
        return "acc"
    if env in ("1", "qkv", "acc+qkv"):
        return "acc+qkv"
    return "acc+qkv" if C >= 256 else "acc"


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _attn_layer(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                n_head, scale, eps, interpret):
    out, _ = _attn_layer_fwd(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                             n_head, scale, eps, interpret, save="none")
    return out


def _attn_layer_fwd(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                    n_head, scale, eps, interpret, save=None):
    B, N, C = x.shape
    HD = wqkv.shape[1] // 3
    dim_head = HD // n_head
    if save is None:
        save = _save_mode(C)
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    rs_b, has_rs = _rs_form(rs, B, x.dtype)
    bc = _pick_bc_attn(B // groups, N, C, HD, n_head, x.dtype.itemsize,
                       False, bool(has_extra))
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)
    bo = bout.reshape(1, -1) if has_bout else jnp.zeros((1, 1), x.dtype)
    # per-row scalars live in SMEM as a per-block window ((bc,1) VECTOR
    # blocks are rejected by Mosaic's (8,128) tiling rule, a [1,1]->[N,C]
    # vector broadcast is unimplemented, and a full [B,1] SMEM array
    # overflows the 1MB scalar memory at large B)
    rs_spec, rs_global = _rs_spec(rs_b, has_rs, bc)

    out_specs = [pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, N, C), x.dtype)]
    if save != "none":
        out_specs.append(pl.BlockSpec((bc, N, HD), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, N, HD), x.dtype))
    if save == "acc+qkv":
        out_specs.append(pl.BlockSpec((bc, N, 3 * HD), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, N, 3 * HD), x.dtype))

    outs = pl.pallas_call(
        functools.partial(
            _attn_layer_fwd_kernel, scale=scale, eps=eps, bc=bc,
            n_head=n_head, dim_head=dim_head, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout, has_rs=bool(has_rs),
            rs_global=rs_global, save=save),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(bq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wout.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda i: (i // bpg, 0, 0, 0)),
            rs_spec,
        ],
        out_specs=out_specs if save != "none" else out_specs[0],
        out_shape=out_shape if save != "none" else out_shape[0],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g.reshape(1, -1), b.reshape(1, -1), wqkv, bq, wout, bo, extra_b, rs_b)
    if save == "none":
        out, acc, sqkv = outs, None, None
    elif save == "acc":
        (out, acc), sqkv = outs, None
    else:
        out, acc, sqkv = outs
    return out, (x, g, b, wqkv, bqkv, wout, bout, extra, rs, acc, sqkv)


def _attn_layer_fwd_rule(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                         n_head, scale, eps, interpret):
    # the xla backward differentiates the jnp reference and never reads the
    # saved residuals — don't pay their HBM writes in that A/B
    save = "none" if (not interpret and _bwd_impl() == "xla") else None
    return _attn_layer_fwd(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                           n_head, scale, eps, interpret, save=save)


def _attn_layer_ref(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                    n_head, scale, eps):
    """Pure-jnp reference of the fused attention layer — same math and cast
    points as the Pallas kernel (LN stats f32, dots f32-accumulated then
    cast to the compute dtype, softmax f32).  Used by the XLA backward."""
    B, N, C = x.shape
    HD = wqkv.shape[1] // 3
    D = HD // n_head
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    u = ((xf - mu) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
         + b.astype(jnp.float32)).astype(x.dtype)
    qkv = jnp.einsum("bnc,ck->bnk", u, wqkv,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bqkv is not None:
        qkv = qkv + bqkv
    q = qkv[..., :HD].reshape(B, N, n_head, D)
    k = qkv[..., HD:2 * HD].reshape(B, N, n_head, D)
    v = qkv[..., 2 * HD:].reshape(B, N, n_head, D)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if extra is not None:
        if extra.ndim == 4:  # grouped [G, H, N, N]
            G = extra.shape[0]
            s = (s.reshape(G, B // G, n_head, N, N)
                 + extra.astype(jnp.float32)[:, None]).reshape(B, n_head, N, N)
        else:
            e = jnp.broadcast_to(extra.astype(jnp.float32), (n_head, N, N))
            s = s + e[None]
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    acc = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                     preferred_element_type=jnp.float32
                     ).astype(x.dtype).reshape(B, N, HD)
    a = jnp.einsum("bnk,kc->bnc", acc, wout,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if bout is not None:
        a = a + bout
    if rs is not None:
        a = a * rs[:, None, None].astype(a.dtype)
    return x + a


def _bwd_impl() -> str:
    """Backward implementation for the fused attention layer.

    "pallas" (default, measured): the hand-written kernel recomputes the
    forward in VMEM.  "xla" differentiates the jnp reference — tried in
    round 3 against the dependency-serialization tax, and REGRESSED the
    full Swin-S step 906 → 626 img/s/chip: jax.vjp re-runs the whole XLA
    forward inside the backward and materializes the [B,H,N,N]
    probabilities through HBM (~226 MB at stage 1), which costs far more
    than the serialization it avoids.  Kept as a switch for future A/Bs."""
    return os.environ.get("VTX_FL_BWD", "pallas")


def _attn_layer_bwd_xla(n_head, scale, eps, res, do):
    x, g, b, wqkv, bqkv, wout, bout, extra, rs = res[:9]

    def f(x, g, b, wqkv, bqkv, wout, bout, extra, rs):
        return _attn_layer_ref(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                               n_head, scale, eps)

    _, vjp = jax.vjp(f, x, g, b, wqkv, bqkv, wout, bout, extra, rs)
    return vjp(do.astype(x.dtype))


def _attn_layer_bwd(n_head, scale, eps, interpret, res, do):
    if not interpret and _bwd_impl() == "xla":
        return _attn_layer_bwd_xla(n_head, scale, eps, res, do)
    x, g, b, wqkv, bqkv, wout, bout, extra, rs = res[:9]
    # 9-element residuals (hand-built in tests/the xla path) mean nothing
    # was saved — full recompute
    acc, sqkv = (res[9], res[10]) if len(res) == 11 else (None, None)
    save = ("acc+qkv" if sqkv is not None
            else "acc" if acc is not None else "none")
    B, N, C = x.shape
    three_hd = wqkv.shape[1]
    HD = three_hd // 3
    dim_head = HD // n_head
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    rs_b, has_rs = _rs_form(rs, B, x.dtype)
    bc = _pick_bc_attn(B // groups, N, C, HD, n_head, x.dtype.itemsize,
                       True, bool(has_extra))
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)
    bo = bout.reshape(1, -1) if has_bout else jnp.zeros((1, 1), x.dtype)
    # per-row scalars live in SMEM as a per-block window ((bc,1) VECTOR
    # blocks are rejected by Mosaic's (8,128) tiling rule, a [1,1]->[N,C]
    # vector broadcast is unimplemented, and a full [B,1] SMEM array
    # overflows the 1MB scalar memory at large B)
    rs_spec, rs_global = _rs_spec(rs_b, has_rs, bc)

    acc_in = acc if acc is not None else jnp.zeros((1, 1, 1), x.dtype)
    sqkv_in = sqkv if sqkv is not None else jnp.zeros((1, 1, 1), x.dtype)
    acc_spec = (pl.BlockSpec((bc, N, HD), lambda i: (i, 0, 0))
                if acc is not None
                else pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)))
    sqkv_spec = (pl.BlockSpec((bc, N, three_hd), lambda i: (i, 0, 0))
                 if sqkv is not None
                 else pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _attn_layer_bwd_kernel, scale=scale, eps=eps, bc=bc,
            n_head=n_head, dim_head=dim_head, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout, has_rs=bool(has_rs),
            rs_global=rs_global, bpg=bpg, save=save),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(bq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wout.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda i: (i // bpg, 0, 0, 0)),
            rs_spec,
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            acc_spec,
            sqkv_spec,
        ],
        out_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, three_hd), lambda i: (0, 0)),
            pl.BlockSpec(wout.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda i: (i // bpg, 0, 0, 0)),
            rs_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, three_hd), jnp.float32),
            jax.ShapeDtypeStruct(wout.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((groups, eh, em, en), jnp.float32),
            jax.ShapeDtypeStruct((B, 1) if has_rs else (1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g.reshape(1, -1), b.reshape(1, -1), wqkv, bq, wout, bo, extra_b,
      rs_b, do.astype(x.dtype), acc_in, sqkv_in)
    dx, dg, db, dwqkv, dbqkv, dwout, dbout, dextra, drs = outs

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
    drs_out = drs.reshape(B).astype(rs.dtype) if has_rs else None
    return (dx, dg[0].astype(g.dtype), db[0].astype(b.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv_out,
            dwout.astype(wout.dtype), dbout_out, dextra_out, drs_out)


_attn_layer.defvjp(_attn_layer_fwd_rule, _attn_layer_bwd)


def fused_attention_layer(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout,
                          n_head: int, extra=None, row_scale=None,
                          scale: Optional[float] = None, eps: float = 1e-6,
                          interpret: bool = False):
    """Pre-LN attention residual branch, fused:
    ``x + row_scale ⊙ OutProj(MHSA(QkvProj(LN(x))))``.

    x: [B, N, C]; ln_scale/ln_bias: [C]; wqkv: [C, 3·H·D]; wout: [H·D, C];
    extra: optional [H, N, N] / grouped [G, H, N, N] additive bias;
    row_scale: optional [B] f32 (per-sample DropPath scale).  Weights
    pre-cast to the compute dtype; LN params f32.
    """
    if scale is None:
        HD = wqkv.shape[1] // 3
        scale = 1.0 / math.sqrt(HD // n_head)
    return _attn_layer(x, ln_scale, ln_bias, wqkv, bqkv, wout, bout, extra,
                       row_scale, n_head, float(scale), float(eps), interpret)


# ---------------------------------------------------------------------------
# feed-forward half
# ---------------------------------------------------------------------------


def _ff_fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   rs_ref, o_ref, *, eps, bc, act, has_b1, has_b2, has_rs,
                   rs_global):
    row0 = pl.program_id(0) * bc if rs_global else 0

    def body(j, _):
        xj = x_ref[j]
        u, _unused_xhat, _unused_r = _ln_fwd(xj.astype(jnp.float32), g_ref, b_ref, eps)
        u = u.astype(x_ref.dtype)
        h = jax.lax.dot_general(
            u, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b1:
            h = h + b1_ref[0]
        a = _act_fwd(h.astype(jnp.float32), act).astype(x_ref.dtype)
        out = jax.lax.dot_general(
            a, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b2:
            out = out + b2_ref[0]
        if has_rs:
            rv = rs_ref[row0 + j, 0]  # SMEM scalar
            out = out * rv.astype(x_ref.dtype)
        o_ref[j] = xj + out
        return _

    _u = _layer_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row interleave (see ops/fused_layer1.py::_l1_unroll):
        # Mosaic only lowers fori unroll=1/full; independent rows give the
        # scheduler MXU passes to overlap
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


def _ff_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   rs_ref, do_ref,
                   dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                   db2_ref, drs_ref, *, eps, bc, act, has_b1, has_b2,
                   has_rs, rs_global):
    i = pl.program_id(0)
    row0 = i * bc if rs_global else 0

    @pl.when(i == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])

    def body(j, _):
        xj = x_ref[j]
        dz = do_ref[j]
        u_f, xhat, r = _ln_fwd(xj.astype(jnp.float32), g_ref, b_ref, eps)
        u = u_f.astype(x_ref.dtype)
        h = jax.lax.dot_general(
            u, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b1:
            h = h + b1_ref[0]
        hf = h.astype(jnp.float32)
        a = _act_fwd(hf, act).astype(x_ref.dtype)

        if has_rs:
            out = jax.lax.dot_general(
                a, w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_b2:
                out = out + b2_ref[0].astype(jnp.float32)
            drs_ref[row0 + j, 0] = jnp.sum(dz.astype(jnp.float32) * out)
            rv = rs_ref[row0 + j, 0]  # SMEM scalar
            dout = dz * rv.astype(x_ref.dtype)
        else:
            dout = dz

        dw2_ref[...] += jax.lax.dot_general(
            a, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_b2:
            db2_ref[...] += jnp.sum(dout.astype(jnp.float32), axis=0,
                                    keepdims=True)
        da = jax.lax.dot_general(
            dout, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh = (da * _act_bwd(hf, act)).astype(x_ref.dtype)
        dw1_ref[...] += jax.lax.dot_general(
            u, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_b1:
            db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0,
                                    keepdims=True)
        dln = jax.lax.dot_general(
            dh, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ln, dgp, dbp = _ln_bwd(dln, xhat, r, g_ref)
        dg_ref[...] += dgp
        db_ref[...] += dbp
        dx_ref[j] = dz + dx_ln.astype(x_ref.dtype)
        return _

    _u = _layer_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row interleave (see ops/fused_layer1.py::_l1_unroll):
        # Mosaic only lowers fori unroll=1/full; independent rows give the
        # scheduler MXU passes to overlap
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


def _pick_bc_ff(B, N, C, F, itemsize, bwd):
    env = os.environ.get("VTX_FL_BC")
    if env:
        return _env_bc(env, B)
    budget = 9 * 1024 * 1024
    if bwd:
        per_row = (4 * N * C + 4 * N * F) * itemsize + \
            (2 * N * C + 2 * N * F) * 4
        fixed = 2 * C * F * (itemsize + 4)
    else:
        per_row = (3 * N * C + 2 * N * F) * itemsize + 2 * N * C * 4
        fixed = 2 * C * F * itemsize
    cap = max(1, (budget - fixed) // max(per_row, 1))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= min(cap, 64):
            best = c
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ff_layer(x, g, b, w1, b1, w2, b2, rs, act, eps, interpret):
    out, _ = _ff_layer_fwd(x, g, b, w1, b1, w2, b2, rs, act, eps, interpret)
    return out


def _ff_layer_fwd(x, g, b, w1, b1, w2, b2, rs, act, eps, interpret):
    B, N, C = x.shape
    F = w1.shape[1]
    rs_b, has_rs = _rs_form(rs, B, x.dtype)
    bc = _pick_bc_ff(B, N, C, F, x.dtype.itemsize, False)
    has_b1, has_b2 = b1 is not None, b2 is not None
    b1_ = b1.reshape(1, -1) if has_b1 else jnp.zeros((1, 1), x.dtype)
    b2_ = b2.reshape(1, -1) if has_b2 else jnp.zeros((1, 1), x.dtype)
    # per-row scalars live in SMEM as a per-block window ((bc,1) VECTOR
    # blocks are rejected by Mosaic's (8,128) tiling rule, a [1,1]->[N,C]
    # vector broadcast is unimplemented, and a full [B,1] SMEM array
    # overflows the 1MB scalar memory at large B)
    rs_spec, rs_global = _rs_spec(rs_b, has_rs, bc)

    out = pl.pallas_call(
        functools.partial(_ff_fwd_kernel, eps=eps, bc=bc, act=act,
                          has_b1=has_b1, has_b2=has_b2, has_rs=bool(has_rs),
                          rs_global=rs_global),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1_.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2_.shape, lambda i: (0, 0)),
            rs_spec,
        ],
        out_specs=pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g.reshape(1, -1), b.reshape(1, -1), w1, b1_, w2, b2_, rs_b)
    return out, (x, g, b, w1, b1, w2, b2, rs)


def _ff_layer_bwd(act, eps, interpret, res, do):
    x, g, b, w1, b1, w2, b2, rs = res
    B, N, C = x.shape
    F = w1.shape[1]
    rs_b, has_rs = _rs_form(rs, B, x.dtype)
    bc = _pick_bc_ff(B, N, C, F, x.dtype.itemsize, True)
    has_b1, has_b2 = b1 is not None, b2 is not None
    b1_ = b1.reshape(1, -1) if has_b1 else jnp.zeros((1, 1), x.dtype)
    b2_ = b2.reshape(1, -1) if has_b2 else jnp.zeros((1, 1), x.dtype)
    # per-row scalars live in SMEM as a per-block window ((bc,1) VECTOR
    # blocks are rejected by Mosaic's (8,128) tiling rule, a [1,1]->[N,C]
    # vector broadcast is unimplemented, and a full [B,1] SMEM array
    # overflows the 1MB scalar memory at large B)
    rs_spec, rs_global = _rs_spec(rs_b, has_rs, bc)

    outs = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, eps=eps, bc=bc, act=act,
                          has_b1=has_b1, has_b2=has_b2, has_rs=bool(has_rs),
                          rs_global=rs_global),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(b1_.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(b2_.shape, lambda i: (0, 0)),
            rs_spec,
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            rs_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1) if has_rs else (1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g.reshape(1, -1), b.reshape(1, -1), w1, b1_, w2, b2_, rs_b,
      do.astype(x.dtype))
    dx, dg, db, dw1, db1, dw2, db2, drs = outs

    return (dx, dg[0].astype(g.dtype), db[0].astype(b.dtype),
            dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype) if has_b1 else None,
            dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype) if has_b2 else None,
            drs.reshape(B).astype(rs.dtype) if has_rs else None)


_ff_layer.defvjp(_ff_layer_fwd, _ff_layer_bwd)


def fused_ff_layer(x, ln_scale, ln_bias, w1, b1, w2, b2,
                   activation: str = "silu", row_scale=None,
                   eps: float = 1e-6, interpret: bool = False):
    """Pre-LN feed-forward residual branch, fused:
    ``x + row_scale ⊙ (act(LN(x)·W₁ + b₁)·W₂ + b₂)``.

    x: [B, N, C]; w1: [C, F]; w2: [F, C]; activation: "silu" | "gelu"
    (tanh approximation); row_scale: optional [B] f32 DropPath scale.
    """
    return _ff_layer(x, ln_scale, ln_bias, w1, b1, w2, b2, row_scale,
                     activation, float(eps), interpret)
