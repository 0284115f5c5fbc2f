"""ONE custom call per transformer layer — both pre-LN residual branches
(attention half + feed-forward half) fused into a single Pallas program:

    z = x + r₁ ⊙ OutProj(MHSA(QkvProj(LN₁(x))))
    o = z + r₂ ⊙ (act(LN₂(z)·W₁ + b₁)·W₂ + b₂)

(reference layer structure: models/vit.py:48-66 / swin_transformer.py:163-197;
``r₁``/``r₂`` are per-sample DropPath keep-mask/keep-prob scales,
models/layer.py:166-183.)

Motivation (PERF.md round 3): the dependent-custom-call serialization tax.
With the attention half fused (ops/fused_layer.py) and the FF half on XLA,
each layer's backward is a Pallas custom call CHAINED behind an XLA segment;
the measured cost of that boundary is +2-4 ms/layer on the Swin-S backward
(scripts/exp_chain_tax.py — XLA cannot hide a dependent custom call's
prologue/DMA behind the previous op's compute).  Fusing the FF half INTO the
attention kernel removes one boundary per layer: the stack becomes a chain
of N identical custom calls with no interleaved XLA segments.  The known
risk (why VTX_FF_KERNEL=1 as a SECOND kernel regressed, PERF.md) is the FF
backward's per-row weight-grad dots trailing XLA's one giant batched dot
(+~1.1 ms/layer isolated on ViT-S) — whether the boundary saving beats that
penalty is exactly what the full-step A/B decides.

Numerics are identical to the fused_layer.py composition: LN statistics in
f32 (flax fast-variance form), softmax in f32, dots in the compute dtype
with f32 accumulation, activation in f32; backward recomputes in VMEM and
accumulates weight/bias/extra grads across the sequential batch grid.

The vjp forward saves ``z`` (the attention-half output — the FF half's
input, so the backward never re-runs the attention forward), ``acc`` (the
pre-projection attention output) and optionally ``qkv`` — the same
measured saving ladder as ops/fused_layer.py (VTX_L1_SAVE overrides).

``extra`` is the additive [H, N, N] / grouped [G, H, N, N] attention bias;
``rs`` packs the two per-sample DropPath scales as one [B, 2] f32 SMEM
array (column 0: attention branch, column 1: FF branch).

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

from .fused_attention import _env_bc
from .fused_block import _extra_form, _head_slices
from .fused_layer import _BF16_P, _act_bwd, _act_fwd, _ln_bwd, _ln_fwd

__all__ = ["fused_transformer_layer"]


def _l1_vmem_mb() -> int:
    """layer1's scoped-VMEM default is 64 MB, not the kernels' global 32:
    stage 4's backward block residents exceed 32 MB and the full-step A/B
    (PERF.md round 4) picked 64 over 48/96.  VTX_L1_VMEM_MB overrides just
    this kernel; a global VTX_VMEM_MB force wins for A/B sweeps."""
    env = os.environ.get("VTX_L1_VMEM_MB") or os.environ.get("VTX_VMEM_MB")
    return int(env) if env else 64


def _cp(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_l1_vmem_mb() * 1024 * 1024)


def _l1_unroll() -> int:
    """Row-loop unroll factor (VTX_L1_UNROLL; measured default 4).

    Manual interleave of independent rows gives the Mosaic scheduler MXU
    passes to overlap (exp_kernel_dissect.py round 5: 5.35/4.63/4.22 ms
    fwd at 1/2/4 on the Swin stage-1 shape; full-step A/Bs: Swin-S
    981→1021, ViT-S 3845→4094 img/s/chip at unroll=4, the plateau —
    unroll=8 ties at 2.4× the compile time).  PERF.md round 5."""
    env = os.environ.get("VTX_L1_UNROLL")
    return max(1, int(env)) if env else 4


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _l1_fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref,
                   bout_ref, g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref,
                   b2f_ref, extra_ref, rs_ref, o_ref,
                   z_ref=None, acc_ref=None, sqkv_ref=None, *,
                   scale, eps, bc, n_head, dim_head, act, has_extra,
                   has_bqkv, has_bout, has_b1f, has_b2f, has_rs, rs_global,
                   save="none"):
    HD = n_head * dim_head
    row0 = pl.program_id(0) * bc if rs_global else 0

    def body(j, _):
        xj = x_ref[j]
        # ---- attention half -------------------------------------------
        u1, _xh, _r = _ln_fwd(xj.astype(jnp.float32), g1_ref, b1_ref, eps)
        u1 = u1.astype(x_ref.dtype)
        qkv = jax.lax.dot_general(
            u1, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_bqkv:
            qkv = qkv + bqkv_ref[0]
        if save == "z+acc+qkv":
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
            a = a * rs_ref[row0 + j, 0].astype(x_ref.dtype)
        z = xj + a
        if save != "none":
            z_ref[j] = z
        # ---- feed-forward half -----------------------------------------
        u2, _xh2, _r2 = _ln_fwd(z.astype(jnp.float32), g2_ref, b2_ref, eps)
        u2 = u2.astype(x_ref.dtype)
        hid = jax.lax.dot_general(
            u2, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b1f:
            hid = hid + b1f_ref[0]
        af = _act_fwd(hid.astype(jnp.float32), act).astype(x_ref.dtype)
        out = jax.lax.dot_general(
            af, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b2f:
            out = out + b2f_ref[0]
        if has_rs:
            out = out * rs_ref[row0 + j, 1].astype(x_ref.dtype)
        o_ref[j] = z + out
        return _

    _u = _l1_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row unroll — Mosaic's fori_loop only lowers unroll=1 or
        # full unroll; interleaving U independent rows gives the scheduler
        # MXU passes to overlap (exp_kernel_dissect: 5.35 -> 4.63 -> 4.22 ms
        # fwd at U=1/2/4 on the Swin stage-1 shape)
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


def _l1_bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref,
                   bout_ref, g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref,
                   b2f_ref, extra_ref, rs_ref, do_ref,
                   z_ref, acc_ref, sqkv_ref,
                   dx_ref, dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref,
                   dwout_ref, dbout_ref, dg2_ref, db2_ref, dw1_ref,
                   db1f_ref, dw2_ref, db2f_ref, dextra_ref, drs_ref, *,
                   scale, eps, bc, n_head, dim_head, act, has_extra,
                   has_bqkv, has_bout, has_b1f, has_b2f, has_rs, rs_global,
                   bpg, save):
    HD = n_head * dim_head
    b = pl.program_id(0)
    row0 = b * bc if rs_global else 0

    @pl.when(b == 0)
    def _init_w():
        dg1_ref[...] = jnp.zeros_like(dg1_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref[...])
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref[...])
        dwout_ref[...] = jnp.zeros_like(dwout_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])
        dg2_ref[...] = jnp.zeros_like(dg2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        db1f_ref[...] = jnp.zeros_like(db1f_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2f_ref[...] = jnp.zeros_like(db2f_ref[...])

    if has_extra:
        @pl.when(b % bpg == 0)
        def _init_e():
            dextra_ref[...] = jnp.zeros_like(dextra_ref[...])

    def body(j, _):
        xj = x_ref[j]
        do = do_ref[j]
        zj = z_ref[j]

        # ---- FF half backward (input z, cotangent do) -------------------
        u2_f, xhat2, r2 = _ln_fwd(zj.astype(jnp.float32), g2_ref, b2_ref, eps)
        u2 = u2_f.astype(x_ref.dtype)
        hid = jax.lax.dot_general(
            u2, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x_ref.dtype)
        if has_b1f:
            hid = hid + b1f_ref[0]
        hf = hid.astype(jnp.float32)
        af = _act_fwd(hf, act).astype(x_ref.dtype)

        if has_rs:
            # drs₂ = Σ do ⊙ (af·W₂ + b₂); reassociate Σ do⊙(af·W₂) =
            # Σ (do·W₂ᵀ)⊙af so da0 = do·W₂ᵀ is reused for da = r₂·da0.
            da0 = jax.lax.dot_general(
                do, w2_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            drs2 = jnp.sum(da0 * af.astype(jnp.float32))
            if has_b2f:
                drs2 = drs2 + jnp.sum(
                    do.astype(jnp.float32) * b2f_ref[0].astype(jnp.float32))
            drs_ref[row0 + j, 1] = drs2
            rv2 = rs_ref[row0 + j, 1]
            dout = do * rv2.astype(x_ref.dtype)
            da = (da0 * rv2.astype(jnp.float32)).astype(x_ref.dtype)
        else:
            dout = do
            da = jax.lax.dot_general(
                dout, w2_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)

        dw2_ref[...] += jax.lax.dot_general(
            af, dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_b2f:
            db2f_ref[...] += jnp.sum(dout.astype(jnp.float32), axis=0,
                                     keepdims=True)
        dh = (da.astype(jnp.float32) * _act_bwd(hf, act)).astype(x_ref.dtype)
        dw1_ref[...] += jax.lax.dot_general(
            u2, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_b1f:
            db1f_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0,
                                     keepdims=True)
        dln2 = jax.lax.dot_general(
            dh, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dz_ln, dg2p, db2p = _ln_bwd(dln2, xhat2, r2, g2_ref)
        dg2_ref[...] += dg2p
        db2_ref[...] += db2p
        dz = do + dz_ln.astype(x_ref.dtype)  # cotangent at z

        # ---- attention half backward (input x, cotangent dz) ------------
        u1_f, xhat1, r1 = _ln_fwd(xj.astype(jnp.float32), g1_ref, b1_ref, eps)
        u1 = u1_f.astype(x_ref.dtype)
        if save == "z+acc+qkv":
            qkv = sqkv_ref[j]
        else:
            qkv = jax.lax.dot_general(
                u1, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x_ref.dtype)
            if has_bqkv:
                qkv = qkv + bqkv_ref[0]

        ps = []
        for h in range(n_head):
            qs, ks, _vs = _head_slices(h, dim_head, HD)
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
            # VTX_BF16_P: bf16 probability storage A/B (see fused_layer.py)
            ps.append(p.astype(x_ref.dtype) if _BF16_P else p)
        acc = acc_ref[j]  # saved by the vjp forward (always, in this kernel)

        if has_rs:
            rv1 = rs_ref[row0 + j, 0]
            da_att = dz * rv1.astype(x_ref.dtype)
        else:
            da_att = dz

        dwout_ref[...] += jax.lax.dot_general(
            acc, da_att, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bout:
            dbout_ref[...] += jnp.sum(da_att.astype(jnp.float32), axis=0,
                                      keepdims=True)
        if has_rs:
            dacc0 = jax.lax.dot_general(
                dz, wout_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            drs1 = jnp.sum(dacc0 * acc.astype(jnp.float32))
            if has_bout:
                drs1 = drs1 + jnp.sum(
                    dz.astype(jnp.float32) * bout_ref[0].astype(jnp.float32))
            drs_ref[row0 + j, 0] = drs1
            rv1 = rs_ref[row0 + j, 0]
            dacc = (dacc0 * rv1.astype(jnp.float32)).astype(x_ref.dtype)
        else:
            dacc = jax.lax.dot_general(
                da_att, wout_ref[...], (((1,), (1,)), ((), ())),
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
            u1, dqkv, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if has_bqkv:
            dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0,
                                      keepdims=True)
        dln1 = jax.lax.dot_general(
            dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx_ln, dg1p, db1p = _ln_bwd(dln1, xhat1, r1, g1_ref)
        dg1_ref[...] += dg1p
        db1_ref[...] += db1p
        dx_ref[j] = dz + dx_ln.astype(x_ref.dtype)
        return _

    _u = _l1_unroll()
    if _u > 1 and bc % _u == 0:
        # manual row unroll — Mosaic's fori_loop only lowers unroll=1 or
        # full unroll; interleaving U independent rows gives the scheduler
        # MXU passes to overlap (exp_kernel_dissect: 5.35 -> 4.63 -> 4.22 ms
        # fwd at U=1/2/4 on the Swin stage-1 shape)
        def _ubody(jj, carry):
            for _off in range(_u):
                body(jj * _u + _off, carry)
            return carry
        jax.lax.fori_loop(0, bc // _u, _ubody, 0)
    else:
        jax.lax.fori_loop(0, bc, body, 0)


# ---------------------------------------------------------------------------
# block-chunk picking / argument forms
# ---------------------------------------------------------------------------


def _pick_bc(B, N, C, HD, F, H, itemsize, bwd, has_extra, save):
    env = os.environ.get("VTX_L1_BC") or os.environ.get("VTX_FL_BC")
    if env:
        return _env_bc(env, B)
    limit = _l1_vmem_mb() * 1024 * 1024
    # fixed: both weight sets resident across the grid (+ f32 grad
    # accumulators in bwd) + the extra slab (+ its grad)
    welems = C * 3 * HD + HD * C + 2 * C * F
    fixed = welems * (itemsize + (4 if bwd else 0)) \
        + (H * N * N * 4 * (2 if bwd else 1) if has_extra else 0)
    # temporaries (per ROW, not per bc): probabilities + FF hidden chain
    temps = (H + 3) * N * N * 4 + 4 * N * F * 4 + 6 * N * C * 4
    # per-bc-row HBM block residents: bwd reads x/do/z/acc (+qkv) and
    # writes dx; fwd reads x and writes o (+z/acc/qkv when saving)
    saved = 0 if save == "none" else N * C + N * HD \
        + (N * 3 * HD if save == "z+acc+qkv" else 0)
    if bwd:
        per_row = (3 * N * C + saved) * itemsize
    else:
        per_row = (2 * N * C + saved) * itemsize
    budget = int(limit * 0.65) - fixed - temps
    cap = max(1, budget // max(per_row, 1))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= min(cap, 64):
            best = c
    return best


def _rs2_form(rs, B):
    """Pack (rs_attn, rs_ff) — each [B] f32 or None — into [B, 2] f32."""
    rs_attn, rs_ff = rs
    if rs_attn is None and rs_ff is None:
        return jnp.zeros((1, 2), jnp.float32), 0
    one = jnp.ones((B,), jnp.float32)
    a = one if rs_attn is None else rs_attn.astype(jnp.float32)
    f = one if rs_ff is None else rs_ff.astype(jnp.float32)
    return jnp.stack([a, f], axis=1), 1


def _rs2_spec(rs_b, has_rs, bc):
    """SMEM spec for the [B, 2] DropPath scales (same Mosaic block rule as
    ops/fused_layer.py::_rs_spec: (bc, 2) windows need bc % 8 == 0, else the
    full array rides resident and rows are indexed globally)."""
    if not has_rs:
        return pl.BlockSpec((1, 2), lambda i: (0, 0),
                            memory_space=pltpu.SMEM), False
    if bc % 8 == 0:
        return pl.BlockSpec((bc, 2), lambda i: (i, 0),
                            memory_space=pltpu.SMEM), False
    return pl.BlockSpec(rs_b.shape, lambda i: (0, 0),
                        memory_space=pltpu.SMEM), True


def _save_mode(C: int) -> str:
    """vjp-forward saving ladder (semantics match VTX_FL_SAVE): z+acc
    always — z is the FF half's input (skips re-running the whole attention
    forward in the backward) and acc skips the n_head low-density av dots;
    +qkv skips the projection recompute.  Unlike fused_layer.py's ladder
    (qkv only at C ≥ 256), the measured layer1 default saves qkv at EVERY
    width: the Swin-S full-step A/B (PERF.md round 4) reads 987.7 with
    qkv-save at all stages vs 955.6 with the C-gated ladder — the one
    chained custom call per layer leaves HBM bandwidth to spare for the
    [bc,N,3HD] round-trip.  VTX_L1_SAVE: none | acc | qkv | auto."""
    env = os.environ.get("VTX_L1_SAVE", "auto")
    if env in ("0", "none"):
        return "none"
    if env == "acc":
        return "z+acc"
    if env not in ("auto", "qkv", "1"):
        # a typo'd A/B knob must not silently measure the default
        raise ValueError(f"VTX_L1_SAVE={env!r}: expected none|acc|qkv|auto")
    return "z+acc+qkv"


# ---------------------------------------------------------------------------
# custom-vjp plumbing
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19))
def _layer1(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
            extra, rs, n_head, act, scale, eps, interpret):
    out, _ = _layer1_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f,
                         w2, b2f, extra, rs, n_head, act, scale, eps,
                         interpret, save="none")
    return out


def _layer1_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                extra, rs, n_head, act, scale, eps, interpret, save=None):
    B, N, C = x.shape
    HD = wqkv.shape[1] // 3
    F = w1.shape[1]
    dim_head = HD // n_head
    if save is None:
        save = _save_mode(C)
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    rs_b, has_rs = _rs2_form(rs, B)
    bc = _pick_bc(B // groups, N, C, HD, F, n_head, x.dtype.itemsize,
                  False, bool(has_extra), save)
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    has_b1f, has_b2f = b1f is not None, b2f is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)
    bo = bout.reshape(1, -1) if has_bout else jnp.zeros((1, 1), x.dtype)
    bf1 = b1f.reshape(1, -1) if has_b1f else jnp.zeros((1, 1), x.dtype)
    bf2 = b2f.reshape(1, -1) if has_b2f else jnp.zeros((1, 1), x.dtype)
    rs_spec, rs_global = _rs2_spec(rs_b, has_rs, bc)

    out_specs = [pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, N, C), x.dtype)]
    if save != "none":
        out_specs.append(pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, N, C), x.dtype))
        out_specs.append(pl.BlockSpec((bc, N, HD), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, N, HD), x.dtype))
    if save == "z+acc+qkv":
        out_specs.append(pl.BlockSpec((bc, N, 3 * HD), lambda i: (i, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, N, 3 * HD), x.dtype))

    outs = pl.pallas_call(
        functools.partial(
            _l1_fwd_kernel, scale=scale, eps=eps, bc=bc, n_head=n_head,
            dim_head=dim_head, act=act, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout, has_b1f=has_b1f,
            has_b2f=has_b2f, has_rs=bool(has_rs), rs_global=rs_global,
            save=save),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(bq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wout.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(bf1.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(bf2.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda i: (i // bpg, 0, 0, 0)),
            rs_spec,
        ],
        out_specs=out_specs if save != "none" else out_specs[0],
        out_shape=out_shape if save != "none" else out_shape[0],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, bq, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2, extra_b, rs_b)
    if save == "none":
        out, z, acc, sqkv = outs, None, None, None
    elif save == "z+acc":
        (out, z, acc), sqkv = outs, None
    else:
        out, z, acc, sqkv = outs
    return out, (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                 extra, rs, z, acc, sqkv)


def _layer1_fwd_rule(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2,
                     b2f, extra, rs, n_head, act, scale, eps, interpret):
    # the backward kernel requires z + acc — force at least that saving
    save = _save_mode(x.shape[-1])
    if save == "none":
        save = "z+acc"
    return _layer1_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f,
                       w2, b2f, extra, rs, n_head, act, scale, eps,
                       interpret, save=save)


def _layer1_bwd(n_head, act, scale, eps, interpret, res, do):
    (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
     extra, rs, z, acc, sqkv) = res
    save = "z+acc+qkv" if sqkv is not None else "z+acc"
    B, N, C = x.shape
    three_hd = wqkv.shape[1]
    HD = three_hd // 3
    F = w1.shape[1]
    dim_head = HD // n_head
    extra_b, has_extra, groups = _extra_form(extra, B, n_head, N)
    _, eh, em, en = extra_b.shape
    rs_b, has_rs = _rs2_form(rs, B)
    bc = _pick_bc(B // groups, N, C, HD, F, n_head, x.dtype.itemsize,
                  True, bool(has_extra), save)
    bpg = (B // groups) // bc
    has_bqkv, has_bout = bqkv is not None, bout is not None
    has_b1f, has_b2f = b1f is not None, b2f is not None
    bq = bqkv.reshape(1, -1) if has_bqkv else jnp.zeros((1, 1), x.dtype)
    bo = bout.reshape(1, -1) if has_bout else jnp.zeros((1, 1), x.dtype)
    bf1 = b1f.reshape(1, -1) if has_b1f else jnp.zeros((1, 1), x.dtype)
    bf2 = b2f.reshape(1, -1) if has_b2f else jnp.zeros((1, 1), x.dtype)
    rs_spec, rs_global = _rs2_spec(rs_b, has_rs, bc)

    sqkv_in = sqkv if sqkv is not None else jnp.zeros((1, 1, 1), x.dtype)
    sqkv_spec = (pl.BlockSpec((bc, N, three_hd), lambda i: (i, 0, 0))
                 if sqkv is not None
                 else pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)))

    outs = pl.pallas_call(
        functools.partial(
            _l1_bwd_kernel, scale=scale, eps=eps, bc=bc, n_head=n_head,
            dim_head=dim_head, act=act, has_extra=bool(has_extra),
            has_bqkv=has_bqkv, has_bout=has_bout, has_b1f=has_b1f,
            has_b2f=has_b2f, has_rs=bool(has_rs), rs_global=rs_global,
            bpg=bpg, save=save),
        grid=(B // bc,),
        in_specs=[
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(wqkv.shape, lambda i: (0, 0)),
            pl.BlockSpec(bq.shape, lambda i: (0, 0)),
            pl.BlockSpec(wout.shape, lambda i: (0, 0)),
            pl.BlockSpec(bo.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec(bf1.shape, lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
            pl.BlockSpec(bf2.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, eh, em, en), lambda i: (i // bpg, 0, 0, 0)),
            rs_spec,
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((bc, N, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((bc, N, HD), lambda i: (i, 0, 0)),
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
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec(w1.shape, lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec(w2.shape, lambda i: (0, 0)),
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
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((groups, eh, em, en), jnp.float32),
            jax.ShapeDtypeStruct((B, 2) if has_rs else (1, 2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, bq, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2, extra_b, rs_b,
      do.astype(x.dtype), z, acc, sqkv_in)
    (dx, dg1, db1, dwqkv, dbqkv, dwout, dbout, dg2, db2, dw1, db1f, dw2,
     db2f, dextra, drs) = outs

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
    rs_attn, rs_ff = rs
    drs_out = (
        None if not has_rs
        else (drs[:, 0].astype(rs_attn.dtype) if rs_attn is not None else None,
              drs[:, 1].astype(rs_ff.dtype) if rs_ff is not None else None))
    if drs_out is None:
        drs_out = (None, None)
    return (dx, dg1[0].astype(g1.dtype), db1[0].astype(b1.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv[0].astype(bqkv.dtype) if has_bqkv else None,
            dwout.astype(wout.dtype),
            dbout[0].astype(bout.dtype) if has_bout else None,
            dg2[0].astype(g2.dtype), db2[0].astype(b2.dtype),
            dw1.astype(w1.dtype),
            db1f[0].astype(b1f.dtype) if has_b1f else None,
            dw2.astype(w2.dtype),
            db2f[0].astype(b2f.dtype) if has_b2f else None,
            dextra_out, drs_out)


_layer1.defvjp(_layer1_fwd_rule, _layer1_bwd)


def fused_transformer_layer(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                            ln2_scale, ln2_bias, w1, b1, w2, b2, n_head: int,
                            extra=None, rs_attn=None, rs_ff=None,
                            activation: str = "silu",
                            scale: Optional[float] = None, eps: float = 1e-6,
                            interpret: bool = False):
    """Whole pre-LN transformer layer as ONE Pallas program:

        z = x + rs_attn ⊙ OutProj(MHSA(QkvProj(LN₁(x))))
        o = z + rs_ff   ⊙ FF(LN₂(z))

    x: [B, N, C]; wqkv: [C, 3·H·D]; wout: [H·D, C]; w1: [C, F]; w2: [F, C];
    extra: optional [H, N, N] / grouped [G, H, N, N] additive attention
    bias; rs_attn / rs_ff: optional [B] f32 per-sample DropPath scales
    (independent draws per branch, reference models/layer.py:166-183);
    activation: "silu" | "gelu" (tanh approximation).  Weights pre-cast to
    the compute dtype; LN params f32.
    """
    if scale is None:
        HD = wqkv.shape[1] // 3
        scale = 1.0 / math.sqrt(HD // n_head)
    return _layer1(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                   ln2_scale, ln2_bias, w1, b1, w2, b2, extra,
                   (rs_attn, rs_ff), n_head, activation, float(scale),
                   float(eps), interpret)
