"""Map-resident Swin layer kernel — the whole pre-LN transformer layer AND
the window-pair partition/unpartition in ONE Pallas program per layer
(reference hot path: models/swin_transformer.py:103-160 plus the partition
at :116-130).

Motivation (PERF.md round 4): at the layer1 shipped default the Swin-S step
still pays **15.5 ms/step of movement** — the window partition/unpartition
reshape-transposes (and the ``jnp.roll`` copies) XLA materializes around
every one of the 24 layers' custom calls.  This kernel consumes the feature
map in its canonical NHWC layout:

- the grid is ``(B/bc, hs)``; each step's x/o blocks are WINDOW-ROW BANDS
  ``[bc, w, W, C]`` — every band is fetched and written exactly once, so
  the layer's HBM traffic is one map read + one map write (+ saves)
- window-PAIR tokens are formed by an in-VMEM slice+reshape of the band;
  the sublane compaction runs at VPU speed instead of as HBM round-trips
- the cyclic shift stays OUTSIDE the custom call as a plain ``jnp.roll``
  (two fused slices+concat, ONE map copy each way, shifted layers only) —
  an in-kernel two-piece wrap assembly was measured catastrophically slow
  (Mosaic lowers concat-of-dynamic-ref-slices through a scalar path)

**Measured verdict (PERF.md round 5): this kernel LOSES to layer1** —
959.6-963.2 vs 981.2 img/s/chip on the Swin-S full step at 128/chip
(bc swept 8/16/auto).  The in-VMEM pair extraction re-tiles [w, pack·w, C]
slices whose pack·w = 14 rows don't hit the 16-sublane bf16 tile, costing
more VPU shuffle time than the HBM partition copies it removes.  It ships
as the measured-losing branch behind ``VTX_ATTN_IMPL=swin``; layer1 stays
the default (models/swin.py).

Token order inside a pair is LAYOUT-NATIVE — ``t = row·(pack·w) + col``
across the pair's columns — i.e. the order the band reshape produces, NOT
the (window, row, col) order of the partition transpose.  Attention is
permutation-equivariant given a consistently permuted bias, so the model
permutes the static rel-pos/mask slabs once at trace time
(``swin_token_perm``) and the kernel never reorders a token.

The per-pair compute body (LN₁ → qkv → per-head chain → out proj → residual
→ LN₂ → FF → residual), the f32 numerics, the DropPath row scales and the
z/acc/qkv saving ladder are IDENTICAL to ops/fused_layer1.py — this kernel
changes where rows come from, not how they are computed.

``interpret=True`` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _env_bc
from .fused_block import _head_slices
from .fused_layer import _BF16_P, _act_bwd, _act_fwd, _ln_bwd, _ln_fwd
from .fused_layer1 import _l1_unroll, _save_mode

__all__ = ["fused_swin_layer", "swin_token_perm"]


def swin_token_perm(window: int, pack: int) -> np.ndarray:
    """``perm[t_native] = t_partition``: maps this kernel's layout-native
    token order (row-major across the pair's columns) to the partition
    order (window, row, col) the packed bias/mask slabs are built in.
    Apply as ``slab[..., perm, :][..., :, perm]``."""
    w = window
    perm = np.empty(pack * w * w, np.int64)
    for r in range(w):
        for wi in range(pack):
            for c in range(w):
                perm[r * (pack * w) + wi * w + c] = wi * w * w + r * w + c
    return perm


def _sw_vmem_mb() -> int:
    """Same scoped-VMEM default as layer1 (64 MB, PERF.md round 4);
    VTX_SW_VMEM_MB overrides just this kernel."""
    env = (os.environ.get("VTX_SW_VMEM_MB")
           or os.environ.get("VTX_L1_VMEM_MB")
           or os.environ.get("VTX_VMEM_MB"))
    return int(env) if env else 64


def _cp(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_sw_vmem_mb() * 1024 * 1024)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _sw_fwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref,
                   bout_ref, g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref,
                   b2f_ref, extra_ref, rs_ref, o_ref,
                   z_ref=None, acc_ref=None, sqkv_ref=None, *,
                   scale, eps, bc, n_head, dim_head, act, window, pack,
                   wspp, grouped, has_bqkv, has_bout, has_b1f, has_b2f,
                   has_rs, save):
    HD = n_head * dim_head
    C = x_ref.shape[3]
    w = window
    pw = pack * w
    m = pack * w * w
    row0 = pl.program_id(0) * bc
    dt = x_ref.dtype

    def body(j, _):
        row = row0 + j
        band = x_ref[j]  # [w, W, C] — this grid step's window-row band
        obs = []
        for p in range(wspp):
            xp = band if wspp == 1 else band[:, p * pw:(p + 1) * pw, :]
            xp = xp.reshape(m, C)
            eg = p if grouped else 0
            # ---- attention half (identical math to fused_layer1) --------
            u1, _xh, _r = _ln_fwd(xp.astype(jnp.float32), g1_ref, b1_ref, eps)
            u1 = u1.astype(dt)
            qkv = jax.lax.dot_general(
                u1, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if has_bqkv:
                qkv = qkv + bqkv_ref[0]
            if save == "z+acc+qkv":
                sqkv_ref[j, p] = qkv
            outs = []
            for h in range(n_head):
                qs, ks, vs = _head_slices(h, dim_head, HD)
                q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
                s = s + extra_ref[eg, h].astype(jnp.float32)
                mx = jnp.max(s, axis=-1, keepdims=True)
                pr = jnp.exp(s - mx)
                pr = (pr / jnp.sum(pr, axis=-1, keepdims=True)).astype(dt)
                outs.append(jax.lax.dot_general(
                    pr, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt))
            acc = jnp.concatenate(outs, axis=-1)
            if save != "none":
                acc_ref[j, p] = acc
            a = jax.lax.dot_general(
                acc, wout_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if has_bout:
                a = a + bout_ref[0]
            if has_rs:
                a = a * rs_ref[row, 0].astype(dt)
            z = xp + a
            if save != "none":
                z_ref[j, p] = z
            # ---- feed-forward half --------------------------------------
            u2, _xh2, _r2 = _ln_fwd(z.astype(jnp.float32), g2_ref, b2_ref, eps)
            u2 = u2.astype(dt)
            hid = jax.lax.dot_general(
                u2, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if has_b1f:
                hid = hid + b1f_ref[0]
            af = _act_fwd(hid.astype(jnp.float32), act).astype(dt)
            out = jax.lax.dot_general(
                af, w2_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if has_b2f:
                out = out + b2f_ref[0]
            if has_rs:
                out = out * rs_ref[row, 1].astype(dt)
            obs.append((z + out).reshape(w, pw, C))
        o_ref[j] = obs[0] if wspp == 1 else jnp.concatenate(obs, axis=1)
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


def _sw_bwd_kernel(x_ref, g1_ref, b1_ref, wqkv_ref, bqkv_ref, wout_ref,
                   bout_ref, g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref,
                   b2f_ref, extra_ref, rs_ref, do_ref,
                   z_ref, acc_ref, sqkv_ref,
                   dx_ref, dg1_ref, db1_ref, dwqkv_ref, dbqkv_ref,
                   dwout_ref, dbout_ref, dg2_ref, db2_ref, dw1_ref,
                   db1f_ref, dw2_ref, db2f_ref, dextra_ref, drs_ref, *,
                   scale, eps, bc, n_head, dim_head, act, window, pack,
                   wspp, grouped, has_bqkv, has_bout, has_b1f, has_b2f,
                   has_rs, save):
    HD = n_head * dim_head
    C = x_ref.shape[3]
    w = window
    pw = pack * w
    m = pack * w * w
    i = pl.program_id(0)
    wy = pl.program_id(1)
    row0 = i * bc
    dt = x_ref.dtype

    @pl.when((i == 0) & (wy == 0))
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
        dextra_ref[...] = jnp.zeros_like(dextra_ref[...])

    def body(j, _):
        row = row0 + j
        xband = x_ref[j]
        doband = do_ref[j]
        dxbs = []
        drs1_band = jnp.float32(0.0)
        drs2_band = jnp.float32(0.0)
        for p in range(wspp):
            xp = xband if wspp == 1 else xband[:, p * pw:(p + 1) * pw, :]
            xp = xp.reshape(m, C)
            do = doband if wspp == 1 else doband[:, p * pw:(p + 1) * pw, :]
            do = do.reshape(m, C)
            zj = z_ref[j, p]
            eg = p if grouped else 0

            # ---- FF half backward (input z, cotangent do) ----------------
            u2_f, xhat2, r2 = _ln_fwd(zj.astype(jnp.float32), g2_ref,
                                      b2_ref, eps)
            u2 = u2_f.astype(dt)
            hid = jax.lax.dot_general(
                u2, w1_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            if has_b1f:
                hid = hid + b1f_ref[0]
            hf = hid.astype(jnp.float32)
            af = _act_fwd(hf, act).astype(dt)

            if has_rs:
                da0 = jax.lax.dot_general(
                    do, w2_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                drs2 = jnp.sum(da0 * af.astype(jnp.float32))
                if has_b2f:
                    drs2 = drs2 + jnp.sum(
                        do.astype(jnp.float32)
                        * b2f_ref[0].astype(jnp.float32))
                drs2_band = drs2_band + drs2
                rv2 = rs_ref[row, 1]
                dout = do * rv2.astype(dt)
                da = (da0 * rv2.astype(jnp.float32)).astype(dt)
            else:
                dout = do
                da = jax.lax.dot_general(
                    dout, w2_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)

            dw2_ref[...] += jax.lax.dot_general(
                af, dout, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_b2f:
                db2f_ref[...] += jnp.sum(dout.astype(jnp.float32), axis=0,
                                         keepdims=True)
            dh = (da.astype(jnp.float32) * _act_bwd(hf, act)).astype(dt)
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
            dz = do + dz_ln.astype(dt)

            # ---- attention half backward (input x, cotangent dz) --------
            u1_f, xhat1, r1 = _ln_fwd(xp.astype(jnp.float32), g1_ref,
                                      b1_ref, eps)
            u1 = u1_f.astype(dt)
            if save == "z+acc+qkv":
                qkv = sqkv_ref[j, p]
            else:
                qkv = jax.lax.dot_general(
                    u1, wqkv_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)
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
                s = s + extra_ref[eg, h].astype(jnp.float32)
                mx = jnp.max(s, axis=-1, keepdims=True)
                pr = jnp.exp(s - mx)
                pr = pr / jnp.sum(pr, axis=-1, keepdims=True)
                ps.append(pr.astype(dt) if _BF16_P else pr)
            acc = acc_ref[j, p]

            if has_rs:
                rv1 = rs_ref[row, 0]
                da_att = dz * rv1.astype(dt)
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
                        dz.astype(jnp.float32)
                        * bout_ref[0].astype(jnp.float32))
                drs1_band = drs1_band + drs1
                rv1 = rs_ref[row, 0]
                dacc = (dacc0 * rv1.astype(jnp.float32)).astype(dt)
            else:
                dacc = jax.lax.dot_general(
                    da_att, wout_ref[...], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt)

            dqs, dks, dvs = [], [], []
            for h in range(n_head):
                qs, ks, vs = _head_slices(h, dim_head, HD)
                q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
                pr = ps[h]
                doh = dacc[:, slice(h * dim_head, (h + 1) * dim_head)]
                dvs.append(jax.lax.dot_general(
                    pr.astype(dt), doh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt))
                dp = jax.lax.dot_general(
                    doh, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ds = pr * (dp - jnp.sum(dp * pr, axis=-1, keepdims=True))
                dextra_ref[wy * wspp + p if grouped else 0, h] += ds
                dsb = (ds * scale).astype(dt)
                dqs.append(jax.lax.dot_general(
                    dsb, k, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt))
                dks.append(jax.lax.dot_general(
                    dsb, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dt))
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
            dxbs.append((dz + dx_ln.astype(dt)).reshape(w, pw, C))
        dx_ref[j] = dxbs[0] if wspp == 1 else jnp.concatenate(dxbs, axis=1)
        if has_rs:
            # per-sample scale grads accumulate across this sample's bands
            base1 = jnp.where(wy == 0, 0.0, drs_ref[row, 0])
            base2 = jnp.where(wy == 0, 0.0, drs_ref[row, 1])
            drs_ref[row, 0] = base1 + drs1_band
            drs_ref[row, 1] = base2 + drs2_band
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
# block-chunk picking / plumbing
# ---------------------------------------------------------------------------


def _pick_bc(B, H, W, C, HD, F, n_head, m, wspp, Ge, itemsize, bwd, save):
    env = (os.environ.get("VTX_SW_BC") or os.environ.get("VTX_L1_BC")
           or os.environ.get("VTX_FL_BC"))
    if env:
        return _env_bc(env, B)
    limit = _sw_vmem_mb() * 1024 * 1024
    welems = C * 3 * HD + HD * C + 2 * C * F
    # the extra slab block changes per band grid step → double-buffered (2x)
    fixed = welems * (itemsize + (4 if bwd else 0)) \
        + 2 * wspp * n_head * m * m * 4 \
        + (Ge * n_head * m * m * 4 if bwd else 0)
    # per-pair temporaries (probabilities + FF chain, f32)
    temps = (n_head + 3) * m * m * 4 + 4 * m * F * 4 + 6 * m * C * 4
    # per-item pipelined band blocks (double-buffered, hence the 2x): x
    # (+do +dx in bwd) + o bands plus this band's save blocks
    band_tokens = m * wspp  # tokens per band = w * W
    saved = 0 if save == "none" else band_tokens * (C + HD) \
        + (band_tokens * 3 * HD if save == "z+acc+qkv" else 0)
    per_item = 2 * ((3 if bwd else 2) * band_tokens * C + saved) * itemsize
    budget = int(limit * 0.6) - fixed - temps
    cap = max(1, budget // max(per_item, 1))
    best = 1
    for c in range(1, B + 1):
        if B % c == 0 and c <= min(cap, 64):
            best = c
    return best


def _rs2_form(rs, B):
    rs_attn, rs_ff = rs
    if rs_attn is None and rs_ff is None:
        return jnp.zeros((1, 2), jnp.float32), 0
    one = jnp.ones((B,), jnp.float32)
    a = one if rs_attn is None else rs_attn.astype(jnp.float32)
    f = one if rs_ff is None else rs_ff.astype(jnp.float32)
    return jnp.stack([a, f], axis=1), 1


def _common(x, wqkv, w1, extra, rs, pack, window):
    B, H, W, C = x.shape
    HD = wqkv.shape[1] // 3
    F = w1.shape[1]
    w = window
    hs, ws = H // w, W // w
    wspp = ws // pack
    m = pack * w * w
    Ge = extra.shape[0]
    grouped = Ge > 1
    assert Ge in (1, hs * wspp), (Ge, hs, wspp)
    assert extra.shape[2] == m and extra.shape[3] == m, (extra.shape, m)
    rs_b, has_rs = _rs2_form(rs, B)
    return B, H, W, C, HD, F, hs, ws, wspp, m, Ge, grouped, rs_b, has_rs


def _bias_forms(x, bqkv, bout, b1f, b2f):
    has = (bqkv is not None, bout is not None, b1f is not None,
           b2f is not None)
    z = jnp.zeros((1, 1), x.dtype)
    return has, (bqkv.reshape(1, -1) if has[0] else z,
                 bout.reshape(1, -1) if has[1] else z,
                 b1f.reshape(1, -1) if has[2] else z,
                 b2f.reshape(1, -1) if has[3] else z)


def _const4(shape):
    return pl.BlockSpec(shape, lambda i, y: (0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def _swin_layer(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                extra, rs, n_head, act, scale, eps, window, pack_interpret):
    out, _ = _swin_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f,
                       w2, b2f, extra, rs, n_head, act, scale, eps, window,
                       pack_interpret, save="none")
    return out


def _swin_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
              extra, rs, n_head, act, scale, eps, window, pack_interpret,
              save=None):
    pack, interpret = pack_interpret
    (B, H, W, C, HD, F, hs, ws, wspp, m, Ge, grouped, rs_b,
     has_rs) = _common(x, wqkv, w1, extra, rs, pack, window)
    w = window
    dim_head = HD // n_head
    if save is None:
        save = _save_mode(C)
    has, (bq, bo, bf1, bf2) = _bias_forms(x, bqkv, bout, b1f, b2f)
    bc = _pick_bc(B, H, W, C, HD, F, n_head, m, wspp, Ge, x.dtype.itemsize,
                  False, save)
    G = hs * wspp

    # x/o blocks are window-row bands: the 4-D array is viewed as
    # [B, hs·w, W, C] with band blocks (bc, w, W, C) at (i, wy)
    band = pl.BlockSpec((bc, w, W, C), lambda i, y: (i, y, 0, 0))
    out_specs = [band]
    out_shape = [jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
    if save != "none":
        out_specs.append(pl.BlockSpec((bc, wspp, m, C),
                                      lambda i, y: (i, y, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, G, m, C), x.dtype))
        out_specs.append(pl.BlockSpec((bc, wspp, m, HD),
                                      lambda i, y: (i, y, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, G, m, HD), x.dtype))
    if save == "z+acc+qkv":
        out_specs.append(pl.BlockSpec((bc, wspp, m, 3 * HD),
                                      lambda i, y: (i, y, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, G, m, 3 * HD), x.dtype))

    outs = pl.pallas_call(
        functools.partial(
            _sw_fwd_kernel, scale=scale, eps=eps, bc=bc, n_head=n_head,
            dim_head=dim_head, act=act, window=window, pack=pack, wspp=wspp,
            grouped=grouped, has_bqkv=has[0], has_bout=has[1],
            has_b1f=has[2], has_b2f=has[3], has_rs=bool(has_rs), save=save),
        grid=(B // bc, hs),
        in_specs=[
            band,
            _const4((1, C)), _const4((1, C)),
            _const4(wqkv.shape), _const4(bq.shape),
            _const4(wout.shape), _const4(bo.shape),
            _const4((1, C)), _const4((1, C)),
            _const4(w1.shape), _const4(bf1.shape),
            _const4(w2.shape), _const4(bf2.shape),
            pl.BlockSpec((wspp if grouped else 1, n_head, m, m),
                         lambda i, y: ((y if grouped else 0), 0, 0, 0)),
            pl.BlockSpec(rs_b.shape, lambda i, y: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs if save != "none" else out_specs[0],
        out_shape=out_shape if save != "none" else out_shape[0],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, bq, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2,
      extra.astype(jnp.float32), rs_b)
    if save == "none":
        out, z, acc, sqkv = outs, None, None, None
    elif save == "z+acc":
        (out, z, acc), sqkv = outs, None
    else:
        out, z, acc, sqkv = outs
    return out, (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2,
                 b2f, extra, rs, z, acc, sqkv)


def _swin_fwd_rule(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2,
                   b2f, extra, rs, n_head, act, scale, eps, window,
                   pack_interpret):
    save = _save_mode(x.shape[-1])
    if save == "none":
        save = "z+acc"
    return _swin_fwd(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2,
                     b2f, extra, rs, n_head, act, scale, eps, window,
                     pack_interpret, save=save)


def _swin_bwd(n_head, act, scale, eps, window, pack_interpret, res, do):
    pack, interpret = pack_interpret
    (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
     extra, rs, z, acc, sqkv) = res
    save = "z+acc+qkv" if sqkv is not None else "z+acc"
    (B, H, W, C, HD, F, hs, ws, wspp, m, Ge, grouped, rs_b,
     has_rs) = _common(x, wqkv, w1, extra, rs, pack, window)
    w = window
    three_hd = wqkv.shape[1]
    dim_head = HD // n_head
    has, (bq, bo, bf1, bf2) = _bias_forms(x, bqkv, bout, b1f, b2f)
    bc = _pick_bc(B, H, W, C, HD, F, n_head, m, wspp, Ge, x.dtype.itemsize,
                  True, save)
    G = hs * wspp

    band = pl.BlockSpec((bc, w, W, C), lambda i, y: (i, y, 0, 0))
    sqkv_in = sqkv if sqkv is not None else jnp.zeros((1, 1, 1, 1), x.dtype)
    sqkv_spec = (pl.BlockSpec((bc, wspp, m, three_hd),
                              lambda i, y: (i, y, 0, 0))
                 if sqkv is not None
                 else pl.BlockSpec((1, 1, 1, 1), lambda i, y: (0, 0, 0, 0)))
    rs_spec = pl.BlockSpec(rs_b.shape, lambda i, y: (0, 0),
                           memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        functools.partial(
            _sw_bwd_kernel, scale=scale, eps=eps, bc=bc, n_head=n_head,
            dim_head=dim_head, act=act, window=window, pack=pack, wspp=wspp,
            grouped=grouped, has_bqkv=has[0], has_bout=has[1],
            has_b1f=has[2], has_b2f=has[3], has_rs=bool(has_rs), save=save),
        grid=(B // bc, hs),
        in_specs=[
            band,
            _const4((1, C)), _const4((1, C)),
            _const4(wqkv.shape), _const4(bq.shape),
            _const4(wout.shape), _const4(bo.shape),
            _const4((1, C)), _const4((1, C)),
            _const4(w1.shape), _const4(bf1.shape),
            _const4(w2.shape), _const4(bf2.shape),
            pl.BlockSpec((wspp if grouped else 1, n_head, m, m),
                         lambda i, y: ((y if grouped else 0), 0, 0, 0)),
            rs_spec,
            band,
            pl.BlockSpec((bc, wspp, m, C), lambda i, y: (i, y, 0, 0)),
            pl.BlockSpec((bc, wspp, m, HD), lambda i, y: (i, y, 0, 0)),
            sqkv_spec,
        ],
        out_specs=[
            band,
            _const4((1, C)), _const4((1, C)),
            _const4(wqkv.shape), _const4((1, three_hd)),
            _const4(wout.shape), _const4((1, C)),
            _const4((1, C)), _const4((1, C)),
            _const4(w1.shape), _const4((1, F)),
            _const4(w2.shape), _const4((1, C)),
            pl.BlockSpec((Ge, n_head, m, m), lambda i, y: (0, 0, 0, 0)),
            rs_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
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
            jax.ShapeDtypeStruct((Ge, n_head, m, m), jnp.float32),
            jax.ShapeDtypeStruct((B, 2) if has_rs else (1, 2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, bq, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2,
      extra.astype(jnp.float32), rs_b, do.astype(x.dtype), z, acc, sqkv_in)
    (dx, dg1, db1, dwqkv, dbqkv, dwout, dbout, dg2, db2, dw1, db1f, dw2,
     db2f, dextra, drs) = outs

    rs_attn, rs_ff = rs
    drs_out = (
        (None, None) if not has_rs
        else (drs[:, 0].astype(rs_attn.dtype) if rs_attn is not None
              else None,
              drs[:, 1].astype(rs_ff.dtype) if rs_ff is not None else None))
    return (dx, dg1[0].astype(g1.dtype), db1[0].astype(b1.dtype),
            dwqkv.astype(wqkv.dtype),
            dbqkv[0].astype(bqkv.dtype) if has[0] else None,
            dwout.astype(wout.dtype),
            dbout[0].astype(bout.dtype) if has[1] else None,
            dg2[0].astype(g2.dtype), db2[0].astype(b2.dtype),
            dw1.astype(w1.dtype),
            db1f[0].astype(b1f.dtype) if has[2] else None,
            dw2.astype(w2.dtype),
            db2f[0].astype(b2f.dtype) if has[3] else None,
            dextra.astype(extra.dtype), drs_out)


_swin_layer.defvjp(_swin_fwd_rule, _swin_bwd)


def fused_swin_layer(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                     ln2_scale, ln2_bias, w1, b1, w2, b2, n_head: int,
                     extra, rs_attn=None, rs_ff=None,
                     activation: str = "silu", *, window: int,
                     shift: bool, pack: int = 1,
                     scale: Optional[float] = None, eps: float = 1e-6,
                     interpret: bool = False):
    """Whole Swin layer — cyclic shift, window(-pair) partition, pre-LN
    attention + FF residual branches, unpartition, unshift — with the
    partition and both residual branches as ONE Pallas program over the
    NHWC feature map:

        o = SwinLayer(x)   with   x, o: [B, H, W, C]

    For shifted layers the cyclic roll runs as plain ``jnp.roll`` around
    the custom call (ONE fused map copy each way — the only XLA movement
    left; unshifted layers have none).  ``extra``: [G, H, m, m] (per
    window-row-band × pair group, shifted) or [1, H, m, m] (broadcast,
    unshifted) additive attention bias in LAYOUT-NATIVE token order (see
    :func:`swin_token_perm`), m = pack·w².  ``rs_attn`` / ``rs_ff``:
    optional [B] per-SAMPLE DropPath scales (reference
    models/layer.py:166-183 — grads sum over the sample's windows inside
    the kernel).  Reference layer: swin_transformer.py:103-197 including
    the roll at :110-115/:130-135.
    """
    if scale is None:
        HD = wqkv.shape[1] // 3
        scale = 1.0 / math.sqrt(HD // n_head)
    roll = window // 2
    if shift:
        x = jnp.roll(x, (-roll, -roll), (1, 2))
    out = _swin_layer(x, ln1_scale, ln1_bias, wqkv, bqkv, wout, bout,
                      ln2_scale, ln2_bias, w1, b1, w2, b2, extra,
                      (rs_attn, rs_ff), n_head, activation, float(scale),
                      float(eps), window, (int(pack), bool(interpret)))
    if shift:
        out = jnp.roll(out, (roll, roll), (1, 2))
    return out
