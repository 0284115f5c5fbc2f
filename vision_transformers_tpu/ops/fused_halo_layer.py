"""Whole-layer Halo kernel — LN₁ → qkv proj → halo windowed attention →
out proj → residual → LN₂ → FF → residual as ONE Pallas program per layer,
straight off the zero-padded feature map (reference hot path:
models/halo_transformer.py:57-148).

Motivation (PERF.md round 4 + VERDICT round 4 item 3): with the direct-map
attention kernel the Halo-S step still runs each layer as
[XLA: LN+qkv proj] → [Pallas: attention] → [XLA: out proj+residual+LN+FF],
i.e. two dependent XLA↔Pallas boundaries per layer — the exact chain-tax
pattern the Swin layer1 kernel removed (measured +2-4 ms/layer of backward
serialization, exp_chain_tax.py).  The fresh round-4 Halo xplane shows
49.1 ms of the 108 ms step in the backward with 12 XLA-interleaved FF
segments.  This kernel gives Halo the layer1 generation: a chain of N
identical custom calls with no interleaved XLA segments.

Layout (same windowing as ops/fused_halo.py::halo_attention_direct):

- input is the feature map zero-PADDED by ``halo`` rows/cols (plus kpad−k
  phantom cols): ``xp [b, Hp, Wp, C]``; the whole map is one re-visited
  block per batch item, bands are ``pl.ds`` row slices — no gather, no
  partition copies
- the grid is ``(b, hs)``; grid step (bi, wy) computes output band
  ``[w, W, C]`` from input band ``[k, Wp, C]`` (k = w + 2·halo)
- kv is the in-kernel projection of LN₁(band) with border tokens MASKED to
  zero — the reference's zero-padded neighborhoods project zero *features*,
  not LN(0) (halo_transformer.py:75-83); phantom kpad−k key columns are
  killed by −1e9 in the bias slab
- backward: everything row-local (residual, FF, LN₂, out proj, q path)
  lands in the band; the kv path touches the 2·halo overlap rows of
  adjacent bands, so the kernel emits PER-BAND dx contributions
  ``[b, hs, k, Wp, C]`` (LN₁-backward is token-local, so it runs in-kernel)
  and ``_fold_dx`` adds the overlaps outside — two pads + one add, the same
  fold the direct kernel uses for dkv (fused_halo.py::_fold_bands)

The per-token compute body, f32 numerics, DropPath row scales and z/acc
saving are IDENTICAL to ops/fused_layer1.py — this kernel changes where
tokens come from, not how they are computed.  qkv has no bias (the
reference's qkv Dense is bias-free, halo_transformer.py:66).

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

from .fused_layer import _act_bwd, _act_fwd, _ln_bwd, _ln_fwd
from .fused_layer1 import _l1_unroll

__all__ = ["fused_halo_layer"]


def _hl_vmem_mb() -> int:
    env = (os.environ.get("VTX_HL_VMEM_MB") or os.environ.get("VTX_L1_VMEM_MB")
           or os.environ.get("VTX_VMEM_MB"))
    return int(env) if env else 64


def _cp(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_hl_vmem_mb() * 1024 * 1024)


def _ceil8(n: int) -> int:
    return (n + 7) // 8 * 8


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _band_mask(k, Wp, halo, W, H, wy, window, dtype):
    """[k, Wp, 1] validity of the band's tokens in the ORIGINAL map: border
    rows/cols of the padded map carry LN(pad) garbage and must project to
    kv = 0 (reference zero-padded neighborhoods)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, Wp, 1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, Wp, 1), 1)
    r_orig = wy * window + r - halo
    ok = ((r_orig >= 0) & (r_orig < H) & (c >= halo) & (c < halo + W))
    return ok.astype(dtype)


def _hl_fwd_kernel(xp_ref, g1_ref, b1_ref, wqkv_ref, wout_ref, bout_ref,
                   g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
                   bias_ref, rs_ref, o_ref, z_ref=None, acc_ref=None, *,
                   scale, eps, window, halo, H, W, n_head, dim_head, act,
                   has_bout, has_b1f, has_b2f, has_rs, save):
    HD = n_head * dim_head
    C = xp_ref.shape[3]
    w = window
    k = w + 2 * halo
    Wp = xp_ref.shape[2]
    kpad = _ceil8(k)
    ws = W // w
    M = w * w
    bi, wy = pl.program_id(0), pl.program_id(1)
    dt = xp_ref.dtype

    band = xp_ref[0, pl.ds(wy * w, k)]                    # [k, Wp, C]
    xb = band.reshape(k * Wp, C)
    u_f, _xh, _r = _ln_fwd(xb.astype(jnp.float32), g1_ref, b1_ref, eps)
    u = u_f.astype(dt)
    qkv = jax.lax.dot_general(
        u, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(k, Wp, 3 * HD)
    mask = _band_mask(k, Wp, halo, W, H, wy, w, dt)
    kvm = qkv[:, :, HD:] * mask                           # [k, Wp, 2HD]
    qm = qkv[:, :, :HD]

    obs = []
    for wx in range(ws):
        nb = kvm[:, wx * w:wx * w + kpad, :].reshape(k * kpad, 2 * HD)
        qw = qm[halo:halo + w, halo + wx * w:halo + (wx + 1) * w, :]
        qw = qw.reshape(M, HD)
        outs = []
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            vsl = slice(HD + h * dim_head, HD + (h + 1) * dim_head)
            s = jax.lax.dot_general(
                qw[:, sl], nb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)       # [M, k·kpad]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
            outs.append(jax.lax.dot_general(
                p, nb[:, vsl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
        obs.append(jnp.concatenate(outs, axis=-1).reshape(w, w, HD))
    accb = jnp.concatenate(obs, axis=1)                   # [w, W, HD]
    if save != "none":
        acc_ref[0] = accb
    acc2 = accb.reshape(w * W, HD)
    a = jax.lax.dot_general(
        acc2, wout_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)
    if has_bout:
        a = a + bout_ref[0]
    if has_rs:
        a = a * rs_ref[bi, 0].astype(dt)
    x_int = band[halo:halo + w, halo:halo + W, :].reshape(w * W, C)
    z = x_int + a
    if save != "none":
        z_ref[0] = z.reshape(w, W, C)

    u2_f, _xh2, _r2 = _ln_fwd(z.astype(jnp.float32), g2_ref, b2_ref, eps)
    u2 = u2_f.astype(dt)
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
        out = out * rs_ref[bi, 1].astype(dt)
    o_ref[0] = (z + out).reshape(w, W, C)


def _hl_bwd_kernel(xp_ref, g1_ref, b1_ref, wqkv_ref, wout_ref, bout_ref,
                   g2_ref, b2_ref, w1_ref, b1f_ref, w2_ref, b2f_ref,
                   bias_ref, rs_ref, do_ref, z_ref, acc_ref,
                   dxb_ref, dg1_ref, db1_ref, dwqkv_ref, dwout_ref,
                   dbout_ref, dg2_ref, db2_ref, dw1_ref, db1f_ref, dw2_ref,
                   db2f_ref, dbias_ref, drs_ref, dqkv_acc, *,
                   scale, eps, window, halo, H, W, n_head, dim_head, act,
                   has_bout, has_b1f, has_b2f, has_rs, save):
    HD = n_head * dim_head
    C = xp_ref.shape[3]
    w = window
    k = w + 2 * halo
    Wp = xp_ref.shape[2]
    kpad = _ceil8(k)
    ws = W // w
    M = w * w
    bi, wy = pl.program_id(0), pl.program_id(1)
    dt = xp_ref.dtype

    @pl.when((bi == 0) & (wy == 0))
    def _init_w():
        dg1_ref[...] = jnp.zeros_like(dg1_ref[...])
        db1_ref[...] = jnp.zeros_like(db1_ref[...])
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref[...])
        dwout_ref[...] = jnp.zeros_like(dwout_ref[...])
        dbout_ref[...] = jnp.zeros_like(dbout_ref[...])
        dg2_ref[...] = jnp.zeros_like(dg2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])
        dw1_ref[...] = jnp.zeros_like(dw1_ref[...])
        db1f_ref[...] = jnp.zeros_like(db1f_ref[...])
        dw2_ref[...] = jnp.zeros_like(dw2_ref[...])
        db2f_ref[...] = jnp.zeros_like(db2f_ref[...])
        dbias_ref[...] = jnp.zeros_like(dbias_ref[...])

    band = xp_ref[0, pl.ds(wy * w, k)]                    # [k, Wp, C]
    xb = band.reshape(k * Wp, C)
    u_f, xhat1, r1 = _ln_fwd(xb.astype(jnp.float32), g1_ref, b1_ref, eps)
    u = u_f.astype(dt)
    qkv = jax.lax.dot_general(
        u, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(k, Wp, 3 * HD)
    mask = _band_mask(k, Wp, halo, W, H, wy, w, dt)
    kvm = qkv[:, :, HD:] * mask
    qm = qkv[:, :, :HD]

    do = do_ref[0].reshape(w * W, C)
    zj = z_ref[0].reshape(w * W, C)
    accb = acc_ref[0]
    acc2 = accb.reshape(w * W, HD)

    # ---- FF half backward (input z, cotangent do) ---------------------
    u2_f, xhat2, r2 = _ln_fwd(zj.astype(jnp.float32), g2_ref, b2_ref, eps)
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
            drs2 = drs2 + jnp.sum(do.astype(jnp.float32)
                                  * b2f_ref[0].astype(jnp.float32))
        rv2 = rs_ref[bi, 1]
        dout = do * rv2.astype(dt)
        da = (da0 * rv2.astype(jnp.float32)).astype(dt)
    else:
        drs2 = jnp.float32(0.0)
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
    dz = do + dz_ln.astype(dt)                            # [w·W, C]

    # ---- attention half backward --------------------------------------
    if has_rs:
        rv1 = rs_ref[bi, 0]
        da_att = dz * rv1.astype(dt)
        dacc0 = jax.lax.dot_general(
            dz, wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        drs1 = jnp.sum(dacc0 * acc2.astype(jnp.float32))
        if has_bout:
            drs1 = drs1 + jnp.sum(dz.astype(jnp.float32)
                                  * bout_ref[0].astype(jnp.float32))
        dacc = (dacc0 * rv1.astype(jnp.float32)).astype(dt)
    else:
        drs1 = jnp.float32(0.0)
        da_att = dz
        dacc = jax.lax.dot_general(
            da_att, wout_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
    dwout_ref[...] += jax.lax.dot_general(
        acc2, da_att, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bout:
        dbout_ref[...] += jnp.sum(da_att.astype(jnp.float32), axis=0,
                                  keepdims=True)
    if has_rs:
        drs_ref[bi, 0] = jnp.where(wy == 0, 0.0, drs_ref[bi, 0]) + drs1
        drs_ref[bi, 1] = jnp.where(wy == 0, 0.0, drs_ref[bi, 1]) + drs2

    daccb = dacc.reshape(w, W, HD)
    dqkv_acc[...] = jnp.zeros_like(dqkv_acc[...])
    for wx in range(ws):
        nb = kvm[:, wx * w:wx * w + kpad, :].reshape(k * kpad, 2 * HD)
        qw = qm[halo:halo + w, halo + wx * w:halo + (wx + 1) * w, :]
        qw = qw.reshape(M, HD)
        daw = daccb[:, wx * w:(wx + 1) * w, :].reshape(M, HD)
        dqs, dks, dvs = [], [], []
        for h in range(n_head):
            sl = slice(h * dim_head, (h + 1) * dim_head)
            vsl = slice(HD + h * dim_head, HD + (h + 1) * dim_head)
            s = jax.lax.dot_general(
                qw[:, sl], nb[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s + bias_ref[h].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)    # [M, k·kpad] f32
            do_h = daw[:, sl]
            dvs.append(jax.lax.dot_general(
                p.astype(dt), do_h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
            dp = jax.lax.dot_general(
                do_h, nb[:, vsl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dbias_ref[h] += ds
            dsb = (ds * scale).astype(dt)
            dqs.append(jax.lax.dot_general(
                dsb, nb[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
            dks.append(jax.lax.dot_general(
                dsb, qw[:, sl], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt))
        dqw = jnp.concatenate(dqs, axis=-1).reshape(w, w, HD)
        dkvw = jnp.concatenate(dks + dvs, axis=-1).reshape(k, kpad, 2 * HD)
        # q rows are interior and disjoint across wx; kv windows overlap
        dqkv_acc[halo:halo + w,
                 halo + wx * w:halo + (wx + 1) * w, :HD] += dqw
        dqkv_acc[:, wx * w:wx * w + kpad, HD:] += dkvw

    # border kv tokens were zeroed in fwd — their grads must not flow back
    # (lane-select multiply: .at[].multiply lowers to an unsupported
    # scatter-mul inside kernels)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (k, Wp, 3 * HD), 2)
    keep = jnp.where(lane3 < HD, jnp.float32(1.0),
                     mask.astype(jnp.float32))
    dqkv_band = dqkv_acc[...] * keep
    dqkv2 = dqkv_band.reshape(k * Wp, 3 * HD).astype(dt)
    dwqkv_ref[...] += jax.lax.dot_general(
        u, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dln1 = jax.lax.dot_general(
        dqkv2, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ln, dg1p, db1p = _ln_bwd(dln1, xhat1, r1, g1_ref)
    dg1_ref[...] += dg1p
    db1_ref[...] += db1p
    # the row-local residual (dz) lands on the interior tokens of the band
    # (ref slice-add — value-level .at[].add lowers to scatter)
    dxb_ref[0, 0] = dx_ln.astype(dt).reshape(k, Wp, C)
    dxb_ref[0, 0, halo:halo + w, halo:halo + W, :] += dz.reshape(w, W, C)


# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------


def _fold_dx(bands, window, halo, Hp):
    """Fold overlapping per-band dx [b, hs, k, Wp, C] onto the padded map
    [b, Hp, Wp, C] (adjacent bands overlap by 2·halo rows) — identical
    two-pads-one-add scheme as fused_halo._fold_bands."""
    b, hs, k, Wp, C = bands.shape
    lows = bands[:, :, :window].reshape(b, hs * window, Wp, C)
    highs = jnp.pad(bands[:, :, window:],
                    ((0, 0), (0, 0), (0, 2 * window - k), (0, 0), (0, 0)))
    highs = highs.reshape(b, hs * window, Wp, C)
    out = jnp.pad(lows, ((0, 0), (0, Hp - hs * window), (0, 0), (0, 0)))
    out = out + jnp.pad(highs, ((0, 0), (window, 0), (0, 0), (0, 0)))[:, :Hp]
    return out


def _prep(x, bias, window, halo, n_head):
    b, H, W, C = x.shape
    k = window + 2 * halo
    assert 2 * halo <= window, (window, halo)
    kpad = _ceil8(k)
    x_p = jnp.pad(x, ((0, 0), (halo, halo),
                      (halo, halo + (kpad - k)), (0, 0)))
    M = window * window
    bias_p = jnp.pad(bias.reshape(n_head, M, k, k),
                     ((0, 0), (0, 0), (0, 0), (0, kpad - k)),
                     constant_values=-1e9).reshape(n_head, M, k * kpad)
    return x_p, bias_p, k, kpad


def _rs2_form(rs, B):
    rs_attn, rs_ff = rs
    if rs_attn is None and rs_ff is None:
        return jnp.zeros((1, 2), jnp.float32), 0
    one = jnp.ones((B,), jnp.float32)
    a = one if rs_attn is None else rs_attn.astype(jnp.float32)
    f = one if rs_ff is None else rs_ff.astype(jnp.float32)
    return jnp.stack([a, f], axis=1), 1


def _bias_forms(x, bout, b1f, b2f):
    has = (bout is not None, b1f is not None, b2f is not None)
    z = jnp.zeros((1, 1), x.dtype)
    return has, (bout.reshape(1, -1) if has[0] else z,
                 b1f.reshape(1, -1) if has[1] else z,
                 b2f.reshape(1, -1) if has[2] else z)


def _c2(shape):
    return pl.BlockSpec(shape, lambda b, y: (0, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _halo_layer(x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                packed, n_head, act, scale, eps, window, halo_interpret):
    out, _ = _hl_fwd(x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                     packed, n_head, act, scale, eps, window, halo_interpret,
                     save="none")
    return out


def _save_mode():
    env = os.environ.get("VTX_HL_SAVE")
    return env if env in ("none", "z+acc") else "z+acc"


def _hl_fwd(x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f, packed,
            n_head, act, scale, eps, window, halo_interpret, save=None):
    halo, interpret = halo_interpret
    bias, rs = packed
    B, H, W, C = x.shape
    HD = wqkv.shape[1] // 3
    F = w1.shape[1]
    dim_head = HD // n_head
    w = window
    hs = H // w
    if save is None:
        save = _save_mode()
    x_p, bias_p, k, kpad = _prep(x, bias, window, halo, n_head)
    Hp, Wp = x_p.shape[1], x_p.shape[2]
    M = w * w
    rs_b, has_rs = _rs2_form(rs, B)
    has, (bo, bf1, bf2) = _bias_forms(x, bout, b1f, b2f)

    band_out = pl.BlockSpec((1, w, W, C), lambda b, y: (b, y, 0, 0))
    out_specs = [band_out]
    out_shape = [jax.ShapeDtypeStruct((B, H, W, C), x.dtype)]
    if save != "none":
        out_specs.append(band_out)
        out_shape.append(jax.ShapeDtypeStruct((B, H, W, C), x.dtype))
        out_specs.append(pl.BlockSpec((1, w, W, HD),
                                      lambda b, y: (b, y, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, H, W, HD), x.dtype))

    outs = pl.pallas_call(
        functools.partial(
            _hl_fwd_kernel, scale=scale, eps=eps, window=w, halo=halo,
            H=H, W=W, n_head=n_head, dim_head=dim_head, act=act,
            has_bout=has[0], has_b1f=has[1], has_b2f=has[2],
            has_rs=bool(has_rs), save=save),
        grid=(B, hs),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b, y: (b, 0, 0, 0)),
            _c2((1, C)), _c2((1, C)),
            _c2(wqkv.shape), _c2(wout.shape), _c2(bo.shape),
            _c2((1, C)), _c2((1, C)),
            _c2(w1.shape), _c2(bf1.shape), _c2(w2.shape), _c2(bf2.shape),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
            pl.BlockSpec(rs_b.shape, lambda b, y: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs if save != "none" else out_specs[0],
        out_shape=out_shape if save != "none" else out_shape[0],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x_p, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2, bias_p, rs_b)
    if save == "none":
        out, z, acc = outs, None, None
    else:
        out, z, acc = outs
    return out, (x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                 bias, rs, z, acc)


def _hl_fwd_rule(x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                 packed, n_head, act, scale, eps, window, halo_interpret):
    return _hl_fwd(x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f,
                   packed, n_head, act, scale, eps, window, halo_interpret,
                   save="z+acc")


def _hl_bwd(n_head, act, scale, eps, window, halo_interpret, res, do):
    halo, interpret = halo_interpret
    (x, g1, b1, wqkv, wout, bout, g2, b2, w1, b1f, w2, b2f, bias, rs,
     z, acc) = res
    B, H, W, C = x.shape
    HD = wqkv.shape[1] // 3
    F = w1.shape[1]
    dim_head = HD // n_head
    w = window
    hs = H // w
    x_p, bias_p, k, kpad = _prep(x, bias, window, halo, n_head)
    Hp, Wp = x_p.shape[1], x_p.shape[2]
    M = w * w
    rs_b, has_rs = _rs2_form(rs, B)
    has, (bo, bf1, bf2) = _bias_forms(x, bout, b1f, b2f)

    band_in = pl.BlockSpec((1, w, W, C), lambda b, y: (b, y, 0, 0))
    rs_spec = pl.BlockSpec(rs_b.shape, lambda b, y: (0, 0),
                           memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(
            _hl_bwd_kernel, scale=scale, eps=eps, window=w, halo=halo,
            H=H, W=W, n_head=n_head, dim_head=dim_head, act=act,
            has_bout=has[0], has_b1f=has[1], has_b2f=has[2],
            has_rs=bool(has_rs), save="z+acc"),
        grid=(B, hs),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b, y: (b, 0, 0, 0)),
            _c2((1, C)), _c2((1, C)),
            _c2(wqkv.shape), _c2(wout.shape), _c2(bo.shape),
            _c2((1, C)), _c2((1, C)),
            _c2(w1.shape), _c2(bf1.shape), _c2(w2.shape), _c2(bf2.shape),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
            rs_spec,
            band_in,
            band_in,
            pl.BlockSpec((1, w, W, HD), lambda b, y: (b, y, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, k, Wp, C), lambda b, y: (b, y, 0, 0, 0)),
            _c2((1, C)), _c2((1, C)),
            _c2(wqkv.shape), _c2(wout.shape), _c2((1, C)),
            _c2((1, C)), _c2((1, C)),
            _c2(w1.shape), _c2((1, F)), _c2(w2.shape), _c2((1, C)),
            pl.BlockSpec((n_head, M, k * kpad), lambda b, y: (0, 0, 0)),
            rs_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, hs, k, Wp, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct(wqkv.shape, jnp.float32),
            jax.ShapeDtypeStruct(wout.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((n_head, M, k * kpad), jnp.float32),
            jax.ShapeDtypeStruct((B, 2) if has_rs else (1, 2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((k, Wp, 3 * HD), jnp.float32)],
        interpret=interpret,
        compiler_params=_cp(interpret),
    )(x_p, g1.reshape(1, -1), b1.reshape(1, -1), wqkv, wout, bo,
      g2.reshape(1, -1), b2.reshape(1, -1), w1, bf1, w2, bf2, bias_p, rs_b,
      do.astype(x.dtype), z, acc)
    (dxb, dg1, db1, dwqkv, dwout, dbout, dg2, db2, dw1, db1f, dw2, db2f,
     dbias_p, drs) = outs

    dx = _fold_dx(dxb, w, halo, Hp)[:, halo:halo + H, halo:halo + W]
    dbias = dbias_p.reshape(n_head, M, k, kpad)[..., :k] \
        .reshape(n_head, M, k * k).astype(bias.dtype)
    rs_attn, rs_ff = rs
    drs_out = (
        (None, None) if not has_rs
        else (drs[:, 0].astype(rs_attn.dtype) if rs_attn is not None
              else None,
              drs[:, 1].astype(rs_ff.dtype) if rs_ff is not None else None))
    return (dx, dg1[0].astype(g1.dtype), db1[0].astype(b1.dtype),
            dwqkv.astype(wqkv.dtype), dwout.astype(wout.dtype),
            dbout[0].astype(bout.dtype) if has[0] else None,
            dg2[0].astype(g2.dtype), db2[0].astype(b2.dtype),
            dw1.astype(w1.dtype),
            db1f[0].astype(b1f.dtype) if has[1] else None,
            dw2.astype(w2.dtype),
            db2f[0].astype(b2f.dtype) if has[2] else None,
            (dbias, drs_out))


_halo_layer.defvjp(_hl_fwd_rule, _hl_bwd)


def fused_halo_layer(x, ln1_scale, ln1_bias, wqkv, wout, bout,
                     ln2_scale, ln2_bias, w1, b1, w2, b2, bias,
                     n_head: int, rs_attn=None, rs_ff=None,
                     activation: str = "silu", *, window: int, halo: int,
                     scale: Optional[float] = None, eps: float = 1e-6,
                     interpret: bool = False):
    """Whole Halo layer as ONE Pallas program over the NHWC feature map:

        o = HaloLayer(x)   with   x, o: [B, H, W, C]

    ``bias``: [n_head, w², k²] f32 additive rel-pos attention bias
    (differentiable).  ``rs_attn``/``rs_ff``: optional [B] per-sample
    DropPath scales.  qkv has NO bias (reference halo_transformer.py:66).
    Reference layer: halo_transformer.py:119-150.
    """
    if scale is None:
        HD = wqkv.shape[1] // 3
        scale = 1.0 / math.sqrt(HD // n_head)
    return _halo_layer(x, ln1_scale, ln1_bias, wqkv, wout, bout,
                       ln2_scale, ln2_bias, w1, b1, w2, b2,
                       (bias.astype(jnp.float32), (rs_attn, rs_ff)),
                       n_head, activation, float(scale), float(eps),
                       window, (int(halo), bool(interpret)))
