"""Vision Transformer + DINO head (reference: models/vit.py).

TPU-native design notes:
- single fused qkv projection feeding one batched attention einsum per layer —
  all FLOPs land on the MXU; softmax runs in float32 for bf16 stability
- the multi-crop forward of the reference (torch.unique_consecutive grouping,
  models/vit.py:177-203) becomes *static* resolution grouping: crops of equal
  spatial size are stacked into one batched forward at trace time, so the
  whole multi-crop step stays inside one jit
- positional-embedding interpolation for resolution changes reproduces
  torch's bicubic exactly (a=-0.75 Keys kernel, half-pixel centers, clamped
  borders, NO antialias) as a trace-time-static weight matrix applied with
  two small einsums (reference: models/vit.py:153-175) — jax.image.resize
  uses a different cubic kernel and antialiases on downscale, a ~1e-3
  divergence on DINO local crops
- DropPath rates are a static per-layer ramp; the reference's
  ``set_drop_path`` mutation hook (models/vit.py:120-125) maps to rebuilding
  the module with a new rate (models are cheap frozen dataclasses here)
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import (DenseParams, FeedForward, LayerNormParams, dense_apply,
                     drop_path, layer_norm_apply, trunc_normal_init, tuple2)

Dtype = Any

_LN_EPS = 1e-6  # reference: models/vit.py:13


def _torch_bicubic_matrix(side_in: int, side_out: int) -> np.ndarray:
    """Interpolation matrix W (side_out, side_in) replicating torch
    ``F.interpolate(mode="bicubic", align_corners=False, antialias=False)``
    with ``scale_factor=side_out/side_in`` (reference models/vit.py:163-171):
    source index ``(i + 0.5) * in/out - 0.5``, 4-tap Keys cubic with
    A = -0.75, border taps clamped (weights accumulate on the edge pixel).

    One static matrix per (in, out) pair — applied as two einsums, the whole
    interpolation is two tiny MXU matmuls instead of a gather."""
    A = -0.75

    def k1(x):  # |x| <= 1
        return ((A + 2) * x - (A + 3)) * x * x + 1

    def k2(x):  # 1 < |x| < 2
        return ((A * x - 5 * A) * x + 8 * A) * x - 4 * A

    inv_scale = side_in / side_out
    W = np.zeros((side_out, side_in), np.float64)
    for i in range(side_out):
        src = (i + 0.5) * inv_scale - 0.5
        f = math.floor(src)
        t = src - f
        for tap, w in enumerate((k2(t + 1), k1(t), k1(1 - t), k2(2 - t))):
            W[i, min(max(f - 1 + tap, 0), side_in - 1)] += w
    return W.astype(np.float32)


class MultiHeadedAttention(nn.Module):
    """Fused-qkv MHSA (reference: models/vit.py:16-45)."""

    n_head: int
    use_bias: bool = True
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None, row_scale=None,
                 extra=None, return_params: bool = False):
        """``ln=(scale, bias, eps)`` switches to the fused layer-half kernel
        computing ``x + row_scale ⊙ Attn(LN(x))`` in one Pallas program
        (ops/fused_layer.py); ``row_scale``: per-sample DropPath scale;
        ``extra``: additive [n, n] f32 attention bias (the block-diagonal
        mask of the model-level crop packing).  ``return_params=True`` just
        materializes and returns the raw (wqkv, bqkv, wout, bout) Dense
        params — the whole-layer kernel (ops/fused_layer1.py) takes the
        weights of both residual branches directly."""
        b, n, dim = x.shape
        dim_head = dim // self.n_head

        # raw Dense params ({qkv,linear}/{kernel,bias} — the exact nn.Dense
        # tree) so the fused kernels can take the weights VMEM-resident
        wqkv, bqkv = DenseParams(
            dim * 3, use_bias=self.use_bias,
            kernel_init=trunc_normal_init(0.02), name="qkv")(dim)
        wout, bout = DenseParams(
            dim, kernel_init=trunc_normal_init(0.02), name="linear")(dim)
        if return_params:
            return wqkv, bqkv, wout, bout
        scale = 1.0 / math.sqrt(dim_head)
        from .. import ops as _ops

        if ln is not None:
            g, bb, eps = ln
            return _ops.fused_attention_layer(
                x, g, bb, wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                wout.astype(self.dtype), bout.astype(self.dtype),
                self.n_head, extra, row_scale, scale, eps)

        impl = _ops.attention_impl(b, seq=n, default="fused")
        if not (deterministic or self.dropout == 0.0):
            impl = "einsum"  # attention dropout needs materialized probs

        if impl == "block":
            # whole-block Pallas kernel: qkv projection + attention + out
            # projection fused, weights VMEM-resident across the batch grid
            return _ops.fused_attention_block(
                x, wqkv.astype(self.dtype),
                None if bqkv is None else bqkv.astype(self.dtype),
                wout.astype(self.dtype), bout.astype(self.dtype),
                self.n_head, extra, scale)

        qkv = dense_apply(x, wqkv, bqkv, self.dtype)
        if impl == "fused":
            # packed-qkv kernel: reads the projection output [b,n,3hd]
            # untouched and writes [b,n,hd] — no HBM relayout on either side
            out = _ops.fused_attention_qkv(qkv, self.n_head, extra, scale)
            return dense_apply(out, wout, bout, self.dtype)

        # Short sequences (DINO's 37-token local crops) underuse the MXU:
        # pack ``pack`` row-sequences into one (pack·n)-token attention with
        # a block-diagonal −1e9 mask.  The [b,n,·]→[b/p,p·n,·] view merges
        # adjacent dims (no transpose), and the math is exact — masked
        # scores underflow to exactly 0 after the row-max subtraction, and
        # adding exact zeros leaves the softmax sums unchanged.  Skipped when
        # the caller already packed at the model level (extra is not None).
        pack = 1
        if extra is None and n <= 64 \
                and os.environ.get("VTX_PACK_SHORT", "1") != "0":
            for p in (3, 2):
                if b % p == 0 and p * n <= 128:
                    pack = p
                    break
        pn = pack * n
        qkv = qkv.reshape(b // pack, pn, 3, self.n_head, dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b/p, pn, h, d]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = attn.astype(jnp.float32)
        if extra is not None:
            attn = attn + jnp.asarray(extra, jnp.float32)
        elif pack > 1:
            eye = np.kron(np.eye(pack, dtype=np.float32),
                          np.ones((n, n), np.float32))
            attn = attn + jnp.asarray(np.where(eye > 0, 0.0, -1e9),
                                      jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, dim)
        return dense_apply(out, wout, bout, self.dtype)


class TransformerLayer(nn.Module):
    """Pre-LN block with DropPath (reference: models/vit.py:48-66)."""

    n_head: int
    dim_ff: int
    dropout: float = 0.0
    drop_attn: float = 0.0
    drop_ff: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    def _row_scale(self, b: int, deterministic: bool, pack: int = 1,
                   n: Optional[int] = None):
        """Per-sample DropPath scale (mask/keep — drop_path semantics,
        reference models/layer.py:166-183).  [b] for the fused layer
        kernels; token-level [b, pack·n] when ``pack`` crops share a row
        (one independent draw per crop, exactly the unpacked semantics)."""
        if deterministic or self.drop_path == 0.0:
            return None
        keep = 1.0 - self.drop_path
        if pack == 1:
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (b,))
            return mask.astype(jnp.float32) / keep
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (b, pack))
        return jnp.repeat(mask.astype(jnp.float32), n, axis=1) / keep

    @nn.compact
    def __call__(self, x, deterministic: bool = True, extra=None,
                 pack: int = 1, rs_override=None):
        """``extra``/``pack``: model-level crop packing — ``pack`` crops of
        n//pack tokens each share this row, isolated by the block-diagonal
        ``extra`` mask (see VisionTransformer.forward_feature).

        ``rs_override``: (rs_attn, rs_ff) pre-drawn DropPath scales — the
        scan-over-layers path (scan_layers) draws per-layer scales OUTSIDE
        the scan (the ramp rates are static there) and feeds them in as
        scanned inputs; each is None, [b] (per sample) or [b, n] (token
        level, packed crops)."""
        from .. import ops as _ops

        b, n, dim = x.shape
        if rs_override is not None:
            _draws = iter(rs_override)
            row_scale = lambda: next(_draws)
            scales_per_sample = (rs_override[0] is None
                                 or rs_override[0].ndim == 1)
        else:
            row_scale = lambda: self._row_scale(b, deterministic, pack,
                                                n // pack)
            scales_per_sample = (deterministic or self.drop_path == 0.0
                                 or pack == 1)
        g1, b1 = LayerNormParams(name="norm_attn")(dim)
        g2, b2 = LayerNormParams(name="norm_ff")(dim)
        attn = MultiHeadedAttention(
            self.n_head, dropout=self.drop_attn, dtype=self.dtype, name="attn")
        # reference FF activation defaults to SiLU (layer.py:186-196; the
        # TransformerLayer doesn't override it, models/vit.py:55)
        ff = FeedForward(dim=self.dim_ff, activation=jax.nn.silu,
                         dropout=self.drop_ff, dtype=self.dtype, name="ff")

        def apply_dp(base, h, rs):
            """base + rs ⊙ h with rs per sample ([b]) or per token ([b, n])."""
            if rs is None:
                return base + h
            rs = rs[:, None, None] if rs.ndim == 1 else rs[:, :, None]
            return base + h * rs.astype(h.dtype)

        # measured default (PERF.md round 2): fused attention-layer kernel
        # for full-length sequences (incl. model-packed short crops), einsum
        # for short unpacked ones
        site_default = "layer" if (n >= 128 or pack > 1) else "einsum"
        impl = _ops.attention_impl(b, seq=n, default=site_default)
        use_layer = impl in ("layer", "layer1") \
            and (deterministic or (self.dropout == 0.0 and
                                   self.drop_attn == 0.0 and
                                   self.drop_ff == 0.0))
        # token-level DropPath scales (packed crops with drop_path > 0)
        # need the two-call path below; checked BEFORE drawing so the
        # dropout rng stream stays aligned with the "layer" impl
        # (scales_per_sample computed above, override-aware)
        if use_layer and impl == "layer1" and scales_per_sample:
            # whole layer (attention + FF residual branches) as ONE custom
            # call (ops/fused_layer1.py) — kills the per-layer dependent-
            # custom-call boundary (PERF.md round 3)
            rs1 = row_scale()
            if rs1 is None or rs1.ndim == 1:
                rs2 = row_scale()
                wqkv, bqkv, wout, bout = attn(x, return_params=True)
                w1f, b1f, w2f, b2f = ff(x, return_params=True)
                return _ops.fused_transformer_layer(
                    x, g1, b1, wqkv.astype(self.dtype),
                    None if bqkv is None else bqkv.astype(self.dtype),
                    wout.astype(self.dtype), bout.astype(self.dtype),
                    g2, b2, w1f.astype(self.dtype), b1f.astype(self.dtype),
                    w2f.astype(self.dtype), b2f.astype(self.dtype),
                    self.n_head, extra, rs1, rs2, "silu", eps=_LN_EPS)
        if use_layer:
            # attention residual branch as one fused kernel; DropPath rides
            # in as a per-sample row scale.  Token-level scales (packed
            # crops) are applied outside the kernel: x + rs ⊙ (out − x)
            # is exact because the kernel returns x + branch.  The FF half
            # fuses only when the FF kernel is enabled (backward trails
            # XLA — PERF.md)
            rs = row_scale()
            if rs is None or rs.ndim == 1:
                x = attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                         row_scale=rs, extra=extra)
            else:
                out = attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                           extra=extra)
                x = apply_dp(x, out - x, rs)
            rs = row_scale()
            if _ops.ff_kernel_enabled() and (rs is None or rs.ndim == 1):
                return ff(x, deterministic, ln=(g2, b2, _LN_EPS),
                          row_scale=rs)
            h = layer_norm_apply(x, g2, b2, _LN_EPS, self.dtype)
            h = ff(h, deterministic)
            return apply_dp(x, h, rs)

        def dp(y):
            if rs_override is not None:
                rs = row_scale()
                if rs is None:
                    return y
                rs = rs[:, None, None] if rs.ndim == 1 else rs[:, :, None]
                return y * rs.astype(y.dtype)
            if deterministic or self.drop_path == 0.0:
                return y
            if pack > 1:
                rs = self._row_scale(b, deterministic, pack, n // pack)
                return y * rs[:, :, None].astype(y.dtype)
            return drop_path(y, self.drop_path, self.make_rng("dropout"), False)

        h = layer_norm_apply(x, g1, b1, _LN_EPS, self.dtype)
        h = attn(h, deterministic, extra=extra)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + dp(h)

        h = layer_norm_apply(x, g2, b2, _LN_EPS, self.dtype)
        h = ff(h, deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return x + dp(h)


class PatchEmbedding(nn.Module):
    """Conv patchify → sequence (reference: models/vit.py:69-76).

    A stride-p conv over p×p patches is mathematically a reshape + matmul; we
    keep the conv form — XLA lowers it onto the MXU directly.
    """

    dim: int
    patch_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: NHWC
        p = self.patch_size
        y = nn.Conv(
            self.dim, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype,
            # named "linear" to mirror the reference attribute
            # (models/vit.py:71) — AGC's name-based exclusion rule depends
            # on it (reference train.py:260: params with "linear" in the
            # name are NOT adaptively clipped)
            kernel_init=trunc_normal_init(0.02), name="linear",
        )(x)
        b, h, w, c = y.shape
        return y.reshape(b, h * w, c)


class _LayerScanBody(nn.Module):
    """``lax.scan`` body for scan_layers: one TransformerLayer whose params
    carry a leading [depth] axis (``nn.scan`` variable_axes).  The whole
    12-layer stack traces and compiles ONCE instead of 12 times — a ~10×
    XLA graph reduction that fixes the DINO multi-crop compile blowup
    (224/chip failed a 10-minute compile window unrolled, PERF.md round 4;
    300-epoch runs re-jit per progressive stage, so compile time is a
    production cost, reference train.py:229-246)."""

    n_head: int
    dim_ff: int
    dropout: float = 0.0
    drop_attn: float = 0.0
    drop_ff: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rs, deterministic, extra, pack):
        # drop_path attr is 0 — per-layer ramp scales arrive pre-drawn via
        # rs (the ramp is static, so the draws happen OUTSIDE the scan)
        y = TransformerLayer(
            self.n_head, self.dim_ff, self.dropout, self.drop_attn,
            self.drop_ff, 0.0, dtype=self.dtype, name="layer",
        )(x, deterministic, extra, pack, rs_override=rs)
        return y, None


def stack_scan_layers(tree, depth: int):
    """Per-layer param tree (``layers_0`` … ``layers_{depth-1}``) → the
    scan_layers tree (``layers/layer`` with a leading [depth] axis).  Walks
    nested dicts, so it works on any enclosing tree (e.g. a DINO student's
    ``backbone``).  Inverse: :func:`unstack_scan_layers`."""
    if not isinstance(tree, dict):
        return tree
    if "layers_0" in tree:
        layers = [tree[f"layers_{i}"] for i in range(depth)]
        out = {k: v for k, v in tree.items() if not k.startswith("layers_")}
        out["layers"] = {"layer": jax.tree.map(
            lambda *xs: jnp.stack(xs), *layers)}
        return out
    return {k: stack_scan_layers(v, depth) for k, v in tree.items()}


def unstack_scan_layers(tree, depth: int):
    """Inverse of :func:`stack_scan_layers`."""
    if not isinstance(tree, dict):
        return tree
    if "layers" in tree and isinstance(tree["layers"], dict) \
            and set(tree["layers"]) == {"layer"}:
        out = {k: v for k, v in tree.items() if k != "layers"}
        stacked = tree["layers"]["layer"]
        for i in range(depth):
            out[f"layers_{i}"] = jax.tree.map(lambda v: v[i], stacked)
        return out
    return {k: unstack_scan_layers(v, depth) for k, v in tree.items()}


class VisionTransformer(nn.Module):
    """(reference: models/vit.py:79-203)"""

    image_size: Tuple[int, int]
    patch_size: int
    depth: int
    dim: int
    n_head: int
    dim_ff: int
    dropout: float = 0.0
    drop_attn: float = 0.0
    drop_ff: float = 0.0
    drop_path: float = 0.0
    n_class: Optional[int] = None  # None: return features (DINO backbone)
    remat: bool = False  # per-layer jax.checkpoint (memory <-> recompute)
    scan_layers: bool = False  # lax.scan over a stacked layer param axis
    dtype: Dtype = jnp.float32

    def setup(self):
        image_size = tuple2(self.image_size)
        n_patch = (image_size[0] // self.patch_size) * (image_size[1] // self.patch_size)
        self.patch_embedding = PatchEmbedding(self.dim, self.patch_size, dtype=self.dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, self.dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_patch + 1, self.dim), jnp.float32
        )
        rates = [self.drop_path * i / max(self.depth - 1, 1) for i in range(self.depth)]
        # remat: per-layer jax.checkpoint — activations of each block are
        # recomputed in the backward instead of saved, trading ~1 extra
        # forward of FLOPs for O(depth) less HBM (larger per-chip batch).
        # static args: deterministic (2), pack (4); param structure unchanged
        layer_cls = (nn.remat(TransformerLayer, static_argnums=(2, 4))
                     if self.remat else TransformerLayer)
        if self.scan_layers:
            body = (nn.remat(_LayerScanBody, static_argnums=(3, 5))
                    if self.remat else _LayerScanBody)
            self.layers = ()
            self.scan_block = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.depth,
            )(self.n_head, self.dim_ff, self.dropout, self.drop_attn,
              self.drop_ff, dtype=self.dtype, name="layers")
        else:
            self.layers = [
                layer_cls(
                    self.n_head, self.dim_ff, self.dropout, self.drop_attn,
                    self.drop_ff, rates[i], dtype=self.dtype,
                    name=f"layers_{i}",
                )
                for i in range(self.depth)
            ]
        self.norm = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype)
        self.pos_dropout = nn.Dropout(self.dropout)
        if self.n_class is not None:
            self.head = nn.Dense(
                self.n_class, dtype=jnp.float32, kernel_init=trunc_normal_init(0.02)
            )

    def interpolate_pos_embedding(self, n_patch: int) -> jax.Array:
        """Bicubic resize of the grid pos-embed, bit-matching torch's
        bicubic (reference: models/vit.py:153-175) via a static weight
        matrix — see ``_torch_bicubic_matrix``."""
        pos_embed = self.pos_embed
        n_pos = pos_embed.shape[1] - 1
        if n_patch == n_pos:
            return pos_embed
        cls_embed = pos_embed[:, :1]
        grid = pos_embed[:, 1:]
        dim = grid.shape[-1]
        side_in = int(math.sqrt(n_pos))
        side_out = int(math.sqrt(n_patch))
        W = jnp.asarray(_torch_bicubic_matrix(side_in, side_out))
        grid = grid.reshape(side_in, side_in, dim)
        grid = jnp.einsum("oi,ijd->ojd", W, grid)
        grid = jnp.einsum("pj,ojd->opd", W, grid)
        grid = grid.reshape(1, side_out * side_out, dim)
        return jnp.concatenate([cls_embed, grid], axis=1)

    def forward_feature(self, x, deterministic: bool = True):
        """(reference: models/vit.py:139-151). x: NHWC.

        Short sequences (DINO's 37-token local crops) are packed ``pack``
        crops to a row for the WHOLE layer stack — one [b/p, p·n, d] view
        (adjacent-dim merge, no transpose) with a block-diagonal −1e9
        attention mask.  Every non-attention op is token-pointwise, so the
        math is exact; DropPath keeps one independent draw per crop via
        token-level scales (TransformerLayer.apply_dp).  This keeps the
        locals on the fused layer kernel with MXU-sized rows instead of
        37-token fragments."""
        out = self.patch_embedding(x)
        b, n, _ = out.shape
        cls = jnp.broadcast_to(self.cls_token.astype(out.dtype), (b, 1, self.dim))
        out = jnp.concatenate([cls, out], axis=1)
        out = out + self.interpolate_pos_embedding(n).astype(out.dtype)
        out = self.pos_dropout(out, deterministic=deterministic)

        # p·seq ≤ 128 keeps every packed score/av dot inside ONE MXU tile
        # pair (M, N ≤ 128): p=4 at 37 tokens (148) measured SLOWER than
        # p=2 (74) despite fewer rows — crossing 128 doubles the passes of
        # every [m,d]·[d,m] attention dot while 3/4 of the grown tile is
        # cross-crop mask waste
        seq = n + 1
        pack = 1
        if seq <= 64 and os.environ.get("VTX_PACK_MODEL", "1") != "0":
            for p in (3, 2):
                if b % p == 0 and p * seq <= 128:
                    pack = p
                    break
        extra = None
        if pack > 1:
            out = out.reshape(b // pack, pack * seq, self.dim)
            eye = np.kron(np.eye(pack, dtype=np.float32),
                          np.ones((seq, seq), np.float32))
            extra = jnp.asarray(np.where(eye > 0, 0.0, -1e9), jnp.float32)

        if self.scan_layers:
            rows = out.shape[0]
            if deterministic or self.drop_path == 0.0:
                rs = (None, None)
            else:
                # pre-draw the per-layer DropPath scales — the ramp rates
                # are static only OUTSIDE the scan body
                rates = [self.drop_path * i / max(self.depth - 1, 1)
                         for i in range(self.depth)]
                key = self.make_rng("dropout")
                keys = jax.random.split(key, 2 * self.depth)

                def draw(k, rate):
                    keep = 1.0 - rate
                    if pack == 1:
                        m = jax.random.bernoulli(k, keep, (rows,))
                        return m.astype(jnp.float32) / keep
                    m = jax.random.bernoulli(k, keep, (rows, pack))
                    m = jnp.repeat(m.astype(jnp.float32), seq, axis=1)
                    return m / keep

                rs = (jnp.stack([draw(keys[2 * i], r)
                                 for i, r in enumerate(rates)]),
                      jnp.stack([draw(keys[2 * i + 1], r)
                                 for i, r in enumerate(rates)]))
            out, _ = self.scan_block(out, rs, deterministic, extra, pack)
        else:
            for layer in self.layers:
                out = layer(out, deterministic, extra, pack)
        if pack > 1:
            out = out.reshape(b, seq, self.dim)
        out = self.norm(out)
        return out[:, 0]

    def __call__(self, x, deterministic: bool = True):
        """Accepts one array or a list of crops (reference: models/vit.py:177-203).

        Crops with equal spatial size are concatenated and run in a single
        batched forward; grouping happens at trace time, so shapes stay static
        under jit.
        """
        if not isinstance(x, (list, tuple)):
            x = [x]

        groups: list[list[jax.Array]] = []
        sizes: list[Tuple[int, int]] = []
        for crop in x:  # consecutive grouping, like unique_consecutive
            size = crop.shape[1:3]
            if sizes and sizes[-1] == size:
                groups[-1].append(crop)
            else:
                groups.append([crop])
                sizes.append(size)

        feats = []
        for group in groups:
            batch = jnp.concatenate(group, axis=0) if len(group) > 1 else group[0]
            feats.append(self.forward_feature(batch, deterministic))
        output = jnp.concatenate(feats, axis=0) if len(feats) > 1 else feats[0]

        if self.n_class is not None:
            output = self.head(output.astype(jnp.float32))
        return output


class DINOHead(nn.Module):
    """MLP → L2-normalize → weight-normed linear (reference: models/vit.py:206-262)."""

    out_dim: int
    use_bn: bool = False
    norm_last_layer: bool = True
    depth: int = 3
    dim_ff: int = 2048
    dim_bottleneck: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        init = trunc_normal_init(0.02)
        h = x
        if self.depth == 1:
            h = nn.Dense(self.dim_bottleneck, dtype=self.dtype, kernel_init=init, name="mlp_0")(h)
        else:
            h = nn.Dense(self.dim_ff, dtype=self.dtype, kernel_init=init, name="mlp_0")(h)
            if self.use_bn:
                h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                                 dtype=self.dtype, name="bn_0")(h)
            h = jax.nn.gelu(h, approximate=False)
            for i in range(self.depth - 2):
                h = nn.Dense(self.dim_ff, dtype=self.dtype, kernel_init=init,
                             name=f"mlp_{i + 1}")(h)
                if self.use_bn:
                    h = nn.BatchNorm(use_running_average=deterministic, momentum=0.9,
                                     dtype=self.dtype, name=f"bn_{i + 1}")(h)
                h = jax.nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim_bottleneck, dtype=self.dtype, kernel_init=init,
                         name=f"mlp_{self.depth - 1}")(h)

        # L2 normalize (reference: models/vit.py:259)
        h = h.astype(jnp.float32)
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

        # weight-normed last linear, gain frozen to 1 (reference: models/vit.py:244-248):
        # w = g * v / ||v||_row ; g == 1 when norm_last_layer (non-trainable).
        v = self.param("last_v", init, (self.dim_bottleneck, self.out_dim), jnp.float32)
        v_norm = jnp.maximum(jnp.linalg.norm(v, axis=0, keepdims=True), 1e-12)
        w = v / v_norm
        if not self.norm_last_layer:
            g = self.param("last_g", nn.initializers.ones, (self.out_dim,), jnp.float32)
            w = w * g
        # The [256, 65536] prototype matmul is the single widest dot in the
        # DINO step; run it at the model compute dtype (f32 accumulation via
        # preferred_element_type) instead of full f32 — the normalization
        # above stays f32.  No-op when the model itself is f32.
        return jax.lax.dot(h.astype(self.dtype), w.astype(self.dtype),
                           preferred_element_type=jnp.float32)


class DINOModel(nn.Module):
    """Backbone + DINO head, with the multi-crop grouped forward."""

    backbone: VisionTransformer
    head: DINOHead

    def __call__(self, x, deterministic: bool = True):
        feats = self.backbone(x, deterministic)
        return self.head(feats, deterministic)


# ---------------------------------------------------------------------------
# Registry entries
# ---------------------------------------------------------------------------


@register("model", "vit")
class ViTConfig(TypedConfig):
    """Plain ViT classifier (reference class models/vit.py:79; the reference
    only conf-registers the DINO variant, this adds the classification entry
    the training loop needs for ImageNet runs)."""

    image_size: Any = 224
    window_size: int = 16  # reference calls the patch size "window_size"
    n_class: int = 1000
    depth: int = 12
    dim: int = 384
    n_head: int = 6
    dim_ff: int = 1536
    dropout: float = 0.0
    drop_attn: float = 0.0
    drop_ff: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema
    scan_layers: bool = False  # lax.scan layer stack (12x smaller XLA graph)

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> VisionTransformer:
        return VisionTransformer(
            image_size=tuple2(self.image_size),
            patch_size=self.window_size,
            depth=self.depth,
            dim=self.dim,
            n_head=self.n_head,
            dim_ff=self.dim_ff,
            dropout=self.dropout if dropout is None else dropout,
            drop_attn=self.drop_attn,
            drop_ff=self.drop_ff,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            scan_layers=self.scan_layers,
            n_class=self.n_class,
            dtype=dtype,
        )


@register("model", "dino")
class DINOConfig(TypedConfig):
    """(reference factory: models/vit.py:265-307)"""

    image_size: Any = 224
    window_size: int = 16
    depth: int = 12
    dim: int = 384
    n_head: int = 6
    dim_ff: int = 1536
    dropout: float = 0.0
    drop_attn: float = 0.0
    drop_ff: float = 0.0
    drop_path: float = 0.0
    dim_head_out: int = 65536
    use_bn: bool = False
    norm_last_layer: bool = True
    depth_head: int = 3
    dim_head_ff: int = 2048
    dim_head_bottleneck: int = 256
    remat: bool = False  # optional extension over the reference conf schema
    scan_layers: bool = False  # lax.scan layer stack (12x smaller XLA graph)

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None) -> DINOModel:
        backbone = VisionTransformer(
            image_size=tuple2(self.image_size),
            patch_size=self.window_size,
            depth=self.depth,
            dim=self.dim,
            n_head=self.n_head,
            dim_ff=self.dim_ff,
            dropout=self.dropout,
            drop_attn=self.drop_attn,
            drop_ff=self.drop_ff,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            scan_layers=self.scan_layers,
            n_class=None,
            dtype=dtype,
        )
        head = DINOHead(
            out_dim=self.dim_head_out,
            use_bn=self.use_bn,
            norm_last_layer=self.norm_last_layer,
            depth=self.depth_head,
            dim_ff=self.dim_head_ff,
            dim_bottleneck=self.dim_head_bottleneck,
            dtype=dtype,
        )
        return DINOModel(backbone=backbone, head=head)
