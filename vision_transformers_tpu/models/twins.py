"""Twins-SVT (reference: models/twins.py).

Alternates windowed local attention (LSA — no relative-position bias, no
shift) with global sub-sampled attention (GSA — PVT-style strided-conv k/v
reduction but with NO LayerNorm after the reduce, reference :68-74) inside a
single layer, each of the four sublayers with its own DropPath residual
(reference :155-197).  A CPVT positional-encoding generator (depthwise 3×3
conv residual, reference :25-36) follows the first layer of every block.

TPU notes: both attentions are batched einsums over MXU-shaped operands; the
depthwise PEG conv lowers to a VPU-friendly small conv that XLA fuses with
the surrounding residual add.

Reference quirks reproduced:
- GSA reduction factor == window_size (reference :189)
- drop-path ramp i/sum(depths), transformer layers only (reference :275-321)
- q/kv projections biasless, output projection biased (reference :46-49)
"""

from __future__ import annotations

import math

import numpy as np
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import (DenseParams, FeedForward, LayerNormParams, dense_apply,
                     drop_path as drop_path_fn, layer_norm_apply,
                     trunc_normal_init)
from .swin import PatchEmbedding, patchify

Dtype = Any

_LN_EPS = 1e-6  # reference: models/twins.py:12


class PositionalEncodingGenerator(nn.Module):
    """Depthwise 3×3 conv residual (CPVT; reference: models/twins.py:25-36)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        out = nn.Conv(dim, (3, 3), padding=1, use_bias=False,
                      feature_group_count=dim, dtype=self.dtype,
                      kernel_init=trunc_normal_init(0.02), name="proj")(x)
        return out + x


class LocalAttention(nn.Module):
    """Windowed MHSA, no bias table, no shift (reference: models/twins.py:96-152)."""

    n_head: int
    dim_head: int
    window_size: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None, row_scale=None):
        """``ln=(scale, bias, eps)`` switches to the fused layer-half kernel
        (ops/fused_layer.py) and returns the FULL residual branch
        ``x + row_scale ⊙ LSA(LN(x))`` — same pattern as Swin's
        WindowAttention, with window PAIRS packed under a block-diagonal
        mask (no rel-pos table here, reference models/twins.py:96-152)."""
        b, h, w, dim = x.shape
        window = self.window_size
        hs, ws = h // window, w // window
        inner = self.n_head * self.dim_head
        w2 = window * window

        wqkv, bqkv = DenseParams(inner * 3,
                                 kernel_init=trunc_normal_init(0.02),
                                 name="weight")(dim)
        wout, bout = DenseParams(dim, kernel_init=trunc_normal_init(0.02),
                                 name="linear")(inner)
        from .. import ops as _ops

        if ln is not None:
            g_ln, b_ln, eps = ln
            pack = 2 if (ws % 2 == 0 and 2 * w2 <= 128) else 1
            m_tok = pack * w2
            groups = hs * ws // pack
            xw = x.reshape(b, hs, window, ws // pack, pack, window, dim)
            xw = xw.transpose(1, 3, 0, 4, 2, 5, 6)
            xw = xw.reshape(groups * b, m_tok, dim)
            if pack > 1:
                blk = np.full((m_tok, m_tok), -1e9, np.float32)
                blk[:w2, :w2] = 0.0
                blk[w2:, w2:] = 0.0
                extra = jnp.asarray(blk)  # shared over heads and groups
            else:
                extra = None
            rs_rows = None if row_scale is None else jnp.tile(row_scale, groups)
            out = _ops.fused_attention_layer(
                xw, g_ln, b_ln, wqkv.astype(self.dtype),
                bqkv.astype(self.dtype), wout.astype(self.dtype),
                bout.astype(self.dtype), self.n_head, extra, rs_rows,
                1.0 / math.sqrt(self.dim_head), eps)
            out = out.reshape(hs, ws // pack, b, pack, window, window, dim)
            return out.transpose(2, 0, 4, 1, 3, 5, 6).reshape(b, h, w, dim)

        qkv = dense_apply(x, wqkv, bqkv, self.dtype)
        qkv = qkv.reshape(b, hs, window, ws, window, 3, self.n_head, self.dim_head)
        qkv = qkv.transpose(0, 1, 3, 5, 6, 2, 4, 7).reshape(
            b, hs * ws, 3, self.n_head, window * window, self.dim_head
        )
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        score = jnp.einsum("bshqd,bshkd->bshqk", q, k) / math.sqrt(self.dim_head)
        attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bshqk,bshkd->bshqd", attn, v)
        out = out.reshape(b, hs, ws, self.n_head, window, window, self.dim_head)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, inner)
        return dense_apply(out, wout, bout, self.dtype)


class GlobalSubsampledAttention(nn.Module):
    """PVT-style SRA on an NHWC map, no post-reduce norm
    (reference: models/twins.py:39-93)."""

    n_head: int
    reduction: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, dim = x.shape
        dim_head = dim // self.n_head

        def heads(t):
            return t.reshape(b, -1, self.n_head, dim_head)

        q = heads(nn.Dense(dim, use_bias=False, dtype=self.dtype,
                           kernel_init=trunc_normal_init(0.02), name="linear_q")(x))

        if self.reduction > 1:
            # Faithful to a reference quirk (models/twins.py:68-72): the NHWC
            # map goes through ``transpose(1,2).reshape(b, dim, h, w)`` — a
            # buffer REINTERPRETATION, not a layout permute (that expression
            # is correct for PVT's [b, n, dim] sequence input but scrambles
            # Twins' 4D input).  The reference trains through it; reproduced
            # bit-for-bit for weight-level parity (tests/test_torch_parity.py).
            scrambled = x.transpose(0, 2, 1, 3).reshape(b, dim, h, w)
            red = nn.Conv(dim, (self.reduction, self.reduction),
                          strides=(self.reduction, self.reduction), padding="VALID",
                          dtype=self.dtype, kernel_init=trunc_normal_init(0.02),
                          name="reduce_conv")(scrambled.transpose(0, 2, 3, 1))
            # reference continues: conv_out.reshape(b, dim, -1).transpose(1, 2)
            kv_in = red.transpose(0, 3, 1, 2).reshape(b, dim, -1).transpose(0, 2, 1)
        else:
            kv_in = x.reshape(b, -1, dim)

        kv = nn.Dense(dim * 2, use_bias=False, dtype=self.dtype,
                      kernel_init=trunc_normal_init(0.02), name="linear_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        k, v = heads(k), heads(v)

        from .. import ops as _ops

        if ((deterministic or self.dropout == 0.0)
                and _ops.sra_attention_impl(
                    default="einsum", n_kv=k.shape[1]) == "fused"):
            # rectangular-score kernel path (A/B'd vs the einsum default,
            # PERF.md); attention dropout stays on the einsum path
            out = _ops.fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), None, 1.0 / math.sqrt(dim_head))
            out = out.transpose(0, 2, 1, 3).reshape(b, h, w, dim)
        else:
            score = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dim_head)
            attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, dim)
        return nn.Dense(dim, dtype=self.dtype,
                        kernel_init=trunc_normal_init(0.02), name="linear")(out)


class TwinsLayer(nn.Module):
    """LSA + FF + GSA + FF, four DropPath residuals (reference: :155-197)."""

    n_head: int
    dim_head: int
    dim_ff: int
    window_size: int
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    def _row_scale(self, b: int, deterministic: bool):
        if deterministic or self.drop_path == 0.0:
            return None
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (b,))
        return mask.astype(jnp.float32) / keep

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .. import ops as _ops

        def dp(y):
            if deterministic or self.drop_path == 0.0:
                return y
            return drop_path_fn(y, self.drop_path, self.make_rng("dropout"), False)

        b = x.shape[0]
        g1, b1 = LayerNormParams(name="norm_attn_local")(x.shape[-1])
        attn_local = LocalAttention(self.n_head, self.dim_head,
                                    self.window_size, self.drop_attn,
                                    dtype=self.dtype, name="attn_local")
        # "layer1" maps to the attention-half kernel here: the LSA window
        # partition sits between the two residual branches, so the
        # one-call-per-layer kernel cannot fuse across it
        use_layer = _ops.attention_impl(
            b, seq=self.window_size ** 2, default="layer") \
            in ("layer", "layer1") \
            and (deterministic or self.drop_attn == 0.0)
        if use_layer:
            x = attn_local(x, deterministic, ln=(g1, b1, _LN_EPS),
                           row_scale=self._row_scale(b, deterministic))
        else:
            h = layer_norm_apply(x, g1, b1, _LN_EPS, self.dtype)
            h = attn_local(h, deterministic)
            x = x + dp(h)

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_ff_local")(x)
        h = FeedForward(dim=self.dim_ff, activation=jax.nn.silu, dropout=self.drop_ff,
                        dtype=self.dtype, name="ff_local")(h, deterministic)
        x = x + dp(h)

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_attn_global")(x)
        h = GlobalSubsampledAttention(self.n_head, self.window_size, self.drop_attn,
                                      dtype=self.dtype, name="attn_global")(h, deterministic)
        x = x + dp(h)

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_ff_global")(x)
        h = FeedForward(dim=self.dim_ff, activation=jax.nn.silu, dropout=self.drop_ff,
                        dtype=self.dtype, name="ff_global")(h, deterministic)
        return x + dp(h)


class TwinsSVT(nn.Module):
    """(reference: models/twins.py:220-356)"""

    n_class: int
    depths: Tuple[int, int, int, int]
    dims: Tuple[int, int, int, int]
    dim_head: int
    n_heads: Tuple[int, int, int, int]
    dim_ffs: Tuple[int, int, int, int]
    window_size: int
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # per-layer jax.checkpoint (memory <-> recompute)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n_layers = sum(self.depths)
        rates = [self.drop_path * i / n_layers for i in range(n_layers)]
        reductions = (4, 2, 2, 2)

        out = x
        i_layer = 0
        for stage in range(4):
            out = PatchEmbedding(self.dims[stage], reductions[stage], dtype=self.dtype,
                                 name=f"embed{stage + 1}")(out)
            layer_cls = (nn.remat(TwinsLayer, static_argnums=(2,))
                         if self.remat else TwinsLayer)
            for i in range(self.depths[stage]):
                out = layer_cls(
                    self.n_heads[stage], self.dim_head, self.dim_ffs[stage],
                    self.window_size, drop_ff=self.drop_ff, drop_attn=self.drop_attn,
                    drop_path=rates[i_layer], dtype=self.dtype,
                    name=f"block{stage + 1}_{i}",
                )(out, deterministic)
                i_layer += 1
                if i == 0:
                    out = PositionalEncodingGenerator(
                        dtype=self.dtype, name=f"peg{stage + 1}"
                    )(out)

        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(out)
        out = jnp.mean(out, axis=(1, 2))
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=trunc_normal_init(0.02), name="classifier")(
            out.astype(jnp.float32)
        )


@register("model", "twins_svt")
class TwinsConfig(TypedConfig):
    """(reference registration: models/twins.py:220). Twins-SVT-S defaults."""

    n_class: int = 1000
    depths: Tuple[int, int, int, int] = (2, 2, 10, 4)
    dims: Tuple[int, int, int, int] = (64, 128, 256, 512)
    dim_head: int = 32
    n_heads: Tuple[int, int, int, int] = (2, 4, 8, 16)
    dim_ffs: Tuple[int, int, int, int] = (256, 512, 1024, 2048)
    window_size: int = 7
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> TwinsSVT:
        return TwinsSVT(
            n_class=self.n_class,
            depths=tuple(self.depths),
            dims=tuple(self.dims),
            dim_head=self.dim_head,
            n_heads=tuple(self.n_heads),
            dim_ffs=tuple(self.dim_ffs),
            window_size=self.window_size,
            drop_ff=self.drop_ff,
            drop_attn=self.drop_attn,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            dtype=dtype,
        )
