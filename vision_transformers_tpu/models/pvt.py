"""Pyramid Vision Transformer (reference: models/pvt.py).

TPU-native notes:
- spatial-reduction attention (SRA): k/v come from a strided conv over the
  NHWC feature map + LayerNorm (reference :26-54) — the conv is an MXU op and
  the sequence stays [B, N, D] everywhere else, so the whole layer is three
  batched matmuls + one conv
- per-stage shapes are static under jit: each stage's (height, width) is a
  Python constant at trace time, vs the reference threading runtime ints
- the optional ``prev`` score residual of the reference (:58-59, unused by
  its own TransformerLayer) is kept in the attention signature for parity

Reference quirks reproduced:
- q/kv projections have no bias, the output projection does (:19-22)
- cls token exists only in the last stage; pos embed is added AFTER the cls
  concat (:104-143)
- final LayerNorm is applied to the cls token only (:277-278)
- drop-path ramp is ``linspace(0, drop_path, sum(depths))`` (:205-227)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import FeedForward, drop_path as drop_path_fn, trunc_normal_init, tuple2

Dtype = Any

_LN_EPS = 1e-6  # reference: models/pvt.py:9


class SpatialReductionAttention(nn.Module):
    """MHSA with strided-conv k/v reduction (reference: models/pvt.py:12-69)."""

    n_head: int
    reduction: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height: int, width: int, prev: Optional[jax.Array] = None,
                 deterministic: bool = True):
        b, n, dim = x.shape
        dim_head = dim // self.n_head

        def heads(t):
            return t.reshape(b, -1, self.n_head, dim_head)

        q = heads(nn.Dense(dim, use_bias=False, dtype=self.dtype,
                           kernel_init=trunc_normal_init(0.02), name="linear_q")(x))

        if self.reduction > 1:
            fmap = x.reshape(b, height, width, dim)
            red = nn.Conv(dim, (self.reduction, self.reduction),
                          strides=(self.reduction, self.reduction), padding="VALID",
                          dtype=self.dtype, kernel_init=trunc_normal_init(0.02),
                          name="reduce_conv")(fmap)
            red = red.reshape(b, -1, dim)
            kv_in = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="reduce_norm")(red)
        else:
            kv_in = x

        kv = nn.Dense(dim * 2, use_bias=False, dtype=self.dtype,
                      kernel_init=trunc_normal_init(0.02), name="linear_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        k, v = heads(k), heads(v)

        from .. import ops as _ops

        if (prev is None and (deterministic or self.dropout == 0.0)
                and _ops.sra_attention_impl(
                    default="einsum", n_kv=k.shape[1]) == "fused"):
            # rectangular-score kernel path (A/B'd vs the einsum default,
            # PERF.md); the never-used ``prev`` score chain and attention
            # dropout stay on the einsum path
            out = _ops.fused_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), None, 1.0 / math.sqrt(dim_head))
            out = out.transpose(0, 2, 1, 3).reshape(b, -1, dim)
            out = nn.Dense(dim, dtype=self.dtype,
                           kernel_init=trunc_normal_init(0.02), name="linear")(out)
            return out, None

        score = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dim_head)
        if prev is not None:
            score = score + prev
        attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, -1, dim)
        out = nn.Dense(dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="linear")(out)
        return out, score


class PVTLayer(nn.Module):
    """(reference: models/pvt.py:72-103)"""

    n_head: int
    dim_ff: int
    reduction: int = 1
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, height: int, width: int, deterministic: bool = True):
        def dp(y):
            if deterministic or self.drop_path == 0.0:
                return y
            return drop_path_fn(y, self.drop_path, self.make_rng("dropout"), False)

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_attn")(x)
        h, _ = SpatialReductionAttention(
            self.n_head, self.reduction, self.drop_attn, dtype=self.dtype, name="attn"
        )(h, height, width, deterministic=deterministic)
        x = x + dp(h)

        h = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm_ff")(x)
        h = FeedForward(dim=self.dim_ff, activation=jax.nn.silu,
                        dropout=self.drop_ff, dtype=self.dtype, name="ff")(h, deterministic)
        return x + dp(h)


class PVTPatchEmbedding(nn.Module):
    """Conv patchify + LN + learned absolute pos embed (+cls in last stage)
    (reference: models/pvt.py:106-148)."""

    dim: int
    patch_size: int
    n_patch: int  # grid patches, excluding cls
    cls_token: bool = False
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        p = self.patch_size
        out = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID",
                      dtype=self.dtype, kernel_init=trunc_normal_init(0.02),
                      name="conv")(x)
        _, h, w, _ = out.shape
        out = out.reshape(b, h * w, self.dim)
        out = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(out)

        n_pos = self.n_patch + (1 if self.cls_token else 0)
        pos = self.param("pos", nn.initializers.normal(0.02), (n_pos, self.dim), jnp.float32)

        if self.cls_token:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (self.dim,), jnp.float32)
            cls = jnp.broadcast_to(cls.astype(out.dtype), (b, 1, self.dim))
            out = jnp.concatenate([cls, out], axis=1)

        out = out + pos[None].astype(out.dtype)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, (h, w)


class PyramidVisionTransformer(nn.Module):
    """(reference: models/pvt.py:151-280)"""

    image_size: Tuple[int, int]
    n_class: int
    depths: Tuple[int, int, int, int]
    patch_embed_dims: Tuple[int, int, int, int]
    n_heads: Tuple[int, int, int, int]
    dim_ffs: Tuple[int, int, int, int]
    reductions: Tuple[int, int, int, int]
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # per-layer jax.checkpoint (memory <-> recompute)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b = x.shape[0]
        img = tuple2(self.image_size)
        patch_sizes = (4, 2, 2, 2)
        total = sum(self.depths)
        ramp = [self.drop_path * i / max(total - 1, 1) for i in range(total)]

        i_layer = 0
        size = img
        out = x
        for stage in range(4):
            p = patch_sizes[stage]
            size = (size[0] // p, size[1] // p)
            is_last = stage == 3
            out, (h, w) = PVTPatchEmbedding(
                self.patch_embed_dims[stage], p, size[0] * size[1],
                cls_token=is_last, dropout=self.drop_ff, dtype=self.dtype,
                name=f"patch_embedding_{stage}",
            )(out, deterministic)
            layer_cls = (nn.remat(PVTLayer, static_argnums=(2, 3, 4))
                         if self.remat else PVTLayer)
            for i in range(self.depths[stage]):
                out = layer_cls(
                    self.n_heads[stage], self.dim_ffs[stage],
                    reduction=self.reductions[stage],
                    drop_ff=self.drop_ff, drop_attn=self.drop_attn,
                    drop_path=ramp[i_layer], dtype=self.dtype,
                    name=f"block{stage + 1}_{i}",
                )(out, h, w, deterministic)
                i_layer += 1
            if not is_last:
                out = out.reshape(b, h, w, self.patch_embed_dims[stage])

        cls = out[:, 0]
        cls = nn.LayerNorm(epsilon=_LN_EPS, dtype=self.dtype, name="norm")(cls)
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=trunc_normal_init(0.02), name="classifier")(
            cls.astype(jnp.float32)
        )


@register("model", "pvt")
class PVTConfig(TypedConfig):
    """PVT-Small defaults (the reference ships the class unregistered,
    models/pvt.py:151; registered here so .conf files can address it)."""

    image_size: Any = 224
    n_class: int = 1000
    depths: Tuple[int, int, int, int] = (3, 4, 6, 3)
    patch_embed_dims: Tuple[int, int, int, int] = (64, 128, 320, 512)
    n_heads: Tuple[int, int, int, int] = (1, 2, 5, 8)
    dim_ffs: Tuple[int, int, int, int] = (512, 1024, 1280, 2048)
    reductions: Tuple[int, int, int, int] = (8, 4, 2, 1)
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.1
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> PyramidVisionTransformer:
        return PyramidVisionTransformer(
            image_size=tuple2(self.image_size),
            n_class=self.n_class,
            depths=tuple(self.depths),
            patch_embed_dims=tuple(self.patch_embed_dims),
            n_heads=tuple(self.n_heads),
            dim_ffs=tuple(self.dim_ffs),
            reductions=tuple(self.reductions),
            drop_ff=self.drop_ff,
            drop_attn=self.drop_attn,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            dtype=dtype,
        )
