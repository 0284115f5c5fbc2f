"""Shared building blocks for all model families.

TPU-native re-design of the reference's ``models/layer.py``:

- images are NHWC end to end (XLA's preferred conv layout on TPU; the
  reference is NCHW, models/layer.py + models/*.py)
- compute dtype is a module attribute (bf16 by default on TPU), params stay
  float32
- stochastic ops (DropPath) are functions of an explicit PRNG via flax's rng
  collections instead of torch's global RNG state

Component parity (reference file:line):
- variance-scaled activations + ScaledActivation  (models/layer.py:28-47)
- WSConv (weight-standardized conv)               (models/layer.py:50-93)
- DropPath / StochasticDepth                      (models/layer.py:96-119,166-183)
- SqueezeExcite                                   (models/layer.py:122-135)
- GlobalContext                                   (models/layer.py:138-163; the
  reference version has a missing super().__init__() bug and is unused — this
  one is fixed and tested)
- PositionwiseFeedForward                         (models/layer.py:186-196)
"""

from __future__ import annotations

from collections import abc
from itertools import repeat
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "ensure_tuple",
    "tuple2",
    "activations",
    "ScaledActivation",
    "WSConv",
    "DropPath",
    "drop_path",
    "SqueezeExcite",
    "GlobalContext",
    "FeedForward",
    "LayerNorm",
    "trunc_normal_init",
    "DenseParams",
    "dense_apply",
    "LayerNormParams",
    "layer_norm_apply",
]

Dtype = Any


def ensure_tuple(x, n_item: int):
    """(reference: models/layer.py:9-22)"""
    if isinstance(x, abc.Iterable) and not isinstance(x, str):
        x = tuple(x)
        if len(x) != n_item:
            raise ValueError(
                f"length of {x} (length: {len(x)}) does not match with the "
                f"condition. expected length: {n_item}"
            )
        return x
    return tuple(repeat(x, n_item))


def tuple2(x):
    return ensure_tuple(x, 2)


# Variance-preserving activations for normalizer-free nets
# (reference: models/layer.py:28-33 — gamma constants from the NFNet paper).
activations: dict[str, Callable[[jax.Array], jax.Array]] = {
    "identity": lambda x: x,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False) * 1.7015043497085571,
    "relu": lambda x: jax.nn.relu(x) * 1.7139588594436646,
    "silu": lambda x: jax.nn.silu(x) * 1.7881293296813965,
}


class ScaledActivation(nn.Module):
    """(reference: models/layer.py:36-47)"""

    activation: str

    @nn.compact
    def __call__(self, x):
        return activations[self.activation](x)


def trunc_normal_init(std: float = 0.02):
    """timm-style trunc normal; reference uses plain normal(std=0.02)
    (models/vit.py:131-137) — we keep plain normal for weight-level parity."""
    return nn.initializers.normal(stddev=std)


LayerNorm = nn.LayerNorm  # eps set per call site; reference uses 1e-6 for ViT


class DenseParams(nn.Module):
    """Parameter container with ``nn.Dense``'s exact param tree
    ({kernel, bias} under this module's name) so checkpoints and torch
    parity maps stay layout-identical whether the call site computes
    through a plain matmul (:func:`dense_apply`) or hands the raw weights
    to a fused Pallas kernel (ops/fused_block.py)."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) if self.use_bias else None
        return kernel, bias


def dense_apply(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array],
                dtype) -> jax.Array:
    """``nn.Dense.__call__``'s math on raw params (promote to compute dtype,
    contract last axis, add bias)."""
    y = jax.lax.dot_general(
        x.astype(dtype), kernel.astype(dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
    )
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class LayerNormParams(nn.Module):
    """Parameter container with ``nn.LayerNorm``'s param tree
    ({scale, bias}) — see :class:`DenseParams` for why."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        return scale, bias


def layer_norm_apply(x: jax.Array, scale: jax.Array, bias: jax.Array,
                     eps: float, dtype) -> jax.Array:
    """``nn.LayerNorm.__call__``'s math on raw params: f32 statistics,
    fast variance, scale folded into the rsqrt multiplier (flax
    normalization.py semantics)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    return ((xf - mu) * mul + bias.astype(jnp.float32)).astype(dtype)


class WSConv(nn.Module):
    """Weight-standardized conv (reference: models/layer.py:50-93).

    The reference layer-norms the weight *every forward*; under jit this fuses
    into the conv's producer chain, and on TPU the cost is negligible next to
    the conv itself.  Weight layout is HWIO (flax native); standardization is
    over (H, W, I) per output channel, matching torch's per-output-unit
    layer-norm over (I, kh, kw).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    feature_group_count: int = 1
    use_bias: bool = True
    eps: float = 1e-5  # squared by the reference: layer.py:69 (eps ** 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1] // self.feature_group_count
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),  # kaiming normal, linear
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        gain = self.param("gain", nn.initializers.ones, (self.features,), jnp.float32)

        fan_in = kh * kw * in_features
        # layer-norm over all axes but the output-channel axis
        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
        weight = (kernel - mean) * jax.lax.rsqrt(var + self.eps**2)
        weight = weight * (gain * fan_in**-0.5)

        padding = self.padding
        if isinstance(padding, int):
            padding = [(padding, padding), (padding, padding)]

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            weight.astype(self.dtype),
            window_strides=self.strides,
            padding=padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def drop_path(x: jax.Array, p: float, rng: Optional[jax.Array],
              deterministic: bool, scale_by_keep: bool = True) -> jax.Array:
    """Per-sample stochastic depth (reference: models/layer.py:166-183).

    The reference's DropPath divides by keep-prob (layer.py:180-181); its
    StochasticDepth defaults to not scaling (layer.py:99).
    """
    if deterministic or p == 0.0:
        return x
    keep = 1.0 - p
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if scale_by_keep:
        x = x / keep
    return x * mask


class DropPath(nn.Module):
    """(reference: models/layer.py:166-183 / 96-119)"""

    p: float = 0.0
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.p == 0.0:
            return x
        return drop_path(x, self.p, self.make_rng("dropout"), False, self.scale_by_keep)


class SqueezeExcite(nn.Module):
    """(reference: models/layer.py:122-135). Input NHWC."""

    out_features: int
    ratio: float = 0.5
    hidden: Optional[int] = None
    activation: Callable = jax.nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        hidden = self.hidden
        if hidden is None:
            hidden = max(1, int(in_features * self.ratio))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        h = nn.Dense(hidden, dtype=self.dtype, name="reduce")(pooled)
        h = self.activation(h)
        h = nn.Dense(self.out_features, dtype=self.dtype, name="expand")(h)
        return jax.nn.sigmoid(h)


class GlobalContext(nn.Module):
    """Attention-pooled context (reference: models/layer.py:138-163, bug-fixed)."""

    out_features: int
    ratio: float = 0.25
    hidden: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.hidden or max(1, int(c * self.ratio))
        logit = nn.Dense(1, dtype=self.dtype, name="key")(x)  # B H W 1
        attn = jax.nn.softmax(logit.reshape(b, h * w, 1), axis=1)
        value = x.reshape(b, h * w, c)
        pooled = jnp.einsum("bnc,bno->boc", value, attn).reshape(b, 1, 1, c)
        y = nn.Dense(hidden, dtype=self.dtype, name="proj_in")(pooled)
        y = nn.LayerNorm(dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.out_features, dtype=self.dtype, name="proj_out")(y)
        return y


class FeedForward(nn.Module):
    """Positionwise FF: Linear → act → Dropout → Linear
    (reference: models/layer.py:186-196; default activation SiLU there, GELU
    where transformer call-sites pass it).
    """

    dim: Optional[int] = None
    out_dim: Optional[int] = None
    activation: Callable = jax.nn.silu
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    kernel_init: Callable = trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None, row_scale=None,
                 return_params: bool = False):
        """``ln=(scale, bias, eps)`` switches to the fused layer-half kernel
        computing ``x + row_scale ⊙ FF(LN(x))`` in one Pallas program
        (ops/fused_layer.py); requires dropout == 0 and a silu/gelu
        activation.  ``row_scale``: optional per-sample [B] DropPath scale.
        ``return_params=True`` just materializes and returns the raw
        (w1, b1, w2, b2) Dense params for the whole-layer kernel
        (ops/fused_layer1.py)."""
        in_dim = x.shape[-1]
        dim = self.dim or in_dim
        out_dim = self.out_dim or in_dim
        w1, b1 = DenseParams(dim, kernel_init=self.kernel_init, name="fc1")(in_dim)
        w2, b2 = DenseParams(out_dim, kernel_init=self.kernel_init, name="fc2")(dim)
        if return_params:
            return w1, b1, w2, b2

        if ln is not None:
            act = {jax.nn.silu: "silu", jax.nn.gelu: "gelu"}.get(self.activation)
            # dropout is a no-op when deterministic (eval), so a drop_ff > 0
            # conf may still take the fused path at eval time — mirror the
            # callers' use_layer condition
            assert act is not None and out_dim == in_dim \
                and (deterministic or self.dropout == 0.0), \
                "fused FF layer needs silu/gelu, active-dropout-free, square dims"
            from .. import ops as _ops

            g, bb, eps = ln
            shape = x.shape
            if x.ndim != 3:  # token-pointwise: any [B', N, C] split works
                x = x.reshape(-1, shape[-2], in_dim)
                if row_scale is not None:
                    # rows become (sample, leading-token-dim) pairs
                    row_scale = jnp.repeat(row_scale, x.shape[0] // shape[0])
            out = _ops.fused_ff_layer(
                x, g, bb, w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype), act,
                row_scale, eps)
            return out.reshape(shape)

        h = dense_apply(x, w1, b1, self.dtype)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return dense_apply(h, w2, b2, self.dtype)
