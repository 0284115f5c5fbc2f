"""NFNet — normalizer-free ResNet (reference: models/nfnet.py).

TPU-native notes:
- WSConv standardizes the weight at apply time (a tiny per-kernel reduction
  XLA fuses into the conv's producer chain — no extra HBM traffic)
- variance bookkeeping (alpha/beta, expected-std recursion) is Python-level
  construction logic → compile-time constants under jit

Reference structure reproduced:
- NFBlock (:8-73): pre-activation scaled by beta, 1×1 → grouped 3×3 →
  grouped 3×3 → 1×1 WSConvs, doubled SE ``2·se(out)·out`` (:66), SkipInit
  ``skip_gain`` scalar init 0 (:54,71), downsample skip = AvgPool + WSConv
  applied to the *activated* input (:59-61)
- expected_std recursion ``(std² + α²)^0.5`` reset after the first block of
  each stage (:104-135); stochastic-depth ramp ``sd·i/n_blocks`` (:113),
  torch StochasticDepth does NOT rescale by keep-prob (layer.py:96-119)
- 4-conv stem (:94-102); widened final conv; classifier init std 0.01 (:139)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import WSConv, activations, drop_path as drop_path_fn

Dtype = Any


class SqueezeExcite(nn.Module):
    """Conv-form SE matching reference layer.py:122-135 (1×1 convs with bias)."""

    out_features: int
    ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        hidden = max(1, int(in_features * self.ratio))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        h = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="reduce")(pooled)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="expand")(h)
        return jax.nn.sigmoid(h)


class NFBlock(nn.Module):
    """(reference: models/nfnet.py:8-73)"""

    in_channel: int
    out_channel: int
    activation: str = "silu"
    ratio: float = 0.5
    se_ratio: float = 0.5
    group_size: int = 1
    stride: int = 1
    alpha: float = 0.2
    beta: float = 1.0
    stochastic_depth: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = activations[self.activation]
        ch = int(self.out_channel * self.ratio)
        groups = ch // self.group_size
        ch = self.group_size * groups

        out = self.beta * act(x)
        skip = x
        if self.stride > 1 or self.in_channel != self.out_channel:
            s = out
            if self.stride > 1:
                s = nn.avg_pool(s, (self.stride, self.stride),
                                strides=(self.stride, self.stride))
            skip = WSConv(self.out_channel, (1, 1), dtype=self.dtype, name="skip_conv")(s)

        out = WSConv(ch, (1, 1), dtype=self.dtype, name="conv1")(out)
        out = WSConv(ch, (3, 3), strides=(self.stride, self.stride), padding=1,
                     feature_group_count=groups, dtype=self.dtype, name="conv2")(act(out))
        out = WSConv(ch, (3, 3), padding=1, feature_group_count=groups,
                     dtype=self.dtype, name="conv3")(act(out))
        out = WSConv(self.out_channel, (1, 1), dtype=self.dtype, name="conv4")(act(out))

        se = SqueezeExcite(self.out_channel, self.se_ratio, dtype=self.dtype, name="se")(out)
        out = (2.0 * se) * out  # doubled SE (reference :66)

        if not deterministic and self.stochastic_depth > 0:
            out = drop_path_fn(out, self.stochastic_depth, self.make_rng("dropout"),
                               False, scale_by_keep=False)

        skip_gain = self.param("skip_gain", nn.initializers.zeros, (), jnp.float32)
        out = skip_gain.astype(out.dtype) * out
        return self.alpha * out + skip


class NFNet(nn.Module):
    """(reference: models/nfnet.py:76-157)"""

    n_class: int
    channels: Tuple[int, ...]
    depths: Tuple[int, ...]
    groups: Tuple[int, ...]
    width: float = 1.0
    alpha: float = 0.2
    stochastic_depth: float = 0.1
    dropout: float = 0.0
    activation: str = "silu"
    remat: bool = False  # per-block jax.checkpoint (memory <-> recompute)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = activations[self.activation]
        ch = self.channels[0] // 2

        out = WSConv(16, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="stem1")(x)
        out = WSConv(32, (3, 3), padding=1, dtype=self.dtype, name="stem2")(act(out))
        out = WSConv(64, (3, 3), padding=1, dtype=self.dtype, name="stem3")(act(out))
        out = WSConv(ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="stem4")(act(out))

        expected_std = 1.0
        strides = (1, 2, 2, 2)
        n_blocks = sum(self.depths)
        index = 0
        for stage, (channel, depth, group, stride) in enumerate(
            zip(self.channels, self.depths, self.groups, strides)
        ):
            block_cls = (nn.remat(NFBlock, static_argnums=(2,))
                         if self.remat else NFBlock)
            for i in range(depth):
                beta = 1.0 / expected_std
                out_ch = int(channel * self.width)
                out = block_cls(
                    in_channel=ch, out_channel=out_ch,
                    activation=self.activation, ratio=0.5, se_ratio=0.5,
                    group_size=group, stride=stride if i == 0 else 1,
                    alpha=self.alpha, beta=beta,
                    stochastic_depth=self.stochastic_depth * index / n_blocks,
                    dtype=self.dtype, name=f"block_{index}",
                )(out, deterministic)
                ch = out_ch
                index += 1
                if i == 0:
                    expected_std = 1.0
                expected_std = (expected_std**2 + self.alpha**2) ** 0.5

        out = act(WSConv(ch * 2, (1, 1), dtype=self.dtype, name="final_conv")(out))
        out = jnp.mean(out, axis=(1, 2))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.01), name="linear")(
            out.astype(jnp.float32)
        )


@register("model", "nfnet")
class NFNetConfig(TypedConfig):
    """NFNet-F0 defaults (the reference ships the class only — SURVEY C20;
    F0 hyperparameters from the NFNet paper: channels 256/512/1536/1536,
    depths 1/2/6/3, group width 128)."""

    n_class: int = 1000
    channels: Tuple[int, ...] = (256, 512, 1536, 1536)
    depths: Tuple[int, ...] = (1, 2, 6, 3)
    groups: Tuple[int, ...] = (128, 128, 128, 128)
    width: float = 1.0
    alpha: float = 0.2
    stochastic_depth: float = 0.1
    dropout: float = 0.2
    activation: str = "silu"
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> NFNet:
        return NFNet(
            n_class=self.n_class,
            channels=tuple(self.channels),
            depths=tuple(self.depths),
            groups=tuple(self.groups),
            width=self.width,
            alpha=self.alpha,
            stochastic_depth=(self.stochastic_depth if drop_path is None else drop_path),
            dropout=self.dropout if dropout is None else dropout,
            activation=self.activation,
            remat=self.remat,
            dtype=dtype,
        )
