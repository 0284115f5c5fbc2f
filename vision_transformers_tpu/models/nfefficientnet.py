"""NF-EfficientNet / NF-EfficientNetV2 (reference: models/nfefficientnet.py).

EfficientNetV2 rebuilt normalizer-free: every conv is a weight-standardized
WSConv with variance-scaled activations, SkipInit gain on residuals, and
alpha/beta variance bookkeeping instead of BatchNorm.

Reference structure reproduced:
- NF-MBConv (:32-146): ``out = beta * input`` pre-scale (no pre-activation,
  unlike NFNet), fused vs expand+depthwise WSConv paths, SE fully disabled
  (commented out in the reference, :84-95 — reproduced as absent),
  projection WSConv, skip path ``alpha · skip_gain · drop_path(project) +
  input`` (:117-128)
- expected-std recursion across repeats with the reference's ``second`` flag
  behavior: a non-skip (downsampling) block resets the std to 1 and skips
  one accumulation step (:173-211)
- stem WSConv+act, head WSConv+act, logit init std 0.01 (:168-227)
- v1/B0 and V2-S block tables (:251-307, :352-412)

Known reference bug NOT replicated: the ``nfefficientnet`` (v1) factory
returns the undefined name ``EfficientNet`` (reference :311) — here it
correctly builds an NFEfficientNet.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .efficientnet import (
    EFFICIENTNET_B0_BLOCKS,
    EFFICIENTNET_V2_S_BLOCKS,
    round_filters,
    round_repeats,
)
from .layers import WSConv, activations, drop_path as drop_path_fn

Dtype = Any


class NFMBConvBlock(nn.Module):
    """(reference: models/nfefficientnet.py:32-146)"""

    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int
    expand_ratio: int = 1
    se: Optional[float] = 0.25  # accepted for table parity; SE is disabled
    skip: bool = True
    fused: bool = False
    drop_path: float = 0.0
    alpha: float = 0.2
    beta: float = 1.0
    dtype: Dtype = jnp.float32

    @property
    def has_skip(self) -> bool:
        return self.skip and self.stride == 1 and self.in_channel == self.out_channel

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = activations["silu"]
        channel = self.in_channel * self.expand_ratio
        k = self.kernel_size
        pad = k // 2

        out = self.beta * x
        if self.fused:
            out = WSConv(channel, (k, k), strides=(self.stride, self.stride),
                         padding=pad, dtype=self.dtype, name="conv_fused")(out)
        else:
            if self.expand_ratio != 1:
                out = WSConv(channel, (1, 1), dtype=self.dtype, name="conv_expand")(out)
                out = act(out)
            out = WSConv(channel, (k, k), strides=(self.stride, self.stride),
                         padding=pad, feature_group_count=channel,
                         dtype=self.dtype, name="conv_depthwise")(out)
        out = act(out)

        project = WSConv(self.out_channel, (1, 1), dtype=self.dtype, name="conv_project")(out)

        if self.has_skip:
            out = project
            if not deterministic and self.drop_path > 0:
                # torch StochasticDepth: no keep-prob rescale (layer.py:96-119)
                out = drop_path_fn(out, self.drop_path, self.make_rng("dropout"),
                                   False, scale_by_keep=False)
            skip_gain = self.param("skip_gain", nn.initializers.zeros, (), jnp.float32)
            out = self.alpha * (skip_gain.astype(out.dtype) * out) + x
        else:
            out = project
        return out


def nf_expand_blocks(block_configs, width, divisor, min_depth, depth, alpha) -> list[dict]:
    """Flat per-block configs with the reference's expected-std bookkeeping
    (reference: models/nfefficientnet.py:173-211, incl. the ``second`` flag)."""
    blocks = []
    expected_std = 1.0
    second = False
    for config in block_configs:
        beta = 1.0 / expected_std
        config = dict(config)
        config["in_channel"] = round_filters(config["in_channel"], width, divisor, min_depth)
        config["out_channel"] = round_filters(config["out_channel"], width, divisor, min_depth)
        n_repeat = round_repeats(config.pop("n_repeat"), depth)
        config["alpha"] = alpha
        config["beta"] = beta
        blocks.append(dict(config))

        has_skip = (
            config.get("skip", True)
            and config["stride"] == 1
            and config["in_channel"] == config["out_channel"]
        )
        if not has_skip:
            expected_std = 1.0
            second = True

        if n_repeat > 1:
            config["in_channel"] = config["out_channel"]
            config["stride"] = 1

        for _ in range(n_repeat - 1):
            if not second:
                expected_std = (expected_std**2 + alpha**2) ** 0.5
            second = False
            config["beta"] = 1.0 / expected_std
            blocks.append(dict(config))

        expected_std = (expected_std**2 + alpha**2) ** 0.5
    return blocks


class NFEfficientNet(nn.Module):
    """(reference: models/nfefficientnet.py:148-244)"""

    n_class: int
    block_configs: Tuple[dict, ...]
    width: Optional[float] = None
    divisor: Optional[int] = None
    min_depth: Optional[int] = None
    depth: Optional[float] = None
    stem_channel: int = 32
    head_channel: int = 1280
    dropout: float = 0.0
    drop_path: float = 0.0
    alpha: float = 0.2
    remat: bool = False  # per-block jax.checkpoint (memory <-> recompute)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = activations["silu"]
        stem_ch = round_filters(self.stem_channel, self.width, self.divisor, self.min_depth)
        out = WSConv(stem_ch, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="stem_conv")(x)
        out = act(out)

        blocks = nf_expand_blocks(self.block_configs, self.width, self.divisor,
                                  self.min_depth, self.depth, self.alpha)
        n_blocks = len(blocks)
        block_cls = (nn.remat(NFMBConvBlock, static_argnums=(2,))
                     if self.remat else NFMBConvBlock)
        for i, cfg in enumerate(blocks):
            out = block_cls(
                **cfg, drop_path=self.drop_path * i / n_blocks,
                dtype=self.dtype, name=f"block_{i}",
            )(out, deterministic)

        head_ch = round_filters(self.head_channel, self.width, self.divisor, self.min_depth)
        out = WSConv(head_ch, (1, 1), dtype=self.dtype, name="head_conv")(out)
        out = act(out)

        out = jnp.mean(out, axis=(1, 2))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.01), name="logit")(
            out.astype(jnp.float32)
        )


@register("model", "nfefficientnet")
class NFEfficientNetConfig(TypedConfig):
    """(reference factory: models/nfefficientnet.py:247-318, NameError fixed)"""

    width: float = 1.0
    depth: float = 1.0
    n_class: int = 1000
    dropout: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> NFEfficientNet:
        return NFEfficientNet(
            n_class=self.n_class,
            block_configs=EFFICIENTNET_B0_BLOCKS,
            width=self.width, divisor=8, depth=self.depth,
            dropout=self.dropout if dropout is None else dropout,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            dtype=dtype,
        )


@register("model", "nfefficientnetv2")
class NFEfficientNetV2Config(TypedConfig):
    """(reference factory: models/nfefficientnet.py:349-420)"""

    width: float = 1.0
    depth: float = 1.0
    n_class: int = 1000
    dropout: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> NFEfficientNet:
        return NFEfficientNet(
            n_class=self.n_class,
            block_configs=EFFICIENTNET_V2_S_BLOCKS,
            width=self.width, divisor=8, depth=self.depth,
            stem_channel=24, head_channel=1792,
            dropout=self.dropout if dropout is None else dropout,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            dtype=dtype,
        )
