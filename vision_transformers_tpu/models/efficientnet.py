"""EfficientNet / EfficientNetV2 (reference: models/efficientnet.py).

TPU-native notes:
- NHWC convs throughout (XLA's native TPU conv layout); depthwise convs use
  ``feature_group_count`` and lower to VPU-friendly kernels, fused 3×3 convs
  hit the MXU
- BatchNorm under a data-sharded jit computes batch statistics over the
  *global* batch (XLA inserts the cross-replica reduction) — sync-BN for
  free, a strict improvement over the reference's per-GPU DDP stats
- running-stat momentum: the reference passes torch ``momentum=0.99``
  (models/efficientnet.py:67), which in torch semantics keeps only 1% of the
  running average — clearly intending TF/timm's ``decay=0.99``.  We use flax
  ``momentum=0.99`` (keep 99%), the TF-correct reading; the torch-literal
  reading would make EMA-of-BN meaningless (SURVEY §7 known-bugs list).
- torch ``padding=k//2`` is reproduced with explicit symmetric padding (flax
  "SAME" pads asymmetrically for even inputs at stride 2)

Reference structure reproduced: compound scaling round_filters/round_repeats
(:12-29), fused vs regular MBConv (:52-82), SE on the expanded channel with
hidden width from ``in_channel`` (:87-95), projection + skip with DropPath
(:100-131), stem/head/avg-pool/dropout/logit (:134-210), B0 table (:218-275)
and the V2-S table with fused early stages and se=None (:315-383).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import drop_path as drop_path_fn

Dtype = Any

BN_MOMENTUM = 0.99  # TF-style decay (see module docstring)


def round_filters(filters: int, width: Optional[float] = None,
                  divisor: Optional[int] = None, min_depth: Optional[int] = None) -> int:
    """Compound width scaling (reference: models/efficientnet.py:12-22)."""
    if width is None:
        return filters
    filters *= width
    min_depth = min_depth or divisor
    new_filters = max(min_depth, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth: Optional[float] = None) -> int:
    """Compound depth scaling (reference: models/efficientnet.py:25-29)."""
    if depth is None:
        return repeats
    return int(math.ceil(depth * repeats))


def _conv(features, kernel, stride=1, groups=1, name=None, dtype=jnp.float32):
    pad = kernel // 2
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], feature_group_count=groups,
        use_bias=False, dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


class GroupedBatchNorm(nn.Module):
    """BatchNorm with training statistics over ``groups`` equal batch slices
    instead of the global batch — the reference's NON-SyncBN multi-GPU
    semantics (its DDP wrap, /root/reference/train.py:102-107, never syncs
    BN: each of the 8 GPUs normalizes with its OWN batch-of-512 statistics,
    models/efficientnet.py:67).  Under a data-sharded jit the plain
    ``nn.BatchNorm`` computes GLOBAL-batch statistics; set
    ``arch.bn_groups = <data-parallel size>`` to reproduce the reference
    trajectory exactly.

    The [B, ...] → [G, B/G, ...] reshape splits the data-sharded batch dim,
    so when G equals the data-parallel size the per-group reductions stay
    shard-local — XLA inserts NO cross-replica collective at all (grouped is
    strictly cheaper than global).  Running averages update with the
    across-group mean of the group statistics (same expectation as any one
    torch replica's update; torch replicas drift independently and rank 0's
    copy is the one saved).  Param/variable tree matches ``nn.BatchNorm``
    (params scale/bias, batch_stats mean/var), so checkpoints and the torch
    converter are unaffected.  Statistics and normalization run in f32
    (torch runs BN in f32 under AMP too); the biased batch variance feeds
    both the normalization and the running update, matching flax (torch
    uses the unbiased form for the running update — at the recipe's 512 per
    replica the relative difference is 1/511 ≈ 0.2%, and running stats
    never feed the training-mode forward)."""

    groups: int
    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + self.epsilon) * scale
            y = (x.astype(jnp.float32) - mean) * mul + bias
            return y.astype(self.dtype)

        B, G = x.shape[0], self.groups
        if B % G != 0:
            raise ValueError(f"batch {B} not divisible by bn_groups {G}")
        xg = x.reshape(G, B // G, *x.shape[1:]).astype(jnp.float32)
        axes = tuple(range(1, xg.ndim - 1))
        mean = jnp.mean(xg, axes)                      # [G, C]
        var = jnp.mean(xg * xg, axes) - mean * mean    # [G, C] biased
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean.mean(0)
            ra_var.value = m * ra_var.value + (1 - m) * var.mean(0)
        bshape = (G,) + (1,) * (xg.ndim - 2) + (C,)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xg - mean.reshape(bshape)) * mul.reshape(bshape) + bias
        return y.reshape(x.shape).astype(self.dtype)


def _bn(use_running: bool, groups: int, dtype, name: str):
    """Plain nn.BatchNorm (global-batch / sync-BN statistics, groups=0) or
    the reference-faithful per-replica GroupedBatchNorm (groups>1)."""
    if groups and groups > 1:
        return GroupedBatchNorm(
            groups=groups, use_running_average=use_running,
            momentum=BN_MOMENTUM, epsilon=1e-3, dtype=dtype, name=name)
    return nn.BatchNorm(use_running_average=use_running,
                        momentum=BN_MOMENTUM, epsilon=1e-3, dtype=dtype,
                        name=name)


class MBConvBlock(nn.Module):
    """Fused or regular MBConv (reference: models/efficientnet.py:32-131)."""

    in_channel: int
    out_channel: int
    kernel_size: int
    stride: int
    expand_ratio: int = 1
    se: Optional[float] = 0.25
    skip: bool = True
    fused: bool = False
    drop_path: float = 0.0
    bn_groups: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        channel = self.in_channel * self.expand_ratio
        use_running = deterministic

        def bn(name):
            return _bn(use_running, self.bn_groups, self.dtype, name)

        out = x
        if self.fused:
            out = _conv(channel, self.kernel_size, self.stride,
                        name="conv_fused", dtype=self.dtype)(out)
        else:
            if self.expand_ratio != 1:
                out = _conv(channel, 1, name="conv_expand", dtype=self.dtype)(out)
                out = bn("bn_expand")(out)
                out = jax.nn.silu(out)
            out = _conv(channel, self.kernel_size, self.stride, groups=channel,
                        name="conv_depthwise", dtype=self.dtype)(out)
        out = bn("bn_main")(out)
        out = jax.nn.silu(out)

        if self.se is not None:
            se_channel = max(1, int(self.in_channel * self.se))
            pooled = jnp.mean(out, axis=(1, 2), keepdims=True)
            g = nn.Conv(se_channel, (1, 1), dtype=self.dtype, name="se_reduce")(pooled)
            g = jax.nn.silu(g)
            g = nn.Conv(channel, (1, 1), dtype=self.dtype, name="se_expand")(g)
            out = jax.nn.sigmoid(g) * out

        out = _conv(self.out_channel, 1, name="conv_project", dtype=self.dtype)(out)
        out = bn("bn_project")(out)

        if self.skip and self.stride == 1 and self.in_channel == self.out_channel:
            if not deterministic and self.drop_path > 0:
                out = drop_path_fn(out, self.drop_path, self.make_rng("dropout"),
                                   False, scale_by_keep=True)
            out = out + x
        return out


class EfficientNet(nn.Module):
    """(reference: models/efficientnet.py:134-210)"""

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
    remat: bool = False  # per-block jax.checkpoint (memory <-> recompute)
    bn_groups: int = 0   # >1: per-replica BN stats (reference DDP semantics)
    dtype: Dtype = jnp.float32

    def expand_blocks(self) -> list[dict]:
        """Expand per-stage configs into a flat per-block list with compound
        scaling applied (reference: :153-176)."""
        blocks = []
        for config in self.block_configs:
            config = dict(config)
            config["in_channel"] = round_filters(
                config["in_channel"], self.width, self.divisor, self.min_depth)
            config["out_channel"] = round_filters(
                config["out_channel"], self.width, self.divisor, self.min_depth)
            n_repeat = round_repeats(config.pop("n_repeat"), self.depth)
            blocks.append(dict(config))
            if n_repeat > 1:
                config["in_channel"] = config["out_channel"]
                config["stride"] = 1
            for _ in range(n_repeat - 1):
                blocks.append(dict(config))
        return blocks

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        use_running = deterministic
        stem_ch = round_filters(self.stem_channel, self.width, self.divisor, self.min_depth)

        out = _conv(stem_ch, 3, 2, name="stem_conv", dtype=self.dtype)(x)
        out = _bn(use_running, self.bn_groups, self.dtype, "stem_bn")(out)
        out = jax.nn.silu(out)

        blocks = self.expand_blocks()
        n_blocks = len(blocks)
        # remat replays each block's forward in the backward; BN stat
        # updates are captured once by flax's lifted checkpoint, so stats,
        # logits, and grads are unchanged (tests/test_remat.py)
        block_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                     if self.remat else MBConvBlock)
        for i, cfg in enumerate(blocks):
            # drop-path ramp i/n_blocks (reference set_dropout :192-199)
            out = block_cls(
                **cfg, drop_path=self.drop_path * i / n_blocks,
                bn_groups=self.bn_groups, dtype=self.dtype, name=f"block_{i}",
            )(out, deterministic)

        head_ch = round_filters(self.head_channel, self.width, self.divisor, self.min_depth)
        out = _conv(head_ch, 1, name="head_conv", dtype=self.dtype)(out)
        out = _bn(use_running, self.bn_groups, self.dtype, "head_bn")(out)
        out = jax.nn.silu(out)

        out = jnp.mean(out, axis=(1, 2))
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02), name="logit")(
            out.astype(jnp.float32)
        )


# B0 stage table (reference: models/efficientnet.py:218-275)
EFFICIENTNET_B0_BLOCKS = (
    {"n_repeat": 1, "kernel_size": 3, "stride": 1, "expand_ratio": 1,
     "in_channel": 32, "out_channel": 16},
    {"n_repeat": 2, "kernel_size": 3, "stride": 2, "expand_ratio": 6,
     "in_channel": 16, "out_channel": 24},
    {"n_repeat": 2, "kernel_size": 5, "stride": 2, "expand_ratio": 6,
     "in_channel": 24, "out_channel": 40},
    {"n_repeat": 3, "kernel_size": 3, "stride": 2, "expand_ratio": 6,
     "in_channel": 40, "out_channel": 80},
    {"n_repeat": 3, "kernel_size": 5, "stride": 1, "expand_ratio": 6,
     "in_channel": 80, "out_channel": 112},
    {"n_repeat": 4, "kernel_size": 5, "stride": 2, "expand_ratio": 6,
     "in_channel": 112, "out_channel": 192},
    {"n_repeat": 1, "kernel_size": 3, "stride": 1, "expand_ratio": 6,
     "in_channel": 192, "out_channel": 320},
)

# V2-S stage table: fused early stages, no SE there (reference: :318-383)
EFFICIENTNET_V2_S_BLOCKS = (
    {"n_repeat": 2, "kernel_size": 3, "stride": 1, "expand_ratio": 1,
     "in_channel": 24, "out_channel": 24, "fused": True, "se": None},
    {"n_repeat": 4, "kernel_size": 3, "stride": 2, "expand_ratio": 4,
     "in_channel": 24, "out_channel": 48, "fused": True, "se": None},
    {"n_repeat": 4, "kernel_size": 3, "stride": 2, "expand_ratio": 4,
     "in_channel": 48, "out_channel": 64, "fused": True, "se": None},
    {"n_repeat": 6, "kernel_size": 3, "stride": 2, "expand_ratio": 4,
     "in_channel": 64, "out_channel": 128},
    {"n_repeat": 9, "kernel_size": 3, "stride": 1, "expand_ratio": 6,
     "in_channel": 128, "out_channel": 160},
    {"n_repeat": 15, "kernel_size": 3, "stride": 2, "expand_ratio": 6,
     "in_channel": 160, "out_channel": 272},
)

# B1-B7 compound coefficients (reference: :287-312) extended with the
# published per-preset defaults: (width, depth, dropout, train resolution)
# — the reference's b1..b7 factories set only width/depth; dropout and
# resolution follow the EfficientNet paper (Tan & Le 2019, table 1).
EFFICIENTNET_PRESETS = {
    "b0": (1.0, 1.0, 0.2, 224), "b1": (1.0, 1.1, 0.2, 240),
    "b2": (1.1, 1.2, 0.3, 260), "b3": (1.2, 1.4, 0.3, 300),
    "b4": (1.4, 1.8, 0.4, 380), "b5": (1.6, 2.2, 0.4, 456),
    "b6": (1.8, 2.6, 0.5, 528), "b7": (2.0, 3.1, 0.5, 600),
}


@register("model", "efficientnet")
class EfficientNetConfig(TypedConfig):
    """(reference factory: models/efficientnet.py:213-312)

    ``preset: b3`` selects the published compound-scaling coefficients
    (reference efficientnet_b1..b7, models/efficientnet.py:287-312) plus the
    paper's dropout default; explicit ``width``/``depth``/``dropout`` keys
    override the preset."""

    width: Optional[float] = None
    depth: Optional[float] = None
    n_class: int = 1000
    dropout: Optional[float] = None
    drop_path: float = 0.0
    preset: Optional[str] = None
    remat: bool = False  # optional extension over the reference conf schema
    # >1: per-replica BN statistics over that many batch slices (the
    # reference's non-SyncBN DDP semantics; set to the data-parallel size).
    # 0 (default): global-batch stats — sync-BN for free under sharded jit.
    bn_groups: int = 0

    def _resolve(self):
        if self.preset is not None:
            if self.preset not in EFFICIENTNET_PRESETS:
                raise ValueError(
                    f"unknown efficientnet preset {self.preset!r}; "
                    f"choose from {sorted(EFFICIENTNET_PRESETS)}")
            w, d, drop, size = EFFICIENTNET_PRESETS[self.preset]
        else:
            w, d, drop, size = 1.0, 1.0, 0.0, 224
        return (
            w if self.width is None else self.width,
            d if self.depth is None else self.depth,
            drop if self.dropout is None else self.dropout,
            size,
        )

    @property
    def default_size(self) -> int:
        """Published train resolution for the preset (224 otherwise)."""
        return self._resolve()[3]

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> EfficientNet:
        width, depth, drop, _ = self._resolve()
        return EfficientNet(
            n_class=self.n_class,
            block_configs=EFFICIENTNET_B0_BLOCKS,
            width=width, divisor=8, depth=depth,
            dropout=drop if dropout is None else dropout,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            bn_groups=self.bn_groups,
            dtype=dtype,
        )


@register("model", "efficientnetv2")
class EfficientNetV2Config(TypedConfig):
    """(reference factory: models/efficientnet.py:315-390)"""

    width: float = 1.0
    depth: float = 1.0
    n_class: int = 1000
    dropout: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema
    bn_groups: int = 0   # see EfficientNetConfig.bn_groups

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> EfficientNet:
        return EfficientNet(
            n_class=self.n_class,
            block_configs=EFFICIENTNET_V2_S_BLOCKS,
            width=self.width, divisor=8, depth=self.depth,
            stem_channel=24, head_channel=1792,
            dropout=self.dropout if dropout is None else dropout,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            bn_groups=self.bn_groups,
            dtype=dtype,
        )
