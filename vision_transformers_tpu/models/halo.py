"""Halo Transformer (reference: models/halo_transformer.py).

Blocked local attention with halo: queries come from non-overlapping windows,
keys/values from overlapping ``window + 2·halo`` neighborhoods (reference
unfolds with stride=window, padding=halo, :74-92 — borders are zero-padded
and *not* masked; we reproduce that).

TPU-native notes:
- torch's ``F.unfold`` becomes :func:`halo_neighborhoods` — a two-level
  tiled-slice gather (pure data movement).  ``lax.conv_general_dilated_patches``
  is NOT used: XLA lowers it to a real convolution against a one-hot kernel,
  measured 15× slower than the whole rest of the Halo train step on v5e
- the relative-position table ((w+2h)² keys × w² queries, zero-init,
  reference :36-55) is gathered with a static numpy index → constant-folded
- attention is a batched einsum [B, heads, S, w², (w+2h)²] — MXU-shaped

Reference quirks reproduced:
- qkv projection has NO bias (:29)
- the residual is written in-place in the reference (:147-148) — numerically
  identical to the functional form used here
- final head widens 2× with LN→Linear→LN→SiLU before the classifier (:214-223)
- no drop-path ramp: every layer uses the same drop_path (:254-269)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import (DenseParams, FeedForward, LayerNormParams,
                     dense_apply, drop_path as drop_path_fn,
                     layer_norm_apply, trunc_normal_init, tuple2)
from .swin import PatchEmbedding

Dtype = Any

_LN_EPS = 1e-6  # reference: models/halo_transformer.py:9


def halo_neighborhoods(kv: jax.Array, window: int, halo: int) -> jax.Array:
    """Overlapping (window+2·halo)² neighborhoods as pure data movement.

    [b, H, W, C] → [b, n_win, k², C] (row-major (ky, kx) token order, zero
    borders) — the same values as torch unfold / conv_general_dilated_patches
    but WITHOUT the conv lowering: XLA lowers dilated_patches to a real
    convolution against a one-hot kernel on TPU, which measured 15× slower
    than the rest of the Halo step.  Two-level tiling instead: pad by halo,
    cut the map into t×t tiles (t | window, t | k), and assemble every
    neighborhood from a (k/t)² grid of strided tile slices — (k/t)² cheap
    strided copies instead of an MXU matmul per tap.
    """
    b, H, W, C = kv.shape
    k = window + 2 * halo
    t = next((d for d in range(window, 0, -1)
              if window % d == 0 and k % d == 0 and (2 * halo) % d == 0), 1)
    hs, ws = H // window, W // window
    pad = jnp.pad(kv, ((0, 0), (halo, halo), (halo, halo), (0, 0)))
    hp, wp = H + 2 * halo, W + 2 * halo
    tiles = pad.reshape(b, hp // t, t, wp // t, t, C)
    kt, st = k // t, window // t
    rows = [jax.lax.slice_in_dim(tiles, ky, ky + st * (hs - 1) + 1, st, axis=1)
            for ky in range(kt)]
    g = jnp.stack(rows, axis=2)          # [b, hs, ky, ty, txg, tx, C]
    cols = [jax.lax.slice_in_dim(g, kx, kx + st * (ws - 1) + 1, st, axis=4)
            for kx in range(kt)]
    g = jnp.stack(cols, axis=5)          # [b, hs, ky, ty, ws, kx, tx, C]
    g = g.transpose(0, 1, 4, 2, 3, 5, 6, 7)  # [b, hs, ws, ky, ty, kx, tx, C]
    return g.reshape(b, hs * ws, k * k, C)


def halo_position_index(window: int, halo: int) -> tuple[np.ndarray, int]:
    """[w², (w+2h)²] index into the rel-pos table (reference: :41-55)."""
    k = window + 2 * halo
    p = np.arange(k)
    yy, xx = np.meshgrid(p, p, indexing="ij")
    q_y = yy[halo:-halo, halo:-halo].reshape(-1, 1)
    q_x = xx[halo:-halo, halo:-halo].reshape(-1, 1)
    dy = yy.reshape(1, -1) - q_y + (window + halo - 1)
    dx = xx.reshape(1, -1) - q_x + (window + halo - 1)
    pos = dy * k + dx
    max_pos = (window + halo - 1) * 2 * k + (window + halo - 1) * 2
    return pos, max_pos


class HaloAttention(nn.Module):
    """(reference: models/halo_transformer.py:22-116)"""

    n_head: int
    dim_head: int
    window_size: int
    halo_size: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None,
                 row_scale=None, ff=None):
        """``ln=(scale, bias, eps)`` + ``ff=(g2, b2, w1, b1, w2, b2, act,
        rs_ff)`` switches to the whole-layer kernel (ops/fused_halo_layer.py):
        x is then the PRE-LN layer input and the return value is the full
        layer output (both residual branches applied)."""
        b, h, w, dim = x.shape
        window, halo = self.window_size, self.halo_size
        hs, ws = h // window, w // window
        n_win = hs * ws
        inner = self.n_head * self.dim_head
        k_size = window + 2 * halo

        # raw Dense params (same {weight,linear}/{kernel,bias} tree as
        # nn.Dense) so the fused layer kernel can take the weights
        # VMEM-resident (reference projections: halo_transformer.py:66-70)
        wqkv, _ = DenseParams(inner * 3, use_bias=False,
                              kernel_init=trunc_normal_init(0.02),
                              name="weight")(dim)
        wout, bout = DenseParams(dim, kernel_init=trunc_normal_init(0.02),
                                 name="linear")(inner)

        pos, max_pos = halo_position_index(window, halo)
        table = self.param("rel_pos", nn.initializers.zeros,
                           (max_pos + 1, self.n_head), jnp.float32)
        bias = table[pos]  # [w², k², head] — constant-folded gather

        from .. import ops as _ops

        scale = 1.0 / math.sqrt(self.dim_head)
        if ln is not None and ff is not None:
            # whole-layer map-resident kernel: LN₁ + qkv proj + halo
            # attention + out proj + residual + LN₂ + FF + residual in one
            # custom call (ops/fused_halo_layer.py)
            g1, b1, eps = ln
            g2, b2, w1f, b1f, w2f, b2f, act, rs_ff = ff
            dt = self.dtype
            return _ops.fused_halo_layer(
                x, g1, b1, wqkv.astype(dt), wout.astype(dt),
                bout.astype(dt), g2, b2, w1f.astype(dt), b1f.astype(dt),
                w2f.astype(dt), b2f.astype(dt),
                bias.transpose(2, 0, 1), self.n_head, rs_attn=row_scale,
                rs_ff=rs_ff, activation=act, window=window, halo=halo,
                scale=scale, eps=eps)

        qkv = dense_apply(x, wqkv, None, self.dtype)
        q, kv = qkv[..., :inner], qkv[..., inner:]

        impl = _ops.halo_impl(window, halo)
        if impl == "layer":
            impl = "direct"  # layer kernel is dispatched at the layer level
        if impl != "einsum" and not (deterministic or self.dropout == 0.0):
            impl = "einsum"  # attention dropout needs materialized probs
        if impl == "direct":
            # Map-resident TPU kernel (ops/fused_halo.py): NO neighborhood
            # gather — the kernel reads the padded feature map once per
            # batch item and windows it with aligned in-kernel slices
            out = _ops.halo_attention_direct(
                q, kv, bias.transpose(2, 0, 1), window, halo, self.n_head,
                scale)
            return dense_apply(out, wout, bout, self.dtype)
        if impl == "gather":
            # gather + rectangular kernel: queries window-partitioned with
            # heads left on lanes; kv neighborhoods consumed EXACTLY as the
            # tiled-slice gather emits them — no per-head transposes, no
            # [.., w², k²] score materialization in HBM
            m = window * window
            qw = q.reshape(b, hs, window, ws, window, inner)
            qw = qw.transpose(0, 1, 3, 2, 4, 5).reshape(b * n_win, m, inner)
            nb = halo_neighborhoods(kv, window, halo)
            nb = nb.reshape(b * n_win, k_size * k_size, 2 * inner)
            out = _ops.halo_attention(qw, nb, bias.transpose(2, 0, 1),
                                      self.n_head, scale)
            out = out.reshape(b, hs, ws, window, window, inner)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, inner)
            return dense_apply(out, wout, bout, self.dtype)

        # queries: non-overlapping windows → [b, head, S, w², d]
        q = q.reshape(b, hs, window, ws, window, self.n_head, self.dim_head)
        q = q.transpose(0, 5, 1, 3, 2, 4, 6).reshape(
            b, self.n_head, n_win, window * window, self.dim_head
        )

        # keys/values: overlapping halo neighborhoods (zero borders, same
        # values as torch unfold) via the tiled-slice gather
        nb = halo_neighborhoods(kv, window, halo)  # [b, S, k², 2·inner]
        nb = nb.reshape(b, n_win, k_size * k_size, 2, self.n_head,
                        self.dim_head)
        key = nb[:, :, :, 0].transpose(0, 3, 1, 2, 4)    # [b, head, S, k², d]
        value = nb[:, :, :, 1].transpose(0, 3, 1, 2, 4)

        score = jnp.einsum("bhsqd,bhskd->bhsqk", q, key) * scale
        score = score + bias.transpose(2, 0, 1).astype(score.dtype)[None, :, None]

        attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("bhsqk,bhskd->bhsqd", attn, value)
        out = out.transpose(0, 2, 3, 1, 4).reshape(b, n_win, window * window, inner)
        out = dense_apply(out, wout, bout, self.dtype)
        out = out.reshape(b, hs, ws, window, window, dim)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, dim)
        return out


class HaloLayer(nn.Module):
    """(reference: models/halo_transformer.py:119-150)"""

    n_head: int
    dim_head: int
    dim_ff: int
    window_size: int
    halo_size: int
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    def _row_scale(self, b: int, deterministic: bool):
        """Per-sample DropPath scale (mask/keep — the reference Halo layer
        uses the rescaling DropPath, layer.py:166-183) for the fused layer
        kernel."""
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

        b, _, _, dim = x.shape
        g1, b1 = LayerNormParams(name="norm_attn")(dim)
        g2, b2 = LayerNormParams(name="norm_ff")(dim)
        attn = HaloAttention(self.n_head, self.dim_head, self.window_size,
                             self.halo_size, self.drop_attn,
                             dtype=self.dtype, name="attn")
        ff = FeedForward(dim=self.dim_ff, activation=jax.nn.silu,
                         dropout=self.drop_ff, dtype=self.dtype, name="ff")

        impl = _ops.halo_impl(self.window_size, self.halo_size)
        use_layer = impl == "layer" and (
            deterministic or (self.drop_attn == 0.0 and self.drop_ff == 0.0))
        if use_layer:
            # whole layer (both residual branches, window machinery, LNs,
            # projections) as ONE custom call (ops/fused_halo_layer.py)
            w1f, b1f, w2f, b2f = ff(x, return_params=True)
            return attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                        row_scale=self._row_scale(b, deterministic),
                        ff=(g2, b2, w1f, b1f, w2f, b2f, "silu",
                            self._row_scale(b, deterministic)))

        h = layer_norm_apply(x, g1, b1, _LN_EPS, self.dtype)
        h = attn(h, deterministic)
        x = x + dp(h)

        h = layer_norm_apply(x, g2, b2, _LN_EPS, self.dtype)
        h = ff(h, deterministic)
        return x + dp(h)


class HaloTransformer(nn.Module):
    """(reference: models/halo_transformer.py:176-280)"""

    image_size: Tuple[int, int]
    n_class: int
    depths: Tuple[int, int, int, int]
    dims: Tuple[int, int, int, int]
    dim_head: int
    n_heads: Tuple[int, int, int, int]
    dim_ffs: Tuple[int, int, int, int]
    window_size: int
    halo_size: int
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # per-layer jax.checkpoint (memory <-> recompute)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        reductions = (4, 2, 2, 2)
        out = x
        for stage in range(4):
            out = PatchEmbedding(self.dims[stage], reductions[stage], dtype=self.dtype,
                                 name=f"embed{stage + 1}")(out)
            layer_cls = (nn.remat(HaloLayer, static_argnums=(2,))
                         if self.remat else HaloLayer)
            for i in range(self.depths[stage]):
                out = layer_cls(
                    self.n_heads[stage], self.dim_head, self.dim_ffs[stage],
                    self.window_size, self.halo_size,
                    drop_ff=self.drop_ff, drop_attn=self.drop_attn,
                    drop_path=self.drop_path, dtype=self.dtype,
                    name=f"block{stage + 1}_{i}",
                )(out, deterministic)

        # widened final head (reference :214-223)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(out)
        out = nn.Dense(self.dims[-1] * 2, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="final_linear")(out)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm2")(out)
        out = jax.nn.silu(out)
        out = jnp.mean(out, axis=(1, 2))
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=trunc_normal_init(0.02), name="classifier")(
            out.astype(jnp.float32)
        )


@register("model", "halo_transformer")
class HaloConfig(TypedConfig):
    """HaloNet-style defaults (the reference ships the class unregistered,
    models/halo_transformer.py:176; registered here for .conf addressing)."""

    image_size: Any = 256
    n_class: int = 1000
    depths: Tuple[int, int, int, int] = (2, 2, 6, 2)
    dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    dim_head: int = 32
    n_heads: Tuple[int, int, int, int] = (3, 6, 12, 24)
    dim_ffs: Tuple[int, int, int, int] = (384, 768, 1536, 3072)
    window_size: int = 8
    halo_size: int = 2
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> HaloTransformer:
        return HaloTransformer(
            image_size=tuple2(self.image_size),
            n_class=self.n_class,
            depths=tuple(self.depths),
            dims=tuple(self.dims),
            dim_head=self.dim_head,
            n_heads=tuple(self.n_heads),
            dim_ffs=tuple(self.dim_ffs),
            window_size=self.window_size,
            halo_size=self.halo_size,
            drop_ff=self.drop_ff,
            drop_attn=self.drop_attn,
            drop_path=self.drop_path if drop_path is None else drop_path,
            remat=self.remat,
            dtype=dtype,
        )
