"""Swin Transformer (reference: models/swin_transformer.py).

TPU-native design:

- NHWC end to end; window partition is a reshape+transpose that XLA fuses
  into the surrounding matmuls — no data movement beyond what the MXU needs
- the cyclic shift (torch.roll, reference :110-115) becomes a static
  ``jnp.roll`` which XLA lowers to two slices + concat, fused with the qkv
  projection
- the relative-position bias table and the shifted-window attention mask are
  *static* (computed in numpy at trace time, reference builds them as buffers
  in ``make_mask_pos``, :55-101), so the gather constant-folds and the mask
  is a compile-time additive constant
- attention runs as batched einsums over [B, S, heads, w², d] — MXU-shaped;
  softmax in float32

Reference quirks reproduced for weight-level parity:
- ``shift = i % 2 == 0``: the FIRST layer of each block is shifted
  (reference :362 — opposite of the paper)
- the shifted mask criterion is ``|Δy| < w and |Δx| < w`` on pre-roll
  coordinates (reference :80-92), not the paper's region-id partition
- the bias table is zero-initialized (reference :47)
- drop-path ramp is ``drop_path * i / sum(depths)`` over transformer layers
  only (reference :286-321)
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import TypedConfig, register
from .layers import (DenseParams, FeedForward, LayerNormParams, dense_apply,
                     drop_path as drop_path_fn, layer_norm_apply,
                     trunc_normal_init, tuple2)

Dtype = Any

_LN_EPS = 1e-6  # reference: models/swin_transformer.py:12


def patchify(x: jax.Array, size: int) -> jax.Array:
    """[B,H,W,D] → [B,H/s,W/s,s·s·D], feature order (sy, sx, d)
    (reference: models/swin_transformer.py:15-22)."""
    b, h, w, d = x.shape
    x = x.reshape(b, h // size, size, w // size, size, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // size, w // size, size * size * d)


def _window_coords(input_size: Tuple[int, int], window: int, shift: bool):
    """Per-window token coordinates on the (optionally rolled) image grid.

    Returns (y, x), each [n_windows, window²], token order (wy, wx) row-major
    — matching the attention head reshape.
    """
    h, w = input_size
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    if shift:
        roll = window // 2
        yy = np.roll(yy, (-roll, -roll), (0, 1))
        xx = np.roll(xx, (-roll, -roll), (0, 1))

    def part(c):
        c = c.reshape(h // window, window, w // window, window)
        c = c.transpose(0, 2, 1, 3)
        return c.reshape(-1, window * window)

    return part(yy), part(xx)


def relative_position_index(window: int,
                            input_size: Optional[Tuple[int, int]] = None,
                            shift: bool = False) -> np.ndarray:
    """[w², w²] index into the (2w-1)² bias table (reference: :42-47,98-101).

    Reference conventions (verified against its ``pos`` buffer in
    tests/test_torch_parity.py):
    - diffs are ``key − query``
    - the index comes from window 0 of the (rolled, when shifted) grid.  For
      grids larger than the window this equals the standard index, but when
      the grid EQUALS the window (e.g. the last Swin stage: 7×7 tokens,
      window 7) the cyclic shift wraps inside window 0 and changes the
      indices — reproduced here
    - in the shifted case, non-local pair diffs are zeroed before indexing
      (their scores are −inf-masked anyway)
    """
    if input_size is None:
        input_size = (window, window)
    y, x = _window_coords(input_size, window, shift)
    dy = y[0][None, :] - y[0][:, None]
    dx = x[0][None, :] - x[0][:, None]
    if shift:
        local = (np.abs(dy) < window) & (np.abs(dx) < window)
        dy = dy * local
        dx = dx * local
    return (dy + window - 1) * (2 * window - 1) + (dx + window - 1)


def shifted_window_mask(input_size: Tuple[int, int], window: int) -> np.ndarray:
    """[n_windows, w², w²] additive mask (0 or -inf-ish) for shifted windows.

    Reference criterion (models/swin_transformer.py:80-92): a (query, key)
    pair may attend iff both its original-grid coordinate deltas are within
    the window extent.
    """
    y, x = _window_coords(input_size, window, shift=True)
    dy = y[:, :, None] - y[:, None, :]
    dx = x[:, :, None] - x[:, None, :]
    local = (np.abs(dy) < window) & (np.abs(dx) < window)
    return np.where(local, 0.0, -1e9).astype(np.float32)


class WindowAttention(nn.Module):
    """Windowed MHSA with relative-position bias and optional cyclic shift
    (reference: models/swin_transformer.py:25-160)."""

    n_head: int
    dim_head: int
    input_size: Tuple[int, int]
    window_size: int
    shift: bool
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None, row_scale=None,
                 ff=None, map_kernel: bool = False):
        """``ln=(scale, bias, eps)`` switches to the fused layer-half kernel
        and returns the FULL residual branch ``x + row_scale ⊙ Attn(LN(x))``
        computed in one Pallas program per window group (ops/fused_layer.py);
        without ``ln`` returns just the attention output as before.

        ``ff=(g2, b2, w1, b1, w2, b2f, act, rs_ff)`` additionally fuses the
        FF residual branch into the SAME Pallas program (one custom call per
        layer, ops/fused_layer1.py) and returns the full layer output.  The
        FF half is token-pointwise, so it commutes with the roll/partition
        permutation and runs in the window-partitioned layout for free."""
        b, h, w, dim = x.shape
        window = self.window_size
        hs, ws = h // window, w // window
        inner = self.n_head * self.dim_head
        n_win = hs * ws
        w2 = window * window
        scale = 1.0 / math.sqrt(self.dim_head)

        bias_table = self.param(
            "rel_pos", nn.initializers.zeros,
            ((2 * window - 1) ** 2, self.n_head), jnp.float32,
        )
        pos_index = relative_position_index(window, (h, w), self.shift)  # static
        bias = bias_table[pos_index]  # [w², w², head] — constant-folded gather
        bias = bias.transpose(2, 0, 1)  # [head, w², w²] f32

        from .. import ops as _ops

        roll = window // 2
        if ln is not None:
            impl = "layer"
        else:
            impl = _ops.attention_impl(b, seq=w2, default="einsum")
            if impl == "layer":
                impl = "einsum"  # layer fusion is driven by SwinLayer via ln
            if not (deterministic or self.dropout == 0.0):
                impl = "einsum"  # attention dropout needs materialized probs

        # raw Dense params (same {weight,linear}/{kernel,bias} tree as
        # nn.Dense) so the block kernel can take the weights VMEM-resident
        wqkv, bqkv = DenseParams(inner * 3,
                                 kernel_init=trunc_normal_init(0.02),
                                 name="weight")(dim)
        wout, bout = DenseParams(dim, kernel_init=trunc_normal_init(0.02),
                                 name="linear")(inner)

        # Window PAIRS are folded into the partition reshape (49 → 98 tokens
        # ≤ 128 lanes, block-diagonal bias): a [98,·]·[·,98] MXU pass costs
        # the same as a [49,·]·[·,49] one, halving the number of attention
        # dots for free (reference hot kernel: swin_transformer.py:103-160).
        pack = 2 if (ws % 2 == 0 and 2 * w2 <= 128) else 1
        m_tok = pack * w2
        groups = n_win // pack

        def packed_slab():
            """[head, m, m] rel-pos bias, block-diagonal when packed."""
            if pack == 1:
                return bias
            neg = jnp.full((self.n_head, w2, w2), -1e9, jnp.float32)
            return jnp.concatenate([
                jnp.concatenate([bias, neg], axis=-1),
                jnp.concatenate([neg, bias], axis=-1),
            ], axis=-2)  # [head, 2w², 2w²]

        def packed_shift_mask():
            """np [groups, m, m] additive shift mask in pack order."""
            m = shifted_window_mask((h, w), window)  # [n_win, w², w²]
            m = m.reshape(hs, ws // pack, pack, w2, w2)
            pm = np.zeros((hs, ws // pack, m_tok, m_tok), np.float32)
            pm[:, :, :w2, :w2] = m[:, :, 0]
            if pack > 1:
                pm[:, :, w2:, w2:] = m[:, :, 1]
            return pm.reshape(groups, m_tok, m_tok)

        if ln is not None and ff is not None and map_kernel:
            # map-resident whole-layer kernel (ops/fused_swin.py): the roll,
            # the window-pair partition and BOTH residual branches run inside
            # ONE Pallas program per layer — x never leaves its [b,H,W,C]
            # layout, killing the per-layer roll/partition/unpartition HBM
            # round-trips (PERF.md round 4: 15.5 ms/step of movement).  The
            # kernel's token order is layout-native, so the static bias/mask
            # slabs are permuted once at trace time.
            g_ln, b_ln, eps = ln
            g2, b2, w1f, b1f, w2f, b2f, act, rs_ff = ff
            perm = _ops.swin_token_perm(window, pack)
            slab = packed_slab()[:, perm][:, :, perm]  # [head, m, m]
            if self.shift:
                mask = packed_shift_mask()[:, None]  # np [G, 1, m, m]
                mask = mask[:, :, perm][:, :, :, perm]
                extra = slab[None] + jnp.asarray(mask)  # [G, head, m, m]
            else:
                extra = slab[None]  # [1, head, m, m] — broadcast group
            return _ops.fused_swin_layer(
                x, g_ln, b_ln, wqkv.astype(self.dtype),
                bqkv.astype(self.dtype), wout.astype(self.dtype),
                bout.astype(self.dtype), g2, b2,
                w1f.astype(self.dtype), b1f.astype(self.dtype),
                w2f.astype(self.dtype), b2f.astype(self.dtype),
                self.n_head, extra, row_scale, rs_ff, act,
                window=window, shift=self.shift, pack=pack, scale=scale,
                eps=eps)

        if self.shift:
            x = jnp.roll(x, (-roll, -roll), (1, 2))

        if impl in ("fused", "block", "layer"):
            # TPU kernel path: window-MAJOR partition BEFORE the projections
            # so tokens sit in sublanes ([G·b, m_tok, C]) and the kernels see
            # their native layout; the per-window rel-pos bias + shift mask
            # ride in as a GROUPED extra (one [head, m, m] slab per group).
            # [b,H,W,C] → [hs, ws/pack, b, pack, wy, wx, C] → [G·b, m_tok, C]
            xw = x.reshape(b, hs, window, ws // pack, pack, window, dim)
            xw = xw.transpose(1, 3, 0, 4, 2, 5, 6)
            xw = xw.reshape(groups * b, m_tok, dim)

            extra = jnp.broadcast_to(packed_slab()[None],
                                     (groups, self.n_head, m_tok, m_tok))
            if self.shift:
                extra = extra + jnp.asarray(packed_shift_mask()[:, None])

            if impl == "layer":
                # whole pre-LN residual branch in one kernel; LN, residual
                # and the DropPath row scale are all token-pointwise, so
                # they commute with the roll/partition permutation
                g_ln, b_ln, eps = ln
                rs_rows = None if row_scale is None \
                    else jnp.tile(row_scale, groups)
                if ff is not None:
                    # both residual branches in ONE custom call: rows are
                    # (group, sample) pairs so the per-sample DropPath
                    # scales tile over groups (their cotangents fold back
                    # through the differentiable tile)
                    g2, b2, w1f, b1f, w2f, b2f, act, rs_ff = ff
                    rs_ff_rows = None if rs_ff is None \
                        else jnp.tile(rs_ff, groups)
                    out = _ops.fused_transformer_layer(
                        xw, g_ln, b_ln, wqkv.astype(self.dtype),
                        bqkv.astype(self.dtype), wout.astype(self.dtype),
                        bout.astype(self.dtype), g2, b2,
                        w1f.astype(self.dtype), b1f.astype(self.dtype),
                        w2f.astype(self.dtype), b2f.astype(self.dtype),
                        self.n_head, extra, rs_rows, rs_ff_rows, act,
                        scale, eps)
                else:
                    out = _ops.fused_attention_layer(
                        xw, g_ln, b_ln, wqkv.astype(self.dtype),
                        bqkv.astype(self.dtype), wout.astype(self.dtype),
                        bout.astype(self.dtype), self.n_head, extra, rs_rows,
                        scale, eps)
            elif impl == "block":
                # whole-block kernel: qkv projection + attention + out
                # projection in one Pallas program, weights VMEM-resident
                out = _ops.fused_attention_block(
                    xw, wqkv.astype(self.dtype), bqkv.astype(self.dtype),
                    wout.astype(self.dtype), bout.astype(self.dtype),
                    self.n_head, extra, scale)
            else:
                qkv = dense_apply(xw, wqkv, bqkv, self.dtype)
                out = _ops.fused_attention_qkv(qkv, self.n_head, extra, scale)
                out = dense_apply(out, wout, bout, self.dtype)

            out = out.reshape(hs, ws // pack, b, pack, window, window, dim)
            out = out.transpose(2, 0, 4, 1, 3, 5, 6).reshape(b, h, w, dim)

            if self.shift:
                out = jnp.roll(out, (roll, roll), (1, 2))
            return out

        # einsum path — ALSO window-pair packed (isolated v5e measurement:
        # stage-3 fwd+bwd 1.5 ms packed vs 2.83 ms unpacked per layer —
        # PERF.md round 2)
        qkv = dense_apply(x, wqkv, bqkv, self.dtype)
        qkv = qkv.reshape(b, hs, window, ws // pack, pack, window, 3,
                          self.n_head, self.dim_head)
        # [b, S/pack, 3, head, pack·w², d], token order (pair, wy, wx)
        qkv = qkv.transpose(0, 1, 3, 6, 7, 4, 2, 5, 8).reshape(
            b, groups, 3, self.n_head, m_tok, self.dim_head
        )
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        score = jnp.einsum("bshqd,bshkd->bshqk", q, k) * scale
        score = score + packed_slab().astype(score.dtype)[None, None]
        if self.shift:
            score = score + jnp.asarray(
                packed_shift_mask()[None, :, None], score.dtype)
        attn = jax.nn.softmax(score.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bshqk,bshkd->bshqd", attn, v)

        out = out.reshape(b, hs, ws // pack, self.n_head, pack, window, window,
                          self.dim_head)
        out = out.transpose(0, 1, 5, 2, 4, 6, 3, 7).reshape(b, h, w, inner)
        out = dense_apply(out, wout, bout, self.dtype)

        if self.shift:
            out = jnp.roll(out, (roll, roll), (1, 2))
        return out


class SwinLayer(nn.Module):
    """Pre-LN window-attention block (reference: :163-197)."""

    n_head: int
    dim_head: int
    dim_ff: int
    input_size: Tuple[int, int]
    window_size: int
    shift: bool
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    def _row_scale(self, b: int, deterministic: bool):
        """Per-sample DropPath scale (mask/keep, reference layer.py:166-183)
        for the fused layer kernels."""
        if deterministic or self.drop_path == 0.0:
            return None
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, (b,))
        return mask.astype(jnp.float32) / keep

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .. import ops as _ops

        b, hh, ww, dim = x.shape
        g1, b1 = LayerNormParams(name="norm_attn")(dim)
        g2, b2 = LayerNormParams(name="norm_ff")(dim)
        attn = WindowAttention(
            self.n_head, self.dim_head, self.input_size, self.window_size,
            self.shift, self.drop_attn, dtype=self.dtype, name="attn")
        ff = FeedForward(dim=self.dim_ff, activation=jax.nn.silu,
                         dropout=self.drop_ff, dtype=self.dtype, name="ff")

        # measured default (PERF.md round 4): the whole-layer single-call
        # kernel (layer1, qkv-save, 64 MB VMEM) beats the attention-half
        # kernel on Swin — 987.7 vs 957.1 img/s/chip at 128/chip (round-2
        # ladder: layer 913 vs einsum 889 vs block; ViT keeps "layer" —
        # layer1 loses ~9% there, see ops/fused_layer1.py)
        impl = _ops.attention_impl(
            b, seq=self.window_size ** 2, default="layer1")
        use_layer = impl in ("layer", "layer1", "swin") \
            and (deterministic or (self.drop_attn == 0.0 and
                                   self.drop_ff == 0.0))
        if use_layer and impl == "swin":
            # map-resident whole-layer kernel: shift + partition + both
            # residual branches in one custom call (ops/fused_swin.py)
            w1f, b1f, w2f, b2f = ff(x, return_params=True)
            return attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                        row_scale=self._row_scale(b, deterministic),
                        ff=(g2, b2, w1f, b1f, w2f, b2f, "silu",
                            self._row_scale(b, deterministic)),
                        map_kernel=True)
        if use_layer and impl == "layer1":
            # whole layer (both residual branches) as ONE custom call inside
            # the window partition (ops/fused_layer1.py)
            w1f, b1f, w2f, b2f = ff(x, return_params=True)
            return attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                        row_scale=self._row_scale(b, deterministic),
                        ff=(g2, b2, w1f, b1f, w2f, b2f, "silu",
                            self._row_scale(b, deterministic)))
        if use_layer:
            x = attn(x, deterministic, ln=(g1, b1, _LN_EPS),
                     row_scale=self._row_scale(b, deterministic))
            if _ops.ff_kernel_enabled():
                return ff(x, deterministic, ln=(g2, b2, _LN_EPS),
                          row_scale=self._row_scale(b, deterministic))
            h = layer_norm_apply(x, g2, b2, _LN_EPS, self.dtype)
            h = ff(h, deterministic)
            rs = self._row_scale(b, deterministic)
            return x + (h if rs is None
                        else h * rs[:, None, None, None].astype(h.dtype))

        def dp(y):
            if deterministic or self.drop_path == 0.0:
                return y
            return drop_path_fn(y, self.drop_path, self.make_rng("dropout"), False)

        h = layer_norm_apply(x, g1, b1, _LN_EPS, self.dtype)
        h = attn(h, deterministic)
        x = x + dp(h)

        h = layer_norm_apply(x, g2, b2, _LN_EPS, self.dtype)
        h = ff(h, deterministic)
        return x + dp(h)


class PatchEmbedding(nn.Module):
    """patchify → linear → LN (reference: :200-213)."""

    out_dim: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = patchify(x, self.window_size)
        out = nn.Dense(self.out_dim, dtype=self.dtype,
                       kernel_init=trunc_normal_init(0.02), name="linear")(out)
        # torch-default eps (reference PatchEmbedding uses bare nn.LayerNorm,
        # swin_transformer.py:206 — not the 1e-6 lambda)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)


class PatchMerge(nn.Module):
    """patchify → LN → linear(no bias) (reference: :216-229)."""

    out_dim: int
    window_size: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = patchify(x, self.window_size)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        kernel_init=trunc_normal_init(0.02), name="linear")(out)


class SwinTransformer(nn.Module):
    """4-stage Swin (reference: :236-379)."""

    image_size: Tuple[int, int]
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
        image_size = tuple2(self.image_size)
        n_layers = sum(self.depths)
        # drop-path ramp i/n_layers over transformer layers (reference :286-321)
        rates = [self.drop_path * i / n_layers for i in range(n_layers)]
        layer_cls = (nn.remat(SwinLayer, static_argnums=(2,))
                     if self.remat else SwinLayer)

        out = PatchEmbedding(self.dims[0], 4, dtype=self.dtype, name="patch_embedding")(x)

        i_layer = 0
        size = (image_size[0] // 4, image_size[1] // 4)
        for stage in range(4):
            if stage > 0:
                out = PatchMerge(self.dims[stage], 2, dtype=self.dtype,
                                 name=f"merge{stage + 1}")(out)
                size = (size[0] // 2, size[1] // 2)
            for i in range(self.depths[stage]):
                out = layer_cls(
                    self.n_heads[stage], self.dim_head, self.dim_ffs[stage],
                    size, self.window_size,
                    shift=(i % 2 == 0),  # reference quirk :362
                    drop_ff=self.drop_ff, drop_attn=self.drop_attn,
                    drop_path=rates[i_layer], dtype=self.dtype,
                    name=f"block{stage + 1}_{i}",
                )(out, deterministic)
                i_layer += 1

        # reference final norm is a bare nn.LayerNorm (eps 1e-5), :276
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(out)
        out = jnp.mean(out, axis=(1, 2))  # adaptive avg pool (reference :277-281)
        return nn.Dense(self.n_class, dtype=jnp.float32,
                        kernel_init=trunc_normal_init(0.02), name="classifier")(
            out.astype(jnp.float32)
        )


@register("model", "swin_transformer")
class SwinConfig(TypedConfig):
    """(reference registration: models/swin_transformer.py:236)"""

    image_size: Any = (224, 224)
    n_class: int = 1000
    depths: Tuple[int, int, int, int] = (2, 2, 6, 2)
    dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    dim_head: int = 32
    n_heads: Tuple[int, int, int, int] = (3, 6, 12, 24)
    dim_ffs: Tuple[int, int, int, int] = (384, 768, 1536, 3072)
    window_size: int = 7
    drop_ff: float = 0.0
    drop_attn: float = 0.0
    drop_path: float = 0.0
    remat: bool = False  # optional extension over the reference conf schema

    def make(self, dtype=jnp.float32, drop_path: Optional[float] = None,
             dropout: Optional[float] = None) -> SwinTransformer:
        return SwinTransformer(
            image_size=tuple2(self.image_size),
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
