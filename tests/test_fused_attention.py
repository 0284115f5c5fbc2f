"""Fused-attention Pallas kernel vs reference einsum attention (interpret
mode on CPU; the identical kernel runs compiled on TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.fused_attention import fused_attention


def ref_attention(q, k, v, extra=None, scale=None):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bgmd,bgnd->bgmn", q, k).astype(jnp.float32) * scale
    if extra is not None:
        s = s + extra
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bgmn,bgnd->bgmd", p.astype(v.dtype), v)


@pytest.mark.parametrize("shape", [
    (2, 4, 17, 8),    # odd M, small D
    (1, 6, 49, 32),   # swin window shape
    (2, 2, 197, 64),  # vit shape
])
def test_forward_matches_einsum(shape):
    b, g, m, d = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    out = fused_attention(q, k, v, None, None, True)
    expected = ref_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_forward_with_extra_bias():
    b, g, m, d = 2, 3, 21, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    extra = jnp.asarray(rng.normal(size=(g, m, m)).astype(np.float32))
    out = fused_attention(q, k, v, extra, None, True)
    expected = ref_attention(q, k, v, extra)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_forward_with_mask_neg_inf():
    """A -1e9 extra entry effectively masks that key."""
    b, g, m, d = 1, 1, 8, 8
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    extra = jnp.zeros((g, m, m)).at[:, :, 3].set(-1e9)
    out = fused_attention(q, k, v, extra, None, True)
    # key 3 contributes ~nothing: recompute without key 3
    k2 = np.delete(np.asarray(k), 3, axis=2)
    v2 = np.delete(np.asarray(v), 3, axis=2)
    expected = ref_attention(q, jnp.asarray(k2), jnp.asarray(v2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_cross_attention_shapes():
    """M != N (PVT spatial-reduction attention shape)."""
    b, g, m, n, d = 2, 2, 64, 16, 32
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, n, d)).astype(np.float32))
    out = fused_attention(q, k, v, None, None, True)
    expected = ref_attention(q, k, v)
    assert out.shape == (b, g, m, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_einsum():
    b, g, m, d = 2, 2, 33, 16
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))
    extra = jnp.asarray(rng.normal(size=(g, m, m)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32))

    def loss_fused(q, k, v, e):
        return jnp.sum(fused_attention(q, k, v, e, None, True) * w)

    def loss_ref(q, k, v, e):
        return jnp.sum(ref_attention(q, k, v, e) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, extra)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, extra)
    for name, a, b_ in zip("qkve", g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def _qkv_ref(qkv_flat, n_head, extra=None):
    """einsum reference for the flat [B,N,3·H·D] packed layout."""
    b, n, c = qkv_flat.shape
    d = c // (3 * n_head)
    qkv = qkv_flat.reshape(b, n, 3, n_head, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))  # [b,h,n,d]
    out = ref_attention(q, k, v, extra).transpose(0, 2, 1, 3)
    return out.reshape(b, n, n_head * d)


def test_qkv_packed_forward_matches_einsum():
    """Flat packed-layout entry ([B,N,3·H·D] → [B,N,H·D]) vs einsum."""
    from vision_transformers_tpu.ops.fused_attention import fused_attention_qkv

    b, n, h, d = 2, 33, 4, 16
    rng = np.random.default_rng(6)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h * d)).astype(np.float32))
    out = fused_attention_qkv(qkv, h, None, None, True)
    assert out.shape == (b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_qkv_ref(qkv, h)),
                               rtol=2e-4, atol=2e-5)


def test_qkv_packed_odd_head_offsets():
    """dim_head that is not a lane multiple (static misaligned slices)."""
    from vision_transformers_tpu.ops.fused_attention import fused_attention_qkv

    b, n, h, d = 2, 17, 3, 8   # head offsets 8, 16 — misaligned vs 128 lanes
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h * d)).astype(np.float32))
    out = fused_attention_qkv(qkv, h, None, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_qkv_ref(qkv, h)),
                               rtol=2e-4, atol=2e-5)


def test_qkv_packed_with_extra_and_grads():
    from vision_transformers_tpu.ops.fused_attention import fused_attention_qkv

    b, n, h, d = 2, 21, 2, 8
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h * d)).astype(np.float32))
    extra = jnp.asarray(rng.normal(size=(h, n, n)).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.normal(size=(b, n, h * d)).astype(np.float32))

    def loss_fused(qkv, e):
        return jnp.sum(fused_attention_qkv(qkv, h, e, None, True) * w)

    def loss_ref(qkv, e):
        return jnp.sum(_qkv_ref(qkv, h, e) * w)

    np.testing.assert_allclose(float(loss_fused(qkv, extra)),
                               float(loss_ref(qkv, extra)), rtol=2e-4)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, extra)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, extra)
    for name, a, b_ in zip(("qkv", "extra"), g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_bf16_runs():
    b, g, m, d = 1, 2, 49, 32
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, g, m, d)).astype(np.float32), jnp.bfloat16)
    out = fused_attention(q, k, v, None, None, True)
    assert out.dtype == jnp.bfloat16
    ref = ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_vit_fused_path_matches_einsum_path():
    """Model-level check: ViT forward identical under both attention paths."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.config import registry

    cfg = registry.build(
        "model",
        {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
         "depth": 2, "dim": 64, "n_head": 2, "dim_ff": 128},
    )
    model = cfg.make()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    try:
        ops.set_fused_attention(False)
        ref = model.apply(params, x)
        ops.set_fused_attention(True, interpret=True)
        fused = model.apply(params, x)
    finally:
        ops.set_fused_attention(None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)


def test_swin_fused_path_matches_einsum_path():
    """Covers the window-PAIR packed path (8×8 grid, window 4 → 4 windows,
    pack=2 with block-diagonal masks) and the unpacked grid==window case
    (4×4 grid, window 4 → 1 window), both shifts."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.swin import WindowAttention

    rng = np.random.default_rng(1)
    for hw in (8, 4):
        x = jnp.asarray(rng.normal(size=(2, hw, hw, 16)).astype(np.float32))
        for shift in (False, True):
            attn = WindowAttention(n_head=2, dim_head=8, input_size=(hw, hw),
                                   window_size=4, shift=shift)
            params = attn.init(jax.random.PRNGKey(0), x)
            # nonzero bias table so the extra path is actually exercised
            params = jax.tree.map(
                lambda p: p + 0.1 if p.ndim == 2 and p.shape[-1] == 2 else p,
                params)
            try:
                ops.set_fused_attention(False)
                ref = attn.apply(params, x)
                ops.set_fused_attention(True, interpret=True)
                fused = attn.apply(params, x)
            finally:
                ops.set_fused_attention(None)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(ref), rtol=5e-4, atol=5e-5,
                err_msg=f"hw={hw} shift={shift}")


def test_swin_fused_grad_reaches_bias_table():
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.swin import WindowAttention

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    attn = WindowAttention(n_head=2, dim_head=8, input_size=(8, 8),
                           window_size=4, shift=True)
    params = attn.init(jax.random.PRNGKey(0), x)
    try:
        ops.set_fused_attention(True, interpret=True)
        g_fused = jax.grad(lambda p: attn.apply(p, x).sum())(params)
        ops.set_fused_attention(False)
        g_ref = jax.grad(lambda p: attn.apply(p, x).sum())(params)
    finally:
        ops.set_fused_attention(None)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))
    # bias table grad is nonzero
    assert float(jnp.abs(g_fused["params"]["rel_pos"]).sum()) > 0
