"""Fused attention-block kernel (ops/fused_block.py) vs the einsum
composition — fwd + all grads, interpret mode on CPU.

The block kernel fuses qkv projection + MHSA + out projection (reference
hot path models/vit.py:16-45, models/swin_transformer.py:103-160); this
pins its numerics to the unfused math the models otherwise use.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.fused_block import fused_attention_block


def ref_block(x, wqkv, bqkv, wout, bout, n_head, extra, scale):
    B, N, C = x.shape
    HD = wqkv.shape[1] // 3
    D = HD // n_head
    qkv = x @ wqkv + (bqkv if bqkv is not None else 0)
    qkv = qkv.reshape(B, N, 3, n_head, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    if extra is not None:
        if extra.ndim == 4:
            G = extra.shape[0]
            s = (s.reshape(G, B // G, n_head, N, N) + extra[:, None]
                 ).reshape(B, n_head, N, N)
        else:
            s = s + extra[None]
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, HD)
    return o @ wout + (bout if bout is not None else 0)


CASES = [
    # B, N, C, H, D, groups, bias
    (4, 197, 384, 6, 64, 0, True),    # ViT-S
    (4, 197, 384, 6, 64, 0, False),   # ViT without qkv bias
    (8, 98, 96, 3, 32, 4, True),      # Swin stage-1 window pairs, grouped
    (4, 98, 96, 3, 32, 1, True),      # shared extra
    (6, 64, 128, 2, 64, 3, True),     # odd group count
]


@pytest.mark.parametrize("B,N,C,H,D,groups,bias", CASES)
def test_block_matches_einsum_f32(B, N, C, H, D, groups, bias):
    rng = np.random.default_rng(hash((B, N, C, H)) % 2**32)
    HD = H * D
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=(3 * HD,)) * 0.1, jnp.float32) if bias else None
    bout = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32) if bias else None
    if groups == 0:
        extra = None
    elif groups == 1:
        extra = jnp.asarray(rng.normal(size=(H, N, N)), jnp.float32)
    else:
        extra = jnp.asarray(rng.normal(size=(groups, H, N, N)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    args = (x, wqkv, bqkv, wout, bout)
    out_f = fused_attention_block(*args, n_head=H, extra=extra, scale=scale,
                                  interpret=True)
    out_r = ref_block(*args, n_head=H, extra=extra, scale=scale)
    np.testing.assert_allclose(out_f, out_r, atol=2e-5, rtol=2e-5)

    def loss_f(a, e):
        return jnp.sum(fused_attention_block(
            *a, n_head=H, extra=e, scale=scale, interpret=True) ** 2)

    def loss_r(a, e):
        return jnp.sum(ref_block(*a, n_head=H, extra=e, scale=scale) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(args, extra)
    gr = jax.grad(loss_r, argnums=(0, 1))(args, extra)
    for name, a, b in zip(["dx", "dwqkv", "dbqkv", "dwout", "dbout"],
                          gf[0], gr[0]):
        if a is None:
            continue
        ref_scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / ref_scale, np.asarray(b) / ref_scale,
            atol=1e-5, rtol=1e-4, err_msg=name)
    if extra is not None:
        ref_scale = max(float(np.abs(np.asarray(gr[1])).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gf[1]) / ref_scale, np.asarray(gr[1]) / ref_scale,
            atol=1e-5, rtol=1e-4, err_msg="dextra")


def test_block_bf16_close_to_f32_truth():
    """bf16 kernel grads vs an f32 ground truth: the fused kernel must not
    be meaningfully noisier than the bf16 einsum path (bias-grad sums are
    cancellation-dominated, so each bf16 path is compared against f32
    truth rather than against the other)."""
    B, N, C, H, D, G = 8, 98, 96, 3, 32, 4
    HD = H * D
    rng = np.random.default_rng(7)
    mk = lambda *s: rng.normal(size=s).astype(np.float32)
    x, wqkv, wout = mk(B, N, C), mk(C, 3 * HD) * 0.05, mk(HD, C) * 0.05
    bqkv, bout = mk(3 * HD) * 0.1, mk(C) * 0.1
    extra = jnp.asarray(mk(G, H, N, N))
    scale = 1.0 / np.sqrt(D)

    def loss(fn, dtype, a):
        a = tuple(jnp.asarray(t, dtype) for t in a)
        kw = dict(n_head=H, extra=extra, scale=scale)
        if fn is fused_attention_block:
            kw["interpret"] = True
        return jnp.sum(fn(*a, **kw).astype(jnp.float32) ** 2)

    args = (x, wqkv, bqkv, wout, bout)
    g_truth = jax.grad(lambda a: loss(ref_block, jnp.float32, a))(args)
    g_fused = jax.grad(lambda a: loss(fused_attention_block, jnp.bfloat16, a))(args)
    g_einsum = jax.grad(lambda a: loss(ref_block, jnp.bfloat16, a))(args)

    for name, t, f, e in zip(["dx", "dwqkv", "dbqkv", "dwout", "dbout"],
                             g_truth, g_fused, g_einsum):
        t = np.asarray(t, np.float32)
        err_f = np.abs(np.asarray(f, np.float32) - t).max()
        err_e = np.abs(np.asarray(e, np.float32) - t).max()
        # fused may differ from einsum but both carry bf16 noise of the
        # same order of magnitude
        assert err_f <= max(3.0 * err_e, 1e-3 * max(np.abs(t).max(), 1.0)), (
            name, err_f, err_e)


def _impl_ctx(impl):
    from vision_transformers_tpu import ops

    class _C:
        def __enter__(self):
            ops.set_attention_impl(impl, interpret=True)

        def __exit__(self, *a):
            ops.set_attention_impl(None)

    return _C()


def test_vit_block_path_matches_einsum_path():
    """Model-level: full ViT forward + grads identical under block kernel."""
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
    with _impl_ctx("einsum"):
        ref = model.apply(params, x)
        g_ref = jax.grad(lambda p: model.apply(p, x).sum())(params)
    with _impl_ctx("block"):
        out = model.apply(params, x)
        g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))


def test_swin_block_path_matches_einsum_path():
    """WindowAttention block kernel vs einsum: packed + grid==window cases,
    both shifts, grads incl. the rel-pos bias table."""
    from vision_transformers_tpu.models.swin import WindowAttention

    rng = np.random.default_rng(1)
    for hw in (8, 4):
        x = jnp.asarray(rng.normal(size=(2, hw, hw, 16)).astype(np.float32))
        for shift in (False, True):
            attn = WindowAttention(n_head=2, dim_head=8, input_size=(hw, hw),
                                   window_size=4, shift=shift)
            params = attn.init(jax.random.PRNGKey(0), x)
            params = jax.tree.map(
                lambda p: p + 0.1 if p.ndim == 2 and p.shape[-1] == 2 else p,
                params)
            with _impl_ctx("einsum"):
                ref = attn.apply(params, x)
                g_ref = jax.grad(lambda p: attn.apply(p, x).sum())(params)
            with _impl_ctx("block"):
                out = attn.apply(params, x)
                g = jax.grad(lambda p: attn.apply(p, x).sum())(params)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5,
                err_msg=f"hw={hw} shift={shift}")
            for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g),
                jax.tree_util.tree_leaves_with_path(g_ref),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                    err_msg=f"hw={hw} shift={shift} {pa}")
            assert float(jnp.abs(g["params"]["rel_pos"]).sum()) > 0
