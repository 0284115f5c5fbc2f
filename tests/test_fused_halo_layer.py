"""Whole-layer Halo kernel (ops/fused_halo_layer.py) vs the gather + einsum
composition — fwd + all grads, interpret mode on CPU.

The reference composition is the model's einsum path math: LN → qkv proj →
zero-padded halo neighborhoods → per-head softmax(qkᵀ+bias)v → out proj →
residual → LN → FF → residual (reference: halo_transformer.py:57-150).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.models.halo import (halo_neighborhoods,
                                                 halo_position_index)
from vision_transformers_tpu.ops.fused_halo_layer import fused_halo_layer


def _ln(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + eps) * g + b


def ref_halo_layer(args, nh, window, halo, scale):
    (x, g1, b1, wqkv, wout, bout, g2, b2, w1, bf1, w2, bf2, bias,
     rs1, rs2) = args
    B, H, W, C = x.shape
    HD = wqkv.shape[1] // 3
    D = HD // nh
    k = window + 2 * halo
    hs, ws = H // window, W // window
    n_win = hs * ws
    M = window * window

    u = _ln(x, g1, b1)
    qkv = u @ wqkv
    q, kv = qkv[..., :HD], qkv[..., HD:]
    qw = q.reshape(B, hs, window, ws, window, nh, D)
    qw = qw.transpose(0, 5, 1, 3, 2, 4, 6).reshape(B, nh, n_win, M, D)
    nb = halo_neighborhoods(kv, window, halo)          # [B, S, k², 2HD]
    nb = nb.reshape(B, n_win, k * k, 2, nh, D)
    key = nb[:, :, :, 0].transpose(0, 3, 1, 2, 4)
    val = nb[:, :, :, 1].transpose(0, 3, 1, 2, 4)
    s = jnp.einsum("bhsqd,bhskd->bhsqk", qw, key) * scale
    s = s + bias[None, :, None]
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhsqk,bhskd->bhsqd", p, val)
    o = o.transpose(0, 2, 3, 1, 4).reshape(B, n_win, M, HD)
    a = o @ wout + bout
    a = a.reshape(B, hs, ws, window, window, C)
    a = a.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    if rs1 is not None:
        a = a * rs1[:, None, None, None]
    z = x + a
    u2 = _ln(z, g2, b2)
    hid = u2 @ w1 + bf1
    ff = jax.nn.silu(hid) @ w2 + bf2
    if rs2 is not None:
        ff = ff * rs2[:, None, None, None]
    return z + ff


def _make_args(B, H, W, C, nh, D, F, window, halo, use_rs, seed=3):
    rng = np.random.default_rng(seed)
    HD = nh * D
    M = window * window
    k = window + 2 * halo
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, jnp.float32)
    bout = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, F)) * 0.05, jnp.float32)
    bf1 = jnp.asarray(rng.normal(size=F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, C)) * 0.05, jnp.float32)
    bf2 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(nh, M, k * k)) * 0.5, jnp.float32)
    rs1 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    rs2 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    return (x, g1, b1, wqkv, wout, bout, g2, b2, w1, bf1, w2, bf2, bias,
            rs1, rs2)


CASES = [
    # B, H, W, C, nh, D, F, window, halo, use_rs
    (2, 8, 8, 16, 2, 8, 32, 4, 1, False),
    (2, 8, 8, 16, 2, 8, 32, 4, 1, True),     # + DropPath scales
    (2, 8, 8, 16, 2, 8, 32, 4, 2, True),     # 2·halo == window boundary
    (1, 4, 4, 24, 3, 8, 48, 2, 1, True),     # tiny windows, 2·halo == w
    (2, 12, 12, 16, 2, 8, 32, 4, 1, True),   # 3 bands
    (1, 8, 8, 32, 4, 8, 64, 8, 2, True),     # grid == one window (hs=1)
]


@pytest.mark.parametrize("B,H,W,C,nh,D,F,window,halo,use_rs", CASES)
def test_halo_layer_matches_composition(B, H, W, C, nh, D, F, window, halo,
                                        use_rs):
    args = _make_args(B, H, W, C, nh, D, F, window, halo, use_rs)
    scale = 1.0 / np.sqrt(D)

    def run_k(a):
        return fused_halo_layer(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], a[8], a[9],
            a[10], a[11], a[12], nh, a[13], a[14], "silu", window=window,
            halo=halo, scale=scale, interpret=True)

    out_k = run_k(args)
    out_r = ref_halo_layer(args, nh, window, halo, scale)
    np.testing.assert_allclose(out_k, out_r, atol=5e-5, rtol=5e-5)

    gk = jax.grad(lambda a: jnp.sum(run_k(a) ** 2))(args)
    gr = jax.grad(
        lambda a: jnp.sum(ref_halo_layer(a, nh, window, halo, scale) ** 2)
    )(args)
    names = ["dx", "dg1", "db1", "dwqkv", "dwout", "dbout", "dg2", "db2",
             "dw1", "dbf1", "dw2", "dbf2", "dbias", "drs1", "drs2"]
    for name, a, b in zip(names, gk, gr):
        if a is None:
            assert b is None, name
            continue
        ref_scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / ref_scale, np.asarray(b) / ref_scale,
            atol=2e-4, rtol=2e-4, err_msg=name)


def _impl_ctx():
    from vision_transformers_tpu import ops

    class _C:
        def __enter__(self):
            ops.set_attention_impl("fused", interpret=True)

        def __exit__(self, *a):
            ops.set_attention_impl(None)

    return _C()


def test_halo_layer_module_layer_impl(monkeypatch):
    """HaloLayer under VTX_HALO_IMPL=layer vs einsum — outputs and all
    parameter grads."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.halo import HaloLayer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    layer = HaloLayer(n_head=2, dim_head=8, dim_ff=32, window_size=4,
                      halo_size=1)
    params = layer.init(jax.random.PRNGKey(0), x)
    # non-zero rel-pos table so the bias path is exercised
    params = jax.tree.map(
        lambda p: p + 0.1 if p.ndim == 2 and p.shape[-1] == 2 else p, params)

    monkeypatch.setenv("VTX_HALO_IMPL", "einsum")
    ref = layer.apply(params, x)
    g_ref = jax.grad(lambda p: layer.apply(p, x).sum())(params)

    monkeypatch.setenv("VTX_HALO_IMPL", "layer")
    with _impl_ctx():
        out = layer.apply(params, x)
        g = jax.grad(lambda p: layer.apply(p, x).sum())(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=str(pa))


def test_halo_model_layer_impl(monkeypatch):
    """Full HaloTransformer logits + grads identical under the whole-layer
    kernel (incl. the hs=1 last stage)."""
    from vision_transformers_tpu.config import registry

    cfg = registry.build(
        "model",
        {"type": "halo_transformer", "image_size": 64, "n_class": 10,
         "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128], "dim_head": 8,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
         "window_size": 2, "halo_size": 1},
    )
    model = cfg.make()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    monkeypatch.setenv("VTX_HALO_IMPL", "einsum")
    ref = model.apply(params, x)
    g_ref = jax.grad(lambda p: model.apply(p, x).sum())(params)

    monkeypatch.setenv("VTX_HALO_IMPL", "layer")
    with _impl_ctx():
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


def test_halo_layer_droppath(monkeypatch):
    """drop_path > 0 under the layer kernel: finite and shows both dropped
    and kept samples across rng keys."""
    from vision_transformers_tpu.models.halo import HaloLayer

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)).astype(np.float32))
    layer = HaloLayer(n_head=2, dim_head=8, dim_ff=32, window_size=4,
                      halo_size=1, drop_path=0.5)
    params = layer.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("VTX_HALO_IMPL", "layer")
    with _impl_ctx():
        det = layer.apply(params, x, True)
        assert np.isfinite(np.asarray(det)).all()
        for seed in range(16):
            out = layer.apply(params, x, False,
                              rngs={"dropout": jax.random.PRNGKey(seed)})
            assert np.isfinite(np.asarray(out)).all()
            diffs = np.abs(np.asarray(out) - np.asarray(x)).reshape(8, -1).max(1)
            dropped = diffs < 1e-6
            if dropped.any() and (~dropped).any():
                return
    raise AssertionError("no key produced both dropped and kept samples")
