"""Map-resident Swin layer kernel (ops/fused_swin.py) vs the partition +
whole-layer composition — fwd + all grads, interpret mode on CPU.

The reference composition is exactly what models/swin.py ships on the layer1
path: roll → window-pair partition → fused_transformer_layer → unpartition →
unroll; the map kernel must match it bit-for-bit in f32 (same dot order per
window) up to accumulation-order noise in the weight grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.fused_swin import (fused_swin_layer,
                                                    swin_token_perm)

from test_fused_layer1 import ref_layer


def partition(x, w, pack, shift):
    """[B,H,W,C] → [G·B, m, C] in the model's window-pair partition order
    (models/swin.py:216-219)."""
    b, H, W, C = x.shape
    roll = w // 2
    if shift:
        x = jnp.roll(x, (-roll, -roll), (1, 2))
    hs, ws = H // w, W // w
    xw = x.reshape(b, hs, w, ws // pack, pack, w, C)
    xw = xw.transpose(1, 3, 0, 4, 2, 5, 6)
    return xw.reshape(hs * (ws // pack) * b, pack * w * w, C)


def unpartition(out, b, H, W, w, pack, shift):
    hs, ws = H // w, W // w
    roll = w // 2
    out = out.reshape(hs, ws // pack, b, pack, w, w, out.shape[-1])
    out = out.transpose(2, 0, 4, 1, 3, 5, 6).reshape(b, H, W, out.shape[-1])
    if shift:
        out = jnp.roll(out, (roll, roll), (1, 2))
    return out


def _make_args(B, H, W, C, nh, D, F, w, pack, shift, use_rs, seed=3):
    rng = np.random.default_rng(seed)
    HD = nh * D
    hs, wspp = H // w, (W // w) // pack
    G = hs * wspp
    m = pack * w * w
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=3 * HD) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, jnp.float32)
    bout = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, F)) * 0.05, jnp.float32)
    bf1 = jnp.asarray(rng.normal(size=F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, C)) * 0.05, jnp.float32)
    bf2 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    # grouped (per window position) when shifted, broadcast otherwise —
    # exactly how models/swin.py builds the slabs
    Ge = G if shift else 1
    extra = jnp.asarray(rng.normal(size=(Ge, nh, m, m)), jnp.float32)
    rs1 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    rs2 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    return (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, bf1, w2, bf2,
            extra, rs1, rs2)


def ref_swin(args, nh, w, pack, shift, scale, B, H, W):
    """Partition → ref whole-layer → unpartition, with the kernel's
    native-order extra permuted BACK to partition order."""
    (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, bf1, w2, bf2,
     extra, rs1, rs2) = args
    G = (H // w) * ((W // w) // pack)
    perm = swin_token_perm(w, pack)
    inv = np.argsort(perm)
    # kernel gets native-order slabs; the partition path wants them in
    # partition order → apply the inverse permutation
    e = extra[:, :, inv][:, :, :, inv]
    if e.shape[0] == 1:
        e = jnp.broadcast_to(e, (G,) + e.shape[1:])
    xw = partition(x, w, pack, shift)
    t1 = None if rs1 is None else jnp.tile(rs1, G)
    t2 = None if rs2 is None else jnp.tile(rs2, G)
    out = ref_layer(xw, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, bf1,
                    w2, bf2, nh, e, t1, t2, scale)
    return unpartition(out, B, H, W, w, pack, shift)


CASES = [
    # B, H, W, C, nh, D, F, w, pack, shift, use_rs
    (2, 8, 8, 16, 2, 8, 32, 2, 2, False, False),   # 4x4 grid, pairs
    (2, 8, 8, 16, 2, 8, 32, 2, 2, True, True),     # shifted + DropPath
    (2, 8, 8, 16, 2, 8, 32, 2, 1, True, False),    # unpacked windows
    (1, 4, 4, 24, 3, 8, 48, 4, 1, True, True),     # grid == window wrap
    (2, 12, 12, 16, 2, 8, 32, 4, 1, True, True),   # 3 bands, odd ws
    (4, 14, 14, 32, 4, 8, 64, 7, 2, True, True),   # Swin stage-3 shape
]


@pytest.mark.parametrize("B,H,W,C,nh,D,F,w,pack,shift,use_rs", CASES)
def test_swin_kernel_matches_composition(B, H, W, C, nh, D, F, w, pack,
                                         shift, use_rs):
    args = _make_args(B, H, W, C, nh, D, F, w, pack, shift, use_rs)
    scale = 1.0 / np.sqrt(D)

    out_k = fused_swin_layer(*args[:13], nh, args[13], args[14], args[15],
                             "silu", window=w, shift=shift, pack=pack,
                             scale=scale, interpret=True)
    out_r = ref_swin(args, nh, w, pack, shift, scale, B, H, W)
    np.testing.assert_allclose(out_k, out_r, atol=5e-5, rtol=5e-5)

    def loss_k(a):
        return jnp.sum(fused_swin_layer(
            *a[:13], nh, a[13], a[14], a[15], "silu", window=w, shift=shift,
            pack=pack, scale=scale, interpret=True) ** 2)

    def loss_r(a):
        return jnp.sum(ref_swin(a, nh, w, pack, shift, scale, B, H, W) ** 2)

    gk = jax.grad(loss_k)(args)
    gr = jax.grad(loss_r)(args)
    names = ["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwout", "dbout", "dg2",
             "db2", "dw1", "dbf1", "dw2", "dbf2", "dextra", "drs1", "drs2"]
    for name, a, b in zip(names, gk, gr):
        if a is None:
            assert b is None, name
            continue
        ref_scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / ref_scale, np.asarray(b) / ref_scale,
            atol=2e-4, rtol=2e-4, err_msg=name)


def test_swin_kernel_save_modes(monkeypatch):
    """The saving ladder must not change outputs or grads."""
    args = _make_args(2, 8, 8, 16, 2, 8, 32, 2, 2, True, True, seed=7)
    scale = 1.0 / np.sqrt(8)

    def loss(a):
        return jnp.sum(fused_swin_layer(
            *a[:13], 2, a[13], a[14], a[15], "silu", window=2, shift=True,
            pack=2, scale=scale, interpret=True) ** 2)

    results = {}
    for mode in ("none", "acc", "qkv"):
        monkeypatch.setenv("VTX_L1_SAVE", mode)
        results[mode] = (loss(args), jax.grad(loss)(args))
    for mode in ("acc", "qkv"):
        np.testing.assert_allclose(np.asarray(results[mode][0]),
                                   np.asarray(results["none"][0]),
                                   rtol=1e-6, err_msg=mode)
        for a, ref in zip(jax.tree.leaves(results[mode][1]),
                          jax.tree.leaves(results["none"][1])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)


def _impl_ctx(impl):
    from vision_transformers_tpu import ops

    class _C:
        def __enter__(self):
            ops.set_attention_impl(impl, interpret=True)

        def __exit__(self, *a):
            ops.set_attention_impl(None)

    return _C()


def test_swin_layer_map_impl_matches_einsum():
    """SwinLayer under the map-resident whole-layer kernel vs einsum —
    outputs and all parameter grads, both shifts."""
    from vision_transformers_tpu.models.swin import SwinLayer

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    for shift in (False, True):
        layer = SwinLayer(n_head=2, dim_head=8, dim_ff=32, input_size=(8, 8),
                          window_size=4, shift=shift)
        params = layer.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(
            lambda p: p + 0.1 if p.ndim == 2 and p.shape[-1] == 2 else p,
            params)
        with _impl_ctx("einsum"):
            ref = layer.apply(params, x)
            g_ref = jax.grad(lambda p: layer.apply(p, x).sum())(params)
        with _impl_ctx("swin"):
            out = layer.apply(params, x)
            g = jax.grad(lambda p: layer.apply(p, x).sum())(params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"shift={shift}")
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g),
            jax.tree_util.tree_leaves_with_path(g_ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                err_msg=f"shift={shift} {pa}")


def test_swin_model_map_impl_matches_einsum():
    """Full 4-stage SwinTransformer (incl. the grid==window last stage and
    the shift=i%2==0 quirk) — logits + grads identical under the map
    kernel."""
    from vision_transformers_tpu.config import registry

    cfg = registry.build(
        "model",
        {"type": "swin_transformer", "image_size": 64, "n_class": 10,
         "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128], "dim_head": 8,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
         "window_size": 2},
    )
    model = cfg.make()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    with _impl_ctx("einsum"):
        ref = model.apply(params, x)
        g_ref = jax.grad(lambda p: model.apply(p, x).sum())(params)
    with _impl_ctx("swin"):
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


def test_swin_model_map_impl_droppath(tiny=True):
    """drop_path > 0: the map kernel's per-sample scales must reproduce the
    einsum path's DropPath statistics given the same rng stream."""
    from vision_transformers_tpu.models.swin import SwinLayer

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)).astype(np.float32))
    layer = SwinLayer(n_head=2, dim_head=8, dim_ff=32, input_size=(8, 8),
                      window_size=4, shift=True, drop_path=0.5)
    params = layer.init(jax.random.PRNGKey(0), x)
    with _impl_ctx("swin"):
        det = layer.apply(params, x, True)
    assert np.isfinite(np.asarray(det)).all()
    # each sample's delta vs x is 0 iff BOTH branch draws dropped; scan a
    # few keys until the batch shows both fully-dropped and kept samples
    for seed in range(16):
        with _impl_ctx("swin"):
            out = layer.apply(params, x, False,
                              rngs={"dropout": jax.random.PRNGKey(seed)})
        assert np.isfinite(np.asarray(out)).all()
        diffs = np.abs(np.asarray(out) - np.asarray(x)).reshape(8, -1).max(1)
        dropped = diffs < 1e-6
        if dropped.any() and (~dropped).any():
            return
    raise AssertionError("no key produced both dropped and kept samples")
