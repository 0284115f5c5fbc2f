"""Whole-layer fused kernel (ops/fused_layer1.py — attention + FF residual
branches in ONE Pallas program) vs the unfused composition — fwd + all grads
(LN params of both halves, both weight sets, extra, both DropPath row
scales), interpret mode on CPU.

Layer structure per the reference pre-LN blocks (models/vit.py:48-66,
models/swin_transformer.py:163-197).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.fused_layer1 import fused_transformer_layer

from test_fused_layer import _impl_ctx, ref_attn_layer, ref_ff_layer


def ref_layer(x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, bf1, w2, bf2,
              n_head, extra, rs1, rs2, scale, act="silu"):
    z = ref_attn_layer(x, g1, b1, wqkv, bqkv, wout, bout, n_head, extra,
                       rs1, scale)
    return ref_ff_layer(z, g2, b2, w1, bf1, w2, bf2, rs2, act)


def _make_args(B, N, C, H, D, F, groups, use_rs, seed=11):
    rng = np.random.default_rng(seed)
    HD = H * D
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
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
    extra = None if groups == 0 else \
        jnp.asarray(rng.normal(size=(groups, H, N, N)), jnp.float32)
    rs1 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    rs2 = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) \
        if use_rs else None
    return (x, g1, b1, wqkv, bqkv, wout, bout, g2, b2, w1, bf1, w2, bf2,
            extra, rs1, rs2)


NAMES = ["dx", "dg1", "db1", "dwqkv", "dbqkv", "dwout", "dbout", "dg2",
         "db2", "dw1", "dbf1", "dw2", "dbf2", "dextra", "drs1", "drs2"]


@pytest.mark.parametrize("B,N,C,H,D,F,groups,use_rs,act", [
    (4, 197, 384, 6, 64, 1536, 0, False, "silu"),   # ViT-S shape
    (4, 197, 384, 6, 64, 1536, 0, True, "silu"),    # with DropPath scales
    (8, 98, 96, 3, 32, 384, 4, True, "silu"),       # Swin stage-1 pairs
    (4, 37, 48, 2, 24, 96, 0, True, "gelu"),        # small/gelu/odd N
])
def test_layer1_matches_composition(B, N, C, H, D, F, groups, use_rs, act):
    args = _make_args(B, N, C, H, D, F, groups, use_rs)
    scale = 1.0 / np.sqrt(D)

    out_f = fused_transformer_layer(*args[:13], H, args[13], args[14],
                                    args[15], act, scale, interpret=True)
    out_r = ref_layer(*args[:13], H, args[13], args[14], args[15], scale, act)
    np.testing.assert_allclose(out_f, out_r, atol=5e-5, rtol=5e-5)

    def loss_f(a):
        return jnp.sum(fused_transformer_layer(
            *a[:13], H, a[13], a[14], a[15], act, scale,
            interpret=True) ** 2)

    def loss_r(a):
        return jnp.sum(ref_layer(*a[:13], H, a[13], a[14], a[15],
                                 scale, act) ** 2)

    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(NAMES, gf, gr):
        if a is None:
            continue
        ref_scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / ref_scale, np.asarray(b) / ref_scale,
            atol=2e-4, rtol=2e-4, err_msg=name)


def test_layer1_save_modes_identical_grads(monkeypatch):
    """VTX_L1_SAVE acc/qkv must produce identical outputs and grads (the
    backward kernel always needs z+acc, so 'none' maps to z+acc there)."""
    args = _make_args(4, 12, 16, 2, 8, 32, 2, True, seed=13)
    scale = 1.0 / np.sqrt(8)

    def loss(a):
        return jnp.sum(fused_transformer_layer(
            *a[:13], 2, a[13], a[14], a[15], "silu", scale,
            interpret=True) ** 2)

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


def test_layer1_only_one_rs_branch():
    """rs_attn present with rs_ff absent (and vice versa) — cotangents flow
    to the present branch only."""
    args = _make_args(4, 12, 16, 2, 8, 32, 0, True, seed=17)
    scale = 1.0 / np.sqrt(8)
    for rs1, rs2 in ((args[14], None), (None, args[15])):
        out_f = fused_transformer_layer(*args[:13], 2, None, rs1, rs2,
                                        "silu", scale, interpret=True)
        out_r = ref_layer(*args[:13], 2, None, rs1, rs2, scale)
        np.testing.assert_allclose(out_f, out_r, atol=5e-5, rtol=5e-5)
        which = 0 if rs1 is not None else 1

        def loss_f(rs):
            a, f = (rs, None) if which == 0 else (None, rs)
            return jnp.sum(fused_transformer_layer(
                *args[:13], 2, None, a, f, "silu", scale,
                interpret=True) ** 2)

        def loss_r(rs):
            a, f = (rs, None) if which == 0 else (None, rs)
            return jnp.sum(ref_layer(*args[:13], 2, None, a, f, scale) ** 2)

        rs = rs1 if which == 0 else rs2
        np.testing.assert_allclose(np.asarray(jax.grad(loss_f)(rs)),
                                   np.asarray(jax.grad(loss_r)(rs)),
                                   rtol=2e-4, atol=2e-4)


def test_vit_layer1_impl_matches_einsum():
    """Full ViT forward + grads identical under the whole-layer kernel."""
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
    with _impl_ctx("layer1"):
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


def test_swin_layer1_impl_matches_einsum():
    """SwinLayer under the whole-layer kernel vs einsum — packed windows,
    both shifts, grads."""
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
        with _impl_ctx("layer1"):
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


def test_layer1_droppath_row_scale_statistics():
    """With drop_path active the layer1 path must apply per-sample mask/keep
    scaling per BRANCH: fully-dropped samples pass x through exactly."""
    from vision_transformers_tpu.models.swin import SwinLayer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)).astype(np.float32))
    layer = SwinLayer(n_head=2, dim_head=8, dim_ff=32, input_size=(8, 8),
                      window_size=4, shift=False, drop_path=0.5)
    params = layer.init(jax.random.PRNGKey(0), x)
    with _impl_ctx("layer1"):
        out_det = layer.apply(params, x, deterministic=True)
        out_dp = layer.apply(params, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(7)})
    det = np.asarray(out_det)
    dp_ = np.asarray(out_dp)
    xs = np.asarray(x)
    per_sample_same_as_x = np.all(np.isclose(dp_, xs, atol=1e-6),
                                  axis=(1, 2, 3))
    assert per_sample_same_as_x.any(), "expected some fully-dropped samples"
    assert not per_sample_same_as_x.all(), "expected some kept samples"
    assert not np.allclose(dp_, det)


def test_layer1_droppath_matches_layer_impl():
    """Same rng ⇒ the layer1 path and the two-call layer path draw identical
    DropPath masks (attention branch first, FF branch second) — outputs must
    be bit-comparable."""
    from vision_transformers_tpu.models.swin import SwinLayer

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    layer = SwinLayer(n_head=2, dim_head=8, dim_ff=32, input_size=(8, 8),
                      window_size=4, shift=True, drop_path=0.5)
    params = layer.init(jax.random.PRNGKey(0), x)
    outs = {}
    for impl in ("layer", "layer1"):
        with _impl_ctx(impl):
            outs[impl] = layer.apply(
                params, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(np.asarray(outs["layer1"]),
                               np.asarray(outs["layer"]),
                               rtol=5e-4, atol=5e-5)


def test_forward_only_upgrades_layer_to_layer1(monkeypatch):
    """ops.forward_only() upgrades the 'layer' site default to 'layer1'
    (fwd-only stack A/B, PERF.md round 4) — but never overrides an explicit
    force, an einsum default, or the short-sequence einsum fallback."""
    from vision_transformers_tpu import ops

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert ops.attention_impl(256, 197, default="layer") == "layer"
    with ops.forward_only():
        assert ops.attention_impl(256, 197, default="layer") == "layer1"
        # below the measured 128-row gate the short forward keeps layer
        # (eval at 64 rows/chip measured -4.5% for layer1)
        assert ops.attention_impl(64, 197, default="layer") == "layer"
        # einsum defaults (short crops, reduced-kv sites) stay einsum
        assert ops.attention_impl(256, 37, default="einsum") == "einsum"
        # tiny batches still take the VMEM-resident einsum path
        assert ops.attention_impl(8, 197, default="layer") == "einsum"
        # an explicit force wins
        ops.set_attention_impl("layer")
        try:
            assert ops.attention_impl(256, 197, default="layer") == "layer"
        finally:
            ops.set_attention_impl(None)
    # context restored
    assert ops.attention_impl(256, 197, default="layer") == "layer"


def test_dino_teacher_forward_only_parity():
    """The teacher forward under ops.forward_only() (layer1 dispatch) is
    numerically the layer-path teacher forward — interpret-mode kernels on
    CPU, through the real ViT multi-crop apply (train/dino.py:90-97)."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.vit import DINOConfig

    model = DINOConfig(
        image_size=32, window_size=8, dim=32, depth=2, n_head=2,
        dim_ff=64, dim_head_out=24, dim_head_ff=32,
        dim_head_bottleneck=16).make()
    rng = np.random.default_rng(3)
    crops = [jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
             for _ in range(2)]
    params = model.init(jax.random.PRNGKey(0), crops, deterministic=True)
    outs = {}
    for impl in ("layer", "layer1"):
        with _impl_ctx(impl):
            with ops.forward_only():
                outs[impl] = model.apply(params, crops, deterministic=True)
    np.testing.assert_allclose(np.asarray(outs["layer1"]),
                               np.asarray(outs["layer"]),
                               rtol=5e-4, atol=5e-5)
