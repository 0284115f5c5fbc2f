"""Fused layer-half kernels (ops/fused_layer.py) vs the unfused composition
— fwd + all grads (incl. LN params and the DropPath row-scale), interpret
mode on CPU.

Layer structure per the reference pre-LN blocks (models/vit.py:48-66,
models/swin_transformer.py:163-197).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.ops.fused_layer import (fused_attention_layer,
                                                     fused_ff_layer)


def ln(x, g, b, eps=1e-6):
    """flax LayerNorm numerics: f32 stats, fast variance, scale in rsqrt."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = (xf * xf).mean(-1, keepdims=True) - mu * mu
    mul = jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
    return ((xf - mu) * mul + b.astype(jnp.float32)).astype(x.dtype)


def ref_attn_layer(x, g, b, wqkv, bqkv, wout, bout, n_head, extra, rs, scale):
    B, N, C = x.shape
    HD = wqkv.shape[1] // 3
    D = HD // n_head
    u = ln(x, g, b)
    qkv = (u @ wqkv + bqkv).reshape(B, N, 3, n_head, D)
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
    a = o @ wout + bout
    if rs is not None:
        a = a * rs[:, None, None].astype(x.dtype)
    return x + a


def ref_ff_layer(x, g, b, w1, b1, w2, b2, rs, act):
    u = ln(x, g, b)
    h = u @ w1 + b1
    if act == "silu":
        h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    else:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    out = h @ w2 + b2
    if rs is not None:
        out = out * rs[:, None, None].astype(x.dtype)
    return x + out


def _grad_check(loss_f, loss_r, args, names, tol=1e-4):
    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(names, gf, gr):
        if a is None:
            continue
        ref_scale = max(float(np.abs(np.asarray(b)).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a) / ref_scale, np.asarray(b) / ref_scale,
            atol=tol, rtol=tol, err_msg=name)


@pytest.mark.parametrize("B,N,C,H,D,groups,use_rs", [
    (4, 197, 384, 6, 64, 0, False),   # ViT-S shape
    (4, 197, 384, 6, 64, 0, True),    # with DropPath row scale
    (8, 98, 96, 3, 32, 4, True),      # Swin stage-1 window pairs
])
def test_attn_layer_matches_composition(B, N, C, H, D, groups, use_rs):
    rng = np.random.default_rng(3)
    HD = H * D
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, jnp.float32)
    bqkv = jnp.asarray(rng.normal(size=3 * HD) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, jnp.float32)
    bout = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    extra = None if groups == 0 else \
        jnp.asarray(rng.normal(size=(groups, H, N, N)), jnp.float32)
    rs = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) if use_rs else None
    scale = 1.0 / np.sqrt(D)

    out_f = fused_attention_layer(x, g, b, wqkv, bqkv, wout, bout, H,
                                  extra, rs, scale, interpret=True)
    out_r = ref_attn_layer(x, g, b, wqkv, bqkv, wout, bout, H, extra, rs, scale)
    np.testing.assert_allclose(out_f, out_r, atol=3e-5, rtol=3e-5)

    args = (x, g, b, wqkv, bqkv, wout, bout, extra, rs)

    def loss_f(a):
        return jnp.sum(fused_attention_layer(
            *a[:7], H, a[7], a[8], scale, interpret=True) ** 2)

    def loss_r(a):
        return jnp.sum(ref_attn_layer(*a[:7], H, a[7], a[8], scale) ** 2)

    _grad_check(loss_f, loss_r, args,
                ["dx", "dg", "db", "dwqkv", "dbqkv", "dwout", "dbout",
                 "dextra", "drs"])


@pytest.mark.parametrize("B,N,C,F,act,use_rs", [
    (4, 197, 384, 1536, "silu", False),
    (4, 197, 384, 1536, "silu", True),
    (2, 98, 96, 384, "gelu", True),
])
def test_ff_layer_matches_composition(B, N, C, F, act, use_rs):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.normal(size=C), jnp.float32)
    b = jnp.asarray(0.1 * rng.normal(size=C), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=C) * 0.1, jnp.float32)
    rs = jnp.asarray(rng.choice([0.0, 1.25], size=B), jnp.float32) if use_rs else None

    out_f = fused_ff_layer(x, g, b, w1, b1, w2, b2, act, rs, interpret=True)
    out_r = ref_ff_layer(x, g, b, w1, b1, w2, b2, rs, act)
    np.testing.assert_allclose(out_f, out_r, atol=3e-5, rtol=3e-5)

    args = (x, g, b, w1, b1, w2, b2, rs)

    def loss_f(a):
        return jnp.sum(fused_ff_layer(
            *a[:7], act, a[7], interpret=True) ** 2)

    def loss_r(a):
        return jnp.sum(ref_ff_layer(*a, act) ** 2)

    _grad_check(loss_f, loss_r, args,
                ["dx", "dg", "db", "dw1", "db1", "dw2", "db2", "drs"])


def _impl_ctx(impl, ff_kernel=None):
    from vision_transformers_tpu import ops

    class _C:
        def __enter__(self):
            ops.set_attention_impl(impl, interpret=True)
            ops.set_ff_kernel(ff_kernel)

        def __exit__(self, *a):
            ops.set_attention_impl(None)
            ops.set_ff_kernel(None)

    return _C()


def test_vit_layer_impl_matches_einsum():
    """Full ViT forward + grads identical under the fused layer kernels."""
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
    for ff_on in (False, True):
        with _impl_ctx("layer", ff_kernel=ff_on):
            out = model.apply(params, x)
            g = jax.grad(lambda p: model.apply(p, x).sum())(params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-5, err_msg=f"ff={ff_on}")
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g),
            jax.tree_util.tree_leaves_with_path(g_ref),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"ff={ff_on} {pa}")


def test_swin_layer_impl_matches_einsum():
    """SwinLayer (attn + FF residual branches) under the fused layer kernels
    vs einsum — packed windows, both shifts, grads."""
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
        for ff_on in (False, True):
            with _impl_ctx("layer", ff_kernel=ff_on):
                out = layer.apply(params, x)
                g = jax.grad(lambda p: layer.apply(p, x).sum())(params)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=5e-4, atol=5e-5,
                                       err_msg=f"shift={shift} ff={ff_on}")
            for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g),
                jax.tree_util.tree_leaves_with_path(g_ref),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                    err_msg=f"shift={shift} ff={ff_on} {pa}")


def test_layer_impl_droppath_row_scale_statistics():
    """With drop_path active the layer path must apply the same per-sample
    mask/keep scaling as drop_path (deterministic given the same rng):
    each row is either 0 or 1/keep times the deterministic branch delta."""
    from vision_transformers_tpu.models.swin import SwinLayer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 16)).astype(np.float32))
    layer = SwinLayer(n_head=2, dim_head=8, dim_ff=32, input_size=(8, 8),
                      window_size=4, shift=False, drop_path=0.5)
    params = layer.init(jax.random.PRNGKey(0), x)
    with _impl_ctx("layer"):
        out_det = layer.apply(params, x, deterministic=True)
        out_dp = layer.apply(params, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(7)})
    # each sample's attn-branch delta is 0 or scaled by 1/keep — so the
    # output equals x plus a per-sample multiple of the deterministic delta
    # composed over the two branches.  Check each sample is NOT all equal to
    # det (some dropped) and that dropped samples pass x through exactly.
    det = np.asarray(out_det)
    dp_ = np.asarray(out_dp)
    xs = np.asarray(x)
    per_sample_same_as_x = np.all(np.isclose(dp_, xs, atol=1e-6),
                                  axis=(1, 2, 3))
    assert per_sample_same_as_x.any(), "expected some fully-dropped samples"
    assert not per_sample_same_as_x.all(), "expected some kept samples"
    assert not np.allclose(dp_, det)


def test_twins_layer_impl_matches_einsum():
    """TwinsLayer's LSA branch under the fused layer kernel vs einsum —
    packed window pairs with the block-diagonal mask, grads."""
    from vision_transformers_tpu.models.twins import TwinsLayer

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    layer = TwinsLayer(n_head=2, dim_head=8, dim_ff=32, window_size=4)
    params = layer.init(jax.random.PRNGKey(0), x)
    with _impl_ctx("einsum"):
        ref = layer.apply(params, x)
        g_ref = jax.grad(lambda p: layer.apply(p, x).sum())(params)
    with _impl_ctx("layer"):
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


def test_bc_env_override_rounds_to_divisor(monkeypatch):
    """A VTX_FL_BC that doesn't divide the batch must not silently skip tail
    rows (grid = B // bc): the override rounds down to a divisor of B."""
    from vision_transformers_tpu.ops.fused_attention import _env_bc

    assert _env_bc("8", 24) == 8
    assert _env_bc("7", 24) == 6   # 7 ∤ 24 -> 6
    assert _env_bc("5", 24) == 4
    assert _env_bc("100", 24) == 24  # capped at B
    assert _env_bc("1", 24) == 1


def test_ff_kernel_eval_with_drop_ff_conf(monkeypatch):
    """A conf with drop_ff > 0 must still evaluate through the fused FF
    kernel: dropout is a no-op at eval, so the guard may not reject it
    (round-2 advice item 3)."""
    import jax
    import jax.numpy as jnp

    from vision_transformers_tpu import ops
    from vision_transformers_tpu.config import registry

    cfg = registry.build("model", {
        "type": "vit", "image_size": 32, "window_size": 4, "n_class": 5,
        "depth": 1, "dim": 32, "n_head": 2, "dim_ff": 64, "drop_ff": 0.1,
    })
    model = cfg.make()
    x = jnp.ones((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ops.set_attention_impl("layer", interpret=True)
    ops.set_ff_kernel(True)
    try:
        out = model.apply({"params": params}, x, deterministic=True)
        assert out.shape == (2, 5)
        assert bool(jnp.isfinite(out).all())
    finally:
        ops.set_attention_impl(None)
        ops.set_ff_kernel(None)


def test_xla_backward_matches_pallas_backward():
    """Round 3: the fused attention layer can differentiate through a jnp
    reference (VTX_FL_BWD=xla — an A/B switch; the Pallas kernel stays the
    measured default) — its grads must match the hand-written Pallas
    backward kernel."""
    import numpy as np

    from vision_transformers_tpu.ops import fused_layer as FL

    B, N, C, H, D = 4, 12, 16, 2, 8
    HD = H * D
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=C).astype(np.float32))
    b = jnp.asarray(rng.normal(size=C).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.normal(size=3 * HD).astype(np.float32) * 0.1)
    wout = jnp.asarray(rng.normal(size=(HD, C)).astype(np.float32) * 0.1)
    bout = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    extra = jnp.asarray(rng.normal(size=(2, H, N, N)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.5, 1.5, B).astype(np.float32))
    scale = 1.0 / np.sqrt(D)
    do = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    res = (x, g, b, wqkv, bqkv, wout, bout, extra, rs)
    out_xla = FL._attn_layer_bwd_xla(H, scale, 1e-6, res, do)
    out_pl = FL._attn_layer_bwd(H, scale, 1e-6, True, res, do)
    names = ("dx", "dg", "db", "dwqkv", "dbqkv", "dwout", "dbout",
             "dextra", "drs")
    for name, a, bb in zip(names, out_xla, out_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4, err_msg=name)

    # the fwd output the xla bwd differentiates matches the kernel fwd
    ref = FL._attn_layer_ref(x, g, b, wqkv, bqkv, wout, bout, extra, rs,
                             H, scale, 1e-6)
    ker = FL.fused_attention_layer(x, g, b, wqkv, bqkv, wout, bout, H,
                                   extra, rs, scale, 1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ker),
                               rtol=2e-5, atol=2e-5)


def test_save_modes_identical_grads(monkeypatch):
    """VTX_FL_SAVE none/acc/qkv must produce identical outputs and grads —
    the acc+qkv backward branch only auto-activates at C ≥ 256, so force
    each mode explicitly here."""
    import numpy as np

    from vision_transformers_tpu.ops import fused_layer as FL

    B, N, C, H, D = 4, 12, 16, 2, 8
    HD = H * D
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=C).astype(np.float32))
    b = jnp.asarray(rng.normal(size=C).astype(np.float32))
    wqkv = jnp.asarray(rng.normal(size=(C, 3 * HD)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.normal(size=3 * HD).astype(np.float32) * 0.1)
    wout = jnp.asarray(rng.normal(size=(HD, C)).astype(np.float32) * 0.1)
    bout = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    extra = jnp.asarray(rng.normal(size=(H, N, N)).astype(np.float32))
    rs = jnp.asarray(rng.uniform(0.5, 1.5, B).astype(np.float32))

    def loss(args):
        out = FL.fused_attention_layer(*args, H, extra, rs, None, 1e-6, True)
        return (out ** 2).sum()

    args = (x, g, b, wqkv, bqkv, wout, bout)
    results = {}
    for mode in ("none", "acc", "qkv"):
        monkeypatch.setenv("VTX_FL_SAVE", mode)
        results[mode] = (loss(args), jax.grad(loss)(args))
    for mode in ("acc", "qkv"):
        np.testing.assert_allclose(np.asarray(results[mode][0]),
                                   np.asarray(results["none"][0]),
                                   rtol=1e-6, err_msg=mode)
        for a, ref in zip(results[mode][1], results["none"][1]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)
