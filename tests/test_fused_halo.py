"""Fused Halo attention kernel vs reference einsum math (interpret mode on
CPU; the identical kernel runs compiled on TPU).

Reference semantics: models/halo_transformer.py:57-114 — w² queries per
window attend to (w+2·halo)² neighborhood keys with an additive rel-pos
bias; softmax in f32.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.ops.fused_halo import halo_attention


def ref_halo(q, kv, bias, n_head, scale=None):
    B, M, C = q.shape
    N = kv.shape[1]
    d = C // n_head
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    qh = q.reshape(B, M, n_head, d).transpose(0, 2, 1, 3)
    k = kv[..., :C].reshape(B, N, n_head, d).transpose(0, 2, 1, 3)
    v = kv[..., C:].reshape(B, N, n_head, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhmd,bhnd->bhmn", qh, k).astype(jnp.float32) * scale
    s = s + bias[None]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhmn,bhnd->bhmd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(B, M, C)


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


def test_forward_matches_ref():
    B, M, N, H, D = 6, 16, 36, 3, 8
    q = _rand((B, M, H * D), 0)
    kv = _rand((B, N, 2 * H * D), 1)
    bias = _rand((H, M, N), 2)
    out = halo_attention(q, kv, bias, H, None, True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_halo(q, kv, bias, H)),
                               rtol=2e-4, atol=2e-5)


def test_grads_match_ref():
    B, M, N, H, D = 4, 16, 36, 2, 8
    q = _rand((B, M, H * D), 3)
    kv = _rand((B, N, 2 * H * D), 4)
    bias = _rand((H, M, N), 5) * 0.1
    co = _rand((B, M, H * D), 6)

    gk = jax.grad(lambda *a: (halo_attention(*a, H, None, True) * co).sum(),
                  argnums=(0, 1, 2))(q, kv, bias)
    gr = jax.grad(lambda *a: (ref_halo(*a, H) * co).sum(),
                  argnums=(0, 1, 2))(q, kv, bias)
    for a, b, name in zip(gk, gr, ("dq", "dkv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_halo_attention_module_kernel_matches_einsum():
    """Model-level: the HaloAttention kernel path (window partition + gather
    feeding the fused kernel) is numerically the einsum path."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.halo import HaloAttention

    x = _rand((2, 8, 8, 24), 7)
    attn = HaloAttention(n_head=2, dim_head=8, window_size=4, halo_size=1)
    params = attn.init(jax.random.PRNGKey(0), x)
    # nonzero rel-pos table so the bias path is actually exercised
    params = jax.tree.map(lambda p: p + 0.05 if p.ndim == 2 else p, params)
    try:
        ops.set_attention_impl("einsum")
        ref = attn.apply(params, x)
        g_ref = jax.grad(lambda p: (attn.apply(p, x) ** 2).sum())(params)
        ops.set_attention_impl("fused", interpret=True)
        fused = attn.apply(params, x)
        g_fused = jax.grad(lambda p: (attn.apply(p, x) ** 2).sum())(params)
    finally:
        ops.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves_with_path(g_ref),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=str(pa))
    assert float(jnp.abs(g_fused["params"]["rel_pos"]).sum()) > 0


def ref_halo_map(q, kv, bias, window, halo, n_head, scale=None):
    """Reference math on the [b,H,W,C] layout (einsum-path semantics)."""
    b, H, W, C = q.shape
    k = window + 2 * halo
    hs, ws = H // window, W // window
    from vision_transformers_tpu.models.halo import halo_neighborhoods

    m = window * window
    qw = q.reshape(b, hs, window, ws, window, C)
    qw = qw.transpose(0, 1, 3, 2, 4, 5).reshape(b * hs * ws, m, C)
    nb = halo_neighborhoods(kv, window, halo).reshape(b * hs * ws, k * k, 2 * C)
    out = ref_halo(qw, nb, bias, n_head, scale)
    out = out.reshape(b, hs, ws, window, window, C)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, H, W, C)


def test_direct_forward_matches_ref():
    from vision_transformers_tpu.ops.fused_halo import halo_attention_direct

    b, H, W, HD, D, window, halo = 2, 8, 12, 2, 8, 4, 1
    C = HD * D
    k = window + 2 * halo
    q = _rand((b, H, W, C), 20)
    kv = _rand((b, H, W, 2 * C), 21)
    bias = _rand((HD, window * window, k * k), 22) * 0.2
    out = halo_attention_direct(q, kv, bias, window, halo, HD, None, True)
    ref = ref_halo_map(q, kv, bias, window, halo, HD)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_direct_grads_match_ref():
    from vision_transformers_tpu.ops.fused_halo import halo_attention_direct

    b, H, W, HD, D, window, halo = 2, 8, 8, 2, 8, 4, 1
    C = HD * D
    k = window + 2 * halo
    q = _rand((b, H, W, C), 23)
    kv = _rand((b, H, W, 2 * C), 24)
    bias = _rand((HD, window * window, k * k), 25) * 0.2
    co = _rand((b, H, W, C), 26)

    gk = jax.grad(
        lambda *a: (halo_attention_direct(*a, window, halo, HD, None, True)
                    * co).sum(), argnums=(0, 1, 2))(q, kv, bias)
    gr = jax.grad(
        lambda *a: (ref_halo_map(*a, window, halo, HD) * co).sum(),
        argnums=(0, 1, 2))(q, kv, bias)
    for a, b_, name in zip(gk, gr, ("dq", "dkv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_halo_attention_module_gather_impl_matches_einsum(monkeypatch):
    """The gather+rectangular path stays correct under VTX_HALO_IMPL."""
    from vision_transformers_tpu import ops
    from vision_transformers_tpu.models.halo import HaloAttention

    x = _rand((2, 8, 8, 24), 27)
    attn = HaloAttention(n_head=2, dim_head=8, window_size=4, halo_size=1)
    params = attn.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p + 0.05 if p.ndim == 2 else p, params)
    try:
        ops.set_attention_impl("einsum")
        ref = attn.apply(params, x)
        ops.set_attention_impl("fused", interpret=True)
        monkeypatch.setenv("VTX_HALO_IMPL", "gather")
        gather = attn.apply(params, x)
    finally:
        ops.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(gather), np.asarray(ref),
                               rtol=5e-4, atol=5e-5)


def test_direct_prod_shape_window8_halo2():
    """The production Halo config (window 8, halo 2 → k=12 padded to
    KPAD=16) through the direct kernel, fwd + grads."""
    from vision_transformers_tpu.ops.fused_halo import halo_attention_direct

    b, H, W, HD, D, window, halo = 1, 16, 16, 2, 8, 8, 2
    C = HD * D
    k = window + 2 * halo
    q = _rand((b, H, W, C), 30)
    kv = _rand((b, H, W, 2 * C), 31)
    bias = _rand((HD, window * window, k * k), 32) * 0.2
    co = _rand((b, H, W, C), 33)
    out = halo_attention_direct(q, kv, bias, window, halo, HD, None, True)
    ref = ref_halo_map(q, kv, bias, window, halo, HD)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    gk = jax.grad(
        lambda *a: (halo_attention_direct(*a, window, halo, HD, None, True)
                    * co).sum(), argnums=(0, 1, 2))(q, kv, bias)
    gr = jax.grad(
        lambda *a: (ref_halo_map(*a, window, halo, HD) * co).sum(),
        argnums=(0, 1, 2))(q, kv, bias)
    for a, b_, name in zip(gk, gr, ("dq", "dkv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_halo_impl_honors_global_einsum_force(monkeypatch):
    from vision_transformers_tpu import ops

    monkeypatch.setenv("VTX_ATTN_IMPL", "einsum")
    assert ops.halo_impl(8, 2) == "einsum"
    monkeypatch.delenv("VTX_ATTN_IMPL")
    monkeypatch.setenv("VTX_FUSED_ATTENTION", "0")
    assert ops.halo_impl(8, 2) == "einsum"
    monkeypatch.delenv("VTX_FUSED_ATTENTION")
    # explicit halo override wins over everything
    monkeypatch.setenv("VTX_HALO_IMPL", "direct")
    monkeypatch.setenv("VTX_ATTN_IMPL", "einsum")
    assert ops.halo_impl(8, 2) == "direct"
