"""PVT / Twins-SVT / Halo model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.config import registry


# ---------------------------------------------------------------------------
# PVT
# ---------------------------------------------------------------------------

def test_pvt_sra_reduction1_equals_plain_mhsa():
    from vision_transformers_tpu.models.pvt import SpatialReductionAttention

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)).astype(np.float32))
    attn = SpatialReductionAttention(n_head=4, reduction=1)
    params = attn.init(jax.random.PRNGKey(0), x, 4, 4)
    out, score = attn.apply(params, x, 4, 4)
    assert out.shape == (2, 16, 32)
    assert score.shape == (2, 4, 16, 16)

    # manual: q/k/v from the same params, full softmax attention
    p = params["params"]
    q = np.asarray(x) @ np.asarray(p["linear_q"]["kernel"])
    kv = np.asarray(x) @ np.asarray(p["linear_kv"]["kernel"])
    k, v = np.split(kv, 2, axis=-1)

    def heads(t):
        return t.reshape(2, -1, 4, 8).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(8)
    e = np.exp(s - s.max(-1, keepdims=True))
    a = e / e.sum(-1, keepdims=True)
    o = (a @ vh).transpose(0, 2, 1, 3).reshape(2, 16, 32)
    o = o @ np.asarray(p["linear"]["kernel"]) + np.asarray(p["linear"]["bias"])
    np.testing.assert_allclose(np.asarray(out), o, rtol=1e-4, atol=1e-5)


def test_pvt_sra_reduction_shrinks_kv():
    from vision_transformers_tpu.models.pvt import SpatialReductionAttention

    x = jnp.ones((2, 64, 32))  # 8x8 map
    attn = SpatialReductionAttention(n_head=4, reduction=4)
    params = attn.init(jax.random.PRNGKey(0), x, 8, 8)
    out, score = attn.apply(params, x, 8, 8)
    assert out.shape == (2, 64, 32)
    assert score.shape == (2, 4, 64, 4)  # kv reduced 8x8 -> 2x2


@pytest.fixture(scope="module")
def tiny_pvt():
    cfg = registry.build(
        "model",
        {"type": "pvt", "image_size": 32, "n_class": 10, "depths": [1, 1, 1, 1],
         "patch_embed_dims": [16, 32, 64, 128], "n_heads": [1, 2, 4, 8],
         "dim_ffs": [32, 64, 128, 256], "reductions": [4, 2, 2, 1],
         "drop_path": 0.1},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params


def test_pvt_forward(tiny_pvt):
    model, params = tiny_pvt
    out = model.apply(params, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_pvt_grads(tiny_pvt):
    model, params = tiny_pvt
    g = jax.grad(lambda p: model.apply(p, jnp.ones((2, 32, 32, 3))).sum())(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.isfinite(leaf).all()), path


# ---------------------------------------------------------------------------
# Twins-SVT
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_twins():
    cfg = registry.build(
        "model",
        {"type": "twins_svt", "n_class": 10, "depths": [1, 1, 1, 1],
         "dims": [16, 32, 64, 128], "dim_head": 8, "n_heads": [2, 4, 8, 16],
         "dim_ffs": [32, 64, 128, 256], "window_size": 2, "drop_path": 0.1},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_twins_forward(tiny_twins):
    model, params = tiny_twins
    out = model.apply(params, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_twins_param_structure(tiny_twins):
    """Each layer carries LSA + GSA + two FFs + PEG after first layer."""
    _, params = tiny_twins
    p = params["params"]
    blk = p["block1_0"]
    for sub in ("attn_local", "attn_global", "ff_local", "ff_global",
                "norm_attn_local", "norm_attn_global"):
        assert sub in blk, sorted(blk)
    assert "peg1" in p
    # PEG is depthwise: kernel [3,3,1,dim]
    assert p["peg1"]["proj"]["kernel"].shape == (3, 3, 1, 16)
    # GSA reduce conv uses window_size as stride/kernel
    assert blk["attn_global"]["reduce_conv"]["kernel"].shape[:2] == (2, 2)


def test_twins_grads(tiny_twins):
    model, params = tiny_twins
    g = jax.grad(lambda p: model.apply(p, jnp.ones((1, 64, 64, 3))).sum())(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.isfinite(leaf).all()), path


# ---------------------------------------------------------------------------
# Halo
# ---------------------------------------------------------------------------

def test_halo_patch_extraction_matches_torch_unfold():
    """lax.conv_general_dilated_patches == torch F.unfold (c, ky, kx) ordering."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)  # NCHW
    window, halo = 4, 1
    k = window + 2 * halo

    ours = jax.lax.conv_general_dilated_patches(
        jnp.asarray(x), filter_shape=(k, k), window_strides=(window, window),
        padding=((halo, halo), (halo, halo)),
    )
    theirs = F.unfold(torch.tensor(x), k, stride=window, padding=halo)
    ours_flat = np.asarray(ours).reshape(2, 6 * k * k, -1)
    np.testing.assert_allclose(ours_flat, theirs.numpy(), rtol=1e-5, atol=1e-6)


def test_halo_position_index_range():
    from vision_transformers_tpu.models.halo import halo_position_index

    pos, max_pos = halo_position_index(window=4, halo=1)
    assert pos.shape == (16, 36)
    assert pos.min() >= 0 and pos.max() <= max_pos
    # query attending to its own position hits the table center
    k = 6
    center = (4 + 1 - 1) * k + (4 + 1 - 1)
    # query (0,0) is at padded coord (1,1) → kv index 1*6+1=7
    assert pos[0, 7] == center


@pytest.fixture(scope="module")
def tiny_halo():
    cfg = registry.build(
        "model",
        {"type": "halo_transformer", "image_size": 64, "n_class": 10,
         "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128], "dim_head": 8,
         "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
         "window_size": 2, "halo_size": 1, "drop_path": 0.1},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return model, params


def test_halo_forward(tiny_halo):
    model, params = tiny_halo
    out = model.apply(params, jnp.ones((2, 64, 64, 3)))
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_halo_grads(tiny_halo):
    model, params = tiny_halo
    g = jax.grad(lambda p: model.apply(p, jnp.ones((1, 64, 64, 3))).sum())(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.isfinite(leaf).all()), path


def test_halo_attention_window_isolation():
    """With halo=0 ... halo attention degenerates to per-window attention:
    changing a pixel in one window must not affect other windows' outputs."""
    from vision_transformers_tpu.models.halo import HaloAttention

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    attn = HaloAttention(n_head=2, dim_head=8, window_size=4, halo_size=1)
    params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    base = np.asarray(attn.apply(params, jnp.asarray(x)))

    x2 = x.copy()
    x2[0, 0, 0] += 10.0  # perturb top-left window corner
    out2 = np.asarray(attn.apply(params, jnp.asarray(x2)))
    # bottom-right window is > halo away from the perturbation → unchanged
    np.testing.assert_allclose(base[0, 5:, 5:], out2[0, 5:, 5:], atol=1e-5)
    # top-left window changed
    assert not np.allclose(base[0, :4, :4], out2[0, :4, :4])


def test_halo_neighborhoods_matches_unfold():
    """The tiled-slice gather must produce exactly torch-unfold's values
    (zero borders, row-major (ky,kx) token order) — pinned against
    lax.conv_general_dilated_patches' (c, ky, kx) feature layout."""
    import jax
    import jax.numpy as jnp
    from vision_transformers_tpu.models.halo import halo_neighborhoods

    rng = np.random.default_rng(0)
    for window, halo, H, C in ((8, 2, 16, 6), (4, 1, 8, 4), (8, 3, 16, 2)):
        k = window + 2 * halo
        x = jnp.asarray(rng.normal(size=(2, H, H, C)).astype(np.float32))
        got = halo_neighborhoods(x, window, halo)  # [b, S, k², C]
        ref = jax.lax.conv_general_dilated_patches(
            x.transpose(0, 3, 1, 2), (k, k), (window, window),
            ((halo, halo), (halo, halo)),
        )  # [b, C·k², hs, ws] with feature order (c, ky, kx)
        hs = H // window
        ref = ref.reshape(2, C, k * k, hs * hs).transpose(0, 3, 2, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   err_msg=f"w={window} h={halo}")


# ---------------------------------------------------------------------------
# reduced-kv (rectangular-score) fused-attention path: PVT SRA / Twins GSA
# ---------------------------------------------------------------------------

def test_pvt_sra_fused_path_matches_einsum(tiny_pvt):
    """VTX_SRA_IMPL=fused routes SRA through ops/fused_attention (M≠N) —
    value- and grad-parity vs the einsum default (interpret mode on CPU)."""
    from vision_transformers_tpu import ops

    model, params = tiny_pvt
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    ref = model.apply(params, x)
    gref = jax.grad(lambda p: model.apply(p, x).sum())(params)
    ops.set_attention_impl("fused", interpret=True)
    try:
        out = model.apply(params, x)
        g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    finally:
        ops.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(gref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]), rtol=5e-4,
            atol=5e-4, err_msg=jax.tree_util.keystr(path))


def test_twins_gsa_fused_path_matches_einsum(tiny_twins):
    from vision_transformers_tpu import ops

    model, params = tiny_twins
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    ref = model.apply(params, x)
    gref = jax.grad(lambda p: model.apply(p, x).sum())(params)
    ops.set_attention_impl("fused", interpret=True)
    try:
        out = model.apply(params, x)
        g = jax.grad(lambda p: model.apply(p, x).sum())(params)
    finally:
        ops.set_attention_impl(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(gref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_ref[path]), rtol=5e-4,
            atol=5e-4, err_msg=jax.tree_util.keystr(path))


def test_twins_lsa_layer1_force_maps_to_layer_kernel(tiny_twins):
    """A global layer1 force (or the forward_only upgrade) must keep Twins
    LSA on the fused attention-half kernel, not silently downgrade it to
    einsum — the LSA window partition sits between the residual branches so
    the one-call-per-layer kernel cannot apply (models/twins.py)."""
    from vision_transformers_tpu import ops

    model, params = tiny_twins
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    base = model.apply(params, x)
    for impl in ("layer", "layer1"):
        ops.set_attention_impl(impl, interpret=True)
        try:
            jaxpr = str(jax.make_jaxpr(
                lambda p, xx: model.apply(p, xx))(params, x))
            out = model.apply(params, x)
        finally:
            ops.set_attention_impl(None)
        assert "pallas_call" in jaxpr, f"{impl}: LSA fell back to einsum"
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=5e-4, atol=5e-5)
