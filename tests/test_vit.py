"""ViT / DINO model tests: shapes, pos-embed interpolation, multi-crop grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.config import registry


@pytest.fixture(scope="module")
def tiny_vit():
    cfg = registry.build(
        "model",
        {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
         "depth": 2, "dim": 64, "n_head": 2, "dim_ff": 128},
    )
    model = cfg.make()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return model, params


def test_vit_forward_shape(tiny_vit):
    model, params = tiny_vit
    out = model.apply(params, jnp.ones((3, 32, 32, 3)))
    assert out.shape == (3, 10)
    assert out.dtype == jnp.float32


def test_vit_resolution_change_uses_interpolated_pos_embed(tiny_vit):
    """Bicubic pos-embed resize (reference models/vit.py:153-175)."""
    model, params = tiny_vit
    out = model.apply(params, jnp.ones((2, 48, 48, 3)))  # 6x6 patches vs 4x4 trained
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())


def test_vit_jit_and_grad(tiny_vit):
    model, params = tiny_vit

    @jax.jit
    def loss_fn(p, x):
        return model.apply(p, x).sum()

    g = jax.grad(loss_fn)(params, jnp.ones((2, 32, 32, 3)))
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # every param receives gradient
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_dropout_and_droppath_rngs():
    cfg = registry.build(
        "model",
        {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
         "depth": 2, "dim": 64, "n_head": 2, "dim_ff": 128,
         "dropout": 0.5, "drop_path": 0.5},
    )
    model = cfg.make()
    x = jnp.ones((4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    c = model.apply(params, x, deterministic=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    d = model.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


def test_multicrop_grouping_matches_individual_forwards():
    """Grouped multi-crop forward == per-crop forwards (reference vit.py:177-203)."""
    cfg = registry.build(
        "model",
        {"type": "dino", "image_size": 32, "window_size": 8, "depth": 2, "dim": 64,
         "n_head": 2, "dim_ff": 128, "dim_head_out": 128},
    )
    model = cfg.make()
    rng = np.random.default_rng(0)
    g1 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    g2 = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    l1 = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), [g1, g2, l1])

    grouped = model.apply(params, [g1, g2, l1])
    singles = jnp.concatenate(
        [model.apply(params, [c]) for c in (g1, g2, l1)], axis=0
    )
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(singles), rtol=2e-4, atol=1e-5)


def test_dino_head_weight_norm_is_unit_norm():
    """Weight-normed last layer with frozen gain (reference models/vit.py:244-248)."""
    from vision_transformers_tpu.models.vit import DINOHead

    head = DINOHead(out_dim=32, dim_bottleneck=16, dim_ff=24)
    x = jnp.ones((2, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 32)
    # logits bounded by 1 since inputs are L2-normalized and weights unit-norm
    assert float(jnp.abs(out).max()) <= 1.0 + 1e-5


def test_model_level_crop_packing_exact():
    """VTX_PACK_MODEL packs short crops 4-to-a-row for the whole stack with
    a block-diagonal mask; features must be bit-comparable to the unpacked
    forward (same params, deterministic)."""
    import os

    from vision_transformers_tpu.models.vit import VisionTransformer

    model = VisionTransformer(image_size=(48, 48), patch_size=8, depth=2,
                              dim=32, n_head=2, dim_ff=64, n_class=None)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 48, 48, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    assert os.environ.get("VTX_PACK_MODEL", "1") != "0"
    packed = model.apply(params, x)            # 37 tokens → packs 2×37=74
    os.environ["VTX_PACK_MODEL"] = "0"
    try:
        unpacked = model.apply(params, x)
    finally:
        del os.environ["VTX_PACK_MODEL"]
    np.testing.assert_allclose(np.asarray(packed), np.asarray(unpacked),
                               rtol=2e-5, atol=2e-6)


def test_model_level_crop_packing_drop_path_runs():
    """Non-deterministic packed forward: token-level DropPath scales (one
    independent draw per packed crop) produce finite outputs and grads."""
    from vision_transformers_tpu.models.vit import VisionTransformer

    model = VisionTransformer(image_size=(48, 48), patch_size=8, depth=2,
                              dim=32, n_head=2, dim_ff=64, n_class=None,
                              drop_path=0.5)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(8, 48, 48, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = model.apply(p, x, False,
                          rngs={"dropout": jax.random.PRNGKey(3)})
        return (out ** 2).sum()

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
