"""Rematerialization (`arch.remat`): per-layer jax.checkpoint.

A TPU-native memory lever with no reference counterpart: block activations
are recomputed in the backward instead of saved, trading one extra forward
of FLOPs per layer for O(depth) less HBM — the standard way to raise the
per-chip batch when activations, not params, bound memory.  remat must be
EXACTLY transparent: same param tree, same logits, same gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_transformers_tpu.config import registry

VIT = {"type": "vit", "image_size": 32, "window_size": 8, "n_class": 10,
       "depth": 2, "dim": 64, "n_head": 2, "dim_ff": 128}
SWIN = {"type": "swin_transformer", "image_size": [64, 64], "n_class": 10,
        "depths": [1, 1, 1, 1], "dims": [8, 16, 32, 64], "dim_head": 4,
        "n_heads": [2, 4, 8, 16], "dim_ffs": [16, 32, 64, 128],
        "window_size": 2}
DINO = {"type": "dino", "image_size": 32, "window_size": 8, "depth": 2,
        "dim": 64, "n_head": 2, "dim_ff": 128, "dim_head_out": 64,
        "use_bn": False, "norm_last_layer": False, "depth_head": 2,
        "dim_head_ff": 48, "dim_head_bottleneck": 16}
PVT = {"type": "pvt", "image_size": 32, "n_class": 10, "depths": [1, 1, 1, 1],
       "patch_embed_dims": [16, 32, 64, 128], "n_heads": [1, 2, 4, 8],
       "dim_ffs": [32, 64, 128, 256], "reductions": [4, 2, 2, 1]}
TWINS = {"type": "twins_svt", "n_class": 10, "depths": [1, 1, 1, 1],
         "dims": [16, 32, 64, 128], "dim_head": 8, "n_heads": [2, 4, 8, 16],
         "dim_ffs": [32, 64, 128, 256], "window_size": 2}
HALO = {"type": "halo_transformer", "image_size": 64, "n_class": 10,
        "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128], "dim_head": 8,
        "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
        "window_size": 2, "halo_size": 1}
NFNET = {"type": "nfnet", "n_class": 10, "channels": [16, 32, 64, 64],
         "depths": [1, 1, 1, 1], "groups": [8, 8, 8, 8], "image_size": 32}
NFEFF = {"type": "nfefficientnetv2", "width": 0.25, "depth": 0.25,
         "n_class": 10, "image_size": 32}


@pytest.mark.parametrize(
    "cfg", [VIT, SWIN, DINO, PVT, TWINS, HALO, NFNET, NFEFF],
    ids=["vit", "swin", "dino", "pvt", "twins", "halo", "nfnet", "nfeff"])
def test_remat_is_transparent(cfg):
    rng = jax.random.PRNGKey(0)
    cfg = dict(cfg)
    size = cfg.get("image_size", 64)  # twins takes any input size
    size = size[0] if isinstance(size, list) else size
    if cfg["type"] in ("nfnet", "nfefficientnetv2"):  # size-agnostic configs
        cfg.pop("image_size")
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, size, size, 3))

    base = registry.build("model", cfg).make()
    rem = registry.build("model", {**cfg, "remat": True}).make()
    variables = base.init(rng, x)

    # identical param structure: remat-wrapped layers keep their names
    chex_paths = lambda m: jax.tree_util.tree_structure(m.init(rng, x)["params"])
    assert chex_paths(base) == chex_paths(rem)

    def loss(model):
        def f(params):
            out = model.apply({"params": params}, x)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    out_b = base.apply(variables, x)
    out_r = rem.apply(variables, x)
    # checkpoint boundaries change XLA fusion groupings, so the same math
    # can differ in the last ulp (observed on the WSConv standardization
    # chains); anything beyond that is a real transparency break
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r),
                               rtol=1e-5, atol=5e-7)

    g_b = jax.jit(jax.grad(loss(base)))(variables["params"])
    g_r = jax.jit(jax.grad(loss(rem)))(variables["params"])
    for (pb, lb), (pr, lr) in zip(
        jax.tree_util.tree_leaves_with_path(g_b),
        jax.tree_util.tree_leaves_with_path(g_r),
    ):
        assert pb == pr
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(lr), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pb))


def test_remat_transparent_with_batchnorm():
    """EfficientNet(V2) remat: flax's lifted checkpoint must also replay the
    BN batch-stat updates identically — logits, grads, AND new running stats
    match the un-remat'd model."""
    cfg = {"type": "efficientnetv2", "width": 0.25, "depth": 0.25,
           "n_class": 10, "dropout": 0.0, "drop_path": 0.0}
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 32, 3))

    base = registry.build("model", cfg).make()
    rem = registry.build("model", {**cfg, "remat": True}).make()
    variables = base.init(rng, x)
    params, stats = variables["params"], variables["batch_stats"]

    def run(model):
        def f(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": stats}, x,
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 2)})
            return jnp.sum(out.astype(jnp.float32) ** 2), upd["batch_stats"]
        (loss, new_stats), grads = jax.jit(
            jax.value_and_grad(f, has_aux=True))(params)
        return loss, new_stats, grads

    loss_b, stats_b, g_b = run(base)
    loss_r, stats_r, g_r = run(rem)
    np.testing.assert_allclose(float(loss_b), float(loss_r), rtol=1e-6)
    for tree_b, tree_r, tag in ((stats_b, stats_r, "bn"), (g_b, g_r, "grad")):
        for (pb, lb), (pr, lr) in zip(
            jax.tree_util.tree_leaves_with_path(tree_b),
            jax.tree_util.tree_leaves_with_path(tree_r),
        ):
            assert pb == pr
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(lr), rtol=1e-6, atol=1e-7,
                err_msg=f"{tag} {jax.tree_util.keystr(pb)}")


@pytest.mark.parametrize("extra", [
    {**VIT, "dropout": 0.1, "drop_path": 0.2},
    {**SWIN, "drop_ff": 0.1, "drop_path": 0.2},
], ids=["vit", "swin"])
def test_remat_transparent_in_training_mode(extra):
    """The configuration arch.remat exists for — deterministic=False with
    live dropout/drop-path — must also be transparent: the rng draws inside
    remat'ed layers replay identically through jax.checkpoint."""
    rng = jax.random.PRNGKey(3)
    size = extra.get("image_size", 64)
    size = size[0] if isinstance(size, list) else size
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, size, size, 3))

    base = registry.build("model", extra).make()
    rem = registry.build("model", {**extra, "remat": True}).make()
    variables = base.init(rng, x)

    def loss(model):
        def f(params):
            out = model.apply(
                {"params": params}, x, deterministic=False,
                rngs={"dropout": jax.random.fold_in(rng, 2)})
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g_b = jax.jit(jax.grad(loss(base)))(variables["params"])
    g_r = jax.jit(jax.grad(loss(rem)))(variables["params"])
    for (pb, lb), (pr, lr) in zip(
        jax.tree_util.tree_leaves_with_path(g_b),
        jax.tree_util.tree_leaves_with_path(g_r),
    ):
        assert pb == pr
        np.testing.assert_allclose(
            np.asarray(lb), np.asarray(lr), rtol=1e-5, atol=5e-7,
            err_msg=jax.tree_util.keystr(pb))
