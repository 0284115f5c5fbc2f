"""One sharded train step for EVERY conf-addressable model family.

The parity tests pin forward math and the engine tests pin the step math on
ViT; this closes the cross product — each registered architecture runs the
full jitted train step (fwd + bwd + optimizer + EMA) over the 8-device CPU
mesh with a sharded batch, params move, and loss/grads are finite.  Families
with BN (efficientnet*) also exercise the mutable batch_stats path under
sharding (sync-BN via the partitioner).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.parallel import mesh as meshlib
from vision_transformers_tpu.train import engine

TINY = {
    "vit": ({"image_size": 32, "window_size": 8, "n_class": 5, "depth": 2,
             "dim": 32, "n_head": 2, "dim_ff": 64, "drop_path": 0.1}, 32),
    "swin_transformer": ({"image_size": [64, 64], "n_class": 5,
                          "depths": [1, 1, 1, 1], "dims": [16, 32, 64, 128],
                          "dim_head": 8, "n_heads": [2, 4, 8, 16],
                          "dim_ffs": [32, 64, 128, 256], "window_size": 2,
                          "drop_path": 0.1}, 64),
    "pvt": ({"image_size": 32, "n_class": 5, "depths": [1, 1, 1, 1],
             "patch_embed_dims": [16, 32, 64, 128], "n_heads": [1, 2, 4, 8],
             "dim_ffs": [32, 64, 128, 256], "reductions": [4, 2, 2, 1],
             "drop_path": 0.1}, 32),
    "halo_transformer": ({"image_size": 64, "n_class": 5, "depths": [1, 1, 1, 1],
                          "dims": [16, 32, 64, 128], "dim_head": 8,
                          "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
                          "window_size": 2, "halo_size": 1}, 64),
    "twins_svt": ({"n_class": 5, "depths": [1, 1, 1, 1],
                   "dims": [16, 32, 64, 128], "dim_head": 8,
                   "n_heads": [2, 4, 8, 16], "dim_ffs": [32, 64, 128, 256],
                   "window_size": 2}, 64),
    "nfnet": ({"n_class": 5, "channels": [16, 32, 64, 64],
               "depths": [1, 1, 1, 1], "groups": [8, 8, 8, 8],
               "stochastic_depth": 0.1, "dropout": 0.1}, 64),
    "efficientnet": ({"width": 0.25, "depth": 0.25, "n_class": 5,
                      "dropout": 0.1}, 64),
    "efficientnetv2": ({"width": 0.25, "depth": 0.25, "n_class": 5,
                        "dropout": 0.1}, 64),
    "nfefficientnet": ({"width": 0.25, "depth": 0.25, "n_class": 5,
                        "drop_path": 0.1}, 64),
    "nfefficientnetv2": ({"width": 0.25, "depth": 0.25, "n_class": 5,
                          "drop_path": 0.1}, 64),
}


@pytest.mark.parametrize("family", sorted(TINY))
def test_family_sharded_train_step(family):
    conf, size = TINY[family]
    model = registry.build("model", {"type": family, **conf}).make()

    rng = np.random.default_rng(7)
    batch = {
        "image": jnp.asarray(rng.normal(size=(16, size, size, 3)).astype(np.float32)),
        "label1": jnp.asarray(rng.integers(0, 5, 16).astype(np.int32)),
        "label2": jnp.asarray(rng.integers(0, 5, 16).astype(np.int32)),
        "ratio": jnp.asarray(rng.uniform(size=16).astype(np.float32)),
    }

    mesh = meshlib.make_mesh()
    tx = optax.adamw(1e-3)
    with mesh:
        state = engine.create_train_state(
            jax.random.PRNGKey(0), model, (2, size, size, 3), tx,
            ema=0.999, ema_bn=True)
        p0 = jax.device_get(state.params)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = jax.jit(engine.make_train_step(model, tx, ema=0.999, n_class=5),
                       donate_argnums=(0,))
        state, metrics = step(state, meshlib.shard_batch(mesh, batch),
                              jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"])), family
        assert np.isfinite(float(metrics["grad_norm"])), family
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))
        )
        assert moved, f"{family}: params did not move"
        if state.batch_stats is not None:  # BN families: stats updated too
            assert state.ema_batch_stats is not None
