"""Per-replica BatchNorm statistics (models/efficientnet.py::GroupedBatchNorm)
— the reference's non-SyncBN DDP semantics (/root/reference/train.py:102-107
wraps with plain DDP; each GPU normalizes with its own batch slice's stats,
models/efficientnet.py:67).

Pins: groups=1 coincides with nn.BatchNorm / the global-stats path;
groups=G matches torch BatchNorm2d run per slice in train mode (the actual
reference semantics); the sharded-jit model accepts bn_groups and trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vision_transformers_tpu.models.efficientnet import (BN_MOMENTUM,
                                                         GroupedBatchNorm)


def _apply(mod, x, train):
    v = mod.init(jax.random.PRNGKey(0), x)
    if not train:
        return mod.apply(v, x), v["batch_stats"]
    y, upd = mod.apply(v, x, mutable=["batch_stats"])
    return y, upd["batch_stats"]


def test_groups1_matches_flax_batchnorm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 3.0, (8, 6, 6, 16)), jnp.float32)
    for train in (True, False):
        y_ref, s_ref = _apply(
            nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, epsilon=1e-3), x, train)
        y, s = _apply(
            GroupedBatchNorm(groups=1, use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=1e-3), x, train)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(s[k]),
                                       np.asarray(s_ref[k]),
                                       rtol=2e-5, atol=2e-5, err_msg=k)


def test_grouped_matches_torch_per_slice():
    """groups=G ≡ torch BatchNorm2d applied independently per batch slice in
    train mode — the exact per-GPU DDP behavior being reproduced."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(1)
    G, per, C = 4, 8, 12
    x = rng.normal(1.0, 2.0, (G * per, 5, 7, C)).astype(np.float32)

    y, stats = _apply(
        GroupedBatchNorm(groups=G, use_running_average=False,
                         momentum=BN_MOMENTUM, epsilon=1e-3),
        jnp.asarray(x), train=True)

    tbn = torch.nn.BatchNorm2d(C, eps=1e-3, momentum=1 - BN_MOMENTUM)
    tbn.train()
    outs, means, varss = [], [], []
    for g in range(G):
        xs = torch.from_numpy(x[g * per:(g + 1) * per]).permute(0, 3, 1, 2)
        tbn.reset_running_stats()
        outs.append(tbn(xs).permute(0, 2, 3, 1).detach().numpy())
        # torch's running update uses the UNBIASED batch var; recover the
        # biased group stats directly for the running-average check below
        means.append(xs.mean(dim=(0, 2, 3)).detach().numpy())
        varss.append(xs.var(dim=(0, 2, 3), unbiased=False).detach().numpy())
    np.testing.assert_allclose(np.asarray(y), np.concatenate(outs),
                               rtol=2e-4, atol=2e-4)

    # running averages: across-group mean of the (biased) group statistics
    exp_mean = (1 - BN_MOMENTUM) * np.mean(means, axis=0)
    exp_var = BN_MOMENTUM * 1.0 + (1 - BN_MOMENTUM) * np.mean(varss, axis=0)
    np.testing.assert_allclose(np.asarray(stats["mean"]), exp_mean,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]), exp_var,
                               rtol=2e-4, atol=2e-5)


def test_each_slice_normalized_by_own_stats():
    """Shift one slice by a constant — with grouped stats its normalized
    output is unchanged; with global stats every slice shifts."""
    rng = np.random.default_rng(2)
    x = rng.normal(0.0, 1.0, (8, 4, 4, 3)).astype(np.float32)
    x2 = x.copy()
    x2[4:] += 10.0  # shift the second slice only

    mod = GroupedBatchNorm(groups=2, use_running_average=False,
                           momentum=BN_MOMENTUM, epsilon=1e-3)
    y1, _ = _apply(mod, jnp.asarray(x), train=True)
    y2, _ = _apply(mod, jnp.asarray(x2), train=True)
    # slice 0 sees identical inputs AND identical (its own) stats
    np.testing.assert_allclose(np.asarray(y2[:4]), np.asarray(y1[:4]),
                               rtol=1e-5, atol=1e-5)
    # slice 1's mean-shift is absorbed by its own stats
    np.testing.assert_allclose(np.asarray(y2[4:]), np.asarray(y1[4:]),
                               rtol=1e-4, atol=1e-4)

    gmod = GroupedBatchNorm(groups=1, use_running_average=False,
                            momentum=BN_MOMENTUM, epsilon=1e-3)
    z2, _ = _apply(gmod, jnp.asarray(x2), train=True)
    assert not np.allclose(np.asarray(z2[:4]), np.asarray(y1[:4]), atol=0.1)


def test_effnetv2_bn_groups_trains_sharded():
    """The conf knob arch.bn_groups reaches the model; the sharded train
    step compiles and runs with per-replica stats on the forced-8-device
    mesh (the [B,...]→[G,B/G,...] reshape splits the data-sharded dim)."""
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.config.schema import Training
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer

    n_dev = len(jax.devices())
    conf = {"type": "efficientnetv2", "width": 0.25, "depth": 0.25,
            "n_class": 10, "bn_groups": n_dev}
    model = registry.build("model", conf).make()
    assert model.bn_groups == n_dev

    mesh = meshlib.make_mesh()
    train_conf = Training(
        optimizer={"type": "adamw", "lr": 1e-3},
        scheduler={"type": "constant", "lr": 1e-3},
        base_lr=1e-3, weight_decay=0.0, wd_skip="vit", epoch=1)
    rng = jax.random.PRNGKey(0)
    batch = 2 * n_dev
    shape = (2, 64, 64, 3)
    with mesh:
        params_shape = jax.eval_shape(
            lambda: model.init(rng, jnp.zeros(shape)))["params"]
        tx = make_optimizer(train_conf, params_shape, lambda c: 1e-3)
        state = engine.create_train_state(rng, model, shape, tx)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = jax.jit(engine.make_train_step(model, tx), donate_argnums=(0,))
        host = {
            "image": np.random.default_rng(0).normal(
                size=(batch, 64, 64, 3)).astype(np.float32),
            "label1": np.zeros(batch, np.int32),
            "label2": np.zeros(batch, np.int32),
            "ratio": np.ones(batch, np.float32),
        }
        sharded = meshlib.shard_batch(mesh, host)
        state, m = step(state, sharded, rng)
        assert np.isfinite(float(m["loss"]))
