"""Optimizer stack tests: AGC golden values vs torch math, masks, RMSpropTF."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from vision_transformers_tpu.train import optim as O


def test_unitwise_agc_matches_reference_math():
    """AGC semantics (reference optimizer.py:12-26): clip where g_norm > max_norm.

    The reference norms over ``dim=range(1, ndim)`` on torch (out, in)
    weights — unit = output neuron.  Flax Dense kernels are (in, out), so the
    same unit grouping is the transpose: run AGC on the flax layout and
    compare against the torch computation on the torch layout."""
    rng = np.random.default_rng(1)
    p_torch = rng.normal(size=(4, 8)).astype(np.float32)   # (out, in)
    g_torch = (rng.normal(size=(4, 8)) * 10).astype(np.float32)
    clipping, eps = 0.01, 1e-3

    tx = O.adaptive_grad_clip(clipping, eps)
    p_flax, g_flax = jnp.asarray(p_torch.T), jnp.asarray(g_torch.T)  # (in, out)
    state = tx.init({"kernel": p_flax})
    out, _ = tx.update({"kernel": g_flax}, state, {"kernel": p_flax})

    # independent torch computation of the published AGC rule
    tp, tg = torch.tensor(p_torch), torch.tensor(g_torch)
    p_norm = tp.norm(dim=list(range(1, tp.ndim)), keepdim=True)
    g_norm = tg.norm(dim=list(range(1, tg.ndim)), keepdim=True)
    max_norm = p_norm.clamp(min=eps) * clipping
    clipped = tg * (max_norm / g_norm.clamp(min=1e-6))
    expected = torch.where(g_norm < max_norm, tg, clipped)
    np.testing.assert_allclose(np.asarray(out["kernel"]), expected.numpy().T, rtol=1e-5)


def test_unitwise_agc_conv_hwio_units():
    """Conv kernels: torch conv weight is (O,I,H,W) with unit=output channel;
    flax is HWIO — the unit must be the last (O) axis there too."""
    rng = np.random.default_rng(2)
    w_torch = rng.normal(size=(6, 3, 3, 3)).astype(np.float32)  # OIHW
    g_torch = (rng.normal(size=(6, 3, 3, 3)) * 10).astype(np.float32)
    clipping, eps = 0.02, 1e-3

    w_flax = jnp.asarray(np.transpose(w_torch, (2, 3, 1, 0)))  # HWIO
    g_flax = jnp.asarray(np.transpose(g_torch, (2, 3, 1, 0)))
    tx = O.adaptive_grad_clip(clipping, eps)
    out, _ = tx.update({"kernel": g_flax}, tx.init({"kernel": w_flax}),
                       {"kernel": w_flax})

    tp, tg = torch.tensor(w_torch), torch.tensor(g_torch)
    dims = list(range(1, tp.ndim))
    p_norm = tp.square().sum(dim=dims, keepdim=True).sqrt()
    g_norm = tg.square().sum(dim=dims, keepdim=True).sqrt()
    max_norm = p_norm.clamp(min=eps) * clipping
    clipped = tg * (max_norm / g_norm.clamp(min=1e-6))
    expected = torch.where(g_norm < max_norm, tg, clipped).numpy()
    np.testing.assert_allclose(
        np.asarray(out["kernel"]), np.transpose(expected, (2, 3, 1, 0)), rtol=1e-5)


def test_agc_identity_below_threshold():
    p = jnp.ones((3, 3))
    g = jnp.full((3, 3), 1e-6)
    tx = O.adaptive_grad_clip(0.01)
    out, _ = tx.update({"kernel": g}, tx.init({"kernel": p}), {"kernel": p})
    np.testing.assert_allclose(np.asarray(out["kernel"]), np.asarray(g))


def test_agc_identical_layout_leaves_use_torch_dim0_unit():
    """cls_token/pos_embed keep the torch layout, so the reference's dim-0
    unit applies unchanged (optimizer.py:4-9 on a [1, 1+n, dim] tensor)."""
    rng = np.random.default_rng(3)
    p = rng.normal(size=(1, 5, 8)).astype(np.float32)
    g = (rng.normal(size=(1, 5, 8)) * 10).astype(np.float32)
    clipping, eps = 0.01, 1e-3

    tx = O.adaptive_grad_clip(clipping, eps)
    out, _ = tx.update({"pos_embed": jnp.asarray(g)},
                       tx.init({"pos_embed": jnp.asarray(p)}),
                       {"pos_embed": jnp.asarray(p)})

    tp, tg = torch.tensor(p), torch.tensor(g)
    dims = list(range(1, tp.ndim))
    p_norm = tp.square().sum(dim=dims, keepdim=True).sqrt()
    g_norm = tg.square().sum(dim=dims, keepdim=True).sqrt()
    max_norm = p_norm.clamp(min=eps) * clipping
    clipped = tg * (max_norm / g_norm.clamp(min=1e-6))
    expected = torch.where(g_norm < max_norm, tg, clipped).numpy()
    np.testing.assert_allclose(np.asarray(out["pos_embed"]), expected, rtol=1e-5)


def test_wd_mask_vit():
    params = {
        "layers_0": {"attn": {"qkv": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)}}},
        "norm": {"scale": jnp.ones(4), "bias": jnp.ones(4)},
        "cls_token": jnp.ones((1, 1, 4)),
        "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.ones(2)},
    }
    mask = O.wd_mask(params, "vit")
    assert mask["layers_0"]["attn"]["qkv"]["kernel"] is True
    assert mask["layers_0"]["attn"]["qkv"]["bias"] is False
    assert mask["norm"]["scale"] is False  # 1-d
    assert mask["cls_token"] is False  # "cls" substring
    assert mask["head"]["kernel"] is True
    assert mask["head"]["bias"] is False


def test_agc_mask_reference_name_rule():
    """Reference rule (train.py:260): clipped iff "linear" not in the name."""
    params = {
        "blocks": {
            "linear": {"kernel": jnp.ones((4, 4))},      # attn out proj
            "linear_q": {"kernel": jnp.ones((4, 4))},    # PVT q proj
            "qkv": {"kernel": jnp.ones((4, 12))},
            "ff": {"fc1": {"kernel": jnp.ones((4, 8))}},
        },
        "classifier": {"kernel": jnp.ones((4, 2)), "bias": jnp.ones(2)},
        "logit": {"kernel": jnp.ones((4, 2))},
    }
    mask = O.agc_mask(params)
    assert mask["blocks"]["linear"]["kernel"] is False
    assert mask["blocks"]["linear_q"]["kernel"] is False
    assert mask["blocks"]["qkv"]["kernel"] is True
    assert mask["blocks"]["ff"]["fc1"]["kernel"] is True
    # swin/effnet classifiers are NOT name-excluded in the reference
    assert mask["classifier"]["kernel"] is True
    assert mask["logit"]["kernel"] is True


def test_scheduled_weight_decay_indexes_per_step():
    """add_scheduled_decayed_weights evaluates wd(count) each optimizer step
    (the jit-resident form of DINO's per-step param_group override,
    reference train_dino.py:235-237)."""
    table = jnp.asarray([0.5, 0.25], jnp.float32)
    wd_fn = lambda c: table[jnp.minimum(c, 1)]
    mask = {"w": True, "b": False}
    tx = O.add_scheduled_decayed_weights(wd_fn, mask)
    params = {"w": jnp.ones(2), "b": jnp.ones(2)}
    state = tx.init(params)
    zero = {"w": jnp.zeros(2), "b": jnp.zeros(2)}
    out1, state = tx.update(zero, state, params)
    np.testing.assert_allclose(np.asarray(out1["w"]), 0.5)
    np.testing.assert_allclose(np.asarray(out1["b"]), 0.0)  # masked out
    out2, state = tx.update(zero, state, params)
    np.testing.assert_allclose(np.asarray(out2["w"]), 0.25)
    assert int(state.count) == 2


def test_make_optimizer_accepts_callable_weight_decay():
    """make_optimizer(weight_decay=callable) builds a working pipeline."""

    class TrainConf:
        agc = 0.0
        clip_grad_norm = 1.0
        weight_decay = 0.05
        wd_skip = "vit"
        optimizer = O.AdamW(type="adamw", lr=0.1)

    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)}}
    wd_fn = lambda c: jnp.float32(0.1)
    tx = O.make_optimizer(TrainConf(), params, lambda c: 0.01, weight_decay=wd_fn)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # kernel update includes wd*p = 0.1 on top of adam's ±1; bias is skipped
    leaves = jax.tree.leaves(updates)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert not np.allclose(np.asarray(updates["dense"]["kernel"]),
                           np.asarray(updates["dense"]["bias"])[None, :].repeat(2, 0))


def test_rmsprop_tf_first_step_matches_timm_math():
    """TF-style RMSprop: rms starts at ONE, eps inside sqrt."""
    p = np.array([1.0, -2.0], dtype=np.float32)
    g = np.array([0.5, 0.3], dtype=np.float32)
    lr, alpha, eps, momentum = 0.01, 0.9, 1e-3, 0.9

    conf = O.RMSpropTF(type="rmsprop_tf", lr=lr, alpha=alpha, eps=eps, momentum=momentum)
    tx = conf.make(lambda c: lr, weight_decay=0.0, mask=None)
    params = {"kernel": jnp.asarray(p)}
    state = tx.init(params)
    updates, _ = tx.update({"kernel": jnp.asarray(g)}, state, params)

    rms = alpha * 1.0 + (1 - alpha) * g**2  # init at one
    mom = 0.9 * 0.0 + lr * g / np.sqrt(rms + eps)
    expected_update = -mom
    np.testing.assert_allclose(np.asarray(updates["kernel"]), expected_update,
                               rtol=1e-5)


def test_rmsprop_tf_folds_lr_into_momentum_buffer():
    """timm RMSpropTF default ``lr_in_momentum=True``: each buffered gradient
    keeps the lr it was accumulated with.  Under the EffNetV2 warmup ramp this
    differs from applying the current lr outside the buffer — pin the exact
    semantics over 3 steps of a ramping schedule against scalar numpy math."""
    alpha, eps, momentum = 0.9, 1e-3, 0.9
    lrs = [0.001, 0.004, 0.016]
    grads = [0.5, -0.3, 0.8]
    p0 = 1.0

    conf = O.RMSpropTF(type="rmsprop_tf", lr=lrs[0], alpha=alpha, eps=eps,
                       momentum=momentum)
    tx = conf.make(lambda c: jnp.asarray(lrs)[c], weight_decay=0.0, mask=None)
    params = {"kernel": jnp.asarray([p0], jnp.float32)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"kernel": jnp.asarray([g], jnp.float32)},
                                   state, params)
        params = optax.apply_updates(params, updates)

    # independent scalar replay of the timm update rule
    nu, buf, p = 1.0, 0.0, p0
    for lr, g in zip(lrs, grads):
        nu = alpha * nu + (1 - alpha) * g * g
        buf = momentum * buf + lr * g / np.sqrt(nu + eps)
        p = p - buf
    np.testing.assert_allclose(np.asarray(params["kernel"]), [p], rtol=1e-6)

    # and prove the OLD (lr-outside) semantics would differ here
    nu, buf, p_old = 1.0, 0.0, p0
    for lr, g in zip(lrs, grads):
        nu = alpha * nu + (1 - alpha) * g * g
        buf = momentum * buf + g / np.sqrt(nu + eps)
        p_old = p_old - lr * buf
    assert abs(p - p_old) > 1e-5


def test_make_optimizer_runs_end_to_end():
    class TC:
        agc = 0.01
        clip_grad_norm = 5.0
        weight_decay = 0.05
        wd_skip = "vit"

        class optimizer:
            @staticmethod
            def make(schedule, wd, mask):
                return optax.chain(
                    optax.scale_by_adam(),
                    optax.add_decayed_weights(wd, mask=mask),
                    optax.scale_by_schedule(lambda c: -schedule(c)),
                )

    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    tx = O.make_optimizer(TC, params, lambda c: 1e-3)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert jnp.isfinite(new_params["dense"]["kernel"]).all()
