"""Training-engine tests: train step math, grad accumulation, EMA, sharding,
and a tiny overfit run (SURVEY §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.parallel import mesh as meshlib
from vision_transformers_tpu.train import engine


@pytest.fixture(scope="module")
def tiny_model():
    cfg = registry.build(
        "model",
        {"type": "vit", "image_size": 16, "window_size": 8, "n_class": 5,
         "depth": 1, "dim": 32, "n_head": 2, "dim_ff": 64},
    )
    return cfg.make()


def _batch(b, n_class=5, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(b, 16, 16, 3)).astype(np.float32)),
        "label1": jnp.asarray(rng.integers(0, n_class, b).astype(np.int32)),
        "label2": jnp.asarray(rng.integers(0, n_class, b).astype(np.int32)),
        "ratio": jnp.asarray(rng.uniform(size=b).astype(np.float32)),
    }


def test_accuracy():
    logits = jnp.asarray([[9.0, 1.0, 0.0], [0.0, 5.0, 4.0]])
    labels = jnp.asarray([0, 2])
    p1, p5 = engine.accuracy(logits, labels, topk=(1, 2))
    assert float(p1) == 50.0
    assert float(p5) == 100.0


def test_ema_decay_schedule():
    # warmup: min(ema, (1+t)/(10+t)) (reference train.py:313-314)
    assert float(engine.ema_decay_schedule(0.9999, jnp.asarray(0))) == pytest.approx(0.1)
    assert float(engine.ema_decay_schedule(0.9999, jnp.asarray(10**6))) == pytest.approx(
        0.9999, abs=1e-6)


def test_grad_accumulation_equivalence(tiny_model):
    """accum=2 over a batch == accum=1 over the same batch (same math)."""
    tx = optax.sgd(0.1)
    state1 = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                       (2, 16, 16, 3), tx)
    state2 = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                       (2, 16, 16, 3), tx)
    batch = _batch(8)
    step1 = engine.make_train_step(tiny_model, tx, grad_accumulation=1)
    step2 = engine.make_train_step(tiny_model, tx, grad_accumulation=2)
    rng = jax.random.PRNGKey(1)
    s1, m1 = step1(state1, batch, rng)
    s2, m2 = step2(state2, batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_ema_updates(tiny_model):
    tx = optax.sgd(0.5)
    state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                      (2, 16, 16, 3), tx, ema=0.9999)
    assert state.ema_params is not None
    step = engine.make_train_step(tiny_model, tx, ema=0.9999)
    s1, _ = step(state, _batch(4), jax.random.PRNGKey(0))
    # at t=0 decay = 0.1 → ema moves 90% toward new params
    p0 = jax.tree.leaves(state.params)[0] if False else None
    ema1 = jax.tree.leaves(s1.ema_params)[0]
    new1 = jax.tree.leaves(s1.params)[0]
    # ema must differ from both old copy and exactly-new params
    assert not np.allclose(np.asarray(ema1), np.asarray(new1))


def test_eval_step_sums(tiny_model):
    tx = optax.sgd(0.1)
    state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                      (2, 16, 16, 3), tx)
    ev = engine.make_eval_step(tiny_model)
    out = ev(state, _batch(6))
    assert float(out["n"]) == 6.0
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["prec1"]) / 6 <= 100.0


def test_sharded_train_step_on_mesh(tiny_model):
    """Full train step jitted over the 8-device CPU mesh with a sharded batch."""
    mesh = meshlib.make_mesh()
    assert len(mesh.devices.flat) == 8
    tx = optax.adamw(1e-3)
    with mesh:
        state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                          (2, 16, 16, 3), tx, ema=0.999)
        state = jax.device_put(state, meshlib.replicated(mesh))
        step = jax.jit(engine.make_train_step(tiny_model, tx, grad_accumulation=2,
                                              ema=0.999), donate_argnums=(0,))
        batch = meshlib.shard_batch(mesh, _batch(16))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
        # batch really is sharded over the data axis
        sh = batch["image"].sharding
        assert sh.spec[0] == meshlib.DATA_AXIS


def test_overfit_tiny(tiny_model):
    """Loss decreases monotonically-ish on one fixed batch (e2e sanity)."""
    tx = optax.adam(3e-3)
    state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                      (2, 16, 16, 3), tx)
    batch = _batch(8)
    batch["label2"] = batch["label1"]
    batch["ratio"] = jnp.ones(8)
    step = jax.jit(engine.make_train_step(tiny_model, tx), donate_argnums=(0,))
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::6]


def test_ema_bn_eval_uses_ema_stats():
    """EMA + BN interplay (SURVEY §7 hard part): with ema_bn the eval step
    reads EMA batch_stats, which track the training stats."""
    cfg = registry.build("model", {"type": "efficientnetv2", "width": 0.25,
                                   "depth": 0.25, "n_class": 5})
    model = cfg.make()
    tx = optax.sgd(0.1)
    state = engine.create_train_state(jax.random.PRNGKey(0), model,
                                      (2, 32, 32, 3), tx, ema=0.9, ema_bn=True)
    assert state.ema_batch_stats is not None
    batch = {
        "image": jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 3)).astype(np.float32)),
        "label1": jnp.zeros(4, jnp.int32),
        "label2": jnp.zeros(4, jnp.int32),
        "ratio": jnp.ones(4, jnp.float32),
    }
    step = engine.make_train_step(model, tx, ema=0.9)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    # ema stats are EMA-lerped toward the updated training stats with the
    # warmup-aware decay (reference train_util.py:78-84:
    # buf.mul_(decay).add_(new, alpha=1-decay)); at t=0 decay=min(0.9, 0.1)=0.1
    decay = 0.1
    for e0, e1, b in zip(jax.tree.leaves(state.ema_batch_stats),
                         jax.tree.leaves(s1.ema_batch_stats),
                         jax.tree.leaves(s1.batch_stats)):
        expect = np.asarray(e0) * decay + np.asarray(b) * (1 - decay)
        np.testing.assert_allclose(np.asarray(e1), expect, rtol=1e-5, atol=1e-6)
        # smoothing, not a copy: where stats moved, ema must lag behind
        moved = ~np.isclose(np.asarray(e0), np.asarray(b))
        if moved.any():
            assert not np.allclose(np.asarray(e1)[moved], np.asarray(b)[moved])
    # eval step runs with the EMA stats
    ev = engine.make_eval_step(model, use_ema=True)
    out = ev(s1, batch)
    assert np.isfinite(float(out["loss"]))
