"""Tensor-parallel sharding tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.parallel import mesh as meshlib, tp
from vision_transformers_tpu.train import engine


@pytest.fixture(scope="module")
def tiny_model():
    cfg = registry.build(
        "model",
        {"type": "vit", "image_size": 16, "window_size": 8, "n_class": 5,
         "depth": 1, "dim": 32, "n_head": 2, "dim_ff": 64},
    )
    return cfg.make()


def _batch(b):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.normal(size=(b, 16, 16, 3)).astype(np.float32)),
        "label1": jnp.asarray(rng.integers(0, 5, b).astype(np.int32)),
        "label2": jnp.asarray(rng.integers(0, 5, b).astype(np.int32)),
        "ratio": jnp.ones(b, jnp.float32),
    }


def test_param_sharding_rules(tiny_model):
    mesh = meshlib.make_mesh(model_parallel=2)
    params = tiny_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    sh = tp.param_shardings(params, mesh)
    qkv = sh["layers_0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == P(None, meshlib.MODEL_AXIS)  # column parallel
    out = sh["layers_0"]["attn"]["linear"]["kernel"]
    assert out.spec == P(meshlib.MODEL_AXIS, None)  # row parallel
    fc1 = sh["layers_0"]["ff"]["fc1"]["kernel"]
    assert fc1.spec == P(None, meshlib.MODEL_AXIS)
    fc2 = sh["layers_0"]["ff"]["fc2"]["kernel"]
    assert fc2.spec == P(meshlib.MODEL_AXIS, None)
    # norms and cls replicated
    assert sh["norm"]["scale"].spec == P()
    assert sh["cls_token"].spec == P()


def test_tp_train_step_matches_dp(tiny_model):
    """One train step under (data=4, model=2) equals the replicated step."""
    tx = optax.sgd(0.1)
    batch = _batch(8)

    # replicated baseline
    mesh_dp = meshlib.make_mesh(model_parallel=1)
    with mesh_dp:
        state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                          (2, 16, 16, 3), tx)
        state = jax.device_put(state, meshlib.replicated(mesh_dp))
        step = jax.jit(engine.make_train_step(tiny_model, tx))
        s_dp, m_dp = step(state, meshlib.shard_batch(mesh_dp, batch),
                          jax.random.PRNGKey(0))
        loss_dp = float(m_dp["loss"])
        p_dp = jax.device_get(s_dp.params)

    # tensor parallel
    mesh_tp = meshlib.make_mesh(model_parallel=2)
    with mesh_tp:
        state = engine.create_train_state(jax.random.PRNGKey(0), tiny_model,
                                          (2, 16, 16, 3), tx)
        params = tp.shard_params(state.params, mesh_tp)
        state = state.replace(params=params, opt_state=jax.jit(tx.init)(params))
        step = jax.jit(engine.make_train_step(tiny_model, tx))
        s_tp, m_tp = step(state, meshlib.shard_batch(mesh_tp, batch),
                          jax.random.PRNGKey(0))
        loss_tp = float(m_tp["loss"])
        p_tp = jax.device_get(s_tp.params)

    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_tp), jax.tree.leaves(p_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_graft_dryrun_8dev():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_tp_sharded_checkpoint_roundtrip(tiny_model, tmp_path):
    """Save a TP-sharded param tree and restore it with the SAME shardings:
    orbax writes per-shard and the restore target's NamedSharding lays the
    arrays back out across the (data=4, model=2) mesh — the elastic path a
    tensor-parallel run depends on."""
    from vision_transformers_tpu.train import checkpoint as ckpt

    mesh = meshlib.make_mesh(model_parallel=2)
    with mesh:
        params = tiny_model.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 3)))["params"]
        sharded = tp.shard_params(params, mesh)
        path = str(tmp_path / "tp-ckpt")
        ckpt.save_checkpoint(path, {"step": 7, "params": sharded}, block=True)

        restored = ckpt.restore_checkpoint(
            path, target={"step": 7, "params": sharded})
        assert int(restored["step"]) == 7
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(sharded),
            jax.tree_util.tree_leaves_with_path(restored["params"]),
        ):
            assert pa == pb
            assert b.sharding == a.sharding, jax.tree_util.keystr(pa)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
