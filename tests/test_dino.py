"""DINO training-loop component tests (reference: train_dino.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformers_tpu.config import registry
from vision_transformers_tpu.config.schema import load_config
from vision_transformers_tpu.train.dino import _last_layer_mask


def _tiny_dino_conf(tmp_path):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "dino_deit-s-16.conf")
    return load_config(path, overrides=[
        "training.epoch=2", "training.dataloader.batch_size=8",
        "arch.depth=2", "arch.dim=32", "arch.n_head=2", "arch.dim_ff=64",
        "arch.image_size=32", "arch.window_size=8", "arch.dim_head_out=64",
        "arch.dim_head_ff=64", "arch.dim_head_bottleneck=16",
        "task.global_crop_size=32", "task.local_crop_size=16",
        "task.n_local_crop=2", "dataset_path=/nonexistent",
        "checker.storage=[]", "precision=f32", "data_backend=synthetic",
    ])


def test_last_layer_mask():
    conf = _tiny_dino_conf(None)
    model = conf.arch.make()
    g = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), [g, g])["params"]
    mask = _last_layer_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    marked = [p for p, v in flat if v]
    assert marked, "no last-layer params found"
    for p, v in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in p).lower()
        assert v == ("last_v" in name or "last_g" in name)


def test_dino_end_to_end_synthetic(tmp_path):
    """Full DINO loop on the synthetic backend: loss finite, teacher moves,
    center updates."""
    from vision_transformers_tpu.train.dino import train_dino

    conf = _tiny_dino_conf(tmp_path)
    metrics = train_dino(conf)
    assert np.isfinite(metrics["loss"])
    assert metrics["epoch"] == 1


def test_dino_honors_conf_optimizer_and_agc(tmp_path):
    """The DINO driver must route through the conf optimizer stack
    (reference train_dino.py:110-132,240-248) — changing optimizer.type or
    agc must change the training result, not be silently ignored."""
    from vision_transformers_tpu.train.dino import train_dino

    base = train_dino(_tiny_dino_conf(tmp_path))
    sgd_conf = _tiny_dino_conf(tmp_path)
    sgd_conf.training.optimizer = registry.build(
        "optimizer", {"type": "sgd", "lr": sgd_conf.training.optimizer.lr,
                      "momentum": 0.9})
    sgd = train_dino(sgd_conf)
    assert abs(base["loss"] - sgd["loss"]) > 1e-6, \
        "optimizer.type=sgd produced the same trajectory as adamw"

    agc_conf = _tiny_dino_conf(tmp_path)
    agc_conf.training.agc = 1e-4  # aggressive clip so the effect is visible
    agc = train_dino(agc_conf)
    assert abs(base["loss"] - agc["loss"]) > 1e-6, \
        "training.agc was silently ignored"


def test_dino_grad_accumulation(tmp_path):
    """grad_accumulation > 1 scans microbatches inside the step (reference
    train_dino.py:229-239) and still trains."""
    from vision_transformers_tpu.train.dino import train_dino

    conf = _tiny_dino_conf(tmp_path)
    conf.training.grad_accumulation = 2
    metrics = train_dino(conf)
    assert np.isfinite(metrics["loss"])
    assert metrics["epoch"] == 1


def test_dino_loss_uniform_teacher_is_maximal_entropy():
    """With a uniform teacher distribution the loss equals log(out_dim) when
    the student is also uniform."""
    from vision_transformers_tpu.train.loss import dino_loss

    b, dim, n_crop = 2, 16, 4
    student = jnp.zeros((n_crop * b, dim))
    teacher = jnp.zeros((2 * b, dim))
    center = jnp.zeros((1, dim))
    loss = dino_loss(student, teacher, center, 0.04, n_crop)
    np.testing.assert_allclose(float(loss), np.log(dim), rtol=1e-5)
